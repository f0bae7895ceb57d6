package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Byte-pair-encoding MERGE LEARNING over the corpus word histogram —
  * the tokenizer-training step of a pretraining pipeline (q82's top-V
  * word cut is a word-level vocab; production vocabs are merge-based
  * subword vocabs, Sennrich et al. 2016).
  *
  * Algorithm (the reference BPE trainer, exactly): start from each
  * distinct word as its character sequence plus a `</w>` end marker;
  * each iteration counts ADJACENT SYMBOL PAIRS weighted by word
  * frequency (overlapping occurrences all count, the standard rule),
  * picks the argmax pair under the deterministic total order
  * (count desc, left asc, right asc), and merges its non-overlapping
  * occurrences greedily left-to-right in every word.
  *
  * Scale shape — the part that matters at 100 TB: the CORPUS is
  * touched exactly once, by the word-histogram aggregation (the
  * standard word-count shuffle, partial-agg'd). Every merge iteration
  * then runs on the HISTOGRAM — vocabulary-sized, millions of rows at
  * worst — as one pair-count aggregate plus one per-row merge
  * projection; the chosen pair is a single collected row (a bounded
  * 1-row driver fetch per iteration, the same driver-loop shape as
  * ml.Customs.forwardStepwise). Token streams never re-shuffle.
  *
  * The merge projection is a SQL `aggregate` fold (interpreted HOF —
  * acceptable BY MEASUREMENT on histogram-sized input, never on the
  * token stream): fold symbols left-to-right, merging when the
  * accumulator's last symbol is `lhs` and the incoming one is `rhs`.
  * This equals greedy non-overlapping left-to-right merging because a
  * merged symbol (`lhs+rhs`, strictly longer than `lhs`) can never
  * itself re-match `lhs`, so a just-merged position cannot chain into
  * an overlapping second merge. BpeSpec pins the fold to a naive
  * in-memory trainer on planted run/overlap edge cases and on the
  * driver corpus.
  */
object Bpe {

  /** One learned merge rule. */
  final case class Merge(iter: Long, lhs: String, rhs: String,
                         pairCount: Long)

  /** The `</w>` word-end marker (kept out of corpus chars by
    * construction — corpus tokens never contain '<'). */
  val EndMark = "</w>"

  /** (word, freq, syms) histogram from a one-column `word` frame — the
    * single corpus-scale pass. Empty words are dropped (r11 ADVICE):
    * Spark's split('','') returns [""] (not []), so an empty token —
    * consecutive/leading/trailing spaces in a future corpus — would
    * yield syms ["", "</w>"], diverging from the reference trainer and
    * from DuckDB's string_split, and breaking the "merged symbol is
    * strictly longer than lhs" greedy-equivalence premise. */
  def wordHistogram(words: DataFrame): DataFrame =
    words.filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        concat(split(col("word"), ""), array(lit(EndMark))))

  /** Greedy non-overlapping left-to-right merge of (a, b) in a symbol
    * array, as a single fold expression (see object doc for the
    * equivalence argument). */
  def mergeSyms(syms: Column, a: String, b: String): Column =
    aggregate(syms, typedlit(Seq.empty[String]),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Adjacent-pair counts of a (freq, syms) state — every overlapping
    * occurrence counts, weighted by word frequency. Fully-merged
    * single-symbol words are filtered FIRST: `sequence(1, 0)` in Spark
    * is the DESCENDING [1, 0], not empty, and ANSI `element_at` then
    * throws on the out-of-bounds index (DuckDB's generate_series(1,0)
    * is empty — the oracle never sees the case). */
  private def pairCounts(state: DataFrame): DataFrame =
    state
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS lhs, element_at(syms, i + 1) AS rhs))"))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))

  /** Run `iters` merge iterations over an initial (word, freq, syms)
    * state. Returns the learned merge table and the final state. The
    * state is localCheckpoint'ed per iteration: each round's fold
    * otherwise re-nests into the plan and the pair-count action would
    * re-evaluate every earlier round. A tracked-lazy-persist variant
    * (cache filled by the next pair-count action, saving the explicit
    * checkpoint job) was A/B-measured SLOWER at sf0.1 (5-rep medians
    * ~2.95 s vs ~2.26 s per query): the checkpointed state is a flat
    * in-memory block each round reads directly, while the cache chain
    * re-enters the whole InMemoryRelation stack per action — the
    * cache-on-cache cascade SCALE.md documents. Shape chosen by the
    * measurement.
    *
    * Block lifecycle: each iteration's checkpoint supersedes the
    * previous one, whose Dataset becomes unreachable and whose RDD
    * blocks are released by the ContextCleaner (Dataset.unpersist
    * doesn't reach checkpoint-level persistence); at most `iters`
    * histogram-sized block sets can coexist between GC cycles, and
    * their MEMORY_AND_DISK level is evictable under storage pressure —
    * bounded by construction, stated so nobody hunts for a leak. */
  def learnMerges(state0: DataFrame, iters: Int): (Seq[Merge], DataFrame) = {
    require(iters > 0, s"need iters > 0, got $iters")
    // full shuffle width kept on the loop state: a coalesce(8) variant
    // (fewer sliver tasks per loop job) also A/B-measured slower — the
    // interpreted merge fold is the loop's real compute and wants the
    // parallelism more than the scheduler wants fewer tasks
    var state = state0.localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (it <- 1 to iters) {
      val best = pairCounts(state)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"pair space exhausted at iteration $it — every word fully " +
          "merged; ask for fewer merges on this corpus")
      val (l, r, c) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += Merge(it.toLong, l, r, c)
      state = state.withColumn("syms", mergeSyms(col("syms"), l, r))
        .localCheckpoint()
    }
    (merges.result(), state)
  }

  /** Greedy rank-order selection of up to `batch` pairwise
    * NON-INTERACTING pairs from a (lhs, rhs, cnt) candidate list
    * already sorted by the trainer's total order: a pair is skipped —
    * deferred to the next round, never dropped — when any of its three
    * symbols (lhs, rhs, or the CREATED symbol lhs+rhs) collides with a
    * previously-selected pair's lhs, rhs, or created symbol. The created
    * symbol is tracked too (r13 ADVICE): with only side-symbol tracking,
    * (a,bc) and (abc,d) could be selected together when 'abc' already
    * exists from an earlier (ab,c) merge — folding (a,bc) first creates
    * NEW 'abc' tokens, so folding (abc,d) after it would merge
    * occurrences not present at count time. Closing over the created
    * symbols restores the full claim: no selected pair consumes OR
    * produces a symbol another selected pair reads, so folding them in
    * any order equals folding them one-per-iteration, and each pair's
    * count is exactly what the shared histogram pass measured. Pure and
    * driver-side (the candidate list is a bounded collect). */
  def selectNonInteracting(ranked: Seq[(String, String, Long)],
                           batch: Int): Seq[(String, String, Long)] = {
    require(batch > 0, s"need batch > 0, got $batch")
    val touched = scala.collection.mutable.HashSet.empty[String]
    val out = Seq.newBuilder[(String, String, Long)]
    var n = 0
    val it = ranked.iterator
    while (n < batch && it.hasNext) {
      val p @ (l, r, _) = it.next()
      if (!touched(l) && !touched(r) && !touched(l + r)) {
        out += p; touched += l; touched += r; touched += (l + r); n += 1
      }
    }
    out.result()
  }

  /** BATCHED merge learning: per round, ONE pair-count job + one
    * bounded collect selects up to `batch` non-interacting pairs
    * ([[selectNonInteracting]]) and folds them in a single projection +
    * one localCheckpoint — ~batch× fewer driver round-trips than
    * [[learnMerges]], whose measured per-iteration floor (0.16 s/merge
    * at sf0.1, SCALE.md) is pure job-scheduling latency: a 32k-vocab
    * production run is driver-bound, and this is the recorded remedy.
    *
    * Semantics — stated exactly, not hand-waved: the batched table
    * equals the sequential table WHENEVER each round's sequential
    * argmax sequence is exactly the round's selected pairs, which holds
    * when (a) the selected pairs are symbol-disjoint in rank order
    * (enforced — interacting pairs are deferred) and (b) no pair
    * CREATED by one of the round's merges outranks the round's next
    * selection (not checkable before the fold; on natural-language
    * histograms a just-created symbol's follow-on pairs almost never
    * beat the standing top-k, but adversarial inputs exist — BpeSpec
    * plants one). Where (b) fails the result is still a VALID greedy
    * BPE table (every selected pair had its true count at selection
    * time); it is the standard batched-trainer approximation, traded
    * knowingly for the k× driver-latency win. Callers who need the
    * reference table exactly (the declared q90 oracle) use
    * [[learnMerges]].
    *
    * Iteration numbering: merges keep GLOBAL sequential `iter` values
    * (1-based across rounds) so [[ranksOf]]/[[segmentWithVocab]]
    * consume either trainer's table identically. */
  def learnMergesBatched(state0: DataFrame, iters: Int,
                         batch: Int = 8): (Seq[Merge], DataFrame) = {
    require(iters > 0, s"need iters > 0, got $iters")
    require(batch > 0, s"need batch > 0, got $batch")
    var state = state0.localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var done = 0
    while (done < iters) {
      val want = math.min(batch, iters - done)
      // candidate pool 4× the ask: enough to survive skips (each
      // selected pair blocks at most its two symbols; a pool of 4k
      // rank-ordered pairs yields k disjoint ones on any histogram
      // with >2k distinct symbols) — if the pool still comes up short
      // the next round re-counts and continues, so nothing is lost.
      val top = pairCounts(state)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(want * 4).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      require(top.nonEmpty,
        s"pair space exhausted after $done merges — every word fully " +
          "merged; ask for fewer merges on this corpus")
      val picked = selectNonInteracting(top, want)
      picked.foreach { case (l, r, c) =>
        done += 1
        merges += Merge(done.toLong, l, r, c)
      }
      state = picked.foldLeft(state) { case (df, (l, r, _)) =>
        df.withColumn("syms", mergeSyms(col("syms"), l, r))
      }.localCheckpoint()
    }
    (merges.result(), state)
  }

  /** Apply an ORDERED merge list to a (word, syms) frame — one chained
    * projection (no shuffles, no per-merge actions). SMALL-VOCAB ONLY:
    * the plan chains one fold expression per merge, so analysis/codegen
    * cost grows linearly with vocab size — fine at the declared 10
    * merges, fatal at a production 32k-merge vocab. The deployable
    * frozen-vocab path is [[segmentWithVocab]] (O(1) plan size in V,
    * spec-pinned equal to this on learned tables); this form stays as
    * the independently-derived cross-check the equality spec needs. */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words) { (df, m) =>
      df.withColumn("syms", mergeSyms(col("syms"), m.lhs, m.rhs))
    }

  /** The merge table as a rank map: (lhs, rhs) -> 0-based rank in iter
    * order. Requires distinct pairs (a learned table never repeats a
    * pair — once merged, the pair can't be counted again). */
  def ranksOf(merges: Seq[Merge]): Map[(String, String), Int] = {
    val ordered = merges.sortBy(_.iter).map(m => (m.lhs, m.rhs))
    require(ordered.distinct.size == ordered.size,
      "merge table repeats a pair — not a valid learned table")
    ordered.zipWithIndex.toMap
  }

  /** Segment ONE word's symbol sequence under a frozen merge table —
    * the HuggingFace-tokenizer apply loop: repeatedly find the adjacent
    * pair with the LOWEST rank and merge all its occurrences greedily
    * left-to-right; stop when no adjacent pair is in the table.
    *
    * Equivalence with rank-order application ([[applyMerges]]): on any
    * VALID merge table — each merge's two components are base symbols
    * or outputs of strictly earlier merges, which is true of every
    * table [[learnMerges]] can produce, since a pair over a
    * not-yet-created symbol has zero count when it would have to be
    * picked — merging the lowest-present rank r creates only the symbol
    * lhs+rhs, which by validity participates only in merges of rank
    * > r. So no lower-rank opportunity is ever created out of order,
    * and processing ranks lowest-first visits exactly the merges that
    * sequential rank-order application performs, in the same
    * left-to-right greedy way per rank. BpeSpec pins the equality on
    * learned tables (the q90 table, adversarial planted corpora, and a
    * 1k-merge table) rather than trusting this argument.
    *
    * Cost: O(L) scan per fired merge, ≤ L−1 fires ⇒ O(L²) worst case
    * per word in the word's length L alone — INDEPENDENT of vocab size
    * V (each lookup is one hash probe). [[applyMerges]] is O(V) plan
    * depth and O(V·L) work per word; this is the difference between a
    * demo vocab and a production 32k-merge one. */
  def segmentSyms(syms0: IndexedSeq[String],
                  ranks: Map[(String, String), Int]): IndexedSeq[String] = {
    var syms = syms0
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the table
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL its occurrences, greedy left-to-right (non-overlap)
        val out = IndexedSeq.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == bl && syms(j + 1) == br) {
            out += (bl + br); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms
  }

  /** Frozen-vocab segmenter over a one-column `word` frame: ONE
    * broadcast of the rank map, one per-row projection — the plan is
    * CONSTANT-SIZE in vocab size V, and the per-row work is O(L²) in
    * word length with O(1) hash probes per lookup (see [[segmentSyms]]).
    * This is the tokenize step a production 32k-merge vocab runs at
    * inference/scoring scale; [[applyMerges]]' chained-fold plan cannot
    * even ANALYZE at that V.
    *
    * Deliberately a Scala UDF, not a Catalyst expression: the per-row
    * algorithm is data-dependent iteration over a broadcast hash map —
    * expressible in the expression tree only by unrolling the table
    * (exactly applyMerges' flaw). The fold chain it replaces is itself
    * interpreted (HOF lambdas never enter whole-stage codegen), so the
    * UDF gives up no codegen; A/B at the q90 shape (10 merges, sf0.1)
    * measured the UDF at parity-or-better, and it is the only shape
    * that exists at 1k+ merges (BpeSpec + SoakScale gate). Output
    * matches [[wordHistogram]]'s framing: chars + `</w>`, then merges
    * applied. */
  def segmentWithVocab(words: DataFrame, merges: Seq[Merge],
                       wordCol: String = "word"): DataFrame = {
    val ranks = ranksOf(merges)
    val bc = words.sparkSession.sparkContext.broadcast(ranks)
    val seg = udf { (w: String) =>
      // Java regex split("") is code-point aware (same engine Spark's
      // split uses) — char-level .map(_.toString) would split surrogate
      // pairs into lone code units and diverge from wordHistogram's
      // framing; the empty-string filter mirrors the empty-word guard
      val chars = w.split("").toIndexedSeq.filter(_.nonEmpty) :+ EndMark
      segmentSyms(chars, bc.value)
    }
    words.withColumn("syms", seg(col(wordCol)))
  }

  /** Per-document SUBWORD counts under a frozen merge table — the
    * budget column tokenizer-budget packing ([[Packing.packSequencesBpe]],
    * q106) feeds the packer: production shards are sized by what the
    * MODEL consumes (BPE tokens), not by whitespace words. Segmentation
    * is the production path ([[segmentWithVocab]]: one broadcast rank
    * map, plan constant in vocab size), run on DISTINCT words and joined
    * back to the per-document occurrence stream — the q91 shape, so a
    * 100-TB corpus segments its vocabulary once, never its token stream.
    * Output is (doc_id, _nt), the exact frame
    * [[Packing.packSequencesCounts]] consumes. An EMPTY merge table is
    * the maximally-fragmented tokenizer by BPE semantics: every word
    * counts as its characters + `</w>` (len+1) — pinned in BpeSpec, as
    * is the opposite end (a saturating table that fully merges every
    * word makes subword counts ≡ whitespace counts). */
  def subwordCountsFor(documents: DataFrame, merges: Seq[Merge]): DataFrame = {
    val words = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    val seg = segmentWithVocab(words.select(col("word")).distinct(), merges)
      .select(col("word"), size(col("syms")).cast("long").as("_ns"))
    words.join(seg, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_ns")).as("_nt"))
  }

  /** The q90 merge table re-learned for a composing consumer (same
    * train-split histogram, same sequential trainer — so the q106
    * oracle's unrolled train chain replays it exactly). */
  def trainedMerges(s: SparkSession, dir: String, iters: Int): Seq[Merge] = {
    val hist = wordHistogram(splitWords(s, dir, train = true).select("word"))
    learnMerges(hist, iters)._1
  }

  /** The q82-family train split (hash bucket < 80) exploded to words.
    * Empty words filtered here too (the q91 TEST side segments words
    * without passing through [[wordHistogram]] — same r11-ADVICE empty-
    * token divergence applies). */
  private def splitWords(s: SparkSession, dir: String,
                         train: Boolean): DataFrame = {
    val b = Sampling.hashBucket(col("doc_id"), 100)
    Tables(s, dir, "documents")
      .filter(if (train) b < 80 else b >= 90)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
  }

  // q90 — the learned merge table itself (iter, lhs, rhs, pair_count):
  // the model artifact a tokenizer trainer ships. Learned on the TRAIN
  // split (q82's hash-mod rule) so q91 can score the held-out split
  // without leakage.
  def bpeMerges(s: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    import s.implicits._
    val hist = wordHistogram(splitWords(s, dir, train = true).select("word"))
    val (merges, _) = learnMerges(hist, iters)
    merges.map(m => (m.iter, m.lhs, m.rhs, m.pairCount))
      .toDF("iter", "lhs", "rhs", "pair_count")
      .orderBy(col("iter"))
  }

  // q91 — FERTILITY re-score of the held-out split under the learned
  // merges: per source, test-token count, subword count after applying
  // the merge table, and subwords-per-token (the vocab-quality metric
  // tokenizer work reports; lower = the vocab compresses this source
  // better). Merge application runs on DISTINCT test words and joins
  // back to the occurrence stream by word — the occurrence side never
  // re-segments. Segmentation is the PRODUCTION path
  // ([[segmentWithVocab]]: one broadcast rank map, plan constant in
  // vocab size), spec-pinned equal to the rank-order fold chain, so the
  // unrolled DuckDB oracle still replays it exactly.
  def bpeFertility(s: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    val hist = wordHistogram(splitWords(s, dir, train = true).select("word"))
    val (merges, _) = learnMerges(hist, iters)
    val test = splitWords(s, dir, train = false)
    val segmented = segmentWithVocab(test.select(col("word")).distinct(), merges)
      .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
    test.join(segmented, Seq("word"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_syms")).as("n_subwords"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_tokens"))
      .orderBy(col("source"))
  }
}
