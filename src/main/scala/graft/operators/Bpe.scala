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

  /** Apply an ORDERED merge list to a (word, syms) frame — one chained
    * projection (no shuffles, no per-merge actions): the tokenize step
    * a frozen BPE vocab runs at inference/scoring time. */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words) { (df, m) =>
      df.withColumn("syms", mergeSyms(col("syms"), m.lhs, m.rhs))
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
  // better). Merge application runs on DISTINCT test words (one fold
  // pipeline) and joins back to the occurrence stream by word — the
  // occurrence side never re-segments.
  def bpeFertility(s: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    val hist = wordHistogram(splitWords(s, dir, train = true).select("word"))
    val (merges, _) = learnMerges(hist, iters)
    val test = splitWords(s, dir, train = false)
    val segmented = applyMerges(
      test.select(col("word")).distinct()
        .withColumn("syms", concat(split(col("word"), ""), array(lit(EndMark)))),
      merges)
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
