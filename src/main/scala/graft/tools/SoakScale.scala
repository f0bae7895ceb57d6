package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{shingles, tokens}
import graft.operators.{Caches, Compose, Dedup, Similarity}
import graft.sources.Tables

/** 10× scale soak for the dedup family (q26/q51/q62/q65): verifies the
  * banding/capping math's ACTUAL claim — candidate-pair volume grows
  * sub-quadratically in corpus size — by measuring it, not asserting it
  * in a comment. Excluded from `sbt test` (runtime is minutes); run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.SoakScale"
  *
  * Corpus: the sf documents replicated 10×. Copy 0 is verbatim; copy
  * c>0 tags every 3rd token with a copy-group marker `cp{c%5}x`, so
  * every 3-gram of a tagged copy contains a tagged token — gram
  * universes of different copy groups are DISJOINT (no cross-group
  * candidates, like shards of a real crawl), while each copy keeps the
  * original's internal near-dup structure (planted pairs are
  * position-aligned, so identical perturbation preserves their shared
  * grams). Copies c and c+5 (c>0) get the SAME tag and are therefore
  * exact duplicates of each other — planted cross-copy exact dups for
  * the exact tier and stage-2 keeper rule to chew on.
  *
  * Gates (exit code 1 on failure):
  *  - q26 CANDIDATE pairs grow ≤ 10^1.5 ≈ 31.6× for the 10× corpus —
  *    the sub-quadratic claim (quadratic would be ~100×; measured ~7×,
  *    sub-LINEAR, because hot-gram capping bites harder at scale).
  *  - q65 band candidates stay batch-proportional: candidates per batch
  *    document ≤ `bands` at BOTH scales. (A raw 1×-vs-10× ratio would
  *    be misleading here: the planted cross-copy twins are TRUE matches,
  *    and true-match candidates rightly grow with planted dup mass.)
  *  - r10: q71 URL groups ≤ 10^1.5 (one hash shuffle, ~linear output);
  *    q72 WALL ≤ 10^1.5 (hit rows are planted cross-copy leakage —
  *    INFO); q73/q76 perceptual band candidates ≤ 2× the analytic
  *    bound (true pairs + C(n,2)·bands/2^bits) at both scales — the
  *    "8 independent byte buckets" model itself, which caught q76's
  *    run-correlated bits and forced the interleaved banding;
  *    q83/q84 sketch state is gated as a HARD bound (sources×256
  *    registers / 4×512 cells) at both scales — constant-size is the
  *    whole claim — with ~linear wall.
  * Output sizes (q26 verified pairs, q51 labels, q62 sequences) are
  * printed for eyeballing but not gated — they track the planted data,
  * not the engine's join shapes.
  */
object SoakScale {

  /** Candidate-pair count of the capped n-gram pipeline — the DISTINCT
    * (doc_a, doc_b) pairs sharing ≥1 capped gram, i.e. the rows entering
    * q26's upper-bound prune. Mirrors ngramJaccardPairsCappedTokRaw's
    * candidate stage (same keys, same cap). */
  def candidatePairCount(documents: DataFrame, maxDocFreq: Long = 100): Long = {
    val (n, sc) = Caches.scope {
      val g = documents
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(shingles(col("t"), 3)).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
      val hot = g.groupBy(col("gh")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > maxDocFreq).select(col("gh"))
      val capped = Caches.track(g.join(broadcast(hot), Seq("gh"), "left_anti"))
      capped.select(col("doc_id").as("doc_a"), col("gh"))
        .join(capped.select(col("doc_id").as("doc_b"), col("gh")), Seq("gh"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct().count()
    }
    sc.release(); n
  }

  /** Candidate-pair count of the PREFIX pipeline (q69) — the shipped
    * [[Dedup.prefixCandidates]] stage itself, counted. */
  def prefixCandidatePairCount(documents: DataFrame,
                               threshold: Double = 0.5): Long = {
    val (n, sc) = Caches.scope {
      Dedup.prefixCandidates(
        Caches.track(Dedup.gramsFor(documents)), threshold).count()
    }
    sc.release(); n
  }

  /** Near-tier candidate volume of the incremental classifier: distinct
    * (batch doc, corpus doc) pairs sharing a MinHash band key — the rows
    * entering q65's agreement scoring. */
  def bandCandidateCount(newDocs: DataFrame, corpus: DataFrame,
                         k: Int = 12, bands: Int = 4): Long = {
    val (n, sc) = Caches.scope {
      def banded(df: DataFrame) =
        Dedup.hashSigProjection(df, k).filter(col("sig").isNotNull)
          .select(col("doc_id"),
            explode(Dedup.bandKeyStructs(i => element_at(col("sig"), i + 1), k, bands)).as("b"))
          .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
      banded(newDocs).as("x")
        .join(banded(corpus).as("y"), Seq("band", "key"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct().count()
    }
    sc.release(); n
  }

  /** Distinct band-sharing (a, b) pairs of a (doc_id, dhash)-shaped
    * 64-bit hash frame under the 8×8-bit banding — the candidate stage
    * of q73 (images) and q76 (audio). The hash column must be named
    * `dhash` ([[Dedup.imgBanded]]'s contract). */
  def hashBandCandidateCount(hashes: DataFrame): Long =
    bandedCandidateCount(Dedup.imgBanded(hashes))

  /** [[hashBandCandidateCount]] under q76's stride-interleaved audio
    * banding (the hash column must be named `afp`). */
  def afpBandCandidateCount(fps: DataFrame): Long =
    bandedCandidateCount(Dedup.afpBanded(fps))

  private def bandedCandidateCount(bandedPlan: DataFrame): Long = {
    val (n, sc) = Caches.scope {
      val banded = Caches.track(bandedPlan)
      banded.as("a").join(banded.as("b"), Seq("band", "key"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    }
    sc.release(); n
  }

  /** A planted near-dup CHAIN of `n` documents: doc i carries tokens
    * [i·stride, i·stride+len) of one synthetic token stream, so
    * consecutive docs share len−stride tokens (3-gram jaccard
    * (len−stride−2)/(2(len−2)−(len−stride−2)) ≈ 0.58 ≥ 0.5) while
    * skip-1 pairs fall to ≈0.31 < 0.5 — the verified pair graph is a
    * pure PATH of diameter n−1, the worst case for label propagation
    * and exactly what pointer jumping's O(log d) claim is about.
    * Tokens are namespaced (`chainw…`) so the chain's gram universe is
    * disjoint from any co-resident corpus; per-gram doc frequency ≤
    * ⌈len/stride⌉ = 4 ≪ the hot-gram cap, so capping never bites. */
  def chainDocs(spark: SparkSession, n: Int, len: Int = 40,
                stride: Int = 10): DataFrame =
    spark.range(n).select(
      (col("id") + 900000000L).as("doc_id"),
      concat_ws(" ", transform(
        sequence(col("id") * stride, col("id") * stride + (len - 1)),
        j => concat(lit("chainw"), j))).as("text"))
      .repartition(32, col("doc_id"))

  /** Distributed-CC measurement on an n-link chain: (distinct labels,
    * rounds, wall seconds). localSolveMaxEdges=0 forces the distributed
    * loop — the small-subgraph shortcut would otherwise answer locally
    * and measure nothing. */
  def ccChain(spark: SparkSession, n: Int): (Long, Int, Double) = {
    val (res, sc) = graft.operators.Caches.scope {
      val pairs = Dedup.ngramJaccardPairsCappedTokRaw(
        chainDocs(spark, n).select(col("doc_id"), tokens(col("text")).as("t")))
        .select(col("doc_a"), col("doc_b"))
      val t0 = System.nanoTime()
      val (labels, rounds) = Dedup.connectedComponentsCounted(
        pairs, maxIter = 50, localSolveMaxEdges = 0)
      val distinctLabels = labels.select(col("label")).distinct().count()
      (distinctLabels, rounds, (System.nanoTime() - t0) / 1e9)
    }
    sc.release(); spark.catalog.clearCache()
    res
  }

  /** Deterministic POWER-LAW HUB graph as a directed edge list: node i
    * (≥ 2) attaches to the largest power of two ≤ i; powers of two
    * attach to the next power down. One giant component containing
    * every node, hub degrees 2^k (a ~1/d power-law tail with a top hub
    * adjacent to HALF the graph), depth ⌈log₂ n⌉. This is the regime
    * the chain soaks don't reach: a subgraph LARGER than the
    * local-solve bound whose label traffic collapses onto a single
    * min-id key as convergence approaches — the join-skew shape a
    * 100-TB giant component produces. Ids are namespaced (offset) so
    * co-resident fixtures can't collide. `length(bin(i)) - 1` is
    * floor(log₂ i) exactly, all-integer. */
  def hubEdges(spark: SparkSession, n: Long): DataFrame = {
    val hp = expr("shiftleft(1L, length(bin(id)) - 1)")
    spark.range(2, n + 1).select(
      (col("id") + 910000000L).as("doc_a"),
      (when(hp === col("id"), expr("id div 2")).otherwise(hp)
        + 910000000L).as("doc_b"))
      .repartition(32, col("doc_a"))
  }

  /** Distributed-CC measurement on the hub graph: (distinct labels,
    * rounds, wall seconds, edge count). Runs with the DEFAULT
    * `localSolveMaxEdges` — the point is that the bounded probe FALLS
    * THROUGH (edges exceed the bound) and the distributed
    * pointer-jumping path runs, unlike the chain soaks which force it
    * with localSolveMaxEdges = 0. */
  def ccHub(spark: SparkSession, n: Long): (Long, Int, Double, Long) = {
    val (res, sc) = graft.operators.Caches.scope {
      val edges = hubEdges(spark, n)
      val nEdges = edges.count()
      val t0 = System.nanoTime()
      val (labels, rounds) = Dedup.connectedComponentsCounted(edges, maxIter = 50)
      val distinctLabels = labels.select(col("label")).distinct().count()
      (distinctLabels, rounds, (System.nanoTime() - t0) / 1e9, nEdges)
    }
    sc.release(); spark.catalog.clearCache()
    res
  }

  /** In-memory textbook BPE trainer (BpeSpec.refLearn's algorithm) —
    * produces the VALID 1000-merge table the segmenter soak applies.
    * Driver-side on a 2000-word sub-histogram: learning 1000 merges
    * through [[graft.operators.Bpe.learnMerges]] would be 1000
    * sequential Spark jobs (~0.14 s/iter — the floor the 100-iter
    * measurement above records), which would time the DRIVER LOOP, not
    * the segmenter this soak gates. Stops early (loudly, via the size
    * require at the call site) if the pair space exhausts. */
  private def naiveLearn(words: Map[String, Long],
                         iters: Int): Seq[graft.operators.Bpe.Merge] = {
    var state: Map[String, Seq[String]] =
      words.map { case (w, _) =>
        w -> (w.map(_.toString) :+ graft.operators.Bpe.EndMark)
      }
    val merges = Seq.newBuilder[graft.operators.Bpe.Merge]
    var it = 1
    var exhausted = false
    while (it <= iters && !exhausted) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, f) <- words; s = state(w); i <- 0 until s.length - 1)
        pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + f
      if (pc.isEmpty) exhausted = true
      else {
        val ((a, b), c) = pc.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        merges += graft.operators.Bpe.Merge(it.toLong, a, b, c)
        state = state.map { case (w, s) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += s(i); i += 1 }
          }
          w -> out.result()
        }
        it += 1
      }
    }
    merges.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // spread + cached like the real query paths (the raw sf0.1 parquet is
    // one file; an unspread 1× side would serialize every measurement and
    // corrupt the 1×-vs-10× comparison)
    val base = Caches.track(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        .repartition(32, col("doc_id")))
    def copyDF(c: Int): DataFrame =
      if (c == 0) base
      else base.select(
        (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          (t, i) => when(i % 3 === 0, concat(lit(s"cp${c % 5}x"), t)).otherwise(t)))
          .as("text"),
        col("source"))
    // materialized once so every measurement reads identical bytes and no
    // timing includes the corpus synthesis
    val corpus10 = Caches.track(
      (0 until 10).map(copyDF).reduce(_ unionByName _)
        .repartition(32, col("doc_id")))
    val n1 = base.count()
    val n10 = corpus10.count()
    println(s"[soak] corpus: $n1 -> $n10 docs (${n10.toDouble / n1}x)")

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[soak] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def scoped[A](name: String)(body: => A): A = {
      val (r, sc) = Caches.scope(timed(name)(body))
      sc.release(); spark.catalog.clearCache()
      // the corpus caches must survive measurement scopes
      base.cache(); base.count()
      corpus10.cache(); corpus10.count()
      r
    }

    base.count(); corpus10.count() // pin before first measurement
    var failures = 0
    val gate = math.pow(n10.toDouble / n1, 1.5)
    def check(name: String, v1: Long, v10: Long): Unit = {
      val ratio = v10.toDouble / math.max(v1, 1L)
      val ok = ratio <= gate
      if (!ok) failures += 1
      println(f"[soak] RATIO $name%-26s $v1%12d -> $v10%12d  (${ratio}%8.2fx, gate ${gate}%.1fx) ${if (ok) "PASS" else "FAIL"}")
    }
    def info(name: String, v1: Long, v10: Long): Unit =
      println(f"[soak] INFO  $name%-26s $v1%12d -> $v10%12d  (${v10.toDouble / math.max(v1, 1L)}%8.2fx, ungated)")

    // candidate volumes — the sub-quadratic claim itself
    val cand1 = scoped("q26 candidates @1x")(candidatePairCount(base))
    val cand10 = scoped("q26 candidates @10x")(candidatePairCount(corpus10))
    check("q26-candidate-pairs", cand1, cand10)

    // q69 prefix-filter candidates: exact-join candidates, also gated
    val pc1 = scoped("q69 prefix candidates @1x")(prefixCandidatePairCount(base))
    val pc10 = scoped("q69 prefix candidates @10x")(prefixCandidatePairCount(corpus10))
    check("q69-prefix-candidates", pc1, pc10)

    // q26 verified pairs
    val p1 = scoped("q26 pairs @1x")(Dedup.ngramJaccardPairsCappedFor(base).count())
    val p10 = scoped("q26 pairs @10x")(Dedup.ngramJaccardPairsCappedFor(corpus10).count())
    info("q26-verified-pairs", p1, p10) // tracks planted twins, not join shape

    // q51 cluster labeling (corpus-sized output; ratio trivially ~10x —
    // the wall-time print is the signal here)
    val c1 = scoped("q51 clusters @1x")(Dedup.dedupClustersFor(base).count())
    val c10 = scoped("q51 clusters @10x")(Dedup.dedupClustersFor(corpus10).count())
    info("q51-labeled-docs", c1, c10) // trivially corpus-sized

    // q62 composed pipeline end-to-end
    val s1 = scoped("q62 composed @1x")(Compose.qualityDedupPackFor(base).count())
    val s10 = scoped("q62 composed @10x")(Compose.qualityDedupPackFor(corpus10).count())
    println(s"[soak] q62 packed sequences: $s1 -> $s10")

    // q65 incremental classifier: batch = hash-mod 20% of corpus
    def splitBatch(df: DataFrame) = {
      val isNew = graft.operators.Sampling.hashBucket(col("doc_id"), 5) === 4
      (df.filter(isNew), df.filter(!isNew))
    }
    val (b1, co1) = splitBatch(base)
    val (b10, co10) = splitBatch(corpus10)
    val bc1 = scoped("q65 band candidates @1x")(bandCandidateCount(b1, co1))
    val bc10 = scoped("q65 band candidates @10x")(bandCandidateCount(b10, co10))
    info("q65-band-candidates", bc1, bc10) // true twins grow with dup mass
    // batch-proportionality gate: candidates PER BATCH DOC bounded by the
    // band count at both scales (corpus-proportional false positives
    // would scale this with |corpus| and blow through it)
    Seq(("q65-cand-per-batch-doc @1x", bc1, b1.count()),
        ("q65-cand-per-batch-doc @10x", bc10, b10.count())).foreach {
      case (name, c, nb) =>
        val perDoc = c.toDouble / math.max(nb, 1L)
        val ok = perDoc <= 4.0
        if (!ok) failures += 1
        println(f"[soak] RATIO $name%-26s ${perDoc}%8.3f cand/doc (gate 4.0) ${if (ok) "PASS" else "FAIL"}")
    }
    scoped("q65 classify @1x")(Dedup.incrementalDedupFor(b1, co1).count())
    scoped("q65 classify @10x")(Dedup.incrementalDedupFor(b10, co10).count())

    // --- r10: q71 canonical-URL dedup — pure per-row normalize + ONE
    // hash shuffle; output groups must track corpus size ~linearly
    def urlGroups(df: DataFrame): Long = {
      val (n, sc) = Caches.scope {
        Dedup.urlNormalizedDedupFor(
          df.select(col("doc_id"), Dedup.syntheticUrl.as("url"))).count()
      }
      sc.release(); n
    }
    val u1 = scoped("q71 url groups @1x")(urlGroups(base))
    val u10 = scoped("q71 url groups @10x")(urlGroups(corpus10))
    check("q71-url-groups", u1, u10)

    // --- r10: q72 decontamination — eval gram index broadcast, train
    // gram stream never shuffles. HIT rows are TRUE planted leakage
    // here, not engine fan-out: the per-copy eval split puts a doc's
    // exact cross-copy twin (copies c and c+5 share a tag) on the train
    // side whenever the hash marks only one of them eval, so every such
    // split is a guaranteed full-document hit and hit volume grows with
    // planted dup mass (measured ~87× — the q26-verified-pairs
    // situation, INFO not gate). The engine claim that CAN be gated is
    // wall: the broadcast-probe shape must stay ~linear in the train
    // stream (a shuffle sneaking in would show super-linear wall).
    def deconHits(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope {
        import graft.functions.TextFunctions.tokens
        val g = Caches.track(df
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 8)
          .withColumn("_eval",
            graft.operators.Sampling.hashBucket(col("doc_id"), 10) === 0))
        graft.operators.Sampling.contaminationHits(
          g.filter(!col("_eval")).select(col("doc_id"), col("t")),
          graft.operators.Sampling.benchmarkGramIndex(
            g.filter(col("_eval")).select(col("doc_id"), col("t")))).count()
      }
      sc.release(); (n, (System.nanoTime() - t0) / 1e9)
    }
    val (d1, dw1) = scoped("q72 hit rows @1x")(deconHits(base))
    val (d10, dw10) = scoped("q72 hit rows @10x")(deconHits(corpus10))
    info("q72-contamination-hits", d1, d10) // planted cross-copy leakage
    val wallRatio = dw10 / math.max(dw1, 1e-9)
    val wallOk = wallRatio <= gate
    if (!wallOk) failures += 1
    println(f"[soak] RATIO q72-wall                   ${dw1}%.2f -> ${dw10}%.2f s (${wallRatio}%.2fx, gate ${gate}%.1fx) ${if (wallOk) "PASS" else "FAIL"}")

    // --- r10: q73/q76 perceptual band joins. Copy offsets shift ids by
    // c·10⁶ ≡ c (mod 3), so every copy contributes its own third of ids
    // to each modality slot: media counts grow 10× but with the SAME
    // planted 21/17-base structure, so TRUE pairs grow ~quadratically
    // in planted dup mass — a raw ratio gate would punish the fixture,
    // not the engine. The engine claim
    // to pin is the banding math itself: candidates never exceed
    //   2 × (true pairs + C(n,2) · bands/2^bits)
    // — the analytic random-collision bound (8 byte-bands ⇒ ~8/256 of
    // uncorrelated pairs share a band) plus the planted dup mass. A
    // blowup beyond that factor-2 slack means the banding stopped
    // behaving like 8 independent byte buckets. At 100-TB image counts
    // the production tuning is wider band keys (e.g. 4×16 bits, exact
    // for hamming ≤ 3) — documented in SCALE.md; the bound form is the
    // same.
    def bandGate(name: String, nMedia: Long, cands: Long, truePairs: Long): Unit = {
      val bound = 2.0 * (truePairs + nMedia.toDouble * (nMedia - 1) / 2.0 * 8.0 / 256.0)
      val ok = cands <= bound
      if (!ok) failures += 1
      println(f"[soak] RATIO $name%-26s $cands%12d cand (≤ ${bound}%12.0f analytic bound; true=$truePairs) ${if (ok) "PASS" else "FAIL"}")
    }
    import spark.implicits._
    def mediaIds(df: DataFrame, slot: Int): org.apache.spark.sql.Dataset[Long] =
      df.select(col("doc_id")).filter(pmod(col("doc_id"), lit(3)) === slot)
        .as[Long]
    def imgPairs(df: DataFrame): (Long, Long, Long) = {
      val ids = mediaIds(df, 0)
      val n = ids.count()
      val hashes = Caches.track(
        graft.operators.Multimodal.imageDHashesFor(spark, ids)
          .select(col("media_id").as("doc_id"), col("dhash")))
      val cands = hashBandCandidateCount(hashes)
      val truePairs = hashes.as("a").join(hashes.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))) <= 6)
        .count() // brute force is fine at soak scale; candidates are the claim
      (n, cands, truePairs)
    }
    def audioPairs(df: DataFrame): (Long, Long, Long) = {
      val ids = mediaIds(df, 1)
      val n = ids.count()
      val fps = Caches.track(ids.mapPartitions { it =>
        import graft.operators.Multimodal.MediaCodec
        it.map(id => (id, MediaCodec.audioFingerprint64(
          MediaCodec.pcmSamples(MediaCodec.wavNearFor(id)))))
      }.toDF("doc_id", "afp"))
      val cands = afpBandCandidateCount(fps)
      val truePairs = fps.as("a").join(fps.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.afp").bitwiseXOR(col("b.afp"))) <= 4)
        .count()
      (n, cands, truePairs)
    }
    val (in1, ic1, it1) = scoped("q73 img band cands @1x")(imgPairs(base))
    val (in10, ic10, it10) = scoped("q73 img band cands @10x")(imgPairs(corpus10))
    println(s"[soak] q73 images: $in1 -> $in10; true pairs $it1 -> $it10")
    bandGate("q73-img-cands @1x", in1, ic1, it1)
    bandGate("q73-img-cands @10x", in10, ic10, it10)
    def videoPairs(df: DataFrame): (Long, Long, Long) = {
      val ids = mediaIds(df, 2)
      val n = ids.count()
      val hashes = Caches.track(ids.mapPartitions { it =>
        import graft.operators.Multimodal.MediaCodec
        it.map(id => (id, MediaCodec.vHash64(MediaCodec.rawvNearFor(id))))
      }.toDF("doc_id", "dhash"))
      val cands = hashBandCandidateCount(hashes)
      val truePairs = hashes.as("a").join(hashes.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))) <= 6)
        .count()
      (n, cands, truePairs)
    }
    val (vn1, vc1, vt1) = scoped("q77 video band cands @1x")(videoPairs(base))
    val (vn10, vc10, vt10) = scoped("q77 video band cands @10x")(videoPairs(corpus10))
    println(s"[soak] q77 videos: $vn1 -> $vn10; true pairs $vt1 -> $vt10")
    bandGate("q77-video-cands @1x", vn1, vc1, vt1)
    bandGate("q77-video-cands @10x", vn10, vc10, vt10)
    val (an1, ac1, at1) = scoped("q76 audio band cands @1x")(audioPairs(base))
    val (an10, ac10, at10) = scoped("q76 audio band cands @10x")(audioPairs(corpus10))
    println(s"[soak] q76 clips: $an1 -> $an10; true pairs $at1 -> $at10")
    bandGate("q76-audio-cands @1x", an1, ac1, at1)
    bandGate("q76-audio-cands @10x", an10, ac10, at10)

    // --- r10: q80 chunking + q81 chunk packing. The copy transform
    // REWRITES tokens but never changes per-doc token counts, so chunk
    // rows and packed-sequence counts must both scale exactly ~10× —
    // any superlinearity would be engine fan-out (the chunker has no
    // join to fan out through; the packer's range scan is the claim).
    def chunks(df: DataFrame): DataFrame =
      graft.operators.TextOps.docChunksRaw(
        df.select(col("doc_id"), col("text")), maxLen = 32, stride = 24)
    val ch1 = scoped("q80 chunk rows @1x")(chunks(base).count())
    val ch10 = scoped("q80 chunk rows @10x")(chunks(corpus10).count())
    check("q80-chunk-rows", ch1, ch10)
    def packed(df: DataFrame): Long = graft.operators.Packing
      .packSequencesCounts(chunks(df).select(
        concat_ws(":", col("doc_id"), col("chunk_idx")).as("doc_id"),
        col("n_tokens").as("_nt")), budget = 64L).count()
    val pk1 = scoped("q81 sequences @1x")(packed(base))
    val pk10 = scoped("q81 sequences @10x")(packed(corpus10))
    check("q81-packed-sequences", pk1, pk10)

    // --- r11: q87 line dedup. THE claim is that the frequency pass's
    // exchange is bounded by DISTINCT (line-hash, doc) pairs (partial
    // agg collapses within-partition repeats) — gated as the ~linear
    // ratio of that pair count — and that end-to-end wall stays
    // ~linear. Boilerplate-line counts are INFO'd (they track planted
    // dup mass: the copy groups rewrite tokens, so cross-copy lines
    // never collide; within-copy structure is what repeats).
    import graft.functions.TextFunctions.md5Long
    def linePairs(df: DataFrame): Long = {
      val (n, sc) = Caches.scope {
        graft.operators.TextOps.docLines(
          df.select(col("doc_id"), col("text")), 10)
          .select(md5Long(col("line")).as("lh"), col("doc_id"))
          .distinct().count()
      }
      sc.release(); n
    }
    def lineDedupWall(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope {
        graft.operators.TextOps.lineDedupFor(
          df.select(col("doc_id"), col("text")))
          .filter(col("n_removed") > 0).count()
      }
      sc.release(); (n, (System.nanoTime() - t0) / 1e9)
    }
    val lp1 = scoped("q87 line pairs @1x")(linePairs(base))
    val lp10 = scoped("q87 line pairs @10x")(linePairs(corpus10))
    check("q87-line-doc-pairs", lp1, lp10)
    val (lb1, lw1) = scoped("q87 wall @1x")(lineDedupWall(base))
    val (lb10, lw10) = scoped("q87 wall @10x")(lineDedupWall(corpus10))
    info("q87-docs-with-removal", lb1, lb10)
    val lineWallRatio = lw10 / math.max(lw1, 1e-9)
    val lineWallOk = lineWallRatio <= gate
    if (!lineWallOk) failures += 1
    println(f"[soak] RATIO q87-wall                   ${lw1}%.2f -> ${lw10}%.2f s (${lineWallRatio}%.2fx, gate ${gate}%.1fx) ${if (lineWallOk) "PASS" else "FAIL"}")

    // --- r12: q95 intra-doc repeated-gram scrub. THE claim: every
    // exchange is keyed by (doc_id, gram-hash) or doc_id — token-
    // stream-proportional, never pair-quadratic — so wall stays ~linear
    // at 10× corpus, and the output keeps its row-per-doc invariant
    // (the gate that catches an accidental cross-doc join fanout).
    def selfDedupWall(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope {
        graft.operators.TextOps.repeatedGramScrubFor(df).count()
      }
      sc.release(); spark.catalog.clearCache()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (sd1, sdw1) = scoped("q95 scrub @1x")(selfDedupWall(base))
    val (sd10, sdw10) = scoped("q95 scrub @10x")(selfDedupWall(corpus10))
    val sdRowsOk = sd1 == n1 && sd10 == n10
    if (!sdRowsOk) failures += 1
    println(f"[soak] RATIO q95-row-per-doc               $sd1%7d /  $sd10%11d  (want $n1/$n10) ${if (sdRowsOk) "PASS" else "FAIL"}")
    val sdWallRatio = sdw10 / math.max(sdw1, 1e-9)
    val sdWallOk = sdWallRatio <= gate
    if (!sdWallOk) failures += 1
    println(f"[soak] RATIO q95-wall                   ${sdw1}%.2f -> ${sdw10}%.2f s (${sdWallRatio}%.2fx, gate ${gate}%.1fx) ${if (sdWallOk) "PASS" else "FAIL"}")

    // --- r12: q99 CROSS-doc exact-substring scrub. Same exchange claim
    // as q95 (gram-hash partial-agg + equi-join, doc-keyed windows),
    // but the 10× corpus is ADVERSARIAL here, not just bigger: every
    // copy-group doc has an exact twin (c and c+5 share the same token
    // rewrite), so ~9/10 of all positions become repeats and the
    // repeat-hit volume is corpus-proportional — the worst legal load.
    // Wall must stay ~linear; rows keep the per-doc invariant.
    def crossDedupWall(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope {
        graft.operators.TextOps.crossDocGramScrubFor(df).count()
      }
      sc.release(); spark.catalog.clearCache()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (cd1, cdw1) = scoped("q99 scrub @1x")(crossDedupWall(base))
    val (cd10, cdw10) = scoped("q99 scrub @10x")(crossDedupWall(corpus10))
    val cdRowsOk = cd1 == n1 && cd10 == n10
    if (!cdRowsOk) failures += 1
    println(f"[soak] RATIO q99-row-per-doc               $cd1%7d /  $cd10%11d  (want $n1/$n10) ${if (cdRowsOk) "PASS" else "FAIL"}")
    val cdWallRatio = cdw10 / math.max(cdw1, 1e-9)
    val cdWallOk = cdWallRatio <= gate
    if (!cdWallOk) failures += 1
    println(f"[soak] RATIO q99-wall                   ${cdw1}%.2f -> ${cdw10}%.2f s (${cdWallRatio}%.2fx, gate ${gate}%.1fx) ${if (cdWallOk) "PASS" else "FAIL"}")

    // --- r12: q100 quality quota. THE claim: the two-stage top-k keeps
    // every per-task sort bounded (stage 1 by bucket population, stage
    // 2 by salts·k) so wall stays ~linear as sources grow 10× deeper;
    // output rows stay pinned to the source count (copyDF keeps the
    // same 20 sources) and n_kept never exceeds k.
    def quotaWall(df: DataFrame): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val (r, sc) = Caches.scope {
        val rows = graft.operators.Sampling.qualityQuotaFor(df, k = 10)
          .agg(count(lit(1)), max(col("n_kept"))).head
        (rows.getLong(0), rows.getLong(1))
      }
      sc.release(); spark.catalog.clearCache()
      (r._1, r._2, (System.nanoTime() - t0) / 1e9)
    }
    val (qs1, qk1, qw1) = scoped("q100 quota @1x")(quotaWall(base))
    val (qs10, qk10, qw10) = scoped("q100 quota @10x")(quotaWall(corpus10))
    val quotaRowsOk = qs1 == qs10 && qk1 <= 10 && qk10 <= 10
    if (!quotaRowsOk) failures += 1
    println(f"[soak] RATIO q100-source-rows              $qs1%7d /  $qs10%11d  (max kept $qk1/$qk10, want equal rows, kept <= 10) ${if (quotaRowsOk) "PASS" else "FAIL"}")
    val quotaWallRatio = qw10 / math.max(qw1, 1e-9)
    val quotaWallOk = quotaWallRatio <= gate
    if (!quotaWallOk) failures += 1
    println(f"[soak] RATIO q100-wall                  ${qw1}%.2f -> ${qw10}%.2f s (${quotaWallRatio}%.2fx, gate ${gate}%.1fx) ${if (quotaWallOk) "PASS" else "FAIL"}")

    // --- r12: q101 bigram LM. THE claim: the corpus is touched twice
    // (unigram fit, pair stream) and the bigram join carries distinct
    // (doc, transition) rows — all token-stream-proportional, so wall
    // stays ~linear at 10× even though the copy transform grows the
    // vocabulary (and the bigram table) with it. Row-per-scorable-doc
    // invariant (every corpus doc has ≥ 2 tokens).
    def lmWall(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope {
        graft.operators.TextOps.bigramLmScoreFor(df).count()
      }
      sc.release(); spark.catalog.clearCache()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (lm1, lmw1) = scoped("q101 lm score @1x")(lmWall(base))
    val (lm10, lmw10) = scoped("q101 lm score @10x")(lmWall(corpus10))
    val lmRowsOk = lm1 == n1 && lm10 == n10
    if (!lmRowsOk) failures += 1
    println(f"[soak] RATIO q101-row-per-doc              $lm1%7d /  $lm10%11d  (want $n1/$n10) ${if (lmRowsOk) "PASS" else "FAIL"}")
    val lmWallRatio = lmw10 / math.max(lmw1, 1e-9)
    val lmWallOk = lmWallRatio <= gate
    if (!lmWallOk) failures += 1
    println(f"[soak] RATIO q101-wall                  ${lmw1}%.2f -> ${lmw10}%.2f s (${lmWallRatio}%.2fx, gate ${gate}%.1fx) ${if (lmWallOk) "PASS" else "FAIL"}")

    // --- r13: q103 shard writer. TWO claims: (a) shard COUNT scales
    // linearly with token mass — the fixed seq-range partitioning means
    // 10× corpus ⇒ ~10× shards, never wider shards or a single fat
    // tail; (b) the written artifact is a pure function of CONTENT —
    // the identical per-shard report (hashes included) when the input
    // arrives in a different partition layout, which is exactly the
    // cross-cluster determinism a 1000-executor run needs. Wall gated
    // ~linear like every corpus-scale pass.
    def shardRun(df: DataFrame, sub: String, parts: Int): (Seq[Seq[Any]], Double) = {
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_shards_soak_$sub").getAbsolutePath
      val t0 = System.nanoTime()
      val (rep, sc) = Caches.scope {
        graft.operators.Packing.writeShardsFor(
          df.repartition(parts, col("doc_id")).select(col("doc_id"), col("text")),
          budget = 512, seqsPerShard = 8, path = path)
          .collect().toSeq.map(_.toSeq)
      }
      sc.release(); spark.catalog.clearCache()
      base.cache(); base.count(); corpus10.cache(); corpus10.count()
      (rep, (System.nanoTime() - t0) / 1e9)
    }
    val (sh1, shw1) = scoped("q103 shards @1x")(shardRun(base, "1a", 32))
    val (sh1b, _) = scoped("q103 shards @1x relayout")(shardRun(base, "1b", 5))
    val shDetOk = sh1 == sh1b
    if (!shDetOk) failures += 1
    println(s"[soak] RATIO q103-layout-determinism     ${sh1.size} shards, " +
      s"reports ${if (shDetOk) "IDENTICAL PASS" else "DIVERGED FAIL"}")
    val (sh10, shw10) = scoped("q103 shards @10x")(shardRun(corpus10, "10", 32))
    check("q103-shard-count", sh1.size.toLong, sh10.size.toLong)
    val shWallRatio = shw10 / math.max(shw1, 1e-9)
    val shWallOk = shWallRatio <= gate
    if (!shWallOk) failures += 1
    println(f"[soak] RATIO q103-wall                  ${shw1}%.2f -> ${shw10}%.2f s (${shWallRatio}%.2fx, gate ${gate}%.1fx) ${if (shWallOk) "PASS" else "FAIL"}")

    // --- r11: q90 BPE trainer. THE claim is that after the one
    // corpus-scale word-count pass, every merge iteration runs on the
    // HISTOGRAM — so the trainer's wall must stay ~linear in corpus
    // size even though the copy transform grows the vocabulary ~10×
    // (rewritten tokens are disjoint across copy groups). Histogram
    // rows are INFO'd (they track the copy-group vocab growth).
    def bpeWall(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope {
        val hist = graft.operators.Bpe.wordHistogram(
          df.select(explode(tokens(col("text"))).as("word")))
        val (merges, fin) = graft.operators.Bpe.learnMerges(hist, iters = 3)
        require(merges.size == 3)
        // count the CHECKPOINTED final state (same row count as the
        // histogram) — counting `hist` would re-run the corpus pass
        fin.count()
      }
      sc.release(); spark.catalog.clearCache(); (n, (System.nanoTime() - t0) / 1e9)
    }
    val (bh1, bpeW1) = scoped("q90 bpe 3-iter @1x")(bpeWall(base))
    val (bh10, bpeW10) = scoped("q90 bpe 3-iter @10x")(bpeWall(corpus10))
    info("q90-histogram-rows", bh1, bh10)
    val bpeWallRatio = bpeW10 / math.max(bpeW1, 1e-9)
    val bpeWallOk = bpeWallRatio <= gate
    if (!bpeWallOk) failures += 1
    println(f"[soak] RATIO q90-wall                   ${bpeW1}%.2f -> ${bpeW10}%.2f s (${bpeWallRatio}%.2fx, gate ${gate}%.1fx) ${if (bpeWallOk) "PASS" else "FAIL"}")

    // --- r12: q90 trainer ITERATION latency. The corpus gate above
    // proves wall ~flat in corpus size at 3 iters; this measures the
    // per-iteration driver-loop floor (one pair-count job + one 1-row
    // collect + one localCheckpoint per merge) at 100 iters — the
    // number SCALE.md's production-vocab decision is recorded against
    // (32k merges × this floor = the sequential trainer's driver-bound
    // cost). INFO, not a gate: the floor is Spark job-scheduling
    // latency, a property of the box, not of the plan shapes this soak
    // exists to pin.
    val iters100 = 100
    val t100 = System.nanoTime()
    val (m100, sc100) = Caches.scope {
      val hist = graft.operators.Bpe.wordHistogram(
        base.select(explode(tokens(col("text"))).as("word")))
      graft.operators.Bpe.learnMerges(hist, iters100)._1
    }
    sc100.release(); spark.catalog.clearCache()
    val w100 = (System.nanoTime() - t100) / 1e9
    require(m100.size == iters100)
    println(f"[soak] INFO  q90-100-iter-wall           ${w100}%.2f s (${w100 / iters100}%.4f s/iter driver-loop floor)")

    // --- r13: BATCHED trainer (the recorded remedy for that floor —
    // selectNonInteracting folds up to 8 disjoint pairs per round, so
    // 100 merges cost ~13 driver round-trips instead of 100). Gated as
    // a RATIO on wall vs the sequential 100-iter run just measured on
    // the same box in the same JVM: the batch must recover at least 2×
    // (measured ~4-6×; the non-driver component — pair-count job +
    // fold — is shared, so k× round-trips never means k× wall).
    val tB = System.nanoTime()
    val (mB, scB) = Caches.scope {
      val hist = graft.operators.Bpe.wordHistogram(
        base.select(explode(tokens(col("text"))).as("word")))
      graft.operators.Bpe.learnMergesBatched(hist, iters100, batch = 8)._1
    }
    scB.release(); spark.catalog.clearCache()
    val wB = (System.nanoTime() - tB) / 1e9
    require(mB.size == iters100)
    val bSpeedup = w100 / math.max(wB, 1e-9)
    val bOk = bSpeedup >= 2.0
    if (!bOk) failures += 1
    println(f"[soak] RATIO q90-batched-100-wall        ${wB}%.2f s vs sequential ${w100}%.2f s (${bSpeedup}%.2fx speedup, floor 2.0x) ${if (bOk) "PASS" else "FAIL"}")

    // --- r12: q91 frozen-vocab segmenter (the production tokenize
    // path). THE claim is O(1)-in-V wall: segmenting the same word
    // stream under a 1000-merge table must cost ≤2.5× the 100-merge
    // prefix of the SAME table (per-word work tracks word length and
    // fired merges — more merges legitimately FIRE under the bigger
    // table, bounded by word length — never table size; the fold-chain
    // applyMerges would be ~10× and cannot even analyze at 32k).
    // Equality with rank-order application is BpeSpec's job; the soak
    // gates the wall shape, min-of-3 so sub-second walls don't
    // false-positive on box jitter. Corpus scaling of the same path is
    // gated ~linear alongside.
    //
    // The RAW corpus vocabulary is 31 distinct words (138 chars) — its
    // BPE pair space exhausts at ~107 merges, so a 1000-merge table
    // cannot exist over it. Both the histogram and the segmented stream
    // therefore use an AUGMENTED word family: every token occurrence
    // gets one of 64 deterministic 3-hex-char md5 suffixes (keyed by
    // word + a positional hash), giving a ~2k-word vocabulary whose
    // pair space supports >1200 merges while the stream still scales
    // 1:1 with corpus tokens (~1.2M rows at 1×) — so the walls time
    // real per-row segmentation throughput, not 31-row fixed overhead.
    def augWords(df: DataFrame): DataFrame =
      df.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "word")))
        .filter(length(col("word")) > 0)
        .select(concat(col("word"), substring(
          md5(concat(col("word"), pmod(xxhash64(col("doc_id"), col("pos")), lit(64)))),
          1, 3)).as("word"))
    val topHist = augWords(base)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(2000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges1k = naiveLearn(topHist, 1000)
    require(merges1k.size == 1000, s"expected 1000 merges, got ${merges1k.size}")
    def segWall(df: DataFrame, merges: Seq[graft.operators.Bpe.Merge]): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val (_, sc) = Caches.scope {
          graft.operators.Bpe.segmentWithVocab(augWords(df), merges)
            .select(sum(size(col("syms")))).collect()
        }
        sc.release()
        (System.nanoTime() - t0) / 1e9
      }.min
    val segW100 = timed("q91 segment 100-merge @1x")(segWall(base, merges1k.take(100)))
    val segW1k = timed("q91 segment 1000-merge @1x")(segWall(base, merges1k))
    val vRatio = segW1k / math.max(segW100, 1e-9)
    val vOk = vRatio <= 2.5
    if (!vOk) failures += 1
    println(f"[soak] RATIO q91-segmenter-10xV-wall    ${segW100}%.2f -> ${segW1k}%.2f s (${vRatio}%.2fx for 10x the merge table, gate 2.5x) ${if (vOk) "PASS" else "FAIL"}")
    val segW1k10 = timed("q91 segment 1000-merge @10x")(segWall(corpus10, merges1k))
    val segCorpusRatio = segW1k10 / math.max(segW1k, 1e-9)
    val segCorpusOk = segCorpusRatio <= gate
    if (!segCorpusOk) failures += 1
    println(f"[soak] RATIO q91-segmenter-wall         ${segW1k}%.2f -> ${segW1k10}%.2f s (${segCorpusRatio}%.2fx, gate ${gate}%.1fx) ${if (segCorpusOk) "PASS" else "FAIL"}")

    // --- r12: ANN RECALL gate (q31 LSH / q38 IVF vs q29 brute force).
    // The declared queries are oracle-EXACT against literal planes /
    // centroids — both engines make identical banding and probe
    // decisions — but nothing gated RECALL: a parameter drift (fewer
    // bands, narrower probes, a centroid refit) would pass every hash
    // check while silently losing true neighbors. Gate: top-5 set
    // recall vs [[Similarity.bruteForceTopKFor]] on the SAME frame, at
    // 1× and at a 10× corpus (copies carry a small deterministic
    // per-copy angular jitter). Both ANN paths rescore candidates with
    // the identical cosine+tiebreak ranking as brute force, so recall
    // measures exactly the candidate-generation loss. The two scales
    // gate complementary properties — recall is fully deterministic
    // (hash planes / literal centroids, no RNG), so the floors sit just
    // under the measured values and any drop is a real drift:
    //  @1×  — organic-corpus loss: measured LSH 0.940 (floor 0.90) and
    //         IVF at the r13 measured-curve default nProbe=12/16 0.900
    //         (floor 0.85; the full recall/cost curve lives in
    //         Similarity.DefaultNProbe's doc and SCALE.md — the gate
    //         pins the default from silently getting WORSE).
    //  @10× — planted near-tie recovery: every query's 9 jittered
    //         copies are ~0.9999-cosine neighbors that dominate top-5;
    //         both paths must recover them through the SAME buckets/
    //         cells (measured 1.000, floor 0.95) — a banding change
    //         that splits near-identical vectors across buckets fails
    //         here even if @1× recall survives.
    val embBase = Caches.track(
      Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .repartition(32, col("vec_id")))
    def embCopy(c: Int): DataFrame =
      if (c == 0) embBase
      else embBase.select(
        (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> cast(x * (1.0 + 0.002 * (((i + $c * 31) % 7) - 3)) as float))")
          .as("embedding"))
    val emb10 = Caches.track(
      (0 until 10).map(embCopy).reduce(_ unionByName _)
        .repartition(32, col("vec_id")))
    emb10.count()
    def recallOf(name: String, e: DataFrame,
                 ann: DataFrame => DataFrame, floor: Double): Double = {
      val (r, sc) = Caches.scope {
        val truth = Caches.track(Similarity.bruteForceTopKFor(spark, e)
          .select(col("query_id"), col("vec_id")))
        val got = ann(e).select(col("query_id"), col("vec_id"))
        val denom = truth.count()
        got.join(truth, Seq("query_id", "vec_id")).count().toDouble /
          math.max(denom, 1L)
      }
      sc.release(); spark.catalog.clearCache()
      base.cache(); base.count(); corpus10.cache(); corpus10.count()
      embBase.cache(); embBase.count(); emb10.cache(); emb10.count()
      val ok = r >= floor
      if (!ok) failures += 1
      println(f"[soak] RATIO $name%-26s recall@5 = $r%.3f (floor $floor%.2f) ${if (ok) "PASS" else "FAIL"}")
      r
    }
    recallOf("q31-lsh-recall @1x", embBase,
      e => Similarity.lshTopKFor(spark, e), 0.90)
    recallOf("q31-lsh-recall @10x", emb10,
      e => Similarity.lshTopKFor(spark, e), 0.95)
    recallOf("q38-ivf-recall @1x", embBase,
      e => Similarity.ivfTopKFor(spark, e), 0.85)
    recallOf("q38-ivf-recall @10x", emb10,
      e => Similarity.ivfTopKFor(spark, e), 0.95)

    // --- r10c: q83/q84 sketches. THE claim is constant-size state:
    // HLL register rows are hard-bounded by sources×256 and CMS cells
    // by 4×512 AT ANY CORPUS SIZE — gated as absolute bounds, not
    // ratios (the sketch frames can only fill IN, never grow OUT).
    // Wall must stay ~linear (the only corpus-sized stage is the
    // per-row hash projection + one partial-agg'd shuffle).
    import graft.operators.{Sketches => Sk}
    def hllRegRows(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope {
        Sk.shingleHashRows(df, Seq("source"))
          .withColumn("bucket", col("hv") % Sk.HllM)
          .withColumn("rho", Sk.rhoExpr)
          .groupBy(col("source"), col("bucket")).agg(max(col("rho")).as("mj"))
          .count()
      }
      sc.release(); (n, (System.nanoTime() - t0) / 1e9)
    }
    def cmsCellRows(df: DataFrame): (Long, Double) = {
      Sk.bigramsReg(df.sparkSession)
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope {
        Sk.cmsCells(
          df.select(explode(Sk.bigrams(tokens(col("text")))).as("bigram"))
            .groupBy(col("bigram")).agg(count(lit(1)).as("n"))).count()
      }
      sc.release(); (n, (System.nanoTime() - t0) / 1e9)
    }
    val nSources = base.select(col("source")).distinct().count()
    val (hr1, hw1) = scoped("q83 register rows @1x")(hllRegRows(base))
    val (hr10, hw10) = scoped("q83 register rows @10x")(hllRegRows(corpus10))
    def boundGate(name: String, v: Long, bound: Long): Unit = {
      val ok = v <= bound
      if (!ok) failures += 1
      println(f"[soak] RATIO $name%-26s $v%12d rows (hard bound $bound) ${if (ok) "PASS" else "FAIL"}")
    }
    boundGate("q83-registers @1x", hr1, nSources * Sk.HllM)
    boundGate("q83-registers @10x", hr10, nSources * Sk.HllM)
    val hllWallRatio = hw10 / math.max(hw1, 1e-9)
    val hllWallOk = hllWallRatio <= gate
    if (!hllWallOk) failures += 1
    println(f"[soak] RATIO q83-wall                   ${hw1}%.2f -> ${hw10}%.2f s (${hllWallRatio}%.2fx, gate ${gate}%.1fx) ${if (hllWallOk) "PASS" else "FAIL"}")
    val (cc1r, cw1) = scoped("q84 cms cells @1x")(cmsCellRows(base))
    val (cc10r, cw10) = scoped("q84 cms cells @10x")(cmsCellRows(corpus10))
    boundGate("q84-cms-cells @1x", cc1r, (Sk.CmsRows * Sk.CmsW).toLong)
    boundGate("q84-cms-cells @10x", cc10r, (Sk.CmsRows * Sk.CmsW).toLong)
    val cmsWallRatio = cw10 / math.max(cw1, 1e-9)
    val cmsWallOk = cmsWallRatio <= gate
    if (!cmsWallOk) failures += 1
    println(f"[soak] RATIO q84-wall                   ${cw1}%.2f -> ${cw10}%.2f s (${cmsWallRatio}%.2fx, gate ${gate}%.1fx) ${if (cmsWallOk) "PASS" else "FAIL"}")

    // --- r10d: q85 bloom. The bit set can NEVER exceed m — corpus
    // growth fills the bitmap IN, it can't grow it OUT (hard bound,
    // like the HLL/CMS frames). Probe survivors (the rows that would
    // reach the exact verifier) are INFO: they track true contamination
    // plus the fp load the audit exists to report.
    def bloomCounts(df: DataFrame): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val ((bitsN, posN), sc) = Caches.scope {
        val g = df
          .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
          .filter(size(col("t")) >= Sk.ShingleK)
          .withColumn("_eval",
            graft.operators.Sampling.hashBucket(col("doc_id"), 10) === 0)
        val eg = g.filter(col("_eval"))
          .select(explode(shingles(col("t"), Sk.ShingleK)).as("gram"))
          .distinct()
        val tg = g.filter(!col("_eval"))
          .select(col("source"),
            explode(shingles(col("t"), Sk.ShingleK)).as("gram"))
          .distinct()
        val bits = Caches.track(Sk.bloomBits(eg))
        (bits.count(), Sk.bloomProbe(tg, bits, "gram").count())
      }
      sc.release(); (bitsN, posN, (System.nanoTime() - t0) / 1e9)
    }
    val (bb1, bp1, bw1) = scoped("q85 bloom bits+probe @1x")(bloomCounts(base))
    val (bb10, bp10, bw10) = scoped("q85 bloom bits+probe @10x")(bloomCounts(corpus10))
    boundGate("q85-bloom-bits @1x", bb1, Sk.BloomM.toLong)
    boundGate("q85-bloom-bits @10x", bb10, Sk.BloomM.toLong)
    info("q85-bloom-positive", bp1, bp10)
    val bloomWallRatio = bw10 / math.max(bw1, 1e-9)
    val bloomWallOk = bloomWallRatio <= gate
    if (!bloomWallOk) failures += 1
    println(f"[soak] RATIO q85-wall                   ${bw1}%.2f -> ${bw10}%.2f s (${bloomWallRatio}%.2fx, gate ${gate}%.1fx) ${if (bloomWallOk) "PASS" else "FAIL"}")

    // --- r10e: q86 histogram — the fourth constant-size frame: ≤256
    // bin rows at any corpus size, ~linear wall (one projection + one
    // partial-agg'd 256-row shuffle).
    def histBinRows(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val (n, sc) = Caches.scope { Sk.lengthBins(df).count() }
      sc.release(); (n, (System.nanoTime() - t0) / 1e9)
    }
    val (hb1, hbw1) = scoped("q86 bin rows @1x")(histBinRows(base))
    val (hb10, hbw10) = scoped("q86 bin rows @10x")(histBinRows(corpus10))
    boundGate("q86-hist-bins @1x", hb1, Sk.HistB.toLong)
    boundGate("q86-hist-bins @10x", hb10, Sk.HistB.toLong)
    val histWallRatio = hbw10 / math.max(hbw1, 1e-9)
    val histWallOk = histWallRatio <= gate
    if (!histWallOk) failures += 1
    println(f"[soak] RATIO q86-wall                   ${hbw1}%.2f -> ${hbw10}%.2f s (${histWallRatio}%.2fx, gate ${gate}%.1fx) ${if (histWallOk) "PASS" else "FAIL"}")

    // --- connected-components mechanics: planted chains (q51/q70's
    // engine). Two gates beyond candidate volume:
    //  1. O(log diameter): a 1000-link path must converge in ≤ 12
    //     distributed rounds (log₂(1000) ≈ 10 + settle; plain
    //     propagation would need ~1000);
    //  2. ~linear subgraph scaling: doubling the chain adds ≤ 2 rounds
    //     (log₂) and ≤ 3× wall (linear work per round ⇒ ~2×, gate 3×
    //     for box noise; a quadratic loop would be ~4× and climbing).
    val (lab1k, rounds1k, wall1k) = timed("cc 1000-link chain") {
      ccChain(spark, 1000)
    }
    println(f"[soak] CC 1000-chain: components=$lab1k rounds=$rounds1k wall=${wall1k}%.2f s")
    if (lab1k != 1L) {
      failures += 1
      println(s"[soak] RATIO cc-chain-fixture          $lab1k components (want 1) FAIL")
    }
    val okRounds = rounds1k <= 12
    if (!okRounds) failures += 1
    println(f"[soak] RATIO cc-rounds-1000-chain     $rounds1k%12d rounds (gate 12) ${if (okRounds) "PASS" else "FAIL"}")
    val (lab2k, rounds2k, wall2k) = timed("cc 2000-link chain") {
      ccChain(spark, 2000)
    }
    println(f"[soak] CC 2000-chain: components=$lab2k rounds=$rounds2k wall=${wall2k}%.2f s")
    val okR2 = lab2k == 1L && rounds2k <= rounds1k + 2
    if (!okR2) failures += 1
    println(f"[soak] RATIO cc-rounds-2x-chain       $rounds1k -> $rounds2k rounds (gate +2) ${if (okR2) "PASS" else "FAIL"}")
    val okW2 = wall2k <= 3.0 * wall1k
    if (!okW2) failures += 1
    println(f"[soak] RATIO cc-wall-2x-chain         ${wall1k}%.2f -> ${wall2k}%.2f s (${wall2k / wall1k}%.2fx, gate 3.0x) ${if (okW2) "PASS" else "FAIL"}")

    // --- r11: the GIANT-COMPONENT adversary. The chains above prove
    // O(log diameter) but their subgraphs fit the local-solve bound
    // (they force the distributed path artificially). Here the planted
    // hub graph EXCEEDS localSolveMaxEdges, so the production code path
    // itself falls through the bounded probe into pointer jumping, on
    // the skew shape that actually hurts at 100 TB: one component
    // swallowing every node, a top hub adjacent to half the graph, and
    // all label traffic collapsing onto the min-id key at convergence.
    // Gates: the probe fell through (rounds > 0), exactly one
    // component, O(log depth) rounds (depth ≈ 21 ⇒ jumps settle well
    // under 12), and doubling the graph adds ≤ 2 rounds / ≤ 3× wall.
    val hubN1 = 1300000L
    val (hlab1, hrounds1, hwall1, hedges1) = timed("cc 1.3M-node hub graph") {
      ccHub(spark, hubN1)
    }
    println(f"[soak] CC hub-1.3M: components=$hlab1 rounds=$hrounds1 wall=${hwall1}%.2f s edges=$hedges1")
    val okHubFixture = hedges1 > (1L << 20) && hlab1 == 1L
    if (!okHubFixture) failures += 1
    println(s"[soak] RATIO cc-hub-fixture           $hedges1 edges (> 2^20), $hlab1 component(s) ${if (okHubFixture) "PASS" else "FAIL"}")
    val okHubDistributed = hrounds1 > 0
    if (!okHubDistributed) failures += 1
    println(s"[soak] RATIO cc-hub-fell-through      $hrounds1 distributed rounds (gate > 0: the bounded probe must NOT local-solve past its limit) ${if (okHubDistributed) "PASS" else "FAIL"}")
    val okHubRounds = hrounds1 <= 12
    if (!okHubRounds) failures += 1
    println(f"[soak] RATIO cc-hub-rounds            $hrounds1%12d rounds (gate 12) ${if (okHubRounds) "PASS" else "FAIL"}")
    val (hlab2, hrounds2, hwall2, _) = timed("cc 2.6M-node hub graph") {
      ccHub(spark, 2 * hubN1)
    }
    println(f"[soak] CC hub-2.6M: components=$hlab2 rounds=$hrounds2 wall=${hwall2}%.2f s")
    val okHub2 = hlab2 == 1L && hrounds2 <= hrounds1 + 2
    if (!okHub2) failures += 1
    println(f"[soak] RATIO cc-hub-rounds-2x         $hrounds1 -> $hrounds2 rounds (gate +2) ${if (okHub2) "PASS" else "FAIL"}")
    val okHubW = hwall2 <= 3.0 * hwall1
    if (!okHubW) failures += 1
    println(f"[soak] RATIO cc-hub-wall-2x           ${hwall1}%.2f -> ${hwall2}%.2f s (${hwall2 / hwall1}%.2fx, gate 3.0x) ${if (okHubW) "PASS" else "FAIL"}")

    println(if (failures == 0) "[soak] ALL GATES PASS"
            else s"[soak] $failures GATE(S) FAILED")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
