package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M22 — a REAL Isolation Forest (Liu, Ting & Zhou, ICDM 2008), replacing
  * the earlier parametric substitutes ([[Approx.gaussianAnomaly]] /
  * [[Approx.kmeansAnomaly]], kept as cheaper alternatives; reference use:
  * `data_mining_Assignment1.ipynb` cell 52's IsolationForest survey item).
  *
  * Distributed shape — the same bounded-sample-fit / distributed-score
  * split the IVF quantizer uses (`Similarity.ivfTopK`):
  *   - FIT touches at most `nTrees × sampleSize` rows (the paper's whole
  *    point: iTrees are grown on ψ=256-row subsamples regardless of
  *    corpus size), drawn deterministically and collected once — driver
  *    memory is O(trees·ψ·p), independent of data scale;
  *   - SCORING is a per-row traversal of the broadcast forest: zero
  *    shuffle, embarrassingly parallel. It runs as a Scala UDF, not a
  *    nested-CASE expression, deliberately: 100 trees × ~500 nodes of
  *    `when` chains would blow past the JVM's 64KB method limit and fall
  *    out of codegen anyway — a closed-over array walk is the faster
  *    form at this operator's shape.
  * Subsampling (r10, closing the recorded delta): per-tree INDEPENDENT
  * exact-ψ draws without replacement via hash-rank sampling — a
  * Bernoulli pre-filter bounds the single-scan collect, then each tree
  * keeps its ψ smallest per-tree ranks. Matches the paper's per-tree
  * sampling semantics while staying deterministic by row content (the
  * Sampling.scala doctrine).
  */
object IsolationForest {

  /** Flat-array iTree: node i holds (featureIndex, splitValue, leftChild,
    * rightChild, leafSize); leaves have featureIndex = -1. Flat arrays
    * serialize compactly into the task closure. */
  final case class ITree(feature: Array[Int], split: Array[Double],
                         left: Array[Int], right: Array[Int],
                         size: Array[Int])

  final case class IForestModel(trees: Seq[ITree], sampleSize: Int,
                                features: Seq[String]) {
    private val cNorm = avgPathLength(sampleSize)

    /** Anomaly score in (0,1]: s(x) = 2^(−E[h(x)]/c(ψ)). ~0.5 for
      * inliers, → 1 for isolates. */
    def scoreColumn: Column = {
      // close over plain locals so the task closure carries only the
      // flat arrays + one double, never `this`
      val ts = trees
      val cn = cNorm
      val f = udf { xs: Seq[Double] =>
        var acc = 0.0
        ts.foreach { t =>
          var node = 0
          var depth = 0.0
          while (t.feature(node) >= 0) {
            node = if (xs(t.feature(node)) < t.split(node)) t.left(node)
                   else t.right(node)
            depth += 1.0
          }
          acc += depth + avgPathLength(t.size(node))
        }
        math.pow(2.0, -(acc / ts.size) / cn)
      }
      // rows with a null feature score null (detectable), never NPE
      val anyNull = features.map(col(_).isNull).reduce(_ || _)
      when(anyNull, lit(null).cast("double"))
        .otherwise(f(array(features.map(c => col(c).cast("double")): _*)))
    }

    /** Score + flag: `is_anomaly` = score above `threshold` (0.6 ≈ the
      * paper's "potential anomaly" line; pick via a quantile of scores
      * for a contamination-rate contract). */
    def transform(df: DataFrame, threshold: Double = 0.6): DataFrame =
      df.withColumn("anomaly_score", scoreColumn)
        .withColumn("is_anomaly", (col("anomaly_score") > threshold).cast("int"))
  }

  /** c(n): average unsuccessful-search path length in a BST of n nodes —
    * 2·H(n−1) − 2(n−1)/n, H(i) ≈ ln(i) + γ. */
  def avgPathLength(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

  def fit(df: DataFrame, features: Seq[String], nTrees: Int = 100,
          sampleSize: Int = 256, seed: Long = 42L): IForestModel = {
    require(nTrees > 0 && sampleSize > 1)
    val need = nTrees.toLong * sampleSize
    require(need <= Int.MaxValue,
      s"nTrees * sampleSize = $need overflows the Int limit() bound; " +
        "shrink one of them (the samples are driver-collected by design)")
    val keyed = df.select(features.map(c => col(c).cast("double")): _*)
      .na.drop()
    val n = keyed.count()
    require(n > 1, "isolation forest needs ≥ 2 complete rows")
    // PER-TREE independent subsamples (the paper's sampling semantics,
    // r10 — previously disjoint slices of one hash-ordered pool): each
    // row computes a per-tree rank rk(t) = xxhash64(features…, t, seed)
    // mod 2³⁰ and keeps tree t iff rk(t) clears a Bernoulli threshold
    // ~1.3·ψ/n — ONE scan emitting ~1.3·nTrees·ψ (tree, row, rank)
    // rows in expectation, never an n×nTrees explode. The driver then
    // takes each tree's ψ SMALLEST ranks, so the final sample is an
    // exact-ψ uniform draw WITHOUT replacement per tree, independent
    // across trees (hash-rank sampling), deterministic by row CONTENT
    // like every split rule in this engine. n ≤ ψ degenerates to every
    // tree seeing all rows — sklearn's max_samples=min(ψ,n) behavior.
    val M = 1L << 30
    val pKeep = math.min(1.0, 1.3 * sampleSize / n)
    val thresh = math.max(1L, (M * pKeep).toLong)
    val rankFor = (t: Column) => pmod(
      xxhash64((features.map(col) :+ t :+ lit(seed)): _*), lit(M))
    val treeArms = filter(
      transform(sequence(lit(0), lit(nTrees - 1)),
        t => struct(t.as("t"), rankFor(t).as("rk"))),
      s => s.getField("rk") < lit(thresh))
    // hard collect bound (4× the expectation): duplicate-heavy data
    // hash-ties whole row groups through the threshold together, and an
    // unbounded collect must never reach the driver. Truncation beyond
    // the cap drops (arbitrary) excess rows of such ties only.
    val cap = math.min(Int.MaxValue.toLong, 4L * need).toInt
    val kept = keyed
      .withColumn("_arms", treeArms)
      .filter(size(col("_arms")) > 0)
      .select(explode(col("_arms")).as("_a"),
        array(features.map(col): _*).as("_x"))
      .select(col("_a.t").as("_t"), col("_a.rk").as("_rk"), col("_x"))
      .limit(cap)
      .collect()
    // a full-cap collect means the limit actually truncated (or tied the
    // boundary): the dropped arms are arbitrary, so per-tree sample
    // uniformity is degraded — say so instead of silently proceeding
    if (kept.length == cap)
      System.err.println(
        s"[isolation-forest] collect hit the $cap-row cap (4x the " +
          "expected arm volume): duplicate-heavy data hash-tied rows " +
          "through the sampling threshold; excess arms were dropped and " +
          "per-tree samples may be biased — consider a larger cap or " +
          "pre-deduplicating the feature frame")
    val byTree = kept.groupBy(_.getInt(0))
    val rnd = new java.util.SplittableRandom(seed)
    val trees = (0 until nTrees).map { t =>
      val rows = byTree.getOrElse(t, Array.empty)
        .sortBy(r => (r.getLong(1), r.getSeq[Double](2).mkString(",")))
        .take(sampleSize)
        .map(r => r.getSeq[Double](2).toArray)
      require(rows.length > 1,
        s"tree $t drew ${rows.length} rows — Bernoulli undersample this " +
          "extreme indicates degenerate (near-constant) feature data")
      grow(rows, rnd, maxDepth = math.ceil(
        math.log(sampleSize.toDouble) / math.log(2.0)).toInt)
    }
    IForestModel(trees, sampleSize, features)
  }

  /** Grow one iTree on a driver-side sample (ψ rows — microseconds). */
  private def grow(sample: Array[Array[Double]],
                   rnd: java.util.SplittableRandom, maxDepth: Int): ITree = {
    val p = sample.head.length
    val feature = scala.collection.mutable.ArrayBuffer[Int]()
    val split = scala.collection.mutable.ArrayBuffer[Double]()
    val left = scala.collection.mutable.ArrayBuffer[Int]()
    val right = scala.collection.mutable.ArrayBuffer[Int]()
    val size = scala.collection.mutable.ArrayBuffer[Int]()
    def leaf(n: Int): Int = {
      feature += -1; split += 0.0; left += -1; right += -1; size += n
      feature.size - 1
    }
    def node(rows: Array[Array[Double]], depth: Int): Int = {
      if (rows.length <= 1 || depth >= maxDepth) return leaf(rows.length)
      // features with spread in THIS node's rows; all-constant → leaf
      val candidates = (0 until p).filter { j =>
        var mn = rows(0)(j); var mx = rows(0)(j)
        rows.foreach { r => mn = math.min(mn, r(j)); mx = math.max(mx, r(j)) }
        mx > mn
      }
      if (candidates.isEmpty) return leaf(rows.length)
      val j = candidates(rnd.nextInt(candidates.size))
      val mn = rows.map(_(j)).min
      val mx = rows.map(_(j)).max
      val s = mn + rnd.nextDouble() * (mx - mn)
      val (lo, hi) = rows.partition(_(j) < s)
      if (lo.isEmpty || hi.isEmpty) return leaf(rows.length)
      val id = { feature += j; split += s; left += -1; right += -1
                 size += rows.length; feature.size - 1 }
      val l = node(lo, depth + 1)
      val r = node(hi, depth + 1)
      left(id) = l; right(id) = r
      id
    }
    node(sample, 0)
    ITree(feature.toArray, split.toArray, left.toArray, right.toArray,
      size.toArray)
  }
}
