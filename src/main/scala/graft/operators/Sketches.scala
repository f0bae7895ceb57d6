package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{md5Long, tokens}
import graft.sources.Tables

/** Mergeable sketches for corpus-scale cardinality and frequency
  * questions — the operators that replace `count(DISTINCT …)` and exact
  * top-k when the key space no longer fits a shuffle.
  *
  * Both sketches are AUDITED, not just computed: each declared query
  * carries the exact answer next to the estimate, because the point at
  * sf0.1 is to certify the sketch math (the oracle replays every
  * register bit in SQL), while at 100 TB only the sketch side of the
  * plan survives — the exact foil is the thing being retired.
  *
  *  - [[shingleCardinalityAudit]] (q83): HyperLogLog (Flajolet, Fusy,
  *    Gandouet, Meunier 2007) with m=256 registers, estimating the
  *    per-source count of distinct 8-token shingles — the quantity
  *    that sizes the q26/q69 dedup candidate space BEFORE paying for
  *    the dedup shuffle. Shingle hashing reuses q30's convention
  *    (md5 of the space-joined window) verbatim. Registers are
  *    integer-exact on both engines: the harmonic denominator is
  *    `Σ 2^(53-M_j)` accumulated in BIGINT (every term a power of two,
  *    sum ≤ 2^61), so the only floating steps are one division and —
  *    on the small-range branch — one `ln`, each applied to identical
  *    exact integers on both engines and rounded at 6dp.
  *  - [[cmsHeavyHitters]] (q84): Count-Min sketch (Cormode &
  *    Muthukrishnan 2005), d=4 rows × w=512 buckets of md5-salted
  *    hashes, over corpus BIGRAMS (the n-gram LM / boilerplate-phrase
  *    view; the bigram space is wide enough that cells genuinely
  *    collide at sf0.01, so the one-sided error bound is exercised,
  *    not vacuous). Pure BIGINT throughout — hash-gate exact.
  *
  * The reference's distinct/frequency surface is exact-only
  * (`value_counts`/`nunique`-style passes, e.g.
  * EDA_on_Ecommerce_dataset.ipynb's per-segment distinct counts —
  * mirrored exactly by q20/q22); these sketches are the documented
  * at-scale continuation of that family, not a port.
  *
  * Scale story (100 TB): sketch state is CONSTANT-size (256 registers
  * per group; 2048 CMS cells) and merges associatively (register-wise
  * max / cell-wise sum), so partial aggregation collapses each map
  * task's contribution to sketch-size before the shuffle — wire cost is
  * `groups × m` rows regardless of corpus size — and per-day sketches
  * union into per-month answers without re-reading the corpus (exact
  * distinct counts never compose). The same order-blind max/sum
  * registers serve streaming ingest ([[graft.streaming.Sketches]]).
  */
object Sketches {

  /** HLL precision: m = 2^8 = 256 registers (~6.5% standard error). */
  val HllM = 256

  /** Scaled-harmonic exponent base: registers hold `M_j ∈ [1, 53]`
    * (60-bit hash minus 8 bucket bits leaves a 52-bit rank field, so
    * rho = lz + 1 ≤ 53), and the denominator sums `2^(53-M_j)`. */
  val HllShift = 53

  /** CMS geometry: 4 salted rows × 512 buckets. */
  val CmsRows = 4
  val CmsW    = 512

  /** Shingle width — q30's winnowing convention, reused verbatim. */
  val ShingleK = 8

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** 60-bit hashes of all k-token shingles of a token-array column,
    * hashed IN PLACE (the shingle string never leaves the expression) —
    * q30's `md5(concat_ws(" ", slice(toks, i, k)))` convention through
    * [[md5Long]]. The corpus guarantees ≥ k tokens per document (the
    * q30 fingerprint relies on the same invariant). */
  private[graft] def shingleHashes(toks: Column, k: Int = ShingleK): Column =
    transform(sequence(lit(1), size(toks) - (k - 1)),
      i => md5Long(concat_ws(" ", slice(toks, i, lit(k)))))

  /** Per-row HLL rank from the 60-bit hash column `hv`: register index
    * is the LOW 8 bits, rho = (leading zeros of the remaining 52-bit
    * word) + 1, computed with INTEGER comparisons only — a
    * `bit_length`-free formulation both engines evaluate identically:
    * bitlen(w) = |{ i ∈ [0,51] : w ≥ 2^i }|, rho = 53 − bitlen(w).
    * (`floor(log2(w))` is deliberately NOT used: libm log2 is not
    * guaranteed correctly rounded, and a one-ulp slip at a
    * power-of-two boundary would flip a register.) */
  private[graft] val rhoExpr: Column = expr(
    s"cast($HllShift - size(filter(sequence(0, 51), " +
      "i -> (hv div 256) >= shiftleft(cast(1 as bigint), cast(i as int)))) as int)")

  /** q83 — approximate-distinct audit: per-source distinct-shingle
    * cardinality, HLL estimate next to the exact answer, plus an
    * `_ALL_` row whose registers are the MAX-MERGE of the per-source
    * registers — the mergeability that makes the sketch shippable.
    *
    * Plan: one scan, shingles hashed inside the projection, ONE
    * (source, hash) shuffle; registers AND the exact foil both derive
    * from that frame (register max over distinct hashes equals max
    * over raw occurrences, so pre-grouping loses nothing, and grouping
    * by the 60-bit hash instead of the shingle string keeps shuffle
    * rows at 8 bytes of key — the at-scale shape; "distinct" is
    * distinct-hash on both engines, the standard 2^-60 caveat of the
    * q69 family). Register aggregation partial-aggs to ≤ 256 rows per
    * source per task. */
  def shingleCardinalityAudit(s: SparkSession, dir: String): DataFrame = {
    // hash-space vocab; feeds registers + exact foil + the _ALL_ rollup
    val g = Caches.track(
      docs(s, dir)
        .select(col("source"),
                explode(shingleHashes(tokens(col("text")))).as("hv"))
        .groupBy(col("source"), col("hv"))
        .agg(count(lit(1)).as("n_occ")))

    val regs0 = g
      .withColumn("bucket", col("hv") % HllM)
      .withColumn("rho", rhoExpr)
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("mj"))
    val regsAll = regs0
      .groupBy(col("bucket")).agg(max(col("mj")).as("mj"))
      .select(lit("_ALL_").as("source"), col("bucket"), col("mj"))
    val agg = registerAggregate(regs0.unionByName(regsAll))

    val exactPerSource = g.groupBy(col("source"))
      .agg(sum(col("n_occ")).cast("long").as("n_shingles"),
           count(lit(1)).as("exact_distinct"))
    val exactAll = g
      .agg(sum(col("n_occ")).cast("long").as("n_shingles"),
           countDistinct(col("hv")).as("exact_distinct"))
      .select(lit("_ALL_").as("source"), col("n_shingles"),
              col("exact_distinct"))

    exactPerSource.unionByName(exactAll)
      .join(agg, Seq("source"))
      .withColumn("e", estimateExpr)
      .select(
        col("source"), col("n_shingles"), col("exact_distinct"),
        col("v_empty"), col("s_harmonic"),
        round(col("e"), 6).as("est_distinct"),
        round((col("e") - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("rel_err"))
      .orderBy(col("source"))
  }

  /** Collapse a (source, bucket, mj) register frame to the exact
    * integer pair the estimator needs: the scaled harmonic denominator
    * `Σ 2^(53-M_j)` (empty registers contribute 2^53) and the empty-
    * register count. Shared verbatim by the batch audit and the
    * streaming twin's merge step ([[graft.streaming.Sketches]]). */
  private[graft] def registerAggregate(regs: DataFrame): DataFrame =
    regs.groupBy(col("source"))
      .agg(
        (sum(expr(s"shiftleft(cast(1 as bigint), cast($HllShift - mj as int))"))
          + (lit(HllM) - count(lit(1))) * lit(1L << HllShift))
          .cast("long").as("s_harmonic"),
        (lit(HllM) - count(lit(1))).cast("long").as("v_empty"))

  /** alpha_m · m² · 2^53, computed HERE in IEEE double with the same
    * op order the DuckDB oracle spells out literally — the JVM double
    * ops and DuckDB's are both IEEE-754, so the folded constants agree
    * bitwise. (NOT written as a SQL string on the Spark side: Spark
    * parses `0.7213` as DECIMAL, and decimal-precision intermediate
    * math drifts ~1e-9 off the oracle's double path — measured.) */
  private[graft] val HllNumerator: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0

  /** The HLL estimator over (s_harmonic, v_empty) — the raw
    * bias-corrected formula, with the small-range branch switching to
    * linear counting. All-double arithmetic over exact integers. */
  private[graft] def estimateExpr: Column = {
    val eRaw = lit(HllNumerator) / col("s_harmonic").cast("double")
    when(col("v_empty") > 0 && eRaw <= lit(2.5 * HllM),
        lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_empty")))
      .otherwise(eRaw)
  }

  /** CMS bucket for (row-salt r, key): md5 of `"r:key"`. */
  private[graft] def cmsBucket(r: Column, key: Column): Column =
    md5Long(concat(r.cast("string"), lit(":"), key)) % CmsW

  /** The 2048-cell Count-Min table from per-key exact counts. By CMS
    * linearity, summing pre-counted `(key, n)` into cells equals
    * counting raw occurrences one by one (the spec proves the
    * identity), so the build rides the vocab-sized frame instead of
    * re-exploding the corpus. */
  private[graft] def cmsCells(cnt: DataFrame): DataFrame =
    cnt
      .select(col("bigram"), col("n"),
              explode(sequence(lit(0), lit(CmsRows - 1))).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("bigram")))
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("n")).cast("long").as("cell"))

  /** q84 — heavy-hitter audit: the corpus's top-20 bigrams (exact)
    * next to their Count-Min estimates and the overestimate margin
    * (`n_est − n_exact ≥ 0` always, by the CMS one-sided guarantee —
    * the spec asserts it for EVERY bigram, not just the reported 20).
    *
    * At 100 TB the exact side is untenable (a full n-gram shuffle just
    * to rank a key space of billions); the deployment shape keeps the
    * fixed 2048-cell table (map-side partial sums; shuffle ≤ d·w rows
    * per task) and probes it with a candidate stream. Here the exact
    * table doubles as candidate source and audit foil. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val cnt = Caches.track(
      docs(s, dir)
        .select(explode(bigrams(tokens(col("text")))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n")))

    val cms = cmsCells(cnt)
    val top = cnt.orderBy(col("n").desc, col("bigram")).limit(20)
    top
      .select(col("bigram"), col("n"),
              explode(sequence(lit(0), lit(CmsRows - 1))).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("bigram")))
      .join(broadcast(cms), Seq("r", "bucket"))
      .groupBy(col("bigram"), col("n"))
      .agg(min(col("cell")).as("n_est"))
      .select(col("bigram"), col("n").as("n_exact"), col("n_est"),
              (col("n_est") - col("n")).as("overest"))
      .orderBy(col("n_exact").desc, col("bigram"))
  }

  /** All adjacent token pairs of a token-array column, space-joined
    * (`slice` window of 2 — the k=2 sibling of [[shingleHashes]],
    * kept as strings because CMS salts re-hash them per row). */
  private[graft] def bigrams(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", slice(toks, i, lit(2))))
}
