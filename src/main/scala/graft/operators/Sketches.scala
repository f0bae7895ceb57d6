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

  /** All k-token shingle WINDOWS of a token-array column (occurrence-
    * preserving — no dedup, unlike TextFunctions.shingles). The md5
    * deliberately does NOT happen inside this lambda: higher-order-
    * function bodies evaluate INTERPRETED (no codegen), and an
    * interpreted md5+conv per shingle was measured at ~80% of q83's
    * wall (ProfileQ83). Callers explode first and hash at row level,
    * where [[md5Long]] is whole-stage-codegen'd. */
  private[graft] def shingleWindows(toks: Column, k: Int = ShingleK): Column =
    transform(sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", slice(toks, i, lit(k))))

  /** One (kept-columns..., hv) row per shingle occurrence of a frame
    * with a `text` column — q30's `md5(concat_ws(" ", slice(toks, i,
    * k)))` convention, computed by the NATIVE one-pass
    * `shingle_hashes_md5` expression (spec-asserted equal to the
    * declarative [[shingleWindows]]+[[md5Long]] form, which the oracle
    * replays; ProfileQ83 measured the interpreted form at ~60-80% of
    * q83's wall). The corpus guarantees ≥ k tokens per document.
    * Shared by q83, the soak gate, and the streaming twin. */
  private[graft] def shingleHashRows(df: DataFrame, keep: Seq[String],
                                     k: Int = ShingleK): DataFrame = {
    graft.plans.ShingleHashesMd5.register(df.sparkSession)
    df.select(keep.map(col) :+
      explode(call_function("shingle_hashes_md5",
        tokens(col("text")), lit(k))).as("hv"): _*)
  }

  /** Per-row HLL rank from the 60-bit hash column `hv`: register index
    * is the LOW 8 bits, rho = (leading zeros of the remaining 52-bit
    * word) + 1 = 53 − bitlen(w), computed with INTEGER string ops only:
    * `length(bin(w))` is exactly floor(log2(w))+1 for w ≥ 1 — no libm
    * log2 (not correctly-rounded-guaranteed; a one-ulp slip at a
    * power-of-two boundary would flip a register), and no higher-order
    * function (HOF lambdas evaluate interpreted; the original
    * 52-comparison `filter` formulation cost ~0.5 s/rep in ProfileQ83).
    * The DuckDB oracle keeps its own pure-integer-comparison
    * formulation; both produce the identical integer. */
  private[graft] val rhoExpr: Column = expr(
    s"cast(case when (hv div 256) = 0 then $HllShift " +
      s"else $HllShift - length(bin(hv div 256)) end as int)")

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
      shingleHashRows(docs(s, dir), Seq("source"))
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
    bigramsReg(s)
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

  /** All adjacent token pairs of a token-array column, space-joined —
    * kept as STRINGS because the CMS salts re-hash them per row. The
    * k=2 case of the native `shingle_windows` expression (the
    * declarative transform+slice lambda evaluates interpreted — same
    * measured story as [[shingleHashRows]]). Callers must [[bigramsReg]]
    * the session first. */
  private[graft] def bigrams(toks: Column): Column =
    call_function("shingle_windows", toks, lit(2))

  /** Register the native window builder on the session that will
    * evaluate [[bigrams]]. */
  private[graft] def bigramsReg(s: SparkSession): Unit =
    graft.plans.ShingleWindows.register(s)

  // ---------------------------------------------------------------- Bloom

  /** Bloom geometry: m = 2^20 bits (128 KiB packed), h = 3 salted hash
    * functions. With n eval grams the fp rate is (1−e^(−h·n/m))^h:
    * ~2.6e-4 at sf0.01's ~23k grams (a visible, audited margin at the
    * oracle gate) and ~0.11 at sf0.1's ~230k — deliberately reported,
    * not hidden: the audit's JOB is to tell the operator when the
    * blocklist has outgrown the bitmap (resize m, rebuild from the
    * stored members — the bit set is cheap to re-derive). h=3 trades
    * the information-optimal h=⌈m/n·ln2⌉ for 3 hashes/probe on the
    * 100-TB side, where probe cost, not fp, dominates. */
  val BloomM = 1 << 20
  /** Salt count — defined AS the native expression's constant
    * ([[graft.plans.BloomProbeMd5.H]]) so the declarative and packed
    * probes cannot drift. */
  val BloomH: Int = graft.plans.BloomProbeMd5.H

  /** The h bit positions of a key: md5 of `"r:key"` per salt r — the
    * same salt convention as [[cmsBucket]], so the oracle replays every
    * position with the identical `'0x'||substr(md5(...),1,15)` trick.
    * `m` is a parameter so specs can shrink the bitmap to force
    * collisions; declared queries always use [[BloomM]]. */
  private[graft] def bloomPositions(key: Column, m: Int = BloomM): Column =
    transform(sequence(lit(0), lit(BloomH - 1)),
      r => md5Long(concat(r.cast("string"), lit(":"), key)) % m)

  /** The SET-BIT relation of a Bloom filter over a one-column frame of
    * member keys: ≤ m rows of distinct positions — the sketch state.
    * Mergeable by plain union+distinct (bitwise OR), so per-day filters
    * roll up to per-month membership without replaying the members. */
  private[graft] def bloomBits(members: DataFrame, m: Int = BloomM): DataFrame =
    members.select(explode(bloomPositions(col(members.columns.head), m))
        .as("pos"))
      .distinct()

  /** Bloom membership probe of a key column against a set-bit
    * relation: positive iff ALL the key's positions are set. The probe
    * side explodes its DISTINCT positions (two salts landing on one
    * bit must count once), inner-joins the BROADCAST bit set, and
    * keeps keys whose matched DISTINCT-position count equals their own
    * position count. The hit side counts DISTINCT positions (not rows)
    * so a keys frame carrying duplicate rows can't double-count matches
    * against a single n_pos and reject a genuinely-member key — the
    * one-sided no-false-negative law holds for ANY input multiplicity.
    * Output rows are the groupBy's distinct key tuples. */
  private[graft] def bloomProbe(keys: DataFrame, bits: DataFrame,
                                keyCol: String, m: Int = BloomM): DataFrame = {
    val gcols = keys.columns.map(col).toSeq
    keys
      .withColumn("_ps", array_distinct(bloomPositions(col(keyCol), m)))
      .select(gcols ++ Seq(size(col("_ps")).as("n_pos"),
        explode(col("_ps")).as("pos")): _*)
      .join(broadcast(bits), Seq("pos"))
      .groupBy((gcols :+ col("n_pos")): _*)
      .agg(countDistinct(col("pos")).as("n_hit"))
      .filter(col("n_hit") === col("n_pos"))
      .select(gcols: _*)
  }

  /** Pack a set-bit relation into the m-bit byte array the native
    * `bloom_probe_md5` expression reads — the DEPLOYMENT shape: the
    * filter ships as one 128 KiB literal inside a per-row predicate
    * (zero joins, zero shuffle, whole-stage codegen). The collect is
    * bounded by m rows BY CONSTRUCTION — the same hard bound the 10×
    * soak gates. */
  def packBloomBits(bits: DataFrame, m: Int = BloomM): Array[Byte] = {
    val arr = new Array[Byte](m / 8)
    bits.collect().foreach { r =>
      val p = r.getLong(0).toInt
      arr(p >>> 3) = (arr(p >>> 3) | (1 << (p & 7))).toByte
    }
    arr
  }

  /** Per-row packed probe: keep the rows whose key is Bloom-positive.
    * Spec-asserted equal, key-for-key, to [[bloomProbe]]. */
  def bloomProbePacked(keys: DataFrame, packed: Array[Byte],
                       keyCol: String): DataFrame = {
    graft.plans.BloomProbeMd5.register(keys.sparkSession)
    keys.filter(call_function("bloom_probe_md5", col(keyCol), lit(packed)))
  }

  /** q85 — Bloom decontamination PRE-FILTER audit: the q72 benchmark
    * gram rule, re-armed with the third workhorse sketch. A Bloom
    * filter is built over the eval split's distinct 8-grams (the q72
    * index) and every distinct train (source, gram) is probed; the
    * audit reports, per source, the probe volume, the Bloom-positive
    * count, the TRUE overlap (exact semi-join foil), and the false
    * positives the filter would forward to the exact verifier.
    *
    * The one-sided law (no false NEGATIVES: every truly-contaminated
    * gram is Bloom-positive, so the pre-filter can never drop a real
    * leak) is asserted per-row here (`n_true ≤ n_bloom`) and per-GRAM
    * in the spec.
    *
    * Scale shape (the reason this exists next to q72): q72 broadcasts
    * the full eval GRAM STRINGS — fine for a benchmark suite, linear
    * in eval bytes. The Bloom bitmap is CONSTANT-size (m bits, 128 KiB
    * packed) no matter how many benchmarks pile into the blocklist,
    * and the train side still streams map-side with no shuffle: each
    * gram hashes h times against the broadcast bit set, and only the
    * (tiny) Bloom-positive remainder pays the exact string join. At
    * 100 TB the filter drops ~all of the train gram stream before the
    * expensive side exists. */
  def bloomDecontamination(s: SparkSession, dir: String,
                           k: Int = ShingleK): DataFrame = {
    // per-doc distinct grams via the native window builder (value-equal
    // to TextFunctions.shingles — the native-equality spec — minus the
    // interpreted per-window lambda cost)
    graft.plans.ShingleWindows.register(s)
    def grams = array_distinct(
      call_function("shingle_windows", col("t"), lit(k)))
    val g = Caches.track(
      TextOps.docsHeavy(s, dir)
        .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= k)
        .withColumn("_eval", Sampling.hashBucket(col("doc_id"), 10) === 0))

    val evalGrams = Caches.track(
      g.filter(col("_eval"))
        .select(explode(grams).as("gram")).distinct())
    val trainGrams = Caches.track(
      g.filter(!col("_eval"))
        .select(col("source"), explode(grams).as("gram"))
        .distinct())

    // the declared query runs the DEPLOYMENT probe (packed bitmap,
    // per-row predicate — spec-asserted equal to the declarative
    // explode+join probe, which remains the mergeable streaming shape)
    val pos = bloomProbePacked(trainGrams,
      packBloomBits(bloomBits(evalGrams)), "gram")
    val truth = trainGrams.join(evalGrams, Seq("gram"), "left_semi")

    val perSrc = trainGrams.groupBy(col("source"))
      .agg(count(lit(1)).as("n_train_grams"))
    val posSrc = pos.groupBy(col("source"))
      .agg(count(lit(1)).as("n_bloom_positive"))
    val truSrc = truth.groupBy(col("source"))
      .agg(count(lit(1)).as("n_true_overlap"))

    perSrc
      .join(posSrc, Seq("source"), "left")
      .join(truSrc, Seq("source"), "left")
      .select(col("source"), col("n_train_grams"),
        coalesce(col("n_bloom_positive"), lit(0L)).as("n_bloom_positive"),
        coalesce(col("n_true_overlap"), lit(0L)).as("n_true_overlap"))
      .withColumn("n_false_positive",
        col("n_bloom_positive") - col("n_true_overlap"))
      // raw IEEE division over exact integers (the q82 convention —
      // bit-identical across engines, so no rounding is needed)
      .withColumn("fp_rate",
        when(col("n_train_grams") === col("n_true_overlap"), lit(0.0))
          .otherwise(col("n_false_positive").cast("double") /
            (col("n_train_grams") - col("n_true_overlap"))))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------ Histogram

  /** Histogram-quantile geometry: 256 bins of width 8 tokens — covers
    * [0, 2048) with the last bin absorbing overflow. The estimate's
    * error bound is the bin width: the true quantile always lies in
    * the estimated bin (asserted per-row by the query's own `err`
    * column, spec'd as a law). */
  val HistW = 8
  val HistB = 256

  /** The quantiles a packing pipeline asks of its length distribution,
    * as integer percents (the rank target `ceil(p·n/100)` stays in
    * BIGINT arithmetic — `(n·p + 99) div 100` — on both engines). */
  val HistPercents = Seq(50, 90, 95, 99)

  /** q86 — quantile-sketch audit: the document TOKEN-LENGTH
    * distribution (the number q52/q81 sequence packing lives on)
    * summarized by a fixed 256-bin histogram, its quantile estimates
    * next to the exact order statistics. Estimate = the lower edge of
    * the first bin whose cumulative count reaches the rank target;
    * exact = the smallest length whose value-level cumulative count
    * does — both pure integer definitions, so the oracle hash-matches
    * without any float in the result.
    *
    * Scale story: the histogram is the fourth workhorse sketch —
    * CONSTANT-size (256 bins), mergeable by bin-wise sum, so partial
    * aggregation caps the shuffle at 256 rows per task at any corpus
    * size and per-day histograms sum into per-month quantiles without
    * re-reading. The exact side (a full length-level histogram +
    * order-statistic scan) is the audited foil being retired at
    * 100 TB — the recorded `percentile_approx` substitution in
    * SCALE.md, made engine-portable. */
  /** The token-length BIN frame of a document frame: ≤256 rows of
    * (bin, c) — integer `div`, overflow clamped to the last bin.
    * Shared verbatim by the batch audit, the soak gate, and the
    * streaming twin's per-window build. */
  private[graft] def lengthBins(docFrame: DataFrame): DataFrame =
    docFrame
      .select(size(tokens(col("text"))).cast("long").as("len"))
      .withColumn("bin", least(expr(s"len div $HistW"), lit(HistB - 1L)))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))

  /** Rank targets ceil(p·n/100) in pure BIGINT over a (bin|len, c)
    * cumulative frame's total — the single-row total broadcast-joins
    * the 4-row percent frame (BNLJ, never a cartesian). */
  private[graft] def rankTargets(counts: DataFrame): DataFrame = {
    import counts.sparkSession.implicits._
    val total = counts.agg(sum(col("c")).cast("long").as("n"))
    HistPercents.map(_.toLong).toDF("p")
      .join(broadcast(total))
      .select(col("p"), col("n"), expr("(n * p + 99) div 100").as("target"))
  }

  /** Quantile ESTIMATES from a (bin, c) frame: the lower edge of the
    * first bin whose cumulative count reaches each rank target —
    * (p, n, target, est_bin). The streaming twin runs this on its
    * sum-merged window bins; the batch audit on the one-scan build. */
  private[graft] def histogramQuantiles(bins: DataFrame): DataFrame = {
    val binCum = bins.withColumn("cum", sum(col("c")).over(cumWin("bin")))
    rankTargets(bins)
      .join(broadcast(binCum), col("cum") >= col("target"))
      .groupBy(col("p"), col("n"), col("target"))
      .agg(min(col("bin")).as("est_bin"))
  }

  private def cumWin(c: String) = org.apache.spark.sql.expressions.Window
    .orderBy(col(c))
    .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)

  def tokenLengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    val lens = Caches.track(
      docs(s, dir).select(size(tokens(col("text"))).cast("long").as("len")))

    val est = histogramQuantiles(
      lens.withColumn("bin", least(expr(s"len div $HistW"), lit(HistB - 1L)))
        .groupBy(col("bin")).agg(count(lit(1)).as("c")))

    // the exact foil: value-level cumulative histogram, same rank rule
    val lenCum = lens.groupBy(col("len")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(cumWin("len")))
    val exact = rankTargets(lenCum.select(col("len"), col("c")))
      .join(broadcast(lenCum), col("cum") >= col("target"))
      .groupBy(col("p")).agg(min(col("len")).as("exact_len"))

    est.join(exact, Seq("p"))
      .select(col("p"), col("n").as("n_docs"), col("target").as("target_rank"),
        (col("est_bin") * HistW).as("est_lo"), col("exact_len"),
        (col("exact_len") - col("est_bin") * HistW).as("err"))
      .orderBy(col("p"))
  }
}
