package graft.ml

import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.linalg.{DenseVector, Vector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximations for the reference operators MLlib lacks outright,
  * with their semantic deltas recorded (SURVEY §2.7 M7/M12/M22/M26/M27).
  */
object Approx {

  /** M12 — RBF-kernel SVM approximation via Random Fourier Features
    * (Rahimi & Recht 2007): z(x) = √(2/D)·cos(Wx + b) with W ~ N(0, 2γI),
    * then a linear SVC in feature space. Deterministic seeded projection
    * (hash-free: fixed SplittableRandom stream). Semantic delta: an
    * approximation to the exact kernel — quality grows with `d`. */
  def randomFourierFeatures(df: DataFrame, inputCols: Seq[String],
                            d: Int = 64, gamma: Double = 1.0,
                            seed: Long = 42L,
                            out: String = "rff"): DataFrame = {
    val rnd = new java.util.SplittableRandom(seed)
    val p = inputCols.size
    val w = Array.fill(d, p)(rnd.nextGaussian() * math.sqrt(2.0 * gamma))
    val b = Array.fill(d)(rnd.nextDouble() * 2.0 * math.Pi)
    val scale = math.sqrt(2.0 / d)
    val feats: Seq[Column] = (0 until d).map { j =>
      val proj = inputCols.zipWithIndex
        .map { case (c, i) => col(c) * lit(w(j)(i)) }
        .reduce(_ + _) + lit(b(j))
      (cos(proj) * lit(scale)).as(s"_rff_$j")
    }
    val withF = df.select(col("*") +: feats: _*)
    Features.assemble(withF, (0 until d).map(j => s"_rff_$j"), out)
      .drop((0 until d).map(j => s"_rff_$j"): _*)
  }

  /** Kernel-SVM-like classifier = RFF + LinearSVC (M12). */
  def rbfSvc(train: DataFrame, labelCol: String, inputCols: Seq[String],
             d: Int = 64, gamma: Double = 1.0, regParam: Double = 0.01): DataFrame => DataFrame = {
    val trainF = randomFourierFeatures(train, inputCols, d, gamma)
    val model = new LinearSVC().setLabelCol(labelCol).setFeaturesCol("rff")
      .setRegParam(regParam).fit(trainF)
    (score: DataFrame) =>
      model.transform(randomFourierFeatures(score, inputCols, d, gamma))
  }

  /** M12 (composed, the reference's full SVM lab): MULTICLASS
    * RBF-kernel SVC = one shared RFF feature space + one-vs-rest over
    * LinearSVC. sklearn's SVC(kernel='rbf') runs one-vs-ONE — OVR is
    * MLlib's native multiclass strategy; that delta is the recorded M12
    * gap, the kernel approximation itself is [[randomFourierFeatures]].
    * Decision scores stay available per class inside the OVR model; the
    * binary [[rbfSvc]] path exposes them as `rawPrediction` for
    * decision-function ROC curves (spec: pair-counting AUC agreement). */
  def rbfSvcOvr(train: DataFrame, labelCol: String, inputCols: Seq[String],
                d: Int = 64, gamma: Double = 1.0,
                regParam: Double = 0.01): DataFrame => DataFrame = {
    val trainF = randomFourierFeatures(train, inputCols, d, gamma)
    val base = new LinearSVC().setFeaturesCol("rff").setRegParam(regParam)
    val model = Models.oneVsRest(base, labelCol).setFeaturesCol("rff")
      .fit(trainF)
    (score: DataFrame) =>
      model.transform(randomFourierFeatures(score, inputCols, d, gamma))
  }

  /** M12 (complete) — ONE-VS-ONE multiclass RBF-SVC, sklearn
    * `SVC(kernel='rbf')`'s actual strategy (`SVM.ipynb:~2584 (cell 18)`):
    * one shared RFF space, one binary LinearSVC per UNORDERED CLASS PAIR
    * fit on just that pair's rows, prediction by majority vote (ties →
    * lowest class, sklearn's convention). Closes the OVR-vs-OVO delta
    * [[rbfSvcOvr]] recorded.
    *
    * Scale shape: k(k−1)/2 fits are DRIVER-SEQUENCED JOBS over row
    * subsets (each a distributed LinearSVC on a filtered frame — no rows
    * ever collect); voting is pure column arithmetic over the pairwise
    * prediction columns, so scoring stays one distributed pass. */
  def rbfSvcOvo(train: DataFrame, labelCol: String, inputCols: Seq[String],
                d: Int = 64, gamma: Double = 1.0,
                regParam: Double = 0.01): DataFrame => DataFrame = {
    val trainF = randomFourierFeatures(train, inputCols, d, gamma)
    val classes = trainF.select(col(labelCol).cast("double"))
      .distinct().collect().map(_.getDouble(0)).sorted
    require(classes.length >= 2,
      s"one-vs-one needs ≥ 2 classes, got ${classes.length}")
    val pairs = for {
      i <- classes.indices
      j <- i + 1 until classes.length
    } yield (i, j)
    val models = pairs.map { case (i, j) =>
      val sub = trainF.filter(col(labelCol).isin(classes(i), classes(j)))
        .withColumn("_bl", (col(labelCol) === classes(j)).cast("double"))
      (i, j) -> new LinearSVC().setLabelCol("_bl").setFeaturesCol("rff")
        .setRegParam(regParam)
        .setPredictionCol(s"_ovo_p_${i}_$j")
        .setRawPredictionCol(s"_ovo_r_${i}_$j")
        .fit(sub)
    }
    (score: DataFrame) => {
      val f = randomFourierFeatures(score, inputCols, d, gamma)
      val scored = models.foldLeft(f) { case (acc, (_, m)) => m.transform(acc) }
      val votes: Seq[Column] = classes.indices.map { c =>
        pairs.map { case (i, j) =>
          if (i == c) when(col(s"_ovo_p_${i}_$j") === 0.0, 1).otherwise(0)
          else if (j == c) when(col(s"_ovo_p_${i}_$j") === 1.0, 1).otherwise(0)
          else lit(0)
        }.reduce(_ + _)
      }
      // argmax votes; array_position finds the FIRST max ⇒ tie → lowest
      // class index
      val voteArr = array(votes: _*)
      val idx = array_position(voteArr, array_max(voteArr))
      val out = scored.withColumn("prediction",
        element_at(lit(classes), idx.cast("int")))
      pairs.foldLeft(out) { case (acc, (i, j)) =>
        acc.drop(s"_ovo_p_${i}_$j", s"_ovo_r_${i}_$j")
      }
    }
  }

  /** M22 — IsolationForest substitute: Gaussian-tail anomaly scoring.
    * Fits a diagonal Gaussian to the features (one agg pass) and scores
    * rows by Mahalanobis-ish distance; `threshold` in std units flags
    * anomalies. Semantic delta vs IF: parametric (assumes unimodal
    * inliers) — recorded gap, adequate for the reference's synthetic
    * blob+outlier fixture. */
  def gaussianAnomaly(df: DataFrame, features: Seq[String],
                      threshold: Double = 3.0): DataFrame = {
    val aggCols = features.map(f => avg(col(f)).as(s"_m_$f")) ++
      features.map(f => stddev_samp(col(f)).as(s"_s_$f"))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).head
    val score = features.map { f =>
      val m = stats.getAs[Double](s"_m_$f")
      val sd = math.max(stats.getAs[Double](s"_s_$f"), 1e-12)
      pow((col(f) - lit(m)) / lit(sd), 2)
    }.reduce(_ + _)
    df.withColumn("anomaly_score", sqrt(score))
      .withColumn("is_anomaly", (col("anomaly_score") > threshold).cast("int"))
  }

  /** M22 (alt) — KMeans-distance anomaly scoring: distance to the
    * nearest cluster center in std units of that cluster's scatter. */
  def kmeansAnomaly(df: DataFrame, features: Seq[String], k: Int = 4,
                    threshold: Double = 3.0): DataFrame = {
    val assembled = Features.assemble(df, features, "_af")
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(42L).setFeaturesCol("_af").fit(assembled)
    val centers = model.clusterCenters.map(_.toArray)
    val pred = model.transform(assembled)
    val dist = (0 until k).map { c =>
      val d2 = features.zipWithIndex
        .map { case (f, i) => pow(col(f) - lit(centers(c)(i)), 2) }
        .reduce(_ + _)
      when(col("prediction") === c, sqrt(d2))
    }.reduce(_ otherwise _)
    // standardize distance WITHIN each cluster — a tight outlier cluster
    // has small absolute distances, so a global scale would miss (or
    // over-flag) depending on cluster spread
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("prediction"))
    pred.withColumn("_dist", dist)
      .withColumn("anomaly_score",
        (col("_dist") - avg(col("_dist")).over(w)) /
          greatest(stddev_samp(col("_dist")).over(w), lit(1e-12)))
      .withColumn("is_anomaly", (col("anomaly_score") > threshold).cast("int"))
      .drop("_af", "_dist")
  }

  /** M7 — cost-complexity-pruning emulation: CV over a
    * (maxDepth × minInfoGain) grid stands in for sklearn's ccp_alpha path
    * (MLlib lacks ccp_alpha; parity is at "CV-selected pruned tree"
    * level, SURVEY M7). Returns the best fitted tree model. */
  def cvPrunedTree(df: DataFrame, labelCol: String,
                   depths: Seq[Int] = Seq(2, 3, 5, 8),
                   minGains: Seq[Double] = Seq(0.0, 0.01, 0.05),
                   folds: Int = 3): org.apache.spark.ml.classification.DecisionTreeClassificationModel = {
    val dt = Models.decisionTree(labelCol)
    val grid = new org.apache.spark.ml.tuning.ParamGridBuilder()
      .addGrid(dt.maxDepth, depths)
      .addGrid(dt.minInfoGain, minGains)
      .build()
    val cv = Models.crossValidate(dt, grid,
      new org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("accuracy"), folds)
    cv.fit(df).bestModel
      .asInstanceOf[org.apache.spark.ml.classification.DecisionTreeClassificationModel]
  }

  /** M26 — ANOVA F-test comparing a restricted OLS model against a full
    * one (statsmodels anova_lm): F = ((RSS_r − RSS_f)/Δp) / (RSS_f/df_f). */
  def anovaF(train: DataFrame, labelCol: String,
             restricted: Seq[String], full: Seq[String]): (Double, Long, Long) = {
    require(restricted.toSet.subsetOf(full.toSet))
    val n = train.count()
    def rss(feats: Seq[String]): Double = {
      val fit = Models.olsSummary(Features.assemble(train, feats, "_ax"), labelCol, "_ax")
      val mse = fit.rmse * fit.rmse
      mse * n
    }
    val dfFull = n - full.size - 1
    val dp = (full.size - restricted.size).toLong
    val rssFull = rss(full) // one fit, used in numerator and denominator
    val f = ((rss(restricted) - rssFull) / dp) / (rssFull / dfFull)
    (f, dp, dfFull)
  }

  /** M27 — regression diagnostics: residuals and standardized residuals
    * as columns (distributed); [[influenceDiagnostics]] adds the
    * leverage/studentized surface. */
  def residualDiagnostics(pred: DataFrame, labelCol: String,
                          predCol: String = "prediction"): DataFrame = {
    val resid = col(labelCol) - col(predCol)
    val sd = pred.agg(stddev_samp(resid)).head.getDouble(0)
    pred.withColumn("residual", resid)
      .withColumn("std_residual", resid / lit(math.max(sd, 1e-12)))
  }

  /** M27 (Q-Q surface) — normal quantile-quantile data, the
    * `sm.qqplot` companion of the influence diagnostics
    * (codes_in_book_of_statisct.ipynb cell 161): sample quantiles of
    * column `c` at plotting positions p_i = (i−0.5)/points, standardized
    * by the column's mean/sd, against theoretical N(0,1) quantiles.
    *
    * Distributed shape: ONE aggregation pass computes mean, sd and the
    * whole quantile grid (`percentile` exact by default;
    * `percentile_approx` is the 100-TB single-pass sketch path);
    * theoretical quantiles are data-independent, computed on the driver
    * with Acklam's inverse-normal approximation (|rel err| < 1.15e-9).
    * Feed the result to `PlotSink.scatter(..., refLine = true)` for the
    * rendered plot. */
  def qqNormal(df: DataFrame, c: String, points: Int = 99,
               exact: Boolean = true): DataFrame = {
    require(points >= 2 && points <= 10000, s"points in [2,10000], got $points")
    val spark = df.sparkSession
    import spark.implicits._
    val ps = Array.tabulate(points)(i => (i + 0.5) / points)
    val arr = ps.mkString(",")
    val pct =
      if (exact) expr(s"percentile($c, array($arr))")
      else expr(s"percentile_approx($c, array($arr), 10000)")
    val r = df.agg(avg(col(c)), stddev_samp(col(c)), pct).head
    val mean = r.getDouble(0)
    val sd = r.getDouble(1)
    require(sd > 0, s"qqNormal needs positive variance in $c")
    val qs = r.getSeq[Double](2)
    ps.indices.map(i => (ps(i), invNormalCdf(ps(i)), (qs(i) - mean) / sd))
      .toSeq.toDF("p", "theoretical_q", "sample_q")
  }

  /** Inverse standard-normal CDF — Acklam's rational approximation
    * (the standard public-domain constants), |relative error| <
    * 1.15e-9 over (0,1). Driver-side only: theoretical quantiles are
    * data-independent. */
  def invNormalCdf(p: Double): Double = {
    require(p > 0 && p < 1, s"p in (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }

  /** M27 (full) — OLS influence diagnostics, the statsmodels
    * `OLSInfluence` surface: per-row LEVERAGE (hat-matrix diagonal
    * h_i = x_iᵀ(XᵀX)⁻¹x_i over the intercept-augmented design), raw
    * residual, and INTERNALLY STUDENTIZED residual
    * e_i / √(s²·(1−h_i)) with s² = RSS/(n−p−1) — matching
    * `hat_matrix_diag` / `resid_studentized_internal`.
    *
    * Distributed shape: ONE aggregation pass collects the (p+1)²
    * cross-moments and Xᵀy (the same sufficient statistics q32's
    * closed-form OLS uses), the (p+1)×(p+1) inversion runs on the driver
    * (p is the feature count — tiny), a second pass aggregates RSS, and
    * leverage/residual/studentized are then pure column expressions:
    * at 100 TB this is two scans and no per-row driver work, which is
    * why hat diagonals do NOT need the single-node hat matrix. */
  def influenceDiagnostics(df: DataFrame, labelCol: String,
                           features: Seq[String]): DataFrame = {
    val m = olsMoments(df, labelCol, features)
    val withRes = df.withColumn("residual", m.y - m.predicted)
      .withColumn("leverage", m.leverage)
    val s2 = residualVariance(withRes, m)
    withRes.withColumn("student_resid",
      col("residual") / sqrt(lit(s2) * (lit(1.0) - col("leverage"))))
  }

  /** M1 companion (the `get_prediction().summary_frame()` surface,
    * `data_mining_Assignment1.ipynb`'s OLS-with-prediction-intervals
    * cell): per-row fitted value, `level` CONFIDENCE interval of the
    * mean response (± t·s·√h) and PREDICTION interval for a new
    * observation (± t·s·√(1+h)) — h is the same hat diagonal the
    * influence surface uses, so this is the identical two-scan shape:
    * one moment pass, one RSS pass, then pure column arithmetic. The
    * t critical value is EXACT at any df ([[tQuantile]] — incomplete-
    * beta CDF inversion, r10). */
  def olsIntervals(df: DataFrame, labelCol: String, features: Seq[String],
                   level: Double = 0.95): DataFrame = {
    require(level > 0 && level < 1, s"level in (0,1), got $level")
    val m = olsMoments(df, labelCol, features)
    val withRes = df.withColumn("predicted", m.predicted)
      .withColumn("residual", m.y - m.predicted)
      .withColumn("_h", m.leverage)
    val s2 = residualVariance(withRes, m)
    val t = tQuantile(1.0 - (1.0 - level) / 2.0, m.dfResid)
    val s = math.sqrt(s2)
    val out = withRes
      .withColumn("ci_lo", col("predicted") - lit(t * s) * sqrt(col("_h")))
      .withColumn("ci_hi", col("predicted") + lit(t * s) * sqrt(col("_h")))
      .withColumn("pi_lo",
        col("predicted") - lit(t * s) * sqrt(lit(1.0) + col("_h")))
      .withColumn("pi_hi",
        col("predicted") + lit(t * s) * sqrt(lit(1.0) + col("_h")))
    out.drop("_h")
  }

  /** Student-t upper quantile, EXACT (r10 — previously the
    * Cornish-Fisher expansion, |err| < 1e-8 only for df ≥ 30): invert
    * the exact CDF t ↦ 1 − I_{df/(df+t²)}(df/2, ½)/2 by Newton with
    * the analytic pdf, seeded by the Cornish-Fisher estimate and
    * safeguarded by bisection (the Numerical-Recipes bracketing
    * pattern). Agreement with 40-digit mpmath references is < 1e-12
    * relative across df 1..100 (spec-pinned), so `olsIntervals`
    * matches statsmodels at ANY df, not just the df ≥ 30 a
    * distributed dataset has. */
  def tQuantile(p: Double, df: Double): Double = {
    require(p > 0 && p < 1 && df > 0, s"need p in (0,1), df > 0; got $p, $df")
    if (p == 0.5) return 0.0
    if (p < 0.5) return -tQuantile(1.0 - p, df)
    def cdf(t: Double): Double =
      if (t >= 0) 1.0 - 0.5 * regIncompleteBeta(df / 2, 0.5, df / (df + t * t))
      else 0.5 * regIncompleteBeta(df / 2, 0.5, df / (df + t * t))
    // log pdf: −log B(df/2, ½) − ½log df − (df+1)/2 · log(1 + t²/df)
    val logNorm = logGamma((df + 1) / 2) - logGamma(df / 2) -
      logGamma(0.5) - 0.5 * math.log(df)
    def pdf(t: Double): Double =
      math.exp(logNorm - (df + 1) / 2 * math.log1p(t * t / df))
    // Cornish-Fisher seed (exactly the old estimate)
    val z = invNormalCdf(p)
    val z3 = z * z * z; val z5 = z3 * z * z; val z7 = z5 * z * z
    var t = z + (z3 + z) / (4 * df) +
      (5 * z5 + 16 * z3 + 3 * z) / (96 * df * df) +
      (3 * z7 + 19 * z5 + 17 * z3 - 15 * z) / (384 * df * df * df)
    // bracket the root, then Newton with bisection fallback
    var lo = 0.0
    var hi = math.max(1.0, 2 * math.abs(t))
    while (cdf(hi) < p) hi *= 2
    if (t <= lo || t >= hi) t = (lo + hi) / 2
    var i = 0
    while (i < 100) {
      val err = cdf(t) - p
      if (err > 0) hi = t else lo = t
      val d = pdf(t)
      val step = if (d > 0) err / d else 0.0
      val next = t - step
      t = if (d > 0 && next > lo && next < hi) next else (lo + hi) / 2
      if (math.abs(step) < 1e-14 * (1 + math.abs(t)) && hi - lo < 1e-12 * (1 + math.abs(t)))
        return t
      i += 1
    }
    t
  }

  /** log Γ via the Lanczos approximation (g = 7, 9 coefficients —
    * |rel err| < 1e-15 on the positive reals). */
  def logGamma(x: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    else {
      val xx = x - 1.0
      var a = g(0)
      val t = xx + 7.5
      var i = 1
      while (i < 9) { a += g(i) / (xx + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a, b) via the Lentz continued
    * fraction (converges fastest for x < (a+1)/(a+b+2); the symmetric
    * complement covers the rest). */
  def regIncompleteBeta(a: Double, b: Double, x: Double): Double = {
    require(x >= 0 && x <= 1, s"x in [0,1], got $x")
    if (x == 0.0) return 0.0
    if (x == 1.0) return 1.0
    // pick the side where the fraction converges fast; the complement
    // goes STRAIGHT to the ladder (not through this entry again —
    // rounding at the threshold can otherwise flip-flop the two
    // symmetric recursive calls forever)
    if (x < (a + 1) / (a + b + 2)) betaCf(a, b, x)
    else 1.0 - betaCf(b, a, 1.0 - x)
  }

  /** x^a(1−x)^b/(a·B(a,b)) · Lentz continued fraction — only valid on
    * the fast-converging side; [[regIncompleteBeta]] routes. */
  private def betaCf(a: Double, b: Double, x: Double): Double = {
    val front = math.exp(a * math.log(x) + b * math.log1p(-x) +
      logGamma(a + b) - logGamma(a) - logGamma(b))
    // modified Lentz on the standard even/odd coefficient ladder
    val tiny = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1)
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      // even step: d_{2m} = m(b−m)x / ((a+2m−1)(a+2m))
      var num = m * (b - m) * x / ((a + m2 - 1) * (a + m2))
      d = 1.0 + num * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + num / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      // odd step: d_{2m+1} = −(a+m)(a+b+m)x / ((a+2m)(a+2m+1))
      num = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1))
      d = 1.0 + num * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + num / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-15) return front * h / a
      m += 1
    }
    front * h / a // converged within tolerance for all practical (a,b,x)
  }

  /** Shared OLS sufficient statistics: ONE aggregation pass collects the
    * (p+1)² cross-moments and Xᵀy, the (p+1)×(p+1) inversion runs on the
    * driver, and predicted/leverage come back as column expressions. */
  private final case class OlsMoments(y: Column, predicted: Column,
                                      leverage: Column, n: Double,
                                      dfResid: Double)

  private def olsMoments(df: DataFrame, labelCol: String,
                         features: Seq[String]): OlsMoments = {
    val p = features.size
    val xs: Seq[Column] = lit(1.0) +: features.map(f => col(f).cast("double"))
    val y = col(labelCol).cast("double")
    val (xtx, xty, _) =
      Customs.crossMoments(df, labelCol, features, withYY = false)
    val n = xtx(0)(0) // Σ1 — the intercept-intercept moment
    require(n > p + 1, s"OLS diagnostics need n > p+1 rows, got $n")
    val (inv, _) = Customs.invertAndLogDet(xtx)
    // β = (XᵀX)⁻¹Xᵀy — the exact normal-equation estimator, same as sm.OLS
    val beta = Array.tabulate(p + 1)(a => (0 to p).map(b => inv(a)(b) * xty(b)).sum)
    val predicted = xs.zipWithIndex.map { case (x, a) => x * lit(beta(a)) }
      .reduce(_ + _)
    val lev = (for (a <- 0 to p; b <- 0 to p)
      yield xs(a) * xs(b) * lit(inv(a)(b))).reduce(_ + _)
    OlsMoments(y, predicted, lev, n, n - p - 1)
  }

  /** Second pass: s² = RSS/(n−p−1) over a frame that already carries
    * `residual`. */
  private def residualVariance(withRes: DataFrame, m: OlsMoments): Double =
    withRes.agg(sum(col("residual") * col("residual")))
      .head.getDouble(0) / m.dfResid
}
