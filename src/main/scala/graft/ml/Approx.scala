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
    val p = features.size
    val xs: Seq[Column] = lit(1.0) +: features.map(f => col(f).cast("double"))
    val y = col(labelCol).cast("double")
    val momAggs =
      (for (a <- 0 to p; b <- a to p)
        yield sum(xs(a) * xs(b)).as(s"_xx_${a}_$b")) ++
      (0 to p).map(a => sum(xs(a) * y).as(s"_xy_$a"))
    val r = df.agg(momAggs.head, momAggs.tail: _*).head
    val xtx = Array.tabulate(p + 1, p + 1)((a, b) =>
      if (a <= b) r.getAs[Double](s"_xx_${a}_$b")
      else r.getAs[Double](s"_xx_${b}_$a"))
    val xty = Array.tabulate(p + 1)(a => r.getAs[Double](s"_xy_$a"))
    val n = xtx(0)(0) // Σ1 — the intercept-intercept moment
    require(n > p + 1, s"influenceDiagnostics needs n > p+1 rows, got $n")
    val (inv, _) = Customs.invertAndLogDet(xtx)
    // β = (XᵀX)⁻¹Xᵀy — the exact normal-equation estimator, same as sm.OLS
    val beta = Array.tabulate(p + 1)(a => (0 to p).map(b => inv(a)(b) * xty(b)).sum)
    val predicted = xs.zipWithIndex.map { case (x, a) => x * lit(beta(a)) }
      .reduce(_ + _)
    val lev = (for (a <- 0 to p; b <- 0 to p)
      yield xs(a) * xs(b) * lit(inv(a)(b))).reduce(_ + _)
    val withRes = df.withColumn("residual", y - predicted)
      .withColumn("leverage", lev)
    val rss = withRes.agg(sum(col("residual") * col("residual")))
      .head.getDouble(0)
    val s2 = rss / (n - p - 1)
    withRes.withColumn("student_resid",
      col("residual") / sqrt(lit(s2) * (lit(1.0) - col("leverage"))))
  }
}
