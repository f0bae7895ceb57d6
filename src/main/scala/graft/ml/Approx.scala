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
    * as columns (distributed); leverage/Q-Q remain driver-side on samples
    * per SURVEY's doc-only note. */
  def residualDiagnostics(pred: DataFrame, labelCol: String,
                          predCol: String = "prediction"): DataFrame = {
    val resid = col(labelCol) - col(predCol)
    val sd = pred.agg(stddev_samp(resid)).head.getDouble(0)
    pred.withColumn("residual", resid)
      .withColumn("std_residual", resid / lit(math.max(sd, 1e-12)))
  }
}
