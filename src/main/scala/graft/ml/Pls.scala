package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M20 — partial least squares regression (PLS1, single response): the
  * reference imports `PLSRegression` (explained_codes.ipynb:~457
  * (cell 9)) without an executed analysis, so this supplies the full
  * estimator rather than a doc note.
  *
  * Algorithm: NIPALS for one response, re-expressed as aggregation
  * passes. The deflated design X_h never materializes — each deflation
  * X_{h+1} = X_h − t_h·p_hᵀ stays a COLUMN EXPRESSION over the original
  * features, so every per-component statistic (w ∝ X_hᵀy, tᵀt, X_hᵀt,
  * yᵀt) is one distributed `agg` over those expressions. Cost: 1 pass
  * for means + 2 passes per component, each a p-ary sum — no per-row
  * driver work, no collected data, so the fit shape is identical at
  * 100 TB. Driver state is the p×h weight/loading matrices (tiny).
  *
  * Final coefficients follow the standard identity
  * β = W·(PᵀW)⁻¹·q over centered X, folded into an intercept so
  * [[PlsModel.transform]] is a single pure column expression.
  *
  * Semantic delta vs sklearn's `PLSRegression(scale=True)`: this
  * centers but does not variance-scale features (pass pre-scaled
  * columns through [[Features]] scalers for that behavior); with
  * nComponents = p it reproduces OLS exactly, a property the spec pins.
  */
object Pls {

  case class PlsModel(features: Seq[String], labelCol: String,
                      xMean: Array[Double], yMean: Double,
                      weights: Array[Array[Double]],  // h × p (rows = components)
                      loadings: Array[Array[Double]], // h × p
                      q: Array[Double],               // h
                      beta: Array[Double], intercept: Double,
                      scoreExprs: Seq[Column]) {
    /** Prediction as one codegen'd expression over the raw features. */
    def predictionCol: Column =
      features.zip(beta).map { case (f, b) => col(f).cast("double") * lit(b) }
        .reduce(_ + _) + lit(intercept)

    def transform(df: DataFrame): DataFrame =
      df.withColumn("prediction", predictionCol)
  }

  def fit(df: DataFrame, labelCol: String, features: Seq[String],
          nComponents: Int): PlsModel = {
    val p = features.size
    require(nComponents >= 1 && nComponents <= p,
      s"nComponents must be in [1, $p], got $nComponents")
    val meanAggs = features.map(f => avg(col(f).cast("double"))) :+
      avg(col(labelCol).cast("double"))
    val mr = df.agg(meanAggs.head, meanAggs.tail: _*).head
    val xMean = Array.tabulate(p)(i => mr.getDouble(i))
    val yMean = mr.getDouble(p)
    val yC: Column = col(labelCol).cast("double") - lit(yMean)
    var xC: Array[Column] = Array.tabulate(p)(i =>
      col(features(i)).cast("double") - lit(xMean(i)))

    val ws = Array.ofDim[Double](nComponents, p)
    val ps = Array.ofDim[Double](nComponents, p)
    val qs = Array.ofDim[Double](nComponents)
    val tExprs = scala.collection.mutable.ArrayBuffer.empty[Column]

    for (h <- 0 until nComponents) {
      // pass 1: w_h ∝ X_hᵀ y (p sums in one agg)
      val wAggs = xC.map(c => sum(c * yC))
      val wr = df.agg(wAggs.head, wAggs.tail.toIndexedSeq: _*).head
      val wRaw = Array.tabulate(p)(i => wr.getDouble(i))
      val norm = math.sqrt(wRaw.map(v => v * v).sum)
      require(norm > 1e-12,
        s"PLS component ${h + 1}: X′y ≈ 0 — y is already fully deflated; " +
          s"request fewer components")
      val w = wRaw.map(_ / norm)
      val t: Column = xC.zip(w).map { case (c, wi) => c * lit(wi) }.reduce(_ + _)
      // pass 2: tᵀt, p_h = X_hᵀt / tᵀt, q_h = yᵀt / tᵀt (p+2 sums, one agg)
      val aggs2 = sum(t * t) +: (xC.map(c => sum(c * t)) :+ sum(yC * t))
      val r2 = df.agg(aggs2.head, aggs2.tail.toIndexedSeq: _*).head
      val tt = r2.getDouble(0)
      val pl = Array.tabulate(p)(i => r2.getDouble(i + 1) / tt)
      qs(h) = r2.getDouble(p + 1) / tt
      ws(h) = w; ps(h) = pl; tExprs += t
      // deflate: X_{h+1} = X_h − t·p_hᵀ, still pure expressions
      xC = Array.tabulate(p)(i => xC(i) - t * lit(pl(i)))
    }

    // β = W (PᵀW)⁻¹ q — h×h driver solve; (PᵀW)_{ab} = p_a · w_b
    val m = Array.tabulate(nComponents, nComponents)((a, b) =>
      (0 until p).map(i => ps(a)(i) * ws(b)(i)).sum)
    val (mInv, _) = Customs.invertAndLogDet(m)
    val c = Array.tabulate(nComponents)(a =>
      (0 until nComponents).map(b => mInv(a)(b) * qs(b)).sum)
    val beta = Array.tabulate(p)(i =>
      (0 until nComponents).map(h => ws(h)(i) * c(h)).sum)
    val intercept = yMean - (0 until p).map(i => beta(i) * xMean(i)).sum
    PlsModel(features, labelCol, xMean, yMean, ws, ps, qs, beta, intercept,
      tExprs.toSeq)
  }
}
