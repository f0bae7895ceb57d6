package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M20 — partial least squares regression (PLS1, single response): the
  * reference imports `PLSRegression` (explained_codes.ipynb:~457
  * (cell 9)) without an executed analysis, so this supplies the full
  * estimator rather than a doc note.
  *
  * Algorithm: NIPALS for one response, re-expressed as aggregation
  * passes. The deflated design X_h never materializes as DATA — each
  * round PROJECTS `_xc_i − t·p_i` into a fresh named column, so later
  * rounds reference an AttributeReference, not a re-expanded tree
  * (building nested Column objects instead would grow the expression
  * ~(p+1)^h and hang the driver long before any data was scanned; the
  * projection keeps growth linear in h, and CollapseProject cannot
  * re-inline it because each score/deflation alias is referenced more
  * than once downstream). Every per-component statistic (w ∝ X_hᵀy,
  * tᵀt, X_hᵀt, yᵀt) is one distributed `agg`. Cost: 1 pass for means +
  * 2 passes per component, each a p-ary sum — no per-row driver work,
  * no collected data, so the fit shape is identical at 100 TB. Driver
  * state is the p×h weight/loading matrices (tiny).
  *
  * Final coefficients follow the standard identity
  * β = W·(PᵀW)⁻¹·q over centered X, folded into an intercept so
  * [[PlsModel.transform]] is a single pure column expression.
  *
  * `scale = true` matches sklearn's `PLSRegression(scale=True)`
  * (explained_codes.ipynb:~457 (cell 9)): features AND response are
  * standardized (ddof=1, zero-variance guard → 1.0, sklearn's
  * convention) before NIPALS, and the fitted coefficients are folded
  * back to RAW feature units (β_i = σ_y·β_std_i/σ_xi), so
  * [[PlsModel.transform]] is unchanged in shape. `scale = false`
  * centers only (the round-8 behavior, kept as the default for the
  * existing identities: with nComponents = p it reproduces OLS exactly
  * either way, a property the spec pins). The scaling stats join the
  * same single means pass — no extra scan.
  */
object Pls {

  case class PlsModel(features: Seq[String], labelCol: String,
                      xMean: Array[Double], yMean: Double,
                      xStd: Array[Double], yStd: Double,
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
          nComponents: Int, scale: Boolean = false): PlsModel = {
    val p = features.size
    require(nComponents >= 1 && nComponents <= p,
      s"nComponents must be in [1, $p], got $nComponents")
    val meanAggs = (features.map(f => avg(col(f).cast("double"))) :+
      avg(col(labelCol).cast("double"))) ++
      (if (scale)
        features.map(f => stddev_samp(col(f).cast("double"))) :+
          stddev_samp(col(labelCol).cast("double"))
       else Nil)
    val mr = df.agg(meanAggs.head, meanAggs.tail: _*).head
    val xMean = Array.tabulate(p)(i => mr.getDouble(i))
    val yMean = mr.getDouble(p)
    // sklearn's zero-variance guard: a constant column scales by 1.0
    def std(i: Int): Double = {
      // stddev_samp is NULL (not NaN) on a 1-row frame — check null
      // BEFORE getDouble or the guard itself NPEs; null ≡ zero-variance
      if (mr.isNullAt(p + 1 + i)) return 1.0
      val v = mr.getDouble(p + 1 + i)
      if (v > 0.0 && !v.isNaN) v else 1.0
    }
    val xStd = if (scale) Array.tabulate(p)(std) else Array.fill(p)(1.0)
    val yStd = if (scale) std(p) else 1.0
    // centered (and, under scale, standardized) design as NAMED columns;
    // every deflation round re-projects them so downstream expressions
    // stay attribute references
    var cur: DataFrame = df.select(
      Array.tabulate(p)(i =>
        ((col(features(i)).cast("double") - lit(xMean(i))) / lit(xStd(i)))
          .as(s"_xc_$i")) :+
        ((col(labelCol).cast("double") - lit(yMean)) / lit(yStd)).as("_yc"): _*)
    def xc(i: Int): Column = col(s"_xc_$i")

    val ws = Array.ofDim[Double](nComponents, p)
    val ps = Array.ofDim[Double](nComponents, p)
    val qs = Array.ofDim[Double](nComponents)

    for (h <- 0 until nComponents) {
      // pass 1: w_h ∝ X_hᵀ y (p sums in one agg)
      val wAggs = Array.tabulate(p)(i => sum(xc(i) * col("_yc")))
      val wr = cur.agg(wAggs.head, wAggs.tail.toIndexedSeq: _*).head
      val wRaw = Array.tabulate(p)(i => wr.getDouble(i))
      val norm = math.sqrt(wRaw.map(v => v * v).sum)
      require(norm > 1e-12,
        s"PLS component ${h + 1}: X′y ≈ 0 — y is already fully deflated; " +
          s"request fewer components")
      val w = wRaw.map(_ / norm)
      val withT = cur.select(col("*"),
        Array.tabulate(p)(i => xc(i) * lit(w(i))).reduce(_ + _).as("_t"))
      // pass 2: tᵀt, p_h = X_hᵀt / tᵀt, q_h = yᵀt / tᵀt (p+2 sums, one agg)
      val aggs2 = sum(col("_t") * col("_t")) +:
        (Array.tabulate(p)(i => sum(xc(i) * col("_t"))).toSeq :+
          sum(col("_yc") * col("_t")))
      val r2 = withT.agg(aggs2.head, aggs2.tail.toIndexedSeq: _*).head
      val tt = r2.getDouble(0)
      val pl = Array.tabulate(p)(i => r2.getDouble(i + 1) / tt)
      qs(h) = r2.getDouble(p + 1) / tt
      ws(h) = w; ps(h) = pl
      // deflate: X_{h+1} = X_h − t·p_hᵀ, as a fresh projection
      cur = withT.select(
        Array.tabulate(p)(i =>
          (xc(i) - col("_t") * lit(pl(i))).as(s"_xc_$i")) :+ col("_yc"): _*)
    }

    // β = W (PᵀW)⁻¹ q — h×h driver solve; (PᵀW)_{ab} = p_a · w_b
    val m = Array.tabulate(nComponents, nComponents)((a, b) =>
      (0 until p).map(i => ps(a)(i) * ws(b)(i)).sum)
    val (mInv, _) = Customs.invertAndLogDet(m)
    val c = Array.tabulate(nComponents)(a =>
      (0 until nComponents).map(b => mInv(a)(b) * qs(b)).sum)
    // betaStd lives in the standardized space; fold the scaling back so
    // beta/intercept apply to RAW feature columns
    val betaStd = Array.tabulate(p)(i =>
      (0 until nComponents).map(h => ws(h)(i) * c(h)).sum)
    val beta = Array.tabulate(p)(i => betaStd(i) * yStd / xStd(i))
    val intercept = yMean - (0 until p).map(i => beta(i) * xMean(i)).sum
    // scores over the ORIGINAL features via the rotation identity
    // T = Xs·W(PᵀW)⁻¹ (R = W·mInv in this row-major layout): flat
    // p-term expressions usable on any frame carrying the feature cols
    // (1/σ folded into the rotation coefficient)
    val rot = Array.tabulate(p, nComponents)((i, hh) =>
      (0 until nComponents).map(b => ws(b)(i) * mInv(b)(hh)).sum)
    val tExprs = (0 until nComponents).map { hh =>
      (0 until p).map(i =>
        (col(features(i)).cast("double") - lit(xMean(i))) *
          lit(rot(i)(hh) / xStd(i)))
        .reduce(_ + _)
    }
    PlsModel(features, labelCol, xMean, yMean, xStd, yStd, ws, ps, qs,
      beta, intercept, tExprs)
  }
}
