package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml._

/** Specs for exact best-subset selection (M17) and PLS1 regression
  * (M20) — the last two SURVEY §2.7 rows previously carried doc-only. */
class SubsetPlsSpec extends AnyFunSuite {
  import TestSpark._

  // planted sparse truth: y = 3·x1 − 2·x4 (+ tiny noise) among 6
  // standard-normal features — the l0bnb recovery fixture shape
  // (explained_codes.ipynb cell 29)
  private lazy val planted: DataFrame =
    spark.range(400).select(
      randn(1).as("x1"), randn(2).as("x2"), randn(3).as("x3"),
      randn(4).as("x4"), randn(5).as("x5"), randn(6).as("x6"))
      .withColumn("y", col("x1") * 3.0 - col("x4") * 2.0 + randn(7) * 0.01)
      .cache()

  private val feats6 = Seq("x1", "x2", "x3", "x4", "x5", "x6")

  test("bestSubset recovers the planted support exactly at k=2 (M17)") {
    val path = Customs.bestSubset(planted, "y", feats6, maxK = 3)
    val k2 = path.find(_.k == 2).get
    assert(k2.support == Seq("x1", "x4"), s"wrong support: ${k2.support}")
    assert(math.abs(k2.coef("x1") - 3.0) < 0.05, s"x1 coef ${k2.coef("x1")}")
    assert(math.abs(k2.coef("x4") + 2.0) < 0.05, s"x4 coef ${k2.coef("x4")}")
    assert(math.abs(k2.intercept) < 0.05, s"intercept ${k2.intercept}")
    assert(k2.r2 > 0.999, s"planted fit should be near-perfect, r2=${k2.r2}")
  }

  test("bestSubset RSS is non-increasing in k and matches OLS at full k (M17)") {
    val path = Customs.bestSubset(planted, "y", feats6, maxK = 6)
    assert(path.map(_.k) == (1 to 6))
    path.sliding(2).foreach { case Seq(a, b) =>
      assert(b.rss <= a.rss + 1e-9, s"RSS rose k=${a.k}→${b.k}: ${a.rss}→${b.rss}")
    }
    // at k = p the "best subset" IS the OLS fit — cross-check against
    // MLlib's normal-equation solver (independent code path)
    val fit = Models.olsSummary(Features.assemble(planted, feats6, "_x"), "y", "_x")
    val n = planted.count().toDouble
    val olsRss = fit.rmse * fit.rmse * n
    val full = path.last
    assert(math.abs(full.rss - olsRss) <= 1e-6 * (1.0 + olsRss),
      s"full-k RSS ${full.rss} != OLS RSS $olsRss")
    assert(math.abs(full.r2 - fit.r2) < 1e-9, s"r2 ${full.r2} vs ${fit.r2}")
  }

  test("bestSubset skips rank-deficient supports instead of reporting garbage (M17)") {
    val dup = planted.withColumn("x1dup", col("x1"))
    val path = Customs.bestSubset(dup, "y", feats6 :+ "x1dup", maxK = 3)
    val k2 = path.find(_.k == 2).get
    // {x1, x1dup} is singular and must not win; the true support may use
    // either copy of x1
    assert(k2.support.contains("x4"), s"support ${k2.support}")
    assert(k2.support.forall(Set("x1", "x1dup", "x4")), s"support ${k2.support}")
    assert(k2.r2 > 0.999)
    // k=3 would admit {x1, x1dup, x4} (singular) — the guard must have
    // dropped it in favor of a full-rank support
    val k3 = path.find(_.k == 3).get
    assert(!(k3.support.contains("x1") && k3.support.contains("x1dup")),
      s"singular support survived: ${k3.support}")
  }

  // dense 3-feature fixture with real noise for the PLS specs
  private lazy val plsDf: DataFrame =
    spark.range(300).select(
      randn(31).as("f1"), randn(32).as("f2"), randn(33).as("f3"))
      .withColumn("y",
        col("f1") * 2.0 - col("f2") + col("f3") * 0.5 + randn(34) * 0.1)
      .cache()

  private val feats3 = Seq("f1", "f2", "f3")

  test("PLS with nComponents = p reproduces OLS exactly (M20)") {
    val pls = Pls.fit(plsDf, "y", feats3, nComponents = 3)
    val ols = Models.olsSummary(Features.assemble(plsDf, feats3, "_x"), "y", "_x")
    // ols.coefficients = feature coefs :+ intercept
    feats3.indices.foreach { i =>
      assert(math.abs(pls.beta(i) - ols.coefficients(i)) < 1e-6,
        s"beta($i): pls ${pls.beta(i)} vs ols ${ols.coefficients(i)}")
    }
    assert(math.abs(pls.intercept - ols.coefficients.last) < 1e-6,
      s"intercept: pls ${pls.intercept} vs ols ${ols.coefficients.last}")
  }

  test("PLS scores are mutually orthogonal (M20)") {
    val pls = Pls.fit(plsDf, "y", feats3, nComponents = 3)
    val ts = pls.scoreExprs
    val aggs = Seq(
      sum(ts(0) * ts(1)), sum(ts(0) * ts(2)), sum(ts(1) * ts(2)),
      sum(ts(0) * ts(0)), sum(ts(1) * ts(1)), sum(ts(2) * ts(2)))
    val r = plsDf.agg(aggs.head, aggs.tail: _*).head
    val scale = (3 to 5).map(r.getDouble).max
    (0 to 2).foreach { i =>
      assert(math.abs(r.getDouble(i)) < 1e-6 * scale,
        s"score cross product $i = ${r.getDouble(i)} (scale $scale)")
    }
  }

  test("distributed PLS matches a naive driver-side NIPALS (M20)") {
    // trusted reference: plain-array NIPALS PLS1 over the collected
    // fixture — O(n·p) on 300 rows, test-only
    val rows = plsDf.select(col("f1"), col("f2"), col("f3"), col("y"))
      .collect().map(r => (Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)), r.getDouble(3)))
    val n = rows.length; val p = 3; val hMax = 2
    val xMean = Array.tabulate(p)(j => rows.map(_._1(j)).sum / n)
    val yMean = rows.map(_._2).sum / n
    val x = rows.map { case (xi, _) => Array.tabulate(p)(j => xi(j) - xMean(j)) }
    val yc = rows.map(_._2 - yMean)
    val ws = Array.ofDim[Double](hMax, p); val psL = Array.ofDim[Double](hMax, p)
    val qs = Array.ofDim[Double](hMax)
    for (h <- 0 until hMax) {
      val wRaw = Array.tabulate(p)(j => x.indices.map(i => x(i)(j) * yc(i)).sum)
      val norm = math.sqrt(wRaw.map(v => v * v).sum)
      val w = wRaw.map(_ / norm)
      val t = x.map(xi => (0 until p).map(j => xi(j) * w(j)).sum)
      val tt = t.map(v => v * v).sum
      val pl = Array.tabulate(p)(j => x.indices.map(i => x(i)(j) * t(i)).sum / tt)
      qs(h) = x.indices.map(i => yc(i) * t(i)).sum / tt
      ws(h) = w; psL(h) = pl
      x.indices.foreach(i => (0 until p).foreach(j => x(i)(j) -= t(i) * pl(j)))
    }
    val m = Array.tabulate(hMax, hMax)((a, b) => (0 until p).map(i => psL(a)(i) * ws(b)(i)).sum)
    // local Gaussian elimination for M·c = q (h is tiny)
    val aug = Array.tabulate(hMax)(i => m(i) :+ qs(i))
    for (cIdx <- 0 until hMax) {
      val piv = (cIdx until hMax).maxBy(r => math.abs(aug(r)(cIdx)))
      val tmp = aug(piv); aug(piv) = aug(cIdx); aug(cIdx) = tmp
      val d = aug(cIdx)(cIdx)
      for (j <- 0 to hMax) aug(cIdx)(j) /= d
      for (r <- 0 until hMax if r != cIdx) {
        val f = aug(r)(cIdx)
        for (j <- 0 to hMax) aug(r)(j) -= f * aug(cIdx)(j)
      }
    }
    val c = Array.tabulate(hMax)(i => aug(i)(hMax))
    val betaRef = Array.tabulate(p)(i => (0 until hMax).map(h => ws(h)(i) * c(h)).sum)
    val interceptRef = yMean - (0 until p).map(i => betaRef(i) * xMean(i)).sum

    val pls = Pls.fit(plsDf, "y", feats3, nComponents = hMax)
    (0 until p).foreach { i =>
      assert(math.abs(pls.beta(i) - betaRef(i)) < 1e-8,
        s"beta($i): distributed ${pls.beta(i)} vs naive ${betaRef(i)}")
    }
    assert(math.abs(pls.intercept - interceptRef) < 1e-8)
  }

  test("PLS scale=true matches a naive scaled NIPALS; OLS identity survives scaling (M20)") {
    // sklearn PLSRegression(scale=True) semantics: standardize X and y
    // (ddof=1) before NIPALS, fold the scaling back into raw-unit
    // coefficients — the closed M20 delta. Reference: plain-array NIPALS
    // on the standardized collected fixture.
    val rows = plsDf.select(col("f1"), col("f2"), col("f3"), col("y"))
      .collect().map(r => (Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)), r.getDouble(3)))
    val n = rows.length; val p = 3; val hMax = 2
    val xMean = Array.tabulate(p)(j => rows.map(_._1(j)).sum / n)
    val yMean = rows.map(_._2).sum / n
    def sd(vals: Seq[Double], m: Double) =
      math.sqrt(vals.map(v => (v - m) * (v - m)).sum / (n - 1))
    val xStd = Array.tabulate(p)(j => sd(rows.map(_._1(j)).toSeq, xMean(j)))
    val yStd = sd(rows.map(_._2).toSeq, yMean)
    val x = rows.map { case (xi, _) =>
      Array.tabulate(p)(j => (xi(j) - xMean(j)) / xStd(j)) }
    val yc = rows.map(r => (r._2 - yMean) / yStd)
    val ws = Array.ofDim[Double](hMax, p); val psL = Array.ofDim[Double](hMax, p)
    val qs = Array.ofDim[Double](hMax)
    for (h <- 0 until hMax) {
      val wRaw = Array.tabulate(p)(j => x.indices.map(i => x(i)(j) * yc(i)).sum)
      val norm = math.sqrt(wRaw.map(v => v * v).sum)
      val w = wRaw.map(_ / norm)
      val t = x.map(xi => (0 until p).map(j => xi(j) * w(j)).sum)
      val tt = t.map(v => v * v).sum
      val pl = Array.tabulate(p)(j => x.indices.map(i => x(i)(j) * t(i)).sum / tt)
      qs(h) = x.indices.map(i => yc(i) * t(i)).sum / tt
      ws(h) = w; psL(h) = pl
      x.indices.foreach(i => (0 until p).foreach(j => x(i)(j) -= t(i) * pl(j)))
    }
    val m = Array.tabulate(hMax, hMax)((a, b) =>
      (0 until p).map(i => psL(a)(i) * ws(b)(i)).sum)
    val aug = Array.tabulate(hMax)(i => m(i) :+ qs(i))
    for (cIdx <- 0 until hMax) {
      val piv = (cIdx until hMax).maxBy(r => math.abs(aug(r)(cIdx)))
      val tmp = aug(piv); aug(piv) = aug(cIdx); aug(cIdx) = tmp
      val d = aug(cIdx)(cIdx)
      for (j <- 0 to hMax) aug(cIdx)(j) /= d
      for (r <- 0 until hMax if r != cIdx) {
        val f = aug(r)(cIdx)
        for (j <- 0 to hMax) aug(r)(j) -= f * aug(cIdx)(j)
      }
    }
    val c = Array.tabulate(hMax)(i => aug(i)(hMax))
    val betaRef = Array.tabulate(p)(i =>
      (0 until hMax).map(h => ws(h)(i) * c(h)).sum * yStd / xStd(i))
    val interceptRef = yMean - (0 until p).map(i => betaRef(i) * xMean(i)).sum

    val pls = Pls.fit(plsDf, "y", feats3, nComponents = hMax, scale = true)
    (0 until p).foreach { i =>
      assert(math.abs(pls.beta(i) - betaRef(i)) < 1e-8,
        s"beta($i): distributed ${pls.beta(i)} vs naive scaled ${betaRef(i)}")
    }
    assert(math.abs(pls.intercept - interceptRef) < 1e-8)
    // scaling is a reparametrization: at full rank both variants are OLS
    val full = Pls.fit(plsDf, "y", feats3, nComponents = 3, scale = true)
    val ols = Models.olsSummary(Features.assemble(plsDf, feats3, "_x"), "y", "_x")
    feats3.indices.foreach { i =>
      assert(math.abs(full.beta(i) - ols.coefficients(i)) < 1e-6)
    }
    assert(math.abs(full.intercept - ols.coefficients.last) < 1e-6)
    // a scaled fit differs from an unscaled one below full rank (the
    // parameter is load-bearing, not cosmetic)
    val unscaled = Pls.fit(plsDf, "y", feats3, nComponents = hMax)
    assert((0 until p).exists(i =>
      math.abs(unscaled.beta(i) - pls.beta(i)) > 1e-10))
    // constant column: the zero-variance guard keeps the fit finite
    val withConst = plsDf.withColumn("f0", lit(3.0))
    val cg = Pls.fit(withConst, "y", Seq("f0") ++ feats3, nComponents = 2,
      scale = true)
    assert(cg.beta.forall(java.lang.Double.isFinite))
    // 1-row frame + scale=true: stddev_samp is NULL (not NaN) there, so
    // the guard must check isNullAt before getDouble (r9 ADVICE: this
    // NPE'd). The fit still fails — X′y ≡ 0 after centering — but with
    // the clear require() message, same as the unscaled path.
    val oneRow = plsDf.limit(1)
    val ex = intercept[IllegalArgumentException] {
      Pls.fit(oneRow, "y", feats3, nComponents = 1, scale = true)
    }
    assert(ex.getMessage.contains("fully deflated"), ex.getMessage)
  }

  test("PLS transform adds a prediction column with near-OLS error (M20)") {
    val pls = Pls.fit(plsDf, "y", feats3, nComponents = 2)
    val pred = pls.transform(plsDf)
    val rmse = math.sqrt(pred.agg(avg(pow(col("y") - col("prediction"), 2)))
      .head.getDouble(0))
    assert(rmse < 0.15, s"2-component PLS rmse $rmse") // noise sd = 0.1
  }

  test("PLS expression size stays linear in components (p=8, h=6)") {
    // regression for the deflation blowup: nested Column expressions grew
    // ~(p+1)^h — a p=8/h=6 fit built ~10^5-node agg trees and crawled;
    // the projected form completes in ordinary test time with exact
    // OLS recovery at full rank intact
    val feats = (1 to 8).map(i => s"g$i")
    val wide = spark.range(400).select(
      feats.zipWithIndex.map { case (f, i) => randn(50 + i).as(f) }: _*)
      .withColumn("y",
        feats.zipWithIndex.map { case (f, i) => col(f) * (i + 1).toDouble }
          .reduce(_ + _) + randn(99) * 0.1)
    val pls = Pls.fit(wide, "y", feats, nComponents = 6)
    assert(pls.beta.forall(java.lang.Double.isFinite))
    val pred = pls.transform(wide)
    val rmse = math.sqrt(pred.agg(avg(pow(col("y") - col("prediction"), 2)))
      .head.getDouble(0))
    assert(rmse < 1.0, s"6-component PLS on 8 features rmse $rmse")
  }
}
