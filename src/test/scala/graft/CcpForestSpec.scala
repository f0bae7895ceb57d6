package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml._
import graft.operators.{Intervals, Sampling}

/** Specs for round 4's coverage closers: true cost-complexity pruning
  * (M7), the real Isolation Forest (M22), the bucket-grid range join and
  * the weighted corpus mix (q57/q58 brute-force twins). */
class CcpForestSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // two separable blobs plus 15% label noise: a deep tree overfits the
  // noise into singleton leaves, exactly what ccp pruning must undo
  private lazy val noisy: DataFrame =
    spark.range(600).select(
        col("id"),
        (randn(7) + when(col("id") % 2 === 1, 2.5).otherwise(0.0)).as("f1"),
        (randn(8) + when(col("id") % 2 === 1, 2.5).otherwise(0.0)).as("f2"))
      .withColumn("label",
        when(pmod(xxhash64(col("id")), lit(100)) < 15,
          lit(1.0) - (col("id") % 2).cast("double"))
          .otherwise((col("id") % 2).cast("double")))
      .drop("id")

  private lazy val fitted = {
    val assembled = Features.assemble(noisy, Seq("f1", "f2"), "features")
    Models.decisionTree("label", maxDepth = 8).fit(assembled)
  }
  private lazy val ccpPath =
    CcpPruning.pruningPath(fitted, noisy, "label", Seq("f1", "f2"))

  test("ccp path: alphas strictly increase, trees shrink to a stump (M7)") {
    val a = ccpPath.alphas
    assert(a.head == 0.0)
    assert(a.sliding(2).forall { case Array(x, y) => y > x; case _ => true },
      s"alphas not increasing: ${a.mkString(",")}")
    val leaves = ccpPath.trees.map(_.leaves)
    assert(leaves.sliding(2).forall { case Array(x, y) => y < x; case _ => true },
      s"leaf counts not decreasing: ${leaves.mkString(",")}")
    assert(leaves.last == 1, "path must end at the root stump")
    assert(leaves.head > 4, "the unpruned depth-8 tree should have overfit")
  }

  test("ccp path: risk increase per step equals alpha times leaves removed") {
    // the defining identity of weakest-link pruning: collapsing the
    // minimizing node(s) raises subtree risk by exactly g per removed
    // leaf — under the tree's OWN criterion (Models.decisionTree grows
    // with entropy, and pruningPath now prunes with it: sklearn
    // semantics, the closed M7 delta)
    val total = ccpPath.trees.head.n.toDouble
    ccpPath.alphas.indices.drop(1).foreach { k =>
      val dR = ccpPath.trees(k).subtreeRisk(total, CcpPruning.entropy) -
        ccpPath.trees(k - 1).subtreeRisk(total, CcpPruning.entropy)
      val dLeaves = ccpPath.trees(k - 1).leaves - ccpPath.trees(k).leaves
      assert(math.abs(dR - ccpPath.alphas(k) * dLeaves) < 1e-9,
        s"step $k: dR=$dR alpha*dLeaves=${ccpPath.alphas(k) * dLeaves}")
    }
  }

  test("ccp path trees are OPTIMAL prunings under the grown (entropy) criterion") {
    // independent reference: enumerate EVERY valid pruning of a small
    // entropy-grown tree (all antichain collapses) and check that each
    // path entry minimizes R(T) + α·|leaves(T)| over the whole space for
    // α just past its breakpoint, with the fewest leaves among
    // minimizers — the CART optimality theorem, verified by brute force
    // rather than by re-running the engine's own weakest-link logic
    val assembled = Features.assemble(noisy, Seq("f1", "f2"), "features")
    val small = Models.decisionTree("label", maxDepth = 3).fit(assembled)
    assert(small.getImpurity == "entropy") // the criterion under test
    val root = CcpPruning.extract(small, noisy, "label", Seq("f1", "f2"))
    val p = CcpPruning.pruningPath(small, noisy, "label", Seq("f1", "f2"))
    def allPrunings(t: CcpPruning.PTree): Seq[CcpPruning.PTree] = t match {
      case l: CcpPruning.PLeaf => Seq(l)
      case s: CcpPruning.PSplit =>
        CcpPruning.PLeaf(s.counts) +: (for {
          l <- allPrunings(s.left); r <- allPrunings(s.right)
        } yield s.copy(left = l, right = r))
    }
    val space = allPrunings(root)
    assert(space.size > p.trees.length, "enumeration must exceed the path")
    val total = root.n.toDouble
    def cost(t: CcpPruning.PTree, a: Double): Double =
      t.subtreeRisk(total, CcpPruning.entropy) + a * t.leaves
    // probe α midway into each path segment (and past the last breakpoint)
    val probes = p.alphas.indices.map { k =>
      if (k + 1 < p.alphas.length) (p.alphas(k) + p.alphas(k + 1)) / 2
      else p.alphas(k) + 1.0
    }
    probes.zipWithIndex.foreach { case (a, k) =>
      val best = space.map(t => cost(t, a)).min
      val t = p.trees(k)
      assert(cost(t, a) <= best + 1e-12,
        s"path tree $k is not optimal at alpha=$a")
      val minLeaves = space.filter(s => cost(s, a) <= best + 1e-12)
        .map(_.leaves).min
      assert(t.leaves == minLeaves,
        s"path tree $k has ${t.leaves} leaves; a ${minLeaves}-leaf pruning ties")
    }
  }

  test("ccp at alpha=0 reproduces the MLlib tree's predictions") {
    val assembled = Features.assemble(noisy, Seq("f1", "f2"), "features")
    val mllib = fitted.transform(assembled).select(col("prediction"))
      .as[Double].collect()
    val ours = assembled.select(
      CcpPruning.predictColumn(ccpPath.pruneAt(0.0), Seq("f1", "f2"))
        .as("p")).as[Double].collect()
    assert(mllib.sameElements(ours),
      "unpruned PTree must route every row exactly like the MLlib model")
  }

  test("ccp at huge alpha predicts the majority class everywhere") {
    val stump = ccpPath.pruneAt(1e9)
    assert(stump.leaves == 1)
    val majority = noisy.groupBy(col("label")).count()
      .orderBy(col("count").desc, col("label")).head.getDouble(0)
    assert(stump.prediction == majority)
  }

  test("ccp CV selects a pruned tree at least as accurate held-out (M7)") {
    val holdout = noisy.filter(pmod(xxhash64(col("f1"), col("f2")), lit(5)) === 0)
    val trainDf = noisy.exceptAll(holdout)
    val (alpha, pruned, p) =
      CcpPruning.cvSelect(trainDf, "label", Seq("f1", "f2"), maxDepth = 8)
    assert(alpha > 0.0, "15% label noise must force some pruning")
    assert(pruned.leaves < p.trees.head.leaves,
      s"selected tree (${pruned.leaves} leaves) should be smaller than " +
        s"full (${p.trees.head.leaves})")
    def acc(t: CcpPruning.PTree): Double = {
      val n = holdout.count().toDouble
      holdout.filter(CcpPruning.predictColumn(t, Seq("f1", "f2")) ===
        col("label")).count() / n
    }
    val prunedAcc = acc(pruned)
    val fullAcc = acc(p.trees.head)
    assert(prunedAcc >= fullAcc - 0.02,
      s"pruned=$prunedAcc full=$fullAcc — pruning should not cost accuracy")
    assert(prunedAcc > 0.8, s"pruned accuracy $prunedAcc")
  }

  // ---- Isolation Forest (M22) ----

  // 400 inliers around the origin, 8 planted isolates far outside
  private lazy val anomalies: DataFrame =
    spark.range(400).select(
        col("id"), randn(11).as("x1"), randn(12).as("x2"))
      .withColumn("x1", when(col("id") < 8, col("x1") + 9.0).otherwise(col("x1")))
      .withColumn("x2", when(col("id") < 8, col("x2") - 9.0).otherwise(col("x2")))

  test("isolation forest isolates the planted outliers (M22)") {
    val model = IsolationForest.fit(anomalies, Seq("x1", "x2"),
      nTrees = 100, sampleSize = 64)
    val top = model.transform(anomalies)
      .orderBy(col("anomaly_score").desc).select(col("id")).limit(8)
      .as[Long].collect().toSet
    assert(top == (0L until 8L).toSet,
      s"top-8 scores should be the planted outliers, got $top")
    // and the paper's score semantics: isolates well above 0.6, the
    // bulk of inliers below it
    val flagged = model.transform(anomalies)
      .filter(col("is_anomaly") === 1).count()
    assert(flagged >= 8 && flagged <= 40, s"flagged=$flagged")
  }

  test("isolation forest is deterministic for a fixed seed") {
    val m1 = IsolationForest.fit(anomalies, Seq("x1", "x2"), nTrees = 20,
      sampleSize = 64)
    val m2 = IsolationForest.fit(anomalies, Seq("x1", "x2"), nTrees = 20,
      sampleSize = 64)
    val s1 = m1.transform(anomalies).select(col("anomaly_score"))
      .as[Double].collect()
    val s2 = m2.transform(anomalies).select(col("anomaly_score"))
      .as[Double].collect()
    assert(s1.sameElements(s2))
  }

  test("avgPathLength matches the paper's c(n)") {
    assert(IsolationForest.avgPathLength(1) == 0.0)
    // c(2) = 2·H(1) − 2·(1/2) = 2·γ − 1 ≈ 0.1544 (H(1) = ln1 + γ)
    assert(math.abs(IsolationForest.avgPathLength(2) -
      (2 * 0.5772156649 - 1.0)) < 1e-6)
    // monotone in n, ~2·ln(n) growth
    assert(IsolationForest.avgPathLength(256) >
      IsolationForest.avgPathLength(64))
  }

  // ---- OLS prediction intervals (M1 companion) ----

  test("olsIntervals: 95% prediction interval covers ~95% of points") {
    // y = 2 + 3x + N(0,1), n=2000 — statsmodels' summary_frame semantics
    val df = spark.range(2000).select((randn(21) * 2.0).as("x"))
      .withColumn("y", lit(2.0) + lit(3.0) * col("x") + randn(22))
    val out = Approx.olsIntervals(df, "y", Seq("x")).cache()
    val n = out.count().toDouble
    val inPi = out.filter(col("y").between(col("pi_lo"), col("pi_hi"))).count() / n
    assert(inPi > 0.93 && inPi < 0.97, s"PI coverage $inPi")
    // the mean-response CI must be strictly inside the PI, and the CI for
    // the mean must be far narrower (√h vs √(1+h), h ≈ 1/n near x̄)
    assert(out.filter(col("ci_lo") < col("pi_lo") - 1e-12 ||
      col("ci_hi") > col("pi_hi") + 1e-12).count() == 0)
    val widths = out.agg(
      avg(col("ci_hi") - col("ci_lo")), avg(col("pi_hi") - col("pi_lo"))).head
    assert(widths.getDouble(0) < widths.getDouble(1) / 5,
      s"CI ${widths.getDouble(0)} vs PI ${widths.getDouble(1)}")
    // closed form at the mean: CI halfwidth ≈ t·s·√(1/n)
    val minCi = out.agg(min(col("ci_hi") - col("ci_lo"))).head.getDouble(0)
    val expect = 2 * Approx.tQuantile(0.975, n - 2) * math.sqrt(1.0 / n)
    assert(math.abs(minCi - expect) / expect < 0.1,
      s"narrowest CI $minCi vs closed-form $expect")
    out.unpersist()
  }

  test("tQuantile matches known critical values") {
    assert(math.abs(Approx.tQuantile(0.975, 1e9) - 1.959964) < 1e-4)
    assert(math.abs(Approx.tQuantile(0.975, 30) - 2.042272) < 1e-4)
    assert(math.abs(Approx.tQuantile(0.95, 100) - 1.660234) < 1e-4)
  }

  test("tQuantile is EXACT at every df (40-digit mpmath references, r10)") {
    // reference grid computed with mpmath at 40 decimal digits by
    // bisecting the exact CDF 1 − I_{df/(df+t²)}(df/2, ½)/2 — the
    // Cornish-Fisher form this replaced was 1e-3 off at df = 5 and
    // unusable at df = 1
    val ps = Seq(0.6, 0.9, 0.95, 0.975, 0.995, 0.9995)
    val refs: Map[Int, Seq[Double]] = Map(
      1 -> Seq(0.32491969623290633, 3.0776835371752534, 6.3137515146750431,
        12.706204736174705, 63.656741162871581, 636.61924876871962),
      2 -> Seq(0.28867513459481288, 1.8856180831641267, 2.9199855803537257,
        4.3026527297494639, 9.9248432009182931, 31.599054576443621),
      3 -> Seq(0.27667066233268991, 1.6377443536962101, 2.3533634348018239,
        3.1824463052837096, 5.8409093097333573, 12.923978636687483),
      5 -> Seq(0.26718086570414513, 1.4758840488244811, 2.0150483733330242,
        2.5705818356363155, 4.0321429835552281, 6.8688266258811102),
      10 -> Seq(0.26018482949208024, 1.3721836411103356, 1.8124611228116764,
        2.2281388519862747, 3.1692726726169512, 4.5868938587026359),
      30 -> Seq(0.25560536495191277, 1.3104150253913956, 1.6972608865939578,
        2.0422724563012383, 2.7499956535672253, 3.6459586350420218),
      100 -> Seq(0.25402218245822782, 1.290074761346516, 1.6602343260853396,
        1.9839715185235523, 2.6258905214380179, 3.3904913111642299))
    for ((df, row) <- refs; (p, want) <- ps.zip(row)) {
      val got = Approx.tQuantile(p, df)
      assert(math.abs(got - want) / want < 1e-10,
        f"t($p%.4f, df=$df): got $got%.15f want $want%.15f")
      // and the symmetric tail
      assert(math.abs(Approx.tQuantile(1 - p, df) + want) / want < 1e-10)
    }
  }

  // ---- q57 / q58 brute-force twins ----

  test("bucket-grid range join equals the brute-force inequality join") {
    val grid = Intervals.errorWindowEvents(spark, sf)
    val ev = graft.sources.Tables(spark, sf, "events")
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u"),
        col("ts").as("lo"))
    val pts = ev.filter(col("event_type") =!= "error")
    val brute = pts.join(err, pts("user_id") === err("u") &&
        pts("ts") >= err("lo") &&
        pts("ts") < err("lo") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("err_id")).as("n_windows"),
        countDistinct(col("event_id")).as("n_events"))
    assert(grid.exceptAll(brute).isEmpty && brute.exceptAll(grid).isEmpty,
      "grid join diverges from brute force")
    assert(grid.agg(sum("n_pairs")).head.getLong(0) > 0, "fixture too sparse")
  }

  test("one-vs-one RBF-SVC separates 3 concentric rings (M12 complete)") {
    // radially separable only — each pairwise SVC must use the RFF space
    def ring(n: Int, r: Double, seed: Int, label: Double): DataFrame = {
      val angle = rand(seed) * 2 * math.Pi
      spark.range(n).select(
        (cos(angle) * r + randn(seed + 100) * 0.2).as("f1"),
        (sin(angle) * r + randn(seed + 200) * 0.2).as("f2"),
        lit(label).as("label"))
    }
    val rings = ring(150, 0.0, 70, 0.0)
      .unionByName(ring(150, 2.0, 71, 1.0))
      .unionByName(ring(150, 4.0, 72, 2.0)).cache()
    val scorer = Approx.rbfSvcOvo(rings, "label", Seq("f1", "f2"),
      d = 128, gamma = 0.5)
    val pred = scorer(rings)
    val acc = pred.filter(col("prediction") === col("label")).count().toDouble /
      pred.count()
    assert(acc > 0.85, s"OVO rbf accuracy=$acc")
    // votes resolve to an actual class label, and the pairwise scratch
    // columns do not leak into the output
    val preds = pred.select(col("prediction")).distinct()
      .as[Double].collect().toSet
    assert(preds.subsetOf(Set(0.0, 1.0, 2.0)), s"labels $preds")
    assert(!pred.columns.exists(_.startsWith("_ovo_")),
      pred.columns.mkString(","))
    rings.unpersist()
  }

  test("exact RBF-kernel SVM: rings separated, KKT-certified optimal, codegen scoring (M12 exact)") {
    // two concentric rings — radially separable ONLY through the kernel
    def ring(n: Int, r: Double, seed: Int, label: Double): DataFrame = {
      val angle = rand(seed) * 2 * math.Pi
      spark.range(n).select(
        (cos(angle) * r + randn(seed + 100) * 0.15).as("f1"),
        (sin(angle) * r + randn(seed + 200) * 0.15).as("f2"),
        lit(label).as("label"))
    }
    val rings = ring(150, 0.8, 80, 1.0).unionByName(ring(150, 2.6, 81, 0.0))
      .cache()
    val m = KernelSvm.fit(rings, "label", Seq("f1", "f2"),
      c = 10.0, gamma = 1.0, maxSamples = 300)
    // the dual-optimality certificate: zero KKT violations means SMO
    // actually solved the exact problem, not "converged somewhere"
    assert(m.kktViolations() == 0,
      s"${m.kktViolations()} KKT violations — SMO did not reach the optimum")
    // non-linear separation through the exact kernel
    val pred = m.transform(rings)
    val acc = pred.filter(col("prediction") === col("label")).count().toDouble /
      pred.count()
    assert(acc > 0.97, s"exact-kernel accuracy=$acc")
    // ... where a LINEAR machine cannot get off the ground
    val lin = Models.linearSvc("label", c = 10.0, n = 300).fit(
      Features.assemble(rings, Seq("f1", "f2"), "features"))
    val linAcc = lin.transform(Features.assemble(rings, Seq("f1", "f2"), "features"))
      .filter(col("prediction") === col("label")).count().toDouble / 300
    assert(linAcc < 0.75, s"rings should defeat a linear SVM, acc=$linAcc")
    // codegen'd column scoring ≡ the driver-side decision function
    val viaColumn = pred.select(col("f1"), col("f2"), col("decision"))
      .collect()
    viaColumn.take(25).foreach { r =>
      val x = Array(r.getDouble(0), r.getDouble(1))
      val driver = m.svX.indices.map { j =>
        val s = x.indices.map(d => (x(d) - m.svX(j)(d)) * (x(d) - m.svX(j)(d))).sum
        m.svAlphaY(j) * math.exp(-m.gamma * s)
      }.sum + m.b
      assert(math.abs(driver - r.getDouble(2)) < 1e-8,
        s"column decision ${r.getDouble(2)} vs driver $driver")
    }
    // deterministic: the bounded sample is hash-ordered, so a refit is
    // bit-identical (support count, bias, multipliers)
    val m2 = KernelSvm.fit(rings, "label", Seq("f1", "f2"),
      c = 10.0, gamma = 1.0, maxSamples = 300)
    assert(m2.b == m.b && m2.alphas.sameElements(m.alphas))
    // bounded-sample contract: a cap below n still fits and certifies
    val mSmall = KernelSvm.fit(rings, "label", Seq("f1", "f2"),
      c = 10.0, gamma = 1.0, maxSamples = 120)
    assert(mSmall.trainX.length == 120 && mSmall.kktViolations() == 0)
    rings.unpersist()
  }

  test("exact-kernel OVO separates 3 concentric rings (M12 exact multiclass)") {
    def ring(n: Int, r: Double, seed: Int, label: Double): DataFrame = {
      val angle = rand(seed) * 2 * math.Pi
      spark.range(n).select(
        (cos(angle) * r + randn(seed + 100) * 0.15).as("f1"),
        (sin(angle) * r + randn(seed + 200) * 0.15).as("f2"),
        lit(label).as("label"))
    }
    val rings = ring(100, 0.6, 90, 0.0)
      .unionByName(ring(100, 2.0, 91, 1.0))
      .unionByName(ring(100, 3.6, 92, 2.0)).cache()
    val scorer = KernelSvm.fitOvo(rings, "label", Seq("f1", "f2"),
      c = 10.0, gamma = 1.0)
    val pred = scorer(rings)
    val acc = pred.filter(col("prediction") === col("label")).count().toDouble /
      pred.count()
    assert(acc > 0.95, s"exact OVO accuracy=$acc")
    val preds = pred.select(col("prediction")).distinct()
      .as[Double].collect().toSet
    assert(preds.subsetOf(Set(0.0, 1.0, 2.0)), s"labels $preds")
    assert(!pred.columns.exists(_.startsWith("_ovo_")),
      pred.columns.mkString(","))
    rings.unpersist()
  }

  test("degenerate kernel SVM (zero support vectors) scores as f(x)=b, no throw") {
    // duplicate points with CONFLICTING labels: K is all-ones, so
    // η = 2K₁₂ − K₁₁ − K₂₂ = 0 for every pair — no α ever moves, the
    // fit ends with an empty support set, and scoring must degrade to
    // the constant f(x) = b (r9 ADVICE: the reduce over SV terms threw
    // UnsupportedOperationException here before the fold-seed fix)
    val dup = Seq((1.0, 1.0, 0.0), (1.0, 1.0, 1.0), (1.0, 1.0, 0.0),
      (1.0, 1.0, 1.0)).toDF("f1", "f2", "label")
    val m = KernelSvm.fit(dup, "label", Seq("f1", "f2"), c = 1.0, gamma = 1.0)
    assert(m.svX.isEmpty, s"expected zero SVs, got ${m.svX.length}")
    val scored = m.transform(dup).select(col("decision"), col("prediction"))
      .collect()
    scored.foreach { r =>
      assert(r.getDouble(0) == m.b && r.getDouble(1) == (if (m.b > 0) 1.0 else 0.0))
    }
  }

  test("unigram LM scoring: common-token docs outscore rare-token docs (q59)") {
    val lm = operators.TextOps.unigramLmScore(spark, sf).cache()
    // every doc: negative log-probs, min ≤ avg, token count matches the
    // q21 tokenizer
    assert(lm.filter(col("avg_logp") >= 0 || col("min_logp") > col("avg_logp"))
      .count() == 0)
    val stats = operators.TextOps.docStats(spark, sf)
      .select(col("doc_id"), col("n_tokens").as("expected"))
    assert(lm.join(stats, "doc_id")
      .filter(col("n_tokens") =!= col("expected")).count() == 0)
    // the corpus's highest-avg_logp doc must be built from more common
    // tokens than the lowest one — cross-check via the q22 frequency table
    val docs = graft.sources.Tables(spark, sf, "documents")
    val freq = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").count()
    def meanFreq(id: Long): Double =
      docs.filter(col("doc_id") === id)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
        .join(freq, "token").agg(avg(col("count"))).head.getDouble(0)
    val hi = lm.orderBy(col("avg_logp").desc).head.getLong(0)
    val lo = lm.orderBy(col("avg_logp")).head.getLong(0)
    assert(meanFreq(hi) > meanFreq(lo),
      s"doc $hi (high score) should use commoner tokens than $lo")
    lm.unpersist()
  }

  test("weighted mix audit: rates applied per source group") {
    val audit = Sampling.mixedCorpusAudit(spark, sf).collect()
    val bySource = audit.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.sources.Tables(spark, sf, "documents")
    val totals = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.keys.foreach { src =>
      val g = src.drop(3).toInt % 4
      val (n, chars) = bySource.getOrElse(src, (0L, 0L))
      g match {
        case 0 => assert(n == 2 * totals(src), s"$src upsample 2x")
        case 1 => assert(n == totals(src), s"$src keep")
        case 2 => // ~half, hash-exact: bounded by the source size
          assert(n > 0 && n < totals(src), s"$src half got $n")
        case 3 => assert(n < totals(src) / 2 + 2, s"$src quarter got $n")
      }
      if (n > 0) assert(chars > 0)
    }
    // fractional sampling is hash-deterministic: rerun is identical
    val again = Sampling.mixedCorpusAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == bySource)
  }
}
