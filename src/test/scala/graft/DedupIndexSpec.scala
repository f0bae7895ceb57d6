package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed dedup-index storage layer (DedupIndex): verdict parity
  * with the in-memory classifier, and the 100-TB claim itself — the
  * stored index is probed WITHOUT shuffling — asserted on the physical
  * plan, not prose. */
class DedupIndexSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.{Dedup, DedupIndex, Sampling}

  private val prefix = "graft_didx"

  private def dropAll(): Unit =
    Seq(DedupIndex.exactTable(prefix), DedupIndex.bandTable(prefix),
      DedupIndex.embTable(prefix), DedupIndex.imgTable(prefix),
      DedupIndex.afpTable(prefix), DedupIndex.vidTable(prefix))
      .foreach(DedupIndex.dropTable(spark, _))

  test("indexed three-tier classify: zero index-side exchange, verdicts ≡ in-memory") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val embs = graft.sources.Tables(spark, sf, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val isNew = Sampling.hashBucket(col("doc_id"), 5) === 4
    val (batch, corpus) = (docs.filter(isNew), docs.filter(!isNew))
    val (batchEmb, corpusEmb) = (embs.filter(isNew), embs.filter(!isNew))
    dropAll()
    DedupIndex.saveIndex(corpus, corpusEmb, prefix, buckets = 4)
    // force sort-merge joins so the exchange lint exercises the bucketed
    // path (broadcasting the batch would trivially satisfy it), and a
    // concrete (non-adaptive) plan so exchanges are statically visible
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val indexed = DedupIndex.classifyNew3Indexed(spark, batch, batchEmb, prefix)
      val plan = indexed.queryExecution.executedPlan
      // an index-table scan must never sit under a shuffle — the lint
      // itself lives in DedupIndex (the q74 declared query runs the same
      // code), the spec exercises it under the pinned confs
      def isIndexScan(f: FileSourceScanExec): Boolean =
        f.relation.location.rootPaths.exists(_.toString.contains(prefix))
      val offending = DedupIndex.indexShuffleOffenders(plan, prefix)
      assert(offending.isEmpty,
        s"the stored index is shuffled before ${offending.size} join(s):\n" +
          offending.mkString("\n---\n"))
      // the probes really are sort-merge joins over bucketed scans (not
      // some degenerate shape that never needed a distribution)
      val planStr = plan.toString
      assert(planStr.contains("SortMergeJoin"),
        s"expected SMJ probes with broadcast disabled:\n${planStr.take(2000)}")
      assert(plan.collect { case f: FileSourceScanExec if isIndexScan(f) => f }
        .forall(_.relation.bucketSpec.isDefined),
        "index scans must read the bucketed layout")
      // and the verdicts are EXACTLY the in-memory classifier's
      val expected = Dedup.incrementalDedup3(spark, sf)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(rows(indexed) == rows(expected),
        "indexed classify must equal the in-memory three-tier classifier")
      operators.Caches.release()
      spark.catalog.clearCache()
    } finally {
      prev.foreach {
        case (c, Some(v)) => spark.conf.set(c, v)
        case (c, None)    => spark.conf.unset(c)
      }
      dropAll()
    }
  }

  test("four-tier indexed classify: zero index-side exchange, verdicts ≡ in-memory (q75)") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val embs = graft.sources.Tables(spark, sf, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val imgs = graft.operators.Multimodal.imageDHashes(spark, sf)
      .select(col("media_id").as("doc_id"), col("dhash"))
    val isNew = Sampling.hashBucket(col("doc_id"), 5) === 4
    dropAll()
    DedupIndex.saveIndex(docs.filter(!isNew), embs.filter(!isNew), prefix,
      buckets = 4)
    DedupIndex.saveImgIndex(imgs.filter(!isNew), prefix, buckets = 4)
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val indexed = DedupIndex.classifyNew4Indexed(spark,
        docs.filter(isNew), embs.filter(isNew), imgs.filter(isNew), prefix)
      val offending = DedupIndex.indexShuffleOffenders(
        indexed.queryExecution.executedPlan, prefix)
      assert(offending.isEmpty,
        s"the stored index is shuffled before ${offending.size} join(s):\n" +
          offending.mkString("\n---\n"))
      val expected = Dedup.incrementalDedup4(spark, sf)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(rows(indexed) == rows(expected),
        "indexed four-tier classify must equal the in-memory classifier")
      assert(rows(indexed).exists(_._2 == "near_image"),
        "fixture must exercise the image tier (else this test proves nothing)")
      operators.Caches.release()
      spark.catalog.clearCache()
    } finally {
      prev.foreach {
        case (c, Some(v)) => spark.conf.set(c, v)
        case (c, None)    => spark.conf.unset(c)
      }
      dropAll()
    }
  }

  test("six-tier indexed classify: zero index-side exchange, verdicts ≡ in-memory (q78/q79)") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val embs = graft.sources.Tables(spark, sf, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val imgs = graft.operators.Multimodal.imageDHashes(spark, sf)
      .select(col("media_id").as("doc_id"), col("dhash"))
    val afps = graft.operators.Multimodal.audioFingerprints(spark, sf)
      .select(col("media_id").as("doc_id"), col("afp"))
    val vids = graft.operators.Multimodal.videoHashes(spark, sf)
      .select(col("media_id").as("doc_id"), col("dhash"))
    val isNew = Sampling.hashBucket(col("doc_id"), 5) === 4
    dropAll()
    DedupIndex.saveIndex(docs.filter(!isNew), embs.filter(!isNew), prefix,
      buckets = 4)
    DedupIndex.saveImgIndex(imgs.filter(!isNew), prefix, buckets = 4)
    DedupIndex.saveAfpIndex(afps.filter(!isNew), prefix, buckets = 4)
    DedupIndex.saveVidIndex(vids.filter(!isNew), prefix, buckets = 4)
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val indexed = DedupIndex.classifyNew6Indexed(spark,
        docs.filter(isNew), embs.filter(isNew), imgs.filter(isNew),
        afps.filter(isNew), vids.filter(isNew), prefix)
      val offending = DedupIndex.indexShuffleOffenders(
        indexed.queryExecution.executedPlan, prefix)
      assert(offending.isEmpty,
        s"the stored index is shuffled before ${offending.size} join(s):\n" +
          offending.mkString("\n---\n"))
      val expected = Dedup.incrementalDedup6(spark, sf)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(rows(indexed) == rows(expected),
        "indexed six-tier classify must equal the in-memory classifier")
      Seq("near_image", "near_audio", "near_video").foreach { st =>
        assert(rows(indexed).exists(_._2 == st),
          s"fixture must exercise the $st tier")
      }
      operators.Caches.release()
      spark.catalog.clearCache()
    } finally {
      prev.foreach {
        case (c, Some(v)) => spark.conf.set(c, v)
        case (c, None)    => spark.conf.unset(c)
      }
      dropAll()
    }
  }

  test("appendNew: durable index refresh ≡ one-shot classify (three tiers)") {
    import spark.implicits._
    val (bits, dim, embBands) = (8, 4, 4)
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val corpusEmb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("doc_id", "embedding")
    val batch1 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),            // exact of 1
      (11L, "eleven twelve thirteen fourteen fifteen sixteen seventeen") // new
    ).toDF("doc_id", "text")
    val batch1Emb = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Seq(0.0f, 0.0f, 1.0f, 0.0f))).toDF("doc_id", "embedding")
    val batch2 = Seq(
      (20L, "totally different surface form with no shared phrasing at all"), // emb dup of 11
      (21L, "entirely novel words never seen in any earlier document")
    ).toDF("doc_id", "text")
    val batch2Emb = Seq(
      (20L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (21L, Seq(-0.5f, -0.5f, -0.5f, -0.5f))).toDF("doc_id", "embedding")
    dropAll()
    try {
      DedupIndex.saveIndex(corpus, corpusEmb, prefix, buckets = 4,
        bits = bits, dim = dim, embBands = embBands)
      // localCheckpoint: v1 READS the index tables, so any evaluation
      // after the append would reclassify doc 11 as an exact match of
      // itself — pin the pre-append verdicts (appendNew does the same
      // internally for its own reads)
      val v1 = DedupIndex.classifyNew3Indexed(spark, batch1, batch1Emb, prefix,
        bits = bits, dim = dim, embBands = embBands).localCheckpoint()
      assert(verdicts(v1) == Set((10L, "exact", Some(1L)), (11L, "new", None)))
      // durable refresh: only doc 11 (the `new` survivor) enters the store
      DedupIndex.appendNew(batch1, batch1Emb, v1, prefix, buckets = 4,
        bits = bits, dim = dim, embBands = embBands)
      val v2 = DedupIndex.classifyNew3Indexed(spark, batch2, batch2Emb, prefix,
        bits = bits, dim = dim, embBands = embBands)
      assert(verdicts(v2) == Set((20L, "near_embedding", Some(11L)),
        (21L, "new", None)),
        "the appended embedding index must catch the semantic dup")
      // duality vs the in-memory one-shot over the unioned corpus
      val new1 = batch1.join(v1.filter($"status" === "new").select("doc_id"), Seq("doc_id"))
      val new1Emb = batch1Emb.join(v1.filter($"status" === "new").select("doc_id"), Seq("doc_id"))
      val oneShot = Dedup.incrementalDedupFor3(batch2, corpus.unionByName(new1),
        batch2Emb, corpusEmb.unionByName(new1Emb),
        bits = bits, embBands = embBands, dim = dim)
      assert(verdicts(v2) == verdicts(oneShot))
      // and appended files preserve the bucketed layout (spec stays set)
      Seq(DedupIndex.exactTable(prefix), DedupIndex.bandTable(prefix),
        DedupIndex.embTable(prefix)).foreach { t =>
        val ddl = spark.sql(s"DESCRIBE EXTENDED $t").collect().map(_.toString).mkString
        assert(ddl.contains("Num Buckets") || ddl.contains("bucket"),
          s"$t lost its bucket spec after append")
      }
    } finally dropAll()
  }

  test("appendNew6: appended audio/video rows catch perceptual dups next day") {
    import spark.implicits._
    val (bits, dim, embBands) = (8, 4, 4)
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    // text/embedding/image sides: all unrelated everywhere, so only the
    // audio and video tiers can ever match
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    def embs(rows: (Long, Seq[Float])*) = rows.toDF("doc_id", "embedding")
    def hashes(rows: (Long, Long)*) = rows.toDF("doc_id", "dhash")
    def fps(rows: (Long, Long)*) = rows.toDF("doc_id", "afp")
    dropAll()
    try {
      DedupIndex.saveIndex(docs(1L -> "alpha beta gamma delta epsilon zeta"),
        embs(1L -> Seq(1.0f, 0f, 0f, 0f)), prefix, buckets = 4,
        bits = bits, dim = dim, embBands = embBands)
      DedupIndex.saveImgIndex(hashes(1L -> 0x1111L), prefix, buckets = 4)
      DedupIndex.saveAfpIndex(fps(1L -> 0x0F0FL), prefix, buckets = 4)
      DedupIndex.saveVidIndex(hashes(1L -> 0xF000F000L), prefix, buckets = 4)
      // batch 1: all-novel clip 11 and video 12 → new; append them
      val b1d = docs(11L -> "one two three four five six seven",
        12L -> "eight nine ten eleven twelve thirteen")
      val b1e = embs(11L -> Seq(0f, 1f, 0f, 0f), 12L -> Seq(0f, 0f, 1f, 0f))
      val b1i = hashes(11L -> 0x5A5A5A5AL, 12L -> 0x3C3C3C3CL)
      val b1a = fps(11L -> 0x123456789ABCL, 12L -> 0x111122223333L)
      val b1v = hashes(11L -> 0x444455556666L, 12L -> 0xABCDEF012345L)
      val v1 = DedupIndex.classifyNew6Indexed(spark, b1d, b1e, b1i, b1a, b1v,
        prefix, bits = bits, dim = dim, embBands = embBands).localCheckpoint()
      assert(verdicts(v1) == Set((11L, "new", None), (12L, "new", None)))
      DedupIndex.appendNew6(b1d, b1e, b1i, b1a, b1v, v1, prefix, buckets = 4,
        bits = bits, dim = dim, embBands = embBands)
      // batch 2: clip 20's fingerprint is 1 bit off clip 11's; video
      // 21's hash is 1 bit off video 12's — only the APPENDED rows match
      val b2d = docs(20L -> "fourteen fifteen sixteen seventeen eighteen",
        21L -> "nineteen twenty twentyone twentytwo twentythree")
      val b2e = embs(20L -> Seq(0f, 0f, 0f, 1f), 21L -> Seq(-1f, 0f, 0f, 0f))
      val b2i = hashes(20L -> 0x77778888L, 21L -> 0x9999AAAAL)
      val b2a = fps(20L -> 0x123456789ABDL, 21L -> 0x7777888899AAL)
      val b2v = hashes(20L -> 0xBBBBCCCCDDDDL, 21L -> 0xABCDEF012344L)
      val v2 = DedupIndex.classifyNew6Indexed(spark, b2d, b2e, b2i, b2a, b2v,
        prefix, bits = bits, dim = dim, embBands = embBands)
      assert(verdicts(v2) == Set((20L, "near_audio", Some(11L)),
        (21L, "near_video", Some(12L))),
        s"got ${verdicts(v2)}")
    } finally dropAll()
  }

  test("appendNew4: appended image rows catch a perceptual dup next day") {
    import spark.implicits._
    val (bits, dim, embBands) = (8, 4, 4)
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpusEmb = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("doc_id", "embedding")
    val corpusImg = Seq((1L, 0x0F0F0F0FL)).toDF("doc_id", "dhash")
    // batch 1: novel text, orthogonal embedding, UNRELATED image
    val b1 = Seq((11L, "one two three four five six seven")).toDF("doc_id", "text")
    val b1e = Seq((11L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("doc_id", "embedding")
    val b1i = Seq((11L, 0x123456789ABCDEFL)).toDF("doc_id", "dhash")
    // batch 2: novel text/embedding again, but its image is 1 bit off
    // batch 1's — only the APPENDED image rows can catch it
    val b2 = Seq((20L, "eight nine ten eleven twelve thirteen")).toDF("doc_id", "text")
    val b2e = Seq((20L, Seq(0.0f, 0.0f, 1.0f, 0.0f))).toDF("doc_id", "embedding")
    val b2i = Seq((20L, 0x123456789ABCDEEL)).toDF("doc_id", "dhash")
    dropAll()
    try {
      DedupIndex.saveIndex(corpus, corpusEmb, prefix, buckets = 4,
        bits = bits, dim = dim, embBands = embBands)
      DedupIndex.saveImgIndex(corpusImg, prefix, buckets = 4)
      val v1 = DedupIndex.classifyNew4Indexed(spark, b1, b1e, b1i, prefix,
        bits = bits, dim = dim, embBands = embBands).localCheckpoint()
      assert(verdicts(v1) == Set((11L, "new", None)))
      DedupIndex.appendNew4(b1, b1e, b1i, v1, prefix, buckets = 4,
        bits = bits, dim = dim, embBands = embBands)
      val v2 = DedupIndex.classifyNew4Indexed(spark, b2, b2e, b2i, prefix,
        bits = bits, dim = dim, embBands = embBands)
      assert(verdicts(v2) == Set((20L, "near_image", Some(11L))),
        "the appended image index must catch the perceptual dup")
      // duality vs the in-memory four-tier one-shot over corpus ∪ batch1
      val oneShot = Dedup.incrementalDedupFor4(
        b2, corpus.unionByName(b1),
        b2e, corpusEmb.unionByName(b1e),
        b2i, corpusImg.unionByName(b1i),
        bits = bits, embBands = embBands, dim = dim)
      assert(verdicts(v2) == verdicts(oneShot))
    } finally dropAll()
  }

  test("indexAppendProbe: probe-only steady state ≡ in-memory over the grown corpus, idempotent (q89)") {
    import spark.implicits._
    val q89prefix = "graft_q89_test"
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    def dropQ89(): Unit =
      Seq(DedupIndex.exactTable(q89prefix), DedupIndex.bandTable(q89prefix),
        DedupIndex.embTable(q89prefix), s"${q89prefix}_ready")
        .foreach(DedupIndex.dropTable(spark, _))
    // the declared query derives its prefix from the dir — use the
    // SAME shared derivation so this spec's tables are the ones the
    // call creates/reads
    val dirPrefix = DedupIndex.q89PrefixFor(sf)
    def dropDir(): Unit =
      Seq(DedupIndex.exactTable(dirPrefix), DedupIndex.bandTable(dirPrefix),
        DedupIndex.embTable(dirPrefix), s"${dirPrefix}_ready")
        .foreach(DedupIndex.dropTable(spark, _))
    dropQ89(); dropDir()
    try {
      val v = DedupIndex.indexAppendProbe(spark, sf).localCheckpoint()
      // duality: the stored-and-grown index must produce exactly the
      // in-memory one-shot verdicts over corpus ∪ day-1 survivors
      val docs = graft.sources.Tables(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      val embs = graft.sources.Tables(spark, sf, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val bk = Sampling.hashBucket(col("doc_id"), 5)
      // day-1 verdicts recomputed IN MEMORY: the dirPrefix tables
      // already hold the grown state, so an indexed day-1 classify here
      // would see day-1 docs matching their own appended rows
      val day1Mem = Dedup.incrementalDedupFor3(
        docs.filter(bk === 3), docs.filter(bk < 3),
        embs.filter(bk === 3), embs.filter(bk < 3)).localCheckpoint()
      val new1 = day1Mem.filter($"status" === "new").select("doc_id")
      val grown = docs.filter(bk < 3)
        .unionByName(docs.filter(bk === 3).join(new1, Seq("doc_id")))
      val grownEmb = embs.filter(bk < 3)
        .unionByName(embs.filter(bk === 3).join(new1, Seq("doc_id")))
      val oneShot = Dedup.incrementalDedupFor3(
        docs.filter(bk === 4), grown, embs.filter(bk === 4), grownEmb)
      assert(verdicts(v) == verdicts(oneShot),
        "steady-state probe must equal the in-memory grown-corpus classify")
      // idempotence: a second call in the same session is PROBE-ONLY —
      // identical verdicts, and no table grows (a re-append would)
      val sizes = Seq(DedupIndex.exactTable(dirPrefix),
        DedupIndex.bandTable(dirPrefix), DedupIndex.embTable(dirPrefix))
        .map(t => t -> spark.table(t).count()).toMap
      val v2 = DedupIndex.indexAppendProbe(spark, sf)
      assert(verdicts(v2) == verdicts(v), "second call must re-probe, not rebuild")
      sizes.foreach { case (t, n) =>
        assert(spark.table(t).count() == n,
          s"$t grew on the second call — the append re-ran")
      }
      // non-vacuity: day-1 survivors actually entered the store (the
      // append wrote rows beyond the corpus build)
      val corpusOnly = docs.filter(bk < 3).count()
      assert(spark.table(DedupIndex.exactTable(dirPrefix)).count() > corpusOnly,
        "exact table must hold appended day-1 survivor rows")
    } finally { dropQ89(); dropDir() }
  }

  test("indexAppendProbe6: six-tier steady state ≡ in-memory over the grown corpus, idempotent (q92)") {
    import spark.implicits._
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val dirPrefix = DedupIndex.q89PrefixFor(sf, "graft_q92")
    def allTables(p: String) =
      Seq(DedupIndex.exactTable(p), DedupIndex.bandTable(p),
        DedupIndex.embTable(p), DedupIndex.imgTable(p),
        DedupIndex.afpTable(p), DedupIndex.vidTable(p), s"${p}_ready")
    def dropDir(): Unit = allTables(dirPrefix).foreach(DedupIndex.dropTable(spark, _))
    dropDir()
    try {
      val v = DedupIndex.indexAppendProbe6(spark, sf).localCheckpoint()
      val docs = graft.sources.Tables(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      val embs = graft.sources.Tables(spark, sf, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val bk = Sampling.hashBucket(col("doc_id"), 5)
      // media hashes per modality slot, for EVERY split side, cached:
      // the one-shot reference recomputes each side several times
      def ids(slot: Int, cond: org.apache.spark.sql.Column) =
        docs.select(col("doc_id"))
          .filter(pmod(col("doc_id"), lit(3)) === slot && cond).as[Long]
      def img(cond: org.apache.spark.sql.Column) =
        graft.operators.Multimodal.imageDHashesFor(spark, ids(0, cond))
          .select(col("media_id").as("doc_id"), col("dhash")).localCheckpoint()
      def afp(cond: org.apache.spark.sql.Column) =
        graft.operators.Multimodal.audioFingerprintsFor(spark, ids(1, cond))
          .select(col("media_id").as("doc_id"), col("afp")).localCheckpoint()
      def vid(cond: org.apache.spark.sql.Column) =
        graft.operators.Multimodal.videoHashesFor(spark, ids(2, cond))
          .select(col("media_id").as("doc_id"), col("dhash")).localCheckpoint()
      // day-1 verdicts recomputed IN MEMORY (the stored tables already
      // hold the grown state — see the q89 spec note)
      val day1Mem = Dedup.incrementalDedupFor6(
        docs.filter(bk === 3), docs.filter(bk < 3),
        embs.filter(bk === 3), embs.filter(bk < 3),
        img(bk === 3), img(bk < 3),
        afp(bk === 3), afp(bk < 3),
        vid(bk === 3), vid(bk < 3)).localCheckpoint()
      val new1 = day1Mem.filter($"status" === "new").select("doc_id")
      def grow(day1: org.apache.spark.sql.DataFrame,
               corpusSide: org.apache.spark.sql.DataFrame) =
        corpusSide.unionByName(day1.join(new1, Seq("doc_id")))
      val oneShot = Dedup.incrementalDedupFor6(
        docs.filter(bk === 4), grow(docs.filter(bk === 3), docs.filter(bk < 3)),
        embs.filter(bk === 4), grow(embs.filter(bk === 3), embs.filter(bk < 3)),
        img(bk === 4), grow(img(bk === 3), img(bk < 3)),
        afp(bk === 4), grow(afp(bk === 3), afp(bk < 3)),
        vid(bk === 4), grow(vid(bk === 3), vid(bk < 3)))
      assert(verdicts(v) == verdicts(oneShot),
        "six-tier steady-state probe must equal the in-memory grown-corpus classify")
      // idempotence: a second call is probe-only — identical verdicts
      // and NO table (any tier) grows
      val sizes = allTables(dirPrefix).dropRight(1)
        .map(t => t -> spark.table(t).count()).toMap
      val v2 = DedupIndex.indexAppendProbe6(spark, sf)
      assert(verdicts(v2) == verdicts(v), "second call must re-probe, not rebuild")
      sizes.foreach { case (t, n) =>
        assert(spark.table(t).count() == n,
          s"$t grew on the second call — the append re-ran")
      }
    } finally dropDir()
  }
}
