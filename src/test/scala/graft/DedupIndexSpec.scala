package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
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
      DedupIndex.embTable(prefix))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

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
      // an index-table scan must never sit under a shuffle: flag any
      // exchange whose ENTIRE leaf set is index-table scans (an exchange
      // above a join legitimately contains batch leaves too)
      def isIndexScan(f: FileSourceScanExec): Boolean =
        f.relation.location.rootPaths.exists(_.toString.contains(prefix))
      val offending = plan.collect {
        case e: ShuffleExchangeExec =>
          val leaves = e.collectLeaves()
          val scans = leaves.collect { case f: FileSourceScanExec => f }
          (e, leaves.size, scans)
      }.filter { case (_, nLeaves, scans) =>
        nLeaves > 0 && scans.size == nLeaves && scans.forall(isIndexScan)
      }
      assert(offending.isEmpty,
        s"the stored index is shuffled before ${offending.size} join(s):\n" +
          offending.map(_._1.toString.take(500)).mkString("\n---\n"))
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
}
