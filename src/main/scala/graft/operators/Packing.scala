package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence packing for LLM training pipelines: concatenate documents in
  * a deterministic pseudo-random order and cut the stream into
  * fixed-token-budget training sequences. The audit (q52) reports how
  * documents fill sequences — the report a pretraining data pipeline
  * runs before writing packed shards.
  *
  * The core primitive is a DISTRIBUTED global prefix sum: a naive
  * `Window.orderBy(...)` with no partitioning collapses the whole
  * dataset into ONE task (Spark warns exactly this), which is a
  * non-starter at corpus scale. [[runningTotal]] instead range-partitions
  * on the order key, computes running sums within partitions, and adds
  * broadcast per-partition offsets — the classic two-pass parallel scan.
  * The result depends only on the global order, not on partition
  * boundaries (spec: partition-count invariance).
  */
object Packing {

  /** Inclusive global running total of `value` in `order` order (the
    * order columns must be a total order — include a unique tiebreak).
    * Adds `_cum` to the frame. Two-pass scan: O(rows/partitions) memory
    * per task, one range shuffle + one tiny (partition-count-row)
    * broadcast. */
  def runningTotal(df: DataFrame, order: Seq[Column], value: Column,
                   parts: Int = 32): DataFrame = {
    // MUST be materialized once: the within-partition branch and the
    // offsets branch both read the pid assignment, and RangePartitioner
    // boundaries are sample-based — two independent executions of the
    // exchange could disagree on boundaries and join wrong offsets.
    // The cache pins ONE boundary draw for both consumers.
    val ranged = Caches.track(
      df.repartitionByRange(parts, order: _*)
        .withColumn("_pid", spark_partition_id()))
    val wIn = Window.partitionBy(col("_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = ranged.withColumn("_cum_in", sum(value).over(wIn))
    // per-partition totals: `parts` rows — the offset table is tiny by
    // construction, so the second pass is a broadcast join, not a shuffle
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("_pid")).agg(sum(value).as("_ptot"))
      .withColumn("_off", coalesce(sum(col("_ptot")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    within.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_cum", col("_cum_in") + col("_off"))
      .drop("_pid", "_cum_in", "_off") // internal columns must not leak
  }

  /** q52 — sequence-packing audit: documents ordered by md5(doc_id) (a
    * deterministic shuffle any engine reproduces), token counts
    * accumulated with the distributed scan, and each document assigned
    * to the sequence where it STARTS (`(cum_before) div budget`). One
    * row per packed sequence with its document count and token mass —
    * straddling documents count toward their start sequence, so
    * `seq_tokens` can exceed the budget by at most one document. */
  def packSequences(s: SparkSession, dir: String,
                    budget: Long = 2048): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("_ok"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("_nt"))
    runningTotal(d, Seq(col("_ok"), col("doc_id")), col("_nt"))
      .withColumn("seq_id", expr(s"(_cum - _nt) div ${budget}L"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("seq_tokens"))
      .orderBy(col("seq_id"))
  }
}
