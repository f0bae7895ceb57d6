package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, size}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions.tokens
import graft.operators.Sampling

/** Streaming twin of q72 ([[graft.operators.Sampling
  * .benchmarkDecontamination]]): flag contaminated documents AT INGEST —
  * a crawl feed lands, and every document sharing a k-gram with the
  * benchmark suite is reported before it ever enters the training
  * corpus. The deployment shape every eval-integrity pipeline actually
  * wants: decontamination as an admission check, not a post-hoc sweep.
  *
  * Shape: stream-STATIC enrichment like the dedup twin
  * ([[IncrementalDedup]]) — each document's hits depend only on
  * (document, benchmark gram index), never on other stream rows, so
  * there is no watermark and no keyed state. `foreachBatch` runs the
  * SAME hit computation the batch audit uses
  * ([[Sampling.contaminationHits]]), so replaying the batch input in
  * any chunking yields precisely the batch hit set (duality spec).
  *
  * Scale/state story: the only persistent artifact is the benchmark
  * gram index — |eval suite| × grams rows, tiny by construction and
  * BROADCAST into every micro-batch; per-trigger cost is one map-side
  * join over the micro-batch's gram stream (never shuffled), so
  * trigger latency scales with feed rate, not corpus size. Per-eval
  * rollups (q72's report shape) are a batch aggregation over the
  * accumulated hits table downstream.
  */
object Decontamination {

  /** Build the static benchmark gram index from a (doc_id, text) eval
    * frame (docs shorter than k tokens carry no gram and can't be
    * leaked into at this k). Caller should `.cache()` it. */
  def index(evalDocs: DataFrame, k: Int = 8): DataFrame =
    Sampling.benchmarkGramIndex(
      evalDocs.select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= k), k)

  /** Start flagging a streaming (doc_id, text) train feed against
    * `gramIndex` ([[index]] output). Each micro-batch's contamination
    * hits — (eval_id, train_id, n_overlap) — go to `sink` with the
    * batch id (clean documents produce no row; admission = absence). */
  def start(trainDocs: DataFrame, gramIndex: DataFrame,
            sink: (DataFrame, Long) => Unit, k: Int = 8): StreamingQuery =
    trainDocs.writeStream
      .outputMode("append")
      .foreachBatch { (microBatch: DataFrame, batchId: Long) =>
        sink(Sampling.contaminationHits(
          microBatch.select(col("doc_id"), tokens(col("text")).as("t"))
            .filter(size(col("t")) >= k),
          gramIndex, k), batchId)
      }
      .start()
}
