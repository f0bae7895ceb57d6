package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextOps

/** Streaming twin of q87 ([[graft.operators.TextOps.lineDedup]]):
  * line-level boilerplate scrubbing AT INGEST — a crawl feed lands, and
  * every document is rewritten against the CURRENT boilerplate
  * line-hash table before it enters the corpus. This is exactly how
  * CCNet-family pipelines deploy line dedup: the line-frequency table
  * is a periodic batch artifact (it needs corpus-wide counts, which no
  * bounded stream state can hold exactly), and ingest is a pure probe
  * against it.
  *
  * Shape: stream-STATIC enrichment like [[IncrementalDedup]] and
  * [[Decontamination]] — each document's scrub depends only on
  * (document, boilerplate table), never on other stream rows, so there
  * is no watermark and no keyed state. `foreachBatch` runs the SAME
  * segmentation and scrub the batch query uses ([[TextOps.docLines]] +
  * [[TextOps.scrubLines]], shared verbatim), so replaying the batch
  * input in any chunking yields precisely the batch per-doc rows
  * (duality spec).
  *
  * Scale/state story: the boilerplate table is the only persistent
  * artifact — a small fraction of distinct lines by construction, an
  * 8-byte-key relation the join broadcasts in practice; per-trigger
  * cost is one segmentation projection + one probe join over the
  * micro-batch, so trigger latency scales with feed rate, not corpus
  * size. The table refreshes by re-running the batch frequency pass
  * ([[TextOps.boilerplateLines]]) on the deployment's cadence.
  */
object LineDedup {

  /** Build the static boilerplate line-hash table from a (doc_id, text)
    * corpus frame under the declared query's fixed segmentation.
    * Caller should `.cache()` it. */
  def boilerIndex(corpus: DataFrame, segLen: Int = 10,
                  maxDocs: Int = 1): DataFrame =
    TextOps.boilerplateLines(TextOps.docLines(corpus, segLen), maxDocs)

  /** Start scrubbing a streaming (doc_id, text) feed against `boiler`
    * ([[boilerIndex]] output). Each micro-batch's per-doc retention
    * rows — (doc_id, n_lines, n_removed, n_kept_tokens, retained_hash),
    * q87's exact shape — go to `sink` with the batch id. */
  def start(docs: DataFrame, boiler: DataFrame,
            sink: (DataFrame, Long) => Unit, segLen: Int = 10): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (microBatch: DataFrame, batchId: Long) =>
        sink(TextOps.scrubLines(
          TextOps.docLines(microBatch, segLen), boiler), batchId)
      }
      .start()
}
