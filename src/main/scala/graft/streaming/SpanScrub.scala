package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextOps

/** Streaming twin of q99 ([[graft.operators.TextOps.crossDocGramScrub]]):
  * cross-document exact-substring scrubbing AT INGEST — a feed document
  * arrives and every k-token passage the CURRENT corpus already
  * contains is cut before the document enters it. This is how the
  * ExactSubstr dedup of Lee et al. 2022 deploys incrementally: the
  * corpus gram index is a periodic batch artifact (global first-
  * occurrence needs corpus-wide knowledge no bounded stream state can
  * hold), and ingest is a pure probe against it.
  *
  * Shape: stream-STATIC enrichment like [[LineDedup]] — each document's
  * scrub depends only on (document, gram index), never on other stream
  * rows, so there is no watermark and no keyed state. `foreachBatch`
  * runs [[TextOps.scrubAgainstGramIndex]], shared verbatim with the
  * batch incremental form, so replaying a feed in any chunking yields
  * identical per-doc rows (duality spec). Intra-batch novelty is
  * deliberately NOT deduped (two new docs sharing a brand-new passage
  * both survive until the index refresh) — the same batch-directional
  * contract as the incremental dedup classifiers.
  *
  * Scale/state story: the gram index is the only persistent artifact —
  * distinct 8-byte hashes, probed by a semi-join that broadcasts when
  * the index fits and degrades to a hash shuffle when it doesn't;
  * per-trigger cost is one native shingle pass + one probe over the
  * micro-batch, so trigger latency scales with feed rate, not corpus
  * size. The index refreshes by re-running
  * [[TextOps.corpusGramIndex]] on the deployment's cadence.
  */
object SpanScrub {

  /** Build the static corpus gram index (the [[TextOps.GramIndex]]
    * carries its gram size, so probe and build can't shingle
    * differently). Caller should `.cache()` the `grams` frame. */
  def gramIndex(corpus: DataFrame, k: Int = 8): TextOps.GramIndex =
    TextOps.corpusGramIndex(corpus, k)

  /** Start scrubbing a streaming (doc_id, text) feed against `index`
    * ([[gramIndex]] output). Each micro-batch's per-doc rows —
    * (doc_id, n_tokens, n_removed_tokens, n_dup_spans, retained_hash),
    * q99's exact shape — go to `sink` with the batch id.
    * `minSpanTokens` is q102's minimum-match-length rule (merged spans
    * shorter than it survive), applied inside the shared
    * [[TextOps.scrubAgainstGramIndex]] so batch and ingest can never
    * disagree on the threshold semantics; default 1 = the
    * unthresholded q99 twin. */
  def start(docs: DataFrame, index: TextOps.GramIndex,
            sink: (DataFrame, Long) => Unit,
            minSpanTokens: Long = 1L): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (microBatch: DataFrame, batchId: Long) =>
        sink(TextOps.scrubAgainstGramIndex(microBatch, index, minSpanTokens),
          batchId)
      }
      .start()
}
