package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextOps

/** Streaming twin of q101 ([[graft.operators.TextOps.bigramLmScore]]):
  * bigram-LM quality scoring AT INGEST — each arriving document gets
  * its interpolated bigram log-prob scores against the CURRENT corpus
  * LM, so a perplexity-style quality gate can run before the document
  * enters the corpus. This is the deployment mode of every cheap-LM
  * filter (CCNet's KenLM gate, fastText-family quality scores): the
  * model is a periodic batch artifact, ingest is a pure probe.
  *
  * Shape: stream-STATIC enrichment like [[LineDedup]]/[[SpanScrub]] —
  * no watermark, no keyed state; `foreachBatch` runs
  * [[TextOps.bigramLmScoreAgainst]], shared verbatim with the batch
  * incremental form, so replaying a feed in any chunking yields
  * identical per-doc rows (duality spec). Out-of-model tokens back off
  * to the add-one unigram floor (strictly positive probabilities — a
  * wholly-novel document scores low, never crashes), which the batch
  * self-scoring query structurally cannot exercise; the twin's spec
  * plants the novel-word case.
  *
  * Scale/state story: the unigram table is vocabulary-sized and
  * broadcasts; the bigram table is the one corpus-growing artifact and
  * joins by hash on (w₁, w₂) against the micro-batch's DISTINCT
  * (doc, w₁, w₂, m) rows — per-trigger cost tracks feed rate, never
  * corpus size. Both tables refresh by re-running
  * [[TextOps.bigramLmFit]] on the deployment's cadence.
  */
object LmScore {

  /** Fit the static LM on the corpus. The unigram table comes back
    * cached (fit itself has three consumers of it); a long-lived
    * deployment should also `.cache()` the `big` frame. */
  def fit(corpus: DataFrame): TextOps.BigramLm =
    TextOps.bigramLmFit(corpus)

  /** Start scoring a streaming (doc_id, text) feed against `lm`. Each
    * micro-batch's per-doc rows — (doc_id, n_bigrams, avg_logp,
    * min_logp), q101's exact shape — go to `sink` with the batch id. */
  def start(docs: DataFrame, lm: TextOps.BigramLm,
            sink: (DataFrame, Long) => Unit,
            lambda: Double = 0.75): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (microBatch: DataFrame, batchId: Long) =>
        sink(TextOps.bigramLmScoreAgainst(microBatch, lm, lambda), batchId)
      }
      .start()
}
