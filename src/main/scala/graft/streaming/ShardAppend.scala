package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Packing

/** Streaming twin of q104 ([[graft.operators.Packing.appendShardsFor]]):
  * shard INGEST — a document feed lands in micro-batches, and each
  * trigger packs its batch into fresh whole shards appended to the
  * store, leaving every previously-written shard byte-for-byte
  * untouched (the immutability q104's spec pins for the batch form
  * holds per-trigger here, by the same next-whole-shard-boundary
  * construction).
  *
  * ZERO KEYED STATE, by design: the only thing a trigger needs from
  * the past is the store's current max shard id, and that lives in the
  * STORE ITSELF — read from the partition-directory names alone
  * (`ReadSchema: struct<>`, the q104 probe), never in Spark state. No
  * watermark, no `mapGroupsWithState`: the shard store is the state,
  * exactly as a production ingest pipeline would have it (restarts
  * recover from the store; no checkpointed operator state can drift
  * from the files).
  *
  * Semantics note (the honest difference from the batch day-2 shape):
  * each trigger packs ITS OWN documents into its own fresh shards —
  * chunking is part of the output layout, as with every
  * one-shard-store-per-day deployment. Replaying the q104 day-1/day-2
  * split as two triggers therefore reproduces the DECLARED q104 rows
  * exactly (duality spec); a different chunking yields the same
  * documents in shards cut at different boundaries.
  *
  * Scale/trigger cost: one packer range shuffle + text join + one
  * shard_id shuffle over the MICRO-BATCH, plus the O(#partitions)
  * directory listing for the boundary probe — trigger latency scales
  * with feed rate, not store size.
  */
object ShardAppend {

  /** Start appending a streaming (doc_id, text) feed to the shard store
    * at `path`. The first non-empty batch creates the store
    * ([[Packing.writeShardsFor]]); every later one appends from the
    * next whole-shard boundary ([[Packing.appendShardsFor]]). Each
    * trigger's full-store read-back report (q103's exact shape) goes to
    * `sink` with the batch id. Empty micro-batches are skipped — the
    * packer has nothing to write and the report would be unchanged. */
  def start(docs: DataFrame, path: String, budget: Long, seqsPerShard: Long,
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (microBatch: DataFrame, batchId: Long) =>
        if (!microBatch.isEmpty) {
          val report =
            if (new java.io.File(path).exists())
              Packing.appendShardsFor(microBatch, budget, seqsPerShard, path)
            else
              Packing.writeShardsFor(microBatch, budget, seqsPerShard, path)
          sink(report, batchId)
        }
      }
      .start()
}
