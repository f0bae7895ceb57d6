package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, DedupIndex, Multimodal}

/** Streaming twin of the q75 IMAGE tier: classify a CONTINUOUS stream
  * of incoming images against the STORED perceptual index — the ingest
  * shape of production image dedup, where a crawl's media feed lands
  * and each image gets a near_image/new verdict against yesterday's
  * `_img` bucketed table before its bytes are ever persisted.
  *
  * Shape: stream-static enrichment like [[IncrementalDedup]] — a
  * verdict depends only on (image, index), never on other stream rows,
  * so there is no watermark and no keyed state. Each micro-batch
  * decodes its PNG payloads per-partition ([[hashes]]: bytes are born
  * and die inside the task, only 8-byte dHashes move) and probes the
  * bucketed index through the SAME join the batch classifier uses
  * ([[DedupIndex.imgProbe]]), so batch and continuous ingest can't
  * drift — the chunked-replay duality spec proves it end-to-end.
  *
  * Scale/state story:
  *   - zero streaming state; the persistent artifact is the `_img`
  *     table (banded 8-byte hashes — pixels never enter it);
  *   - per-micro-batch cost: the batch side of the probe is the
  *     micro-batch; the index side reads its bucketed layout with ZERO
  *     exchange (DedupIndexSpec's plan assert), so trigger latency
  *     scales with feed rate, not corpus size;
  *   - index refresh is [[DedupIndex.appendNew4]]'s `_img` append —
  *     |new|-proportional, applied at a query-restart boundary.
  */
object ImageDedup {

  /** (doc_id, dhash) from a (doc_id, bytes) frame — decode-from-bytes
    * per partition ([[Multimodal.MediaCodec.dHash64]]); payloads never
    * leave the task. */
  def hashes(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("doc_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"doc_id=$id: undecodable image payload")
          (id, Multimodal.MediaCodec.dHash64(img))
        }
      }.toDF("doc_id", "dhash")
  }

  /** One classification pass of a (doc_id, dhash) frame against the
    * stored index: (doc_id, status ∈ near_image|new, match_id). Shared
    * verbatim by each micro-batch and any batch audit. */
  def classify(s: SparkSession, imgHashes: DataFrame, prefix: String,
               maxHamming: Int = 6): DataFrame =
    // the single-tier instance of the shared verdict fold — one
    // precedence definition across every classifier shape
    Dedup.verdictTiers(imgHashes.select(col("doc_id")), Seq(("near_image",
      "img_id", DedupIndex.imgProbe(s, imgHashes, prefix, maxHamming))))

  /** Start classifying `newImages` (a streaming (doc_id, bytes) frame)
    * against the stored `_img` index. Each micro-batch's verdicts are
    * handed to `sink` with the batch id. */
  def start(newImages: DataFrame, prefix: String,
            sink: (DataFrame, Long) => Unit,
            maxHamming: Int = 6): StreamingQuery =
    newImages.writeStream
      .outputMode("append")
      .foreachBatch { (microBatch: DataFrame, batchId: Long) =>
        sink(classify(microBatch.sparkSession, hashes(microBatch),
          prefix, maxHamming), batchId)
      }
      .start()
}
