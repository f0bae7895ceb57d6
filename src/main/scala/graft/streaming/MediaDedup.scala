package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, DedupIndex, Multimodal}

/** Streaming twins of q78's AUDIO and VIDEO tiers — [[ImageDedup]]'s
  * siblings, completing the continuous-ingest modality matrix. Same
  * stream-static shape: per-micro-batch decode from bytes alone
  * (payloads never leave the task, only 8-byte hashes move), then ONE
  * probe of the stored bucketed table through the SAME join the batch
  * classifier uses ([[DedupIndex.afpProbe]] / [[DedupIndex.vidProbe]]),
  * verdicts folded through the SAME [[Dedup.verdictTiers]] precedence —
  * batch and continuous ingest cannot drift, chunked-replay duality
  * specs prove it. Zero keyed state; index refresh is the bucketed
  * append at a restart boundary, as everywhere in this family.
  */
object MediaDedup {

  /** (doc_id, afp) from a (doc_id, bytes) WAV frame. */
  def audioHashes(clips: DataFrame): DataFrame = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col("doc_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, Multimodal.MediaCodec.audioFingerprint64(
            Multimodal.MediaCodec.pcmSamples(bytes)))
        }
      }.toDF("doc_id", "afp")
  }

  /** (doc_id, dhash) from a (doc_id, bytes) RAWV frame. */
  def videoHashes(videos: DataFrame): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("doc_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, Multimodal.MediaCodec.vHash64(bytes))
        }
      }.toDF("doc_id", "dhash")
  }

  /** One audio classification pass: (doc_id, status ∈ near_audio|new,
    * match_id). */
  def classifyAudio(fps: DataFrame, prefix: String,
                    maxHamming: Int = 4): DataFrame =
    Dedup.verdictTiers(fps.select(col("doc_id")), Seq(("near_audio",
      "afp_id", DedupIndex.afpProbe(fps.sparkSession, fps, prefix, maxHamming))))

  /** One video classification pass: (doc_id, status ∈ near_video|new,
    * match_id). */
  def classifyVideo(hashes: DataFrame, prefix: String,
                    maxHamming: Int = 6): DataFrame =
    Dedup.verdictTiers(hashes.select(col("doc_id")), Seq(("near_video",
      "vid_id", DedupIndex.vidProbe(hashes.sparkSession, hashes, prefix, maxHamming))))

  /** Start classifying a streaming (doc_id, bytes) WAV feed against the
    * stored `_afp` index. */
  def startAudio(newClips: DataFrame, prefix: String,
                 sink: (DataFrame, Long) => Unit,
                 maxHamming: Int = 4): StreamingQuery =
    newClips.writeStream
      .outputMode("append")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        sink(classifyAudio(audioHashes(mb), prefix, maxHamming), batchId)
      }
      .start()

  /** Start classifying a streaming (doc_id, bytes) RAWV feed against
    * the stored `_vid` index. */
  def startVideo(newVideos: DataFrame, prefix: String,
                 sink: (DataFrame, Long) => Unit,
                 maxHamming: Int = 6): StreamingQuery =
    newVideos.writeStream
      .outputMode("append")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        sink(classifyVideo(videoHashes(mb), prefix, maxHamming), batchId)
      }
      .start()
}
