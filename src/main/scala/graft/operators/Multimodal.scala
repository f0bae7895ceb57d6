package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` columns + typed metadata, with decode / feature
  * extraction / frame sampling as batched per-partition transforms.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, output
  * contract) is real and tested; the actual codec work is STUBBED with a
  * deterministic fake (`fakeDecode`) because no image/audio libraries
  * exist in this container — swap `fakeDecode` for a real decoder (e.g.
  * javacv) without touching any of the distributed structure.
  *
  * Scale notes: media bytes ride the same partition as their metadata
  * (no shuffle to decode); `mapPartitions` amortizes per-batch decoder
  * init exactly like a Pandas-UDF batch would in PySpark; decoded
  * features are fixed-width arrays so downstream ops stay columnar.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, duration_ms: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Int,
                   frame_bytes: Array[Byte])

  /** Build a media table from the documents corpus: text bytes stand in
    * for encoded media (deterministic fake payloads with real binary
    * schema). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        pmod(col("doc_id"), lit(3)).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height"),
      (pmod(col("doc_id"), lit(60)) * 1000).cast("int").as("duration_ms"))

  /** q45 — media metadata audit: the typed-metadata half of the
    * multimodal contract (kind routing, dimensions, payload size), all
    * derivable portably so the DuckDB oracle covers it; the binary
    * decode half stays engine-side (extractFeatures, spec-tested). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(graft.sources.Tables(s, dir, "documents"))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("duration_ms"), length(col("bytes")).cast("long").as("n_bytes"))
      .orderBy(col("media_id"))

  /** STUB decoder: deterministic feature vector from the payload bytes.
    * ??? → replace with a real codec; the signature (bytes in, fixed-dim
    * float features out) is the real contract. */
  private[operators] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
      out(j) = (h % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Decode + feature-extract, batched per partition. One decoder
    * "session" per partition (the `it =>` prologue is where a real codec
    * would init), streaming through rows without materializing the
    * partition. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val decoder = Codec.open() — once per partition
        it.map { case (id, kind, bytes) =>
          val feats = fakeDecode(bytes, dim)
          val crc = new java.util.zip.CRC32(); crc.update(bytes)
          MediaFeatures(id, kind, bytes.length.toLong, crc.getValue, feats)
        }
      }
  }

  /** Frame sampling for video rows (posexplode over sampled offsets):
    * every `everyMs` milliseconds, emit a (media_id, frame_idx,
    * offset_ms, frame_bytes) row. Frame extraction is the stub slice —
    * the explode/partition shape is the real contract. */
  def sampleFrames(media: DataFrame, everyMs: Int = 10000): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms") > 0)
      .select(col("media_id"), col("bytes"), col("duration_ms"),
        posexplode(sequence(lit(0), col("duration_ms") - 1, lit(everyMs)))
          .as(Seq("frame_idx", "offset_ms")))
      .withColumn("frame_bytes",
        // stub: a deterministic 16-byte slice keyed by offset
        substring(col("bytes"), pmod(col("offset_ms"), greatest(length(col("bytes")) - 16, lit(1))).cast("int") + 1, lit(16))
          .cast("binary"))
      .select("media_id", "frame_idx", "offset_ms", "frame_bytes")

  /** Resize metadata transform (pure column math — a real resize would
    * live in the mapPartitions decoder; the metadata contract is what
    * downstream joins key on). */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    media
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }
}
