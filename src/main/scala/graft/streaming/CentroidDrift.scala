package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming counterpart of q66's per-label centroid
  * ([[graft.operators.Similarity.centroidAudit]]): per-WINDOW label
  * centroids over a continuous stream of labeled embeddings — the
  * training-data telemetry a live ingest pipeline watches for
  * distribution drift ("did this hour's crawl move domain X's centroid?").
  *
  * Shape: posexplode to (label, dim, v), then a watermarked windowed
  * sum/count per (window, label, dim) in APPEND mode — a plain streaming
  * aggregation, no custom state. The shuffle carries partial sums (map-
  * side combined), never vectors; state is open-windows × |labels| × dim
  * rows of (sum, count) — independent of stream length. Emitted rows are
  * sums, not means, so downstream can merge windows or compute exact
  * means without re-streaming.
  *
  * Drift itself ([[driftBetweenWindows]]) is batch post-processing of
  * the emitted frame: cosine between consecutive windows' centroids per
  * label — tiny data (windows × labels rows), runs anywhere.
  */
object CentroidDrift {

  /** Watermarked per-(window, label, dim) running sums over a streaming
    * (label, embedding, ingest_ts) frame. Append mode: a row set for a
    * window emits once the watermark closes it. */
  def windowedCentroidSums(vecs: DataFrame,
                           windowLen: String = "1 hour",
                           watermark: String = "30 minutes"): DataFrame =
    vecs.withWatermark("ingest_ts", watermark)
      .select(col("label"), col("ingest_ts"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(window(col("ingest_ts"), windowLen), col("label"), col("pos"))
      .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("label"),
        col("pos"), col("s"), col("n"))

  /** Assemble emitted sums into one centroid ARRAY row per
    * (win_start, label) — dims ordered by `pos`. */
  def assemble(sums: DataFrame): DataFrame =
    sums.groupBy(col("win_start"), col("label"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), (col("s") / col("n")).as("c")))),
          x => x.getField("c")).as("centroid"),
        // max, not first: first() over the per-dim rows is an arbitrary
        // pick when a ragged/short vector makes n differ by pos; max = the
        // count of vectors contributing to SOME dimension, deterministic
        max(col("n")).as("n_vecs"))

  /** Per-label cosine between consecutive windows' centroids — the drift
    * signal. Input = [[assemble]] output; result is windows × labels
    * rows, small by construction. */
  def driftBetweenWindows(centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("win_start"))
    def dot(a: Column, b: Column) = aggregate(
      zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    def norm(a: Column) = sqrt(aggregate(
      transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    centroids
      .withColumn("_prev", lag(col("centroid"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col("label"), col("win_start"),
        (dot(col("centroid"), col("_prev")) /
          greatest(norm(col("centroid")) * norm(col("_prev")), lit(1e-30)))
          .as("cos_to_prev"))
  }
}
