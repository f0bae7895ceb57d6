package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.{Sketches => B}

/** Streaming counterpart of the q83/q84 sketches
  * ([[graft.operators.Sketches]]) — the 14th twin: cardinality and
  * heavy-hitter telemetry over a continuous document feed.
  *
  * Both sketches are order-blind (register-wise max / cell-wise sum),
  * so the streaming form is a PLAIN watermarked windowed aggregation —
  * no custom state, no `flatMapGroupsWithState`. State per open window
  * is the sketch itself: ≤ sources × 256 register rows (HLL) or ≤
  * 4 × 512 cells (CMS), independent of feed volume — the whole point
  * of sketching survives the move to streaming unchanged.
  *
  * Emitted rows are REGISTERS/CELLS, not estimates: windows merge
  * downstream by the same max/sum laws (per-hour sketches roll up to
  * per-day cardinality without replaying the stream), and the batch
  * estimator ([[graft.operators.Sketches.estimateExpr]]) runs on the
  * merged frame. The chunked-replay duality spec proves the merged
  * registers/cells equal the batch build over the same rows, sharing
  * every hash/rank definition verbatim ([[B.shingleHashes]],
  * [[B.rhoExpr]], [[B.cmsBucket]], [[B.bigrams]]).
  */
object Sketches {

  /** Watermarked per-(window, source, bucket) HLL register maxes over a
    * streaming (source, text, ingest_ts) document feed. Append mode: a
    * window's registers emit once the watermark closes it. */
  def windowedShingleRegisters(docs: DataFrame,
                               windowLen: String = "1 hour",
                               watermark: String = "30 minutes"): DataFrame =
    docs.withWatermark("ingest_ts", watermark)
      .select(col("source"), col("ingest_ts"),
        explode(B.shingleHashes(tokens(col("text")))).as("hv"))
      .withColumn("bucket", col("hv") % B.HllM)
      .withColumn("rho", B.rhoExpr)
      .groupBy(window(col("ingest_ts"), windowLen), col("source"),
        col("bucket"))
      .agg(max(col("rho")).as("mj"))
      .select(col("window.start").as("win_start"), col("source"),
        col("bucket"), col("mj"))

  /** Merge emitted window registers into cumulative per-source
    * registers — the max law, usable across any window subset. */
  def mergeRegisters(regs: DataFrame): DataFrame =
    regs.groupBy(col("source"), col("bucket")).agg(max(col("mj")).as("mj"))

  /** Cardinality estimates from merged registers: batch estimator over
    * the exact integer register aggregate, shared verbatim. */
  def estimates(merged: DataFrame): DataFrame =
    B.registerAggregate(merged)
      .withColumn("est_distinct", round(B.estimateExpr, 6))
      .select(col("source"), col("v_empty"), col("s_harmonic"),
        col("est_distinct"))

  /** Watermarked per-(window, r, bucket) Count-Min cell sums over the
    * same feed — bigram occurrences counted one by one (CMS linearity
    * makes this equal the batch pre-counted build; the batch spec
    * proves the identity). */
  def windowedCmsCells(docs: DataFrame,
                       windowLen: String = "1 hour",
                       watermark: String = "30 minutes"): DataFrame =
    docs.withWatermark("ingest_ts", watermark)
      .select(col("ingest_ts"),
        explode(B.bigrams(tokens(col("text")))).as("bigram"))
      .select(col("ingest_ts"), col("bigram"),
        explode(sequence(lit(0), lit(B.CmsRows - 1))).as("r"))
      .withColumn("bucket", B.cmsBucket(col("r"), col("bigram")))
      .groupBy(window(col("ingest_ts"), windowLen), col("r"), col("bucket"))
      .agg(count(lit(1)).as("cell"))
      .select(col("window.start").as("win_start"), col("r"),
        col("bucket"), col("cell"))

  /** Merge emitted window cells into a cumulative sketch — the sum
    * law. */
  def mergeCells(cells: DataFrame): DataFrame =
    cells.groupBy(col("r"), col("bucket"))
      .agg(sum(col("cell")).cast("long").as("cell"))

  /** Probe a merged cell frame for a candidate key set: min over the 4
    * salted rows — the same probe shape as the batch q84 tail. */
  def probe(merged: DataFrame, candidates: DataFrame,
            keyCol: String = "bigram"): DataFrame =
    candidates
      .select(col(keyCol),
        explode(sequence(lit(0), lit(B.CmsRows - 1))).as("r"))
      .withColumn("bucket", B.cmsBucket(col("r"), col(keyCol)))
      .join(broadcast(merged), Seq("r", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cell")).as("n_est"))
}
