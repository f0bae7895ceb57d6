package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range/interval joins, the bucket-grid way.
  *
  * A point-in-interval join has no equi-key, so a naive formulation
  * (`points JOIN intervals ON lo <= t AND t < hi`) plans as a broadcast
  * nested-loop / cartesian — the canonical 100-TB scale-killer. The
  * grid technique restores an equi-join: intervals explode to the fixed-
  * width buckets they overlap, points map to the single bucket they fall
  * in, the join runs on (keys…, bucket) as an ordinary shuffled/broadcast
  * hash join, and the exact containment predicate filters the bucket-
  * cohabitants. Each point occupies exactly ONE bucket, so a qualifying
  * (point, interval) pair matches on exactly one bucket row — no
  * post-join dedup. Cost: |intervals| × (len/W + 2) exploded rows; pick
  * W near the typical interval length so the blow-up stays ≤ ~3×.
  * (Same family as Dedup's banded LSH joins: turn a predicate join into
  * an equi-join on a coarsened key.)
  *
  * The constant-width special case of this rewrite also runs
  * AUTOMATICALLY as a Catalyst optimizer rule
  * ([[graft.plans.RangeJoinRule]], injected by `GraftExtensions`): a
  * plain `t >= lo && t < lo + W` join written naively against an
  * extension-enabled session plans as the grid equi-join instead of a
  * nested loop. This operator remains the general form (variable-length
  * intervals, multi-key).
  */
object Intervals {

  /** Generic bucket-grid range join: rows of `points` paired with rows
    * of `intervals` where `keys` match and loCol ≤ tCol < hiCol.
    * `tCol`/`loCol`/`hiCol` are epoch seconds (long); `bucketW` is the
    * grid width in seconds. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                tCol: String, loCol: String, hiCol: String,
                bucketW: Long): DataFrame = {
    require(bucketW > 0, s"bucket width must be positive, got $bucketW")
    // the grid staging columns are reserved: a caller column with one of
    // these names would be silently overwritten and dropped — fail loudly
    val reserved = Seq("_graft_cell_in", "_lo_cell", "_hi_cell", "_bucket")
    for (df <- Seq(points, intervals); c <- df.columns if reserved.contains(c))
      throw new IllegalArgumentException(
        s"rangeJoin input column '$c' collides with a reserved grid " +
          s"staging name (${reserved.mkString(", ")}); rename it first")
    // exact integer floor-division, same as RangeJoinRule.cell: a
    // double-based floor(col/W) rounds t and lo independently above
    // 2^52 and silently drops pairs at extreme long domains. The `div`
    // operator only exists in SQL text, so the expr() runs over a
    // CONTROLLED alias (`_graft_cell_in`) — interpolating the caller's
    // column name into SQL would break on backticks and silently
    // re-interpret dotted nested-field names as top-level ones.
    val cellExpr =
      expr(s"(_graft_cell_in - pmod(_graft_cell_in, ${bucketW}L)) div ${bucketW}L")
    def withCell(df: DataFrame, c: String, out: String): DataFrame =
      df.withColumn("_graft_cell_in", df(c))
        .withColumn(out, cellExpr)
        .drop("_graft_cell_in")
    val gridded = withCell(withCell(intervals, loCol, "_lo_cell"),
        hiCol, "_hi_cell")
      .withColumn("_bucket", explode(sequence(col("_lo_cell"), col("_hi_cell"))))
      .drop("_lo_cell", "_hi_cell")
    val slotted = withCell(points, tCol, "_bucket")
    slotted.join(gridded, keys :+ "_bucket")
      .filter(col(tCol) >= col(loCol) && col(tCol) < col(hiCol))
      .drop("_bucket")
  }

  /** q57 — error-window attribution: every `error` event opens a
    * `windowMin`-minute window; count, per event type, the same user's
    * OTHER events that land inside any window. The "what happens around
    * a failure" query every event pipeline runs; the interval side is
    * derived, not stored — both sides are the 100-TB events stream.
    *
    * Timestamps keep microsecond precision: the grid bounds are a
    * deliberate SUPERSET cover on truncated epoch seconds (`_lo` rounds
    * down, `_hi` rounds up by a full second — a pair at `lo + w − ε`
    * lands on floor-second `⌊lo⌋ + w` and a tight bound would drop it),
    * and the exact containment filter runs on the raw timestamps. */
  def errorWindowEvents(s: SparkSession, dir: String,
                        windowMin: Int = 10): DataFrame = {
    val w = windowMin * 60L
    val ev = Tables(s, dir, "events")
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts").as("lo_ts"),
        (col("ts") + expr(s"INTERVAL $windowMin MINUTES")).as("hi_ts"))
      .withColumn("_lo", unix_timestamp(col("lo_ts")))
      .withColumn("_hi", unix_timestamp(col("lo_ts")) + w + 1)
    val points = ev.filter(col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"))
      .withColumn("_t", unix_timestamp(col("ts")))
    rangeJoin(points, intervals, Seq("user_id"),
        tCol = "_t", loCol = "_lo", hiCol = "_hi", bucketW = w)
      // bucket cover used truncated seconds; the real predicate is exact
      .filter(col("ts") >= col("lo_ts") && col("ts") < col("hi_ts"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("err_id")).as("n_windows"),
        countDistinct(col("event_id")).as("n_events"))
      .orderBy(col("event_type"))
  }
}
