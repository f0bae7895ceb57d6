package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY scale plan: "salting for skew").
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit
  * salting remains the tool when one join key dominates so heavily that
  * even split partitions overwhelm a task, or when AQE is unavailable
  * (e.g. inside a cached subtree). Mechanism: replicate the small side
  * `factor` times (one copy per salt), scatter the large side's hot rows
  * uniformly across salts, join on (key, salt) — the hot key's rows now
  * spread over `factor` tasks instead of one.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted `factor` ways. Result is
    * row-identical to `large.join(small, key)` — only the partitioning
    * changes. Cost: small side is materialized `factor`×; keep factor
    * modest (8-32) and the small side genuinely small. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int = 16): DataFrame = {
    require(factor > 0)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id(), rand(42L)), lit(factor.toLong))
        .cast("int"))
    val replicated = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage skewed aggregation: per-(key, salt) partial then final
    * per-key. For Spark's built-in aggregates this duplicates what
    * partial aggregation already does — it exists for aggregations where
    * the map-side combine degrades (e.g. collect_list on a hot key) and
    * as the documented pattern. `aggs` must be decomposable (sum/count/
    * min/max). */
  def saltedGroupSum(df: DataFrame, key: String, valueCol: String,
                     factor: Int = 16): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id(), rand(42L)), lit(factor.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"),
           sum(col("_n")).as("n"))
}
