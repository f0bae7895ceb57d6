package graft.sources

import org.apache.spark.sql.{functions, types, DataFrame, SparkSession}

/** Parquet-backed table registry for the driver testdata layout
  * (`<dir>/<name>.parquet`, see TESTDATA.md).
  *
  * Role: replaces the reference's three storage paradigms (JSON entity
  * files read by `spark_processing.py:31-32`, MongoDB collections loaded
  * by `load_mongo.py:8-11`, HBase wide-column tables in
  * `load_hbase.py:71-80`) with a single columnar, partition-parallel
  * scan layer. Parquet gives us predicate pushdown + column pruning at
  * the source — the manual column-qualifier pruning the reference does
  * by hand against HBase (`clv_integration.py:24`) is free here.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one table. Lazy: nothing reads until an action runs, so
    * Catalyst can push filters/projections into the parquet reader.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; we read nanos as long (legacy flag) and
    * rebuild a microsecond TimestampType column with exact integer
    * division (`div`, not double math — ns-since-epoch exceeds 2^53). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == types.LongType)
      df.withColumn("ts", functions.timestamp_micros(functions.expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (the engine's SQL entry point,
    * mirroring `createOrReplaceTempView` at spark_processing.py:41-42). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
