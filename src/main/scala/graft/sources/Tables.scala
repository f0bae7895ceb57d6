package graft.sources

import org.apache.spark.sql.{functions, types, Column, DataFrame, SparkSession}

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

  /** Parallelism floor for CPU-heavy per-row pipelines (shingling, md5
    * minhashes, hyperplane sketches, per-row text stats): when the scan
    * yields fewer partitions than the cluster has cores, hash-spread the
    * rows BEFORE the expensive map-side work — a parquet row group is
    * indivisible, so a small table written as one row group pins the
    * whole map stage to ONE task and no file-split conf can fix it. At
    * production scale a 100-TB table scans as ~800k splits and this is
    * a no-op; the exchange only ever materializes on inputs small
    * enough that shuffling them is free relative to the compute they
    * feed (measured: q61's codec pass 3.5s → 0.95s at sf0.1, via this
    * floor inside [[graft.operators.Multimodal.realMedia]]). */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    // The partition probe is only safe on scan-shaped plans: under AQE,
    // Dataset.rdd on a plan containing an exchange MATERIALIZES the
    // upstream stages (real jobs over the data) just to read a count,
    // which the caller's own action then recomputes. A post-shuffle
    // frame is already >= shuffle.partitions wide, so the floor is moot
    // there anyway — skip both the probe and the exchange.
    val hasExchange = df.queryExecution.sparkPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
      .isDefined
    if (hasExchange) df
    else spreadIf(df, df.rdd.getNumPartitions, keys)
  }

  // deciding `spread` needs the scan's partition count, and computing it
  // (`df.rdd.getNumPartitions`) runs the full planning pipeline + file
  // listing — ~0.3s per CALL on the driver, dwarfing the exchange it
  // guards. A parquet table's split count is static for the life of the
  // process, so memoize it per resolved path. CONTRACT: assumes the
  // table files are immutable while the process lives (true for the
  // driver's testdata layout and any sane warehouse); a pipeline that
  // rewrites a table in-process must call [[resetSplitMemo]] or the
  // stale count silently mis-decides the floor. The count is also taken
  // under the FIRST caller's session confs (maxPartitionBytes etc.) —
  // acceptable because it only gates an optimization, never semantics.
  private val partsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  /** Drop memoized split counts (for in-process table rewrites). */
  def resetSplitMemo(): Unit = partsMemo.clear()

  /** [[spread]] for a named table scan: identical semantics, but the
    * partition-count probe is memoized per `<dir>/<name>` so repeated
    * query construction (benchmark reps, iterative operators) pays the
    * planning cost once per process instead of once per call. */
  def spreadTable(spark: SparkSession, dir: String, name: String,
                  keys: Column*): DataFrame = {
    val df = apply(spark, dir, name)
    val n = partsMemo.getOrElseUpdate(s"$dir/$name", df.rdd.getNumPartitions)
    spreadIf(df, n, keys)
  }

  private def spreadIf(df: DataFrame, parts: Int, keys: Seq[Column]): DataFrame = {
    val min = df.sparkSession.sparkContext.defaultParallelism
    if (parts >= min) df
    // hash-spread on the row's key when the caller names one: round-robin
    // repartition sorts whole UnsafeRows first (sortBeforeRepartition,
    // for retry determinism) — over document text that sort costs more
    // than the exchange itself
    else if (keys.nonEmpty) df.repartition(min, keys: _*)
    else df.repartition(min)
  }
}
