package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch micro-bench: runs named SparkEntry queries under the bench
  * protocol (warmup rep + 3 timed reps, cache teardown between). Safe to
  * delete. Usage: runMain graft.tools.ProfileQueries q25_exact_dedup ... */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions.{col, xxhash64}
      import spark.implicits._
      df.select(xxhash64(df.columns.map(col): _*).as("_h")).as[Long]
        .mapPartitions { rows =>
          var acc = 0L
          rows.foreach(h => acc = acc * 1000003L + h)
          Iterator.single(acc)
        }.reduce(_ ^ _)
      ()
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val (_, warm) = graft.operators.Caches.scope(force(fn(spark, sfDir)))
      warm.release(); spark.catalog.clearCache()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val (_, sc) = graft.operators.Caches.scope(force(fn(spark, sfDir)))
        val dt = (System.nanoTime() - t0) / 1e9
        sc.release(); spark.catalog.clearCache()
        dt
      }
      println(f"[profq] $name%-24s med=${times.sorted.apply(1)}%6.3f min=${times.min}%6.3f")
    }
  }
}
