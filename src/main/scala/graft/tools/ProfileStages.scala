package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Stage-level profiler for the composed shard-writer family (the
  * round-15 optimization targets q105/q109/q111): times each pipeline
  * stage in isolation under the bench session shape (local[$CPUS],
  * shuffle.partitions=$CPUS, AQE on), labeling jobs so the timings can
  * be cross-checked in the UI. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.ProfileStages"
  *
  * Offline tool — never on a query path; noop-sink timing per guide §1.4.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    val reps = sys.env.get("GRAFT_PROFILE_REPS").flatMap(_.toIntOption).getOrElse(2)
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val (_, scope) = Caches.scope {
        // --- current q105, stage by stage ---
        val sc = time("q105.plan(survivorsCounted incl CC probe)") {
          Compose.survivorsCounted(spark, dir)
        }
        time("q105.counts.noop (1st eval: fills d2 cache)") {
          noop(sc.select(col("doc_id"), col("_nt")))
        }
        time("q105.counts.noop (2nd eval: cache-fed)") {
          noop(sc.select(col("doc_id"), col("_nt")))
        }
        time("q105.text.noop (cache-fed)") {
          noop(sc.select(col("doc_id"), col("text")))
        }
        val rep105 = time("q105.writeShardsCounts (write only)") {
          Packing.writeShardsCounts(
            sc.select(col("doc_id"), col("text")),
            sc.select(col("doc_id"), col("_nt")),
            512, 8, Packing.defaultShardPath(dir) + "_prof105")
        }
        time("q105.report.noop") { noop(rep105) }
        // --- current q109, stage by stage ---
        val surv = time("q109.plan(survivors incl CC probe)") {
          Compose.survivors(spark, dir)
        }
        val merges = time("q109.trainedMerges(10)") {
          Bpe.trainedMerges(spark, dir, 10)
        }
        val counts = time("q109.subwordCounts.localCheckpoint") {
          Caches.register(
            Bpe.subwordCountsFor(surv, merges).localCheckpoint())
        }
        val rep109 = time("q109.writeShardsCounts (write only)") {
          Packing.writeShardsCounts(surv, counts,
            512, 8, Packing.defaultShardPath(dir) + "_prof109")
        }
        time("q109.report.noop") { noop(rep109) }
      }
      scope.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
