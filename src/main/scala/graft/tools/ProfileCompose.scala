package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Caches, Compose, Dedup, Packing, TextOps}
import graft.sources.Tables

/** Dev-only stage profiler for q62 (the composed pipeline): times each
  * stage of the chain in isolation under the bench protocol (warm JVM,
  * cache-cleared reps) so optimization effort lands on the stage that
  * actually costs. Not part of the driver contract.
  */
object ProfileCompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def docs = Tables.spreadTable(spark, sfDir, "documents", col("doc_id"))
      .select(col("doc_id"), col("text"))

    def time(name: String)(body: => Long): Unit = {
      // one warmup + 2 timed
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = { val (r, sc) = Caches.scope(body); sc.release(); r }
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-28s ${reps.drop(1).map(_._1).map(t => f"$t%6.2f").mkString(" ")}  rows=${reps.head._2}")
    }

    time("stage1 quality gate") {
      TextOps.qualityScoreFor(docs).filter(col("quality_ok") === 1).count()
    }
    // OLD join-based stage-1+2 shape (4 parquet scans) — kept as the A/B
    // reference against the shipped fused filter + window-keeper build
    time("stage1+2 old join shape") {
      val d = docs
      val quality = TextOps.qualityScoreFor(d).filter(col("quality_ok") === 1).select(col("doc_id"))
      val qd = d.join(quality, Seq("doc_id"), "left_semi")
      val keepers = qd.groupBy(md5(col("text")).as("_h")).agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      qd.join(keepers, Seq("doc_id"), "left_semi").count()
    }
    time("stage1+2 fused window shape") {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.tokens
      val base = docs.select(col("doc_id"), col("text"), tokens(col("text")).as("_t"))
      val nTokens = size(col("_t")).cast("long")
      val meanTokenLen =
        (length(col("text")).cast("long") - (nTokens - lit(1L))).cast("double") / nTokens
      val uniqRatio = size(array_distinct(col("_t"))).cast("double") / nTokens
      base.filter(TextOps.qualityOk(nTokens, uniqRatio, meanTokenLen))
        .withColumn("_keep", col("doc_id") === min(col("doc_id"))
          .over(Window.partitionBy(md5(col("text")))))
        .filter(col("_keep")).count()
    }
    time("survivors (1+2+3)") {
      Compose.survivors(spark, sfDir).count()
    }
    time("q62 full") {
      Compose.qualityDedupPack(spark, sfDir).count()
    }
    time("q26-shape over raw docs") {
      Dedup.ngramJaccardPairsCappedFor(docs).count()
    }
    time("q51-shape over raw docs") {
      Dedup.dedupClustersFor(docs).count()
    }
    time("packing over raw docs") {
      Packing.packSequencesFor(docs).count()
    }

    // ---- q26 internals ----
    import graft.functions.TextFunctions.{tokens, shingles}
    def docGrams = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), shingles(col("t"), 3).as("grams"))
    time("q26a docGrams build") { docGrams.count() }
    time("q26b gram explode+count") {
      docGrams.select(col("doc_id"), explode(col("grams")).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("_df")).count()
    }
    time("q26c capped self-join ncc") {
      val dg = Caches.track(docGrams)
      val g = dg.select(col("doc_id"), explode(col("grams")).as("gram"))
      val hot = g.groupBy(col("gram")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > 100).select(col("gram"))
      val capped = Caches.track(g.join(broadcast(hot), Seq("gram"), "left_anti"))
      capped.select(col("doc_id").as("doc_a"), col("gram"))
        .join(capped.select(col("doc_id").as("doc_b"), col("gram")), Seq("gram"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("ncc")).count()
    }
    spark.stop()
  }
}
