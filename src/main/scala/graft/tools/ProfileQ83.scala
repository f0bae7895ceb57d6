package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.{Caches, Sketches}
import graft.sources.Tables

/** Stage-by-stage wall profile of q83 (the HLL cardinality audit) —
  * the same decomposition discipline as [[ProfileCompose]]: build each
  * intermediate in isolation under a cache scope, force it, print the
  * wall, so a board-level regression can be pinned to the stage that
  * grew instead of guessed at. */
object ProfileQ83 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[q83] $name%-38s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"[q83] ---- rep $rep ----")
      val (_, sc) = Caches.scope {
        val docs = Tables(spark, sfDir, "documents")
        timed("scan+tokenize only") {
          docs.select(count(lit(1)),
            max(size(tokens(col("text"))))).collect()
        }
        timed("scan+tokenize+windows (no md5)") {
          docs.select(col("source"),
              explode(Sketches.shingleWindows(tokens(col("text")))).as("_sh"))
            .select(count(lit(1)), max(length(col("_sh")))).collect()
        }
        timed("windows via element_at chain (no md5)") {
          val toks = tokens(col("text"))
          docs.select(col("source"),
              explode(transform(sequence(lit(1), size(toks) - 7),
                i => concat_ws(" ",
                  (0 until 8).map(j => element_at(toks, i + j)): _*))).as("_sh"))
            .select(count(lit(1)), max(length(col("_sh")))).collect()
        }
        val shingled = timed("scan+tokenize+shingle+md5 (no group)") {
          val d = Sketches.shingleHashRows(docs, Seq("source"))
          d.select(count(lit(1)), max(col("hv"))).collect()
          d
        }
        val g = timed("g: (source,hv) groupBy + cache") {
          val g0 = Caches.track(shingled
            .groupBy(col("source"), col("hv"))
            .agg(count(lit(1)).as("n_occ")))
          g0.count(); g0
        }
        timed("regs0 from cached g") {
          g.withColumn("bucket", col("hv") % Sketches.HllM)
            .withColumn("rho", Sketches.rhoExpr)
            .groupBy(col("source"), col("bucket"))
            .agg(max(col("rho")).as("mj")).count()
        }
        timed("exact per-source from cached g") {
          g.groupBy(col("source"))
            .agg(sum(col("n_occ")).cast("long"), count(lit(1))).collect()
        }
        timed("exact _ALL_ countDistinct from cached g") {
          g.agg(sum(col("n_occ")).cast("long"),
            countDistinct(col("hv"))).collect()
        }
        timed("FULL declared query") {
          Sketches.shingleCardinalityAudit(spark, sfDir).collect()
        }
      }
      sc.release(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
