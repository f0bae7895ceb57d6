package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch: isolates Tables.spread overhead — planning cost of
  * .rdd.getNumPartitions vs the exchange itself. Safe to delete. */
object ProfileSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.sources.Tables(spark, sfDir, "documents").count() // warm scan
    def time(label: String, n: Int = 3)(body: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[spr] $label%-34s med=${ts.sorted.apply(n / 2)}%7.3f")
    }
    time("plain scan count") {
      graft.sources.Tables(spark, sfDir, "documents").count()
    }
    time("getNumPartitions only") {
      graft.sources.Tables(spark, sfDir, "documents").rdd.getNumPartitions
    }
    time("spread(doc_id) count") {
      graft.sources.Tables.spread(
        graft.sources.Tables(spark, sfDir, "documents"), col("doc_id")).count()
    }
    time("manual repartition count") {
      graft.sources.Tables(spark, sfDir, "documents")
        .repartition(32, col("doc_id")).count()
    }
    time("plain md5 agg") {
      graft.sources.Tables(spark, sfDir, "documents")
        .selectExpr("md5(text) h").groupBy("h").count().count()
    }
    time("spread md5 agg") {
      graft.sources.Tables.spread(
        graft.sources.Tables(spark, sfDir, "documents"), col("doc_id"))
        .selectExpr("md5(text) h").groupBy("h").count().count()
    }
  }
}
