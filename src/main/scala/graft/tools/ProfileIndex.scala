package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Caches, DedupIndex, Multimodal, Sampling}
import graft.sources.Tables

/** Dev-only stage profiler for q79 (the six-table stored-index dedup):
  * times the index BUILD (per table family), the in-query plan lint,
  * and the classify probe separately under the bench protocol so
  * optimization effort lands where the wall time actually is. Not part
  * of the driver contract.
  */
object ProfileIndex {
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
    import spark.implicits._

    val prefix = "graft_profidx"
    def docs = Tables.spreadTable(spark, sfDir, "documents", col("doc_id"))
      .select(col("doc_id"), col("text"))
    def embs = Tables.spreadTable(spark, sfDir, "embeddings", col("vec_id"))
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val isNew = Sampling.hashBucket(col("doc_id"), 5) === 4
    def mediaIds(slot: Int, newSide: Boolean) = Tables.spread(
      docs.select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(3)) === slot &&
          (if (newSide) isNew else !isNew)),
      col("doc_id")).as[Long]
    def imgSide(n: Boolean) = Multimodal.imageDHashesFor(spark, mediaIds(0, n))
      .select(col("media_id").as("doc_id"), col("dhash"))
    def afpSide(n: Boolean) = Multimodal.audioFingerprintsFor(spark, mediaIds(1, n))
      .select(col("media_id").as("doc_id"), col("afp"))
    def vidSide(n: Boolean) = Multimodal.videoHashesFor(spark, mediaIds(2, n))
      .select(col("media_id").as("doc_id"), col("dhash"))

    def time(name: String)(body: => Unit): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val (_, sc) = Caches.scope(body)
        sc.release()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profidx] $name%-28s ${reps.sorted.apply(1)}%7.3f s (reps ${reps.map(r => f"$r%.3f").mkString(", ")})")
    }

    def dropAll(): Unit = Seq(
      DedupIndex.exactTable(prefix), DedupIndex.bandTable(prefix),
      DedupIndex.embTable(prefix), DedupIndex.imgTable(prefix),
      DedupIndex.afpTable(prefix), DedupIndex.vidTable(prefix))
      .foreach(DedupIndex.dropTable(spark, _))

    time("drop 6 tables")(dropAll())
    time("saveIndex (text+emb, 3 CTAS)") {
      DedupIndex.saveIndex(docs.filter(!isNew), embs.filter(!isNew), prefix)
    }
    time("saveImgIndex") {
      DedupIndex.saveImgIndex(imgSide(false), prefix)
    }
    time("saveAfpIndex") {
      DedupIndex.saveAfpIndex(afpSide(false), prefix)
    }
    time("saveVidIndex") {
      DedupIndex.saveVidIndex(vidSide(false), prefix)
    }
    def mkClassify = DedupIndex.classifyNew6Indexed(spark, docs.filter(isNew),
      embs.filter(isNew), imgSide(true), afpSide(true), vidSide(true), prefix)
    time("plan lint (plan-only)") {
      DedupIndex.assertIndexNeverShuffled(spark, prefix)(mkClassify)
    }
    time("classify probe (execute)") {
      mkClassify.write.format("noop").mode("overwrite").save()
    }
    dropAll()
    spark.stop()
  }
}
