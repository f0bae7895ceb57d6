package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.md5Long
import graft.sources.Tables

/** Dataset splitting / sampling / mixing for training-data pipelines.
  *
  * The core primitive is HASH-MOD assignment, not `rand()`: a row's
  * split is a pure function of its key, so assignment is reproducible
  * across runs, engines and cluster layouts, rows never migrate between
  * train and eval when the corpus grows, and no sampling state needs
  * coordinating — the properties a 100-TB pipeline actually needs.
  * `df.sample`/`randomSplit` remain for statistical resampling
  * (bootstrap, ml.Customs.bootstrapSE); they are not reproducible
  * join-stable splits.
  */
object Sampling {

  /** Bucket in [0, buckets) from the md5 of a key column — portable
    * (DuckDB can reproduce it: CAST('0x'||substr(md5(k),1,15) AS
    * BIGINT) % buckets). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    md5Long(key.cast("string")) % buckets

  /** Deterministic train/val/test assignment by hash bucket
    * (80/10/10 by default). */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  // q44 — split audit: per-(split, lang) document counts + token mass.
  // The report a pipeline runs after splitting to confirm per-language
  // balance across train/val/test.
  def splitAudit(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("split", split(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(org.apache.spark.sql.functions.split(col("text"), " "))
             .cast("long")).as("n_tokens"))
      .orderBy(col("split"), col("lang"))

  /** Deterministic subsampling: keep a fraction of rows by hash bucket
    * (keep = bucket < fraction·buckets). Stable under corpus growth —
    * a kept row stays kept. */
  def deterministicSample(df: DataFrame, key: Column,
                          fraction: Double, buckets: Int = 10000): DataFrame =
    df.filter(hashBucket(key, buckets) < (fraction * buckets).toLong)

  /** Corpus mixing: union sources with per-source sampling rates
    * (the "data mixture" step of pretraining pipelines). Rates > 1.0
    * mean duplication-free capping is impossible — clamp at 1.0 and log
    * via the returned effective rates if needed. */
  def mixCorpora(sources: Seq[(DataFrame, Column, Double)]): DataFrame =
    sources.map { case (df, key, rate) =>
      deterministicSample(df, key, math.min(rate, 1.0))
    }.reduce(_ unionByName _)

  /** Stratified sampling with exact per-stratum fractions via hash
    * buckets (sampleBy's reproducible cousin). */
  def stratifiedSample(df: DataFrame, stratum: String, key: Column,
                       fractions: Map[String, Double],
                       buckets: Int = 10000): DataFrame = {
    val keep = fractions.foldLeft(lit(false)) { case (acc, (value, frac)) =>
      when(col(stratum) === value,
        hashBucket(key, buckets) < (frac * buckets).toLong).otherwise(acc)
    }
    df.filter(keep)
  }
}
