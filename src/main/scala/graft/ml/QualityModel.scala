package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MODEL-BASED document quality filtering — the standard rung above
  * [[graft.operators.TextOps.qualityScore]]'s heuristic gates (the
  * CCNet/GPT-3 recipe: fit a cheap linear classifier on a small labeled
  * sample — curated "clean" docs vs crawl junk — then score the whole
  * corpus and keep by score). Composes [[Features.tfidf]] with
  * [[Models.logistic]]; nothing here is new ML, the operator is the
  * WIRING a curation pipeline needs: fit once on a driver-scale sample,
  * score distributed.
  *
  * Scale shape: the FIT runs on the labeled sample only (thousands of
  * rows — iterative L-BFGS on a broadcast-able problem; the corpus is
  * never touched during training). SCORING is one `PipelineModel
  * .transform`: the vocabulary and coefficients ship broadcast inside
  * the model, the corpus is touched once, no shuffle at all — the same
  * per-row shape as every TextOps scorer. Kept OUT of the DuckDB oracle
  * set by design (iterative fit, float coefficients); the spec pins
  * junk-vs-clean separation on planted fixtures and wires the score
  * into the q100-style salted quota
  * ([[graft.operators.Sampling.saltedTopK]]) instead.
  */
object QualityModel {

  /** Fit on a labeled (`textCol`, `labelCol`) sample; label 1.0 =
    * clean / keep, 0.0 = junk / drop. Deterministic for a fixed sample
    * (TF-IDF is counting; L-BFGS logistic on a fixed problem has no
    * random state). `regParam` defaults to light L2 so near-separable
    * planted samples don't push coefficients to infinity. */
  def fit(labeled: DataFrame, textCol: String = "text",
          labelCol: String = "label", vocabSize: Int = 500,
          regParam: Double = 0.01): PipelineModel =
    new Pipeline().setStages(Array(
      Features.tfidf(textCol, vocabSize),
      Models.logistic(labelCol, regParam = regParam)))
      .fit(labeled)

  /** Score a corpus: adds `quality_prob` = P(clean) and drops the
    * model's intermediate columns, leaving the caller's frame + score —
    * ready to feed a threshold filter or a
    * [[graft.operators.Sampling.saltedTopK]] quota. */
  def score(model: PipelineModel, corpus: DataFrame,
            out: String = "quality_prob"): DataFrame = {
    val scored = model.transform(corpus)
      .withColumn(out, vector_to_array(col("probability")).getItem(1))
    scored.drop(scored.columns.filter(c =>
      c != out && !corpus.columns.contains(c)): _*)
  }
}
