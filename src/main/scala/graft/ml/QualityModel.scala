package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable side of the quality-filter pair (the deploy side is
  * `operators.CorpusQueries.q156` — frozen weights scored at scan
  * speed): a fastText-style linear classifier over the SAME feature
  * columns, trained with MLlib LogisticRegression. In a 100 TB
  * pipeline training runs once on a labeled sample (here: weak labels
  * from the heuristic qualityScore); the fitted weights are then
  * frozen into a pure column expression so scoring adds NO model
  * runtime to the scan — the q156 shape.
  */
object QualityModel {

  /** Feature columns (shared definition with q156's oracle form). */
  def featurize(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.operators.CorpusQueries.modelFeatures(col(textCol))
      .foldLeft(docs) { case (df, (name, c)) => df.withColumn(name, c) }

  /** Weak-label + train: label = heuristic quality above `cut`. */
  def train(docs: DataFrame, cut: Double = 0.6, textCol: String = "text",
      seed: Long = 7L): LogisticRegressionModel = {
    val labeled = featurize(docs, textCol).withColumn("label",
      (graft.functions.TextAnalysis.qualityScore(col(textCol)) > cut)
        .cast("double"))
    val assembled = new VectorAssembler()
      .setInputCols(graft.operators.CorpusQueries.modelWeights.map(_._1).toArray)
      .setOutputCol("features")
      .transform(labeled)
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setRegParam(0.01).setMaxIter(50)
      .fit(assembled)
  }

  /** Area under ROC of a fitted model against the weak labels. */
  def auc(model: LogisticRegressionModel, docs: DataFrame, cut: Double = 0.6,
      textCol: String = "text"): Double = {
    val labeled = featurize(docs, textCol).withColumn("label",
      (graft.functions.TextAnalysis.qualityScore(col(textCol)) > cut)
        .cast("double"))
    val assembled = new VectorAssembler()
      .setInputCols(graft.operators.CorpusQueries.modelWeights.map(_._1).toArray)
      .setOutputCol("features")
      .transform(labeled)
    new BinaryClassificationEvaluator()
      .setLabelCol("label").setMetricName("areaUnderROC")
      .evaluate(model.transform(assembled))
  }

  /** Freeze a fitted model into (bias, per-feature weights) — the
    * margin expression `bias + Σ wᵢ·fᵢ` is then a pure column (q156's
    * deploy shape with learned instead of hand-set weights). */
  def freeze(model: LogisticRegressionModel): (Double, Seq[(String, Double)]) =
    (model.intercept,
      graft.operators.CorpusQueries.modelWeights.map(_._1)
        .zip(model.coefficients.toArray))
}
