package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector

import graft.functions.TextFns
import graft.expressions.NativeKernels

/** Trained document-quality classifier (SURVEY.md §2 H19) — the
  * model-based quality filter of the CCNet/LLaMA-style pipelines
  * (a linear classifier over cheap text statistics, trained on WEAK
  * labels like "looks like curated text" vs "random crawl"),
  * complementing E8's fixed-weight heuristic score.
  *
  * Scale shape: featurization is one map-side pass (every feature
  * comes from the codegen'd TextFns/wordStats kernels — no shuffle);
  * training is logistic regression over the feature frame (MLlib's
  * L-BFGS: one treeAggregate gradient pass per iteration, model size
  * = the feature count); scoring is a PURE COLUMN EXPRESSION —
  * sigmoid(w·x + b) unrolled over the named feature columns, fully
  * inside WholeStageCodegen, no UDF, no MLlib at inference time. The
  * trained weights ride the plan as literals, so scoring a 100-TB
  * corpus is scan → project.
  *
  * Honest determinism: L-BFGS over distributed double sums inherits
  * the usual last-ulp combine-order noise; the spec pins separation
  * quality and sign structure, not bits.
  */
object QualityModel {

  /** The feature names, in weight order. */
  val featureNames: Seq[String] = Seq(
    "f_log_chars", "f_log_words", "f_punct", "f_stopword",
    "f_ttr", "f_top_ratio", "f_mean_word_len")

  final case class Model(weights: Seq[Double], intercept: Double) {
    require(weights.length == featureNames.length,
      s"expected ${featureNames.length} weights, got ${weights.length}")
  }

  /** Map-side featurization: cheap, engine-native text statistics.
    * Appends the `f_*` columns (see [[featureNames]]). Both kernel
    * passes (marker counts + word stats) are materialized as interim
    * columns so each runs exactly once per row no matter how
    * CollapseProject splits the downstream consumers (the
    * TextFns.tokenOccurrences CSE caveat, r15 — measured: the score +
    * langid composition paid the counts kernel twice per row).
    */
  def featurize(df: DataFrame, textCol: String): DataFrame =
    featurizeWithCounts(
      df.withColumn("_tc", TextFns.markerCounts(col(textCol))),
      textCol, col("_tc")).drop("_tc")

  /** [[featurize]] reading marker counts from a pre-materialized
    * [[graft.functions.TextFns.markerCounts]] column — the form a
    * composition uses to share ONE kernel pass between the quality
    * features and other marker consumers (langid) across operator
    * boundaries. Bit-identical f_* outputs: the text form IS this
    * with a locally-materialized counts column.
    */
  def featurizeWithCounts(df: DataFrame, textCol: String,
      counts: Column): DataFrame = {
    val t = col(textCol)
    df.withColumn("f_log_chars", log1p(length(t)))
      .withColumn("f_log_words",
        log1p(TextFns.wordCountFromCounts(counts)))
      .withColumn("f_punct", TextFns.punctRatio(t))
      .withColumn("f_stopword", TextFns.stopwordRatioFromCounts(counts))
      .withColumn("_st", NativeKernels.wordStatsCol(t))
      .withColumn("f_ttr",
        when(element_at(col("_st"), 1) === 0, 0.0)
          .otherwise(element_at(col("_st"), 2).cast("double") /
            element_at(col("_st"), 1).cast("double")))
      .withColumn("f_top_ratio",
        when(element_at(col("_st"), 1) === 0, 0.0)
          .otherwise(element_at(col("_st"), 3).cast("double") /
            element_at(col("_st"), 1).cast("double")))
      .withColumn("f_mean_word_len",
        when(element_at(col("_st"), 1) === 0, 0.0)
          .otherwise(length(t).cast("double") /
            element_at(col("_st"), 1).cast("double")))
      .drop("_st")
  }

  /** Train on a featurized frame with a 0/1 `labelCol` (the weak
    * label: 1 = looks-curated). Returns the linear model.
    */
  def train(featurized: DataFrame, labelCol: String,
      maxIter: Int = 50, regParam: Double = 1e-3): Model =
    fitAssembled(featurized.select(
      col(labelCol).cast("double").as("label"),
      array_to_vector(array(featureNames.map(col): _*))
        .as("features")), maxIter, regParam)

  /** [[train]] on the canonical bounded feed (the quantizer/PCA
    * precedent — Similarity.canonicalTrainFeed): the `cap`
    * lowest-(xxhash64(id), id) rows in ONE sorted partition, so every
    * treeAggregate inside L-BFGS (gradient passes, the
    * standardization summarizer) has exactly one partial and a fixed
    * double-addition order — the fitted weights are BIT-REPRODUCIBLE
    * across runs and CPU counts, which is what lets the scoring
    * query carry a pinned oracle. Below the cap the sample is the
    * corpus; at 100 TB a linear-probe fit does not need every row.
    */
  def trainCanonical(featurized: DataFrame, labelCol: String,
      idCol: String, cap: Int = 65536, maxIter: Int = 50,
      regParam: Double = 1e-3): Model =
    fitAssembled(Similarity.canonicalTrainFeed(featurized, idCol,
      Seq(col(labelCol).cast("double").as("label"),
        array_to_vector(array(featureNames.map(col): _*))
          .as("features")), cap), maxIter, regParam)

  private def fitAssembled(assembled: DataFrame, maxIter: Int,
      regParam: Double): Model = {
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(true)
    val m = lr.fit(assembled)
    Model(m.coefficients.toArray.toSeq, m.intercept)
  }

  /** P(curated | features) as a pure column expression over the
    * `f_*` columns — codegen'd, literal weights, no UDF/MLlib.
    */
  def probability(model: Model): Column = {
    val z = featureNames.zip(model.weights)
      .map { case (f, w) => col(f) * lit(w) }
      .foldLeft(lit(model.intercept))(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Featurize + score: appends `quality_prob`. */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame =
    featurize(df, textCol)
      .withColumn("quality_prob", probability(model))

  /** [[score]] over a pre-materialized marker-counts column (shared
    * kernel pass — see [[featurizeWithCounts]]).
    */
  def scoreWithCounts(df: DataFrame, textCol: String, counts: Column,
      model: Model): DataFrame =
    featurizeWithCounts(df, textCol, counts)
      .withColumn("quality_prob", probability(model))
}
