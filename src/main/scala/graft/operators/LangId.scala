package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector

import graft.expressions.NativeKernels

/** Trained language identification (SURVEY.md §2 E7's model tier) —
  * the CCNet/fastText shape: hashed character-n-gram features into a
  * multinomial linear classifier. The marker-token heuristic
  * (TextFns.langId) stays as the cheap first-pass gate; this model is
  * what a production pipeline runs where the heuristic says "und" or
  * the stakes are higher.
  *
  * Scale shape: featurization is ONE map-side byte pass per document
  * (NativeKernels.charGramFreq — dense normalized n-gram histogram,
  * no tokenization, no shuffle); training is MLlib multinomial
  * logistic regression over the bounded feature frame (L-BFGS
  * treeAggregate per iteration, model size = nLangs·(buckets+1)
  * doubles); scoring ships the trained weight matrix as ONE plan
  * literal into the denseArgmax kernel — scan → project at 100 TB,
  * no UDF, no MLlib at inference, no join.
  *
  * Determinism: like H19, the fit rides the canonical bounded feed
  * (trainCanonical — one sorted partition, fixed combine order), so
  * the weights are bit-reproducible across fresh JVMs and CPU counts
  * and `text_langid_model` hash-gates against pinned labels; the
  * spec additionally pins held-out separation (≥ 0.95 on planted
  * multilingual corpora).
  */
object LangIdModel {

  /** Trained model: language names in class-index order plus the flat
    * class-major weight table ([[NativeKernels.denseArgmax]] layout —
    * per class: `buckets` feature weights then the intercept).
    */
  final case class Model(languages: Seq[String], n: Int, buckets: Int,
      weights: Seq[Double]) {
    require(weights.length == languages.length * (buckets + 1),
      s"expected ${languages.length * (buckets + 1)} weights, " +
        s"got ${weights.length}")
  }

  /** Append the dense n-gram frequency histogram as `lang_feats`. */
  def featurize(df: DataFrame, textCol: String, n: Int = 3,
      buckets: Int = 256): DataFrame =
    df.withColumn("lang_feats",
      NativeKernels.charGramFreqCol(col(textCol), n, buckets))

  /** Train from a labeled frame (`labelCol` holding language names).
    * `languages` fixes the class order (deterministic output layout);
    * rows labeled outside it are dropped.
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      languages: Seq[String], n: Int = 3, buckets: Int = 256,
      maxIter: Int = 50, regParam: Double = 1e-4): Model =
    fitAssembled(assemble(df, textCol, labelCol, languages, n,
      buckets), languages, n, buckets, maxIter, regParam)

  /** [[train]] on the canonical bounded feed (the quantizer/PCA
    * precedent): `cap` lowest-(xxhash64(id), id) labeled rows in ONE
    * sorted partition, so every L-BFGS treeAggregate has one partial
    * and a fixed double-addition order — the weight matrix is
    * BIT-REPRODUCIBLE across runs and CPU counts, making the scoring
    * query pinnable. Below the cap the sample is the corpus.
    */
  def trainCanonical(df: DataFrame, textCol: String, labelCol: String,
      idCol: String, languages: Seq[String], cap: Int = 65536,
      n: Int = 3, buckets: Int = 256, maxIter: Int = 50,
      regParam: Double = 1e-4): Model = {
    val assembled = Similarity.canonicalTrainFeed(
      assemble(df, textCol, labelCol, languages, n, buckets)
        .withColumn("__id", col(idCol)),
      "__id", Seq(col("label"), col("features")), cap)
    fitAssembled(assembled, languages, n, buckets, maxIter, regParam)
  }

  private def assemble(df: DataFrame, textCol: String,
      labelCol: String, languages: Seq[String], n: Int,
      buckets: Int): DataFrame = {
    require(languages.nonEmpty && languages.distinct == languages,
      s"languages must be non-empty and distinct: $languages")
    val idx = map(languages.zipWithIndex.flatMap { case (l, i) =>
      Seq(lit(l), lit(i.toDouble)) }: _*)
    featurize(df, textCol, n, buckets)
      .withColumn("label", element_at(idx, col(labelCol)))
      .filter(col("label").isNotNull)
      .select(col("*"), array_to_vector(col("lang_feats"))
        .as("features"))
  }

  private def fitAssembled(assembled: DataFrame,
      languages: Seq[String], n: Int, buckets: Int, maxIter: Int,
      regParam: Double): Model = {
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFamily("multinomial").setStandardization(false)
    val m = lr.fit(assembled.select(col("label"), col("features")))
    // coefficientMatrix is nClasses × buckets; flatten class-major
    // with each class's intercept appended (the kernel's layout)
    val w = (0 until languages.length).flatMap { l =>
      (0 until buckets).map(j => m.coefficientMatrix(l, j)) :+
        m.interceptVector(l)
    }
    Model(languages, n, buckets, w)
  }

  /** Predicted language as a pure column over a `lang_feats` column:
    * one denseArgmax kernel call against the weight literal, then an
    * O(nLangs) name lookup.
    */
  def predict(model: Model): Column =
    element_at(typedLit(model.languages),
      NativeKernels.denseArgmaxCol(col("lang_feats"),
        typedLit(model.weights), model.languages.length) + 1)

  /** Featurize + classify: appends `lang_model`. */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame =
    featurize(df, textCol, model.n, model.buckets)
      .withColumn("lang_model", predict(model))
      .drop("lang_feats")

  // ------------------------------------------------------------------
  // Deterministic multilingual fixture — the training corpus for the
  // driver query and the spec's planted-separation gate (the
  // synthetic-media pattern: the generator pins every byte).
  // ------------------------------------------------------------------

  /** Small per-language vocabularies (markers + common words; zh is
    * genuinely multi-byte UTF-8, exercising the byte-n-gram path).
    */
  val vocab: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "house", "water", "friend",
      "morning", "people", "street", "work", "where", "through",
      "night", "would", "think"),
    "fr" -> Seq("le", "la", "et", "maison", "eau", "ami", "matin",
      "gens", "rue", "travail", "où", "toujours", "nuit", "serait",
      "penser"),
    "es" -> Seq("el", "los", "y", "casa", "agua", "amigo", "mañana",
      "gente", "calle", "trabajo", "donde", "siempre", "noche",
      "sería", "pensar"),
    "de" -> Seq("der", "die", "und", "haus", "wasser", "freund",
      "morgen", "leute", "straße", "arbeit", "wo", "immer", "nacht",
      "würde", "denken"),
    "zh" -> Seq("的", "了", "是", "房子", "水", "朋友", "早上",
      "人们", "街道", "工作", "哪里", "总是", "晚上", "会", "想"))

  /** One deterministic pseudo-document: `len` words drawn from the
    * language's vocabulary by a seeded LCG keyed on (lang, docIdx).
    */
  private def synthDoc(lang: String, docIdx: Long, seed: Long,
      len: Int): String = {
    val words = vocab(lang)
    var s = seed * 6364136223846793005L + lang.hashCode * 1442695040888963407L +
      docIdx * 2862933555777941757L
    val sb = new StringBuilder
    var i = 0
    while (i < len) {
      s = s * 6364136223846793005L + 1442695040888963407L
      if (i > 0) sb.append(' ')
      sb.append(words((((s >>> 33) % words.length).toInt + words.length)
        % words.length))
      i += 1
    }
    sb.toString
  }

  /** `perLang` labeled documents per language — deterministic in
    * (seed); distributed generation, one row per (lang, idx).
    */
  def syntheticCorpus(spark: SparkSession, perLang: Int,
      seed: Long = 42L, len: Int = 30): DataFrame = {
    import spark.implicits._
    val langs = vocab.keys.toSeq.sorted
    spark.range(perLang.toLong * langs.length)
      .select(col("id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val lang = langs((id % langs.length).toInt)
          val idx = id / langs.length
          (id, lang, synthDoc(lang, idx, seed, len))
        }
      }
      .toDF("doc_id", "lang", "text")
  }
}
