package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable language identifier — the fastText-LID shape (Joulin et
  * al. 2017): multinomial Naive Bayes over hashed character n-grams,
  * the upgrade of q54's fixed stopword heuristic to FITTED per-language
  * models. The reference's langid surface guesses from a hand list;
  * modern crawl pipelines classify (CCNet runs fastText LID as stage
  * one) — this trains the same featurization in-engine.
  *
  * Train: ONE corpus pass — char n-grams explode scan-locally, hash to
  * M buckets (the engine's md5 idiom), and a single (bucket, lang)
  * aggregation with map-side partials yields ALL class models at once;
  * the driver collects M×K rows (bounded, the centroid precedent).
  * Counts are exact longs, so retraining is bit-identical.
  *
  * Predict: one codegen'd scan — K [[graft.expressions.HashedNgramScore]]
  * kernels (char-gram mode) in one projection, argmax on the
  * 4-dp-ROUNDED scores with ties to the lexicographically smaller
  * language (both pinned so the DuckDB oracle reproduces the argmax
  * exactly). Zero exchanges. */
object LangId {

  final case class LangIdModel(langs: Seq[String],
                               weights: Map[String, Array[Double]],
                               priors: Map[String, Double],
                               n: Int) {
    require(langs.nonEmpty, "no languages")
    def buckets: Int = weights(langs.head).length

    /** Per-class NB log-score of `text` as one codegen'd Column. */
    def scoreCol(text: Column, lang: String): Column =
      graft.expressions.HashedNgramScore.hashed_ngram_score(
        text, weights(lang).toIndexedSeq, Seq(n), priors(lang),
        charGrams = true)
  }

  /** Multinomial NB over hashed char `n`-grams: per class,
    * `weights(b) = ln((c_{b,l} + 1) / (N_l + M))` and
    * `prior = ln(docs_l / docs_total)`. */
  def train(docs: DataFrame, textCol: String, langCol: String,
            buckets: Int = 1024, n: Int = 3): LangIdModel = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(n >= 1, s"char-gram size must be >= 1, got $n")
    val m = buckets.toLong
    // CASE guard, not greatest(): Spark's sequence(1, 0) counts DOWN
    // ([1, 0] — the UrlOps suffix lesson), which would inject two
    // bogus partial grams per shorter-than-n document and diverge from
    // both the scoring kernel (zero grams) and the DuckDB oracle
    val counts = docs.select(col(langCol).as("__l"),
        explode(expr(
          s"""CASE WHEN char_length($textCol) >= $n THEN
             |  transform(sequence(1, char_length($textCol) - ${n - 1}),
             |    i -> substring($textCol, i, $n))
             |ELSE array() END""".stripMargin)).as("__g"))
      .select(col("__l"),
        QualityClassifier.bucketCol(col("__g"), buckets).as("__b"))
      .groupBy(col("__l"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .collect()
    val byLang = counts.groupBy(_.getString(0))
    require(byLang.nonEmpty, "no documents to train on")
    val docCounts = docs.groupBy(col(langCol)).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docCounts.values.sum
    val langs = byLang.keys.toSeq.sorted
    val weights = langs.map { l =>
      val w = new Array[Long](buckets)
      byLang(l).foreach(r => w(r.getLong(1).toInt) = r.getLong(2))
      val nl = w.sum
      l -> Array.tabulate(buckets)(b =>
        math.log((w(b) + 1L).toDouble / (nl + m).toDouble))
    }.toMap
    val priors = langs.map(l => l ->
      (math.log(docCounts(l).toDouble) - math.log(total.toDouble))).toMap
    LangIdModel(langs, weights, priors, n)
  }

  // array of (negScore, lang) structs: array_min picks the HIGHEST
  // rounded score, ties to the smaller lang — Spark's struct
  // ordering, reproduced by the oracle's ORDER BY
  private def ranked(text: Column, model: LangIdModel): Column =
    array_min(array(model.langs.map(l =>
      struct((-round(model.scoreCol(text, l), 4)).as("ns"),
        lit(l).as("lang"))): _*))

  /** The winning language as a single COLUMN — the zero-join form for
    * pipelines that stamp `lang` inline on an expensive source scan
    * (a `predict`-then-join-back would re-derive the source lineage). */
  def predictCol(text: Column, model: LangIdModel): Column =
    ranked(text, model).getField("lang")

  /** Predict the language of every document: (idCol, pred_lang, score)
    * with `score` the winning class's rounded log-score. One scan. */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: LangIdModel): DataFrame = {
    val r = ranked(col(textCol), model)
    docs.select(col(idCol),
      r.getField("lang").as("pred_lang"),
      (-r.getField("ns")).as("score"))
  }
}
