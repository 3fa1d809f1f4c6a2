package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable hashed-n-gram text quality classifier — the missing
  * first-class quality gate of the modern pretraining recipe (the
  * GPT-3 / LLaMA / DCLM shape: a linear classifier over hashed n-gram
  * features scoring curated-vs-crawl likelihood; Brown et al. 2020
  * §A.2, Penedo et al. 2024). The engine already had the parts —
  * q104's hashed-bucket DSIR machinery, the weights-file scorer
  * ([[graft.multimodal.LinearModel]]), broadcast-model scoring (q115);
  * this bridges them: an IN-ENGINE trainer fitting closed-form Naive
  * Bayes log-odds over labeled buckets, and a scorer that composes
  * text → hashed-n-gram bag → log-odds as ONE codegen'd scan
  * ([[graft.expressions.HashedNgramScore]]) — no per-doc shuffle, no
  * weights join.
  *
  * Scale shape: training is one corpus pass collapsing straight to the
  * M-bucket per-class counts (feature hashing caps the model at M
  * regardless of corpus vocabulary — DSIR's own trick), so the only
  * shuffle is bucket-keyed with map-side partial aggregation and the
  * collected model is M-bounded (the kmeans-centroid precedent, never
  * O(corpus)). Scoring is scan-local: the M weights ride the codegen
  * reference array once per executor.
  *
  * Reference analog: the registered-model predict flow
  * (utils/predict_flow/tasks.py:39-48) with the model reduced to a
  * weights file this object can emit ([[Model.toWeightsFileText]] is
  * [[graft.multimodal.LinearModel]]-parseable).
  */
object QualityClassifier {

  /** Trained model: `weights(b)` is the add-1-smoothed Naive Bayes
    * log-likelihood ratio of bucket `b` (target over raw), `prior` the
    * class log-prior over DOCUMENTS. Document log-odds =
    * `prior + Σ_grams weights(bucket(gram))`; the classifier gate is
    * log-odds > 0 (⇔ P(target|doc) > 0.5). */
  final case class Model(weights: Array[Double], prior: Double,
                         ns: Seq[Int]) {
    require(weights.nonEmpty, "empty weights")
    def buckets: Int = weights.length

    /** The scoring pass as one codegen'd Column over raw text. */
    def scoreCol(text: Column): Column =
      graft.expressions.HashedNgramScore.hashed_ngram_score(
        text, weights.toIndexedSeq, ns, prior)

    /** [[graft.multimodal.LinearModel]] interop: same text format
      * (bias = the class prior, weights = the bucket llr vector), so
      * the generic batch-infer surface can score pre-bucketed count
      * vectors with THIS model. Extra keys document the featurization
      * and are ignored by LinearModel.parse. */
    def toWeightsFileText: String =
      s"""type=linear
         |bias=$prior
         |ngrams=${ns.mkString(",")}
         |hash=md5hex15
         |weights=${weights.mkString(",")}
         |""".stripMargin

    def toLinearModel: graft.multimodal.LinearModel.Model =
      graft.multimodal.LinearModel.Model(weights, prior, logistic = false)

    def save(spark: SparkSession, path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(toWeightsFileText.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Parse [[Model.toWeightsFileText]] back (the LinearModel format
    * plus this classifier's featurization keys). */
  def parseModel(text: String): Model = {
    val lm = graft.multimodal.LinearModel.parse(text)
    val ns = text.linesIterator
      .map(_.trim).find(_.startsWith("ngrams="))
      .map(_.stripPrefix("ngrams=").split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 2))
    Model(lm.weights, lm.bias, ns)
  }

  def load(spark: SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try parseModel(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** The engine's standard feature-hash bucket (q104's idiom): first
    * 60 bits of md5(gram) mod `buckets` — one shared definition so the
    * trainer, the codegen scorer and the DuckDB oracles can never
    * drift onto different hashes. */
  def bucketCol(gram: Column, buckets: Int): Column =
    pmod(graft.expressions.HexPrefixToLong.hex_prefix_to_long(
      md5(gram), 15), lit(buckets.toLong))

  /** Closed-form Naive Bayes trainer. One corpus pass per n-gram size
    * (unioned into one job): explode grams scan-locally
    * ([[graft.expressions.Shingles]] — no word-level shuffle), bucket,
    * and reduce to M per-class counts with map-side partial agg. The
    * driver materializes exactly M+1 scalars (the centroid-collect
    * precedent). DETERMINISTIC by construction: counts are exact
    * longs, weights are pure arithmetic on them — retraining on the
    * same corpus is bit-identical (spec-pinned).
    *
    * `isTarget` labels the curated class (e.g. the Wikipedia-like
    * sources); everything else is the raw/crawl class. Both classes
    * must be non-empty. */
  def train(docs: DataFrame, textCol: String, isTarget: Column,
            buckets: Int = 1024, ns: Seq[Int] = Seq(1, 2)): Model = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad ngram sizes $ns")
    val m = buckets.toLong
    val grams = ns.map(n => docs.select(isTarget.as("__tgt"),
        explode(graft.expressions.Shingles.shingles(col(textCol), n))
          .as("__g")))
      .reduce(_ unionAll _)
    val perBucket = grams
      .select(col("__tgt"), bucketCol(col("__g"), buckets).as("__b"))
      .groupBy(col("__b"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("__cr"))
      .collect()
    val ct = new Array[Long](buckets)
    val cr = new Array[Long](buckets)
    perBucket.foreach { r =>
      val b = r.getLong(0).toInt
      ct(b) = r.getLong(1); cr(b) = r.getLong(2)
    }
    val nt = ct.sum
    val nr = cr.sum
    require(nt > 0L, "target class has no n-grams — check the label")
    require(nr > 0L, "raw class has no n-grams — check the label")
    val weights = Array.tabulate(buckets)(b =>
      math.log((ct(b) + 1L).toDouble / (nt + m).toDouble) -
        math.log((cr(b) + 1L).toDouble / (nr + m).toDouble))
    val d = docs.agg(
      sum(when(isTarget, 1L).otherwise(0L)),
      sum(when(isTarget, 0L).otherwise(1L))).head()
    val (dt, dr) = (d.getLong(0), d.getLong(1))
    require(dt > 0L && dr > 0L, s"degenerate doc counts: tgt=$dt raw=$dr")
    Model(weights, math.log(dt.toDouble) - math.log(dr.toDouble), ns)
  }

  /** Score + gate every document under a trained model: one codegen'd
    * scan, zero exchanges. `score` is the document log-odds rounded to
    * 4 dp (the summation-noise round, q104's convention — the oracle
    * re-sums in its own order); `keep` gates on the ROUNDED value so
    * both engines compare identical doubles. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                model: Model): DataFrame = {
    val s = round(model.scoreCol(col(textCol)), 4)
    docs.select(col(idCol), s.as("score"),
      (s > 0.0).cast("int").as("keep"))
  }
}
