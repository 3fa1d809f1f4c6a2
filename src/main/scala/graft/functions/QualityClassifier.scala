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
    * must be non-empty.
    *
    * `trainSamplePct` < 100 fits the model on a DETERMINISTIC md5
    * sample of the corpus — the 100 TB posture (the
    * [[DedupOps.semanticPairsBlocked]] / AnnIndex.retrain device): a
    * bag-of-buckets model converges long before the full corpus is
    * read, so the training scans shrink 100/pct× while scoring still
    * covers every document. A sample that loses either class falls
    * back to training on the full corpus (tiny inputs). */
  def train(docs: DataFrame, textCol: String, isTarget: Column,
            buckets: Int = 1024, ns: Seq[Int] = Seq(1, 2),
            trainSamplePct: Int = 100): Model = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad ngram sizes $ns")
    require(trainSamplePct >= 1 && trainSamplePct <= 100,
      s"trainSamplePct must be in [1, 100], got $trainSamplePct")
    if (trainSamplePct < 100) {
      val sampled = docs.filter(
        pmod(graft.expressions.HexPrefixToLong.hex_prefix_to_long(
          md5(col(textCol)), 15), lit(100L)) < trainSamplePct.toLong)
      val d = sampled.agg(
        sum(when(isTarget, 1L).otherwise(0L)),
        sum(when(isTarget, 0L).otherwise(1L))).head()
      if (!d.isNullAt(0) && d.getLong(0) > 0L &&
          !d.isNullAt(1) && d.getLong(1) > 0L)
        return trainFull(sampled, textCol, isTarget, buckets, ns)
      // fall through: the sample lost a class — train on everything
    }
    trainFull(docs, textCol, isTarget, buckets, ns)
  }

  private def trainFull(docs: DataFrame, textCol: String, isTarget: Column,
                        buckets: Int, ns: Seq[Int]): Model = {
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

  /** STOCHASTIC quality sampling — GPT-3's actual acceptance rule
    * (Brown et al. 2020 §A.2: "documents were kept if
    * np.random.pareto(α) > 1 − document_score", α = 9), which keeps
    * SOME lower-scoring documents instead of a hard cutoff — the
    * diversity-preserving gate. Spark-shaped deterministically: the
    * Pareto draw comes from [[TextOps.hashFrac]]'s salted md5 uniform
    * through the inverse Lomax CDF, x = (1−u)^(−1/α) − 1, so replays
    * and both engines draw the IDENTICAL value per document (the q72
    * device; `rand()` would be neither replayable nor oracle-checkable).
    * `score` is the classifier probability σ(log-odds), computed from
    * the 4-dp-ROUNDED log-odds (q130's oracle-visible quantity — the
    * oracle re-derives σ from the same rounded value), and both sides
    * of the comparison round to 4 dp so the engines compare identical
    * doubles (exp/pow are faithful-rounded, not bit-pinned).
    *
    * Scale shape: like [[scoreDocs]], ONE codegen'd scan — the model
    * rides the codegen reference array, the draw is scalar md5
    * arithmetic, zero exchanges. */
  def paretoGate(docs: DataFrame, idCol: String, textCol: String,
                 model: Model, alpha: Double = 9.0,
                 salt: String = "quality"): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val p = lit(1.0) /
      (lit(1.0) + exp(-round(model.scoreCol(col(textCol)), 4)))
    val u = TextOps.hashFrac(col(idCol), salt)
    val draw = pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)
    docs.select(col(idCol),
      round(p, 4).as("score"),
      round(draw, 4).as("draw"),
      (round(draw, 4) > round(lit(1.0) - p, 4)).cast("int").as("keep"))
  }

  /** LOGISTIC refinement of the gate — the fastText/DCLM shape: from
    * the Naive Bayes closed form (or a caller-supplied `init`), run
    * `epochs` of FULL-BATCH gradient descent on the mean logistic loss
    * over the same hashed-n-gram count features. NB assumes bucket
    * independence; the discriminative steps correct the weights where
    * buckets co-occur.
    *
    * Scale shape: corpus TEXT is scanned exactly once — the
    * (doc, bucket, count) frame materializes up front (persisted,
    * narrow: longs and doubles only) and every epoch runs two
    * aggregations over IT, never the corpus: a doc-keyed score/loss
    * pass (the per-bucket weights broadcast in) and a bucket-keyed
    * gradient pass whose result is the M-bounded frame the driver
    * collects (the centroid-collect precedent). Full-batch GD on a
    * convex loss with a deterministic feature frame — no sampling, no
    * row order in the MATH; the only cross-run wobble is double
    * summation order inside the aggregations, ulp-scale, which is why
    * q132 pins loss-improvement FLAGS (robust to ulps), not weights.
    *
    * Returns the refined model and the loss trajectory
    * (`losses.head` = loss under `init`, one entry per epoch after). */
  def trainLogistic(docs: DataFrame, idCol: String, textCol: String,
                    isTarget: Column, buckets: Int = 1024,
                    ns: Seq[Int] = Seq(1, 2), epochs: Int = 3,
                    lr: Double = 0.1, init: Option[Model] = None)
      : (Model, Seq[Double]) = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(lr > 0.0, s"lr must be positive, got $lr")
    val start = init.getOrElse(train(docs, textCol, isTarget, buckets, ns))
    require(start.buckets == buckets && start.ns == ns,
      s"init model shape (${start.buckets}, ${start.ns}) != ($buckets, $ns)")
    val spark = docs.sparkSession
    import org.apache.spark.storage.StorageLevel
    val grams = ns.map(n => docs.select(col(idCol).as("__id"),
        isTarget.cast("int").cast("double").as("__y"),
        explode(graft.expressions.Shingles.shingles(col(textCol), n))
          .as("__g")))
      .reduce(_ unionAll _)
    val counts = grams
      .select(col("__id"), col("__y"), bucketCol(col("__g"), buckets).as("__b"))
      .groupBy(col("__id"), col("__y"), col("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = counts.select(col("__id")).distinct().count().toDouble
    require(nDocs > 0, "no documents to train on")

    var w = start.weights.clone()
    var bias = start.prior
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    var epoch = 0
    while (epoch <= epochs) { // epoch 0 measures the init loss only
      val wDf = spark.createDataFrame(
        w.toIndexedSeq.zipWithIndex.map { case (v, b) => (b.toLong, v) })
        .toDF("__b", "__w")
      val scored = counts.join(broadcast(wDf), Seq("__b"))
        .groupBy(col("__id"), col("__y"))
        .agg(sum(col("__c") * col("__w")).as("__dot"))
        .select(col("__id"), col("__y"),
          (col("__dot") + lit(bias)).as("__s"))
      // stable softplus of the margin: loss = mean ln(1 + e^(−(2y−1)s))
      val margin = (col("__y") * 2.0 - 1.0) * col("__s")
      val lossCol = greatest(lit(0.0), -margin) +
        log(lit(1.0) + exp(-abs(margin)))
      if (epoch < epochs) {
        // one pass computes loss AND residuals; residuals join back to
        // the count frame for the M-bounded gradient
        val resid = scored.select(col("__id"),
            (lit(1.0) / (lit(1.0) + exp(-col("__s"))) - col("__y"))
              .as("__r"),
            lossCol.as("__l"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val lrow = resid.agg(sum(col("__l")), count(lit(1))).head()
        losses += lrow.getDouble(0) / nDocs
        val grad = counts.join(resid.select(col("__id"), col("__r")),
            Seq("__id"))
          .groupBy(col("__b"))
          .agg(sum(col("__c") * col("__r")).as("__g"))
          .collect()
        val biasGrad = resid.agg(sum(col("__r"))).head().getDouble(0)
        resid.unpersist(blocking = false)
        grad.foreach { r =>
          val b = r.getLong(0).toInt
          w(b) -= lr * r.getDouble(1) / nDocs
        }
        bias -= lr * biasGrad / nDocs
      } else {
        losses += scored.select(lossCol.as("__l"))
          .agg(sum(col("__l"))).head().getDouble(0) / nDocs
      }
      epoch += 1
    }
    counts.unpersist(blocking = false)
    (Model(w, bias, ns), losses.toSeq)
  }
}
