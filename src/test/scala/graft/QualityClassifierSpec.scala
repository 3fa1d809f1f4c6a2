package graft

import org.apache.spark.sql.functions._
import graft.functions.QualityClassifier

/** The trainable hashed-n-gram quality classifier (q130/q131):
  * deterministic training, bit-exact codegen scoring against an
  * independent driver reference, zero-exchange plan shape, and
  * LinearModel-format persistence. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // curated-like: articles, function words
    (1L, "the history of the city and the river", true),
    (2L, "a study of the growth of a region", true),
    (3L, "the economy and the culture of a nation", true),
    // crawl-like: spammy, repetitive
    (4L, "buy cheap deals buy cheap deals now now", false),
    (5L, "click here click here free free free", false),
    (6L, "win big win big casino casino casino", false),
    (7L, "subscribe now cheap deals click here", false)
  ).toDF("doc_id", "text", "tgt")

  /** Independent reference: same md5-hex-15 bucket, same gram
    * convention, summed in the kernel's fixed order — driver-side
    * Scala, sharing no code with the expression. */
  private def refBucket(gram: String, m: Int): Int = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
    val hex = dig.map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % m).toInt
  }

  private def refScore(text: String, m: QualityClassifier.Model): Double = {
    val words = text.split(" ", -1)
    var acc = m.prior
    for (n <- m.ns; i <- 0 until (words.length - n + 1))
      acc += m.weights(refBucket(words.slice(i, i + n).mkString(" "),
        m.buckets))
    acc
  }

  test("training is deterministic and the fitted gate separates the classes") {
    val m1 = QualityClassifier.train(fixture, "text", col("tgt"),
      buckets = 256)
    val m2 = QualityClassifier.train(fixture, "text", col("tgt"),
      buckets = 256)
    assert(m1.prior === m2.prior)
    assert(m1.weights.sameElements(m2.weights), "retrain must be bit-identical")
    // prior is the exact doc-count log-odds: ln(3) − ln(4)
    assert(m1.prior === math.log(3.0) - math.log(4.0))
    val scored = QualityClassifier.scoreDocs(fixture, "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // the classifier must reproduce its own training labels on this
    // cleanly-separated vocabulary
    assert((1L to 3L).forall(scored(_) == 1), scored.toString)
    assert((4L to 7L).forall(scored(_) == 0), scored.toString)
  }

  test("codegen scorer is bit-identical to the independent reference (both eval paths)") {
    val m = QualityClassifier.train(fixture, "text", col("tgt"),
      buckets = 128)
    val rows = fixture.select(col("doc_id"), col("text"),
        m.scoreCol(col("text")).as("s")).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) === refScore(r.getString(1), m),
        s"doc ${r.getLong(0)}")
    }
    // interpreted eval (codegen off) must agree bit-for-bit
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = fixture.select(col("doc_id"), col("text"),
        m.scoreCol(col("text")).as("s")).collect()
      interp.foreach(r =>
        assert(r.getDouble(2) === refScore(r.getString(1), m)))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // null text scores null, empty text is one empty unigram
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), m.scoreCol(col("text")).as("s")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(edge(1L).isEmpty)
    assert(edge(2L).contains(refScore("", m)))
  }

  test("scoring is one scan: zero exchanges, inside whole-stage codegen") {
    val m = QualityClassifier.train(fixture, "text", col("tgt"))
    val df = QualityClassifier.scoreDocs(
      Tables.load(spark, sf001, "documents"), "doc_id", "text", m)
    val exec = df.queryExecution.executedPlan
    val plan = exec.toString
    assert(!plan.contains("Exchange"),
      s"classifier gate must add no shuffle:\n$plan")
    // the scoring projection runs INSIDE a whole-stage-codegen span
    // (the "*(n)" prefix in the string form), not as a fallback project
    val codegenProjects = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("hashed_ngram_score") => w
    }
    assert(codegenProjects.nonEmpty,
      s"scorer not inside WholeStageCodegen:\n$plan")
  }

  test("model persists in the LinearModel weights-file format") {
    val m = QualityClassifier.train(fixture, "text", col("tgt"),
      buckets = 64)
    val path = tmpDir("qclf") + "/model.txt"
    m.save(spark, path)
    val back = QualityClassifier.load(spark, path)
    assert(back.prior === m.prior)
    assert(back.ns === m.ns)
    assert(back.weights.sameElements(m.weights))
    // the generic LinearModel surface parses the same file: bias =
    // prior, linear link, same weight vector — so batchInfer can score
    // pre-bucketed count vectors under THIS model
    val lm = graft.multimodal.LinearModel.load(spark, path)
    assert(lm.bias === m.prior && !lm.logistic)
    assert(lm.weights.sameElements(m.weights))
    // semantic interop: LinearModel.score over a bucket-count vector
    // equals the text kernel's score for the counted document
    val text = "the history of the river"
    val counts = new Array[Double](m.buckets)
    for (n <- m.ns) {
      val w = text.split(" ", -1)
      for (i <- 0 until (w.length - n + 1))
        counts(refBucket(w.slice(i, i + n).mkString(" "), m.buckets)) += 1.0
    }
    val viaLm = lm.score(counts.toIndexedSeq)
    val viaKernel = fixture.sparkSession.range(1)
      .select(m.scoreCol(lit(text))).head().getDouble(0)
    assert(math.abs(viaLm - viaKernel) < 1e-12,
      s"LinearModel $viaLm vs kernel $viaKernel")
  }

  test("logistic refinement reduces the loss from the NB start and keeps separating") {
    val nb = QualityClassifier.train(fixture, "text", col("tgt"),
      buckets = 256)
    val (refined, losses) = QualityClassifier.trainLogistic(fixture,
      "doc_id", "text", col("tgt"), buckets = 256, epochs = 4, lr = 0.5)
    assert(losses.length === 5, "init loss + one per epoch")
    assert(losses.last < losses.head,
      s"GD did not improve the loss: $losses")
    // full-batch GD at a sane lr on the convex loss: monotone here
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"loss increased: $losses")
    }
    // the refined gate still reproduces the training labels
    val scored = QualityClassifier
      .scoreDocs(fixture, "doc_id", "text", refined)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert((1L to 3L).forall(scored(_) == 1), scored.toString)
    assert((4L to 7L).forall(scored(_) == 0), scored.toString)
    // a supplied init short-circuits the NB fit and shape-mismatches fail
    val (_, losses2) = QualityClassifier.trainLogistic(fixture,
      "doc_id", "text", col("tgt"), buckets = 256, epochs = 1, lr = 0.5,
      init = Some(nb))
    assert(math.abs(losses2.head - losses.head) < 1e-9,
      "init loss must be the NB model's loss")
    intercept[IllegalArgumentException] {
      QualityClassifier.trainLogistic(fixture, "doc_id", "text",
        col("tgt"), buckets = 128, init = Some(nb))
    }
  }

  test("sampled training is deterministic and falls back when a class vanishes") {
    // a corpus big enough that the md5 doc sample keeps both classes
    val big = (0L until 200L).map { i =>
      val curated = i % 2 == 0
      val text = if (curated) s"the history of region $i and the river"
                 else s"buy cheap deals now $i click here free"
      (i, text, curated)
    }.toDF("doc_id", "text", "tgt")
    val s1 = QualityClassifier.train(big, "text", col("tgt"),
      buckets = 256, trainSamplePct = 40)
    val s2 = QualityClassifier.train(big, "text", col("tgt"),
      buckets = 256, trainSamplePct = 40)
    assert(s1.prior === s2.prior && s1.weights.sameElements(s2.weights),
      "sampled retrain must be bit-identical (deterministic md5 sample)")
    val full = QualityClassifier.train(big, "text", col("tgt"),
      buckets = 256)
    assert(!s1.weights.sameElements(full.weights),
      "a 40% sample training identically to the full corpus means the sample filter is dead")
    // the sampled model still separates (bag-of-buckets converges early)
    val scored = QualityClassifier.scoreDocs(big, "doc_id", "text", s1)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val acc = (0L until 200L).count(i =>
      scored(i) == (if (i % 2 == 0) 1 else 0)) / 200.0
    assert(acc >= 0.95, s"sampled model accuracy $acc")
    // a sample that loses a class (single target doc, unlucky hash not
    // guaranteed — force it with pct=1 on the tiny fixture) falls back
    // to the full corpus instead of throwing
    val tiny = QualityClassifier.train(fixture, "text", col("tgt"),
      buckets = 256, trainSamplePct = 1)
    val fullTiny = QualityClassifier.train(fixture, "text", col("tgt"),
      buckets = 256)
    assert(tiny.prior === fullTiny.prior &&
      tiny.weights.sameElements(fullTiny.weights),
      "class-losing sample must fall back to full-corpus training")
  }

  test("pareto gate: deterministic draw, independent reference agrees, soft-keeps diversity") {
    val m = QualityClassifier.train(fixture, "text", col("tgt"),
      buckets = 256)
    val got = QualityClassifier.paretoGate(fixture, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getInt(3)))
    // independent reference: σ of the 4-dp-rounded log-odds, the
    // salted-hash uniform, the inverse Lomax draw — driver-side Scala
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val texts = fixture.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, score, draw, keep) =>
      val p = 1.0 / (1.0 + math.exp(-round4(refScore(texts(id), m))))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"quality|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1000000.0
      val d = math.pow(1.0 - u, -1.0 / 9.0) - 1.0
      assert(score === round4(p), s"doc $id score")
      assert(draw === round4(d), s"doc $id draw")
      assert(keep === (if (round4(d) > round4(1.0 - p)) 1 else 0),
        s"doc $id keep")
    }
    // replays draw identically (the rand() shape could not)
    val again = QualityClassifier.paretoGate(fixture, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(again.sortBy(_._1).toSeq
      === got.sortBy(_._1).map(g => (g._1, g._3, g._4)).toSeq)
    // one codegen'd scan, zero exchanges — same plan contract as scoreDocs
    val plan = QualityClassifier
      .paretoGate(Tables.load(spark, sf001, "documents"), "doc_id",
        "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("degenerate labels fail loudly") {
    intercept[IllegalArgumentException] {
      QualityClassifier.train(fixture, "text", lit(true))
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(fixture, "text", lit(false))
    }
  }
}
