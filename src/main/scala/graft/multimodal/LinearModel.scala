package graft.multimodal

import org.apache.spark.sql.DataFrame

/** Pure-JVM linear / logistic scorer for [[Multimodal.batchInfer]]
  * (SURVEY §2.10 U7).
  *
  * The reference's predict flow loads a registered model and batch-
  * scores feature frames (utils/predict_flow/tasks.py:39-48;
  * rj_escritorio/flooding_detection/tasks.py:63-170 is the vision
  * variant). No model runtimes exist in this container, but a
  * linear/logistic head over an extracted feature vector needs none:
  * the model IS a weights file. This makes the inference operator real
  * end-to-end — file → parsed model → vectorized per-batch scoring —
  * while keeping batchInfer's contract (one model call per batch,
  * per-partition init, order preserved).
  *
  * Weights-file format (text, shared-storage path; small — it rides
  * the task closure like any broadcast config):
  * {{{
  *   type=logistic        # or: linear
  *   bias=-0.5
  *   weights=0.25,-1.0,2.0
  * }}}
  */
object LinearModel {

  final case class Model(weights: Array[Double], bias: Double,
                         logistic: Boolean) {
    require(weights.nonEmpty, "empty weight vector")

    def score(x: Seq[Double]): Double = {
      require(x.length == weights.length,
        s"feature dim ${x.length} != weight dim ${weights.length}")
      var acc = bias
      var i = 0
      x.foreach { v => acc += weights(i) * v; i += 1 }
      if (logistic) 1.0 / (1.0 + math.exp(-acc)) else acc
    }

    /** The batch entry point [[Multimodal.batchInfer]] expects. */
    def scoreBatch(batch: Seq[Seq[Double]]): Seq[Double] = batch.map(score)
  }

  /** Parse the weights-file text (see format above). Unknown keys are
    * ignored; '#' starts a comment. */
  def parse(text: String): Model = {
    val kv = text.linesIterator
      .map(_.takeWhile(_ != '#').trim).filter(_.nonEmpty)
      .map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"bad weights line: '$l'")
        (l.substring(0, i).trim, l.substring(i + 1).trim)
      }.toMap
    val weights = kv.getOrElse("weights",
        throw new IllegalArgumentException("weights= line missing"))
      .split(",").map(_.trim.toDouble)
    // explicit whitelist: a typo ("Logistic", "sigmoid") must not
    // silently score with the WRONG link function; absent type = linear
    // (raw dot product — the unsurprising default)
    val logistic = kv.get("type") match {
      case None | Some("linear") => false
      case Some("logistic") => true
      case Some(other) => throw new IllegalArgumentException(
        s"unknown model type '$other' (expected linear|logistic)")
    }
    Model(weights, kv.get("bias").map(_.toDouble).getOrElse(0.0), logistic)
  }

  /** Load from a local or Hadoop-visible path (driver-side: the model
    * is config-sized and ships with the closure). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try parse(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** U7 end-to-end: weights file → batched scoring of `featuresCol`. */
  def inferFromFile(df: DataFrame, featuresCol: String, outCol: String,
                    batchSize: Int, weightsPath: String): DataFrame = {
    val model = load(df.sparkSession, weightsPath)
    Multimodal.batchInfer(df, featuresCol, outCol, batchSize, model.scoreBatch)
  }
}
