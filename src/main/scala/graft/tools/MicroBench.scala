package graft.tools

import graft.Tables
import graft.functions.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B timer for signature-lane encodings (not part of the
  * driver contract; kept for plan experiments). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    val sh = DedupOps.explodedShingles(docs, "doc_id", "text", 3)

    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    time("min(md5 string)") {
      noop(sh.groupBy(col("doc_id")).agg(
        (0 until 8).map(i => min(md5(concat_ws("|", lit(i), col("shingle")))).as(s"h$i")).head,
        (0 until 8).map(i => min(md5(concat_ws("|", lit(i), col("shingle")))).as(s"h$i")).tail: _*))
    }
    time("min(conv60 long)") {
      noop(sh.groupBy(col("doc_id")).agg(
        (0 until 8).map(i => min(conv(substring(md5(concat_ws("|", lit(i), col("shingle"))), 1, 15), 16, 10).cast("long")).as(s"h$i")).head,
        (0 until 8).map(i => min(conv(substring(md5(concat_ws("|", lit(i), col("shingle"))), 1, 15), 16, 10).cast("long")).as(s"h$i")).tail: _*))
    }
    import graft.expressions.HexPrefixToLong.hex_prefix_to_long
    time("min(hexpfx long)") {
      noop(sh.groupBy(col("doc_id")).agg(
        (0 until 8).map(i => min(hex_prefix_to_long(md5(concat_ws("|", lit(i), col("shingle"))), 15)).as(s"h$i")).head,
        (0 until 8).map(i => min(hex_prefix_to_long(md5(concat_ws("|", lit(i), col("shingle"))), 15)).as(s"h$i")).tail: _*))
    }

    // in-bucket pair expansion: interpreted HOF vs native SortedPairs
    val buckets = DedupOps.lshBands(
        DedupOps.minhashSignature(docs, "doc_id", "text"), "doc_id")
      .groupBy(col("band_idx"), col("band_key"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    time("pairs HOF") {
      noop(buckets.select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), y -> " +
          "struct(x AS id_a, y AS id_b))))")).as("p"))
        .select(col("p.id_a"), col("p.id_b")).distinct())
    }
    time("pairs native") {
      noop(buckets.select(explode(
          graft.expressions.SortedPairs.sorted_pairs(col("ids"))).as("p"))
        .select(col("p.id_a"), col("p.id_b")).distinct())
    }

    // q59 verify stage: corpus-wide token distinct vs candidate-pruned
    def dedup(pruned: Boolean): org.apache.spark.sql.DataFrame = {
      val sig = DedupOps.minhashSignature(docs, "doc_id", "text")
      val rawPairs = DedupOps.lshCandidatePairs(sig, "doc_id")
      val (pairs, tokens) =
        if (pruned) DedupOps.verifyInputs(docs, "doc_id", "text", rawPairs)
        else (rawPairs, DedupOps.explodedWords(docs, "doc_id", "text")
          .select(col("doc_id"), col("__w").as("token")).distinct())
      DedupOps.dropNearDuplicates(docs, "doc_id",
          DedupOps.jaccardForPairs(pairs, tokens, "doc_id"), 0.8)
        .select(col("doc_id"), col("n_chars"))
    }
    time("q59 corpus-tokens") { noop(dedup(pruned = false)) }
    time("q59 pruned-tokens") { noop(dedup(pruned = true)) }

    // non-equi interval join: binned hash join vs the nested-loop plan
    // Spark picks for a raw BETWEEN condition (2000 overlapping bands ×
    // events — the regime where per-row band scanning dominates)
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("value"))
    val bands = spark.range(2000).select(col("id").as("band_id"),
      (col("id") * 0.25).as("lo"), (col("id") * 0.25 + 25).as("hi"))
    time("bandjoin nested-loop") {
      noop(events.join(bands,
          col("value") >= col("lo") && col("value") <= col("hi"))
        .groupBy(col("band_id")).agg(count(lit(1)).as("n")))
    }
    time("bandjoin binned") {
      noop(graft.functions.RangeJoinOps
        .pointInInterval(events, "value", bands, "lo", "hi", binWidth = 25.0)
        .groupBy(col("band_id")).agg(count(lit(1)).as("n")))
    }
    spark.stop()
  }
}
