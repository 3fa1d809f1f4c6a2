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
    spark.stop()
  }
}
