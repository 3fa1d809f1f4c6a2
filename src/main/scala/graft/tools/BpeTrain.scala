package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.functions.Bpe

/** One-shot trainer for the committed default BPE vocabulary.
  *
  * Usage: runMain graft.tools.BpeTrain <sfDir> <outFile> [numMerges]
  *
  * Trains on the documents fixture with the deterministic Sennrich loop
  * (ties broken lexicographically), writes the public merges.txt format.
  * The committed resource src/main/resources/graft/bpe/merges.txt is this
  * main's output on /root/testdata/sf0.01 with 256 merges — rerunning
  * reproduces it byte-identically.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val numMerges = if (args.length > 2) args(2).toInt else 256
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = Bpe.train(docs, col("text"), numMerges)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), vocab.toMergesText + "\n")
    println(s"[bpe-train] wrote ${vocab.merges.length} merges to $outFile")
    spark.stop()
  }
}
