package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.functions.Unigram

/** One-shot trainer for the committed default unigram-LM vocabulary —
  * [[BpeTrain]]'s contract for the second tokenizer family.
  *
  * Usage:
  *   runMain graft.tools.UnigramTrain <sfDir> <outFile> [vocabSize] [maxPieceLen]
  *   runMain graft.tools.UnigramTrain synth:<nWords> <outFile> [vocabSize] [maxPieceLen]
  *
  * The committed resource src/main/resources/graft/unigram/vocab.tsv is
  * this main's output on /root/testdata/sf0.01 with vocabSize 80 and
  * maxPieceLen 4 — rerunning reproduces it byte-identically (the
  * trainer is RNG-free; ties break lexicographically). maxPieceLen 4
  * sits below the fixture's longest words on purpose: a whole-word
  * piece would degenerate token counting to word counting (the same
  * reason q110 uses a 48-merge BPE prefix). */
object UnigramTrain {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val vocabSize = if (args.length > 2) args(2).toInt else 80
    val maxPieceLen = if (args.length > 3) args(3).toInt else 4
    if (sfDir.startsWith("synth:")) {
      val nWords = sfDir.stripPrefix("synth:").toInt
      val t0 = System.nanoTime()
      val vocab = Unigram.trainFromWordCounts(
        BpeTrain.zipfWordCounts(nWords), vocabSize, maxPieceLen = maxPieceLen)
      println(f"[unigram-train] synth($nWords words) -> " +
        f"${vocab.pieces.length} pieces in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile), vocab.toVocabText + "\n")
      return
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = Unigram.train(docs, col("text"), vocabSize,
      maxPieceLen = maxPieceLen)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), vocab.toVocabText + "\n")
    println(s"[unigram-train] wrote ${vocab.pieces.length} pieces to $outFile")
    spark.stop()
  }
}
