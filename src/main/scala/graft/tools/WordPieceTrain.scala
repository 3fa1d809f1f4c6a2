package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.functions.WordPiece

/** One-shot trainer for the committed default WordPiece vocabulary —
  * [[BpeTrain]]/[[UnigramTrain]]'s contract for the third tokenizer
  * family.
  *
  * Usage:
  *   runMain graft.tools.WordPieceTrain <sfDir> <outFile> [vocabSize]
  *   runMain graft.tools.WordPieceTrain synth:<nWords> <outFile> [vocabSize]
  *
  * The committed resource src/main/resources/graft/wordpiece/vocab.txt
  * is this main's output on /root/testdata/sf0.01 with vocabSize 128 —
  * rerunning reproduces it byte-identically (the trainer is RNG-free;
  * scores compare by exact integer cross-multiplication, ties break
  * lexicographically). 128 total pieces leaves ~60 likelihood merges
  * over the fixture's alphabet — enough that common morphemes fuse
  * while segmentation stays non-trivial (the q110 48-merge-prefix /
  * q140 maxPieceLen-4 rationale). */
object WordPieceTrain {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val vocabSize = if (args.length > 2) args(2).toInt else 128
    if (sfDir.startsWith("synth:")) {
      val nWords = sfDir.stripPrefix("synth:").toInt
      val t0 = System.nanoTime()
      val vocab = WordPiece.trainFromWordCounts(
        BpeTrain.zipfWordCounts(nWords), vocabSize)
      println(f"[wordpiece-train] synth($nWords words) -> " +
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
    val vocab = WordPiece.train(docs, col("text"), vocabSize)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), vocab.toVocabText + "\n")
    println(s"[wordpiece-train] wrote ${vocab.pieces.length} pieces to $outFile")
    spark.stop()
  }
}
