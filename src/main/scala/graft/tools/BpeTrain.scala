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

  /** 64-bit SplitMix hash — the deterministic randomness source for the
    * synthetic vocabulary (no java.util.Random: cross-JVM stable).
    * Shared with MicroBench's corpus synthesis and BpeSpec's property
    * tables — one implementation, so the generated fixtures can never
    * drift apart. */
  private[graft] def mix(x: Long): Long = graft.core.Mix.mix(x)

  /** Deterministic Zipf word→count table for REALISTIC-VOCAB training.
    * The fixture corpus holds 31 distinct pieces — no 32k-merge
    * vocabulary can be trained from it — so large-vocab measurements
    * use this synthetic distribution: words are composed from a shared
    * 512-syllable inventory (giving the natural prefix/suffix reuse
    * that makes BPE merges productive, the way real morphology does)
    * and the rank-r word carries count N/(r+1) (Zipf's law). Same
    * (nWords, seed) ⇒ byte-identical table on every JVM. */
  def zipfWordCounts(nWords: Int, seed: Long = 42L,
                     totalScale: Long = 10_000_000L): Seq[(String, Long)] = {
    val consonants = "bcdfghjklmnprstvz"
    val vowels = "aeiou"
    val syls = (0 until 512).map { i =>
      val x = mix(seed ^ (i.toLong << 17))
      val c1 = consonants((Math.floorMod(x >>> 8, consonants.length.toLong)).toInt)
      val v = vowels((Math.floorMod(x >>> 21, vowels.length.toLong)).toInt)
      if ((x & 3) == 0)
        s"$c1$v${consonants(Math.floorMod(x >>> 34, consonants.length.toLong).toInt)}"
      else s"$c1$v"
    }
    (0 until nWords).map { r =>
      val x = mix(seed + r.toLong * 0x9e3779b9L)
      val nSyl = 2 + Math.floorMod(x, 4L).toInt
      val w = (0 until nSyl).map { k =>
        syls(Math.floorMod(mix(x ^ (k.toLong << 7)), 512L).toInt)
      }.mkString
      (w, math.max(1L, totalScale / (r + 1L)))
    }.groupBy(_._1).map { case (w, rs) => (w, rs.map(_._2).sum) }.toSeq
      .sortBy { case (w, c) => (-c, w) }
  }

  /** Usage:
    *   runMain graft.tools.BpeTrain <sfDir> <outFile> [numMerges]
    *   runMain graft.tools.BpeTrain synth:<nWords> <outFile> [numMerges]
    * The synth mode trains on [[zipfWordCounts]] — for vocabularies the
    * 31-distinct-piece fixture corpus cannot produce (e.g. 32768). */
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val numMerges = if (args.length > 2) args(2).toInt else 256
    if (sfDir.startsWith("synth:")) {
      val nWords = sfDir.stripPrefix("synth:").toInt
      val t0 = System.nanoTime()
      val vocab = Bpe.trainFromWordCounts(zipfWordCounts(nWords), numMerges)
      println(f"[bpe-train] synth($nWords words) -> ${vocab.merges.length} " +
        f"merges in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile), vocab.toMergesText + "\n")
      return
    }
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
