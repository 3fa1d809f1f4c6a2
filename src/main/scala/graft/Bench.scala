package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries are fully materialized through the `noop` sink (whole plan
  * executes, zero result-serialization overhead). A warmup query runs
  * first so JVM/codegen startup is not billed to the first measurement.
  * `micro_batch` times a full capture tick (raw append → treat/nest →
  * staging append → log append) — the reference's 1-minute-cadence
  * envelope (BASELINE.md: must clear well under 60 s).
  */
object Bench {

  /** Headline subset: one representative per operator family. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary",   // scan+agg (TPC-H Q1 shape)
    "q8_sql_surface",       // 3-table SQL join-agg-topn (TPC-H Q3 shape)
    "q3_last_per_entity",   // window dedup
    "q10_state_join",       // broadcast state join
    "q12_capture_gaps",     // spine generate + anti join
    "q13_validity_range_join", // range join
    "q65_asof_join",        // native as-of join (custom SparkPlan)
    "q22_running_sum",      // running window
    "q26_tumbling_5min",    // streaming-shape tumbling agg
    "q47_json_extract",     // json parse + agg
    "q51_minhash_sig",      // explode + 8-way min agg
    "q52_lsh_pairs",        // LSH band bucketing
    "q59_neardup_dedup",    // full dedup pipeline (LSH→Jaccard→drop)
    "q55_quality",          // text scoring scan
    "q60_knn_bruteforce",   // vector top-k
    "q63_vector_neardup"    // bucketed vector pair join
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Warmup: small end-to-end pass to absorb JVM/codegen first-run cost.
    materialize(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))

    val qs = SparkEntry.queries
    def runHeadline(): Seq[(String, Double)] = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      try materialize(qs(name)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Two back-to-back runs so a per-query move is distinguishable from
    // ambient machine variance (a real regression shows up in both).
    val results = runHeadline()
    val results2 = runHeadline()

    // Capture micro-batch: one tick of the streaming pipeline at this SF.
    // Timed twice (fresh lake each) like the headline queries, so a
    // variance spike is distinguishable from a real regression.
    def microBatch(): Double = {
      val tmp = java.nio.file.Files.createTempDirectory("bench_lake").toString
      val lake = new graft.lake.Lake(spark, tmp)
      val log = new graft.lake.CaptureLog(spark, lake)
      val cap = new graft.streaming.Capture(spark, lake, log,
        graft.streaming.CaptureConfig("bench", "events",
          pk = Seq("event_id"), tsCol = "ts"))
      val raw = Tables.load(spark, sfDir, "events")
      val t0 = System.nanoTime()
      cap.processBatch(raw, Timestamp.valueOf("2024-02-01 00:00:00"))
      (System.nanoTime() - t0) / 1e9
    }
    val mb = microBatch()
    val mb2 = microBatch()

    val all = results :+ ("micro_batch" -> mb)
    val all2 = results2 :+ ("micro_batch" -> mb2)
    def toJson(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${toJson(all)},"queries_run2":${toJson(all2)},"total_run2":${all2.map(_._2).sum}%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
