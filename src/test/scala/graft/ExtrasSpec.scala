package graft

import java.sql.Timestamp

import graft.connectors.{RateLimited, Scrape}
import graft.expressions.GraftExtensions
import graft.streaming.EntityWatermark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("html table scrape: header promotion + decimal comma (S17)") {
    val html =
      """<html><body><table>
        |<tr><th>Estação</th><th>Chuva 15min</th></tr>
        |<tr><td>Tijuca</td><td>1,8</td></tr>
        |<tr><td>Urca</td><td>ND</td></tr>
        |</table></body></html>""".stripMargin
    val df = Scrape.readHtmlTable(spark, html)
    assert(df.columns.toSeq === Seq("estacao", "chuva_15min"))
    val vals = df.select($"estacao", Scrape.scrapedNumber($"chuva_15min"))
      .as[(String, Option[Double])].collect().toMap
    assert(vals === Map("Tijuca" -> Some(1.8), "Urca" -> None))
  }

  test("rate-limited map paces calls (U8)") {
    val t0 = System.nanoTime()
    val out = RateLimited.mapRateLimited(
      spark.range(5).as[Long], perPartitionRps = 50)(identity)
      .collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    // 5 calls at 50 rps → ≥ 80 ms of pacing (4 intervals × 20 ms)
    assert(elapsedMs >= 80, s"elapsed $elapsedMs ms — pacing not applied")
  }

  test("unaccent registered for SQL via extensions (§7.9)") {
    GraftExtensions.install(spark)
    val out = spark.sql("SELECT unaccent('Cüstómér ação') AS s")
      .as[String].head()
    assert(out === "Customer acao")
  }

  test("raster grid flatten: one file → rows×cols cells (S18/S19/U6)") {
    val media = graft.multimodal.Multimodal.asMedia(
      Tables.load(spark, sf001, "documents").limit(3)
        .withColumn("bin", $"text".cast("binary")),
      "doc_id", "bin", "raster/stub", "source")
    val spec = graft.multimodal.Raster.GridSpec(4, 5, -23.1, -22.7, -43.8, -43.0)
    val grid = graft.multimodal.Raster.gridFlatten(media, spec)
    assert(grid.count() === 3 * 4 * 5)
    val bounds = grid.agg(min($"lat"), max($"lat"), min($"lon"), max($"lon")).head()
    assert(bounds.getDouble(0) === -23.1 && bounds.getDouble(1) === -22.7)
    assert(bounds.getDouble(2) === -43.8 && bounds.getDouble(3) === -43.0)
    // deterministic stub: re-run gives identical cells
    assert(graft.multimodal.Raster.gridFlatten(media, spec).collect().toSet ===
      grid.collect().toSet)
  }

  test("optimizer rule collapses nested unaccent (§4 custom rule)") {
    val s2 = spark.newSession()
    graft.expressions.GraftExtensions.install(s2)
    s2.experimental.extraOptimizations =
      Seq(graft.expressions.CollapseUnaccent)
    import graft.expressions.Unaccent.unaccent
    val df = s2.range(1).select(
      unaccent(unaccent(concat(lit("Cü"), $"id".cast("string")))).as("s"))
    val optimized = df.queryExecution.optimizedPlan.toString
    // exactly one unaccent survives optimization
    assert("unaccent".r.findAllMatchIn(optimized.toLowerCase).size === 1,
      optimized)
    assert(df.as[String](org.apache.spark.sql.Encoders.STRING).head() === "Cu0")
  }

  test("streaming per-entity watermark keeps only newer rows (T7)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EntityWatermark.Keyed]
    val q = EntityWatermark.filterNewer(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_entities")
      .start()
    def ts(s: String) = Timestamp.valueOf(s)
    // batch 1: both pass (no state yet)
    input.addData(
      EntityWatermark.Keyed("s1", ts("2024-01-01 10:00:00")),
      EntityWatermark.Keyed("s2", ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    // batch 2: stale s1 dropped, fresh s1 kept, new entity s3 kept
    input.addData(
      EntityWatermark.Keyed("s1", ts("2024-01-01 09:00:00")),
      EntityWatermark.Keyed("s1", ts("2024-01-01 12:00:00")),
      EntityWatermark.Keyed("s3", ts("2024-01-01 08:00:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT entity, ts FROM wm_entities")
      .as[(String, Timestamp)].collect().toSet
    assert(rows === Set(
      ("s1", ts("2024-01-01 10:00:00")), ("s2", ts("2024-01-01 11:00:00")),
      ("s1", ts("2024-01-01 12:00:00")), ("s3", ts("2024-01-01 08:00:00"))))
  }
}
