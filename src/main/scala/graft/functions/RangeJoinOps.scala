package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-equi interval joins at scale.
  *
  * Spark plans a pure `p BETWEEN lo AND hi` join (no equi-key) as a
  * broadcast nested-loop — every point evaluated against every interval.
  * That is fine for a handful of intervals and fatal past that. The
  * scale path is the classic binned range join (the strategy behind
  * interval-join implementations in streaming engines and the
  * bucketized spatial joins of the GeoSpark/Sedona family): overlay a
  * fixed grid on the domain, explode each interval into the bins it
  * covers, map each point to its single bin, and equi-join on the bin —
  * Spark then plans a plain shuffle/broadcast HASH join keyed by bin,
  * and the residual BETWEEN filter decides membership exactly.
  *
  * Correctness never depends on the grid: bins only PRUNE candidate
  * pairs (a qualifying pair always shares the point's bin — lo ≤ p ≤ hi
  * ⇒ floor(lo/w) ≤ floor(p/w) ≤ floor(hi/w)), and each qualifying pair
  * meets in exactly ONE bin (the point's), so no dedup step is needed.
  * binWidth tunes the explosion factor: ~the median interval length
  * gives ≈2 bin rows per interval; a narrower grid trades interval-side
  * fan-out for tighter candidate sets.
  */
object RangeJoinOps {

  /** Join `points` to every interval of `intervals` containing the
    * point: pointCol ∈ [loCol, hiCol], both bounds inclusive. Numeric
    * domain (cast timestamps to epoch seconds first). Output columns =
    * points ++ intervals. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // withColumn would silently OVERWRITE (and drop() then delete) a
    // caller's __bin; and overlapping side names would yield ambiguous
    // duplicate output columns that only fail on first reference.
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "__bin is reserved by pointInInterval")
    require(overlap.isEmpty,
      s"points and intervals share columns ${overlap.mkString(", ")}; " +
        "rename one side — the output carries both frames' columns")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    // A degenerate interval (lo > hi, or a null bound) matches no point
    // under BETWEEN; sequence(), though, throws on descending boundaries
    // at runtime. Filter them out so the binned plan degrades to the
    // nested-loop plan's empty result instead of failing the job.
    val i = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
