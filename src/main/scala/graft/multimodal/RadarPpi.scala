package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Radar polar volume → PPI composites (SURVEY §2.1 S19, §2.10 U6).
  *
  * The reference turns an ODIM-HDF5 polar volume into gridded products
  * (process_ppi.py:73-543): rays are slotted into integer azimuth
  * positions, slots hit by several rays are reconciled, missing slots are
  * interpolated from their circular neighbors, and the (ray × bin ×
  * elevation) voxel cube collapses into CMAX / CAVG / CAPPI composites
  * that are then georeferenced. That numpy pipeline is single-node and
  * whole-cube-in-memory; the Spark shape below is per-RAY rows → window
  * functions → groupBy composites, so a year of volumes distributes and
  * the cube never materializes anywhere.
  *
  * The HDF5 *container* read is [[Hdf5]] + [[OdimH5]] (pure-JVM subset
  * reader + ODIM polar-volume adapter — no external codec lib);
  * [[OdimH5.raysFrame]] fans volume files out to exactly the ray frame
  * below, and everything from rays onward is spec'd on synthetic volumes.
  *
  * Input ray frame (one row per ray per elevation per volume):
  * `source STRING, elangle DOUBLE, start_az DOUBLE, stop_az DOUBLE,
  *  gain DOUBLE, offset DOUBLE, bins ARRAY<DOUBLE>` (raw counts).
  */
object RadarPpi {

  val NRaysDefault = 360

  /** Ray → integer azimuth slot: mean of start/stop azimuth along the
    * short arc (wraparound-safe), floored into [0, nRays). */
  def azimuthSlot(startAz: Column, stopAz: Column,
                  nRays: Int = NRaysDefault): Column = {
    val pos = pmod(stopAz - startAz, lit(360.0)) / 2.0
    val neg = lit(180.0) - pos
    val dist = least(pos, neg)
    val sign = when(pos < neg, 1.0).otherwise(-1.0)
    floor(pmod(startAz + sign * dist, lit(360.0)) / (360.0 / nRays)).cast("int")
  }

  /** Rays → per-(elevation, slot, bin) values with slot conflicts
    * resolved: when several rays land in one slot, all-zero rays are
    * ignored (unless every ray is all-zero) and the survivors'
    * per-bin MEDIAN wins. Physical units (gain·raw + offset) are applied
    * PER RAY, before the median: rays sharing a slot may carry different
    * gain/offset (per-scan calibration), so medianing raw counts and
    * applying one ray's affine afterwards would be wrong — and which
    * ray's was picked (`first`) was nondeterministic. */
  def slotValues(rays: DataFrame, nRays: Int = NRaysDefault): DataFrame = {
    val slotW = Window.partitionBy(col("source"), col("elangle"), col("slot"))
    rays
      .withColumn("slot", azimuthSlot(col("start_az"), col("stop_az"), nRays))
      // null bins are nodata-masked measurements ([[OdimH5.rays]]): a ray
      // with only zeros and nulls carries no echo. The isNotNull guard
      // keeps the predicate two-valued so `exists` can't return null.
      .withColumn("all_zero", !exists(col("bins"), b => b.isNotNull && b =!= 0.0))
      .withColumn("live_rays", sum(when(!col("all_zero"), 1).otherwise(0)).over(slotW))
      .filter(!col("all_zero") || col("live_rays") === 0)
      .select(col("source"), col("elangle"), col("slot"),
        col("gain"), col("offset"),
        posexplode(col("bins")).as(Seq("bin_idx", "raw")))
      .groupBy(col("source"), col("elangle"), col("slot"), col("bin_idx"))
      .agg(median(col("gain") * col("raw") + col("offset")).as("value"))
  }

  /** Fill empty azimuth slots by linear interpolation between the nearest
    * present slots, circularly: present slots are mirrored at ±nRays so
    * one ordered window sees across the 0/359 seam, then the spine keeps
    * [0, nRays). Weights are proportional to circular distance. */
  def gapFill(slotVals: DataFrame, nRays: Int = NRaysDefault): DataFrame = {
    val s = slotVals.sparkSession
    import s.implicits._
    val keys = slotVals.select($"source", $"elangle", $"bin_idx").distinct()
    val spine = keys.select($"source", $"elangle", $"bin_idx",
      explode(sequence(lit(0), lit(nRays - 1))).as("slot"))
    val mirrored = slotVals.select($"source", $"elangle", $"bin_idx", $"slot", $"value")
      .unionByName(slotVals.select($"source", $"elangle", $"bin_idx",
        ($"slot" - nRays).as("slot"), $"value"))
      .unionByName(slotVals.select($"source", $"elangle", $"bin_idx",
        ($"slot" + nRays).as("slot"), $"value"))
    val joined = spine.join(mirrored, Seq("source", "elangle", "bin_idx", "slot"), "left")
      .unionByName(mirrored.filter($"slot" < 0 || $"slot" >= nRays)
        .select($"source", $"elangle", $"bin_idx", $"slot", $"value"))
    val w = Window.partitionBy($"source", $"elangle", $"bin_idx").orderBy($"slot")
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    val withVal = $"value".isNotNull
    joined
      .withColumn("prev_v", last(when(withVal, $"value"), ignoreNulls = true).over(before))
      .withColumn("prev_s", last(when(withVal, $"slot"), ignoreNulls = true).over(before))
      .withColumn("next_v", first(when(withVal, $"value"), ignoreNulls = true).over(after))
      .withColumn("next_s", first(when(withVal, $"slot"), ignoreNulls = true).over(after))
      .filter($"slot" >= 0 && $"slot" < nRays)
      .select($"source", $"elangle", $"slot", $"bin_idx",
        coalesce($"value",
          ($"prev_v" * ($"next_s" - $"slot") + $"next_v" * ($"slot" - $"prev_s")) /
            ($"next_s" - $"prev_s"),
          $"prev_v", $"next_v").as("value"))
  }

  /** Full slotting pipeline: rays → reconciled → gap-filled voxels. */
  def voxels(rays: DataFrame, nRays: Int = NRaysDefault): DataFrame =
    gapFill(slotValues(rays, nRays), nRays)

  /** CMAX: column max over elevations — one partial-agg shuffle. */
  def cmax(vox: DataFrame): DataFrame =
    vox.groupBy(col("source"), col("slot"), col("bin_idx"))
      .agg(max(col("value")).as("value"))

  /** CAVG: column average over elevations. */
  def cavg(vox: DataFrame): DataFrame =
    vox.groupBy(col("source"), col("slot"), col("bin_idx"))
      .agg(avg(col("value")).as("value"))

  /** Beam center height (km AGL) at slant range `rangeKm` and elevation
    * `elangle`°, standard 4/3-earth-radius propagation model. */
  def beamHeightKm(rangeKm: Column, elangle: Column): Column = {
    val re = lit(6371.0 * 4.0 / 3.0)
    sqrt(rangeKm * rangeKm + re * re +
      lit(2.0) * rangeKm * re * sin(radians(elangle))) - re
  }

  /** CAPPI: per (slot, bin) the value from the elevation whose beam
    * height at that range is nearest `targetKm` — a min-by over a
    * struct, no window/sort needed. */
  def cappi(vox: DataFrame, targetKm: Double, rscaleM: Double,
            rstartM: Double = 0.0): DataFrame = {
    val rangeKm = (lit(rstartM) + (col("bin_idx") + 0.5) * rscaleM) / 1000.0
    vox
      .withColumn("h_err", abs(beamHeightKm(rangeKm, col("elangle")) - targetKm))
      .groupBy(col("source"), col("slot"), col("bin_idx"))
      .agg(min(struct(col("h_err"), col("value"))).getField("value").as("value"))
  }

  /** Polar (slot, bin) → geographic (lat, lon) around the radar site —
    * the PPI grid georeference (equirectangular, km-per-degree at the
    * site latitude, matching the small-area remap the reference does). */
  def toGeo(composite: DataFrame, siteLat: Double, siteLon: Double,
            rscaleM: Double, rstartM: Double = 0.0,
            nRays: Int = NRaysDefault): DataFrame = {
    val azRad = radians(col("slot") * (360.0 / nRays))
    val rangeKm = (lit(rstartM) + (col("bin_idx") + 0.5) * rscaleM) / 1000.0
    composite.select(
      col("source"),
      (lit(siteLat) + rangeKm * cos(azRad) / 110.574).as("lat"),
      (lit(siteLon) + rangeKm * sin(azRad) /
        (111.320 * math.cos(math.toRadians(siteLat)))).as("lon"),
      col("value"))
  }
}
