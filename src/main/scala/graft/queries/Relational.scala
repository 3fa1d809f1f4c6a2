package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Core relational operators from SURVEY.md §2.3–§2.7 as oracle-checked
  * queries over the driver testdata. Each entry has a DuckDB-equivalent
  * in [[oracles]] with identical column names and deterministic ORDER BY.
  *
  * Money/measure aggregates go through DECIMAL(18,2) and back to DOUBLE so
  * both engines produce bit-identical values regardless of summation order.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Order-insensitive exact sum: decimal accumulate, double result. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Aggregations (SURVEY §2.5) ------------------------------------
    // A1/A5-shape pricing summary (TPC-H Q1 shape): filter + groupBy + sums.
    "q1_pricing_summary" -> ((s, dir) => {
      // strict-< on the raw timestamp (not cast-to-date) so the predicate
      // pushes down to the parquet scan
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
            .cast(DoubleType).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // A1: MIN/MAX scalar agg for incremental bounds (rj_smtr/utils.py:235-261 shape).
    "q2_incremental_bounds" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        max(col("o_orderdate")).as("max_date"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderkey")).as("max_key"),
        count(lit(1)).as("n_rows"))
    }),
    // A3/W3: last-per-group (per-entity watermark advance, utils.py:1096-1099).
    "q3_last_per_entity" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"),
          col("o_orderdate").as("last_orderdate"))
        .orderBy(col("o_custkey"))
    }),
    // A4: group count / uniqueness-check cardinalities.
    "q4_group_count" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_orderstatus")).as("n_status"))
        .orderBy(col("o_custkey"))
    }),
    // A5/W4: per-hour pipeline-health counts (rj_smtr/constants.py:244-330 shape).
    "q5_hourly_counts" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),
    // A6: distinct partition tuples before a partitioned write.
    "q6_distinct_partitions" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(year(col("o_orderdate")).as("ano"), month(col("o_orderdate")).as("mes"))
        .distinct()
        .orderBy(col("ano"), col("mes"))
    }),
    // A2: row-wise greatest + column max (comando/eventos newest-event watermark).
    "q7_newest_event" -> ((s, dir) => {
      t(s, dir, "events").agg(
        max(greatest(col("value"), col("event_id").cast("double"))).as("max_val"),
        max(col("ts")).as("max_ts"))
    }),

    // S16/§3.3: the SQL surface itself — the engine is the warehouse.
    // One SQL text serves both Spark and the DuckDB oracle (ANSI subset).
    "q8_sql_surface" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(n))
      s.sql(Relational.shippingPrioritySql)
    }),

    // A4-scale path: HLL approximate distinct for cardinality checks.
    // SELF-CHECKING since round 10: the raw estimate differs across
    // engines by construction, so the frame carries the exact counts
    // (hash-matched against DuckDB) plus an in-bound flag — the
    // estimate within 3σ of its published error (rsd 0.05 default) —
    // which the oracle pins to 1. A broken sketch now FAILS the hash
    // instead of hiding behind a rows-only check.
    "q9_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey")).as("__ap"),
          approx_count_distinct(col("l_orderkey")).as("__ao"))
        .select(col("exact_parts"), col("exact_orders"),
          (abs(col("__ap") - col("exact_parts"))
            <= col("exact_parts") * lit(0.15)).cast("int").as("parts_in_bound"),
          (abs(col("__ao") - col("exact_orders"))
            <= col("exact_orders") * lit(0.15)).cast("int").as("orders_in_bound"))
    }),

    // A4 at scale: the MERGEABLE sketch twin of q9 — two half-year
    // sketches built independently, merged, and estimated. Exercises
    // the checkpointable path q9's one-shot estimate cannot: per-run
    // sketches persist in _state and cross-run cardinality is a sketch
    // merge, not a history re-scan. Self-checking like q9: the merged
    // estimate must land within 3·1.04/√2¹² ≈ 5% of the exact count
    // the oracle recomputes.
    "q68_hll_sketch" -> ((s, dir) => {
      import graft.expressions.HllSketch._
      val o = t(s, dir, "orders")
      val halves = o.groupBy(
          (year(col("o_orderdate")) * 2 + (month(col("o_orderdate")) > 6)
            .cast("int")).as("half"))
        .agg(hll_sketch(col("o_custkey")).as("sk"))
      val est = halves.agg(hll_estimate(hll_merge(col("sk"))).as("__approx"))
      o.agg(countDistinct(col("o_custkey")).as("exact_customers"))
        .crossJoin(est)
        .select(col("exact_customers"),
          (abs(col("__approx") - col("exact_customers"))
            <= col("exact_customers") * lit(0.05)).cast("int")
            .as("est_in_bound"))
    }),

    // Native as-of join (custom LogicalPlan + SparkStrategy + exec):
    // latest order per user as of each event's timestamp.
    "q65_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      graft.plans.AsOf.join(s, e, o,
          Seq(e("user_id")), Seq(o("o_custkey")),
          e("ts"), o("o_orderdate"), tiebreak = Seq(o("o_orderkey")))
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate"))
        .orderBy(col("event_id"))
    }),

    // ---- Joins (SURVEY §2.4) -------------------------------------------
    // J1: left join vs per-entity watermark state, keep rows newer than state.
    "q10_state_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val state = ev
        .filter(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("user_id")).agg(max(col("ts")).as("last_update"))
      ev.join(broadcast(state), Seq("user_id"), "left")
        .filter(col("last_update").isNull || col("ts") > col("last_update"))
        .select(col("event_id"), col("user_id"), col("ts"))
        .orderBy(col("event_id"))
    }),
    // J2/SO2: anti-join for new keys (georeference new-addresses shape).
    "q11_new_keys_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    // J3/T4/W1: minute-spine gap detection + top-90 recapture cap
    // (rj_smtr/tasks.py:437-558 recapture planner shape).
    "q12_capture_gaps" -> ((s, dir) => {
      val spine = s.range(1).select(explode(sequence(
        lit("2024-01-05 00:00:00").cast("timestamp"),
        lit("2024-01-05 23:59:00").cast("timestamp"),
        expr("INTERVAL 1 MINUTE"))).as("minute"))
      val seen = t(s, dir, "events")
        .select(date_trunc("minute", col("ts")).as("minute")).distinct()
      spine.join(seen, Seq("minute"), "left_anti")
        .orderBy(col("minute")).limit(90)
    }),
    // J4: range (interval) join with null-able open end (GTFS feed_info shape).
    "q13_validity_range_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderdate").cast("date").as("start_date"),
        when(col("o_orderstatus") === "O", lit(null).cast("date"))
          .otherwise(date_add(col("o_orderdate").cast("date"), 90)).as("end_date"))
      val li = t(s, dir, "lineitem")
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate").cast("date").between(
            col("start_date"),
            coalesce(col("end_date"), lit("2999-12-31").cast("date"))))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("start_date").cast("timestamp").as("start_ts"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    // SO3: semi-join membership (isin / state-pruning shape).
    "q14_semi_membership" -> ((s, dir) => {
      val highOrders = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      t(s, dir, "customer")
        .join(highOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),
    // SO1/SO2: union-distinct then except (append + difference semantics).
    "q15_union_except" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val a = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val b = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val excl = o.filter(col("o_totalprice") > 250000)
        .select(col("o_custkey").as("custkey"))
      a.union(b).distinct().except(excl).orderBy(col("custkey"))
    }),
    // J4 without an equi-key: overlapping value bands × event values via
    // the binned range join (RangeJoinOps) — a hash join on the bin grid
    // instead of the nested-loop Spark would otherwise plan; the
    // residual BETWEEN decides membership exactly, so the grid never
    // affects results. 100 bands [5i, 5i+25] (5× overlap), binWidth 25.
    "q80_banded_join" -> ((s, dir) => {
      val bands = s.range(100).select(col("id").as("band_id"),
        (col("id") * 5).cast("double").as("lo"),
        (col("id") * 5 + 25).cast("double").as("hi"))
      graft.functions.RangeJoinOps.pointInInterval(
          t(s, dir, "events").select(col("event_id"), col("value")),
          "value", bands, "lo", "hi", binWidth = 25.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_value"))
        .orderBy(col("band_id"))
    })
  )

  /** TPC-H Q3-shaped shipping-priority query, runnable verbatim by both
    * Spark SQL and DuckDB (decimal-sum + double-cast parity rules). */
  val shippingPrioritySql: String =
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "q8_sql_surface" -> shippingPrioritySql,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_incremental_bounds" ->
      """SELECT max(o_orderdate) AS max_date, min(o_orderdate) AS min_date,
        |  max(o_orderkey) AS max_key, COUNT(*) AS n_rows FROM orders""".stripMargin,
    "q3_last_per_entity" ->
      """SELECT o_custkey, last_orderkey, last_orderdate FROM (
        |  SELECT o_custkey, o_orderkey AS last_orderkey, o_orderdate AS last_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q4_group_count" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_orderstatus) AS n_status
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q5_hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q6_distinct_partitions" ->
      """SELECT DISTINCT EXTRACT(year FROM o_orderdate) AS ano,
        |  EXTRACT(month FROM o_orderdate) AS mes
        |FROM orders ORDER BY ano, mes""".stripMargin,
    // q9/q68 self-checks: DuckDB recomputes the EXACT counts (hash
    // anchors) and pins the in-bound flags — Spark's estimate straying
    // past its error bound flips a flag and fails the hash
    "q9_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  CAST(1 AS INT) AS parts_in_bound, CAST(1 AS INT) AS orders_in_bound
        |FROM lineitem""".stripMargin,
    "q68_hll_sketch" ->
      """SELECT count(DISTINCT o_custkey) AS exact_customers,
        |  CAST(1 AS INT) AS est_in_bound
        |FROM orders""".stripMargin,
    "q7_newest_event" ->
      """SELECT max(greatest(value, CAST(event_id AS DOUBLE))) AS max_val,
        |  max(ts) AS max_ts FROM events""".stripMargin,
    "q65_asof_join" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC NULLS LAST,
        |               o.o_orderkey DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q10_state_join" ->
      """WITH state AS (
        |  SELECT user_id, max(ts) AS last_update FROM events
        |  WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.ts
        |FROM events e LEFT JOIN state s ON e.user_id = s.user_id
        |WHERE s.last_update IS NULL OR e.ts > s.last_update
        |ORDER BY e.event_id""".stripMargin,
    "q11_new_keys_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q12_capture_gaps" ->
      """WITH spine AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
        |    TIMESTAMP '2024-01-05 23:59:00', INTERVAL 1 MINUTE)) AS minute),
        |seen AS (SELECT DISTINCT date_trunc('minute', ts) AS minute FROM events)
        |SELECT spine.minute FROM spine
        |WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.minute = spine.minute)
        |ORDER BY minute LIMIT 90""".stripMargin,
    "q13_validity_range_join" ->
      """WITH feed AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_date,
        |    CASE WHEN o_orderstatus = 'O' THEN NULL
        |         ELSE CAST(o_orderdate AS DATE) + 90 END AS end_date
        |  FROM orders)
        |SELECT l_orderkey, l_linenumber, CAST(start_date AS TIMESTAMP) AS start_ts
        |FROM lineitem JOIN feed ON l_orderkey = o_orderkey
        |  AND CAST(l_shipdate AS DATE) BETWEEN start_date
        |      AND COALESCE(end_date, DATE '2999-12-31')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q14_semi_membership" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q15_union_except" ->
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        |ORDER BY custkey""".stripMargin,
    "q80_banded_join" ->
      """WITH bands AS (
        |  SELECT i AS band_id, CAST(i * 5 AS DOUBLE) AS lo,
        |    CAST(i * 5 + 25 AS DOUBLE) AS hi
        |  FROM range(0, 100) r(i))
        |SELECT band_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN bands ON value BETWEEN lo AND hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin
  )
}
