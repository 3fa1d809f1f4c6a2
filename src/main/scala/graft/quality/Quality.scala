package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative data-quality checks (SURVEY §2.5 A7, §5).
  *
  * The reference's `perform_check` contract (rj_smtr/utils.py:1139-1205):
  * a parameterized SQL statement whose EMPTY result means PASS; offending
  * rows are the failure report. Check suites are wired per table with
  * `{start_timestamp}`-style vars (rj_smtr/constants.py:170-330).
  */
final case class Check(name: String, description: String, sql: String)

final case class CheckResult(name: String, passed: Boolean, nOffending: Long,
                             sample: Seq[String])

object Quality {

  /** `{{var}}` template substitution (same shape as the reference's
    * `.format(**params)` templating, without positional surprises). */
  def render(sql: String, vars: Map[String, String]): String =
    vars.foldLeft(sql) { case (acc, (k, v)) => acc.replace(s"{{$k}}", v) }

  /** Offending-rows frame → result; limit(k).collect keeps the failure
    * report driver-safe at any scale. Single-sourced for SQL checks and
    * [[SchemaTests]] alike. */
  private[graft] def offendingResult(name: String, df: DataFrame): CheckResult = {
    val sample = df.limit(5).collect().map(_.toString).toIndexedSeq
    val n = if (sample.isEmpty) 0L else df.count()
    CheckResult(name, passed = n == 0, nOffending = n, sample = sample)
  }

  def run(spark: SparkSession, check: Check,
          vars: Map[String, String] = Map.empty): CheckResult =
    offendingResult(check.name, spark.sql(render(check.sql, vars)))

  def runAll(spark: SparkSession, checks: Seq[Check],
             vars: Map[String, String] = Map.empty): Seq[CheckResult] =
    checks.map(run(spark, _, vars))

  /** dbt's four canonical schema tests (the generic tests the
    * reference's dbt models declare in schema.yml: unique, not_null,
    * accepted_values, relationships), as offending-row frames —
    * empty = pass, same contract as [[Check]]. All are single
    * aggregations/anti-joins: partial-agg + one shuffle at any scale. */
  object SchemaTests {
    import org.apache.spark.sql.functions._

    /** Rows whose key occurs more than once. */
    def unique(df: DataFrame, cols: Seq[String]): DataFrame =
      df.groupBy(cols.map(col): _*).count().filter(col("count") > 1)

    /** Rows with a NULL in the column. */
    def notNull(df: DataFrame, column: String): DataFrame =
      df.filter(col(column).isNull)

    /** Rows whose value is outside the accepted set. NULLs pass — dbt's
      * accepted_values is a NOT IN whose three-valued logic drops NULL
      * rows; declare [[notNull]] separately to reject them, as dbt does. */
    def acceptedValues(df: DataFrame, column: String,
                       values: Seq[String]): DataFrame =
      df.filter(col(column).isNotNull &&
        !col(column).cast("string").isin(values: _*))

    /** Referential integrity: child keys with no matching parent key. */
    def relationships(child: DataFrame, childCol: String,
                      parent: DataFrame, parentCol: String): DataFrame =
      child.filter(col(childCol).isNotNull)
        .join(parent.select(col(parentCol).as(childCol)).distinct(),
          Seq(childCol), "left_anti")

    /** Run one offending-rows frame as a [[CheckResult]]. */
    def asResult(name: String, offending: DataFrame): CheckResult =
      offendingResult(name, offending)
  }

  /** The reference's three subsidy-pipeline checks, re-shaped onto our
    * lake/testdata tables (rj_smtr/constants.py:170-330; see FIXTURES §10).
    * Views `events_v` / `logs_v` are expected registered by the caller. */
  val referenceChecks: Seq[Check] = Seq(
    Check("capture_gaps",
      "minute-spine vs capture log: any minute without a success is a gap",
      """WITH spine AS (
        |  SELECT explode(sequence(
        |    to_timestamp('{{start_timestamp}}'),
        |    to_timestamp('{{end_timestamp}}'),
        |    INTERVAL 1 MINUTE)) AS minute),
        |ok AS (SELECT DISTINCT date_trunc('minute', timestamp_captura) AS minute
        |  FROM logs_v WHERE sucesso = true)
        |SELECT spine.minute FROM spine LEFT ANTI JOIN ok USING (minute)""".stripMargin),
    Check("raw_vs_treated_counts",
      "per-hour raw vs treated row counts must match within threshold",
      """WITH raw AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n_raw
        |  FROM events_v GROUP BY 1),
        |treated AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n_treated
        |  FROM treated_v GROUP BY 1)
        |SELECT raw.h, n_raw, coalesce(n_treated, 0) AS n_treated
        |FROM raw LEFT JOIN treated USING (h)
        |WHERE coalesce(n_treated, 0) * 100 < n_raw * {{min_pct}}""".stripMargin),
    Check("validity_window",
      "every processed row must fall inside an open validity window",
      """SELECT e.* FROM events_v e
        |LEFT JOIN feed_v f
        |  ON e.ts BETWEEN f.feed_start_date
        |     AND coalesce(f.feed_end_date, to_timestamp('2999-12-31'))
        |WHERE f.feed_start_date IS NULL""".stripMargin)
  )
}
