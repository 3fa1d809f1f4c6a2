package graft.connectors

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import graft.state.StateStore
import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions.col

/** Unified incremental scan planner (SURVEY §4 "IncrementalPlanner") —
  * the one-call API behind every incremental ingestion in the reference:
  * `format_partitioned_query` (utils/dump_db/tasks.py:182-259) wraps the
  * user query in a CTE and appends `WHERE col >= <last date>`, where the
  * bound is the newest already-landed partition, optionally floored by a
  * symbolic lower bound (`current_year` / `current_month` /
  * `current_day`), with an Oracle `TO_DATE` dialect variant.
  *
  * Composition here: [[StateStore.lastRun]] supplies the last-landed
  * bound, the rewrite produces the dbtable subquery for [[Jdbc.reader]]
  * (the predicate executes inside the source DBMS — that is the JDBC
  * pushdown), and [[incrementalFilter]] is the same plan step for lake
  * re-reads, where Catalyst pushes the comparison into the parquet scan.
  * `today` is always an explicit parameter — determinism over wall-clock.
  */
object IncrementalPlanner {

  final case class Plan(sql: String, lastDate: Option[String]) {
    /** True when a bound was applied (false = full-table first load). */
    def isIncremental: Boolean = lastDate.isDefined
  }

  /** Symbolic lower bounds, resolved against an injected `today`
    * (tasks.py:220-228). Literal dates pass through. */
  def resolveLowerBound(lowerBound: String, today: LocalDate): String =
    lowerBound match {
      case "current_year"  => today.withDayOfYear(1).toString
      case "current_month" => today.withDayOfMonth(1).toString
      case "current_day"   => today.toString
      case literal         => literal
    }

  /** The reference's `min(lower_bound, last_partition)` — both as
    * ISO-formatted strings, so lexicographic min IS chronological min
    * (tasks.py:229-236): a configured floor can only widen the window. */
  def effectiveLastDate(lastPartition: String, lowerBound: Option[String],
                        today: LocalDate): String =
    lowerBound.map(lb => Seq(resolveLowerBound(lb, today), lastPartition).min)
      .getOrElse(lastPartition)

  /** CTE-wrap + bound predicate; `oracle` dialect renders TO_DATE with
    * the translated format (tasks.py:246-259). The CTE alias is fixed
    * (`q`) rather than a uuid — deterministic SQL text is testable and
    * the alias never collides because the user query is enclosed. */
  def rewrite(query: String, partitionColumn: String, lastDate: String,
              dialect: String = "standard",
              dateFormat: String = "%Y-%m-%d"): String = {
    val bound = dialect match {
      case "oracle" =>
        s"TO_DATE('$lastDate', '${oracleFormat(dateFormat)}')"
      case _ => s"'$lastDate'"
    }
    s"WITH q AS ($query) SELECT * FROM q WHERE $partitionColumn >= $bound"
  }

  /** One-call plan: no partition column or no prior state → the query
    * unchanged (full first load, tasks.py:196-208); else the bounded
    * rewrite. */
  def plan(query: String, partitionColumn: Option[String],
           lastPartitionDate: Option[String],
           lowerBoundDate: Option[String] = None,
           dialect: String = "standard", dateFormat: String = "%Y-%m-%d",
           today: LocalDate): Plan =
    (partitionColumn.filter(_.nonEmpty), lastPartitionDate) match {
      case (Some(pc), Some(lp)) =>
        val d = effectiveLastDate(lp, lowerBoundDate, today)
        Plan(rewrite(query, pc, d, dialect, dateFormat), Some(d))
      case _ => Plan(query, None)
    }

  /** %-style → Oracle TO_DATE pattern. Every %-token must translate —
    * passing an untranslated %-format to the DBMS is a deferred
    * ORA-01821 at query time, so unknown tokens fail here instead. */
  def oracleFormat(dateFormat: String): String = {
    val out = dateFormat
      .replace("%Y", "YYYY").replace("%m", "MM").replace("%d", "DD")
      .replace("%H", "HH24").replace("%M", "MI").replace("%S", "SS")
    require(!out.contains('%'),
      s"unsupported %-token in date format '$dateFormat' for the oracle dialect")
    out
  }

  /** %-style → java.time pattern for the supported reference formats. */
  private def javaPattern(dateFormat: String): String =
    dateFormat.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")

  /** Full composition: state → plan → bound JDBC reader. The rewritten
    * query becomes the reader's dbtable subquery, so the incremental
    * WHERE executes inside the source engine. */
  def planFromState(spark: SparkSession, src: JdbcSource, state: StateStore,
                    stateKey: String, partitionColumn: String,
                    dialect: String = "standard",
                    dateFormat: String = "%Y-%m-%d",
                    lowerBoundDate: Option[String] = None,
                    today: LocalDate): (Plan, DataFrameReader) = {
    val last = state.lastRun(stateKey).map(ts =>
      ts.toLocalDateTime.format(
        DateTimeFormatter.ofPattern(javaPattern(dateFormat))))
    val p = plan(src.query, Some(partitionColumn), last, lowerBoundDate,
      dialect, dateFormat, today)
    (p, Jdbc.reader(spark, src.copy(query = p.sql)))
  }

  /** The same plan step against lake tables: a plain comparison Catalyst
    * pushes into the parquet scan (PushedFilters) + partition pruning
    * when `partitionColumn` is a physical partition. */
  def incrementalFilter(df: DataFrame, partitionColumn: String,
                        lastDate: String): DataFrame =
    df.filter(col(partitionColumn) >= lastDate)
}
