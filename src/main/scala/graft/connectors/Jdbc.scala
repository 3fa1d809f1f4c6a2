package graft.connectors

import java.sql.Timestamp

import graft.state.StateStore
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC capture sources (SURVEY §2.1 S1–S5) + the incremental planner
  * (SURVEY §4 "IncrementalPlanner").
  *
  * The reference streams cursors with fetchmany(50k)
  * (utils/dump_db/db.py:75-165), paginates with LIMIT/OFFSET
  * (rj_smtr/utils.py:831-910) or keyset bounds from the last captured id
  * (rj_smtr/tasks.py:667-718), and injects an incremental predicate by
  * CTE-wrapping the user query (utils/dump_db/tasks.py:182-259).
  *
  * In Spark all of that collapses to reader options: `fetchsize` replaces
  * fetchmany; `partitionColumn/lowerBound/upperBound/numPartitions`
  * replaces both pagination styles with parallel bound scans; and the
  * incremental predicate is pushed into the source engine through the
  * dbtable subquery.
  */
final case class JdbcSource(url: String, query: String,
                            user: String = "", password: String = "",
                            fetchSize: Int = 50000)

object Jdbc {

  /** CTE-wrap with the incremental lower bound — identical rewrite shape
    * to format_partitioned_query; the WHERE lands in the source DBMS. */
  def incrementalQuery(query: String, dateColumn: String,
                       lastValue: String): String =
    s"WITH q AS ($query) SELECT * FROM q WHERE $dateColumn >= '$lastValue'"

  /** Keyset bounds (S5): id > last captured, id <= current max. */
  def keysetQuery(query: String, idColumn: String,
                  lastId: Long, maxId: Long): String =
    s"WITH q AS ($query) SELECT * FROM q WHERE $idColumn > $lastId AND $idColumn <= $maxId"

  /** Build the reader; `bounds` turns offset pagination into parallel
    * bound partition scans. */
  def reader(spark: SparkSession, src: JdbcSource,
             bounds: Option[(String, Long, Long, Int)] = None): DataFrameReader = {
    val base = spark.read.format("jdbc")
      .option("url", src.url)
      .option("dbtable", s"(${src.query}) q")
      .option("user", src.user)
      .option("password", src.password)
      .option("fetchsize", src.fetchSize)
    bounds.fold(base) { case (col, lo, hi, n) =>
      base.option("partitionColumn", col)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
  }

  /** Incremental capture: plan the window from state, read, return the
    * frame plus the new watermark to commit after a successful write. */
  def incrementalRead(spark: SparkSession, src: JdbcSource, state: StateStore,
                      stateKey: String, dateColumn: String,
                      now: Timestamp): (DataFrame, Timestamp) = {
    val last = state.lastRun(stateKey).getOrElse(state.SeedWatermark)
    val q = incrementalQuery(src.query, dateColumn,
      last.toString.takeWhile(_ != '.'))
    (reader(spark, src.copy(query = q)).load(), now)
  }
}
