package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Audited filters (SURVEY §2.3 P3/P4).
  *
  * The reference logs how many rows each predicate/null filter removes and
  * warns when a "critical subset" is affected (rj_smtr/utils.py:372-465).
  * We compute kept/removed/critical-removed in ONE aggregation pass using
  * conditional counts — no cache + double scan.
  */
object AuditedFilter {

  final case class Audit(total: Long, kept: Long, removed: Long, criticalRemoved: Long)

  /** Single-pass audit of `keep` predicate; `critical` marks the subset
    * whose removal should page someone. */
  def audit(df: DataFrame, keep: Column, critical: Column = lit(false)): Audit = {
    val row = df.agg(
      count(lit(1)).as("total"),
      count(when(keep, 1)).as("kept"),
      count(when(!keep, 1)).as("removed"),
      count(when(!keep && critical, 1)).as("critical_removed")).head()
    Audit(row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  /** P3: filter with audit — returns the kept frame plus counts. The audit
    * aggregation and the kept scan share the source; at scale prefer
    * `tagged` + a single write that splits on the flag. */
  def filterWithAudit(df: DataFrame, keep: Column,
                      critical: Column = lit(false)): (DataFrame, Audit) =
    (df.filter(keep), audit(df, keep, critical))

  /** P4: null filter on required columns, audited. */
  def dropNulls(df: DataFrame, cols: Seq[String],
                critical: Column = lit(false)): (DataFrame, Audit) = {
    val keep = cols.map(col(_).isNotNull).reduce(_ && _)
    filterWithAudit(df, keep, critical)
  }
}
