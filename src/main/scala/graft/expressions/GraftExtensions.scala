package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session extension wiring (SURVEY §4, §7.9).
  *
  * Registers the engine's native expressions in the function registry so
  * they are usable from `spark.sql` text as well as the Column API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // or
  *   spark.sql.extensions=graft.expressions.GraftExtensions      // or
  *   GraftExtensions.install(spark)        // on a live session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.unaccentDescriptor)
    e.injectOptimizerRule(_ => CollapseUnaccent)
  }
}

/** Optimizer rule: unaccent is idempotent, so nested applications
  * collapse to one — the (small) custom-rule surface SURVEY §4 calls
  * for, wired through injectOptimizerRule. */
object CollapseUnaccent
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Unaccent(inner @ Unaccent(_)) => inner
    }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private[expressions] val unaccentDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("unaccent"),
    new ExpressionInfo(classOf[Unaccent].getName, "unaccent"),
    (children: Seq[Expression]) => Unaccent(children.head))

  /** Register on an already-built session (tests, driver-owned builders). */
  def install(spark: SparkSession): Unit = {
    val (_, info, builder) = unaccentDescriptor
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unaccent", builder, "scala_udf")
  }
}
