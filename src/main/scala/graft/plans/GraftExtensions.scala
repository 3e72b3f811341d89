package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql` users get them
  * too (SURVEY.md §4.3).
  *
  * Cluster deploys attach it with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`; local code
  * can call [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotProductFloatDesc)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private val dotProductFloatDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product_float"),
    new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
    (exprs: Seq[Expression]) => DotProductFloat(exprs(0), exprs(1))
  )

  /** Imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_float", exprs => DotProductFloat(exprs(0), exprs(1)), "built-in")
}
