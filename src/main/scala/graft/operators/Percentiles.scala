package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact DISCRETE percentiles from the value-count distribution.
  *
  * Spark's built-in `percentile` is exact but buffers every value per
  * group in the aggregation buffer — memory O(group size), the thing
  * that OOMs at 100 TB. For discrete domains (quantities, ratings,
  * token counts, star levels) the scalable shape is the COUNT
  * DISTRIBUTION: the only full-data pass is a partial-aggregated
  * groupBy moving (group, value, count) — O(distinct values) rows per
  * group — after which two windows over the tiny distribution and one
  * final aggregate pick every requested quantile at once. Memory per
  * task is bounded by the value domain, never by row count.
  *
  * Semantics are SQL `PERCENTILE_DISC(p)` = DuckDB `quantile_disc`:
  * the smallest value whose cumulative count reaches `ceil(p·n)`
  * (1-based). Both engines compute `p·n` in IEEE double, so boundary
  * behavior agrees bit-for-bit (oracle-gated as `agg_percentile_disc`).
  */
object Percentiles {

  /** One output row per group: `groupCols ++ probs.map(_._1)`, where
    * each named prob column holds that exact discrete percentile of
    * `valueCol`. */
  def exactDiscrete(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty, "need at least one (name, prob)")
    val g = groupCols.map(col)
    val counts = df.groupBy(g :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__cnt"))
    val cum = counts
      .withColumn("__cum",
        sum("__cnt").over(Window.partitionBy(g: _*).orderBy(col(valueCol))))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(g: _*)))
    val picks = probs.map { case (name, p) => pick(valueCol, p).as(name) }
    cum.groupBy(g: _*).agg(picks.head, picks.tail: _*)
  }

  /** Smallest value whose cumulative count reaches ceil(p·n). */
  private def pick(valueCol: String, p: Double): Column =
    min(when(col("__cum") >= ceil(lit(p) * col("__n")), col(valueCol)))
}
