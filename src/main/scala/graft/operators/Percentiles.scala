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

  /** Exact CONTINUOUS (interpolated) percentiles — SQL `PERCENTILE_CONT`
    * = DuckDB `quantile_cont` = Spark `percentile` semantics: with
    * 0-indexed position `pos = p·(n−1)`, interpolate between the sorted
    * values at `floor(pos)` and `ceil(pos)`.
    *
    * Same scale shape as [[exactDiscrete]]: the only full-data pass is
    * the partial-aggregated (group, value, count) groupBy; the sorted
    * walk happens on the distribution (O(distinct) rows), not the data.
    * The value at index i is "the smallest value whose cumulative count
    * reaches i+1", so each quantile needs two conditional mins over the
    * distribution — constant-size buffers, never a per-group value
    * array. Replaces the built-in `percentile` (which buffers every row
    * per group — the thing that OOMs at 100 TB) for exact analytics. */
  def exactContinuous(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty, "need at least one (name, prob)")
    val g = groupCols.map(col)
    val counts = df.groupBy(g :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__cnt"))
    val cum = counts
      .withColumn("__cum",
        sum("__cnt").over(Window.partitionBy(g: _*).orderBy(col(valueCol))))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(g: _*)))
    def pos(p: Double): Column = lit(p) * (col("__n").cast("double") - 1.0)
    val aggs = probs.flatMap { case (name, p) =>
      Seq(
        min(when(col("__cum") >= floor(pos(p)) + 1, col(valueCol))).as(s"__lo_$name"),
        min(when(col("__cum") >= ceil(pos(p)) + 1, col(valueCol))).as(s"__hi_$name"))
    } :+ max("__n").as("__n")
    val picked = cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    val outs = probs.map { case (name, p) =>
      val fr = pos(p) - floor(pos(p))
      (col(s"__lo_$name") +
        fr * (col(s"__hi_$name").cast("double") - col(s"__lo_$name").cast("double")))
        .as(name)
    }
    picked.select(g ++ outs: _*)
  }
}
