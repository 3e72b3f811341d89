package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.5): rank, analytic lag/lead,
  * ROWS and RANGE frames.
  *
  * Scale notes: a window is one shuffle on its partition keys plus a
  * per-partition sort. The hazard at 100 TB is a *skewed or empty*
  * partitionBy (whole-table windows serialize onto one task) — every
  * helper here requires explicit partition keys. Running/rolling frames
  * are O(1) per row in Spark's `WindowExec` for sum/count/avg.
  */
object Windows {

  /** Top-n rows per group by `order` (deterministic: include a unique
    * tie-breaker in `order`). row_number over (partition, order) <= n. */
  def topNPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column], n: Int, rankCol: String = "rn"): DataFrame =
    df.withColumn(rankCol, row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*)))
      .filter(col(rankCol) <= n)

  /** Per-row delta vs previous row in the partition (lag). */
  def lagDelta(df: DataFrame, partition: Seq[Column], order: Seq[Column], value: Column, as: String): DataFrame =
    df.withColumn(as, value - lag(value, 1).over(Window.partitionBy(partition: _*).orderBy(order: _*)))

  /** Running aggregate with ROWS UNBOUNDED PRECEDING .. CURRENT ROW. */
  def runningSum(df: DataFrame, partition: Seq[Column], order: Seq[Column], value: Column, as: String): DataFrame =
    df.withColumn(as, sum(value).over(
      Window.partitionBy(partition: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Trailing value-range frame (e.g. trailing 7 days over epoch seconds):
    * RANGE BETWEEN `preceding` PRECEDING AND CURRENT ROW over a single
    * numeric ordering column. */
  def trailingRangeSum(df: DataFrame, partition: Seq[Column], orderNumeric: Column, preceding: Long, value: Column, as: String): DataFrame =
    df.withColumn(as, sum(value).over(
      Window.partitionBy(partition: _*).orderBy(orderNumeric)
        .rangeBetween(-preceding, Window.currentRow)))
}
