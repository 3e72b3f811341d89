package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named operator queries (SURVEY.md §2) + their DuckDB oracle SQL.
  *
  * Conventions (SURVEY.md §7.4, applied to every oracle-gated query):
  *  - results end in a total ORDER BY over a provably-unique key set;
  *  - DOUBLE aggregates are `round(x, 4)` on both sides;
  *  - `events.ts` is BIGINT nanoseconds on the Spark side and
  *    `epoch_ns(ts)` on the DuckDB side;
  *  - every computed column is aliased identically in both dialects.
  */
object Queries {

  /** TPC-H Q1 shape on lineitem — the reference's dashboard-aggregate moment
    * (`src/copy_from_template.py:14-16`): scan → pushed filter → hash agg
    * (partial+final, one shuffle on 2 low-cardinality keys) → sort.
    * Scale: group count is 6 regardless of input rows — the shuffle moves
    * only per-partition partial aggregates; safe at any SF. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Registry: name -> (spark, sfDir) => DataFrame. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (q1Pricing _)
  )

  /** Registry: name -> DuckDB oracle SQL (subset of `all`'s keys). */
  val oracles: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql
  )
}
