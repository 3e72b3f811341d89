package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num.r4

/** Named operator queries (SURVEY.md §2) + their DuckDB oracle SQL.
  *
  * Conventions (SURVEY.md §7.4, applied to every oracle-gated query):
  *  - results end in a total ORDER BY over a provably-unique key set;
  *  - DOUBLE aggregates are `r4(x)` on both sides;
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
        r4(sum("l_quantity")).as("sum_qty"),
        r4(sum("l_extendedprice")).as("sum_base_price"),
        r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        r4(avg("l_quantity")).as("avg_qty"),
        r4(avg("l_extendedprice")).as("avg_price"),
        r4(avg("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  floor((sum(l_quantity)) * 10000 + 0.5) / 10000 AS sum_qty,
      |  floor((sum(l_extendedprice)) * 10000 + 0.5) / 10000 AS sum_base_price,
      |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 10000 + 0.5) / 10000 AS sum_disc_price,
      |  floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
      |  floor((avg(l_extendedprice)) * 10000 + 0.5) / 10000 AS avg_price,
      |  floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** sql_dashboard: the reference's THIRD entry point — wiki dashboards
    * whose graphs run SQL against the provisioned view (SURVEY §3.3,
    * `copy_from_template.py:14-16, 343-356`) — as a SQL STRING through
    * [[SqlFrontEnd]]. The SAME text is the DuckDB oracle: zero
    * translation between engines is the point of the packaging (the
    * dialect-portable determinism rules of §7.4 — explicit casts,
    * half-up `floor` rounding, total ORDER BY — make that possible). */
  val sqlDashboardText: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority,
      |  count(*) AS n_orders,
      |  floor(sum(o_totalprice) * 10000 + 0.5) / 10000 AS revenue
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY yr, o_orderpriority""".stripMargin

  def sqlDashboard(spark: SparkSession, dir: String): DataFrame =
    SqlFrontEnd.run(spark, dir, sqlDashboardText)

  /** Registry: name -> (spark, sfDir) => DataFrame. */
  val all: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.all ++ QueriesLLM.all ++ QueriesStreaming.all ++
      QueriesAnalytics.all ++ Map(
      "q1_pricing" -> (q1Pricing _),
      "sql_dashboard" -> (sqlDashboard _)
    )

  /** Registry: name -> DuckDB oracle SQL (subset of `all`'s keys). */
  val oracles: Map[String, String] =
    QueriesCore.oracles ++ QueriesLLM.oracles ++ QueriesAnalytics.oracles ++ Map(
      "q1_pricing" -> q1PricingSql,
      "sql_dashboard" -> sqlDashboardText
    )
}
