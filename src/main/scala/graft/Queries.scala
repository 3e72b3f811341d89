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

  /** dashboard_uploads_monthly: the reference wiki's uploads-over-time
    * graph shape (`copy_from_template.py:343-356` — a time-bucketed count
    * over the provisioned view's `exportedOn`-shaped column), on the
    * fixture's order stream: monthly volume + revenue. `date_trunc` is
    * dialect-portable (Spark and DuckDB agree on 'month'/TIMESTAMP→
    * TIMESTAMP; the DATE cast normalizes the physical value for the hash
    * gate). Scale: ~84 output groups regardless of input rows — the
    * shuffle ships partial aggregates only. */
  val dashboardUploadsMonthlyText: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  count(*) AS n_orders,
      |  floor(sum(o_totalprice) * 10000 + 0.5) / 10000 AS revenue
      |FROM orders
      |GROUP BY 1
      |ORDER BY month""".stripMargin

  def dashboardUploadsMonthly(spark: SparkSession, dir: String): DataFrame =
    SqlFrontEnd.run(spark, dir, dashboardUploadsMonthlyText)

  /** dashboard_study_rollup: the per-study assessment rollup graph — the
    * reference provisions one parquet dataset per (app, study) and its
    * wiki graphs aggregate per study (`copy_from_template.py:14-16`). The
    * fixture analogue is the documents corpus's `source` (the study axis)
    * × `lang` (the assessment axis) with a ROLLUP subtotal row per
    * source, exactly the drill-down a dashboard pivot renders. */
  val dashboardStudyRollupText: String =
    """SELECT source, lang, count(*) AS n_docs,
      |  floor(avg(n_chars) * 10000 + 0.5) / 10000 AS avg_chars
      |FROM documents
      |GROUP BY ROLLUP (source, lang)
      |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin

  def dashboardStudyRollup(spark: SparkSession, dir: String): DataFrame =
    SqlFrontEnd.run(spark, dir, dashboardStudyRollupText)

  /** dashboard_segment_geo: the cross-entity graph — share of customers
    * and balance by market segment × nation (the view-join shape of the
    * reference's annotated file view: study metadata joined onto rows).
    * Small-dim join: nation broadcasts in Spark; DuckDB hash-joins — same
    * rows either way. */
  val dashboardSegmentGeoText: String =
    """SELECT c_mktsegment, n_name,
      |  count(*) AS n_cust,
      |  floor(sum(c_acctbal) * 10000 + 0.5) / 10000 AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY c_mktsegment, n_name
      |ORDER BY c_mktsegment, n_name""".stripMargin

  def dashboardSegmentGeo(spark: SparkSession, dir: String): DataFrame =
    SqlFrontEnd.run(spark, dir, dashboardSegmentGeoText)

  /** dashboard_fileview: the reference's ACTUAL dashboard wiring run
    * end-to-end (round-8 verdict ask #7) — its graphs query the
    * provisioned FILE VIEW, not the data files directly
    * (`copy_from_template.py:14-16`, `default.yaml:5-10`), so this row
    * joins the two halves that were previously only green separately:
    * the DSv2 file-manifest scan
    * ([[graft.sources.v2.FileManifestSource]] — the view) resolves the
    * scope's parquet tables, and the normal table reader supplies their
    * row counts. Output projects only host-path-free columns
    * (table_name, n_files, n_rows) — deterministic across machines;
    * rows-only (DuckDB cannot list files), with exact-value assertions
    * in FileManifestSpec. The `ext = 'parquet'` predicate is pushed
    * INTO the manifest walk (pruned files never become rows) and both
    * halves aggregate before the tiny join. */
  def dashboardFileview(spark: SparkSession, dir: String): DataFrame = {
    // flat fixture dirs hold loose <table>.parquet files (dir = "");
    // synth slices hold <table>.parquet/part-*.parquet directories
    val tableName = when(col("dir") === "",
        regexp_replace(col("name"), "\\.parquet$", ""))
      .otherwise(regexp_replace(col("dir"), "\\.parquet$", ""))
    val files = spark.read.format("graft.sources.v2.FileManifestSource").load(dir)
      .filter(col("ext") === "parquet")
      .select(tableName.as("table_name"))
      .groupBy("table_name").agg(count(lit(1)).as("n_files"))
    def rowsOf(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("table_name"))
        .groupBy("table_name").agg(count(lit(1)).as("n_rows"))
    val rows = rowsOf("orders", Tables.orders(spark, dir))
      .unionAll(rowsOf("lineitem", Tables.lineitem(spark, dir)))
      .unionAll(rowsOf("documents", Tables.documents(spark, dir)))
    files.join(rows, Seq("table_name")).orderBy("table_name")
  }

  /** Registry: name -> (spark, sfDir) => DataFrame. */
  val all: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.all ++ QueriesLLM.all ++ QueriesStreaming.all ++
      QueriesAnalytics.all ++ Map(
      "q1_pricing" -> (q1Pricing _),
      "sql_dashboard" -> (sqlDashboard _),
      "dashboard_uploads_monthly" -> (dashboardUploadsMonthly _),
      "dashboard_study_rollup" -> (dashboardStudyRollup _),
      "dashboard_segment_geo" -> (dashboardSegmentGeo _),
      "dashboard_fileview" -> (dashboardFileview _)
    )

  /** Registry: name -> DuckDB oracle SQL (subset of `all`'s keys). */
  val oracles: Map[String, String] =
    QueriesCore.oracles ++ QueriesLLM.oracles ++ QueriesAnalytics.oracles ++
      QueriesStreaming.oracles ++ Map(
      "q1_pricing" -> q1PricingSql,
      "sql_dashboard" -> sqlDashboardText,
      "dashboard_uploads_monthly" -> dashboardUploadsMonthlyText,
      "dashboard_study_rollup" -> dashboardStudyRollupText,
      "dashboard_segment_geo" -> dashboardSegmentGeoText
    )
}
