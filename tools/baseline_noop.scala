// Plain-Spark re-measurement of the BASELINE.md 10-query suite under the
// engine's EXACT output contract: every query below carries the same
// columns, the same r4 rounding, and the same total ORDER BY as the gated
// engine query it is matched against (round-7 verdict ask #1 -- earlier
// revisions of this file returned leaner, unordered output, so four
// matched rows compared an engine query against a baseline doing strictly
// less work). Identical methodology to graft.Bench: noop-sink write, JIT
// preamble, warm second run timed. Run:
//   /opt/spark/bin/spark-shell --master local[4] \
//     --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     -i tools/baseline_noop.scala < /dev/null 2>/dev/null | grep BASE
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window

val sf = "/root/testdata/sf0.1"
val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
val orders = spark.read.parquet(s"$sf/orders.parquet")
val customer = spark.read.parquet(s"$sf/customer.parquet")
// the fixture's physical ts type has varied across driver generations
// (INT64 nanos-as-long vs TIMESTAMP_NTZ micros); normalize to the BIGINT
// nanos the two events queries assume -- same narrow cast the engine does
val events = {
  val raw = spark.read.parquet(s"$sf/events.parquet")
  raw.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => raw
    case _ => raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
  }
}
val documents = spark.read.parquet(s"$sf/documents.parquet")
val embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

// same 4-decimal rounding the gated engine output carries (functions/Num.r4)
def r4(c: Column): Column = floor(c * 10000 + 0.5) / lit(10000.0)

// engine contract: Queries.q1Pricing -- 7 aliased aggs, r4, total ORDER BY
def q1 = lineitem.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
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

// engine contract: QueriesCore.joinInner -- r4 revenue, deterministic top-10
def q3 = lineitem.filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
  .join(orders.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz")),
    col("l_orderkey") === col("o_orderkey"))
  .join(customer.filter(col("c_mktsegment") === "BUILDING"),
    col("o_custkey") === col("c_custkey"))
  .groupBy("l_orderkey", "o_orderdate")
  .agg(r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
  .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)

// engine contract: QueriesCore.winRank -- 4 columns, total ORDER BY
def winRank = orders
  .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
    row_number().over(Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)).as("rn"))
  .filter(col("rn") <= 3)
  .orderBy("o_custkey", "rn")

// engine contract: QueriesCore.aggApproxDistinct -- per-group HLL + count + sort
def distinctApprox = lineitem.groupBy("l_returnflag")
  .agg(approx_count_distinct("l_partkey").as("approx_parts"),
    count(lit(1)).as("n_rows"))
  .orderBy("l_returnflag")

// engine contract: QueriesCore.aggRollup -- count + r4 sum, NULLS FIRST sort
def rollupQ = orders.rollup("o_orderstatus", "o_orderpriority")
  .agg(count(lit(1)).as("n_orders"), r4(sum("o_totalprice")).as("sum_price"))
  .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

// engine contract: QueriesCore.fnJson -- typed key, count + r4 avg, sort
def jsonExtract = events
  .groupBy(get_json_object(col("props"), "$.k").cast("int").as("k"))
  .agg(count(lit(1)).as("n"), r4(avg("value")).as("avg_value"))
  .orderBy(col("k").asc_nulls_first)

// engine contract: QueriesCore.streamSession -- whole-second event times,
// (user_id, session_start, n_events), total ORDER BY
def sessionWin = events
  .groupBy(session_window(timestamp_seconds(expr("ts div 1000000000")), "1800 seconds"),
    col("user_id"))
  .agg(count(lit(1)).as("n_events"))
  .select(col("user_id"), col("session_window.start").cast("long").as("session_start"),
    col("n_events"))
  .orderBy("user_id", "session_start")

// engine contract: QueriesLLM.dedupExact -- normalized digest, ORDER BY hash
def dedupExact = documents
  .groupBy(md5(lower(trim(col("text")))).as("text_hash"))
  .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
  .orderBy("text_hash")

// engine contract: QueriesLLM.simTopkCosine -- r4 cosine, (cosine, vec_id)
// total order, top-11; query norm precomputed in the broadcast row
def topkCosine = {
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, x) => s + x)
  val q = embeddings.filter(col("vec_id") === 0)
    .select(col("embedding").as("qe"),
      sqrt(aggregate(col("embedding"), lit(0.0),
        (s, x) => s + x.cast("double") * x.cast("double"))).as("qn"))
  embeddings.crossJoin(broadcast(q))
    .select(col("vec_id"),
      r4(dot(col("embedding"), col("qe"))
        / (sqrt(aggregate(col("embedding"), lit(0.0),
            (s, x) => s + x.cast("double") * x.cast("double"))) * col("qn"))).as("cosine"))
    .orderBy(col("cosine").desc, col("vec_id").asc).limit(11)
}

// engine contract: QueriesCore.setUnionAll -- order-key UNION ALL, ORDER BY k
def unionAll = orders
  .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(col("o_orderkey").as("k"))
  .union(orders
    .filter(col("o_orderpriority").isin("2-HIGH", "3-MEDIUM")).select(col("o_orderkey").as("k")))
  .orderBy("k")

val suite: Seq[(String, () => DataFrame)] = Seq(
  "q1_agg_pricing" -> (() => q1), "q3_join3" -> (() => q3),
  "window_rank" -> (() => winRank), "distinct_approx" -> (() => distinctApprox),
  "rollup" -> (() => rollupQ), "json_extract" -> (() => jsonExtract),
  "session_window" -> (() => sessionWin), "dedup_exact" -> (() => dedupExact),
  "topk_cosine" -> (() => topkCosine), "set_union_all" -> (() => unionAll))

// same JIT preamble as graft.Bench: warm scan/agg/join/sort/window code
// paths so the first suite queries aren't taxed for tier-up
for (_ <- 1 to 2) {
  lineitem.filter(col("l_quantity") > 0)
    .groupBy("l_returnflag").agg(sum("l_quantity"), approx_count_distinct("l_partkey"))
    .orderBy("l_returnflag").write.format("noop").mode("overwrite").save()
  lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
    .select(col("o_custkey"),
      row_number().over(Window.partitionBy("o_custkey").orderBy("l_orderkey")).as("rk"))
    .filter(col("rk") <= 2).write.format("noop").mode("overwrite").save()
}

var total = 0.0
suite.foreach { case (name, f) =>
  f().write.format("noop").mode("overwrite").save() // warm-up
  val t0 = System.nanoTime()
  f().write.format("noop").mode("overwrite").save()
  val t = (System.nanoTime() - t0) / 1e9
  total += t
  println(f"BASE $name%-18s $t%8.3f")
}
println(f"BASE total $total%8.3f")
System.exit(0)
