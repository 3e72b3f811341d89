// Plain-Spark re-measurement of the BASELINE.md 10-query suite with the
// round-2 bench action (noop-sink write) so the engine/baseline comparison
// uses ONE methodology. Run:
//   /opt/spark/bin/spark-shell --master local[4] \
//     --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     -i tools/baseline_noop.scala < /dev/null 2>/dev/null | grep BASE
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

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

def q1 = lineitem.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
  .groupBy("l_returnflag", "l_linestatus")
  .agg(sum("l_quantity"), sum("l_extendedprice"),
    sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
    avg("l_quantity"), avg("l_extendedprice"), avg("l_discount"), count(lit(1)))
  .orderBy("l_returnflag", "l_linestatus")

def q3 = lineitem.filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
  .join(orders.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz")),
    col("l_orderkey") === col("o_orderkey"))
  .join(customer.filter(col("c_mktsegment") === "BUILDING"),
    col("o_custkey") === col("c_custkey"))
  .groupBy("l_orderkey", "o_orderdate")
  .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)

def winRank = {
  import org.apache.spark.sql.expressions.Window
  val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
  orders.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
}

def distinctApprox = lineitem.agg(approx_count_distinct("l_partkey"))

def rollupQ = orders.rollup("o_orderstatus", "o_orderpriority")
  .agg(sum("o_totalprice"))

def jsonExtract = events
  .withColumn("k", get_json_object(col("props"), "$.k"))
  .groupBy("k").agg(count(lit(1)), avg("value"))

def sessionWin = events
  .withColumn("tsx", timestamp_micros(expr("ts div 1000")))
  .groupBy(session_window(col("tsx"), "30 minutes"), col("user_id"))
  .agg(count(lit(1)))

def dedupExact = documents.groupBy(md5(col("text").cast("binary")))
  .agg(min("doc_id"), count(lit(1)))

def topkCosine = {
  val q = embeddings.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
  embeddings.crossJoin(broadcast(q))
    .select(col("vec_id"),
      (aggregate(zip_with(col("embedding"), col("qe"),
        (a, b) => a.cast("double") * b.cast("double")), lit(0.0), (s, x) => s + x)
        / (sqrt(aggregate(col("embedding"), lit(0.0),
            (s, x) => s + x.cast("double") * x.cast("double")))
          * sqrt(aggregate(col("qe"), lit(0.0),
            (s, x) => s + x.cast("double") * x.cast("double"))))).as("cosine"))
    .orderBy(col("cosine").desc, col("vec_id").asc).limit(11)
}

def asofUnion = {
  val a = orders.select("o_orderkey")
  val b = orders.filter(col("o_orderkey") % 15 =!= 0).select("o_orderkey")
  a.union(b).except(b.limit(10))
}

val suite: Seq[(String, () => DataFrame)] = Seq(
  "q1_agg_pricing" -> (() => q1), "q3_join3" -> (() => q3),
  "window_rank" -> (() => winRank), "distinct_approx" -> (() => distinctApprox),
  "rollup" -> (() => rollupQ), "json_extract" -> (() => jsonExtract),
  "session_window" -> (() => sessionWin), "dedup_exact" -> (() => dedupExact),
  "topk_cosine" -> (() => topkCosine), "asof_union" -> (() => asofUnion))

// same JIT preamble as graft.Bench: warm scan/agg/join/sort/window code
// paths so the first suite queries aren't taxed for tier-up
for (_ <- 1 to 2) {
  import org.apache.spark.sql.expressions.Window
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
