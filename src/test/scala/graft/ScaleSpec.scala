package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Bucketing

/** Scale-strategy operators: bucketed co-located joins (no exchange) and
  * salted skew joins (equal results, spread keys). */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join plans with zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously-failed run can leave an orphaned location behind
    import scala.reflect.io.Directory
    Seq("b_orders", "b_lineitem").foreach(t =>
      new Directory(new java.io.File(s"spark-warehouse/$t")).deleteRecursively())
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8,
      sortBy = Some("o_orderkey"))
    Bucketing.writeBucketed(Tables.lineitem(spark, sf), "b_lineitem", "l_orderkey", 8,
      sortBy = Some("l_orderkey"))
    // force the non-broadcast plan (at real scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the plain join result") {
    val big = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_linenumber", $"l_suppkey")
    val small = Tables.supplier(spark, sf)
    val plain = big.join(small, $"l_suppkey" === $"s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"s_suppkey")
    val salted = Skew.saltedJoin(big, small, "l_suppkey", "s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"s_suppkey")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted aggregation equals direct aggregation") {
    val direct = Tables.events(spark, sf).groupBy($"user_id".as("key"))
      .agg(sum("value").as("sum_value"))
    val salted = Skew.saltedSum(Tables.events(spark, sf), $"user_id", $"value")
    val joined = direct.as("d").join(salted.as("s"), Seq("key"))
      .filter(abs($"d.sum_value" - $"s.sum_value") > 1e-6)
    assert(joined.count() == 0)
  }
}
