package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinNative
import graft.functions.TimeOps

/** The native (LogicalPlan+Strategy+Exec) as-of join must agree with the
  * composed union-window implementation everywhere. */
class AsOfNativeSpec extends SparkTestBase {
  import spark.implicits._

  test("native asOf on crafted edges: inclusive time, per-key isolation, no-match nulls") {
    val left = Seq((1L, 10L), (1L, 20L), (2L, 15L), (3L, 5L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 19L, "c"), (2L, 16L, "x"))
      .toDF("k", "rt", "payload")
    val out = AsOfJoinNative.asOf(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .orderBy("k", "t").collect()
    assert(out.map(r => Option(r.getString(2)).orNull).toSeq == Seq("b", "c", null, null))
  }

  test("NULL right times never match (both variants) — SQL `rt <= t` semantics") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    // the null-time row sorts first under natural ascending order and
    // would otherwise be consumed as a "valid" as-of match
    val right = Seq((1L, Option.empty[Long], "poison"), (1L, Some(5L), "ok"))
      .toDF("k", "rt", "payload")
    val native = AsOfJoinNative.asOf(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .select("payload").collect().map(_.getString(0))
    val composed = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .select("payload").collect().map(_.getString(0))
    assert(native.toSeq == Seq("ok"))
    assert(composed.toSeq == Seq("ok"))
    // and a right side with ONLY null times yields no match, not a poison row
    val onlyNull = Seq((1L, Option.empty[Long], "poison")).toDF("k", "rt", "payload")
    assert(AsOfJoinNative.asOf(left, onlyNull, Seq("k"), "t", "rt", Seq("payload"))
      .select("payload").collect().head.isNullAt(0))
  }

  test("native asOf equals union-window asOf on the full events table") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", TimeOps.nsToUs(col("ts")))
    val purchases = ev.filter($"event_type" === "purchase").select("event_id", "user_id", "ts_us")
    val views = ev.filter($"event_type" === "view").select($"user_id", $"ts_us".as("view_ts_us"))
    val native = AsOfJoinNative.asOf(purchases, views, Seq("user_id"), "ts_us", "view_ts_us", Seq("view_ts_us"))
      .select($"event_id", $"view_ts_us".as("p"))
    val composed = AsOfJoin.asOf(purchases, views, Seq("user_id"), "ts_us", "view_ts_us", Seq("view_ts_us"))
      .select($"event_id", $"view_ts_us".as("p"))
    assert(native.count() == purchases.count())
    val diff = native.as("a").join(composed.as("b"), Seq("event_id"))
      .filter(!($"a.p" <=> $"b.p"))
    assert(diff.count() == 0)
  }

  test("native asOf plans one shuffle per side and no window operator") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "rt", "v")
    val plan = AsOfJoinNative.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
