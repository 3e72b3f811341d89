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

  test("both asOf forms preserve a NULL payload FIELD in the winning right row") {
    // right t=2's qty is genuinely NULL: the correct result is the whole
    // t=2 row (price=20, qty=NULL) — per-column ignoreNulls carry would
    // fabricate (20, 2), mixing fields from different right rows
    val left = Seq((1L, 3L)).toDF("k", "t")
    val right = Seq((1L, 1L, Some(10.0), Some(2L)), (1L, 2L, Some(20.0), None))
      .toDF("k", "rt", "price", "qty")
    val expect = Seq((1L, 3L, Some(20.0), Option.empty[Long]))
    val composed = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("price", "qty"))
      .as[(Long, Long, Option[Double], Option[Long])].collect().toSeq
    val native = AsOfJoinNative.asOf(left, right, Seq("k"), "t", "rt", Seq("price", "qty"))
      .as[(Long, Long, Option[Double], Option[Long])].collect().toSeq
    assert(composed === expect)
    assert(native === expect)
  }

  test("both asOf forms never match NULL equi-keys (SQL semantics)") {
    val left = Seq((Option.empty[Long], 5L), (Some(1L), 5L)).toDF("k", "t")
    val right = Seq((Option.empty[Long], 3L, 99.0), (Some(1L), 3L, 7.0))
      .toDF("k", "rt", "v")
    val expect = Set((Option.empty[Long], 5L, Option.empty[Double]),
      (Some(1L), 5L, Some(7.0)))
    val composed = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .as[(Option[Long], Long, Option[Double])].collect().toSet
    val native = AsOfJoinNative.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .as[(Option[Long], Long, Option[Double])].collect().toSet
    assert(composed === expect)
    assert(native === expect)
  }

  test("forward direction: earliest rt >= t, inclusive boundary, no-match null (round 9)") {
    val left = Seq((1L, 10L), (1L, 20L), (2L, 15L), (3L, 5L)).toDF("k", "t")
    val right = Seq((1L, 10L, "eq"), (1L, 12L, "later"), (1L, 19L, "c"), (2L, 14L, "past"))
      .toDF("k", "rt", "payload")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("payload"),
        direction = "forward")
      .orderBy("k", "t").collect()
    // t=10 matches rt=10 (inclusive), t=20 has no later view, k=2's only
    // right is in the past, k=3 has no rights
    assert(out.map(r => Option(r.getString(2)).orNull).toSeq
      == Seq("eq", null, null, null))
  }

  test("tolerance: boundary inclusive, stale state nulled, both directions (round 9)") {
    val left = Seq((1L, 100L), (1L, 200L), (1L, 300L)).toDF("k", "t")
    val right = Seq((1L, 90L, "w90"), (1L, 150L, "w150")).toDF("k", "rt", "payload")
    // backward, tolerance 10: t=100 matches rt=90 exactly at the boundary;
    // t=200 carries rt=150 but 50 > 10 -> null; t=300 likewise
    val back = AsOfJoin.asOfTolerance(left, right, Seq("k"), "t", "rt",
        Seq("payload"), tolerance = 10L)
      .orderBy("t").collect().map(r => Option(r.getString(2)).orNull)
    assert(back.toSeq == Seq("w90", null, null), back.mkString(","))
    // forward, tolerance 50: t=100 -> rt=150 at exactly the boundary;
    // t=200/300 have no future right
    val fwd = AsOfJoin.asOfTolerance(left, right, Seq("k"), "t", "rt",
        Seq("payload"), tolerance = 50L, direction = "forward")
      .orderBy("t").collect().map(r => Option(r.getString(2)).orNull)
    assert(fwd.toSeq == Seq("w150", null, null), fwd.mkString(","))
    // rightTime itself as a payload column: the mask must use the
    // pre-mask verdict (regression guard for the masking order)
    val rtPayload = AsOfJoin.asOfTolerance(left, right, Seq("k"), "t", "rt",
        Seq("rt", "payload"), tolerance = 10L)
      .orderBy("t").collect()
      .map(r => (if (r.isNullAt(2)) null else r.getLong(2).toString,
        Option(r.getString(3)).orNull))
    assert(rtPayload.toSeq == Seq(("90", "w90"), (null, null), (null, null)))
  }

  test("nearest direction: closer side wins, exact tie goes backward, one-sided falls through (round 9)") {
    val left = Seq((1L, 10L), (1L, 55L), (1L, 100L), (1L, 30L), (2L, 5L), (3L, 50L))
      .toDF("k", "t")
    val right = Seq((1L, 0L, "r0"), (1L, 60L, "r60"), (2L, 40L, "r40"))
      .toDF("k", "rt", "payload")
    val out = AsOfJoin.asOfNearest(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .orderBy("k", "t").collect().map(r => Option(r.getString(2)).orNull)
    // (1,10): gaps 10 vs 50 -> r0; (1,30): 30 vs 30 TIE -> backward r0;
    // (1,55): 55 vs 5 -> r60; (1,100): only backward r60;
    // (2,5): only forward r40; (3,50): no right rows at all
    assert(out.toSeq == Seq("r0", "r0", "r60", "r60", "r40", null), out.mkString(","))
    // equal-instant right row sits in the backward frame and wins with gap 0
    val eq = AsOfJoin.asOfNearest(Seq((1L, 60L)).toDF("k", "t"), right,
      Seq("k"), "t", "rt", Seq("payload")).collect().head.getString(2)
    assert(eq == "r60")
  }

  test("nearest plans ONE exchange and ONE sort (both carries share the window order)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "rt", "v")
    val plan = AsOfJoin.asOfNearest(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan)
    val sorts = plan.linesIterator.count(l => l.contains("Sort ") && l.contains("k#"))
    assert(sorts == 1, plan)
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
