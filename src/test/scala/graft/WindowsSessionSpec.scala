package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Sessionize, Windows}
import graft.functions.TimeOps

class WindowsSessionSpec extends SparkTestBase {
  import spark.implicits._

  test("topNPerGroup ranks within [1, n] and respects ordering") {
    val out = Windows.topNPerGroup(Tables.orders(spark, sf),
      Seq($"o_custkey"), Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
    assert(out.agg(max("rn")).head.getInt(0) <= 3)
    val perGroup = out.groupBy("o_custkey").count()
    assert(perGroup.agg(max("count")).head.getLong(0) <= 3)
    // rank 1 really is the max price in its group
    val r1 = out.filter($"rn" === 1).select($"o_custkey", $"o_totalprice".as("p1"))
    val mx = Tables.orders(spark, sf).groupBy("o_custkey").agg(max("o_totalprice").as("pm"))
    assert(r1.join(mx, "o_custkey").filter($"p1" =!= $"pm").count() == 0)
  }

  test("runningSum final value equals the group total") {
    val run = Windows.runningSum(Tables.orders(spark, sf),
      Seq($"o_custkey"), Seq($"o_orderdate".asc, $"o_orderkey".asc), $"o_totalprice", "run")
    val last = run.withColumn("rn", row_number().over(
        Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)))
      .filter($"rn" === 1).select($"o_custkey", $"run")
    val tot = Tables.orders(spark, sf).groupBy("o_custkey").agg(sum("o_totalprice").as("tot"))
    val bad = last.join(tot, "o_custkey").filter(abs($"run" - $"tot") > 1e-6)
    assert(bad.count() == 0)
  }

  test("lagDelta: deltas are null-first and non-negative under time order") {
    val d = Windows.lagDelta(Tables.events(spark, sf),
      Seq($"user_id"), Seq($"ts".asc, $"event_id".asc), $"ts", "delta")
    assert(d.filter($"delta" < 0).count() == 0)
    // exactly one null delta per user (the first event)
    val nulls = d.filter($"delta".isNull).groupBy("user_id").count()
    assert(nulls.filter($"count" =!= 1).count() == 0)
  }

  test("session_window matches gaps-and-islands recomputation") {
    val ev = Tables.events(spark, sf)
    val viaNative = Sessionize.sessions(ev, $"ts", 1800, $"user_id")
      .select("user_id", "session_start", "n_events")
    val sec = TimeOps.nsToSec($"ts")
    val w = Window.partitionBy($"user_id").orderBy($"sec")
    val islands = ev.select($"user_id", sec.as("sec"))
      .withColumn("new_s", when(lag($"sec", 1).over(w).isNull
        || $"sec" - lag($"sec", 1).over(w) >= 1800, 1).otherwise(0))
      .withColumn("sid", sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("sec").as("session_start"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
    assert(viaNative.exceptAll(islands).count() == 0)
    assert(islands.exceptAll(viaNative).count() == 0)
  }

  test("tumbling window counts sum to total event count") {
    val t = Sessionize.tumbling(Tables.events(spark, sf), $"ts", 3600, Seq($"event_type"), $"value")
    assert(t.agg(sum("n_events")).head.getLong(0) == Tables.events(spark, sf).count())
  }

  test("sliding windows hold width/slide copies of each event") {
    val s = Sessionize.sliding(Tables.events(spark, sf), $"ts", 3600, 900, Seq.empty)
    assert(s.agg(sum("n_events")).head.getLong(0) == 4 * Tables.events(spark, sf).count())
  }
}
