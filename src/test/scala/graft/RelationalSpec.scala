package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Relational}

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("exactlyOne returns the single row and rejects 0 / >1") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    assert(Relational.exactlyOne(df.filter($"id" === 1)).getString(1) == "a")
    intercept[IllegalArgumentException](Relational.exactlyOne(df.filter($"id" === 99)))
    intercept[IllegalArgumentException](Relational.exactlyOne(df))
  }

  test("semi ⊎ anti partitions the left input") {
    val left = Tables.customer(spark, sf)
    val right = Tables.orders(spark, sf)
    val semi = left.join(right, $"c_custkey" === $"o_custkey", "left_semi").count()
    val anti = left.join(right, $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(semi + anti == left.count())
  }

  test("asOf attaches the latest right value at or before the left time") {
    val left = Seq((1L, 10L), (1L, 20L), (2L, 15L), (3L, 5L))
      .toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 19L, "c"), (2L, 16L, "x"))
      .toDF("k", "rt", "payload")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .orderBy("k", "t").collect()
    // k=1,t=10 -> "b" (rt=10 inclusive); k=1,t=20 -> "c"; k=2,t=15 -> null (16>15); k=3 -> null
    assert(out.map(r => Option(r.getString(2)).orNull).toSeq == Seq("b", "c", null, null))
  }

  test("asOf tie-break picks the greatest tiebreak column at equal (key, time)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1L, "low"), (1L, 10L, 9L, "high"), (1L, 10L, 5L, "mid"))
      .toDF("k", "rt", "seq", "payload")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("payload"),
      rightTieBreak = Some("seq")).collect()
    assert(out.head.getString(2) == "high")
  }

  test("asOf equals the brute-force max-subquery semantics on real data") {
    val q = QueriesCore.joinAsof(spark, sf)
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", graft.functions.TimeOps.nsToUs(col("ts")))
    val p = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts_us")
    val v = ev.filter($"event_type" === "view").select($"user_id".as("vu"), $"ts_us".as("vts"))
    val brute = p.join(v, $"user_id" === $"vu" && $"vts" <= $"ts_us", "left_outer")
      .groupBy("event_id").agg(max("vts").as("prev_view_us"))
    val joined = q.select("event_id", "prev_view_us").as("a")
      .join(brute.as("b"), Seq("event_id"))
      .filter(!($"a.prev_view_us" <=> $"b.prev_view_us"))
    assert(joined.count() == 0)
  }

  test("topk equals sort-take") {
    val df = Tables.lineitem(spark, sf)
    val viaTopK = Relational.topK(df, 5, $"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
      .select("l_orderkey", "l_linenumber").collect().toSeq
    val viaSort = df.orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
      .select("l_orderkey", "l_linenumber").take(5).toSeq
    assert(viaTopK == viaSort)
  }

  test("interval join counts only overlapping pairs") {
    val o = Seq((1L, 1L, "2020-01-01"), (1L, 2L, "2020-01-15"), (1L, 3L, "2020-03-01"))
      .toDF("k", "id", "d")
      .withColumn("d", to_timestamp($"d"))
    val a = o.as("a"); val b = o.as("b")
    val out = Relational.joinInterval(a, b, Seq("k"),
      col("a.id") < col("b.id") &&
        col("a.d") < col("b.d") + expr("INTERVAL 30 DAYS") &&
        col("b.d") < col("a.d") + expr("INTERVAL 30 DAYS")).count()
    assert(out == 1) // only (1,2) overlap within 30 days
  }

  test("outer-join trio preserves exactly the right unmatched rows") {
    import spark.implicits._
    val l = Seq((1, "l1"), (2, "l2")).toDF("k", "lv")
    val r = Seq((2, "r2"), (3, "r3")).toDF("k", "rv")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lv", "rv").collect()
        .map(x => (x.getInt(0), Option(x.getString(1)), Option(x.getString(2)))).toSet
    assert(rows(Relational.joinLeft(l, r, Seq("k"))) ==
      Set((1, Some("l1"), None), (2, Some("l2"), Some("r2"))))
    assert(rows(Relational.joinRight(l, r, Seq("k"))) ==
      Set((2, Some("l2"), Some("r2")), (3, None, Some("r3"))))
    assert(rows(Relational.joinFull(l, r, Seq("k"))) ==
      Set((1, Some("l1"), None), (2, Some("l2"), Some("r2")), (3, None, Some("r3"))))
  }

  test("mergeUpsert: update, partial update, insert, passthrough") {
    import spark.implicits._
    val target = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("k", "name", "bal")
    val source = Seq(
      (2, Some("B"), Some(200.0)),   // full update
      (3, None, Some(300.0)),        // partial update: name stays "c"
      (4, Some("d"), Some(40.0)))    // insert
      .toDF("k", "name", "bal")
    val out = Relational.mergeUpsert(target, source, "k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(
      (1, "a", 10.0),     // untouched target row passes through
      (2, "B", 200.0),
      (3, "c", 300.0),    // NULL source cell kept the target value
      (4, "d", 40.0)))
  }

  test("fn_xml roundtrip: typed parse-back, malformed XML reads as NULL struct fields") {
    import org.apache.spark.sql.functions._
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, p DOUBLE, s STRING")
    val df = Seq(
      (1L, "<o><k>7</k><p>1.5</p><s>OK</s></o>"),
      (2L, "<o><k>not_a_number</k><p>2.5</p><s>X</s></o>"), // bad field
      (3L, "<o><k>9</k>")                                    // truncated fragment
    ).toDF("id", "xml")
    val out = df.select(col("id"), from_xml(col("xml"), schema).as("x"))
      .select(col("id"), col("x.k"), col("x.p"), col("x.s"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) == ((Some(7L), Some(1.5), Some("OK"))))
    // PERMISSIVE mode nulls the WHOLE record on a field parse failure
    // (record-level malformed→NULL, coarser than the JSON path's
    // field-level nulling — pinned here so a Spark upgrade can't change
    // the registered query's semantics silently)
    assert(out(2L) == ((None, None, None)),
      s"malformed record must read as all-NULL: ${out(2L)}")
    assert(out(3L)._2.isEmpty && out(3L)._3.isEmpty,
      s"truncated fragment must not invent values: ${out(3L)}")
  }
}
