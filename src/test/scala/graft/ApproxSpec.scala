package graft

import org.apache.spark.sql.functions._

class ApproxSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct within rsd of exact") {
    val approx = QueriesCore.aggApproxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.1, s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("approx_percentile within tolerance of exact per group") {
    def grab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ap = grab(QueriesCore.aggApproxPercentiles(spark, sf))
    val ex = grab(QueriesCore.aggPercentiles(spark, sf))
    ex.foreach { case (k, (e25, e50, e75, e95)) =>
      val (a25, a50, a75, a95) = ap(k)
      // l_quantity ∈ [1,50]: absolute tolerance of 1 quantity unit; price
      // p95 within 2% relative
      assert(math.abs(a25 - e25) <= 1.0 && math.abs(a50 - e50) <= 1.0 &&
        math.abs(a75 - e75) <= 1.0, s"$k: $ap vs $ex")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"$k: p95 $a95 vs $e95")
    }
  }
}
