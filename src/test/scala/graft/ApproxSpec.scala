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
}
