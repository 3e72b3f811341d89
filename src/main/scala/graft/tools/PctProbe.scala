package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Engine, Tables}

/** Repeated-run timing for agg_percentiles (dev probe). */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.configure(
      SparkSession.builder().master("local[32]").appName("pct-probe"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, sfDir).count()
    val times = (1 to 6).map { _ =>
      val t0 = System.nanoTime()
      graft.QueriesCore.aggPercentiles(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println("times " + times.map(t => f"$t%5.2f").mkString(" "))
    // phase split: the histogram pass alone (phases 1-2 of
    // exactContinuousMulti) vs the full two-pass query — how much of the
    // total is the unavoidable second (refinement) scan
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val hist = (1 to 6).map { _ =>
      val t0 = System.nanoTime()
      li.select(col("l_returnflag"), col("l_quantity").cast("double").as("q"),
          col("l_extendedprice").cast("double").as("p"))
        .unpivot(Array(col("l_returnflag")), Array(col("q"), col("p")), "__c", "__v")
        .withColumn("__bkt", floor(col("__v") / when(col("__c") === "q", 1.0).otherwise(2000.0)).cast("long"))
        .groupBy("l_returnflag", "__c", "__bkt").agg(count(lit(1)).as("__cnt"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println("hist  " + hist.map(t => f"$t%5.2f").mkString(" "))
    // phases 1-3 (histogram + prefix windows + target-bucket filter):
    // everything except the refinement join/pick
    val ph3 = (1 to 6).map { _ =>
      val t0 = System.nanoTime()
      val bases = li.select(col("l_returnflag"), col("l_quantity").cast("double").as("q"),
          col("l_extendedprice").cast("double").as("p"))
        .unpivot(Array(col("l_returnflag")), Array(col("q"), col("p")), "__c", "__v")
        .withColumn("__bkt", floor(col("__v") / when(col("__c") === "q", 1.0).otherwise(2000.0)).cast("long"))
        .groupBy("l_returnflag", "__c", "__bkt").agg(count(lit(1)).as("__cnt"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"), col("__c")).orderBy(col("__bkt").asc)
      bases
        .withColumn("__base", coalesce(sum(col("__cnt")).over(
          wB.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("__n", sum(col("__cnt")).over(
          wB.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println("ph3   " + ph3.map(t => f"$t%5.2f").mkString(" "))
    spark.stop()
  }
}
