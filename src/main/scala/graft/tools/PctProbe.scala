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
    spark.stop()
  }
}
