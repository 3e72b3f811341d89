package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Engine, SparkEntry}

/** Dev harness: time one registered query (2 runs) and optionally print
  * its formatted plan. Usage: runMain graft.tools.Profile <query> [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"), cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (args.length > 1 && args(1) == "explain") fn(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val cc = Option(graft.operators.Components.lastRounds.get())
        .filter(_ > 0).map(r => s" cc_rounds=$r").getOrElse("")
      println(f"[profile] $name run$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.3f$cc")
    }
    spark.stop()
  }
}
