package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Engine, SparkEntry}
import java.nio.file.{Files, Paths}

/** Writes the `.explain("formatted")` output of the NAMED queries, one
  * file per query, for optimization-round before/after plan evidence
  * (plans/r15/<query>_<suffix>.txt).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.configure(
      SparkSession.builder().master("local[4]").appName("graft-plandump"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val ex = "Exchange".r.findAllIn(s).size -
        "BroadcastExchange".r.findAllIn(s).size
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
        s"== $name ($suffix) — shuffle exchanges: $ex ==\n\n" + s)
      println(s"[plandump] $name -> ${name}_$suffix.txt (exchanges=$ex)")
    }
    spark.stop()
  }
}
