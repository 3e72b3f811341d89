package graft.tools
import graft.Engine
object Expl {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(master = "local[4]", shufflePartitions = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.explain("formatted")
    spark.stop()
  }
}
