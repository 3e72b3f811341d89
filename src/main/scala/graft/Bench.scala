package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Methodology matches BASELINE.md: per query, one untimed warm-up
  * execution (JIT + codegen + file-footer caches), then the timed run.
  * One shared SparkSession for the whole suite.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val w0 = System.nanoTime()
        fn(spark, sfDir).count() // warm-up: JIT, codegen cache, FS metadata
        val w = (System.nanoTime() - w0) / 1e9
        // isolate the timed run: drop every frame the warm-up persisted so
        // the measurement includes the query's own cache builds and no
        // query inherits (or evicts) another's storage
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.err.println(f"[bench] $name%-24s cold=$w%8.3f warm=$t%8.3f")
        name -> t
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
