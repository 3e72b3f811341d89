package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}
import graft.operators.{Components, Similarity}

/** Dev harness for the dedup_semantic_lsh variance hunt: times the LSH
  * pair stage and each CC variant separately, several iterations in one
  * JVM, printing per-stage seconds + round counts — so a slow run can
  * be attributed to candidates vs clustering vs scheduler noise.
  * Usage: runMain graft.tools.CcProbe [iters]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-ccprobe"), cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (i <- 1 to iters) {
      val (pairs, tPairs) = t {
        Similarity.pairsLsh(Tables.embeddings(spark, sfDir), 0.35)
          .select(col("a_id"), col("b_id")).localCheckpoint(true)
      }
      val nPairs = pairs.count()
      val (nStars, tStars) = t {
        Components.connectedComponentsStars(pairs).count()
      }
      val rStars = Components.lastRounds.get()
      val (nProp, tProp) = t {
        Components.connectedComponents(pairs).count()
      }
      val rProp = Components.lastRounds.get()
      println(f"[ccprobe] iter=$i pairs=$nPairs%d tPairs=$tPairs%.2f " +
        f"stars=$tStars%.2f ($rStars rounds, $nStars rows) " +
        f"prop=$tProp%.2f ($rProp rounds, $nProp rows)")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
