package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}
import graft.operators.Similarity

/** Dev-side probe for the kNN-graph banding regime (VERDICT r03 #1):
  * candidate volume, wall time, and sampled recall per band config.
  * Not part of the engine; mirrors DedupSimilaritySpec's recall method. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.configure(
      SparkSession.builder().master("local[32]").appName("knn-probe"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    println(s"n=$n")
    for ((bands, bits) <- Seq((16, 4), (12, 5), (8, 8))) {
      val cand = Similarity.pairsLshCandidateCount(emb, bands, bits)
      val t0 = System.nanoTime()
      val knn = Similarity.knnGraph(emb, 5, bands, bits)
      knn.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // sampled recall vs brute force (same method as DedupSimilaritySpec)
      val rows = knn.collect().map(r => (r.getLong(0), r.getLong(1)))
      val bySrc = rows.groupBy(_._1)
      val sample = bySrc.keys.toSeq.sorted.take(20)
      var hit = 0; var total = 0
      sample.foreach { src =>
        val truth = Similarity.topKCosine(emb, emb.filter(col("vec_id") === src), 6)
          .collect().map(_.getLong(0)).filter(_ != src).take(5).toSet
        val got = bySrc(src).map(_._2).toSet
        hit += got.count(truth); total += truth.size
      }
      println(f"bands=$bands%2d bits=$bits%2d cand=$cand%9d time=$dt%6.2f recall=${hit.toDouble / total}%.3f srcs=${bySrc.size}")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
