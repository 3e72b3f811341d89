package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Round-9 measurement aid for VERDICT ask #6 (pagerank toy-SF floor):
  * times the registered pagerank DAG next to plan variants so the chosen
  * form is picked on numbers, not theory. Not part of the engine. */
object PagerankProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-pagerank-probe"),
      cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def edges(): DataFrame = {
      val ed = Tables.lineitem(spark, dir)
        .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
    }

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[prp] $label%-28s median=${ts(1)}%6.3f min=${ts(0)}%6.3f")
      spark.catalog.clearCache(); System.gc()
    }

    // Variant: one eager checkpoint (ed); nodes/noRecv derive from the
    // checkpointed ed blocks; noRecv stays LAZY (identical subplans in
    // the single round DAG are deduped by ReusedExchange).
    def pagerankLean(edgesDf: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
      import graft.functions.Num.r8
      import graft.operators.Dist
      val e = edgesDf.select(col("src"), col("dst")).distinct()
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val ed = Dist.byKeys(e.join(outdeg, "src"), col("src")).localCheckpoint(true)
      val nodes = ed.select(col("src").as("node"))
        .union(ed.select(col("dst").as("node")))
        .distinct()
        .localCheckpoint(true)
      val n = nodes.count()
      var ranks = nodes.withColumn("rank", r8(lit(1.0) / lit(n.toDouble)))
      val base = lit(1.0 - damping) / lit(n.toDouble)
      val noRecv = nodes
        .join(ed.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
        .withColumn("rank", r8(base))
      for (_ <- 1 to iters) {
        val contrib = ranks.join(ed, ranks("node") === ed("src"))
          .select(col("dst").as("node"),
            floor(col("rank") * lit(100000000L) / col("outdeg") + lit(0.5)).cast("long").as("wq"))
          .groupBy("node").agg(sum(col("wq")).as("wq"))
        ranks = contrib
          .select(col("node"),
            r8(base + lit(damping) * (col("wq").cast("double") / lit(100000000.0))).as("rank"))
          .unionAll(noRecv)
      }
      ranks
    }

    // Leanest: nodes not even checkpointed — count() runs over the ed
    // blocks; the final DAG recomputes the nodes distinct from cached
    // blocks with exchange reuse.
    def pagerankLean2(edgesDf: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
      import graft.functions.Num.r8
      import graft.operators.Dist
      val e = edgesDf.select(col("src"), col("dst")).distinct()
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val ed = Dist.byKeys(e.join(outdeg, "src"), col("src")).localCheckpoint(true)
      val nodes = ed.select(col("src").as("node"))
        .union(ed.select(col("dst").as("node")))
        .distinct()
      val n = nodes.count()
      var ranks = nodes.withColumn("rank", r8(lit(1.0) / lit(n.toDouble)))
      val base = lit(1.0 - damping) / lit(n.toDouble)
      val noRecv = nodes
        .join(ed.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
        .withColumn("rank", r8(base))
      for (_ <- 1 to iters) {
        val contrib = ranks.join(ed, ranks("node") === ed("src"))
          .select(col("dst").as("node"),
            floor(col("rank") * lit(100000000L) / col("outdeg") + lit(0.5)).cast("long").as("wq"))
          .groupBy("node").agg(sum(col("wq")).as("wq"))
        ranks = contrib
          .select(col("node"),
            r8(base + lit(damping) * (col("wq").cast("double") / lit(100000000.0))).as("rank"))
          .unionAll(noRecv)
      }
      ranks
    }

    // Interleaved A/B: alternate the two forms so host-phase drift hits
    // both equally; report per-form medians over 7 reps.
    def once(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def runReg(): Unit =
      graft.operators.Graph.pagerank(edges(), 6).orderBy("node")
        .write.format("noop").mode("overwrite").save()
    def runLean(): Unit =
      pagerankLean(edges(), 6).orderBy("node")
        .write.format("noop").mode("overwrite").save()
    def runLean2(): Unit =
      pagerankLean2(edges(), 6).orderBy("node")
        .write.format("noop").mode("overwrite").save()
    runReg(); runLean(); runLean2() // warm all paths
    val (ra, rb, rc) = (collection.mutable.Buffer[Double](),
      collection.mutable.Buffer[Double](), collection.mutable.Buffer[Double]())
    for (_ <- 1 to 7) {
      ra += once(runReg()); spark.catalog.clearCache(); System.gc()
      rb += once(runLean()); spark.catalog.clearCache(); System.gc()
      rc += once(runLean2()); spark.catalog.clearCache(); System.gc()
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[prp] interleaved registered med=${med(ra.toSeq)}%6.3f min=${ra.min}%6.3f")
    println(f"[prp] interleaved lean       med=${med(rb.toSeq)}%6.3f min=${rb.min}%6.3f")
    println(f"[prp] interleaved lean2      med=${med(rc.toSeq)}%6.3f min=${rc.min}%6.3f")
    spark.stop()
  }
}
