package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.{Engine, SparkEntry}

/** Per-query fixed-cost profiler (round 16, VERDICT r15 asks #1/#3):
  * for each named query, reports — per repetition — the Spark JOB and
  * STAGE count, the dataframe-CONSTRUCTION time (which includes every
  * eager action the query builder runs: localCheckpoints, observes,
  * collects) and the final noop-sink ACTION time, so a row's cost can
  * be split into driver-blocking action train vs plan execution.
  *
  * Usage: runMain graft.tools.QProf <query> [query...] [--reps=N]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val reps = args.find(_.startsWith("--reps="))
      .map(_.stripPrefix("--reps=").toInt).getOrElse(3)
    val names = args.filterNot(_.startsWith("--"))
    require(names.nonEmpty, "usage: QProf <query> [query...] [--reps=N]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-qprof"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.bench.fast",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_FAST", "1"))
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    // whole-stage-codegen compile time (ms) accumulated by janino since
    // session start — the Dropwizard histogram's count×mean tracks the
    // total closely at this event volume, which is all the attribution
    // needs (first-run vs re-run delta per query)
    def codegenMs(): Double = {
      val h = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
      h.getCount * h.getSnapshot.getMean
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (rep <- 1 to reps) {
        spark.catalog.clearCache()
        if (spark.sparkContext.getPersistentRDDs.nonEmpty) System.gc()
        val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
        val cg0 = codegenMs()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val (j1, s1, k1) = (jobs.get, stages.get, tasks.get)
        // force analysis + optimization + physical planning (AQE plan
        // shell) WITHOUT executing — isolates Catalyst's share
        df.queryExecution.executedPlan
        val tp = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        // listener events are async — give the bus a beat before reading
        Thread.sleep(300)
        val (j2, s2, k2) = (jobs.get, stages.get, tasks.get)
        val cg1 = codegenMs()
        println(f"[qprof] $name%-28s rep=$rep " +
          f"cons=${(t1 - t0) / 1e9}%7.3f s (jobs=${j1 - j0}%3d stages=${s1 - s0}%3d tasks=${k1 - k0}%5d)  " +
          f"plan=${(tp - t1) / 1e9}%6.3f s  " +
          f"act=${(t2 - tp) / 1e9}%7.3f s (jobs=${j2 - j1}%3d stages=${s2 - s1}%3d tasks=${k2 - k1}%5d)  " +
          f"codegen=${(cg1 - cg0) / 1e3}%6.3f s  total=${(t2 - t0) / 1e9}%7.3f s")
      }
    }
    spark.stop()
  }
}
