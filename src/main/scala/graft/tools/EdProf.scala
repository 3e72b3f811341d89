import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Stage-level profiler for dedup_editdist's ×10 probe step (SCALE.md
  * round-9 root-cause evidence). Reproduces both halves of the
  * diagnosis on the SynthScale ~sf1 slice:
  *
  *  1. the blocked pair JOIN is sub-second (≈0.8 s for ~210 k pairs) —
  *     blocking geometry is not the cost;
  *  2. the verify stage is the cost, and it's the BUILTIN's constant:
  *     `levenshtein(a, b, 20)` on a close ~330-char pair measures
  *     ~490 µs (per-cell multi-byte UTF-8 run comparison), while the
  *     banded code-point kernel (TextKernels.levenshteinWithin) is
  *     ~43 µs — the ~11× that turned the probe step from 91 s into
  *     pair-join cost (4.2 s).
  */
object EdProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.configure(SparkSession.builder().master("local[32]").appName("edprof"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "target/synth-sf1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-38s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val d = docs.select(col("doc_id"), col("text").as("txt"), length(col("text")).as("len"), substring(col("text"),1,16).as("pfx"))
    val small = d.groupBy("pfx").agg(count(lit(1)).as("n")).filter(col("n") <= 1000).select("pfx")
    val blocked = d.join(small, Seq("pfx"), "left_semi").localCheckpoint(true)
    val joined = blocked.as("x").join(blocked.as("y"),
      col("x.pfx") === col("y.pfx") && col("x.doc_id") < col("y.doc_id") &&
        abs(col("x.len") - col("y.len")) <= 10)
    time("join only (count pairs)") { joined.count() }
    time("builtin lev threshold 20") { joined.select(levenshtein(col("x.txt"), col("y.txt"), 20).as("d")).filter(col("d") >= 0).count() }
    time("kernel levenshtein_within 20") { joined.select(graft.plans.TextExpressions.levenshteinWithin(col("x.txt"), col("y.txt"), 20).as("d")).filter(col("d") >= 0).count() }

    // single-pair microbench: a ~330-char doc vs a 9-edit mutation
    val sa = docs.select(col("text")).filter(length(col("text")).between(300, 340)).head().getString(0)
    val chars = sa.toCharArray
    var i = 7
    while (i < chars.length) { chars(i) = ('a' + (i % 26)).toChar; i += 37 }
    val sb = new String(chars)
    val a = UTF8String.fromString(sa); val b = UTF8String.fromString(sb)
    println(s"pair len=${sa.length} true-dist=${a.levenshteinDistance(b)}")
    def bench(tag: String, n: Int)(f: => Int): Unit = {
      f
      val t0 = System.nanoTime(); var i = 0; var s = 0
      while (i < n) { s += f; i += 1 }
      println(f"$tag%-34s ${(System.nanoTime()-t0)/1e3/n}%10.1f us/call  (chk $s)")
    }
    bench("builtin threshold 20 (close pair)", 500) { a.levenshteinDistance(b, 20) }
    bench("kernel banded k=20", 5000) { graft.plans.TextKernels.levenshteinWithin(a, b, 20) }
    spark.stop()
  }
}
