package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}
import graft.functions.TextOps
import graft.functions.Num.r4

/** Scratch experiments for the jaccard join (dev-only). */
object JaccardLab {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[lab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.configure(
      SparkSession.builder().master("local[32]").appName("lab"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    val posting = docs.select(col("doc_id"),
        array_distinct(transform(TextOps.shingles(col("text"), 3), s => xxhash64(s))).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))

    time("posting count")(println(posting.count()))
    time("posting count warm")(println(posting.count()))

    // codegen path: explode positions, element_at + concat_ws + xxhash64
    val toks = docs.select(col("doc_id"), split(lower(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 3)
    val p2base = toks
      .select(col("doc_id"), col("t"), explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
      .select(col("doc_id"),
        xxhash64(concat_ws(" ",
          element_at(col("t"), col("i")),
          element_at(col("t"), col("i") + 1),
          element_at(col("t"), col("i") + 2))).as("sh"))
      .distinct()
    val sizes2 = p2base.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val posting2 = p2base.join(sizes2, "doc_id")
      .select(col("doc_id"), col("n_sh"), col("sh"))
    time("posting2 count")(println(posting2.count()))
    time("posting2 count warm")(println(posting2.count()))

    val joined2 = posting2.as("a").join(posting2.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
    time("join2 count")(println(joined2.count()))
    time("join2 count warm")(println(joined2.count()))

    val postingR = posting.repartition(32, col("sh"))
    val joinedR = postingR.as("a").join(postingR.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
    time("joinR count (reuse ex.)")(println(joinedR.count()))
    time("joinR count warm")(println(joinedR.count()))

    val joined = posting.as("a").join(posting.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
    time("join count")(println(joined.count()))
    time("join count warm")(println(joined.count()))

    val pairs = joined.groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
    time("pairs count")(println(pairs.count()))
    time("pairs count warm")(println(pairs.count()))

    val out = pairs.withColumn("jaccard",
        r4(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))))
      .filter(col("jaccard") >= 0.5)
    time("full")(println(out.count()))
    time("full warm")(println(out.count()))
    spark.stop()
  }
}
