package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Synthesize a larger fixture slice by replicating an existing one K×
  * with CONSISTENT key remapping (SCALE.md "Measured scaling curve" —
  * the round-7 ask to extend the measured span past sf0.1 without
  * touching the driver-owned `/root/testdata`).
  *
  * Each fact/entity table is replicated K times in one narrow pass
  * (`explode(sequence(...))`, no shuffle until the write repartition);
  * copy `c` offsets every surrogate key by `c × stride` where stride =
  * max(key)+1 of the source slice, so referential joins
  * (orders↔lineitem, customer↔orders, events↔events) land exactly as
  * they do in the source — each copy is a disjoint key universe.
  * Dimension tables (region/nation/part/supplier) are copied verbatim:
  * scaling facts against fixed dims is the TPC-H shape and keeps the
  * broadcast-ability of every dim join unchanged.
  *
  * Copies are DISTINCT, not clones (measured round 8: a first cut that
  * made every copy a near-duplicate of its source — ε-perturbed vectors,
  * one-token text suffix — inflated TRUE pair counts ~100× per ×10, so
  * every pair-emitting query (jaccard/LSH pairs/semantic CC) measured
  * super-linear for fixture reasons, not plan reasons, and the kNN
  * rescore OOM'd under the 10-clone bucket mass). Instead:
  *  - `documents.text`: every 5th word is replaced by a (copy,
  *    position)-tagged token — cross-copy shingle Jaccard ≈ 0, while
  *    WITHIN a copy the source's duplicate structure is preserved
  *    exactly (identical sources stay identical) ⇒ true dup/near-dup
  *    pairs grow linearly with K.
  *  - `embeddings.embedding`: components rotated by copy×7 (coprime
  *    with the dim) — cross-copy cosine decorrelates, within-copy
  *    geometry is isometric ⇒ true similarity pairs grow linearly.
  *
  * Output physical types match the source contract (`events.ts` stays
  * BIGINT nanoseconds via [[Tables.events]]'s normalized logical
  * schema). Deterministic: no RNG, no timestamps.
  *
  * Args: [srcDir] [dstDir] [k]; defaults
  * `/root/testdata/sf0.1 target/synth-sf1 10`.
  */
object SynthScale {

  /** K copies of `df`, remapping each (column → per-copy stride). */
  private def replicate(df: DataFrame, k: Int, strides: Map[String, Long],
      perCopy: (DataFrame, org.apache.spark.sql.Column) => DataFrame = (d, _) => d): DataFrame = {
    val c = explode(sequence(lit(0L), lit(k - 1L))).as("__copy")
    val base = df.select(col("*"), c)
    val remapped = strides.foldLeft(base) { case (d, (name, stride)) =>
      d.withColumn(name, col(name) + col("__copy") * lit(stride))
    }
    perCopy(remapped, col("__copy")).drop("__copy")
  }

  private def maxKey(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/synth-sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-synth"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      System.err.println(s"[synth] $name × $k → $dst")
    }

    // dims: verbatim
    write(Tables.region(spark, src), "region", 1)
    write(Tables.nation(spark, src), "nation", 1)
    write(Tables.part(spark, src), "part", 2)
    write(Tables.supplier(spark, src), "supplier", 1)

    val custStride = maxKey(Tables.customer(spark, src), "c_custkey")
    val orderStride = maxKey(Tables.orders(spark, src), "o_orderkey")
    val eventStride = maxKey(Tables.events(spark, src), "event_id")
    val userStride = maxKey(Tables.events(spark, src), "user_id")
    val docStride = maxKey(Tables.documents(spark, src), "doc_id")
    val vecStride = maxKey(Tables.embeddings(spark, src), "vec_id")

    write(replicate(Tables.customer(spark, src), k,
      Map("c_custkey" -> custStride)), "customer", 4)
    write(replicate(Tables.orders(spark, src), k,
      Map("o_orderkey" -> orderStride, "o_custkey" -> custStride)), "orders", 8)
    write(replicate(Tables.lineitem(spark, src), k,
      Map("l_orderkey" -> orderStride)), "lineitem", 32)
    write(replicate(Tables.events(spark, src), k,
      Map("event_id" -> eventStride, "user_id" -> userStride)), "events", 16)
    // distinct text per copy: every 5th word → (copy, position) token;
    // within-copy duplicate structure preserved exactly
    write(replicate(Tables.documents(spark, src), k,
      Map("doc_id" -> docStride),
      (d, copy) => d
        .withColumn("text",
          when(copy === 0L, col("text"))
            .otherwise(array_join(
              transform(split(col("text"), " "), (w, i) =>
                when(pmod(i, lit(5)) === lit(4),
                  concat(lit("zq"), copy.cast("string"), lit("x"),
                    (i / 5).cast("string")))
                  .otherwise(w)),
              " ")))
        .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents", 8)
    // distinct vectors per copy: rotate components by copy×7 (within-copy
    // isometric, cross-copy decorrelated)
    write(replicate(Tables.embeddings(spark, src), k,
      Map("vec_id" -> vecStride),
      (d, copy) => d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          element_at(col("embedding"),
            pmod(i + copy.cast("int") * lit(7), size(col("embedding"))) + 1)))),
      "embeddings", 4)

    println(s"""{"metric":"synth","src":"$src","dst":"$dst","k":$k}""")
    spark.stop()
  }
}
