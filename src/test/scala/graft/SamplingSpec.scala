package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("hash sample hits the target fraction within tolerance") {
    val n = docs.count().toDouble
    val k = Sampling.hashSample(docs, col("doc_id"), 0.1).count().toDouble
    assert(math.abs(k / n - 0.1) < 0.04, s"got ${k / n}")
  }

  test("sample is independent of partitioning and repeatable") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(17, col("lang")), col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("nested samples: 10% is a subset of 20% (same salt)") {
    val s10 = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s20 = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s20))
  }

  test("split assignment covers every row exactly once with ~80/10/10 mass") {
    val n = docs.count().toDouble
    val splits = docs.select(Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == n)
    assert(math.abs(splits("train") / n - 0.8) < 0.05, splits.toString)
    assert(math.abs(splits("val") / n - 0.1) < 0.04, splits.toString)
  }

  test("split is consistent across tables sharing the key") {
    // the same doc_id must land in the same split when assigned from a
    // different table (embeddings.vec_id joins documents.doc_id)
    val fromDocs = docs.select(col("doc_id"),
      Sampling.splitColumn(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.2)).as("s1"))
    val fromEmb = Tables.embeddings(spark, sf).select(col("vec_id").as("doc_id"),
      Sampling.splitColumn(col("vec_id"), Seq("train" -> 0.8, "val" -> 0.2)).as("s2"))
    val mismatched = fromDocs.join(fromEmb, "doc_id").filter(col("s1") =!= col("s2"))
    assert(mismatched.isEmpty)
  }

  test("stratified sample keeps each stratum near the fraction") {
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"), 0.2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, total) <- perLang if total >= 50) {
      val f = sampled.getOrElse(lang, 0L).toDouble / total
      assert(math.abs(f - 0.2) < 0.12, s"$lang: $f of $total")
    }
  }

  test("sampling ops stay narrow: no shuffle in the filter") {
    val plan = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
