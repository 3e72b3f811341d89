package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.plans.VectorExpressions

/** The codegen'd DotProductFloat must match the HOF composition
  * bit-for-bit (it replaces it in every similarity path). */
class VectorExprSpec extends SparkTestBase {
  import spark.implicits._

  test("custom expression equals HOF dot on the whole embeddings fixture") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val both = emb.crossJoin(broadcast(q))
      .select($"vec_id",
        VectorExpressions.dotProduct($"embedding", $"qe").as("fast"),
        VectorOps.dotHof($"embedding", $"qe").as("ref"))
    assert(both.filter($"fast" =!= $"ref").count() == 0) // bit-identical
  }

  test("null array and null element propagate to null") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.dotProduct($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
  }

  test("dot_product_float is callable from SQL after registration") {
    graft.plans.GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      "SELECT max(dot_product_float(embedding, embedding)) AS m FROM emb_sql").head()
    assert(r.getDouble(0) > 0.0)
  }

  test("expression participates in whole-stage codegen") {
    val emb = Tables.embeddings(spark, sf)
    val plan = emb.select(VectorExpressions.dotProduct($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project") && plan.contains("dot_product_float"), plan)
  }
}
