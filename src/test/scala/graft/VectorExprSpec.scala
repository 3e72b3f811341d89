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

  test("unequal-length arrays yield NULL, matching the zip_with form") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val out = df.select(
      VectorExpressions.dotProduct($"a", $"b").as("fast"),
      VectorOps.dotHof($"a", $"b").as("ref")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1)) // zip_with pads with null → null sum
  }

  test("dot_product_float is callable from SQL after registration") {
    graft.plans.GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      "SELECT max(dot_product_float(embedding, embedding)) AS m FROM emb_sql").head()
    assert(r.getDouble(0) > 0.0)
  }

  test("kernel expressions are callable from SQL and match Column API") {
    graft.plans.GraftExtensions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sql")
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql")
    val sqlRows = spark.sql(
      """SELECT doc_id, simhash64(text) AS sh,
        |  minhash_sig(text, 64, 3) AS sig,
        |  winnow_fingerprints(text, 8, 4) AS fp
        |FROM docs_sql""".stripMargin)
    val colRows = Tables.documents(spark, sf).select($"doc_id",
      graft.plans.TextExpressions.simhash64($"text").as("sh"),
      graft.plans.TextExpressions.minhashSig($"text").as("sig"),
      graft.plans.TextExpressions.winnowFingerprints($"text").as("fp"))
    assert(sqlRows.except(colRows).isEmpty && colRows.except(sqlRows).isEmpty)
    val srp = spark.sql(
      "SELECT count(DISTINCT srp_sketch(embedding, 16, 42)) AS n FROM emb_sql").head()
    assert(srp.getLong(0) > 1)
  }

  test("optimizer rule rewrites self-dot to norm2_float, results unchanged") {
    import graft.functions.VectorOps
    val emb = Tables.embeddings(spark, sf)
    val df = emb.select($"vec_id", VectorOps.norm2($"embedding").as("n2"))
    // the injected rule fires for Engine-built sessions (Column API path)
    assert(df.queryExecution.optimizedPlan.toString.contains("norm2_float"),
      df.queryExecution.optimizedPlan.toString)
    // bit-identical to evaluating the binary form with the rule disabled:
    // compare against the HOF reference semantics instead
    val mismatch = emb.select(VectorOps.norm2($"embedding").as("a"),
        VectorOps.dotHof($"embedding", $"embedding").as("b"))
      .filter(!($"a" <=> $"b"))
    assert(mismatch.isEmpty)
    // and for the SQL surface
    graft.plans.GraftExtensions.register(spark)
    emb.createOrReplaceTempView("emb_rule")
    val sqlPlan = spark.sql(
      "SELECT dot_product_float(embedding, embedding) FROM emb_rule")
      .queryExecution.optimizedPlan.toString
    assert(sqlPlan.contains("norm2_float"), sqlPlan)
  }

  test("expression participates in whole-stage codegen") {
    val emb = Tables.embeddings(spark, sf)
    // distinct subtrees, so RewriteSelfDotToNorm2 leaves the binary form
    val plan = emb.select(VectorExpressions.dotProduct($"embedding", reverse($"embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project") && plan.contains("dot_product_float"), plan)
  }
}
