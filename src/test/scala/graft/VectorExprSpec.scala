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

  test("vec_project_rp: kernel == HOF bit-identical, signs deterministic, JL distance sanity (round 9)") {
    val signs = VectorOps.rpSigns(8, 64)
    assert(signs.map(_.toSeq).toSeq == VectorOps.rpSigns(8, 64).map(_.toSeq).toSeq)
    // roughly balanced signs (MD5 top bit ~ Bernoulli(1/2); a degenerate
    // all-one row would make the component a plain sum, not a projection)
    signs.foreach { row =>
      val pos = row.count(_ > 0)
      assert(pos >= 16 && pos <= 48, s"skewed sign row: $pos/64 positive")
    }
    val emb = Tables.embeddings(spark, sf)
    val viaKernel = emb.select($"vec_id" +:
      VectorOps.projectRp($"embedding", 8, 64).zipWithIndex
        .map { case (c, j) => c.as(s"p$j") }: _*)
    val viaHof = emb.select($"vec_id" +:
      signs.toSeq.zipWithIndex.map { case (s, j) =>
        VectorOps.dotHof($"embedding", typedLit[Seq[Float]](s.toSeq)).as(s"p$j") }: _*)
    assert(viaKernel.except(viaHof).isEmpty && viaHof.except(viaKernel).isEmpty)
    // JL sanity on a deterministic pair sample: projected squared distance
    // / 8 tracks the original / 64 within a loose multiplicative band
    val rows = emb.filter($"vec_id" < 20).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def proj(v: Array[Float]): Array[Double] =
      signs.map(s => v.indices.map(i => v(i).toDouble * s(i)).sum)
    for (a <- 0 until 5; b <- (a + 1) until 5) {
      val d64 = rows(a).indices.map(i => math.pow(rows(a)(i) - rows(b)(i), 2)).sum / 64.0
      val pa = proj(rows(a)); val pb = proj(rows(b))
      val d8 = pa.indices.map(j => math.pow(pa(j) - pb(j), 2)).sum / 8.0 / 64.0
      assert(d8 > d64 * 0.2 && d8 < d64 * 5.0, s"pair ($a,$b): $d8 vs $d64")
    }
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
