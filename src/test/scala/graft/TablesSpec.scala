package graft

/** Fixture-drift guard: the declared explicit schemas must stay identical
  * to what Spark infers from the parquet footers (so a regenerated fixture
  * in a later round fails loudly here, not as an oracle hash mismatch). */
class TablesSpec extends SparkTestBase {

  private val tables = Map(
    "region" -> Tables.regionSchema, "nation" -> Tables.nationSchema,
    "customer" -> Tables.customerSchema, "supplier" -> Tables.supplierSchema,
    "part" -> Tables.partSchema, "orders" -> Tables.ordersSchema,
    "lineitem" -> Tables.lineitemSchema,
    "documents" -> Tables.documentsSchema, "embeddings" -> Tables.embeddingsSchema)

  tables.foreach { case (name, declared) =>
    test(s"declared schema of $name matches the parquet footer") {
      val inferred = spark.read.parquet(s"$sf/$name.parquet").schema
      assert(inferred.fields.map(f => (f.name, f.dataType)).toSeq ==
        declared.fields.map(f => (f.name, f.dataType)).toSeq)
    }
  }

  // `events.ts` has legitimately varied physically across fixture
  // generations (INT64 nanos-as-long vs TIMESTAMP_NTZ micros), which
  // Tables.normalizeEvents absorbs at read time. Guard the LOGICAL
  // contract the engine actually depends on, and separately pin the raw
  // footer to the declared variant set so a genuinely NEW physical type
  // still fails loudly here.
  test("events: normalized schema matches the logical BIGINT-ns contract") {
    assert(Tables.events(spark, sf).schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Tables.eventsSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("events: raw footer is a declared physical variant") {
    val raw = Tables.eventsRawSchema(spark, sf)
    assert(raw.fields.map(_.name).toSeq == Tables.eventsSchema.fields.map(_.name).toSeq)
    assert(Tables.eventsTsPhysicalVariants.contains(raw("ts").dataType),
      s"new events.ts physical type ${raw("ts").dataType} — extend normalizeEvents + this variant set")
    raw.fields.filterNot(_.name == "ts").foreach { f =>
      assert(f.dataType == Tables.eventsSchema(f.name).dataType,
        s"events.${f.name} drifted to ${f.dataType}")
    }
  }

  test("normalizeEvents rejects an undeclared ts physical type loudly") {
    import org.apache.spark.sql.functions.col
    val bad = Tables.events(spark, sf).withColumn("ts", col("ts").cast("string"))
    val e = intercept[IllegalStateException](Tables.normalizeEvents(bad))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("normalizeEvents: all declared physical variants of the same data normalize identically") {
    import org.apache.spark.sql.functions._
    // stage the SAME logical events three ways — BIGINT nanos (the
    // engine contract), TIMESTAMP micros, TIMESTAMP_NTZ micros — and
    // require bit-identical normalized frames, so the next fixture
    // regeneration in any of these shapes cannot silently shift ts.
    // (micros chosen sub-ns-exact so the ns→µs write loses nothing)
    val canonical = Tables.events(spark, sf)
      .withColumn("ts", (col("ts") - pmod(col("ts"), lit(1000L))))
    val dir = java.nio.file.Files.createTempDirectory("ev-variants")
    try {
      canonical.write.parquet(s"$dir/as_long")
      canonical.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .write.parquet(s"$dir/as_ts")
      canonical.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        .write.parquet(s"$dir/as_ntz")
      val Seq(a, b, c) = Seq("as_long", "as_ts", "as_ntz").map { v =>
        Tables.normalizeEvents(spark.read.parquet(s"$dir/$v"))
      }
      assert(a.schema == b.schema && b.schema == c.schema)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
