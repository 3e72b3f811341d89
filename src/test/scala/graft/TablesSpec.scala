package graft

/** Fixture-drift guard: the declared explicit schemas must stay identical
  * to what Spark infers from the parquet footers (so a regenerated fixture
  * in a later round fails loudly here, not as an oracle hash mismatch). */
class TablesSpec extends SparkTestBase {

  private val tables = Map(
    "region" -> Tables.regionSchema, "nation" -> Tables.nationSchema,
    "customer" -> Tables.customerSchema, "supplier" -> Tables.supplierSchema,
    "part" -> Tables.partSchema, "orders" -> Tables.ordersSchema,
    "lineitem" -> Tables.lineitemSchema, "events" -> Tables.eventsSchema,
    "documents" -> Tables.documentsSchema, "embeddings" -> Tables.embeddingsSchema)

  tables.foreach { case (name, declared) =>
    test(s"declared schema of $name matches the parquet footer") {
      val inferred = spark.read.parquet(s"$sf/$name.parquet").schema
      assert(inferred.fields.map(f => (f.name, f.dataType)).toSeq ==
        declared.fields.map(f => (f.name, f.dataType)).toSeq)
    }
  }
}
