package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.v2.FileManifestSource

/** The DataSourceV2 file-manifest source: schema, correctness vs a plain
  * JDK walk, filter pushdown (pruned files never become rows), column
  * pruning, and per-subdirectory partition planning. */
class FileManifestSpec extends SparkTestBase {

  private val fmt = classOf[FileManifestSource].getName

  /** Scope layout mirroring the reference's per-study folders. */
  private lazy val root: String = {
    val dir = Files.createTempDirectory("manifest")
    Files.writeString(dir.resolve("readme.txt"), "root file")
    for (study <- Seq("studyA", "studyB")) {
      val d = Files.createDirectories(dir.resolve(study).resolve("parquet"))
      Files.writeString(d.resolve("part-0.parquet"), "x" * 100)
      Files.writeString(d.resolve("part-1.parquet"), "y" * 300)
      Files.writeString(dir.resolve(study).resolve("meta.json"), """{"a":1}""")
    }
    dir.toString
  }

  test("manifest rows match a plain JDK walk") {
    val got = spark.read.format(fmt).load(root)
      .select("path", "size").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = Files.walk(Paths.get(root))
    val want = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.size(p)).toMap
    } finally s.close()
    assert(got == want)
    assert(got.size == 7) // 1 root + 2×(2 parquet + 1 json)
  }

  test("ext filter is pushed down: pruned files never become rows") {
    FileManifestSource.rowsEmitted.set(0)
    val df = spark.read.format(fmt).load(root).filter(col("ext") === "parquet")
    // collect, not count(): count() now pushes the aggregate into the
    // source and no file row would be materialized at all
    val n = df.collect().length
    assert(n == 4)
    // the json/txt files were pruned during the walk, not post-filtered
    assert(FileManifestSource.rowsEmitted.get() == 4,
      s"expected 4 emitted rows, got ${FileManifestSource.rowsEmitted.get()}")
    // and the plan advertises the pushdown
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[EqualTo(ext,parquet)]"), plan)
  }

  test("size range predicates push down too") {
    FileManifestSource.rowsEmitted.set(0)
    val n = spark.read.format(fmt).load(root)
      .filter(col("size") > 200L && col("ext") === "parquet").collect().length
    assert(n == 2)
    assert(FileManifestSource.rowsEmitted.get() == 2)
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format(fmt).load(root).select("ext")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema=ext"), plan)
    assert(df.distinct().collect().map(_.getString(0)).toSet == Set("txt", "parquet", "json"))
  }

  test("one input partition per child directory + one for root files") {
    val df = spark.read.format(fmt).load(root)
    assert(df.rdd.getNumPartitions == 3) // studyA, studyB, root
  }

  test("reports statistics so a manifest join can broadcast") {
    val fact = spark.range(1000).selectExpr("concat('f', id) AS name", "id AS x")
    val manifest = spark.read.format(fmt).load(root)
    // 7 files × 200 B estimate ≪ the broadcast threshold ⇒ the planner
    // must broadcast the manifest side
    val joined = fact.join(manifest, "name")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      joined.queryExecution.executedPlan.toString)
  }

  test("dir filter prunes whole subtrees at plan time (partition pruning)") {
    FileManifestSource.rowsEmitted.set(0)
    val df = spark.read.format(fmt).load(root).filter(col("dir") === "studyA")
    // only studyA's partition survives planning: studyB and the root
    // partition are never even walked
    assert(df.rdd.getNumPartitions == 1)
    assert(df.collect().length == 3) // 2 parquet + 1 json
    assert(FileManifestSource.rowsEmitted.get() == 3,
      s"expected 3 emitted rows, got ${FileManifestSource.rowsEmitted.get()}")
  }

  test("reported KeyGroupedPartitioning: per-dir aggregation plans without a shuffle") {
    // min(name) is not aggregate-pushable (string column), so this runs
    // as a row-scan aggregation and demonstrates the LAYOUT report in
    // its pure form. (When the aggregate IS pushed, Spark aliases the
    // group column in a Project and the key-grouped match doesn't carry
    // through — the exchange it keeps moves one partial row per dir,
    // which is noise; the per-file win already happened in the scan.)
    val df = spark.read.format(fmt).load(root)
      .groupBy("dir").agg(count(lit(1)).as("n"), min("name").as("first_name"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("PushedAggregation"), plan)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("studyA" -> 3L, "studyB" -> 3L, "" -> 1L))
  }

  test("pruning dir away still reads correctly (partitioning claim withdrawn)") {
    // without `dir` in the output the key can't resolve; the scan must
    // fall back to UnknownPartitioning, not claim a bogus grouping
    val df = spark.read.format(fmt).load(root).select("ext", "size")
    assert(df.count() == 7)
    val agg = spark.read.format(fmt).load(root).select("ext")
      .groupBy("ext").count()
    // this one DOES need an exchange (grouped by ext, not dir)
    assert(agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("runtime filtering: a join on dir prunes partitions at execution time") {
    import spark.implicits._
    // the dim must be a FILE relation: a LocalRelation folds its filter
    // away and DPP's selective-predicate check never sees one
    val dimPath = Files.createTempDirectory("manifest_dim").resolve("dim").toString
    Seq(("studyA", "active"), ("studyB", "retired"))
      .toDF("dir", "status").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.format(fmt).load(root)
      .join(dim.filter(col("status") === "active"), "dir")
    // the plan carries a dynamic-pruning runtime filter on dir...
    assert(joined.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      joined.queryExecution.executedPlan.toString)
    FileManifestSource.rowsEmitted.set(0)
    assert(joined.count() == 3) // studyA's files only
    // ...and it reached ManifestScan.filter BEFORE the walk: studyB and
    // the root partition were never even walked
    assert(FileManifestSource.rowsEmitted.get() == 3,
      s"expected 3 emitted rows (studyA only), got ${FileManifestSource.rowsEmitted.get()}")
  }

  test("aggregate pushdown: count/min/max/sum fold into the walk, no file rows") {
    FileManifestSource.rowsEmitted.set(0)
    val df = spark.read.format(fmt).load(root)
      .agg(count(lit(1)).as("n"), min("size").as("mn"),
        max("size").as("mx"), sum("size").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), plan)
    val r = df.head()
    assert(r.getLong(0) == 7)
    assert(r.getLong(1) == 7)   // meta.json {"a":1}
    assert(r.getLong(2) == 300) // part-1.parquet
    assert(r.getLong(3) == 9 + 2 * (100 + 300 + 7)) // readme + 2×(p0+p1+meta)
    // the scan emitted partial rows, never file rows
    assert(FileManifestSource.rowsEmitted.get() == 0,
      s"file rows were materialized: ${FileManifestSource.rowsEmitted.get()}")
  }

  test("aggregate pushdown composes with pushed filters and groupBy(dir)") {
    val df = spark.read.format(fmt).load(root)
      .filter(col("ext") === "parquet")
      .groupBy("dir").agg(count(lit(1)).as("n"), sum("size").as("bytes"))
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    val got = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("studyA" -> ((2L, 400L)), "studyB" -> ((2L, 400L))))
  }

  test("unsupported aggregates fall back to the row scan (min on a string column)") {
    val df = spark.read.format(fmt).load(root).agg(min("name"))
    assert(!df.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(df.head().getString(0) == "meta.json")
  }

  test("blackhole V2 sink: committed metrics are exact (rows and bytes > 0)") {
    import graft.sources.v2.BlackholeSink
    val df = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val n = df.count()
    df.write.format(classOf[BlackholeSink].getName).mode("overwrite").save()
    assert(BlackholeSink.lastCommitRows.get() == n,
      s"committed ${BlackholeSink.lastCommitRows.get()} rows, expected $n")
    assert(BlackholeSink.lastCommitBytes.get() > 0)
  }

  test("dashboard_fileview joins the manifest half to real table reads (exact values)") {
    // the registered end-to-end dashboard row (round-8 verdict ask #7):
    // V2 manifest resolves the scope's tables; the normal reader counts
    // their rows; output is host-path-free and exactly predictable
    val out = Queries.dashboardFileview(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = Seq(
      ("documents", 1L, Tables.documents(spark, sf).count()),
      ("lineitem", 1L, Tables.lineitem(spark, sf).count()),
      ("orders", 1L, Tables.orders(spark, sf).count()))
    assert(out.toSeq == expect, s"got ${out.toSeq}")
  }

  test("composes with the FileView retype/scan surface downstream") {
    // the manifest is a plain DataFrame: joins/aggregations Just Work
    val bySuffix = spark.read.format(fmt).load(root)
      .groupBy("ext").agg(count(lit(1)).as("n"), sum("size").as("bytes"))
      .orderBy("ext")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySuffix == Map("json" -> 2L, "parquet" -> 4L, "txt" -> 1L))
  }
}
