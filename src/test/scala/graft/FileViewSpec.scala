package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.FileView
import java.nio.file.Files

/** Golden test for the reference-shaped ETL (SURVEY.md §5.2.5): all-STRING
  * "inferred file view" input → typed output per the exact rules of
  * copy_from_template.py:177-218 → partitioned sink → pruned read-back. */
class FileViewSpec extends SparkTestBase {
  import spark.implicits._

  private def viewFixture = Seq(
    // (name, etag, type, exportedOn, isFirstAssessment, participantVersion, clientInfo, recordId, app, study)
    ("f1", "e1", "file", "2023-01-02T03:04:05.678", "true", "7", "ios", "r1", "appA", "s1"),
    ("f2", "e2", "file", "2023-06-30T00:00:00", "false", "12", "android", "r2", "appA", "s2"),
    ("f3", "e3", "file", null, null, null, null, "r3", "appB", "s1"),
    ("f4", "e4", "file", "", "", "", "x" * 600, "r4", "appB", "s2")
  ).toDF("name", "etag", "type", "exportedOn", "isFirstAssessment",
    "participantVersion", "clientInfo", "recordId", "app", "study")

  test("retype applies the reference's exact type rules") {
    val out = FileView.retype(viewFixture)
    val t = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(t("name") == StringType && t("etag") == StringType && t("type") == StringType)
    assert(t("exportedOn") == TimestampType)
    assert(t("isFirstAssessment") == BooleanType)
    assert(t("participantVersion") == IntegerType)
    assert(t("clientInfo") == StringType && t("recordId") == StringType)
    val r1 = out.filter($"name" === "f1").head()
    assert(r1.getAs[java.sql.Timestamp]("exportedOn").toString.startsWith("2023-01-02 03:04:05"))
    assert(r1.getAs[Boolean]("isFirstAssessment"))
    assert(r1.getAs[Int]("participantVersion") == 7)
    // nulls and empty strings stay null after cast
    val r3 = out.filter($"name" === "f3").head()
    assert(r3.isNullAt(r3.fieldIndex("exportedOn")))
    val r4 = out.filter($"name" === "f4").head()
    assert(r4.isNullAt(r4.fieldIndex("participantVersion")))
  }

  test("retype is idempotent: a second pass is a no-op") {
    // after one pass the corrected columns are no longer StringType, so
    // the ladder passes them through untouched — re-running an already
    // corrected view (the reference's script CAN run twice against the
    // same study) must neither re-cast nor null anything
    val once = FileView.retype(viewFixture)
    val twice = FileView.retype(once)
    assert(once.schema == twice.schema)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("violationsArray on a frame with no checkable strings is the empty array") {
    val df = viewFixture.select($"participantVersion", $"name") // name is an ignore-col
    val out = df.select(FileView.violationsArray(df).as("v")).head()
    assert(out.getSeq[String](0).isEmpty)
  }

  test("widthViolations flags the over-width clientInfo row only") {
    val v = FileView.widthViolations(viewFixture).collect()
    assert(v.length == 1)
    assert(v.head.getAs[String]("name") == "f4")
    assert(v.head.getSeq[String](v.head.fieldIndex("violations")).head.startsWith("clientInfo:600"))
  }

  test("partitioned sink mirrors the bridge-downstream layout and prunes on read") {
    val root = Files.createTempDirectory("graft_sink").toString
    FileView.sinkPartitioned(FileView.retype(viewFixture), root)
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("app=appA", "app=appB"))
    val back = spark.read.parquet(root).filter($"app" === "appA" && $"study" === "s1")
    assert(back.count() == 1)
    // partition pruning visible in the plan (filters pushed to partition columns)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("app"),
      s"expected partition filters in plan:\n$plan")
  }

  test("fileview scan lists files with metadata only") {
    val fv = FileView.scan(spark, s"$sf/*.parquet")
    assert(fv.count() >= 10)
    assert(fv.columns.toSeq == Seq("path", "file_size", "file_modified"))
  }

  test("clustered sink: per-file key ranges are disjoint and a range read prunes") {
    val dir = Files.createTempDirectory("clustered").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate", "l_quantity")
    FileView.sinkClustered(li, dir, "l_shipdate", numFiles = 8)
    // per-file (min, max) shipdate ranges must not overlap — the property
    // that makes parquet min-max stats prune on key predicates
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(unix_micros(to_utc_timestamp(col("l_shipdate"), "UTC"))),
          max(unix_micros(to_utc_timestamp(col("l_shipdate"), "UTC")))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax <= bMin,
        s"file ranges overlap: $aMax > $bMin")
      case _ =>
    }
    // and a narrow key predicate reads a fraction of the rows via stats
    val cut = spark.read.parquet(dir)
      .agg(max(unix_micros(to_utc_timestamp(col("l_shipdate"), "UTC")))).head().getLong(0)
    val narrow = spark.read.parquet(dir)
      .filter(unix_micros(to_utc_timestamp(col("l_shipdate"), "UTC")) === lit(cut))
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(narrow.count() > 0)
  }

  test("compact: many small files become few, rows and content survive, optional re-cluster holds") {
    val dir = Files.createTempDirectory("compact").toString + "/docs"
    val docs = Tables.documents(spark, sf)
    docs.repartition(37).write.mode("overwrite").parquet(dir)
    val nFilesBefore = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFilesBefore == 37)
    val (before, after, rows) =
      FileView.compact(spark, dir, sortKey = Some("doc_id"))
    assert(before == 37 && after == 1L)
    assert(rows == docs.count())
    // content identical after the swap
    val back = spark.read.schema(Tables.documentsSchema).parquet(dir)
    assert(back.count() == rows)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // temp/old siblings cleaned up
    val parent = new java.io.File(dir).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("docs"),
      parent.listFiles().map(_.getName).mkString(","))
    // re-cluster: with sortKey the single output file is doc_id-sorted
    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }

  test("scanAnnotated promotes every annotation key to a column (addAnnotationColumns)") {
    val dir = Files.createTempDirectory("annview").toString
    Tables.region(spark, sf).write.parquet(s"$dir/files")
    val paths = FileView.scan(spark, s"$dir/files/*.parquet")
      .select("path").as[String].collect().sorted
    // sidecar: first file annotated with two keys, second (if any) with one
    val ann = paths.zipWithIndex.map { case (p, i) =>
      if (i == 0) (p, """{"recordId": "r-0", "assessmentId": "a-9"}""")
      else (p, s"""{"recordId": "r-$i"}""")
    }.toSeq.toDF("path", "json")
    val view = FileView.scanAnnotated(spark, s"$dir/files/*.parquet", ann)
    // columns = default view columns ∪ all annotation keys, sorted
    assert(view.columns.toSeq ==
      Seq("path", "file_size", "file_modified", "assessmentId", "recordId"))
    val first = view.orderBy("path").head()
    assert(first.getAs[String]("recordId") == "r-0")
    assert(first.getAs[String]("assessmentId") == "a-9")
    // the promoted draft flows into the reference's re-typing pass
    val typed = FileView.retype(view.withColumnRenamed("assessmentId", "participantVersion")
      .withColumn("participantVersion", lit("7")))
    assert(typed.schema("participantVersion").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("mortonCode interleaves bits; z-ordered sink keeps BOTH key dims compact per file") {
    // interleave correctness on known bit patterns
    val m = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L)).toDF("a", "b")
      .select(FileView.mortonCode(col("a"), col("b"), 3).as("z"))
      .as[Long].collect().toSeq
    // spread(3)=0b101? no: spread(0b11)=0b0101=5; spread(5=0b101)=0b010001=17; z=5|17<<1=39
    assert(m == Seq(0L, 1L, 2L, 39L))

    val dir = Files.createTempDirectory("zorder").toString
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    FileView.sinkZOrdered(o, dir, "o_orderkey", "o_custkey", numFiles = 8)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    // per-file (min,max) spans of EACH key: a narrow predicate on either
    // dimension must overlap only a strict subset of the files — the
    // property a single-key range cluster has for one dim only
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min("o_orderkey"), max("o_orderkey"), min("o_custkey"), max("o_custkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def overlapping(lo: Long, hi: Long, dim: Char): Int = spans.count { s =>
      val (mn, mx) = if (dim == 'a') (s._1, s._2) else (s._3, s._4)
      mn <= hi && lo <= mx
    }
    val aMax = spans.map(_._2).max; val bMax = spans.map(_._4).max
    assert(overlapping(0, aMax / 8, 'a') < files.length,
      s"orderkey not clustered: $spans")
    assert(overlapping(0, bMax / 8, 'b') < files.length,
      s"custkey not clustered: $spans")
  }

  test("scanAnnotated rejects annotation keys that shadow default view columns") {
    val dir = Files.createTempDirectory("anncollide").toString
    Tables.region(spark, sf).write.parquet(s"$dir/files")
    val paths = FileView.scan(spark, s"$dir/files/*.parquet")
      .select("path").as[String].collect().sorted
    val ann = Seq((paths.head, """{"path": "shadow", "recordId": "r-0"}"""))
      .toDF("path", "json")
    val e = intercept[IllegalArgumentException] {
      FileView.scanAnnotated(spark, s"$dir/files/*.parquet", ann)
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
  }

  test("sinkZOrdered clusters BOTH dims when one key's domain is narrower than 1.0") {
    // a fractional score in [0, 0.0255]: the old span-floor-at-1.0 norm
    // compressed it into ~8 of 16 code bits, so the wide key dominated
    // every interleaved pair and this dimension degenerated to unclustered
    val dir = Files.createTempDirectory("zorder-narrow").toString
    val df = (0 until 4096).map(i => (i.toLong, (i % 256) / 10000.0)).toDF("a", "s")
    FileView.sinkZOrdered(df, dir, "a", "s", numFiles = 8)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(min("s"), max("s")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    // a predicate on the narrow key's bottom eighth must skip files
    val hit = spans.count { case (mn, mx) => mn <= 0.0255 / 8 && 0.0 <= mx }
    assert(hit < files.length, s"narrow key not clustered: ${spans.toSeq}")
  }

  test("sinkZOrdered degenerate inputs: empty frame and all-NULL key write cleanly") {
    val dirEmpty = Files.createTempDirectory("zempty").toString + "/out"
    val schema = "a LONG, b LONG"
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL(schema))
    FileView.sinkZOrdered(empty, dirEmpty, "a", "b", numFiles = 4)
    assert(spark.read.parquet(dirEmpty).count() == 0)

    val dirNull = Files.createTempDirectory("znull").toString + "/out"
    val nulls = Seq((Some(1L), Option.empty[Long]), (Some(2L), Option.empty[Long]))
      .toDF("a", "b")
    FileView.sinkZOrdered(nulls, dirNull, "a", "b", numFiles = 4)
    assert(spark.read.parquet(dirNull).count() == 2)
  }

  test("schema evolution: read one dataset across an add + retype change") {
    // the reference's TableSchemaChangeRequest moment
    // (copy_from_template.py:219-232) replayed on a lake layout: v1 files
    // predate the change, v2 files follow it; readEvolved presents ONE
    // table under the post-change contract.
    val root = Files.createTempDirectory("evolve").toString
    // v1: participantVersion still a STRING, no startedOn column yet
    Seq(("r1", "7"), ("r2", "12"))
      .toDF("recordId", "participantVersion")
      .write.parquet(s"$root/v1")
    // v2: participantVersion retyped INT, startedOn ADDED
    Seq(("r3", 3, java.sql.Timestamp.valueOf("2024-05-01 10:00:00")))
      .toDF("recordId", "participantVersion", "startedOn")
      .write.parquet(s"$root/v2")
    val target = StructType(Seq(
      StructField("recordId", StringType),
      StructField("participantVersion", IntegerType),
      StructField("startedOn", TimestampType)))
    val out = FileView.readEvolved(spark, target, s"$root/v1", s"$root/v2")
      .orderBy("recordId")
    // ordered column contract (the orderedColumnIds analogue)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = out.collect()
    assert(rows.length == 3)
    // v1 rows: retyped value, null-filled added column
    assert(rows(0).getAs[Int]("participantVersion") == 7 &&
      rows(0).isNullAt(2))
    assert(rows(1).getAs[Int]("participantVersion") == 12)
    // v2 rows intact
    assert(rows(2).getAs[Int]("participantVersion") == 3 &&
      rows(2).getAs[java.sql.Timestamp]("startedOn") != null)
  }
}
