package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** The WIDENED DSv2 batch source (round 13, VERDICT r12 ask #1):
  * merge-on-read deletes and column-ID schema evolution served through
  * the declarative scan, answer-identical to
  * [[graft.sources.Snapshots.readSnapshot]] — plus the remaining loud
  * edges (non-widening re-types). */
class SnapshotBatchFullSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_dsv2full/$name"
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    root
  }

  private def batchRead(root: String) =
    spark.read.format("graft.sources.v2.SnapshotBatchSource")
      .option("root", root).load()

  private def sameAsReadSnapshot(root: String): Unit = {
    val cols = Snapshots.readSnapshot(spark, root).columns.toSeq
    val a = batchRead(root).orderBy(cols.map(col): _*).collect().toSeq
    val b = Snapshots.readSnapshot(spark, root).orderBy(cols.map(col): _*)
      .collect().toSeq
    assert(a == b, s"DSv2 full read diverged from readSnapshot on $root")
  }

  test("equality deletes apply in the reader: sequence scoping, merge, re-insert") {
    val root = freshRoot("del")
    Snapshots.commitAppend(spark, root,
      (1L to 10L).map(i => (i, s"t$i")).toDF("id", "tag").coalesce(1))
    Snapshots.commitDelete(spark, root, Seq(3L, 7L).toDF("id"))
    assert(batchRead(root).count() == 8L)
    sameAsReadSnapshot(root)
    // re-insert: the new file's version exceeds the delete's — survives
    Snapshots.commitAppend(spark, root, Seq((3L, "t3b")).toDF("id", "tag").coalesce(1))
    assert(batchRead(root).filter(col("id") === 3L).collect()
      .map(_.getString(1)).toSeq == Seq("t3b"))
    sameAsReadSnapshot(root)
    // merge (delete + data in ONE version): latest-wins upsert
    Snapshots.commitMerge(spark, root,
      Seq((5L, "t5new"), (99L, "t99")).toDF("id", "tag"), Seq("id"))
    assert(batchRead(root).filter(col("id") === 5L).collect()
      .map(_.getString(1)).toSeq == Seq("t5new"))
    sameAsReadSnapshot(root)
    // file skipping composes with deletes: the pushed filter still
    // prunes data files, and the surviving rows still honor the deletes
    val filtered = batchRead(root).filter(col("id") <= 4L)
    assert(filtered.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("column pruning with deletes: the key column is read for the filter, not emitted") {
    val root = freshRoot("delproj")
    Snapshots.commitAppend(spark, root,
      (1L to 6L).map(i => (i, s"t$i", i * 10.0)).toDF("id", "tag", "score").coalesce(1))
    Snapshots.commitDelete(spark, root, Seq(2L, 4L).toDF("id"))
    // projection EXCLUDES the delete key — the reader must still fetch
    // it to apply the delete, then emit only the projection
    val tags = batchRead(root).select("tag").collect().map(_.getString(0)).sorted.toSeq
    assert(tags == Seq("t1", "t3", "t5", "t6"))
    // count(*) (empty projection) under deletes
    assert(batchRead(root).count() == 4L)
    // and the aggregate pushdown correctly DECLINES under deletes (a
    // manifest count would over-count) — answered by the scan instead
    val agg = batchRead(root).agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(agg.head.getLong(0) == 4L)
  }

  test("column-ID evolution through the scan: rename, drop/re-add, NULL backfill") {
    val root = freshRoot("evo")
    Snapshots.commitAppend(spark, root,
      (1L to 10L).map(i => (i, s"s$i", i * 100L)).toDF("id", "src", "v").coalesce(1))
    Snapshots.initSchema(spark, root)
    Snapshots.renameColumn(spark, root, "src", "origin")
    Snapshots.commitAppend(spark, root,
      (11L to 20L).map(i => (i, s"s$i", i * 100L)).toDF("id", "origin", "v").coalesce(1))
    // pre-rename files serve under the NEW name
    assert(batchRead(root).columns.toSeq == Seq("id", "origin", "v"))
    assert(batchRead(root).filter(col("id") === 1L).head.getString(1) == "s1")
    sameAsReadSnapshot(root)
    // drop then re-add same name: old values must NOT resurface
    Snapshots.dropColumn(spark, root, "v")
    Snapshots.addColumn(spark, root, "v", "BIGINT")
    Snapshots.commitAppend(spark, root,
      Seq((21L, "s21", 777L)).toDF("id", "origin", "v").coalesce(1))
    val vs = batchRead(root).select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(vs(1L) == -1L, "dropped data resurfaced under a re-added name")
    assert(vs(21L) == 777L)
    sameAsReadSnapshot(root)
    // pruning on the renamed column still skips files (stats by id)
    val parts = batchRead(root).filter(col("id") <= 10L).rdd.getNumPartitions
    assert(parts == 1, s"rename must not defeat file skipping: $parts")
    // deletes compose with evolution in the same scan
    Snapshots.commitDelete(spark, root, Seq(1L, 21L).toDF("id"))
    assert(batchRead(root).count() == 19L)
    sameAsReadSnapshot(root)
  }

  test("additive mergeSchema through the declarative scan: NULL backfill, pruning pinned, deletes compose") {
    // round 15, VERDICT r14 ask #2 — the untracked additive-mergeSchema
    // loud edge retired: plain .load() on a table that GREW a column
    // serves the union schema, old files reading NULL, answer-identical
    // to readSnapshot(mergeSchema = true)
    val root = freshRoot("grow")
    Snapshots.commitAppend(spark, root,
      (1L to 10L).map(i => (i, s"t$i")).toDF("id", "tag").coalesce(1))
    Snapshots.commitAppend(spark, root,
      (11L to 20L).map(i => (i, s"t$i", i * 1.5)).toDF("id", "tag", "score").coalesce(1))
    val df = batchRead(root)
    assert(df.columns.toSeq == Seq("id", "tag", "score"))
    val scores = df.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(scores(1L).isNaN, "pre-growth file must read NULL for the grown column")
    assert(scores(15L) == 22.5)
    // answer ≡ the explicit mergeSchema API
    val a = df.orderBy("id").collect().toSeq
    val b = Snapshots.readSnapshot(spark, root, mergeSchema = true)
      .select("id", "tag", "score").orderBy("id").collect().toSeq
    assert(a == b, "DSv2 additive read diverged from readSnapshot(mergeSchema=true)")
    // manifest pruning still pinned: a selective id filter plans 1 file
    assert(df.filter(col("id") <= 5L).rdd.getNumPartitions == 1,
      "growth must not defeat file skipping")
    // filter ON the grown column: the statless old file is kept (missing
    // stat = cannot exclude) and its NULL rows drop in the residual
    val hot = df.filter(col("score") > 20.0)
    assert(hot.rdd.getNumPartitions == 2)
    assert(hot.count() == 7L)
    // VERSION time travel below the growth reads the old shape
    assert(spark.read.format("graft.sources.v2.SnapshotBatchSource")
      .option("root", root).option("version", "1").load()
      .columns.toSeq == Seq("id", "tag"))
    // merge-on-read deletes compose with the additive bindings
    Snapshots.commitDelete(spark, root, Seq(3L, 13L).toDF("id"))
    assert(batchRead(root).count() == 18L)
    assert(batchRead(root).orderBy("id").collect().toSeq ==
      Snapshots.readSnapshot(spark, root, mergeSchema = true)
        .select("id", "tag", "score").orderBy("id").collect().toSeq)
    // a CONFLICTING re-type across commits is not additive — loud, with
    // the readSnapshot route named
    val bad = freshRoot("grow_conflict")
    Snapshots.commitAppend(spark, bad, Seq((1L, 1L)).toDF("id", "v").coalesce(1))
    Snapshots.commitAppend(spark, bad, Seq((2L, "s")).toDF("id", "v").coalesce(1))
    val e = intercept[Exception] { batchRead(bad).collect() }
    assert(e.getMessage.contains("conflicting types"), e.getMessage)
  }

  test("lossless widening casts in-scan; non-widening re-types stay loud") {
    val root = freshRoot("widen")
    Snapshots.commitAppend(spark, root,
      (1 to 5).map(i => (i.toLong, i)).toDF("id", "v").coalesce(1)) // v: INT
    Snapshots.initSchema(spark, root)
    Snapshots.alterColumnType(spark, root, "v", "BIGINT")
    Snapshots.commitAppend(spark, root,
      Seq((6L, 600000000000L)).toDF("id", "v").coalesce(1)) // v: BIGINT
    val out = batchRead(root)
    assert(out.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(out.agg(sum("v")).head.getLong(0) == 15L + 600000000000L)
    sameAsReadSnapshot(root)
    // a non-widening re-type (INT history → DOUBLE is fine, → STRING is
    // not) fails at PLANNING with the route to readSnapshot
    val root2 = freshRoot("widenbad")
    Snapshots.commitAppend(spark, root2,
      Seq((1L, 5)).toDF("id", "v").coalesce(1))
    Snapshots.initSchema(spark, root2)
    Snapshots.alterColumnType(spark, root2, "v", "STRING")
    val e = intercept[Exception] { batchRead(root2).collect() }
    assert(e.getMessage.contains("readSnapshot"),
      s"non-widening re-type must route to readSnapshot: ${e.getMessage}")
    // ...and readSnapshot itself still serves it (Spark cast semantics)
    assert(Snapshots.readSnapshot(spark, root2).head.getString(1) == "5")
  }

  test("randomized equivalence: commits, deletes, renames, widens — DSv2 ≡ readSnapshot") {
    val rnd = new scala.util.Random(13)
    val root = freshRoot("fuzz")
    Snapshots.commitAppend(spark, root,
      (1 to 20).map(i => (i.toLong, rnd.nextInt(100), s"x$i")).toDF("id", "v", "tag")
        .coalesce(1))
    Snapshots.initSchema(spark, root)
    var nextId = 21L
    var tagName = "tag"
    for (step <- 1 to 12) {
      rnd.nextInt(4) match {
        case 0 => // append a small batch under the current schema
          val rows = (0 until 5).map { _ =>
            val i = nextId; nextId += 1; (i, rnd.nextInt(100), s"x$i")
          }
          Snapshots.commitAppend(spark, root,
            rows.toDF("id", "v", tagName).coalesce(1))
        case 1 => // delete a random slice — alternating KEY COLUMNS, so
          // the fuzz also exercises mixed-key delete composition (the
          // r13 in-round find: per-delete-file key resolution)
          if (rnd.nextBoolean()) {
            val ids = (1L until nextId).filter(_ => rnd.nextInt(10) == 0)
            if (ids.nonEmpty) Snapshots.commitDelete(spark, root, ids.toDF("id"))
          } else {
            val vs = (0 until 100).filter(_ => rnd.nextInt(25) == 0).map(_.toString)
            if (vs.nonEmpty)
              Snapshots.commitDelete(spark, root, vs.map(_.toInt).toDF("v"))
          }
        case 2 => // rename the tag column back and forth (blocked by pending deletes)
          val to = if (tagName == "tag") "label" else "tag"
          try { Snapshots.renameColumn(spark, root, tagName, to); tagName = to }
          catch { case _: IllegalArgumentException => () } // pending deletes: skip
        case 3 => () // no-op round
      }
      val cols = Snapshots.readSnapshot(spark, root).columns.toSeq
      val a = batchRead(root).orderBy(cols.map(col): _*).collect().toSeq
      val b = Snapshots.readSnapshot(spark, root).orderBy(cols.map(col): _*)
        .collect().toSeq
      assert(a == b, s"step $step diverged")
    }
  }

  test("SQL catalog serves evolved tables through the same full scan") {
    val root = freshRoot("sqlfull")
    Snapshots.commitAppend(spark, root,
      (1L to 8L).map(i => (i, s"s$i")).toDF("id", "src").coalesce(1))
    Snapshots.initSchema(spark, root)
    Snapshots.renameColumn(spark, root, "src", "origin")
    Snapshots.commitDelete(spark, root, Seq(2L).toDF("id"))
    spark.conf.set("spark.sql.catalog.snap", "graft.sources.v2.SnapshotCatalog")
    val out = spark.sql(s"SELECT origin FROM snap.`$root` WHERE id <= 3 ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("s1", "s3"))
  }
}
