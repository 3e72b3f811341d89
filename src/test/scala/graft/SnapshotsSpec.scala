package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** The manifest-versioned commit protocol, exercised directly: append /
  * replace visibility, snapshot isolation under concurrent commits,
  * time travel, crash-invisible `.tmp` manifests, and vacuum's
  * keep-boundary semantics (round 10). */
class SnapshotsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_snapspec/$name"
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    root
  }

  private def table(n: Int, tag: String) =
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")

  test("append carries prior files; replace starts a fresh list; both read back exactly") {
    val root = freshRoot("basic")
    assert(Snapshots.currentVersion(spark, root) == 0L)
    val v1 = Snapshots.commitAppend(spark, root, table(10, "a").coalesce(1))
    val v2 = Snapshots.commitAppend(spark, root, table(5, "b").coalesce(1))
    assert((v1, v2) == (1L, 2L))
    assert(Snapshots.readSnapshot(spark, root, v1).count() == 10)
    assert(Snapshots.readSnapshot(spark, root, v2).count() == 15)
    assert(Snapshots.fileCount(spark, root, v2) == 2)
    val v3 = Snapshots.commitReplace(spark, root, table(3, "c").coalesce(1))
    assert(Snapshots.readSnapshot(spark, root, v3).count() == 3)
    assert(Snapshots.fileCount(spark, root, v3) == 1)
    // time travel below the replace still reads the old data
    assert(Snapshots.readSnapshot(spark, root, v2).count() == 15)
    // default read = current version
    assert(Snapshots.readSnapshot(spark, root).count() == 3)
  }

  test("snapshot isolation: a reader pinned before later commits is unaffected by them") {
    val root = freshRoot("iso")
    val v1 = Snapshots.commitAppend(spark, root, table(7, "a").coalesce(1))
    val pinned = Snapshots.readSnapshot(spark, root, v1)
    Snapshots.commitAppend(spark, root, table(100, "b").coalesce(1))
    Snapshots.commitReplace(spark, root, table(1, "c").coalesce(1))
    assert(pinned.count() == 7, "pinned reader must see only its frozen manifest")
    assert(pinned.filter(col("tag") =!= "a").count() == 0)
  }

  test("a .tmp manifest from a writer killed mid-commit is invisible") {
    val root = freshRoot("crash")
    Snapshots.commitAppend(spark, root, table(4, "a").coalesce(1))
    // simulate the crash: a half-written v2 manifest that never renamed
    val tmp = new Path(root, "_manifests/v00002.list.tmp")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    out.write("bogus/path.parquet\n".getBytes("UTF-8")); out.close()
    assert(Snapshots.currentVersion(spark, root) == 1L)
    assert(Snapshots.readSnapshot(spark, root).count() == 4)
    // the next real commit claims version 2 normally
    val v2 = Snapshots.commitAppend(spark, root, table(2, "b").coalesce(1))
    assert(v2 == 2L && Snapshots.readSnapshot(spark, root, v2).count() == 6)
  }

  test("vacuum deletes only files unreachable from kept versions; kept reads survive") {
    val root = freshRoot("vacuum")
    val v1 = Snapshots.commitAppend(spark, root, table(10, "a").coalesce(1))
    val v2 = Snapshots.commitAppend(spark, root, table(5, "b").coalesce(1))
    val v3 = Snapshots.commitReplace(spark, root, table(3, "c").coalesce(1))
    // keep from v2: v1's file is STILL referenced by v2 (append carry) →
    // nothing deletable except... nothing; manifest v1 goes away
    val d1 = Snapshots.vacuum(spark, root, keepFrom = v2)
    assert(d1 == 0L, "v1's data is carried by v2's manifest and must survive")
    intercept[IllegalArgumentException] { Snapshots.readSnapshot(spark, root, v1) }
    assert(Snapshots.readSnapshot(spark, root, v2).count() == 15)
    // keep from v3: the replace references neither append file → both go
    val d2 = Snapshots.vacuum(spark, root, keepFrom = v3)
    assert(d2 == 2L)
    assert(Snapshots.readSnapshot(spark, root, v3).count() == 3)
  }

  test("readAppendedSince reads exactly the delta; a REPLACE in between fails the append-only contract") {
    val root = freshRoot("cdc")
    val v1 = Snapshots.commitAppend(spark, root, table(6, "a").coalesce(1))
    val v2 = Snapshots.commitAppend(spark, root, table(4, "b").coalesce(1))
    val delta = Snapshots.readAppendedSince(spark, root, v1, v2)
    assert(delta.count() == 4)
    assert(delta.filter(col("tag") =!= "b").count() == 0,
      "the delta must contain ONLY the appended commit's rows")
    val v3 = Snapshots.commitReplace(spark, root, table(2, "c").coalesce(1))
    val e = intercept[IllegalArgumentException] {
      Snapshots.readAppendedSince(spark, root, v1, v3)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("registered lake_snapshot query: versions, counts, file counts, isolation flag") {
    val out = QueriesCore.lakeSnapshot(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val o = Tables.orders(spark, sf)
    val c1 = o.filter(col("o_orderkey") % 3 === 0).count()
    val c2 = c1 + o.filter(col("o_orderkey") % 3 === 1).count()
    assert(out(0)._2 == c1 && out(1)._2 == c2 && out(2)._2 == o.count())
    assert(out.map(_._3).toSeq == Seq(2L, 4L, 1L))
    assert(out.forall(_._4), "the pinned reader must have been isolated")
  }
}
