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

  test("equality deletes: merge-on-read drops matching rows; pinned readers keep them; re-insert survives") {
    val root = freshRoot("del")
    val v1 = Snapshots.commitAppend(spark, root, table(10, "a").coalesce(1))
    val v2 = Snapshots.commitDelete(spark, root, Seq(2L, 4L, 6L).toDF("id"))
    assert(v2 == 2L)
    val afterDel = Snapshots.readSnapshot(spark, root, v2)
    assert(afterDel.count() == 7)
    assert(afterDel.filter(col("id").isin(2L, 4L, 6L)).count() == 0)
    // snapshot isolation covers deletes: the v1 reader still sees all 10
    assert(Snapshots.readSnapshot(spark, root, v1).count() == 10)
    // sequence scoping: re-inserting a deleted key AFTER the delete survives
    val v3 = Snapshots.commitAppend(spark, root, Seq((4L, "re")).toDF("id", "tag").coalesce(1))
    val afterRe = Snapshots.readSnapshot(spark, root, v3)
    assert(afterRe.count() == 8)
    assert(afterRe.filter(col("id") === 4L).select("tag").as[String].collect().toSeq == Seq("re"),
      "only the re-inserted copy of id=4 may survive")
    // a second delete (later version) kills the re-insert too; deletes accumulate
    val v4 = Snapshots.commitDelete(spark, root, Seq(4L, 8L).toDF("id"))
    val afterDel2 = Snapshots.readSnapshot(spark, root, v4)
    assert(afterDel2.count() == 6)
    assert(afterDel2.filter(col("id").isin(2L, 4L, 6L, 8L)).count() == 0)
    // a REPLACE materializes deletes away: fresh table, no delete entries
    val v5 = Snapshots.commitReplace(spark, root, Snapshots.readSnapshot(spark, root, v4).coalesce(1))
    assert(Snapshots.readSnapshot(spark, root, v5).count() == 6)
    // after the purge, re-inserting a previously deleted key is clean
    val v6 = Snapshots.commitAppend(spark, root, Seq((2L, "back")).toDF("id", "tag").coalesce(1))
    assert(Snapshots.readSnapshot(spark, root, v6).filter(col("id") === 2L).count() == 1)
  }

  test("commitMerge: one atomic version upserts — updates replace, inserts land, rest untouched") {
    val root = freshRoot("merge")
    val v1 = Snapshots.commitAppend(spark, root, table(6, "orig").coalesce(1))
    // update ids 2,4; insert id 9 — all in ONE commit
    val v2 = Snapshots.commitMerge(spark, root,
      Seq((2L, "upd"), (4L, "upd"), (9L, "new")).toDF("id", "tag").coalesce(1),
      keyCols = Seq("id"))
    assert(v2 == 2L)
    val rows = Snapshots.readSnapshot(spark, root, v2)
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "orig", 2L -> "upd", 3L -> "orig",
      4L -> "upd", 5L -> "orig", 6L -> "orig", 9L -> "new"))
    // atomicity/isolation: the pinned v1 reader sees none of the merge
    assert(Snapshots.readSnapshot(spark, root, v1)
      .filter(col("tag") =!= "orig").count() == 0)
    // a later delete still kills merged rows (sequence order respected)
    val v3 = Snapshots.commitDelete(spark, root, Seq(2L).toDF("id"))
    assert(Snapshots.readSnapshot(spark, root, v3).count() == 6)
  }

  test("readAppendedSince refuses a range containing a delete commit") {
    val root = freshRoot("cdcdel")
    val v1 = Snapshots.commitAppend(spark, root, table(6, "a").coalesce(1))
    Snapshots.commitDelete(spark, root, Seq(1L).toDF("id"))
    val v3 = Snapshots.commitAppend(spark, root, table(3, "b").coalesce(1))
    val e = intercept[IllegalArgumentException] {
      Snapshots.readAppendedSince(spark, root, v1, v3)
    }
    assert(e.getMessage.contains("row deletes"))
  }

  test("additive schema evolution: merged read NULLs old rows' new columns; evolution composes with deletes") {
    val root = freshRoot("evo")
    Snapshots.commitAppend(spark, root, Seq((1L, "a"), (2L, "a")).toDF("id", "tag").coalesce(1))
    Snapshots.commitAppend(spark, root,
      Seq((3L, "b", 30L), (4L, "b", 40L)).toDF("id", "tag", "extra").coalesce(1))
    val merged = Snapshots.readSnapshot(spark, root, mergeSchema = true)
      .select("id", "tag", "extra").as[(Long, String, Option[Long])].collect().toSet
    assert(merged == Set((1L, "a", None), (2L, "a", None),
      (3L, "b", Some(30L)), (4L, "b", Some(40L))))
    // the merge-on-read delete path still works on the evolved table
    Snapshots.commitDelete(spark, root, Seq(1L, 3L).toDF("id"))
    val after = Snapshots.readSnapshot(spark, root, mergeSchema = true)
      .select("id").as[Long].collect().toSet
    assert(after == Set(2L, 4L))
  }

  test("snapshotDiff tags row-level adds and dels across a REPLACE") {
    val root = freshRoot("diff")
    val v1 = Snapshots.commitReplace(spark, root, table(6, "a").coalesce(1))   // ids 1..6
    val v2 = Snapshots.commitReplace(spark, root,
      (4 to 9).map(i => (i.toLong, "a")).toDF("id", "tag").coalesce(1))        // ids 4..9
    val diff = Snapshots.snapshotDiff(spark, root, v1, v2)
      .select("change", "id").as[(String, Long)].collect().toSet
    assert(diff == Set(("add", 7L), ("add", 8L), ("add", 9L),
      ("del", 1L), ("del", 2L), ("del", 3L)))
  }

  test("concurrent appenders all commit; no append is lost; versions are dense") {
    val root = freshRoot("conc")
    val writers = 6
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to writers).map { w =>
      Future(Snapshots.commitAppend(spark, root,
        Seq((w.toLong, s"w$w")).toDF("id", "tag").coalesce(1)))
    }
    val versions = Await.result(Future.sequence(fs), 120.seconds)
    assert(versions.sorted == (1L to writers.toLong),
      s"every writer must win a distinct dense version, got $versions")
    val rows = Snapshots.readSnapshot(spark, root).select("tag").as[String].collect().toSet
    assert(rows == (1 to writers).map(w => s"w$w").toSet, "no append may be lost")
  }

  test("commitMergeOnce: a replayed txn id is skipped; an unmarked replay still converges (idempotent merge)") {
    val root = freshRoot("once")
    Snapshots.commitAppend(spark, root, table(4, "orig").coalesce(1))
    val up = Seq((2L, "new")).toDF("id", "tag").coalesce(1)
    val v2 = Snapshots.commitMergeOnce(spark, root, up, Seq("id"), "b-0")
    assert(v2 == 2L)
    // replay with the SAME txn id: no new version
    assert(Snapshots.commitMergeOnce(spark, root, up, Seq("id"), "b-0") == 2L)
    assert(Snapshots.currentVersion(spark, root) == 2L)
    // crash-window simulation: the commit landed but the marker didn't —
    // an unmarked replay re-merges, creating a version but the SAME state
    val v3 = Snapshots.commitMerge(spark, root, up, Seq("id"))
    assert(v3 == 3L)
    val rows = Snapshots.readSnapshot(spark, root)
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "orig", 2L -> "new", 3L -> "orig", 4L -> "orig"))
  }

  test("model-based protocol check: random append/delete/merge/replace sequences match a reference model at EVERY version") {
    // The executable semantics of the whole commit surface, checked
    // against an in-memory model under randomized (seeded, reproducible)
    // op sequences — every historical version must read back exactly the
    // model's multiset (snapshot isolation + time travel + the
    // strictly-earlier delete-scoping rule, under arbitrary mixes).
    final case class ModelRow(id: Long, tag: String, ver: Long)
    final case class ModelDel(id: Long, ver: Long)
    for (seed <- Seq(11, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      def freshRows(n: Int, v: Long): Seq[(Long, String)] =
        (1 to n).map(_ => (rnd.nextInt(12).toLong, s"v$v-${rnd.nextInt(100)}"))
      val root2 = freshRoot(s"model$seed")
      var rs = Vector.empty[ModelRow]; var ds = Vector.empty[ModelDel]
      def vis: Seq[(Long, String)] =
        rs.filter(r => !ds.exists(d => d.id == r.id && d.ver > r.ver)).map(r => (r.id, r.tag))
      val exp = scala.collection.mutable.Map.empty[Long, Map[(Long, String), Int]]
      var cur = 0L
      def commit(op: Int): Unit = {
        cur += 1
        op match {
          case 0 => // append
            val rws = freshRows(1 + rnd.nextInt(3), cur)
            Snapshots.commitAppend(spark, root2, rws.toDF("id", "tag").coalesce(1))
            rs ++= rws.map { case (i, t) => ModelRow(i, t, cur) }
          case 1 => // delete random keys
            val keys = (1 to 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(12).toLong).distinct
            Snapshots.commitDelete(spark, root2, keys.toDF("id"))
            ds ++= keys.map(ModelDel(_, cur))
          case 2 => // merge (upsert)
            val rws = freshRows(1 + rnd.nextInt(3), cur)
            Snapshots.commitMerge(spark, root2, rws.toDF("id", "tag").coalesce(1), Seq("id"))
            ds ++= rws.map(_._1).distinct.map(ModelDel(_, cur))
            rs ++= rws.map { case (i, t) => ModelRow(i, t, cur) }
          case 3 => // replace (also clears delete files)
            val rws = freshRows(2 + rnd.nextInt(3), cur)
            Snapshots.commitReplace(spark, root2, rws.toDF("id", "tag").coalesce(1))
            rs = rws.map { case (i, t) => ModelRow(i, t, cur) }.toVector
            ds = Vector.empty
        }
        exp(cur) = vis.groupBy(identity).view.mapValues(_.size).toMap
      }
      commit(0) // seed the table
      for (_ <- 1 to 7) commit(rnd.nextInt(4))
      for ((ver, want) <- exp) {
        val got = Snapshots.readSnapshot(spark, root2, ver)
          .select("id", "tag").as[(Long, String)].collect()
          .groupBy(identity).view.mapValues(_.size).toMap
        assert(got == want, s"seed=$seed version=$ver: got $got want $want")
      }
    }
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
