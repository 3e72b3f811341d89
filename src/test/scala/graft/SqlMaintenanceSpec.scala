package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** SQL-reachable lake maintenance (round 15, VERDICT r14 ask #3):
  * `CALL snap.system.<verb>(...)` through the Spark 4 procedure catalog
  * ([[graft.sources.v2.SnapshotProcedures]]). The load-bearing
  * assertions: every verb is ANSWER-INVARIANT on the table's content
  * (maintenance rearranges storage, never data), compact/zorder
  * actually change the layout (pruning starts biting), vacuum ends
  * time travel exactly below `keep_from`, and the orphan sweep honors
  * its grace gate — all driven from SQL text alone. */
class SqlMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.snap", "graft.sources.v2.SnapshotCatalog")

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_sqlmaint/$name"
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    root
  }

  private def scatteredTable(name: String): String = {
    val root = freshRoot(name)
    // hash-scattered ingest: every file spans the full id range, so
    // pruning skips nothing until a clustering rewrite fixes the layout
    for (k <- 0 until 4)
      Snapshots.commitAppend(spark, root,
        (1L to 200L).filter(_ % 4 == k).map(i => (i, i * 3)).toDF("id", "v")
          .coalesce(1))
    root
  }

  test("CALL system.compact: content invariant, layout clustered, pruning bites") {
    val root = scatteredTable("compact")
    val before = spark.sql(s"SELECT * FROM snap.`$root`").collect().toSet
    assert(spark.sql(s"SELECT id FROM snap.`$root` WHERE id <= 50")
      .rdd.getNumPartitions == 4, "scattered ingest: nothing prunes yet")
    val res = spark.sql(
      s"CALL snap.system.compact(table => '$root', sort_cols => 'id', num_files => 4)")
    assert(res.columns.toSeq == Seq("new_version", "n_files"))
    val row = res.head
    assert(row.getLong(0) == 5L, "one REPLACE commit")
    assert(row.getLong(1) == 4L)
    assert(spark.sql(s"SELECT * FROM snap.`$root`").collect().toSet == before,
      "maintenance must not change answers")
    assert(spark.sql(s"SELECT id FROM snap.`$root` WHERE id <= 50")
      .rdd.getNumPartitions == 1, "clustered layout: selective read prunes to 1 file")
  }

  test("CALL system.zorder: content invariant, BOTH keys prune after") {
    val root = freshRoot("zorder")
    for (k <- 0 until 4)
      Snapshots.commitAppend(spark, root,
        (0L until 400L).filter(_ % 4 == k).map(i => (i % 20, i / 20, i))
          .toDF("a", "b", "v").coalesce(1))
    val before = spark.sql(s"SELECT * FROM snap.`$root`").collect().toSet
    spark.sql(
      s"CALL snap.system.zorder(table => '$root', key_a => 'a', key_b => 'b', num_files => 4)")
    assert(spark.sql(s"SELECT * FROM snap.`$root`").collect().toSet == before)
    assert(spark.sql(s"SELECT v FROM snap.`$root` WHERE a < 5")
      .rdd.getNumPartitions < 4, "z-order must prune on key_a")
    assert(spark.sql(s"SELECT v FROM snap.`$root` WHERE b < 5")
      .rdd.getNumPartitions < 4, "z-order must prune on key_b")
  }

  test("CALL system.vacuum ends time travel below keep_from; current answers hold") {
    val root = scatteredTable("vacuum")
    val cur = Snapshots.currentVersion(spark, root)
    val before = spark.sql(s"SELECT * FROM snap.`$root`").collect().toSet
    val res = spark.sql(
      s"CALL snap.system.vacuum(table => '$root', keep_from => $cur)")
    assert(res.columns.toSeq == Seq("files_deleted"))
    assert(spark.sql(s"SELECT * FROM snap.`$root`").collect().toSet == before)
    // versions below keep_from are gone; the kept version still reads
    intercept[Exception] {
      spark.sql(s"SELECT * FROM snap.`$root` VERSION AS OF 1").collect()
    }
    assert(spark.sql(s"SELECT * FROM snap.`$root` VERSION AS OF $cur").count() == 200L)
  }

  test("CALL system.remove_orphans honors the grace gate and sweeps stale strays") {
    val root = scatteredTable("orphans")
    // plant a stray commit-private file no manifest references
    val stray = new Path(root, "data/c-stray/part-stray.parquet")
    val fs = stray.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(stray); out.write(1); out.close()
    // young stray survives a long grace
    val kept = spark.sql(
      s"CALL snap.system.remove_orphans(table => '$root', grace_seconds => 3600)")
      .head.getLong(0)
    assert(kept == 0L, "grace period must protect young unreferenced files")
    assert(fs.exists(stray))
    // zero grace (test-only posture) sweeps it; answers invariant
    val swept = spark.sql(
      s"CALL snap.system.remove_orphans(table => '$root', grace_seconds => 0)")
      .head.getLong(0)
    // the stray plus the writer jobs' unreferenced _SUCCESS markers
    assert(swept >= 1L)
    assert(!fs.exists(stray))
    assert(spark.sql(s"SELECT count(*) FROM snap.`$root`").head.getLong(0) == 200L)
  }

  test("SHOW PROCEDURES lists the verbs; unknown verb and bad namespace decline loudly") {
    val names = spark.sql("SHOW PROCEDURES IN snap.system")
      .collect().map(_.mkString("|"))
    graft.sources.v2.SnapshotProcedures.Names.foreach(n =>
      assert(names.exists(_.contains(n)), s"$n missing from SHOW PROCEDURES: ${names.toSeq}"))
    val root = scatteredTable("loud")
    val e1 = intercept[Exception] {
      spark.sql(s"CALL snap.system.frobnicate(table => '$root')").collect()
    }
    assert(e1.getMessage != null)
    val e2 = intercept[Exception] {
      spark.sql(s"CALL snap.compact(table => '$root')").collect()
    }
    assert(e2.getMessage != null)
    // a maintenance call against a non-table is loud too
    val e3 = intercept[Exception] {
      spark.sql("CALL snap.system.vacuum(table => '/nonexistent/t', keep_from => 1)").collect()
    }
    assert(e3.getMessage != null)
  }

  test("compact via CALL is claim-serialized with concurrent writers (no lost update)") {
    val root = scatteredTable("concurrent")
    // a concurrent append lands between the rewrite's read and publish:
    // the validated RMW loop must retry and carry it — run them truly
    // concurrently and assert nothing is lost
    val appender = new Thread(() => {
      Snapshots.commitAppend(spark, root,
        Seq((999L, 999L)).toDF("id", "v").coalesce(1))
    })
    appender.start()
    spark.sql(s"CALL snap.system.compact(table => '$root', sort_cols => 'id', num_files => 2)")
    appender.join()
    val ids = spark.sql(s"SELECT id FROM snap.`$root`").collect().map(_.getLong(0)).toSet
    assert(ids.size == 201 && ids.contains(999L),
      "concurrent append must survive a SQL compact")
  }
}
