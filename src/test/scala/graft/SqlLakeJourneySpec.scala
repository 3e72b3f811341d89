package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** The round-13 SQL lake surface composed as ONE user story — what a
  * data engineer actually types, end to end, with no engine-specific
  * API after the first commit: ingest by INSERT, correct by DELETE,
  * maintain by clustering, audit by `$files`, debug by VERSION AS OF,
  * and tail the same name as a stream. Each step's invariant is
  * asserted where a real deployment would alarm. */
class SqlLakeJourneySpec extends SparkTestBase {
  import spark.implicits._

  test("ingest → correct → cluster → audit → time-travel → stream, all by table name") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_sqljourney/lake"
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.conf.set("spark.sql.catalog.snap", "graft.sources.v2.SnapshotCatalog")
    val t = s"snap.`$root`"

    // 1. bootstrap through the API (DDL is deliberately not SQL), then
    //    every later write goes through plain SQL
    Snapshots.commitAppend(spark, root,
      (1L to 40L).map(i => (i, s"g${i % 4}", i * 10)).toDF("id", "grp", "v")
        .coalesce(1))

    // 2. continuous ingest: INSERT INTO (scattered ids — realistic)
    (41L to 80L).map(i => (i, s"g${i % 4}", i * 10)).toDF("id", "grp", "v")
      .createOrReplaceTempView("batch2")
    spark.sql(s"INSERT INTO $t SELECT * FROM batch2")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 80L)

    // 3. compliance correction: DELETE one group (equality-delete commit)
    spark.sql(s"DELETE FROM $t WHERE grp = 'g2'")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 60L)
    val vAfterDelete = Snapshots.currentVersion(spark, root)

    // 4. maintenance: clustering REPLACE materializes the delete away
    //    and makes range predicates prune
    Snapshots.commitReplaceClustered(spark, root, Seq("id"), numFiles = 4)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 60L)
    val (kept, total) = Snapshots.pruneCounts(spark, root,
      Seq[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.LessThanOrEqual("id", 20L)))
    assert(kept < total, s"clustered table must prune: $kept/$total")

    // 5. ops audit: the $files listing agrees with the table
    val audit = spark.sql(
      s"SELECT count(*) AS files, sum(row_count) AS rows FROM snap.`$root$$files`").head
    assert(audit.getLong(1) == 60L)

    // 6. debugging: time travel reads the pre-delete world
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 2").head.getLong(0) == 80L)
    assert(spark.sql(
      s"SELECT count(*) FROM $t VERSION AS OF $vAfterDelete WHERE grp = 'g2'")
      .head.getLong(0) == 0L)

    // 7. the same name as a STREAM: a late commit arrives as one batch
    val stream = spark.readStream.table(t)
    val (q, ckpt) = {
      val c = java.nio.file.Files.createTempDirectory("journeyck").toString
      val q0 = stream.writeStream.option("checkpointLocation", c)
        .outputMode("append").format("memory").queryName("journey_sink").start()
      (q0, c)
    }
    try {
      q.processAllAvailable()
      assert(spark.table("journey_sink").count() == 60L)
      (81L to 90L).map(i => (i, "g9", i * 10)).toDF("id", "grp", "v")
        .createOrReplaceTempView("batch3")
      spark.sql(s"INSERT INTO $t SELECT * FROM batch3")
      q.processAllAvailable()
      assert(spark.table("journey_sink").count() == 70L)
      assert(spark.table("journey_sink").filter(col("grp") === "g9").count() == 10L)
    } finally {
      q.stop()
      val cp = new Path(ckpt)
      cp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(cp, true)
    }
  }
}
