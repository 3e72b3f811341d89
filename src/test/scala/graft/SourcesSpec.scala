package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink round-trips beyond parquet (csv, json, orc, codecs) with
  * explicit schemas — the ingestion-boundary surface (SURVEY §1.2). */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val region = Tables.region(spark, sf)

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    region.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(Tables.regionSchema).option("header", "true").csv(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("json round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString
    region.write.mode("overwrite").json(dir)
    val back = spark.read.schema(Tables.regionSchema).json(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("orc round-trip") {
    val dir = Files.createTempDirectory("graft_orc").toString
    region.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(Tables.regionSchema).orc(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("parquet zstd codec round-trip") {
    val dir = Files.createTempDirectory("graft_zstd").toString
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .option("compression", "zstd").parquet(dir)
    val back = spark.read.schema(Tables.lineitemSchema).parquet(dir)
    assert(back.count() == Tables.lineitem(spark, sf).count())
    assert(new java.io.File(dir).listFiles().exists(_.getName.contains("zstd")))
  }
}
