package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's central abstraction re-expressed on Spark: a **file
  * view** — a table with one row per file in a scope plus its metadata and
  * annotations (`synapseformation_templates/default.yaml:5-10`:
  * `EntityViewSchema`, `includeEntityTypes:['file']`,
  * `addDefaultViewColumns`, `addAnnotationColumns`), followed by the
  * reference's type-correction pass (`src/copy_from_template.py:164-232`)
  * and the partitioned S3-style parquet sink
  * (`src/copy_from_template.py:316`: `bridge-downstream/{app}/{study}/parquet/`).
  */
object FileView {

  /** One row per file: path/size/mtime (the "default view columns") —
    * metadata only, content is never read (`binaryFile` prunes the
    * `content` column when unselected). Annotations, in Bridge, ride as a
    * JSON sidecar/annotation map; callers join or `from_json` them on. */
  def scan(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(
        col("path"),
        col("length").as("file_size"),
        col("modificationTime").as("file_modified"))

  /** The reference's exact re-typing vocabulary
    * (`src/copy_from_template.py:177-190`, verbatim). */
  val ignoreCols: Seq[String] = Seq("name", "etag", "type")
  val dateCols: Seq[String] = Seq(
    "exportedOn", "eventTimestamp", "uploadedOn", "scheduleModifiedOn", "startedOn")
  val booleanCols: Seq[String] = Seq(
    "timeWindowPersistent", "isFirstAssessment", "isLastAssessment", "schedulePublished")
  val intCols: Seq[String] = Seq(
    "sessionInstanceStartDay", "sessionInstanceEndDay", "assessmentRevision", "participantVersion")
  val xlStrFields: Seq[String] = Seq("clientInfo", "appInfo")
  val xlStrLength = 512  // copy_from_template.py:166,207-208
  val defaultStrLength = 128  // copy_from_template.py:167,209-210

  /** The re-typing pass as one projection (`copy_from_template.py:194-218`
    * branch ladder): STRING date→TIMESTAMP, "true"/"false"→BOOLEAN,
    * digits→INT; ignore-cols and non-string cols pass through untouched —
    * the reference's "don't rewrite what doesn't change" posture.
    * Strings stay STRING (width is validation, not storage — see
    * [[widthViolations]]). One narrow projection, no shuffle. */
  def retype(df: DataFrame): DataFrame = {
    // try_-variants: schema-on-read data has empty strings / malformed
    // values, and Spark 4 runs ANSI mode by default (a plain cast throws).
    // Malformed -> NULL mirrors the view semantics the reference corrects.
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      if (ignoreCols.contains(f.name) || f.dataType != StringType) c
      else if (dateCols.contains(f.name)) try_to_timestamp(c).as(f.name)
      else if (booleanCols.contains(f.name)) expr(s"try_cast(`${f.name}` AS BOOLEAN)").as(f.name)
      else if (intCols.contains(f.name)) expr(s"try_cast(`${f.name}` AS INT)").as(f.name)
      else c
    }
    df.select(cols.toSeq: _*)
  }

  /** Rows violating the reference's string-width contract
    * (`maximumSize`: 512 for clientInfo/appInfo, 128 default). */
  def widthViolations(df: DataFrame): DataFrame = {
    val checks = df.schema.fields.collect {
      case f if f.dataType == StringType && !ignoreCols.contains(f.name) =>
        val max = if (xlStrFields.contains(f.name)) xlStrLength else defaultStrLength
        when(length(col(f.name)) > max,
          concat_ws(":", lit(f.name), length(col(f.name)).cast("string")))
    }
    if (checks.isEmpty) df.sparkSession.emptyDataFrame
    else df
      .withColumn("violations", array_compact(array(checks.toSeq: _*)))
      .filter(size(col("violations")) > 0)
  }

  /** Partitioned parquet sink mirroring the S3 layout
    * `bridge-downstream/{app}/{study}/parquet/`
    * (`copy_from_template.py:316`). Stable key order = prunable prefixes.
    * Scale note: callers repartition on the partition keys first when the
    * key count is small, so each (app, study) writes few large files
    * instead of numPartitions small ones. */
  def sinkPartitioned(df: DataFrame, root: String, keys: Seq[String] = Seq("app", "study"),
      mode: String = "overwrite"): Unit =
    df.write.partitionBy(keys: _*).mode(mode).parquet(root)

  /** RANGE-CLUSTERED parquet sink: repartitionByRange + sortWithinPartitions
    * on the cluster key before writing, so each output file covers a
    * narrow, near-disjoint key range. That's what makes parquet
    * row-group/file min-max statistics actually SKIP data on key
    * predicates — on a hash-distributed write every file spans the whole
    * key domain and the stats prune nothing. The write-side half of
    * predicate pushdown at 100 TB (the read side is free once the layout
    * exists). FileViewSpec asserts the per-file ranges are disjoint and
    * that a range read touches a fraction of the files. */
  def sinkClustered(df: DataFrame, root: String, clusterKey: String,
      numFiles: Int, mode: String = "overwrite"): Unit =
    df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(clusterKey))
      .sortWithinPartitions(clusterKey)
      .write.mode(mode).parquet(root)
}
