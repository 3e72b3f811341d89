package graft.sources.v2

import java.util
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 **file-manifest source** — the reference's *file view*
  * (one row per file in a scope, metadata columns;
  * `synapseformation_templates/default.yaml:5-10` `EntityViewSchema` over
  * `includeEntityTypes:['file']`) as a first-class Spark V2 table, the
  * remaining extension surface next to the custom Expression / Rule /
  * Strategy work (SURVEY.md §4.3 route (d)):
  *
  *  - `TableProvider` → `Table` → `ScanBuilder` → `Batch` → per-partition
  *    readers;
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers emit
  *    only the requested fields;
  *  - **filter pushdown** (`SupportsPushDownFilters`): `ext = 'parquet'`,
  *    `path LIKE 'prefix%'` and `size`/`mtime_ms` range predicates are
  *    evaluated DURING the directory walk — pruned files never become
  *    rows (FileManifestSpec asserts via the rowsEmitted counter);
  *  - **partition planning**: one input partition per immediate child
  *    directory of the scope root (+ one for loose root files), so a
  *    scope with many studies walks in parallel — the V2 analogue of the
  *    reference's per-study folder layout
  *    (`copy_from_template.py:316`).
  *
  * Usage: `spark.read.format("graft.sources.v2.FileManifestSource")
  * .load(root)` (or `.option("path", root)`).
  */
class FileManifestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileManifestSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("file-manifest source requires a path"))
    new ManifestTable(root)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object FileManifestSource {
  /** The "default view columns" of the reference's EntityViewSchema. */
  val schema: StructType = new StructType()
    .add("path", StringType, nullable = false)
    .add("name", StringType, nullable = false)
    .add("ext", StringType, nullable = false)
    .add("size", LongType, nullable = false)
    .add("mtime_ms", LongType, nullable = false)
    // the partition identity: immediate child directory of the scope
    // root this file lives under ('' for loose root files) — reported
    // as a KeyGroupedPartitioning key, so per-study aggregations and
    // storage-partitioned joins need no shuffle
    .add("dir", StringType, nullable = false)

  /** Rows emitted across all readers in this JVM — the observable
    * FileManifestSpec uses to prove pushdown prunes work, not just
    * output. (Test-observability only; local-mode readers share the
    * driver JVM.) */
  val rowsEmitted = new AtomicLong(0)
}

private[v2] class ManifestTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"file_manifest($root)"
  override def schema(): StructType = FileManifestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(root)
}

/** The ONE place a source `Filter` is turned into a file-metadata
  * predicate. `pushFilters` accepts exactly the filters this compiles
  * (`compile(f).isDefined`), and the reader evaluates exactly the
  * compiled closures — the accept-set and the evaluation can't drift
  * apart. Spark does not re-check filters reported as pushed, so a
  * pushed-but-unevaluable filter would mean silently wrong rows; the
  * reader therefore THROWS if compile fails on a pushed filter (can
  * only happen if this object changes between plan and execution,
  * i.e. a bug — fail loudly, never fall through to `true`). */
private[v2] object ManifestPredicates {
  def compile(f: Filter): Option[FileMeta => Boolean] = f match {
    case EqualTo("ext", v: String) => Some(_.ext == v)
    case EqualTo("name", v: String) => Some(_.name == v)
    case StringStartsWith("path", v) => Some(_.path.startsWith(v))
    case StringStartsWith("name", v) => Some(_.name.startsWith(v))
    case GreaterThan("size", v: Long) => Some(_.size > v)
    case GreaterThanOrEqual("size", v: Long) => Some(_.size >= v)
    case LessThan("size", v: Long) => Some(_.size < v)
    case LessThanOrEqual("size", v: Long) => Some(_.size <= v)
    case GreaterThan("mtime_ms", v: Long) => Some(_.mtimeMs > v)
    case GreaterThanOrEqual("mtime_ms", v: Long) => Some(_.mtimeMs >= v)
    case LessThan("mtime_ms", v: Long) => Some(_.mtimeMs < v)
    case LessThanOrEqual("mtime_ms", v: Long) => Some(_.mtimeMs <= v)
    case EqualTo("dir", v: String) => Some(_.dir == v)
    case StringStartsWith("dir", v) => Some(_.dir.startsWith(v))
    case _ => None
  }
}

private[v2] case class FileMeta(path: String, name: String, ext: String,
    size: Long, mtimeMs: Long, dir: String)

/** The per-file accumulators an aggregate pushdown compiles to. */
private[v2] sealed trait AggSpec
private[v2] case object CountAll extends AggSpec
private[v2] case class MinOf(field: String) extends AggSpec
private[v2] case class MaxOf(field: String) extends AggSpec
private[v2] case class SumOf(field: String) extends AggSpec

private[v2] class ManifestScanBuilder(root: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = FileManifestSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[(Seq[String], Seq[AggSpec])] = None

  /** Aggregate pushdown (PARTIAL): count/min/max/sum over the long
    * metadata fields, optionally grouped by `dir`, fold into the
    * directory walk itself — the scan returns ONE pre-aggregated row
    * per partition instead of one row per file, and Spark's final
    * aggregate merges the partials. "How many files / how big is the
    * scope" — the manifest query every pipeline run starts with —
    * never materializes a file row. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    def longField(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 &&
          (f.fieldNames()(0) == "size" || f.fieldNames()(0) == "mtime_ms") =>
          Some(f.fieldNames()(0))
        case _ => None
      }
    val groups: Option[Seq[String]] =
      agg.groupByExpressions.toSeq.foldLeft(Option(Seq.empty[String])) {
        case (Some(acc), f: NamedReference)
          if f.fieldNames.length == 1 && f.fieldNames()(0) == "dir" => Some(acc :+ "dir")
        case _ => None
      }
    val specs: Option[Seq[AggSpec]] =
      agg.aggregateExpressions.toSeq.foldLeft(Option(Seq.empty[AggSpec])) {
        case (Some(acc), _: CountStar) => Some(acc :+ CountAll)
        case (Some(acc), m: Min) => longField(m.column).map(acc :+ MinOf(_))
        case (Some(acc), m: Max) => longField(m.column).map(acc :+ MaxOf(_))
        case (Some(acc), s: Sum) if !s.isDistinct => longField(s.column).map(acc :+ SumOf(_))
        case _ => None
      }
    (groups, specs) match {
      case (Some(g), Some(sp)) if sp.nonEmpty =>
        pushedAgg = Some((g, sp)); true
      case _ => false
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) =
      filters.partition(ManifestPredicates.compile(_).isDefined)
    pushed = accepted
    rejected // Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = pushedAgg match {
    case Some((groups, specs)) => new ManifestAggScan(root, pushed, groups, specs)
    case None => new ManifestScan(root, required, pushed)
  }
}

private[v2] case class ManifestPartition(dir: String, recursive: Boolean, key: String)
    extends InputPartition with HasPartitionKey {
  // all rows this partition emits share dir == key, which is what makes
  // the KeyGroupedPartitioning report below sound
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(key)))
}

private[v2] class ManifestScan(root: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics with SupportsReportPartitioning
    with SupportsRuntimeFiltering {

  /** Dynamic partition pruning for the V2 source: when this scan sits
    * under a join whose other side filters `dir`, Spark evaluates that
    * side first and calls [[filter]] with the surviving dir values —
    * BEFORE partitions are planned. A 10 000-study scope joined to one
    * study's metadata then walks ONE directory. Runtime filters arrive
    * as `In(dir, values)`/`EqualTo(dir, v)`; anything else is ignored
    * (pruning is an optimization, correctness comes from the join). */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("dir"))

  @volatile private var runtimeDirs: Option[Set[String]] = None

  override def filter(filters: Array[Filter]): Unit = {
    val dirs = filters.collect {
      case In("dir", vs) => vs.collect { case s: String => s }.toSet
      case EqualTo("dir", v: String) => Set(v)
    }
    if (dirs.nonEmpty) runtimeDirs = Some(dirs.reduce(_ intersect _))
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Rows are grouped by `dir` by construction (one input partition per
    * child directory), so report a KeyGroupedPartitioning on it: with
    * `spark.sql.sources.v2.bucketing.enabled`, a per-study groupBy or a
    * storage-partitioned join on `dir` plans with NO shuffle. Only
    * claimable when `dir` survives column pruning — otherwise the key
    * can't be resolved against the scan output. */
  override def outputPartitioning(): Partitioning =
    if (required.fieldNames.contains("dir"))
      new KeyGroupedPartitioning(Array(Expressions.identity("dir")), plannedPartitions.length)
    else new UnknownPartitioning(plannedPartitions.length)

  /** Cost-based-optimizer food: estimated rows = a cheap file count of
    * the scope (no stats = Spark assumes huge = never broadcasts a
    * manifest join). Fixed per-row width: 5 metadata columns ≈ 200 B. */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val fileCount: Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        val it = s.iterator()
        var n = 0L
        while (it.hasNext && n < 10_000_000L) { if (java.nio.file.Files.isRegularFile(it.next())) n += 1 }
        n
      } finally s.close()
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(fileCount * 200L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(fileCount)
  }
  override def description(): String =
    s"FileManifest root=$root PushedFilters=[${pushed.mkString(", ")}] " +
      s"ReadSchema=${required.fieldNames.mkString(",")}"

  /** One partition per immediate child directory (parallel walk of a
    * many-study scope) + one non-recursive partition for loose root
    * files. Pushed `dir` predicates prune WHOLE SUBTREES here, at plan
    * time — a filtered-out study directory is never even walked (the
    * source-level analogue of parquet partition pruning). */
  private var cachedParts: Option[(Option[Set[String]], Array[InputPartition])] = None

  def plannedPartitions: Array[InputPartition] = synchronized {
    cachedParts match {
      case Some((k, parts)) if k == runtimeDirs => parts
      case _ =>
        val parts = computePartitions()
        cachedParts = Some((runtimeDirs, parts))
        parts
    }
  }

  private def computePartitions(): Array[InputPartition] = {
    val rootPath = java.nio.file.Paths.get(root)
    require(java.nio.file.Files.isDirectory(rootPath), s"not a directory: $root")
    val dirPreds: Array[String => Boolean] = pushed.collect {
      case EqualTo("dir", v: String) => (k: String) => k == v
      case StringStartsWith("dir", v) => (k: String) => k.startsWith(v)
    }
    def keep(key: String): Boolean =
      dirPreds.forall(_(key)) && runtimeDirs.forall(_.contains(key))
    val children = java.nio.file.Files.list(rootPath)
    val dirs = try {
      import scala.jdk.CollectionConverters._
      children.iterator().asScala.filter(java.nio.file.Files.isDirectory(_))
        .map(_.toString).toArray.sorted
    } finally children.close()
    val subdirParts = dirs.map(d =>
        ManifestPartition(d, recursive = true, key = new java.io.File(d).getName))
      .filter(p => keep(p.key))
    val rootPart = Some(ManifestPartition(root, recursive = false, key = ""))
      .filter(p => keep(p.key))
    (subdirParts ++ rootPart).toArray[InputPartition]
  }

  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(required, pushed)
}

private[v2] class ManifestReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestReader(partition.asInstanceOf[ManifestPartition], required, pushed)
}

/** Walks one directory partition, applying pushed filters BEFORE emitting
  * — a pruned file costs one stat, never a row. */
private[v2] class ManifestReader(part: ManifestPartition, required: StructType,
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {

  // compiled once from the SAME compiler pushFilters used; a filter that
  // was pushed but no longer compiles is a plan/execution drift → throw
  private val preds: Array[FileMeta => Boolean] = pushed.map { f =>
    ManifestPredicates.compile(f).getOrElse(throw new IllegalStateException(
      s"filter $f was reported as pushed but has no compiled predicate"))
  }

  private val files: Iterator[FileMeta] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(part.dir)
    val stream =
      if (part.recursive) java.nio.file.Files.walk(p)
      else java.nio.file.Files.list(p)
    // materialize stat results so the JDK stream closes eagerly; one
    // partition = one directory subtree, bounded by the scope layout
    val out = try {
      stream.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map { f =>
          val name = f.getFileName.toString
          val dot = name.lastIndexOf('.')
          FileMeta(f.toString, name, if (dot < 0) "" else name.substring(dot + 1),
            java.nio.file.Files.size(f),
            java.nio.file.Files.getLastModifiedTime(f).toMillis, part.key)
        }
        .filter(m => preds.forall(_(m)))
        .toVector
    } finally stream.close()
    out.iterator
  }

  private var cur: FileMeta = _

  override def next(): Boolean =
    if (files.hasNext) { cur = files.next(); true } else false

  override def get(): InternalRow = {
    FileManifestSource.rowsEmitted.incrementAndGet()
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      row.update(i, required.fields(i).name match {
        case "path" => UTF8String.fromString(cur.path)
        case "name" => UTF8String.fromString(cur.name)
        case "ext" => UTF8String.fromString(cur.ext)
        case "size" => cur.size
        case "mtime_ms" => cur.mtimeMs
        case "dir" => UTF8String.fromString(cur.dir)
      })
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}

/** The aggregate-pushdown scan: same partition planning and pushed
  * filters as [[ManifestScan]], but each reader emits ONE row of
  * partial aggregates per directory partition (group columns first,
  * then one column per [[AggSpec]]); Spark's final aggregate merges
  * them. A count over a million-file scope moves one row per study. */
private[v2] class ManifestAggScan(root: String, pushed: Array[Filter],
    groups: Seq[String], specs: Seq[AggSpec]) extends Scan with Batch
    with SupportsReportPartitioning {

  /** Grouped-by-dir partials are still one-partition-per-dir, so the
    * KeyGroupedPartitioning report carries over: the FINAL aggregate
    * over the partials also needs no exchange. */
  override def outputPartitioning(): Partitioning =
    if (groups.contains("dir"))
      new KeyGroupedPartitioning(Array(Expressions.identity("dir")), planInputPartitions().length)
    else new UnknownPartitioning(planInputPartitions().length)

  override def readSchema(): StructType = {
    val g = groups.foldLeft(new StructType())((s, n) => s.add(n, StringType, nullable = false))
    specs.foldLeft(g) {
      case (s, CountAll) => s.add("count", LongType, nullable = false)
      case (s, MinOf(f)) => s.add(s"min_$f", LongType, nullable = true)
      case (s, MaxOf(f)) => s.add(s"max_$f", LongType, nullable = true)
      case (s, SumOf(f)) => s.add(s"sum_$f", LongType, nullable = true)
    }
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"FileManifest root=$root PushedFilters=[${pushed.mkString(", ")}] " +
      s"PushedAggregation=[groupBy=${groups.mkString(",")} aggs=${specs.mkString(",")}]"

  // one listing for the scan's lifetime: planInputPartitions() and
  // outputPartitioning() are each called (possibly repeatedly) during
  // planning, and a fresh ManifestScan per call re-listed the root
  private lazy val partitions: Array[InputPartition] =
    new ManifestScan(root, FileManifestSource.schema, pushed).plannedPartitions

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestAggReaderFactory(pushed, groups, specs)
}

private[v2] class ManifestAggReaderFactory(pushed: Array[Filter],
    groups: Seq[String], specs: Seq[AggSpec]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestAggReader(partition.asInstanceOf[ManifestPartition], pushed, groups, specs)
}

/** Walks one partition accumulating the pushed aggregates; emits a
  * single partial row. GLOBAL aggregation emits count=0/null partials
  * for empty partitions (a global agg always has a result row); GROUPED
  * aggregation emits nothing for them — a group with no input rows must
  * not exist, per SQL semantics. */
private[v2] class ManifestAggReader(part: ManifestPartition, pushed: Array[Filter],
    groups: Seq[String], specs: Seq[AggSpec]) extends PartitionReader[InternalRow] {

  private val preds: Array[FileMeta => Boolean] = pushed.map { f =>
    ManifestPredicates.compile(f).getOrElse(throw new IllegalStateException(
      s"filter $f was reported as pushed but has no compiled predicate"))
  }

  private var emitted = false

  private lazy val partial: Option[InternalRow] = {
    import scala.jdk.CollectionConverters._
    var count = 0L
    val mins = scala.collection.mutable.Map.empty[String, Long]
    val maxs = scala.collection.mutable.Map.empty[String, Long]
    val sums = scala.collection.mutable.Map.empty[String, Long]
    val p = java.nio.file.Paths.get(part.dir)
    val stream =
      if (part.recursive) java.nio.file.Files.walk(p)
      else java.nio.file.Files.list(p)
    try {
      stream.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach { f =>
          val name = f.getFileName.toString
          val dot = name.lastIndexOf('.')
          val m = FileMeta(f.toString, name, if (dot < 0) "" else name.substring(dot + 1),
            java.nio.file.Files.size(f),
            java.nio.file.Files.getLastModifiedTime(f).toMillis, part.key)
          if (preds.forall(_(m))) {
            count += 1
            def fv(field: String): Long = if (field == "size") m.size else m.mtimeMs
            specs.foreach {
              case MinOf(fl) => val v = fv(fl); if (!mins.contains(fl) || v < mins(fl)) mins(fl) = v
              case MaxOf(fl) => val v = fv(fl); if (!maxs.contains(fl) || v > maxs(fl)) maxs(fl) = v
              case SumOf(fl) => sums(fl) = sums.getOrElse(fl, 0L) + fv(fl)
              case CountAll => ()
            }
          }
        }
    } finally stream.close()
    if (count == 0 && groups.nonEmpty) None
    else {
      val vals = new Array[Any](groups.length + specs.length)
      groups.zipWithIndex.foreach { case (_, i) => vals(i) = UTF8String.fromString(part.key) }
      specs.zipWithIndex.foreach { case (spec, i) =>
        vals(groups.length + i) = spec match {
          case CountAll => count
          case MinOf(fl) => mins.get(fl).map(Long.box).orNull
          case MaxOf(fl) => maxs.get(fl).map(Long.box).orNull
          case SumOf(fl) => if (count == 0) null else Long.box(sums.getOrElse(fl, 0L))
        }
      }
      Some(new GenericInternalRow(vals))
    }
  }

  override def next(): Boolean =
    if (emitted || partial.isEmpty) false else { emitted = true; true }
  override def get(): InternalRow = partial.get
  override def close(): Unit = ()
}
