package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, PrimitiveType, Type => PType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Recursive parquet-mr `Group` → Catalyst conversion for the snapshot
  * readers (round 14, VERDICT r13 ask #4 — the non-primitive scope edge
  * of the DSv2 snapshot scan retired): STRUCT, ARRAY and MAP columns
  * now plan through the declarative scan, because the reference's own
  * data model is semi-structured (annotations → MapType, `props` JSON →
  * struct, embeddings → array — SURVEY §1.2), so the first real table
  * hits them.
  *
  * Scope, loud not silent:
  *  - the parquet layout is the STANDARD modern one (LIST = 3-level
  *    `list`/`element`, MAP = `key_value{key,value}` — what Spark's own
  *    writer emits with `writeLegacyFormat=false`, the default);
  *    legacy 2-level lists throw with the layout named;
  *  - nested columns never carry manifest statistics (the stats
  *    collector already drops them — missing always means "keep"), so
  *    filters on nested fields filter rows but never prune files;
  *  - schema EVOLUTION of nested columns is identity-only in the DSv2
  *    path (a re-typed struct routes to `readSnapshot`, loud), and the
  *    SQL write path stays primitive-only (nested tables are written
  *    through the `commitAppend` API — Spark's parquet writer).
  */
private[v2] object GroupConverters {

  /** Parquet type → Catalyst type, recursive. Loud on layouts outside
    * the declared scope. */
  def toSparkType(t: PType): DataType =
    if (t.isPrimitive) primitiveSparkType(t.asPrimitiveType())
    else {
      val g = t.asGroupType()
      g.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          val repeated = listRepeated(g)
          val elem = repeated.getType(0)
          ArrayType(toSparkType(elem), containsNull = elem.getRepetition != PType.Repetition.REQUIRED)
        case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
          val kv = g.getType(0).asGroupType()
          MapType(toSparkType(kv.getType(0)), toSparkType(kv.getType(1)),
            valueContainsNull = kv.getType(1).getRepetition != PType.Repetition.REQUIRED)
        case null =>
          StructType(g.getFields.asScala.map { f =>
            // a BARE repeated field inside a struct (legacy writers; Spark
            // always wraps arrays in the LIST annotation) would silently
            // read only its first occurrence — loud instead
            require(f.getRepetition != PType.Repetition.REPEATED,
              s"snapshot scan: bare repeated field '${f.getName}' inside " +
                s"struct '${g.getName}' uses a legacy layout — read it via " +
                "Snapshots.readSnapshot")
            StructField(f.getName, toSparkType(f),
              nullable = f.getRepetition != PType.Repetition.REQUIRED)
          }.toSeq)
        case other => throw new IllegalArgumentException(
          s"snapshot scan: unsupported group annotation $other on '${g.getName}'")
      }
    }

  private def primitiveSparkType(p: PrimitiveType): DataType =
    (p.getPrimitiveTypeName, p.getLogicalTypeAnnotation) match {
      case (PrimitiveType.PrimitiveTypeName.INT64,
        ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
        if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS =>
        if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
      case (PrimitiveType.PrimitiveTypeName.INT64,
        null | (_: LogicalTypeAnnotation.IntLogicalTypeAnnotation)) => LongType
      case (PrimitiveType.PrimitiveTypeName.INT32,
        _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) => DateType
      case (PrimitiveType.PrimitiveTypeName.INT32,
        null | (_: LogicalTypeAnnotation.IntLogicalTypeAnnotation)) => IntegerType
      case (PrimitiveType.PrimitiveTypeName.DOUBLE, _) => DoubleType
      case (PrimitiveType.PrimitiveTypeName.FLOAT, _) => FloatType
      case (PrimitiveType.PrimitiveTypeName.BOOLEAN, _) => BooleanType
      case (PrimitiveType.PrimitiveTypeName.BINARY, ann)
        if ann == LogicalTypeAnnotation.stringType() => StringType
      case (other, ann) => throw new IllegalArgumentException(
        s"snapshot scan: unsupported parquet type $other ($ann) for '${p.getName}'")
    }

  /** The repeated inner group of a standard 3-level LIST; loud on the
    * legacy 2-level layout. */
  private def listRepeated(g: GroupType): GroupType = {
    val inner = g.getType(0)
    require(!inner.isPrimitive && inner.getRepetition == PType.Repetition.REPEATED &&
      inner.asGroupType().getFieldCount == 1,
      s"snapshot scan reads the standard 3-level parquet LIST layout; " +
        s"'${g.getName}' uses a legacy layout — read it via Snapshots.readSnapshot")
    inner.asGroupType()
  }

  /** Read field `i` of `g` (repetition `idx`) as Catalyst `dt`. The
    * caller has already checked the repetition count (null handling). */
  def read(g: Group, i: Int, idx: Int, dt: DataType): Any = dt match {
    case LongType => g.getLong(i, idx)
    case IntegerType => g.getInteger(i, idx)
    case DoubleType => g.getDouble(i, idx)
    case FloatType => g.getFloat(i, idx)
    case BooleanType => g.getBoolean(i, idx)
    case StringType => UTF8String.fromBytes(g.getBinary(i, idx).getBytes)
    case DateType => g.getInteger(i, idx)
    case TimestampType | TimestampNTZType => g.getLong(i, idx)
    case st: StructType => readStruct(g.getGroup(i, idx), st)
    case at: ArrayType =>
      val listGroup = g.getGroup(i, idx)
      val n = if (listGroup.getType.getFieldCount == 0) 0
        else listGroup.getFieldRepetitionCount(0)
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        val elemHolder = listGroup.getGroup(0, j)
        out(j) =
          if (elemHolder.getFieldRepetitionCount(0) == 0) null
          else read(elemHolder, 0, 0, at.elementType)
        j += 1
      }
      new GenericArrayData(out)
    case mt: MapType =>
      val mapGroup = g.getGroup(i, idx)
      val n = if (mapGroup.getType.getFieldCount == 0) 0
        else mapGroup.getFieldRepetitionCount(0)
      val keys = new Array[Any](n)
      val vals = new Array[Any](n)
      var j = 0
      while (j < n) {
        val kv = mapGroup.getGroup(0, j)
        keys(j) = read(kv, 0, 0, mt.keyType) // map keys are required
        vals(j) =
          if (kv.getFieldRepetitionCount(1) == 0) null
          else read(kv, 1, 0, mt.valueType)
        j += 1
      }
      ArrayBasedMapData(keys, vals)
    case other => throw new IllegalStateException(
      s"snapshot scan: unsupported catalyst type $other")
  }

  /** One nested struct Group → InternalRow, positional. */
  def readStruct(g: Group, st: StructType): InternalRow = {
    val n = st.length
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      vals(i) =
        if (g.getFieldRepetitionCount(i) == 0) null
        else read(g, i, 0, st(i).dataType)
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }
}
