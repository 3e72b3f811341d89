package graft.sources.v2

import java.util
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 **metering blackhole sink** — the write-side complement
  * of [[FileManifestSource]], demonstrating the V2 write surface
  * (`WriteBuilder` → `BatchWrite` → per-task `DataWriter` → driver-side
  * `commit`) with the exactly-once commit protocol done right:
  *
  *  - each task writer counts rows/bytes locally and reports them ONLY in
  *    its `WriterCommitMessage` (a speculative/retried task that aborts
  *    contributes nothing — the driver aggregates committed messages, so
  *    metrics are exactly-once even under task retry);
  *  - rows are consumed completely (every field of every row is read), so
  *    benchmarking through this sink measures the full unpruned plan —
  *    like Spark's built-in `noop`, plus the committed metrics
  *    ([[BlackholeSink.lastCommit]]) that `noop` doesn't expose.
  *
  * Usage: `df.write.format("graft.sources.v2.BlackholeSink")
  * .mode("overwrite").save()`.
  */
class BlackholeSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new BlackholeTable
  override def supportsExternalMetadata(): Boolean = true
}

object BlackholeSink {
  /** (rows, bytes) of the last COMMITTED batch write in this JVM —
    * aggregated from task commit messages on the driver. */
  val lastCommitRows = new AtomicLong(0)
  val lastCommitBytes = new AtomicLong(0)
}

private[v2] class BlackholeTable extends Table with SupportsWrite {
  override def name(): String = "blackhole"
  override def schema(): StructType = new StructType()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new BlackholeWriteBuilder
}

private[v2] class BlackholeWriteBuilder extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this // nothing to truncate
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BlackholeBatchWrite
  }
}

private[v2] case class BlackholeCommit(rows: Long, bytes: Long) extends WriterCommitMessage

private[v2] class BlackholeBatchWrite extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BlackholeWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L; var bytes = 0L
    messages.foreach { case BlackholeCommit(r, b) => rows += r; bytes += b }
    BlackholeSink.lastCommitRows.set(rows)
    BlackholeSink.lastCommitBytes.set(bytes)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[v2] class BlackholeWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        // consume the full row so nothing upstream can be pruned away
        bytes += (record match {
          case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => u.getSizeInBytes.toLong
          case other => other.numFields.toLong * 8L
        })
      }
      override def commit(): WriterCommitMessage = BlackholeCommit(rows, bytes)
      override def abort(): Unit = () // aborted tasks report nothing
      override def close(): Unit = ()
    }
}
