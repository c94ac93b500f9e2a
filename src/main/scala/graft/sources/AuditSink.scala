package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-audit` — a DataSource V2 SINK implementing the two-phase
  * distributed commit protocol (the write-side twin of the `graft-docs`
  * read connector; together they cover both directions of the connector
  * API the reference hard-wires — its output is an unconditional
  * file write, `SVDMovieLensSparkJava.java:472-476`).
  *
  * What it writes is a commit-time AUDIT MANIFEST, not rows: each task's
  * `DataWriter` folds its partition into an order-independent digest
  * (modular sum over a designated long column, the q140 arithmetic) and
  * ships ONLY the (rows, digest) `WriterCommitMessage`; the driver's
  * `commit()` merges messages into the published result. The protocol
  * properties this demonstrates are exactly what a 100 TB sink needs:
  *
  *  - **no partial visibility**: nothing publishes until every task's
  *    message reaches `commit()`; speculative/retried task attempts
  *    produce messages Spark discards, and `abort()` publishes nothing.
  *  - **commutative merge**: the digest is a modular sum, so task
  *    completion order, partitioning, and retries cannot change the
  *    committed value (AuditSinkSpec proves partitioning-independence).
  *  - **append vs truncate**: `overwrite` mode routes through
  *    `SupportsTruncate`, replacing the manifest atomically; `append`
  *    merges — both as single driver-side updates.
  *
  * Usage: `df.write.format("graft-audit").option("target", name)
  * .option("digestColumn", "doc_id").mode(...).save()`, then
  * `AuditSink.result(name)`.
  */
class AuditSinkSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audit"
  // write-only: the schema always comes from the query being written
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AuditSinkTable(schema)
}

object AuditSink {
  val Mod = 1000000007L

  final case class Manifest(rows: Long, digest: Long) {
    def merge(o: Manifest): Manifest =
      Manifest(rows + o.rows, (digest + o.digest) % Mod)
  }

  private val manifests = new ConcurrentHashMap[String, Manifest]()

  def result(target: String): Option[Manifest] = Option(manifests.get(target))
  def clear(target: String): Unit = { manifests.remove(target): Unit }

  private[sources] def publish(target: String, m: Manifest, truncate: Boolean): Unit =
    manifests.merge(target, m,
      (old, n) => if (truncate) n else old.merge(n)): Unit
}

final class AuditSinkTable(schema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft-audit"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val target = Option(info.options.get("target")).getOrElse("default")
    val digestCol = Option(info.options.get("digestColumn")).getOrElse("doc_id")
    val idx = info.schema().fieldIndex(digestCol)
    require(info.schema().fields(idx).dataType == LongType,
      s"digestColumn '$digestCol' must be LongType")
    new AuditWriteBuilder(target, idx, truncate = false)
  }
}

final class AuditWriteBuilder(target: String, digestIdx: Int, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new AuditWriteBuilder(target, digestIdx, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AuditBatchWrite(target, digestIdx, truncate)
  }
}

final case class AuditCommit(rows: Long, digest: Long) extends WriterCommitMessage

final class AuditBatchWrite(target: String, digestIdx: Int, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val idx = digestIdx // serialize only the index, not `this`
    (_: Int, _: Long) => new DataWriter[InternalRow] {
      private var rows = 0L
      private var digest = 0L
      override def write(r: InternalRow): Unit = {
        rows += 1
        digest = (digest + math.floorMod(r.getLong(idx), AuditSink.Mod)) % AuditSink.Mod
      }
      override def commit(): WriterCommitMessage = AuditCommit(rows, digest)
      override def abort(): Unit = () // nothing staged outside this object
      override def close(): Unit = ()
    }
  }

  /** Driver-side: merges per-task messages and publishes atomically —
    * the only point where the manifest becomes visible.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val merged = messages.foldLeft(AuditSink.Manifest(0L, 0L)) { (acc, m) =>
      val c = m.asInstanceOf[AuditCommit]
      acc.merge(AuditSink.Manifest(c.rows, c.digest))
    }
    AuditSink.publish(target, merged, truncate)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
