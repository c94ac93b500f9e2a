package graft.sources

import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-docs` — a DataSource V2 synthetic-corpus generator (the
  * engine-extension sibling of `plans.AsOfJoinExec`, on the source side
  * of the API). The reference hard-wires its one input format into the
  * engine (`SVDMovieLensSparkJava.java:116-121` reads a fixed NFS path
  * inside the constructor); here the equivalent capability is a
  * first-class pluggable connector the planner can optimize through:
  *
  *  - **partition-parallel generation**: rows are a pure function of
  *    doc_id, so each of `slices` input partitions generates its own
  *    contiguous id range — no driver materialization, no shuffle, and
  *    at 100 TB the generator scales exactly like a parquet scan.
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): only the
  *    projected columns are generated; `text` costs nothing when a
  *    query reads metadata columns.
  *  - **filter pushdown** (`SupportsPushDownFilters`): doc_id range
  *    predicates clamp the generated interval at PLAN time, so whole
  *    slices vanish before any task launches — the source-level twin of
  *    parquet partition pruning.
  *  - **statistics** (`SupportsReportStatistics`): exact post-pushdown
  *    row count, so the planner can (e.g.) choose a broadcast join for
  *    a clamped read without a manual hint.
  *
  * Row semantics (all pure arithmetic — the DuckDB oracle regenerates
  * them from `range()`, which is the correctness proof for the whole
  * connector):
  * {{{
  *   doc_id  = id
  *   lang    = ["en","en","en","en","de","de","fr","fr","es","zh"][id % 10]
  *   n_chars = 50 + (id * 37) % 200
  *   text    = "doc-" + id + "-" + "x" * (id % 7)
  * }}}
  * Options: `rows` (corpus size, default 1000), `slices` (input
  * partitions, default 8). SourceV2Spec drives pruning/pushdown/stats
  * through the public classes; q139 runs it through the oracle gate.
  */
class SyntheticDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.fullSchema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SyntheticDocsTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      slices = Option(properties.get("slices")).map(_.toInt).getOrElse(8),
      rowsPerBatch = Option(properties.get("rowsPerBatch")).map(_.toLong).getOrElse(100L))
}

object SyntheticDocs {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs =
    Array("en", "en", "en", "en", "de", "de", "fr", "fr", "es", "zh")

  /** One generated column value; ids are non-negative so `%` is safe. */
  def value(column: String, id: Long): Any = column match {
    case "doc_id" => id
    case "lang" => UTF8String.fromString(langs((id % 10).toInt))
    case "n_chars" => 50L + (id * 37) % 200
    case "text" =>
      UTF8String.fromString(s"doc-$id-" + "x" * ((id % 7).toInt))
  }
}

final class SyntheticDocsTable(rows: Long, slices: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-docs($rows)"
  override def schema(): StructType = SyntheticDocs.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, slices, rowsPerBatch)
}

final class SyntheticDocsScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long = 100L)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = SyntheticDocs.fullSchema
  private var lo: Long = 0L
  private var hi: Long = rows // generated interval is [lo, hi)
  private var accepted: Array[Filter] = Array.empty
  private var aggFuncs: Option[Array[AggregateFunc]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT clamps the generated interval (any `n` rows satisfy an
    * unordered LIMIT, and the clamp keeps them id-contiguous). Spark
    * pushes limits after filters, so [lo, hi) is already final; the
    * default `isPartiallyPushed` keeps Spark's own Limit above the scan,
    * so a tighter-than-requested clamp could only ever under-report —
    * which the exact clamp never does.
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true
  }

  private def docIdColumn(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case n: NamedReference => n.fieldNames().mkString(".") == "doc_id"
      case _ => false
    }

  /** COMPLETE pushdown of global COUNT(*) / MIN(doc_id) / MAX(doc_id):
    * on a generator whose rows are a pure function of the id interval,
    * these are closed-form over [lo, hi) — the scan answers the whole
    * aggregation with ONE row and Spark drops its aggregate operator
    * entirely (the DSv2 contract for `supportCompletePushDown`). Spark
    * only offers the aggregation when every filter was fully pushed, so
    * the clamp is already exact.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().forall {
      case _: CountStar => true
      case m: Min => docIdColumn(m.column())
      case m: Max => docIdColumn(m.column())
      case _ => false
    }

  override def pushAggregation(agg: Aggregation): Boolean =
    supportCompletePushDown(agg) && {
      aggFuncs = Some(agg.aggregateExpressions())
      true
    }

  /** Accept doc_id range/equality predicates by clamping [lo, hi); the
    * return value is the residual Spark must still evaluate (none for
    * accepted filters — the clamp is exact, not a coarse prefilter).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case GreaterThan("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue() + 1); true
      case GreaterThanOrEqual("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue()); true
      case LessThan("doc_id", v: Number) =>
        hi = math.min(hi, v.longValue()); true
      case LessThanOrEqual("doc_id", v: Number) =>
        hi = math.min(hi, v.longValue() + 1); true
      case EqualTo("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue()); hi = math.min(hi, v.longValue() + 1); true
      case IsNotNull(_) => true // nothing generated is null
      case _ => false
    }
    accepted = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = aggFuncs match {
    case Some(funcs) =>
      SyntheticDocsAggScan(funcs, math.max(lo, 0L), math.min(hi, rows))
    case None =>
      SyntheticDocsScan(required, math.max(lo, 0L), math.min(hi, rows), slices, rowsPerBatch)
  }
}

/** The one-row answer to a completely-pushed-down global aggregation
  * over the clamped interval [lo, hi). Deliberately does NOT implement
  * runtime filtering: a late clamp would change an already-answered
  * aggregate.
  */
final case class SyntheticDocsAggScan(funcs: Array[AggregateFunc], lo: Long, hi: Long)
    extends Scan with Batch with SupportsReportStatistics {

  private def n: Long = math.max(hi - lo, 0L)

  override def readSchema(): StructType = StructType(funcs.map {
    case _: CountStar => StructField("count_star", LongType, nullable = false)
    case m: Min => StructField("min_doc_id", LongType, nullable = true)
    case m: Max => StructField("max_doc_id", LongType, nullable = true)
    case f => throw new IllegalStateException(s"unpushable aggregate $f")
  })

  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs agg range=[$lo,$hi) funcs=${funcs.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticDocsRange(0L, 1L)) // one row, one partition

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(64L)
    override def numRows(): OptionalLong = OptionalLong.of(1L)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val (fs, count, first, last) = (funcs, n, lo, hi - 1)
    (_: InputPartition) =>
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = !emitted && { emitted = true; true }
        override def get(): InternalRow = new GenericInternalRow(
          fs.map[Any] {
            case _: CountStar => count
            case _: Min => if (count > 0) first else null
            case _: Max => if (count > 0) last else null
            case f => throw new IllegalStateException(s"unpushable aggregate $f")
          })
        override def close(): Unit = ()
      }
  }
}

final case class SyntheticDocsRange(start: Long, end: Long) extends InputPartition

final case class SyntheticDocsScan(
    required: StructType, lo: Long, hi: Long, slices: Int,
    rowsPerBatch: Long = 100L)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  // runtime clamp: tightened by filter() AFTER planning but BEFORE
  // execution — the DSv2 analog of dynamic partition pruning. Whole
  // slices outside the runtime interval are never generated.
  private var rLo: Long = lo
  private var rHi: Long = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("doc_id"))

  /** Accept doc_id runtime predicates (IN lists from a dynamic filter,
    * or the same comparisons the static path takes) by clamping the
    * generated interval; unrecognized predicates are ignored — they're
    * an optimization, never a correctness contract (Spark re-applies
    * the join condition above the scan).
    */
  override def filter(predicates: Array[Predicate]): Unit = predicates.foreach { p =>
    def idLit(e: Any): Option[Long] = e match {
      case l: V2Literal[_] => l.value() match {
        case v: java.lang.Long => Some(v.longValue())
        case v: java.lang.Integer => Some(v.longValue())
        case _ => None
      }
      case _ => None
    }
    val onDocId = p.children().headOption match {
      case Some(f: NamedReference) => f.fieldNames().mkString(".") == "doc_id"
      case _ => false
    }
    if (onDocId) {
      val lits = p.children().drop(1).flatMap(idLit)
      p.name() match {
        case "IN" if lits.nonEmpty =>
          rLo = math.max(rLo, lits.min); rHi = math.min(rHi, lits.max + 1)
        case ">=" if lits.length == 1 => rLo = math.max(rLo, lits.head)
        case ">" if lits.length == 1 => rLo = math.max(rLo, lits.head + 1)
        case "<" if lits.length == 1 => rHi = math.min(rHi, lits.head)
        case "<=" if lits.length == 1 => rHi = math.min(rHi, lits.head + 1)
        case "=" if lits.length == 1 =>
          rLo = math.max(rLo, lits.head); rHi = math.min(rHi, lits.head + 1)
        case _ => ()
      }
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SyntheticDocsMicroBatch(this)
  override def description(): String =
    s"graft-docs range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  /** Contiguous id ranges, empties dropped — a fully-clamped scan plans
    * ZERO partitions (source-level partition pruning).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val (flo, fhi) = (rLo, rHi)
    val n = math.max(fhi - flo, 0L)
    if (n == 0L) return Array.empty
    val k = math.min(slices.toLong, n).toInt
    Array.tabulate(k) { i =>
      SyntheticDocsRange(flo + i * n / k, flo + (i + 1) * n / k)
    }
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(hi - lo, 0L) * 64L)
    override def numRows(): OptionalLong = OptionalLong.of(math.max(hi - lo, 0L))
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames // serialized to executors with the factory
    (partition: InputPartition) => {
      val r = partition.asInstanceOf[SyntheticDocsRange]
      new PartitionReader[InternalRow] {
        private var id = r.start - 1
        override def next(): Boolean = { id += 1; id < r.end }
        override def get(): InternalRow =
          new GenericInternalRow(cols.map(SyntheticDocs.value(_, id)))
        override def close(): Unit = ()
      }
    }
  }
}

/** Streaming position in the generated id space: the offset IS the next
  * id to emit, so checkpoint recovery is exact replay by construction
  * (rows are a pure function of id — the generator is its own log).
  */
final case class SyntheticDocsOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** Micro-batch view of the same clamped interval [lo, hi): each trigger
  * admits at most `rowsPerBatch` ids (admission control), plans them as
  * slice-parallel ranges with the SAME reader the batch path uses, and
  * advances the offset. Column pruning and doc_id pushdown done by the
  * ScanBuilder apply to the stream unchanged — a filtered stream starts
  * mid-space and ends early, exactly like the batch scan.
  */
final class SyntheticDocsMicroBatch(scan: SyntheticDocsScan)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // the generated interval is static, so the AvailableNow target needs
  // no freezing — the clamped hi IS the all-available end offset
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = SyntheticDocsOffset(scan.lo)
  override def deserializeOffset(json: String): Offset =
    SyntheticDocsOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(scan.rowsPerBatch)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[SyntheticDocsOffset].pos
    val cap = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        from + r.maxRows()
      case _ => scan.hi
    }
    SyntheticDocsOffset(math.min(cap, scan.hi))
  }

  override def reportLatestOffset(): Offset = SyntheticDocsOffset(scan.hi)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SyntheticDocsOffset].pos
    val e = end.asInstanceOf[SyntheticDocsOffset].pos
    SyntheticDocsScan(scan.required, s, e, scan.slices).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
