package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming sequence-packing offsets — the incremental twin of q98's
  * batch prefix sum ([[graft.plans.PrefixSum]]): as documents arrive,
  * each gets its running per-language token offset and the chunk span
  * it will occupy in the packed training stream, so packing is decided
  * on ingest instead of in a nightly batch over the full corpus.
  *
  * State is ONE Long per language (the running token total) — the
  * smallest possible stateful footprint; at 100 TB the state store
  * scales with the language count, not the corpus.
  *
  * Ordering contract: offsets are assigned in doc_id order. Within a
  * micro-batch the rows of a key are sorted before assignment (bounded
  * by the source's admission control); ACROSS micro-batches the source
  * must deliver each language's doc_ids monotonically — true for id-
  * offset sources like `graft-docs` (the offset IS the next id), and
  * for any replayable log partitioned by arrival. With that contract
  * the emitted offsets equal the batch PrefixSum over the same rows
  * exactly (PackingStreamSpec proves stream == batch across 8
  * micro-batches).
  */
object PackingStream {

  final case class DocTok(doc_id: Long, lang: String, n_toks: Long)
  final case class OffsetOut(
      doc_id: Long, lang: String, off: Long,
      first_chunk: Long, last_chunk: Long)

  class Processor(budget: Long) extends StatefulProcessor[String, DocTok, OffsetOut] {
    @transient private var totState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totState = getHandle.getValueState[Long](
        "tok_total", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[DocTok],
        timerValues: TimerValues): Iterator[OffsetOut] = {
      var tot = if (totState.exists()) totState.get() else 0L
      val out = Vector.newBuilder[OffsetOut]
      // arrival order inside a micro-batch is not a contract; doc_id is
      rows.toVector.sortBy(_.doc_id).foreach { d =>
        out += OffsetOut(d.doc_id, key, tot,
          tot / budget, (tot + math.max(d.n_toks, 1L) - 1) / budget)
        tot += d.n_toks
      }
      totState.update(tot) // committed with the batch: exactly-once resume
      out.result().iterator
    }
  }

  /** Append-mode stream of per-doc offsets and chunk spans. */
  def offsets(docs: Dataset[DocTok], budget: Long): Dataset[OffsetOut] = {
    implicit val enc: Encoder[OffsetOut] = Encoders.product[OffsetOut]
    docs
      .groupByKey(_.lang)(Encoders.STRING)
      .transformWithState(
        new Processor(budget), TimeMode.None(), OutputMode.Append(), enc)
  }
}
