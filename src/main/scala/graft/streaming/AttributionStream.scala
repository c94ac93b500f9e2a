package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming multi-touch attribution — the production form of q286: the
  * batch query epochizes the full log with an exclusive-scan window, but
  * an attribution pipeline is naturally INCREMENTAL — per user the only
  * state needed between events is the open epoch's touch summary (touch
  * count, first/last channel, per-channel counts — channels are a fixed
  * 4-element domain, so the state is a flat O(1) record). Each purchase
  * EMITS that epoch's contribution rows (first-touch, last-touch, and
  * floor-scaled linear credits — the same `10000 div n` integer as the
  * batch oracle) and resets the epoch; trailing touches after the last
  * purchase stay un-emitted, exactly as the batch form never attributes
  * them. Aggregating all emitted contributions per channel equals q286
  * bit-for-bit (AttributionStreamSpec).
  *
  * Ordering contract: events arrive in (ts, event_id) order per user
  * ACROSS micro-batches (the TwaStream/SprtStream replay discipline);
  * within a batch the processor sorts — batch size bounds that buffer.
  * Exactly-once caveat (the ClusterStream discipline): a re-delivered
  * purchase would re-emit its epoch against already-reset state, so the
  * source must be exactly-once (Kafka transactional / file-source) —
  * documented, not silently absorbed.
  */
object AttributionStream {

  final case class Touch(
      user_id: Long, ts: Long, event_id: Long, channel: String)

  /** One contribution row per (conversion, model-channel); summing
    * (fc, lc, lin) per channel reproduces the batch ledger.
    */
  final case class Contribution(
      user_id: Long, epoch: Long, channel: String,
      fc: Long, lc: Long, lin: Long)

  private val Channels = Seq("click", "error", "signup", "view")

  /** Open-epoch summary: counts are positionally aligned to
    * [[Channels]]; first/last are "" while the epoch is empty.
    */
  private final case class St(
      epoch: Long, n: Long, first: String, last: String,
      c0: Long, c1: Long, c2: Long, c3: Long)

  class Processor
      extends StatefulProcessor[Long, Touch, Contribution] {
    @transient private var st: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St](
        "attr", Encoders.product[St], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Touch],
        timerValues: TimerValues): Iterator[Contribution] = {
      var s = if (st.exists()) st.get() else St(0L, 0L, "", "", 0, 0, 0, 0)
      val out = Seq.newBuilder[Contribution]
      rows.toSeq.sortBy(t => (t.ts, t.event_id)).foreach { t =>
        if (t.channel == "purchase") {
          if (s.n == 0L) {
            out += Contribution(key, s.epoch, "(none)", 1L, 1L, 10000L)
          } else {
            val per = 10000L / s.n
            out += Contribution(key, s.epoch, s.first, 1L, 0L, 0L)
            out += Contribution(key, s.epoch, s.last, 0L, 1L, 0L)
            Channels.zip(Seq(s.c0, s.c1, s.c2, s.c3)).foreach {
              case (ch, c) =>
                if (c > 0L) out += Contribution(key, s.epoch, ch, 0L, 0L, c * per)
            }
          }
          s = St(s.epoch + 1, 0L, "", "", 0, 0, 0, 0)
        } else {
          val i = Channels.indexOf(t.channel)
          require(i >= 0, s"unknown channel '${t.channel}'")
          s = St(s.epoch, s.n + 1,
            if (s.n == 0L) t.channel else s.first, t.channel,
            s.c0 + (if (i == 0) 1L else 0L),
            s.c1 + (if (i == 1) 1L else 0L),
            s.c2 + (if (i == 2) 1L else 0L),
            s.c3 + (if (i == 3) 1L else 0L))
        }
      }
      st.update(s)
      out.result().iterator
    }
  }

  /** Contribution rows for every conversion closed by the stream so
    * far; append-mode output (a conversion's rows are final the moment
    * its purchase lands — the early-emission property the batch window
    * form cannot have).
    */
  def contributions(touches: Dataset[Touch]): Dataset[Contribution] = {
    implicit val outEnc: Encoder[Contribution] = Encoders.product[Contribution]
    touches
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new Processor, TimeMode.None(), OutputMode.Append(), outEnc)
  }
}
