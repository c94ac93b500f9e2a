package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming interval materialization — the incremental twin of q159's
  * batch time-weighted average: as point samples arrive, each completed
  * holding period (the span from a user's previous sample to this one)
  * is emitted with its exact integer weight, so the downstream
  * time-weighted aggregate is a plain streaming sum instead of a
  * nightly lead()-window batch.
  *
  * State is ONE (t, cents) pair per user — the last open sample; at
  * 100 TB the state store scales with the user population, not the
  * event history. No float math happens in the processor: the value is
  * converted to exact cents by Catalyst (DECIMAL(18,2) × 100, the same
  * dec2 convention q159 uses) BEFORE entering state, so stream == batch
  * is integer-exact.
  *
  * Ordering contract (same family as [[PackingStream]]): within a
  * micro-batch a user's rows sort by (t, event_id); across micro-batches
  * each user's (t, event_id) must arrive monotonically — true for any
  * replayable time-ordered log. Under that contract the emitted
  * intervals are exactly the batch lead()-window's consecutive pairs
  * (TwaStreamSpec proves the per-user weighted sums equal across
  * micro-batches).
  */
object TwaStream {

  final case class Sample(user_id: Long, event_id: Long, t: Long, cents: Long)
  final case class Interval(
      user_id: Long, t0: Long, t1: Long, cents: Long, dt: Long)

  class Processor extends StatefulProcessor[Long, Sample, Interval] {
    @transient private var last: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[(Long, Long)](
        "last_sample", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Sample],
        timerValues: TimerValues): Iterator[Interval] = {
      var prev = if (last.exists()) Some(last.get()) else None
      val out = Vector.newBuilder[Interval]
      // arrival order inside a micro-batch is not a contract; (t, id) is
      rows.toVector.sortBy(s => (s.t, s.event_id)).foreach { s =>
        prev.foreach { case (t0, c0) =>
          out += Interval(key, t0, s.t, c0, s.t - t0)
        }
        prev = Some((s.t, s.cents))
      }
      prev.foreach(last.update) // committed with the batch: exactly-once resume
      out.result().iterator
    }
  }

  /** Append-mode stream of completed per-user holding intervals. */
  def intervals(samples: Dataset[Sample]): Dataset[Interval] = {
    implicit val enc: Encoder[Interval] = Encoders.product[Interval]
    samples
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new Processor, TimeMode.None(), OutputMode.Append(), enc)
  }
}
