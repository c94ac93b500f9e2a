package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running statistics on Spark 4's arbitrary-state v2 API
  * (`transformWithState` + [[StatefulProcessor]]) — the successor to
  * `mapGroupsWithState` used by [[UserActivityState]]; kept side by side
  * so both state APIs are exercised.
  *
  * State is two scalar [[ValueState]] cells per key (count, running
  * max) — O(1) per user, no per-event retention; at 100 TB the state
  * store scales with distinct keys only. TTL is a first-class knob of
  * the v2 API (pass a [[TTLConfig]] instead of NONE to expire idle
  * users — the operational story for unbounded key spaces).
  */
object ValueTracker {

  final case class In(user_id: Long, value: Double)
  final case class Out(user_id: Long, n_events: Long, max_value: Double)

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var countState: ValueState[Long] = _
    @transient private var maxState: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      countState = getHandle.getValueState[Long](
        "count", Encoders.scalaLong, TTLConfig.NONE)
      maxState = getHandle.getValueState[Double](
        "max", Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      var c = if (countState.exists()) countState.get() else 0L
      var m = if (maxState.exists()) maxState.get() else Double.NegativeInfinity
      rows.foreach { r =>
        c += 1
        if (r.value > m) m = r.value
      }
      countState.update(c)
      maxState.update(m)
      Iterator(Out(key, c, m))
    }
  }

  /** Running per-user profile stream: one updated row per user per
    * micro-batch that touched it.
    */
  def profiles(events: Dataset[In]): Dataset[Out] = {
    implicit val outEnc: Encoder[Out] = Encoders.product[Out]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new Processor, TimeMode.None(), OutputMode.Update(), outEnc)
  }
}
