package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.operators.Analytics.{SprtFail, SprtSucc, SprtThr}

/** Streaming Wald SPRT — the production form of q262: a sequential test
  * is an ordered scan with O(1) state per arm (count, success count,
  * cumulative LLR, and the frozen first-crossing pair), which is
  * exactly the `transformWithState` shape; the batch window form is the
  * oracle twin. Same IntLog2 x20 integer constants
  * ([[graft.operators.Analytics.SprtSucc]]/Fail/Thr), so stream and
  * batch agree bit-for-bit (SprtStreamSpec).
  *
  * Ordering contract: observations must arrive in (ts, event_id) order
  * per arm ACROSS micro-batches (the TwaStream replay discipline);
  * within a batch the processor sorts — batch size bounds that buffer,
  * not corpus size. The decision, once crossed, is FROZEN: later
  * observations update the running totals but can never move
  * (n_decide, cum_at_decision) — that irreversibility is the SPRT's
  * early-stopping point, and the spec pins it.
  */
object SprtStream {

  final case class Obs(arm: String, ts: Long, event_id: Long, succ: Long)
  final case class Verdict(
      arm: String, n_obs: Long, n_succ: Long, final_cum_x20: Long,
      n_decide: Option[Long], cum_at_decision_x20: Option[Long],
      decision: String)

  /** (n, nSucc, cum, nDecide, cumAt) — nDecide = -1 while undecided. */
  private final case class St(
      n: Long, nSucc: Long, cum: Long, nDecide: Long, cumAt: Long)

  class Processor extends StatefulProcessor[String, Obs, Verdict] {
    @transient private var st: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St](
        "sprt", Encoders.product[St], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Verdict] = {
      var s = if (st.exists()) st.get() else St(0L, 0L, 0L, -1L, 0L)
      // in-batch sort: the arrival contract holds across batches, the
      // processor restores it within one (bounded by the micro-batch)
      rows.toSeq.sortBy(o => (o.ts, o.event_id)).foreach { o =>
        val n = s.n + 1
        val cum = s.cum + (if (o.succ == 1L) SprtSucc else SprtFail)
        val crossedNow = s.nDecide < 0 && (cum >= SprtThr || cum <= -SprtThr)
        s = St(n, s.nSucc + o.succ, cum,
          if (crossedNow) n else s.nDecide,
          if (crossedNow) cum else s.cumAt)
      }
      st.update(s)
      val (nd, ca) =
        if (s.nDecide >= 0) (Some(s.nDecide), Some(s.cumAt)) else (None, None)
      val decision =
        if (s.nDecide >= 0 && s.cumAt >= SprtThr) "h1"
        else if (s.nDecide >= 0) "h0"
        else "continue"
      Iterator(Verdict(key, s.n, s.nSucc, s.cum, nd, ca, decision))
    }
  }

  /** One updated verdict row per arm per micro-batch that touched it;
    * the latest row per arm is the current test state.
    */
  def verdicts(obs: Dataset[Obs]): Dataset[Verdict] = {
    implicit val outEnc: Encoder[Verdict] = Encoders.product[Verdict]
    obs
      .groupByKey(_.arm)(Encoders.STRING)
      .transformWithState(
        new Processor, TimeMode.None(), OutputMode.Update(), outEnc)
  }
}
