package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming decayed popularity — the incremental twin of q179's
  * half-life scores, built on the one design that keeps stream == batch
  * BIT-exact: decay ON READ, not in state.
  *
  * The tempting stateful form — keep a running score per item and halve
  * it as time advances — cannot match the batch query: halving a SUM
  * under integer floor-division loses the odd remainders that the batch
  * form (weight each term exactly, then sum) keeps, and float state
  * drifts by ulps instead. So the streaming state here is the per
  * (item, event-time day) exact weight sum — aggregation distributes
  * over the shared 2^(K-age) factor because every event in a day has
  * the SAME age, making Σ w·2^(K-age) = (Σ_day w)·2^(K-age) an exact
  * refactoring — and the decay weighting runs at serve time over the
  * emitted day table.
  *
  * State design: (item × day) rows under a watermark that expires days
  * older than the lateness horizon — bounded by |items| × horizon
  * regardless of stream volume, the [[TrendingStream]] discipline. The
  * serving view re-derives the anchor day from the emitted table, so
  * "today" advances with the stream and needs no clock injection.
  */
object DecayStream {

  /** Per (event-time day, item) exact weight sums over a watermarked
    * event stream.
    *
    * @param events streaming frame with (event_id LONG, ts TIMESTAMP,
    *               value DOUBLE)
    * @param lateness watermark horizon, e.g. "1 day"
    */
  def dailyWeights(events: DataFrame, lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .select(window(col("ts"), "1 day").as("win"),
        (col("event_id") % 100).as("item_id"),
        floor(col("value") * 100).cast("long").as("w"))
      .groupBy(col("win"), col("item_id"))
      .agg(sum(col("w")).as("w_sum"), count(lit(1)).as("n_events"))

  /** Decay-on-read serving view over the emitted day table: exactly
    * q179's per-item score (anchor = the max observed day, weights
    * w·2^(K-age) for age <= K, all BIGINT).
    */
  def decayedScores(daily: DataFrame, halfLifeDays: Int = 20): DataFrame = {
    val d0 = daily.agg(max(col("win.start").cast("date")).as("d0"))
    daily
      .select(col("win.start").cast("date").as("day"), col("item_id"),
        col("w_sum"), col("n_events"))
      .crossJoin(broadcast(d0))
      .withColumn("age", datediff(col("d0"), col("day")))
      .groupBy(col("item_id"))
      .agg(
        sum(when(col("age") <= halfLifeDays,
          expr(s"w_sum * shiftleft(CAST(1 AS BIGINT), $halfLifeDays - age)"))
          .otherwise(0L)).cast("long").as("decayed_score"),
        sum(col("n_events")).as("n_events"))
  }
}
