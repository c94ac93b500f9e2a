package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of q226's OHLC bars: event-time windowed aggregation
  * with watermark-closed emission — the built-in streaming path (no
  * custom state), which works here because every OHLC component is a
  * declarative aggregate: open/close are `min_by`/`max_by` under the
  * total (ts, event_id) order, so out-of-order arrival inside the
  * watermark cannot change the picks — the same total order the batch
  * query expresses with rank-1 windows. Bars emit in APPEND mode when
  * the watermark passes their window end: each bar is output exactly
  * once, final. State per key is one partial aggregate per open
  * (series, window) — bounded by the watermark delay, not the stream.
  */
object OhlcStream {

  /** One price tick; `cents` is the exact integer price (the
    * DECIMAL(18,2)→cents route of the batch query, applied upstream).
    */
  final case class Tick(event_type: String, ts: Timestamp, event_id: Long,
      cents: Long)

  /** Append-mode stream of finalized 6-hour bars. */
  def bars(ticks: Dataset[Tick],
      watermarkDelay: String = "1 hour"): DataFrame =
    ticks.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("event_type"), window(col("ts"), "6 hours").as("w"))
      .agg(
        min_by(col("cents"), struct(col("ts"), col("event_id")))
          .as("open_c"),
        max(col("cents")).as("high_c"),
        min(col("cents")).as("low_c"),
        max_by(col("cents"), struct(col("ts"), col("event_id")))
          .as("close_c"),
        count(lit(1)).as("n_ticks"),
        sum(col("cents")).as("turnover_c"))
      .select(col("event_type"), col("w.start").as("bar_start"),
        col("open_c"), col("high_c"), col("low_c"), col("close_c"),
        col("n_ticks"), col("turnover_c"))
}
