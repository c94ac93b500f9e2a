package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins and in-stream deduplication — the two Structured
  * Streaming capabilities a complete engine needs beyond windowed
  * aggregation (SURVEY.md §2.2 "Streaming": the reference is strictly
  * batch; these are the join/dedup halves of the streaming gap).
  *
  * Scale/state design: every input is watermarked, and the join
  * condition carries an explicit event-time bound, so the state store
  * only ever retains rows inside the watermark horizon — without the
  * time bound a stream-stream join's state grows without limit. The
  * dedup operator uses `dropDuplicatesWithinWatermark`, which expires
  * seen-keys state at the watermark instead of keeping every key
  * forever (`dropDuplicates` on a stream would).
  */
object StreamJoins {

  /** Ad-attribution inner join: click must land within [impression,
    * impression + 10 min] on the same ad id. Both sides watermarked
    * 20 min, so state for either side is bounded by watermark + the
    * 10-min join window.
    */
  def attributionInner(impressions: DataFrame, clicks: DataFrame): DataFrame =
    impressions.withWatermark("imp_ts", "20 minutes")
      .join(
        clicks.withWatermark("click_ts", "20 minutes"),
        expr("""ad_id = click_ad_id
                AND click_ts >= imp_ts
                AND click_ts <= imp_ts + INTERVAL 10 MINUTES"""))
      .select(col("ad_id"), col("imp_ts"), col("click_ts"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("imp_ts")))
          .as("latency_s"))

  /** Left-outer variant: unclicked impressions are emitted with null
    * click columns once the watermark proves no match can still arrive
    * (the outer row waits for the join window to close — correct
    * streaming semantics, not a missed row).
    */
  def attributionLeftOuter(impressions: DataFrame, clicks: DataFrame): DataFrame =
    impressions.withWatermark("imp_ts", "20 minutes")
      .join(
        clicks.withWatermark("click_ts", "20 minutes"),
        expr("""ad_id = click_ad_id
                AND click_ts >= imp_ts
                AND click_ts <= imp_ts + INTERVAL 10 MINUTES"""),
        "leftOuter")
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))

  /** At-least-once → effectively-once: drop duplicate event ids whose
    * duplicates arrive within the watermark horizon, with seen-key
    * state expired as event time advances.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: a streaming fact joined to a batch
    * dimension. The static side is planned per micro-batch (broadcast
    * for a bounded dim — no stream state AT ALL, unlike stream-stream
    * joins), which is the shape for enriching a 100 TB/day event feed
    * with a reference table; the dim is re-read each batch, so slowly
    * changing dims pick up updates without restarting the query.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("tier"), lit("unknown")).as("tier"))
}
