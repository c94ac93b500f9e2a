package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming trending terms — the incremental twin of q168: per
  * event-time tumbling window, token occurrence counts over a document
  * stream, maintained as the stream arrives instead of recomputed per
  * batch. (q168's batch form slices the OBSERVED span into equal
  * epochs, which needs a global min/max and is inherently batch; the
  * streaming form uses fixed calendar windows — the deliberate
  * difference, documented here, between a retrospective dashboard and a
  * live one.)
  *
  * State design: the aggregation state is (window × token) — the
  * per-window vocabulary, corpus-size-independent — and the watermark
  * expires every window older than the lateness horizon, so state is
  * bounded by |vocabulary| × (horizon / window length) regardless of
  * stream volume. The explode is stateless scan-local work before the
  * one stateful aggregation; ranking (top-k per window) happens on the
  * emitted counts downstream — rank-on-serving, exactly where q168 puts
  * its windows (the vocabulary table, never corpus rows).
  */
object TrendingStream {

  /** Per (tumbling window, token) counts over a watermarked document
    * stream.
    *
    * @param docs streaming frame with (text STRING, ts TIMESTAMP)
    * @param windowLen tumbling window length, e.g. "6 days"
    * @param lateness watermark horizon, e.g. "1 day"
    */
  def tokenTrends(docs: DataFrame, windowLen: String, lateness: String): DataFrame =
    docs.withWatermark("ts", lateness)
      .select(window(col("ts"), windowLen).as("win"),
        explode(split(trim(col("text")), " ")).as("tok"))
      .groupBy(col("win"), col("tok"))
      .agg(count(lit(1)).as("n_occ"))

  /** Top-k per window by count (ties to the lexicographically smaller
    * token) — the serving-side rank over the emitted vocabulary table.
    */
  def topK(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts.withColumn("rnk",
        row_number().over(Window.partitionBy(col("win"))
          .orderBy(col("n_occ").desc, col("tok"))).cast("long"))
      .filter(col("rnk") <= k)
  }
}
