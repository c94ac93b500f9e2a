package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions.dec2

/** Structured Streaming surface (SURVEY.md §2.2 "Streaming"): the
  * streaming twin of the batch `events` aggregations (Olap.q28/q29 are
  * the oracle-testable forms — same transforms, batch source).
  *
  * Design: `readStream` over the events schema → event-time watermark →
  * tumbling window / session window aggregation → sink. State is bounded
  * by the watermark (late data beyond 10 minutes is dropped), so the
  * stateful operator survives unbounded input — the property that
  * matters when this runs against a real event firehose instead of a
  * fixture directory.
  */
object EventsStreaming {

  /** The events schema as written by the fixture generator (ts arrives
    * as TIMESTAMP(MICROS, isAdjustedToUTC=false) = TIMESTAMP_NTZ; the
    * batch loader `Tables.events` applies the same NTZ→session-zone
    * normalization post-source).
    *
    * µs-only by design: a streaming source needs a DECLARED schema, so
    * unlike the batch loader there is no per-file type dispatch — a
    * directory holding a ns-encoded events file (pre-round-7 fixtures,
    * FIXTURES.md) fails the schema match even under nanosAsLong=true.
    * Stage current-format files (as the specs do) or re-encode first.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of events parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", col("ts").cast(TimestampType))

  /** Tumbling 6-hour window aggregation with a 10-minute watermark —
    * the streaming form of Olap.q28.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Per-user session windows (30-minute gap) — the streaming form of
    * Olap.q29's sessionization.
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("user_id"), col("n_events"))

  /** Run a streaming aggregation to a named in-memory sink until all
    * currently-available input is processed (the synchronous harness for
    * tests; a production deployment points the same plan at a real sink
    * with a processing-time trigger).
    *
    * Output mode matters: "append" (the unbounded-stream posture) emits
    * only watermark-finalized windows and lets state expire; "complete"
    * replays everything and keeps all state — use it only for bounded
    * replay comparisons against a batch twin (as the specs do).
    */
  def runToMemorySink(agg: DataFrame, name: String,
      outputMode: String = "append"): StreamingQuery = {
    val q = agg.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
