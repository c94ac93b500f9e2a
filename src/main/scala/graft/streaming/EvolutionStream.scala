package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Watermark-bounded stream-stream join over a SCHEMA-EVOLVING source —
  * the q205 lake shape (legacy files missing post-migration columns)
  * arriving as a STREAM (VERDICT r8 #7c). A streaming source cannot
  * re-infer schemas per file, so the MERGED schema is declared up front
  * and legacy files surface the missing columns as NULL, exactly like
  * the batch `mergeSchema` read; the backfill (`coalesce`) then runs
  * identically on both the stream and its batch twin (q213).
  *
  * State discipline (the StreamJoins contract): both sides are
  * watermarked and the join condition carries an explicit event-time
  * bound, so state retention is watermark-horizon-bounded regardless of
  * stream length — the only stream-stream join shape that survives an
  * unbounded 100 TB/day feed.
  */
object EvolutionStream {

  /** The POST-migration events schema (gen2); gen1 files carry only the
    * first four columns and read as NULL `value`/`props` under this
    * declared schema. `ts` is a session-zone timestamp because the
    * staged generations are written by Spark from the normalized batch
    * loader (`Tables.events`), not raw fixture NTZ files.
    */
  val mergedSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stream over the staged generation dirs (`gen1/`, `gen2/` — plain
    * names, NOT `gen=N`, so no partition column is inferred under the
    * declared schema). The glob re-lists every trigger: a generation
    * added AFTER the stream started is picked up mid-stream — schema
    * evolution arriving live.
    */
  def readEvolved(s: SparkSession, path: String): DataFrame =
    s.readStream.schema(mergedSchema).parquet(path + "/gen*")

  /** (purchase, error) pairs for the same user with the error inside
    * [purchase_ts, purchase_ts + 30 min) — one input frame split into
    * two watermarked sides. Works identically on a streaming or batch
    * frame (`withWatermark` is a no-op in batch), so q213 and the
    * streaming spec share this verbatim. Legacy (gen1) purchases carry
    * `value` NULL → backfilled to 0 cents; cents are `floor(value·100)`
    * (one IEEE multiply + exact floor — no float crosses any gate).
    */
  def purchaseErrorPairs(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("ts").as("pts"),
        col("user_id").as("pu"),
        coalesce(floor(col("value") * 100).cast("long"), lit(0L)).as("cents"))
      .withWatermark("pts", "1 hour")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("ts").as("ets"),
        col("user_id").as("eu"))
      .withWatermark("ets", "1 hour")
    purchases.join(errors,
      expr("pu = eu AND ets >= pts AND ets < pts + INTERVAL 30 MINUTE"))
      .select(col("pid"), col("eid"), col("pts"), col("cents"))
  }
}
