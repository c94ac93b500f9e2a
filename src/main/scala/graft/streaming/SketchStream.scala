package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CountMinAgg

/** Streaming count-min sketches: the live twin of q177's batch sketch
  * and the streaming form of q176's persistence pattern — one fixed-size
  * frequency sketch PER EVENT-TIME WINDOW, built incrementally by the
  * streaming aggregation state (the native
  * [[graft.functions.CountMinAgg]] runs inside Structured Streaming's
  * ObjectHashAggregate state exactly as it does in batch), and any
  * range of persisted window sketches re-merges by ELEMENTWISE SUM —
  * counts are linear, so Σ_w sketch(w) is bit-identical to the sketch
  * of the concatenated stream. That is the production shape: the
  * per-window sketch table is a few hundred KB per window regardless of
  * traffic, and "token frequencies over any time range" never re-reads
  * the raw stream. SketchStreamSpec proves stream==batch per window AND
  * merged==one-shot across windows.
  */
object SketchStream {

  val Depth = 4
  val Width = 1024
  val Mod: Long = 1000000007L

  /** Per-window sketches over a (ts TIMESTAMP, h BIGINT) token-hash
    * stream: window → (sketch grid, occurrence count). Works on a
    * streaming OR batch frame — the twins the spec compares.
    */
  def windowSketches(tokenHashes: DataFrame, windowDur: String): DataFrame =
    tokenHashes
      .groupBy(window(col("ts"), windowDur).as("win"))
      .agg(CountMinAgg.countMinAgg(col("h"), Depth, Width, Mod).as("sk"),
        count(lit(1)).as("n_occ"))

  /** Merge a set of persisted window sketches into one grid + total
    * count without touching raw data: elementwise array sum via
    * posexplode → per-cell sum → re-assembled in cell order. Runs on
    * the tiny sketch table (windows × depth·width cells), never the
    * stream.
    */
  def mergeSketches(perWindow: DataFrame): DataFrame =
    perWindow
      .select(posexplode(col("sk")).as(Seq("pos", "c")))
      .groupBy(col("pos")).agg(sum(col("c")).as("cell"))
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("pos"), col("cell")))),
          typedLit(Seq.empty[Long]),
          (acc, x) => concat(acc, array(x.getField("cell")))).as("sk"))
      .crossJoin(perWindow.agg(sum(col("n_occ")).cast("long").as("n_occ")))

  /** Point estimate of an item hash against a sketch grid column —
    * the identical pmod/element_at/least probe q177 runs.
    */
  def estimate(sk: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
    least((0 until Depth).map { i =>
      element_at(sk,
        (lit(i * Width)
          + pmod(h * CountMinAgg.rowA(i) + CountMinAgg.rowB(i), lit(Mod)) % Width
          + 1).cast("int"))
    }: _*)
}
