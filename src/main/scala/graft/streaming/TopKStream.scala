package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SpaceSavingAgg.spaceSavingAgg

/** Streaming heavy hitters: the live twin of q199's batch SpaceSaving
  * sketch — one fixed 16-counter top-k state PER EVENT-TIME WINDOW,
  * built incrementally inside Structured Streaming's aggregation state
  * (the native [[graft.functions.SpaceSavingAgg]] runs in streaming
  * ObjectHashAggregate exactly as in batch). Unlike the count-min twin
  * ([[SketchStream]]) the SpaceSaving state is NOT linear: raw
  * estimates depend on the merge tree, so stream and batch are
  * equivalent on the sketch's CONTRACT — the q199 bound invariants
  * (est ≥ true, est − err ≤ true, err ≤ N/capacity, 2N/capacity
  * presence), which hold for every valid merge order — not on raw
  * counter values. TopKStreamSpec audits both twins per window against
  * exact per-window counts and proves the audits identical. The
  * production shape: per-window heavy-hitter tables of 16 counters
  * regardless of key cardinality — trending-key detection with state
  * bounded by windows × capacity, never by the key domain.
  */
object TopKStream {

  val Capacity = 16

  /** Per-window SpaceSaving sketches over a (ts TIMESTAMP, k BIGINT)
    * key stream: window → (flattened [key,est,err] triples, n_input).
    * Works on a streaming OR batch frame — the twins the spec compares
    * (the spec drops capacity below the key cardinality so eviction
    * actually churns inside the streaming state).
    */
  def windowTopK(keyed: DataFrame, windowDur: String,
      capacity: Int = Capacity): DataFrame =
    keyed.groupBy(window(col("ts"), windowDur).as("win"))
      .agg(spaceSavingAgg(col("k"), capacity).as("sk"),
        count(lit(1)).as("n_input"))

  /** Unpack a per-window sketch table into one row per tracked counter:
    * (win, n_input, key, est, err).
    */
  def entries(perWindow: DataFrame): DataFrame =
    perWindow
      // empty-sketch guard (ADVICE r8): sequence(0, -1) steps -1 and
      // element_at(sk, 0) throws — an empty window sketch (all-NULL
      // keys) must emit no counter rows, not spurious null-key rows
      .filter(size(col("sk")) > 0)
      .select(col("win"), col("n_input"),
        expr("explode(sequence(0L, CAST(size(sk) AS BIGINT) div 3 - 1))")
          .as("i"),
        col("sk"))
      .select(col("win"), col("n_input"),
        element_at(col("sk"), (col("i") * 3 + 1).cast("int")).as("key"),
        element_at(col("sk"), (col("i") * 3 + 2).cast("int")).as("est"),
        element_at(col("sk"), (col("i") * 3 + 3).cast("int")).as("err"))
}
