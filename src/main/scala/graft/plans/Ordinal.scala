package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global ordinal assignment — the scale-safe replacement for
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY, which plans as
  * a single-partition WindowExec (one task sorts the whole table: the
  * classic 100 TB straggler).
  *
  * Shape: `df.sort(order)` is Spark's parallel range-partitioned sort
  * (sampling pass picks boundaries, every partition sorts locally), then
  * `RDD.zipWithIndex` assigns contiguous ordinals via an extra count job
  * (a single Long per partition crosses the driver — bounded by cluster
  * partition count, never by data). Cost note: the count job and the
  * result job each execute the post-shuffle sort stage (shuffle FILES
  * are reused, the local sort is not), so the local sort runs twice per
  * call — acceptable for the bounded post-shuffle partitions this is
  * used on; persist the sorted RDD around `zipWithIndex` if a caller
  * ever feeds it something wide.
  *
  * The caller must pass a TOTAL order (include a unique tiebreak column)
  * so the ordinal is deterministic regardless of partition boundaries —
  * the same contract `row_number` itself needs for reproducibility.
  *
  * RDD use is deliberate and minimal: per-partition index stitching is
  * genuine per-partition imperative logic (SURVEY §5's carve-out); the
  * input sort and everything downstream stay in Catalyst.
  */
object Ordinal {

  /** Returns `df` sorted by `order` with an extra 1-based LongType
    * ordinal column `name` (matching `ROW_NUMBER()`'s base).
    */
  def withGlobalOrdinal(df: DataFrame, name: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "global ordinal needs an explicit total order")
    require(!df.columns.contains(name),
      s"ordinal column '$name' already exists — schema.add would duplicate it silently")
    val sorted = df.sort(order: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
