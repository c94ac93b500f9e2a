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
  * `RDD.zipWithIndex` assigns contiguous ordinals with ONE extra count
  * job (a single Long per partition crosses the driver — bounded by
  * cluster partition count, never by data). Total cost: one shuffle +
  * one lightweight count action, with every stage parallel.
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
    val sorted = df.sort(order: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
