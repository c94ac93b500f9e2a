package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group running total — the scale-safe replacement for
  * `SUM(value) OVER (PARTITION BY group ORDER BY ord)` when `group` has
  * few distinct values (language, source, split): the native WindowExec
  * puts each group's ENTIRE order-sorted stream into one task, so a
  * 5-language 100 TB corpus runs its prefix sum on 5 tasks.
  *
  * Shape — the textbook two-level scan:
  *   1. bucket each row by a fixed-width range of the (numeric, unique
  *      per group) order column — pure arithmetic on `(ord - lo) / W`,
  *      no sampling pass, so the bucketing is deterministic and the two
  *      consumers of the bucketed relation can never disagree (the
  *      hazard `spark_partition_id()` over a sampled range exchange
  *      would have);
  *   2. aggregate bucket subtotals — `groups × buckets` rows — and take
  *      the cumulative window over THAT tiny relation to get each
  *      bucket's starting offset;
  *   3. broadcast the offsets back and finish with a window partitioned
  *      by `(group, bucket)`: every task sorts only its own range slice.
  *
  * The result is bucket-invariant: offsets compose to the identical
  * running sum whatever the bucket count, so callers may scale
  * `buckets` with cluster parallelism freely (default: the session's
  * shuffle partitions).
  */
object PrefixSum {

  /** Returns `df` plus column `name` holding the INCLUSIVE running sum
    * of `value` within each `group`, ordered by `ord` ascending with
    * `tiebreaks` breaking equal `ord` values. `ord` must be numeric and
    * non-null; `(ord, tiebreaks)` must totally order each group (the
    * same contract the window form needs for determinism). Rows with
    * equal `ord` always share a bucket — the bucket is a pure function
    * of the value — so tiebreak ordering never crosses an offset
    * boundary.
    */
  def withRunningTotal(
      df: DataFrame,
      name: String,
      group: Seq[String],
      ord: String,
      value: String,
      buckets: Int = 0,
      tiebreaks: Seq[Column] = Nil): DataFrame = {
    require(group.nonEmpty, "grouped prefix sum needs at least one group column")
    require(!df.columns.contains(name),
      s"running-total column '$name' already exists")
    val b = if (buckets > 0) buckets
            else df.sparkSession.sessionState.conf.numShufflePartitions.max(1)
    val gCols = group.map(col)
    val bounds = df.groupBy(gCols: _*)
      .agg(min(col(ord)).as("__lo"), max(col(ord)).as("__hi"))
    // fixed-width buckets over the order column's value range; div keeps
    // the arithmetic in Long (no overflow for any int64 id span)
    val t = df.join(broadcast(bounds), group)
      .withColumn("__w",
        ((col("__hi") - col("__lo")).cast("long") / b).cast("long") + 1L)
      .withColumn("__bkt",
        ((col(ord) - col("__lo")).cast("long") / col("__w")).cast("int"))
    val wBkt = Window.partitionBy(gCols: _*).orderBy(col("__bkt"))
    val offsets = t.groupBy((gCols :+ col("__bkt")): _*)
      .agg(sum(col(value)).as("__bkt_sum"))
      .withColumn("__bkt_off",
        sum(col("__bkt_sum")).over(wBkt) - col("__bkt_sum"))
      .select((gCols :+ col("__bkt") :+ col("__bkt_off")): _*)
    val wLocal = Window
      .partitionBy((gCols :+ col("__bkt")): _*)
      .orderBy(col(ord) +: tiebreaks: _*)
    t.join(broadcast(offsets), group :+ "__bkt")
      .withColumn(name, col("__bkt_off") + sum(col(value)).over(wLocal))
      .drop("__lo", "__hi", "__w", "__bkt", "__bkt_off")
  }

  /** `ROW_NUMBER() OVER (PARTITION BY group ORDER BY ord, tiebreaks)`
    * as the same two-level scan — a row number is the inclusive running
    * total of ones. LongType (vs the window function's int): callers at
    * 100 TB overflow int anyway.
    */
  def withRowNumber(
      df: DataFrame,
      name: String,
      group: Seq[String],
      ord: String,
      tiebreaks: Seq[Column] = Nil,
      buckets: Int = 0): DataFrame = {
    val one = "__prefixsum_one"
    withRunningTotal(df.withColumn(one, lit(1L)), name, group, ord, one,
      buckets, tiebreaks).drop(one)
  }
}
