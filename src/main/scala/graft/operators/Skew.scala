package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys: two-stage salted
  * aggregation. Stage 1 aggregates on (key, salt) — the hot key's rows
  * spread across `saltBuckets` reducers — stage 2 merges the partials on
  * the key alone, handling at most `saltBuckets` rows per key.
  *
  * At 100 TB this is the difference between one straggler reducer
  * holding a zipf-head key's terabyte and 32 reducers each holding a
  * 32nd of it. AQE's skew-join handling covers joins; salting covers
  * aggregations (AQE does not re-balance a skewed groupBy key).
  *
  * The salt is derived from stable row content (not rand()) so results
  * are deterministic and retries are safe.
  */
object Skew {

  /** Salted count+sum aggregation over one key column.
    *
    * @param saltSource any column with per-row variety (an id, a hash)
    */
  def saltedCountSum(
      df: DataFrame,
      key: Column,
      value: Column,
      saltSource: Column,
      saltBuckets: Int = 32): DataFrame = {
    val partial = df
      .groupBy(key.as("k"), pmod(saltSource, lit(saltBuckets)).as("salt"))
      .agg(count(lit(1)).as("pc"), sum(value).as("ps"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))
  }

  /** Salted equi-join for a skewed LEFT side against a RIGHT side too
    * large to broadcast but small enough to replicate `saltBuckets`
    * times: left rows scatter across (key, salt) by stable content
    * hash, right rows replicate to every salt, and the join runs on the
    * widened key — the hot key's partition splits `saltBuckets` ways.
    *
    * This is the manual fallback for the cases AQE's skew-join split
    * can't fix (e.g. a bucketed/pre-partitioned input AQE won't
    * re-split, or an aggregation directly on the join output where the
    * skewed exchange must be avoided up front). The salt comes from
    * `saltSource` (stable row content), never `rand()` — deterministic
    * under retries.
    */
  /** @param strategy join-strategy hint pinned on the replicated side:
    *   "shuffle_hash" (default — the hash-relation path) or "merge"
    *   (sort-merge — the path big-×-big joins actually take, where the
    *   hot key's sort partition is the straggler the salt splits).
    *   Either way the point is the same: NOT broadcast — a broadcast
    *   join has no partition skew and the salt would be pure overhead.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltSource: Column,
      saltBuckets: Int = 32,
      strategy: String = "shuffle_hash"): DataFrame = {
    // null saltSource must still land in SOME bucket (salt 0), or the
    // equi-join on __salt would silently drop rows the unsalted join
    // keeps — the salt column must never introduce its own null semantics
    val saltedLeft = left.withColumn("__salt",
      coalesce(pmod(saltSource, lit(saltBuckets)), lit(0)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight.hint(strategy), Seq(key, "__salt"))
      .drop("__salt")
  }
}
