package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operational-surface proofs: mergeable HLL sketches (the two-level
  * rollup pattern pre-aggregated marts rely on) and `Dataset.observe`
  * (plan-attached metrics with no extra pass over the data).
  */
class ObservabilitySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("HLL sketches merge losslessly: union of per-group sketches == global sketch") {
    import graft.sources.Tables
    val orders = Tables.orders(spark, sfDir)
    // level 1: one sketch per order status (as a mart would persist)
    val perGroup = orders.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    // level 2: merge the persisted sketches — no raw-data re-scan
    val merged = perGroup.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0)
    val direct = orders.agg(
        hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .head.getLong(0)
    assert(merged === direct,
      "sketch merge must be lossless (same registers as the direct sketch)")
    // and the estimate is actually close to truth
    val exact = orders.select(col("o_custkey")).distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate $merged vs exact $exact drifted > 5%")
  }

  test("observe() collects pipeline metrics without a second pass") {
    import graft.sources.Tables
    val obs = Observation("li_metrics")
    val out = Tables.lineitem(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") > 45, 1).otherwise(0)).as("big_qty_rows"))
      .filter(col("l_quantity") > 45)
    val kept = out.count()
    val metrics = obs.get
    assert(metrics("big_qty_rows").asInstanceOf[Long] === kept,
      "observed metric disagrees with the actual filter output")
    assert(metrics("rows_seen").asInstanceOf[Long] > kept,
      "observe must see pre-filter traffic")
  }
}
