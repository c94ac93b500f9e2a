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

  test("approx_count_distinct stays within HLL++ published error bounds") {
    // The raw sketch value can't hash-match an oracle (sketches aren't
    // portable across engines), so BOUND it instead: HLL++'s standard
    // error is rsd; |est - n|/n beyond 4·rsd at any tested cardinality
    // means the sketch (or our use of it) is broken, not unlucky.
    for ((n, rsd) <- Seq((1000L, 0.05), (100000L, 0.05), (1000000L, 0.05),
        (100000L, 0.02))) {
      val approx = spark.range(n)
        .agg(approx_count_distinct(col("id"), rsd).as("a")).head.getLong(0)
      val rel = math.abs(approx - n).toDouble / n
      assert(rel <= 4 * rsd, s"n=$n rsd=$rsd approx=$approx rel=$rel")
    }
    // and on q19's own output: since round 6 the query itself emits the
    // 5% contract (rsd 0.01 => the bound is 5 sigma) as `within_5pct`,
    // which the DuckDB oracle checks as TRUE; assert it here too
    graft.operators.SetOps.q19.run(spark, sfDir).collect().foreach { r =>
      assert(r.getBoolean(3), s"group ${r.getString(0)} breached within_5pct")
    }
  }

  test("approx_percentile stays within its rank-error contract") {
    // The quantile sketch (Greenwald-Khanna style) guarantees the
    // returned value's TRUE rank is within n/accuracy of the target
    // rank. Check against exactly-ranked fixture data at two accuracies
    // — beyond bound means broken use, not bad luck (the sketch is
    // deterministic for a fixed input order at local[4]).
    val vals = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    for (accuracy <- Seq(100, 10000); p <- Seq(0.05, 0.5, 0.95)) {
      val approx = graft.sources.Tables.lineitem(spark, sfDir)
        .agg(percentile_approx(col("l_extendedprice"), lit(p), lit(accuracy)))
        .head.getDouble(0)
      // true rank of the returned value in the exact sorted data
      val rank = vals.count(_ <= approx)
      val err = math.abs(rank - p * n)
      assert(err <= n.toDouble / accuracy + 1,
        s"p=$p accuracy=$accuracy: rank $rank vs target ${p * n} (n=$n)")
    }
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
