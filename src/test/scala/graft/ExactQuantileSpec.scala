package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ExactQuantile
import graft.plans.ExactQuantile.Q

/** Serial-reference contract for the shared order-statistic quantile
  * template (r10 — the rewrite that burned down the last QUANTILE
  * oracle-allowlist entries, q58/q160/q165/q193): for random grouped
  * BIGINT data, [[ExactQuantile.grouped]]'s ×den outputs must equal a
  * driver-side reimplementation of the interpolation definition
  *   pos = num·(n−1), k = pos div den, f = pos mod den,
  *   q·den = den·v_{k+1} + f·(v_{k+2} − v_{k+1})
  * on each group's sorted values — including duplicate-heavy data
  * (order statistics need no tiebreak; the crossing pick counts ties
  * in one aggregate row), values straddling the histogram bucket
  * boundaries and negative values (bucket 0 spans (−W, W) under
  * truncating division), singleton groups (rb clamps to n), and the
  * empty-group global path.
  */
class ExactQuantileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def serialXDen(values: Seq[Long], num: Int, den: Int): Long = {
    val v = values.sorted.toIndexedSeq
    val pos = num.toLong * (v.length - 1)
    val k = (pos / den).toInt
    val f = pos % den
    val vb = v(math.min(k + 1, v.length - 1))
    den.toLong * v(k) + f * (vb - v(k))
  }

  test("grouped quantiles match the serial order-statistic reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(1007)
    // duplicate-heavy: values drawn from a small range; group sizes 1..40
    val data = (1 to 12).flatMap { g =>
      val n = 1 + rnd.nextInt(40)
      Seq.fill(n)((s"g$g", rnd.nextInt(25).toLong - 12L, rnd.nextLong()))
    }
    val df = data.toDF("grp", "v", "tb")
    val qs = Seq(Q("p25_x4", 1, 4), Q("med_x10", 5, 10), Q("p90_x10", 9, 10))
    val got = ExactQuantile.grouped(df, Seq("grp"), "v", qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet == byG.keySet)
    for ((g, vs) <- byG) {
      val (n, p25, med, p90) = got(g)
      assert(n == vs.length, s"$g n")
      assert(p25 == serialXDen(vs, 1, 4), s"$g p25")
      assert(med == serialXDen(vs, 5, 10), s"$g median")
      assert(p90 == serialXDen(vs, 9, 10), s"$g p90")
    }
  }

  test("empty-group (global) path matches; values span negative buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // span several SelWidth buckets on both sides of zero
    val vs = Seq.fill(777)(rnd.nextInt(40000).toLong - 20000L)
    val df = vs.map(Tuple1(_)).toDF("v")
    val out = ExactQuantile.grouped(df, Seq.empty, "v",
      Seq(Q("med_x2", 1, 2), Q("p75_x4", 3, 4)))
    val r = out.collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n") == 777L)
    assert(r(0).getAs[Long]("med_x2") == serialXDen(vs, 1, 2))
    assert(r(0).getAs[Long]("p75_x4") == serialXDen(vs, 3, 4))
  }

  test("rank pair straddling a bucket boundary selects from two buckets") {
    import spark.implicits._
    // 4 values spanning range 21 → adaptive width w = 1, so every
    // distinct value is its own bucket: the median pair (ranks 2, 3 =
    // values 10, 11) forces the interpolation to read its two order
    // statistics from DIFFERENT buckets
    val vs = Seq(0L, 10L, 11L, 21L)
    val r = ExactQuantile.grouped(vs.map(Tuple1(_)).toDF("v"), Seq.empty, "v",
      Seq(Q("med_x2", 1, 2))).collect()(0)
    assert(r.getAs[Long]("med_x2") == serialXDen(vs, 1, 2)) // = 2·10 + 1
  }

  test("degenerate skew: an all-equal group collapses to one bucket, stays exact") {
    import spark.implicits._
    // hi == lo → width 1, every row in bucket 0; the crossing pick
    // must still come from ONE hash-aggregate row per value (no
    // per-row sort of the pile-up)
    val df = (Seq.fill(500)(42L) ++ Seq.fill(3)(7L)).map(Tuple1(_)).toDF("v")
    val r = ExactQuantile.grouped(df, Seq.empty, "v",
      Seq(Q("med_x2", 1, 2), Q("p25_x4", 1, 4))).collect()(0)
    val vs = Seq.fill(500)(42L) ++ Seq.fill(3)(7L)
    assert(r.getAs[Long]("n") == 503L)
    assert(r.getAs[Long]("med_x2") == serialXDen(vs, 1, 2))
    assert(r.getAs[Long]("p25_x4") == serialXDen(vs, 1, 4))
  }

  test("extremes p=0 / p=1 select min·den and max·den exactly") {
    import spark.implicits._
    val vs = Seq(7L, -3L, 12L, 12L, 0L)
    val r = ExactQuantile.grouped(vs.map(Tuple1(_)).toDF("v"), Seq.empty, "v",
      Seq(Q("lo_x1", 0, 1), Q("hi_x1", 1, 1))).collect()(0)
    assert(r.getAs[Long]("lo_x1") == -3L)
    assert(r.getAs[Long]("hi_x1") == 12L)
  }
}
