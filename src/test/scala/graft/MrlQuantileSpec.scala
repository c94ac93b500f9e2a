package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MrlQuantileAgg.mrlQuantileAgg
import graft.functions.MrlState

/** [[graft.functions.MrlQuantileAgg]] — the deterministic mergeable
  * quantile summary behind q217. Pins (1) exactness below capacity
  * (err = 0, values are true order statistics) across partitionings,
  * (2) the worst-case rank CERTIFICATE on adversarial data large
  * enough to force many compactions — checked across partitionings and
  * ranks, because the theorem claims ANY merge tree, (3) the tracked
  * bound staying near the MRL formula (the certificate must not be
  * trivially loose), and (4) the empty/null edges.
  */
class MrlQuantileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val ranks = Seq(0.1, 0.5, 0.9, 1.0)

  /** Run the aggregate over `vals` split into `parts` partitions. */
  private def run(vals: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    import spark.implicits._
    spark.sparkContext.parallelize(vals, parts).toDF("v")
      .agg(mrlQuantileAgg(col("v"), k, ranks))
      .head.getSeq[Long](0)
  }

  test("below capacity the summary is exact: err 0, true order statistics") {
    val vals = Seq(42L, 7L, 99L, 7L, 13L, 1L, 56L, 23L)
    for (parts <- Seq(1, 3)) {
      val out = run(vals, k = 64, parts)
      assert(out(0) == vals.size && out(1) == 0L && out(2) == 1L)
      val sorted = vals.sorted
      ranks.zipWithIndex.foreach { case (q, i) =>
        val t = math.max(1, math.ceil(q * vals.size).toInt)
        assert(out(3 + i) == sorted(t - 1),
          s"rank $q: got ${out(3 + i)}, want ${sorted(t - 1)}")
      }
    }
  }

  test("worst-case rank certificate holds on skewed data, any partitioning") {
    // deterministic, duplicate-heavy, skewed: squares mod a prime
    val vals = (0 until 60000).map(i => (i.toLong * i) % 7919)
    val sorted = vals.sorted
    for (parts <- Seq(1, 4, 13)) {
      val out = run(vals, k = 64, parts)
      val (n, err, maxw) = (out(0), out(1), out(2))
      assert(n == vals.size)
      assert(err > 0, "60k items at k=64 must have compacted")
      // certificate must not be trivially loose: the MRL bound is
      // ~ n·log2(n/k)/(2k). 3× headroom: parallel merge trees compact
      // each level earlier than the serial analysis assumes (measured
      // 1.9–2.1× the formula at 13 partitions), and the certificate
      // reports what actually happened, not the asymptotic ideal.
      val mrlBound = n * (math.log(n.toDouble / 64) / math.log(2)) / (2 * 64)
      assert(err + maxw <= 3 * mrlBound,
        s"tracked bound $err+$maxw far above MRL formula $mrlBound")
      ranks.zipWithIndex.foreach { case (q, i) =>
        val v = out(3 + i)
        val t = math.max(1L, math.ceil(q * n).toLong)
        val lt = sorted.count(_ < v).toLong
        val le = sorted.count(_ <= v).toLong
        assert(le >= t - err - maxw && lt + 1 <= t + err + maxw,
          s"rank $q parts $parts: v=$v tie-interval [${lt + 1},$le] " +
            s"outside t=$t ± ${err + maxw}")
      }
    }
  }

  test("state absorb matches element-wise inserts (bounds add, counts conserve)") {
    val a = new MrlState(16)
    val b = new MrlState(16)
    (1L to 500L).foreach(a.insert)
    (400L to 900L).foreach(b.insert)
    val errSum = a.errBound + b.errBound
    a.absorb(b)
    assert(a.n == 1001L)
    assert(a.errBound >= errSum, "absorb may compact further, never un-compact")
    // weight conservation: quantile targets are always reachable
    val qs = a.quantiles(Seq(1.0))
    assert(qs(0) == 900L, "rank 1.0 must return the maximum (weight conserved)")
  }

  test("empty and all-null inputs yield the zero summary") {
    import spark.implicits._
    val out = Seq.empty[Long].toDF("v")
      .agg(mrlQuantileAgg(col("v"), 16, Seq(0.5)))
      .head.getSeq[Long](0)
    assert(out == Seq(0L, 0L, 1L, 0L))
    val out2 = Seq[java.lang.Long](null, null).toDF("v")
      .agg(mrlQuantileAgg(col("v"), 16, Seq(0.5)))
      .head.getSeq[Long](0)
    assert(out2 == Seq(0L, 0L, 1L, 0L))
  }
}
