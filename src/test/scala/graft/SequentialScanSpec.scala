package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal.{BalanceDelta, BalanceOut, cappedRunningBalance}

/** The secondary-sort capped scan (q161's engine) against a serial
  * reference fold on graphs of hand-built cases: clamping, key changes
  * inside a partition, out-of-order input, and many keys per partition.
  */
class SequentialScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def serial(rows: Seq[BalanceDelta]): Map[Long, BalanceOut] =
    rows.groupBy(_.user_id).map { case (u, ds) =>
      var bal = 0L; var clamps = 0L
      ds.sortBy(d => (d.t, d.event_id)).foreach { d =>
        val nb = bal + d.delta
        if (nb < 0) { bal = 0L; clamps += 1 } else bal = nb
      }
      u -> BalanceOut(u, bal, clamps, ds.size.toLong)
    }

  private def run(rows: Seq[BalanceDelta]): Map[Long, BalanceOut] = {
    import spark.implicits._
    cappedRunningBalance(spark.createDataset(rows))
      .collect().map(o => o.user_id -> o).toMap
  }

  test("capped scan == serial fold with clamps, shuffled input, many keys") {
    // user 1: clamp in the middle (5 - 9 -> 0, then +3 -> 3)
    // user 2: clamp on the FIRST event (-4 -> 0), ends at floor
    // user 3: never clamps
    // 40 extra users co-resident in 4 partitions exercise key changes
    val base = Seq(
      BalanceDelta(1, 10, 1, 5), BalanceDelta(1, 20, 2, -9), BalanceDelta(1, 30, 3, 3),
      BalanceDelta(2, 10, 4, -4), BalanceDelta(2, 20, 5, 2), BalanceDelta(2, 30, 6, -7),
      BalanceDelta(3, 10, 7, 1), BalanceDelta(3, 20, 8, 1))
    val bulk = (4L to 43L).flatMap(u =>
      (1 to 5).map(i => BalanceDelta(u, i * 10L, u * 100 + i, if (i % 2 == 0) -3L else 2L)))
    val rows = scala.util.Random.shuffle(base ++ bulk) // arrival order is no contract
    val got = run(rows)
    assert(got === serial(rows))
    assert(got(1L) === BalanceOut(1, 3, 1, 3))
    assert(got(2L) === BalanceOut(2, 0, 2, 3))
    assert(got(3L) === BalanceOut(3, 2, 0, 2))
    // invariant: the floor holds everywhere
    assert(got.values.forall(_.final_cents >= 0))
  }

  test("ties on t break by event_id, matching the oracle's ORDER BY") {
    val rows = Seq(
      BalanceDelta(7, 10, 2, -5), // second by event_id: clamps after +4
      BalanceDelta(7, 10, 1, 4))  // first by event_id
    val got = run(rows)
    assert(got === serial(rows))
    assert(got(7L) === BalanceOut(7, 0, 1, 2))
  }

  test("cusumScan: peak, earliest peak day, final, with key change and all-negative item") {
    import spark.implicits._
    import graft.operators.Temporal.{CusumOut, CusumRow, cusumScan}
    // item 1: x = +5,-3,+4,-10,+2 -> s = 5,2,6,0,2; peak 6 first at t=3
    // item 2: never positive -> s pinned at 0, peak 0 first at t=1
    // item 3: plateau — peak reached twice, the FIRST day must win
    val rows = Seq(
      CusumRow(1, 1, 5), CusumRow(1, 2, -3), CusumRow(1, 3, 4),
      CusumRow(1, 4, -10), CusumRow(1, 5, 2),
      CusumRow(2, 1, -4), CusumRow(2, 2, -1),
      CusumRow(3, 1, 7), CusumRow(3, 2, -7), CusumRow(3, 3, 7))
    val got = cusumScan(rows.toDS())
      .collect().map(o => o.item_id -> o).toMap
    assert(got(1L) === CusumOut(1, 6, 3, 2, 5))
    assert(got(2L) === CusumOut(2, 0, 1, 0, 2))
    assert(got(3L) === CusumOut(3, 7, 1, 7, 3))
  }
}
