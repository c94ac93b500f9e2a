package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-prefix semantics of the funnel sequencer (operators.Temporal
  * .funnelPerUser) on hand-built event logs — the cases where naive
  * per-type MINs and the ordered funnel disagree.
  */
class TemporalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // (user_id, us, event_id, event_type)
  private def per(rows: Seq[(Long, Long, Long, String)])
      : Map[Long, (Option[Long], Option[Long], Option[Long])] = {
    import spark.implicits._
    operators.Temporal.funnelPerUser(
        rows.toDF("user_id", "us", "event_id", "event_type"))
      .collect()
      .map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((opt(1), opt(2), opt(3)))
      }.toMap
  }

  test("events before the prior stage do not convert") {
    val got = per(Seq(
      // user 1: click at t=5 precedes the first view (t=10) — not a
      // conversion; the click at t=20 is; purchase at t=15 precedes the
      // qualified click — only the t=30 purchase counts
      (1L, 5L, 1L, "click"), (1L, 10L, 2L, "view"), (1L, 15L, 3L, "purchase"),
      (1L, 20L, 4L, "click"), (1L, 30L, 5L, "purchase"),
      // user 2: views only — no click/purchase stages
      (2L, 7L, 6L, "view"), (2L, 9L, 7L, "view"),
      // user 3: full funnel in order
      (3L, 1L, 8L, "view"), (3L, 2L, 9L, "click"), (3L, 3L, 10L, "purchase")))
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(got(2L) == ((Some(7L), None, None)))
    assert(got(3L) == ((Some(1L), Some(2L), Some(3L))))
  }

  test("same-microsecond ties resolve by event_id, both directions") {
    // click shares the view's timestamp: event_id decides whether it is
    // at-or-after the view (id greater) or before it (id smaller)
    val after = per(Seq((1L, 10L, 1L, "view"), (1L, 10L, 2L, "click")))
    assert(after(1L) == ((Some(10L), Some(10L), None)))
    val before = per(Seq((1L, 10L, 2L, "view"), (1L, 10L, 1L, "click")))
    assert(before(1L) == ((Some(10L), None, None)))
  }

  test("a user with no view never converts later stages") {
    val got = per(Seq(
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "purchase")))
    assert(got(1L) == ((None, None, None)))
  }
}
