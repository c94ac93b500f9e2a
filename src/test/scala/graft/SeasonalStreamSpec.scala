package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SeasonalStream

/** Streaming daily-series maintenance == its batch twin: the fixture
  * event log fed through [[SeasonalStream]] must leave a daily store
  * identical to the from-scratch day aggregation — across a
  * checkpoint-boundary restart, and as a fixpoint under duplicate
  * delivery (SUM state is NOT naturally idempotent; the (ts, event_id)
  * high-water mark is the mechanism under test — the O(1) degenerate
  * of IndexStream's seen set, valid because the log is time-ordered).
  */
class SeasonalStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fixture events in the (ts, event_id) delivery order the ordering
    * contract requires across micro-batches.
    */
  private def fixtureEvents: Array[(Long, java.sql.Timestamp, Double)] =
    graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .sortBy(e => (e._2.getTime, e._1))

  /** From-scratch daily aggregation — the independent reference. */
  private def batchDaily: Map[java.sql.Date, Long] =
    graft.sources.Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(FLOOR(value * 100) AS BIGINT)")).as("v_cents"))
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap

  private def dailyMap(df: org.apache.spark.sql.DataFrame): Map[java.sql.Date, Long] =
    df.collect().map(r => r.getDate(0) -> r.getLong(1)).toMap

  test("streamed daily series == from-scratch aggregation after 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("seasonstream").toString
    val (dailyDir, wmDir, ckpt) = (s"$base/daily", s"$base/wm", s"$base/ckpt")
    val ev = fixtureEvents
    assert(ev.length > 10, "fixture too small to exercise batching")

    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = SeasonalStream.start(
      in.toDF().toDF("event_id", "ts", "value"), dailyDir, wmDir, ckpt)
    try {
      ev.grouped((ev.length + 2) / 3).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(dailyMap(spark.read.parquet(dailyDir)) === batchDaily,
      "streamed series drifted from the corpus truth")
    // the mark ends at the last delivered (ts, event_id)
    val wm = spark.read.parquet(wmDir).collect()
    assert(wm.length === 1)
    assert(wm.head.getTimestamp(0) === ev.last._2 && wm.head.getLong(1) === ev.last._1)
  }

  test("series survives a checkpoint-boundary restart and finishes == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("seasonstream_restart").toString
    val (dailyDir, wmDir, ckpt) = (s"$base/daily", s"$base/wm", s"$base/ckpt")
    val ev = fixtureEvents
    val (phase1, phase2) = ev.splitAt(ev.length / 2)

    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    def start() = SeasonalStream.start(
      in.toDF().toDF("event_id", "ts", "value"), dailyDir, wmDir, ckpt)

    val q1 = start()
    in.addData(phase1.toSeq)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    try {
      in.addData(phase2.toSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    assert(dailyMap(spark.read.parquet(dailyDir)) === batchDaily,
      "restarted fold drifted from the corpus truth")
  }

  test("step re-applied to committed batches is a fixpoint (high-water-mark idempotence)") {
    import spark.implicits._
    val ev = fixtureEvents.take(40)
    val (b1, b2) = ev.splitAt(20)
    def frame(b: Seq[(Long, java.sql.Timestamp, Double)]) =
      b.toDF("event_id", "ts", "value")
    val s1 = SeasonalStream.step(
      SeasonalStream.emptyDaily(spark), SeasonalStream.emptyWm(spark),
      frame(b1.toSeq))
    val s2 = SeasonalStream.step(s1._1, s1._2, frame(b2.toSeq))
    // the LAST batch again — the at-least-once shape
    val again = SeasonalStream.step(s2._1, s2._2, frame(b2.toSeq))
    assert(dailyMap(again._1) === dailyMap(s2._1),
      "re-applying the committed tail batch changed the sums")
    // an EARLIER committed batch again — everything is below the mark
    val earlier = SeasonalStream.step(again._1, again._2, frame(b1.toSeq))
    assert(dailyMap(earlier._1) === dailyMap(s2._1),
      "re-applying an old batch changed the sums")
    assert(earlier._2.collect().toSeq === s2._2.collect().toSeq,
      "the mark must not move on replay")
  }
}
