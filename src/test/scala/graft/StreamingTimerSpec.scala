package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{SessionTracker, TimerSessions}

/** The state-v2 timer sessionizer against the v1 timeout sessionizer:
  * both consume the same micro-batch sequence and must close the same
  * sessions — in-batch gap closes, watermark/timer closes, straggler
  * isolation, and the no-double-close contract when a timer fires for
  * state that moved on.
  */
class StreamingTimerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val scenario: Seq[Seq[(Long, Timestamp)]] = Seq(
    // user 1: burst; user 2: singleton
    Seq((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:05:00")),
      (2L, ts("2024-01-01 00:10:00"))),
    // user 1 continues (keeps its session alive across batches — the
    // timer must be re-armed, the old one deleted)
    Seq((1L, ts("2024-01-01 00:20:00"))),
    // watermark pushers: close 1 and 2 by timeout; user 3 opens
    Seq((3L, ts("2024-01-01 03:00:00"))),
    Seq((3L, ts("2024-01-01 06:00:00"))),
    // straggler for user 3 far BEFORE its open session (allowed by the
    // generous watermark): isolated, closed immediately
    Seq((3L, ts("2024-01-01 03:30:00")), (4L, ts("2024-01-01 10:00:00"))),
    Seq((4L, ts("2024-01-01 14:00:00"))))

  private def run(name: String,
      f: org.apache.spark.sql.Dataset[SessionTracker.Ev] =>
        org.apache.spark.sql.Dataset[SessionTracker.ClosedSession])
      : Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val out = f(in.toDF().toDF("user_id", "ts").as[SessionTracker.Ev])
    val q = out.toDF().writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      scenario.foreach { batch => in.addData(batch); q.processAllAvailable() }
      spark.table(name)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    } finally q.stop()
  }

  test("timer-driven sessions == v1 timeout sessions on the same stream") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val v2 = run("timer_sessions", TimerSessions.track(_, gapMinutes = 30,
      watermarkDelay = "6 hours"))
    val v1 = run("v1_sessions", SessionTracker.track(_, gapMinutes = 30,
      watermarkDelay = "6 hours"))
    assert(v2 === v1, s"\nv2=$v2\nv1=$v1")
    // and the closes are the expected ones, not vacuously equal
    def us(s: String) = ts(s).getTime * 1000L
    assert(v2.contains((1L, us("2024-01-01 00:00:00"), us("2024-01-01 00:20:00"), 3L)))
    assert(v2.contains((3L, us("2024-01-01 03:30:00"), us("2024-01-01 03:30:00"), 1L)),
      "straggler not isolated")
  }
}
