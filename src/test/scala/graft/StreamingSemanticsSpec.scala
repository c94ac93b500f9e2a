package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Watermark semantics (late-data drop) driven deterministically through
  * MemoryStream micro-batches, plus the salted-aggregation equivalence.
  */
class StreamingSemanticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops events later than the threshold (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_test").start()
    try {
      // batch 1: two events in the 00:00 window, one at 01:00 advancing
      // the watermark far past the first window
      input.addData((ts("2024-01-01 00:01:00"), 1L), (ts("2024-01-01 00:02:00"), 2L),
        (ts("2024-01-01 01:00:00"), 3L))
      q.processAllAvailable()
      // batch 2: a LATE event for the (closed) 00:00 window + one fresh
      input.addData((ts("2024-01-01 00:03:00"), 4L), (ts("2024-01-01 02:00:00"), 5L))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to finalize everything open
      input.addData((ts("2024-01-01 03:00:00"), 6L))
      q.processAllAvailable()

      val rows = spark.sql("SELECT ws, n FROM late_test")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      // the 00:00 window must have counted ONLY the 2 on-time events —
      // the late arrival (00:03 after watermark passed 00:50) was dropped
      assert(rows("2024-01-01 00:00:00.0") === 2L,
        s"late event leaked into a finalized window: $rows")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions close by gap AND by event-time timeout") {
    import spark.implicits._
    import graft.streaming.SessionTracker
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = SessionTracker.track(
      input.toDF().toDF("user_id", "ts").as[SessionTracker.Ev], gapMinutes = 30)
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sessions_test").start()
    try {
      // user 1: two bursts separated by > gap inside one batch (gap close);
      // user 2: one event, left open
      input.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:05:00")),
        (1L, ts("2024-01-01 01:00:00")), (2L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // advance the watermark far enough that both remaining open
      // sessions time out
      input.addData((3L, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      input.addData((3L, ts("2024-01-01 09:00:00")))
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT user_id, start_us, end_us, n_events FROM sessions_test ORDER BY user_id, start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      def us(s: String) = ts(s).getTime * 1000L
      // user 1's first burst closed by the in-batch gap
      assert(rows.contains((1L, us("2024-01-01 00:00:00"), us("2024-01-01 00:05:00"), 2L)),
        s"gap-closed session missing: ${rows.mkString(", ")}")
      // user 1's second burst and user 2's singleton closed by timeout
      assert(rows.contains((1L, us("2024-01-01 01:00:00"), us("2024-01-01 01:00:00"), 1L)))
      assert(rows.contains((2L, us("2024-01-01 01:00:00"), us("2024-01-01 01:00:00"), 1L)))
    } finally q.stop()
  }

  test("salted aggregation equals the plain aggregation (skew path)") {
    import graft.sources.Tables
    val sfDir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedCountSum(li,
        col("l_returnflag"), col("l_quantity").cast("decimal(18,2)"),
        col("l_orderkey"), saltBuckets = 16)
      .orderBy(col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue()))
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("total"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue()))
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted join equals the plain join (skewed-side scatter, right replicate)") {
    import graft.sources.Tables
    val sfDir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val parts = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))
      .withColumnRenamed("p_partkey", "l_partkey")
    val salted = Skew.saltedJoin(li, parts, "l_partkey", col("l_orderkey"), saltBuckets = 8)
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val plain = li.join(parts, "l_partkey")
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq === plain.toSeq)
  }
}
