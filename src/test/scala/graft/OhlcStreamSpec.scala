package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.OhlcStream
import graft.streaming.OhlcStream.Tick

/** Streaming OHLC bars against the equivalent batch aggregation on the
  * same out-of-order ticks: min_by/max_by under the (ts, event_id)
  * total order must be arrival-order-proof, and append mode must emit
  * each watermark-closed bar exactly once.
  */
class OhlcStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream bars == batch bars on an out-of-order tick stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two series, ticks scrambled WITHIN each batch (disorder below the
    // 1-hour watermark), batches advance in time
    val batches = Seq(
      Seq(Tick("x", ts("2024-05-01 00:30:00"), 2, 105L),
        Tick("x", ts("2024-05-01 00:10:00"), 1, 100L), // arrives late, is the true open
        Tick("y", ts("2024-05-01 01:00:00"), 3, 50L)),
      Seq(Tick("x", ts("2024-05-01 05:59:00"), 5, 90L), // true close of bar 1
        Tick("x", ts("2024-05-01 05:30:00"), 4, 130L)), // true high
      // next bar opens; watermark will close the first
      Seq(Tick("x", ts("2024-05-01 07:10:00"), 6, 111L),
        Tick("y", ts("2024-05-01 07:20:00"), 7, 55L)),
      // far-future sentinel closes everything real
      Seq(Tick("z", ts("2024-05-02 12:00:00"), 99, 1L)),
      Seq(Tick("z", ts("2024-05-02 23:00:00"), 100, 1L)))
    val in = MemoryStream[Tick]
    val q = OhlcStream.bars(in.toDS(), watermarkDelay = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("ohlc_stream").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("ohlc_stream")
        .filter(col("event_type") =!= "z")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))
        .toSet
      // batch reference: same aggregation over all real ticks at rest
      val all = batches.flatten.filter(_.event_type != "z")
      val expect = all.toDS().toDF()
        .groupBy(col("event_type"), window(col("ts"), "6 hours").as("w"))
        .agg(
          min_by(col("cents"), struct(col("ts"), col("event_id")))
            .as("open_c"),
          max(col("cents")).as("high_c"), min(col("cents")).as("low_c"),
          max_by(col("cents"), struct(col("ts"), col("event_id")))
            .as("close_c"),
          count(lit(1)).as("n"), sum(col("cents")).as("turn"))
        .collect()
        .map(r => (r.getString(0),
          r.getStruct(1).getTimestamp(0).toString, r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))
        .toSet
      assert(got == expect, s"\nstream=$got\nbatch=$expect")
      // the hand-checked bar: late-arriving open, mid-bar high, true close
      assert(got.contains(("x", "2024-05-01 00:00:00.0",
        100L, 130L, 90L, 90L, 4L, 425L)))
      // exactly-once: no bar appears twice (Set equality above plus size)
      assert(spark.table("ohlc_stream")
        .filter(col("event_type") =!= "z").count() == got.size)
    } finally q.stop()
  }
}
