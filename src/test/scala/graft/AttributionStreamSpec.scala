package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AttributionStream

/** Stream == batch for multi-touch attribution: replaying the fixture's
  * event log through the O(1)-state processor and summing the emitted
  * contribution rows per channel must reproduce q286's batch ledger
  * exactly — first/last conversion counts AND the floor-scaled linear
  * credits — and a hand log pins the epoch-reset + '(none)' semantics.
  */
class AttributionStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming contributions aggregate to the q286 batch ledger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val touches = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), unix_micros(col("ts")).as("ts"),
        col("event_id"), col("event_type").as("channel"))
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => AttributionStream.Touch(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))

    val in = MemoryStream[AttributionStream.Touch]
    val q = AttributionStream.contributions(in.toDS()).toDF().writeStream
      .outputMode("append").format("memory").queryName("attr_stream").start()
    try {
      touches.grouped(math.max(1, touches.length / 7 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("attr_stream")
        .groupBy(col("channel"))
        .agg(sum(col("fc")).as("first_convs"),
          sum(col("lc")).as("last_convs"),
          sum(col("lin")).as("linear_x10k"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val expected = operators.Temporal.q286
        .run(spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("hand log: epoch reset, '(none)' conversion, floor-scaled credits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: view, click, click, PURCHASE  -> first=view last=click,
    //   per = 10000 div 3 = 3333: view 3333, click 6666
    // then PURCHASE with no touches         -> (none) epoch 1
    val log = Seq(
      AttributionStream.Touch(1L, 10L, 1L, "view"),
      AttributionStream.Touch(1L, 20L, 2L, "click"),
      AttributionStream.Touch(1L, 30L, 3L, "click"),
      AttributionStream.Touch(1L, 40L, 4L, "purchase"),
      AttributionStream.Touch(1L, 50L, 5L, "purchase"))
    val in = MemoryStream[AttributionStream.Touch]
    val q = AttributionStream.contributions(in.toDS()).toDF().writeStream
      .outputMode("append").format("memory").queryName("attr_hand").start()
    try {
      in.addData(log)
      q.processAllAvailable()
      val rows = spark.table("attr_hand").collect()
        .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).sortBy(t => (t._1, t._2, t._3, t._4))
      assert(rows.toSeq == Seq(
        (0L, "click", 0L, 0L, 6666L),
        (0L, "click", 0L, 1L, 0L),
        (0L, "view", 0L, 0L, 3333L),
        (0L, "view", 1L, 0L, 0L),
        (1L, "(none)", 1L, 1L, 10000L)))
    } finally q.stop()
  }
}
