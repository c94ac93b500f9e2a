package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamJoins

/** Stream-stream join + watermark-scoped dedup semantics, driven
  * deterministically through MemoryStream micro-batches.
  */
class StreamJoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream inner join matches clicks within the 10-min window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.attributionInner(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("click_ad_id", "click_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_inner").start()
    try {
      imps.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
      clicks.addData(
        (1L, ts("2024-01-01 00:05:00")),  // inside window -> match
        (2L, ts("2024-01-01 00:20:00")))  // 20 min late   -> no match
      q.processAllAvailable()
      val rows = spark.sql("SELECT ad_id, latency_s FROM attr_inner")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, 300L)), s"got $rows")
    } finally q.stop()
  }

  test("left-outer join emits null-click rows only after the window provably closes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.attributionLeftOuter(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("click_ad_id", "click_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_outer").start()
    try {
      imps.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
      clicks.addData((1L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      // ad 2 is unmatched but its join window is still open: no row yet
      val early = spark.sql("SELECT ad_id FROM attr_outer WHERE click_ts IS NULL").count()
      assert(early === 0L, "outer row emitted before watermark closed the window")
      // advance BOTH watermarks far past 00:10 so the unmatched row finalizes
      imps.addData((9L, ts("2024-01-01 02:00:00")))
      clicks.addData((9L, ts("2024-01-01 02:00:01")))
      q.processAllAvailable()
      imps.addData((8L, ts("2024-01-01 03:00:00")))
      clicks.addData((8L, ts("2024-01-01 03:00:01")))
      q.processAllAvailable()
      val nullClicks = spark.sql("SELECT ad_id FROM attr_outer WHERE click_ts IS NULL")
        .collect().map(_.getLong(0)).toSet
      assert(nullClicks.contains(2L), "unmatched impression never emitted")
      val matched = spark.sql("SELECT ad_id FROM attr_outer WHERE click_ts IS NOT NULL")
        .collect().map(_.getLong(0)).toSet
      assert(matched.contains(1L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val deduped = StreamJoins.dedupWithinWatermark(
      input.toDF().toDF("event_id", "ts", "value"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm").start()
    try {
      // duplicate id 1 within one batch AND again across batches
      input.addData((1L, ts("2024-01-01 00:00:00"), 1.0),
        (1L, ts("2024-01-01 00:00:30"), 1.0),
        (2L, ts("2024-01-01 00:01:00"), 2.0))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 00:02:00"), 1.0),
        (3L, ts("2024-01-01 00:03:00"), 3.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_wm")
        .collect().map(_.getLong(0)).toList.sorted
      assert(ids === List(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("foreachBatch sink is idempotent under batch replay (batchId-keyed overwrite)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("fbsink").toString
    val input = MemoryStream[Long]
    // exactly-once discipline for a non-transactional sink: partition the
    // output by batchId and OVERWRITE that partition — replaying a batch
    // after a failure rewrites the same files instead of appending dupes
    def writeBatch(df: org.apache.spark.sql.Dataset[Long], batchId: Long): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .parquet(s"$tmp/batch_id=$batchId")
    val q = input.toDS().map(_ * 10)
      .writeStream
      .foreachBatch(writeBatch _)
      .start()
    try {
      input.addData(1L, 2L)
      q.processAllAvailable()
      input.addData(3L)
      q.processAllAvailable()
    } finally q.stop()
    val once = spark.read.parquet(s"$tmp/batch_id=0", s"$tmp/batch_id=1")
      .collect().map(_.getLong(0)).sorted
    assert(once.toSeq === Seq(10L, 20L, 30L))
    // simulate a replay of batch 0 (same data, same id): no duplication
    writeBatch(Seq(10L, 20L).toDS(), 0L)
    val afterReplay = spark.read.parquet(s"$tmp/batch_id=0", s"$tmp/batch_id=1")
      .collect().map(_.getLong(0)).sorted
    assert(afterReplay.toSeq === Seq(10L, 20L, 30L), "replay duplicated rows")
  }

  test("transformWithState (state v2) keeps per-user count/max across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.ValueTracker
    // state v2 needs a multi-column-family store: RocksDB, not the
    // default HDFS-backed provider (conf is read at query start)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[ValueTracker.In]
    val q = ValueTracker.profiles(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("vt_profiles").start()
    try {
      input.addData(ValueTracker.In(1L, 5.0), ValueTracker.In(1L, 9.0),
        ValueTracker.In(2L, 3.0))
      q.processAllAvailable()
      input.addData(ValueTracker.In(1L, 7.0)) // count grows, max stays 9
      q.processAllAvailable()
      val latest = spark.sql(
          "SELECT user_id, n_events, max_value FROM vt_profiles")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(latest(1L) === ((1L, 3L, 9.0)), s"got ${latest(1L)}")
      assert(latest(2L) === ((2L, 1L, 3.0)))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
