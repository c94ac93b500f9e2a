package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.TrendingStream

/** Stream-batch equivalence for the trending-terms twin: the streaming
  * (window × token) counts over the real fixture corpus (documents on
  * their event-time axis, the q156/q168 join) equal the batch windowed
  * aggregation on the same rows, and the serving-side top-k agrees.
  */
class TrendingStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming (window, token) counts == batch window aggregation; top-5 agrees") {
    val staged = java.nio.file.Files.createTempDirectory("trend_docs").toString
    // the q168 axis: each doc's publication instant is its event's ts
    val timed = graft.sources.Tables.documents(spark, sfDir)
      .join(graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id").as("doc_id"), col("ts")), "doc_id")
      .select(col("text"), col("ts"))
    timed.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema("text STRING, ts TIMESTAMP")
      .parquet(staged)
    // complete mode: every window stays in the result table, so the
    // fixture's final (unclosed) window is comparable too
    val q = TrendingStream.tokenTrends(stream, "6 days", "1 day")
      .writeStream.outputMode("complete")
      .format("memory").queryName("trend_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT win.start AS ws, tok, n_occ FROM trend_test")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = spark.read.parquet(staged)
        .select(window(col("ts"), "6 days").as("win"),
          explode(split(trim(col("text")), " ")).as("tok"))
        .groupBy(col("win"), col("tok")).agg(count(lit(1)).as("n_occ"))
        .select(col("win.start").as("ws"), col("tok"), col("n_occ"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty && streamed === batch)

      // serving-side rank over the emitted table == rank over batch counts
      val topStream = TrendingStream.topK(
          spark.table("trend_test"), 5)
        .select(col("win.start"), col("tok"), col("rnk"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val topBatch = TrendingStream.topK(
          spark.read.parquet(staged)
            .select(window(col("ts"), "6 days").as("win"),
              explode(split(trim(col("text")), " ")).as("tok"))
            .groupBy(col("win"), col("tok")).agg(count(lit(1)).as("n_occ")), 5)
        .select(col("win.start"), col("tok"), col("rnk"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(topStream === topBatch)
    } finally q.stop()
  }

  test("append mode emits only watermark-closed windows, incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(String, java.sql.Timestamp)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val q = TrendingStream.tokenTrends(
        in.toDF().toDF("text", "ts"), "1 hour", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("trend_append").start()
    try {
      in.addData(("alpha beta alpha", ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      // window [00:00,01:00) still open — nothing emitted yet
      assert(spark.sql("SELECT * FROM trend_append").isEmpty)
      // an event past 01:00 + 10min lateness closes it
      in.addData(("gamma", ts("2024-01-01 01:20:00")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT tok, n_occ FROM trend_append")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows === Set(("alpha", 2L), ("beta", 1L)))
    } finally q.stop()
  }
}
