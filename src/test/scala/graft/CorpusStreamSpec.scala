package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CorpusStream

/** Streaming corpus-intake semantics: the quality gate applies q41's
  * exact batch rule, duplicates inside the watermark horizon are
  * dropped, and the surviving set equals the batch-computed expectation
  * on the same rows (stream-batch equivalence).
  */
class CorpusStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // rich text passes the 0.5 gate (stopwords + diverse tokens), the
  // degenerate one fails it (no stopwords, one repeated token)
  private val goodText = "the quick brown fox jumps over a lazy dog of the north and south to win"
  private val junkText = "spam spam spam spam spam spam spam spam"

  test("intake gates on q41's quality rule and drops in-watermark duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = CorpusStream.cleanIntake(
      in.toDF().toDF("doc_id", "text", "ingest_ts"), minQuality = 0.5)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("intake").start()
    try {
      in.addData(
        (1L, goodText, ts("2024-01-01 00:00:00")),
        (2L, junkText, ts("2024-01-01 00:00:10")), // fails the gate
        (3L, goodText, ts("2024-01-01 00:05:00"))) // dup of 1 within watermark
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM intake")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L), s"got $kept")

      // stream-batch equivalence on the same rows: batch computes the
      // identical gate + distinct-by-fingerprint
      val batch = Seq((1L, goodText), (2L, junkText), (3L, goodText))
        .toDF("doc_id", "text")
        .withColumn("quality", graft.operators.TextOps.qualityScore(col("text")))
        .filter(col("quality") >= 0.5)
        .withColumn("fp", graft.functions.RollingHash.rollingHash(col("text")))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .collect().map(_.getLong(1)).toSet
      assert(kept === batch)
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val out = graft.streaming.StreamJoins.enrichWithDim(
      in.toDF().toDF("event_id", "user_id", "ts"), dim)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try {
      in.addData((10L, 1L, ts("2024-01-01 00:00:00")),
        (11L, 2L, ts("2024-01-01 00:00:01")),
        (12L, 9L, ts("2024-01-01 00:00:02"))) // no dim row -> 'unknown'
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, tier FROM enriched")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((10L, "gold"), (11L, "basic"), (12L, "unknown")))
      // stateless contract: no stateful operator in the streaming plan
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("file-source streaming: JSONL directory drained with AvailableNow equals batch") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    // a real file-based streaming source (not MemoryStream): documents
    // written as JSONL, discovered and drained by one AvailableNow run —
    // the backfill pattern (stream semantics, batch lifecycle)
    val src = java.nio.file.Files.createTempDirectory("stream_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"),
        // deterministic ingest timestamps so the watermark math is fixed
        expr("timestamp_micros(1700000000000000 + doc_id * 1000000)").as("ingest_ts"))
    docs.write.mode("overwrite").json(src)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ingest_ts", TimestampType)))
    val stream = spark.readStream.schema(schema).json(src)
    val q = graft.streaming.CorpusStream.cleanIntake(stream, minQuality = 0.0)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("file_intake")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.sql("SELECT doc_id FROM file_intake")
        .collect().map(_.getLong(0)).toSet
      // batch twin: quality-0 gate keeps everything; dedup keeps one doc
      // per distinct fingerprint (min doc_id through the same min rule
      // isn't guaranteed by the stream — compare fingerprint SETS)
      val batchFps = docs
        .withColumn("fp", graft.functions.RollingHash.rollingHash(col("text")))
        .select(col("fp")).distinct().count()
      assert(streamed.size.toLong === batchFps,
        s"stream kept ${streamed.size}, batch distinct fingerprints $batchFps")
    } finally q.stop()
  }

  test("a duplicate arriving past the watermark horizon is admitted again") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = CorpusStream.cleanIntake(
      in.toDF().toDF("doc_id", "text", "ingest_ts"), minQuality = 0.5)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("intake_late").start()
    try {
      in.addData((1L, goodText, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // push the watermark far past 00:30 so doc 1's seen-state expires
      in.addData((2L, goodText + " x", ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      in.addData((3L, goodText, ts("2024-01-01 03:10:00"))) // same fp as 1
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM intake_late")
        .collect().map(_.getLong(0)).toSet
      // state for fp(goodText) expired with the watermark: doc 3 re-admitted
      assert(kept === Set(1L, 2L, 3L), s"got $kept")
    } finally q.stop()
  }
}
