package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IndexStream

/** Streaming index-statistics maintenance == its batch twin: the
  * fixture corpus fed through [[IndexStream]] must leave a stats store
  * identical to the from-scratch df/tf aggregation — across a
  * checkpoint-boundary restart, and as a fixpoint under duplicate
  * delivery (SUM state is NOT naturally idempotent; the seen-set
  * anti-join is the mechanism under test).
  */
class IndexStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureDocs: Array[(Long, String)] =
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getString(1)))

  /** From-scratch corpus aggregation — the independent reference. */
  private def batchStats: Map[String, (Long, Long)] =
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def statsMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("stream stats == from-scratch df/tf after 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("idxstream").toString
    val (statsDir, seenDir, ckpt) = (s"$base/stats", s"$base/seen", s"$base/ckpt")
    val docs = fixtureDocs
    assert(docs.length > 10, "fixture too small to exercise batching")

    val in = MemoryStream[(Long, String)]
    val q = IndexStream.start(
      in.toDF().toDF("doc_id", "text"), statsDir, seenDir, ckpt)
    try {
      docs.grouped((docs.length + 2) / 3).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = statsMap(spark.read.parquet(statsDir))
    assert(got === batchStats, "streamed stats drifted from the corpus truth")
    assert(spark.read.parquet(seenDir).count() === docs.length)
  }

  test("stats survive a checkpoint-boundary restart and finish == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("idxstream_restart").toString
    val (statsDir, seenDir, ckpt) = (s"$base/stats", s"$base/seen", s"$base/ckpt")
    val docs = fixtureDocs
    val (phase1, phase2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[(Long, String)]
    def start() = IndexStream.start(
      in.toDF().toDF("doc_id", "text"), statsDir, seenDir, ckpt)

    val q1 = start()
    in.addData(phase1.toSeq)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(seenDir).count() === phase1.length)

    val q2 = start()
    try {
      in.addData(phase2.toSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    assert(statsMap(spark.read.parquet(statsDir)) === batchStats,
      "restarted fold drifted from the corpus truth")
  }

  test("step re-applied to a committed batch is a fixpoint (seen-set idempotence)") {
    import spark.implicits._
    val docs = fixtureDocs.take(40)
    val (b1, b2) = docs.splitAt(20)
    def frame(b: Seq[(Long, String)]) = b.toDF("doc_id", "text")
    val s1 = IndexStream.step(
      IndexStream.emptyStats(spark), IndexStream.emptySeen(spark),
      frame(b1.toSeq))
    val s2 = IndexStream.step(s1._1, s1._2, frame(b2.toSeq))
    // duplicate delivery of batch 2 against the post-batch-2 state: the
    // SUM state would double-count without the anti-join
    val s2again = IndexStream.step(s2._1, s2._2, frame(b2.toSeq))
    assert(statsMap(s2again._1) === statsMap(s2._1),
      "re-applying a committed batch changed the sums")
    assert(s2again._2.count() === s2._2.count(), "seen rows must stay unique")
  }
}
