package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.NearDupStream

/** Streaming near-dup dedup == its batch twin: the fixture corpus fed
  * through [[NearDupStream]] in doc_id order (3 micro-batches) must
  * emit exactly q149's `survived = true` set, and the fingerprint
  * store must equal the batch q46 fingerprint table.
  */
class StreamingNearDupSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream survivors == q149 batch twin; store == q46 fingerprints") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("neardup").toString
    val (storeDir, outDir, ckpt) = (s"$base/store", s"$base/out", s"$base/ckpt")

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(docs.length > 10, "fixture too small to exercise batching")

    val in = MemoryStream[(Long, String, String, String)]
    val q = NearDupStream.start(
      in.toDF().toDF("doc_id", "lang", "source", "text"),
      storeDir, outDir, ckpt)
    try {
      // 3 batches in arrival (doc_id) order — batch boundaries land
      // mid-corpus so both the vs-store and the within-batch joins of
      // every batch see real candidates
      docs.grouped((docs.length + 2) / 3).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(outDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val twin = operators.Dedup.q149.run(spark, sfDir)
      .filter(col("survived"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(streamed === twin,
      s"stream-only=${(streamed -- twin).toSeq.sorted.take(5)} " +
        s"twin-only=${(twin -- streamed).toSeq.sorted.take(5)}")
    assert(streamed.size < docs.length,
      "fixture contains near-dups; the stream must drop some")

    // the accumulated store is the batch fingerprint table (q46)
    val store = spark.read.parquet(storeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchFps = operators.Dedup.q46.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(store === batchFps)
  }
}
