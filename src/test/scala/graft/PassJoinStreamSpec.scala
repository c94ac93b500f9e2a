package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.PassJoinStream

/** Streaming PassJoin edit-distance near-dup == its batch twin: the
  * fixture corpus fed through [[PassJoinStream]] in doc_id order must
  * emit exactly the first-writer-wins survivor set derived from q70's
  * oracled pair relation (a doc survives iff no SMALLER doc_id is
  * within edit distance ≤ 8 on the 40-char prefix in its block) —
  * across micro-batch boundaries, across a restart, and under
  * duplicate delivery.
  */
class PassJoinStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureDocs: Array[(Long, String, String, String)] =
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  /** First-writer-wins survivors from the batch q70 pair relation:
    * drop every doc that appears as doc_b (the larger id) of any
    * qualifying pair.
    */
  private def batchSurvivors(docs: Array[(Long, String, String, String)]): Set[Long] = {
    val droppedB = operators.Analytics.q70.run(spark, sfDir)
      .select(col("doc_b")).collect().map(_.getLong(0)).toSet
    docs.map(_._1).toSet -- droppedB
  }

  test("stream survivors == q70-derived batch twin after 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("passjoinstream").toString
    val (idxDir, docDir, outDir, ckpt) =
      (s"$base/idx", s"$base/docs", s"$base/out", s"$base/ckpt")
    val docs = fixtureDocs
    assert(docs.length > 10, "fixture too small to exercise batching")

    val in = MemoryStream[(Long, String, String, String)]
    val q = PassJoinStream.start(
      in.toDF().toDF("doc_id", "lang", "source", "text"),
      idxDir, docDir, outDir, ckpt)
    try {
      docs.grouped((docs.length + 2) / 3).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(outDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val twin = batchSurvivors(docs)
    assert(streamed === twin,
      s"stream-only=${(streamed -- twin).toSeq.sorted.take(5)} " +
        s"twin-only=${(twin -- streamed).toSeq.sorted.take(5)}")
    assert(streamed.size < docs.length,
      "fixture contains edit-distance near-dups; the stream must drop some")
    // the committed prefix store covers every arrival, dropped or not
    assert(spark.read.parquet(docDir).count() === docs.length.toLong)
  }

  test("survivor set survives a checkpoint-boundary restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("passjoinstream_restart").toString
    val (idxDir, docDir, outDir, ckpt) =
      (s"$base/idx", s"$base/docs", s"$base/out", s"$base/ckpt")
    val docs = fixtureDocs
    val (phase1, phase2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[(Long, String, String, String)]
    def start() = PassJoinStream.start(
      in.toDF().toDF("doc_id", "lang", "source", "text"),
      idxDir, docDir, outDir, ckpt)

    val q1 = start()
    phase1.grouped((phase1.length + 1) / 2).foreach { b =>
      in.addData(b.toSeq); q1.processAllAvailable()
    }
    q1.stop()

    val q2 = start()
    try {
      in.addData(phase2.toSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = spark.read.parquet(outDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(streamed === batchSurvivors(docs),
      "restarted stream drifted from the batch survivor set")
  }

  test("duplicate delivery of a committed batch re-emits nothing") {
    val base = Files.createTempDirectory("passjoinstream_dup").toString
    val (idxDir, docDir, outDir) = (s"$base/idx", s"$base/docs", s"$base/out")
    import spark.implicits._
    val docs = fixtureDocs.take(60)
    val (b1, b2) = docs.splitAt(30)
    def frame(b: Seq[(Long, String, String, String)]) =
      b.toDF("doc_id", "lang", "source", "text")
    PassJoinStream.processBatch(frame(b1.toSeq), idxDir, docDir, outDir)
    PassJoinStream.processBatch(frame(b2.toSeq), idxDir, docDir, outDir)
    val afterB2 = spark.read.parquet(outDir).count()
    // redelivery: every b2 doc self-matches its committed index rows at
    // distance 0 and drops — the output must not grow
    PassJoinStream.processBatch(frame(b2.toSeq), idxDir, docDir, outDir)
    assert(spark.read.parquet(outDir).count() === afterB2,
      "redelivered batch re-emitted survivors")
  }
}
