package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ClusterStream

/** Streaming pair-free clustering == its batch twin: the fixture corpus
  * fed through [[ClusterStream]] in doc_id order must leave a labels
  * store identical to q255's from-scratch star-contraction closure —
  * including across a checkpoint-boundary restart (the maintained
  * artifact, not any single incarnation, is the contract).
  */
class ClusterStreamSpec extends AnyFunSuite {

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

  private def batchLabels: Map[Long, Long] =
    operators.Dedup.q255.run(spark, sfDir)
      .select(col("doc_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stream labels == q255 batch closure after 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("cluststream").toString
    val (labelsDir, hubDir, ckpt) = (s"$base/labels", s"$base/hubs", s"$base/ckpt")
    val docs = fixtureDocs
    assert(docs.length > 10, "fixture too small to exercise batching")

    val in = MemoryStream[(Long, String, String, String)]
    val q = ClusterStream.start(
      in.toDF().toDF("doc_id", "lang", "source", "text"),
      labelsDir, hubDir, ckpt)
    try {
      docs.grouped((docs.length + 2) / 3).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(labelsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.length === docs.length, "one label row per doc")
    val twin = batchLabels
    val got = streamed.toMap
    assert(got === twin,
      s"first diffs: ${got.toSeq.filter(kv => twin(kv._1) != kv._2).take(5)}")
    // the fold actually merged across batch boundaries (the fixture has
    // near-dup clusters spanning the arrival split)
    assert(got.values.toSet.size < docs.length,
      "fixture contains near-dup clusters; labels must coalesce")
  }

  test("labels survive a checkpoint-boundary restart and finish == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("cluststream_restart").toString
    val (labelsDir, hubDir, ckpt) = (s"$base/labels", s"$base/hubs", s"$base/ckpt")
    val docs = fixtureDocs
    val (phase1, phase2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[(Long, String, String, String)]
    def start() = ClusterStream.start(
      in.toDF().toDF("doc_id", "lang", "source", "text"),
      labelsDir, hubDir, ckpt)

    // incarnation 1: two micro-batches, then STOP (stores committed)
    val q1 = start()
    phase1.grouped((phase1.length + 1) / 2).foreach { b =>
      in.addData(b.toSeq); q1.processAllAvailable()
    }
    q1.stop()
    val midCount = spark.read.parquet(labelsDir).count()
    assert(midCount === phase1.length, "incarnation 1 labeled its prefix")

    // incarnation 2: same checkpoint — must CONTINUE the stores, not
    // reprocess or reset them
    val q2 = start()
    try {
      in.addData(phase2.toSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(labelsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === docs.length)
    assert(got === batchLabels, "restarted fold drifted from the batch closure")
  }

  test("step re-applied to already-updated state is a fixpoint (at-least-once safety)") {
    import spark.implicits._
    val docs = fixtureDocs.take(60)
    val (b1, b2) = docs.splitAt(30)
    def frame(b: Seq[(Long, String, String, String)]) =
      b.toDF("doc_id", "lang", "source", "text")
    def labelMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val s1 = ClusterStream.step(
      ClusterStream.emptyLabels(spark), ClusterStream.emptyHubs(spark),
      frame(b1.toSeq))
    val s2 = ClusterStream.step(s1._1, s1._2, frame(b2.toSeq))
    // duplicate delivery of batch 2 against the post-batch-2 state
    val s2again = ClusterStream.step(s2._1, s2._2, frame(b2.toSeq))
    assert(labelMap(s2again._1) === labelMap(s2._1),
      "re-applying a committed batch changed the labels")
    assert(s2again._1.count() === s2._1.count(), "label rows must stay unique")
  }
}
