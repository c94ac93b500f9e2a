package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DriftStream

/** Streaming histogram maintenance == its batch twin: the fixture
  * document log fed through [[DriftStream]] must leave a (lang, v, cnt)
  * store identical to the from-scratch aggregation — across a
  * checkpoint-boundary restart, and as a fixpoint under duplicate
  * delivery (the doc_id high-water mark under test is the O(1)
  * degenerate of IndexStream's seen set, valid because a document log
  * is id-ordered).
  */
class DriftStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fixture docs in the doc_id delivery order the contract requires. */
  private def fixtureDocs: Array[(Long, String, Long)] =
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)

  /** From-scratch histogram — the independent reference. */
  private def batchHist: Map[(String, Long), Long] =
    graft.sources.Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("n_chars").cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  private def histMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed histogram == from-scratch aggregation after 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("driftstream").toString
    val (stateDir, ckpt) = (s"$base/state", s"$base/ckpt")
    val docs = fixtureDocs
    assert(docs.length > 10, "fixture too small to exercise batching")

    val in = MemoryStream[(Long, String, Long)]
    val q = DriftStream.start(
      in.toDF().toDF("doc_id", "lang", "n_chars"), stateDir, ckpt)
    try {
      docs.grouped((docs.length + 2) / 3).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(histMap(DriftStream.readHist(spark, stateDir)) === batchHist,
      "streamed histogram drifted from the corpus truth")
    val wm = DriftStream.readWm(spark, stateDir).collect()
    assert(wm.length === 1 && wm.head.getLong(0) === docs.last._1)
  }

  test("histogram survives a checkpoint-boundary restart and finishes == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("driftstream_restart").toString
    val (stateDir, ckpt) = (s"$base/state", s"$base/ckpt")
    val docs = fixtureDocs
    val (phase1, phase2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[(Long, String, Long)]
    def start() = DriftStream.start(
      in.toDF().toDF("doc_id", "lang", "n_chars"), stateDir, ckpt)

    val q1 = start()
    in.addData(phase1.toSeq)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    try {
      in.addData(phase2.toSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    assert(histMap(DriftStream.readHist(spark, stateDir)) === batchHist,
      "restarted fold drifted from the corpus truth")
  }

  test("crash mid-batch is invisible: unmarked version dirs never publish, replay recommits atomically") {
    import spark.implicits._
    val base = Files.createTempDirectory("driftstream_crash").toString
    val stateDir = s"$base/state"
    val docs = fixtureDocs
    val (b1, b2) = docs.splitAt(docs.length / 2)
    def frame(b: Seq[(Long, String, Long)]) =
      b.toDF("doc_id", "lang", "n_chars")

    // batch 1 commits normally (version 0)
    DriftStream.processBatch(frame(b1.toSeq), stateDir)
    val committed1 = histMap(DriftStream.readHist(spark, stateDir))
    val wm1 = DriftStream.readWm(spark, stateDir).collect().head.getLong(0)

    // simulate a crash DURING batch 2: both stores fully written for
    // v1 but no _COMMITTED marker (the worst pre-fix window — under
    // the old two-path overwrite this is exactly the state that
    // silently double-counted or silently lost the batch)
    val (h2, w2) = (DriftStream.readHist(spark, stateDir),
      DriftStream.readWm(spark, stateDir))
    val next = DriftStream.step(h2, w2, frame(b2.toSeq))
    next._1.write.parquet(s"$stateDir/v1/hist")
    next._2.write.parquet(s"$stateDir/v1/wm")
    // no marker → readers must still see version 0, both stores in step
    assert(DriftStream.committedVersion(spark, stateDir) === 0L)
    assert(histMap(DriftStream.readHist(spark, stateDir)) === committed1,
      "an uncommitted histogram version leaked to readers")
    assert(DriftStream.readWm(spark, stateDir).collect().head.getLong(0)
      === wm1, "an uncommitted mark version leaked to readers")

    // the stream replays batch 2 (foreachBatch re-delivery after the
    // crash): the orphaned v1 is discarded and recommitted whole
    DriftStream.processBatch(frame(b2.toSeq), stateDir)
    assert(DriftStream.committedVersion(spark, stateDir) === 1L)
    assert(histMap(DriftStream.readHist(spark, stateDir)) === batchHist,
      "replay over the orphaned version diverged from the corpus truth")
    assert(DriftStream.readWm(spark, stateDir).collect().head.getLong(0)
      === docs.last._1)
    // GC retains the committed version plus its immediate predecessor
    // (the reader-validity window — see the next test), nothing older
    val live = new java.io.File(stateDir).listFiles().map(_.getName).toSet
    assert(live === Set("v0", "v1"), s"GC retention drifted: $live")
  }

  test("reader frames survive one concurrent commit; stray 'v' dir is ignored (r15 ADVICE)") {
    import spark.implicits._
    val base = Files.createTempDirectory("driftstream_reader").toString
    val stateDir = s"$base/state"
    val docs = fixtureDocs
    val (b1, rest) = docs.splitAt(docs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    def frame(b: Seq[(Long, String, Long)]) =
      b.toDF("doc_id", "lang", "n_chars")

    DriftStream.processBatch(frame(b1.toSeq), stateDir)
    // a directory named exactly "v" used to crash the version parse
    // ("".toLong) in both committedVersion and the GC loop
    new java.io.File(s"$stateDir/v").mkdirs()
    // lazy reader frame pinned to v0 ...
    val held = DriftStream.readHist(spark, stateDir)
    // ... held across the NEXT commit: the one-version GC retention
    // keeps v0 on disk, so resolving the held frame must not throw
    DriftStream.processBatch(frame(b2.toSeq), stateDir)
    val heldTotal = held.agg(org.apache.spark.sql.functions.sum("cnt"))
      .collect().head.getLong(0)
    assert(heldTotal === b1.size.toLong,
      "held v0 frame no longer reads its version's truth")
    // third commit: v0 is now two versions back and reclaimed; the
    // stray "v" dir must survive untouched (never parsed, never GC'd)
    DriftStream.processBatch(frame(b3.toSeq), stateDir)
    val live = new java.io.File(stateDir).listFiles().map(_.getName).toSet
    assert(live === Set("v", "v1", "v2"), s"unexpected live set: $live")
    assert(DriftStream.committedVersion(spark, stateDir) === 2L)
    assert(histMap(DriftStream.readHist(spark, stateDir)) === batchHist)
  }

  test("step re-applied to committed batches is a fixpoint (doc_id mark idempotence)") {
    import spark.implicits._
    val docs = fixtureDocs.take(40)
    val (b1, b2) = docs.splitAt(20)
    def frame(b: Seq[(Long, String, Long)]) =
      b.toDF("doc_id", "lang", "n_chars")
    val s1 = DriftStream.step(
      DriftStream.emptyHist(spark), DriftStream.emptyWm(spark),
      frame(b1.toSeq))
    val s2 = DriftStream.step(s1._1, s1._2, frame(b2.toSeq))
    val again = DriftStream.step(s2._1, s2._2, frame(b2.toSeq))
    assert(histMap(again._1) === histMap(s2._1),
      "re-applying the committed tail batch changed the counts")
    val earlier = DriftStream.step(again._1, again._2, frame(b1.toSeq))
    assert(histMap(earlier._1) === histMap(s2._1),
      "re-applying an old batch changed the counts")
    assert(earlier._2.collect().toSeq === s2._2.collect().toSeq,
      "the mark must not move on replay")
  }

  test("KS view over the maintained histogram == batch q324") {
    import spark.implicits._
    val docs = fixtureDocs
    def frame(b: Seq[(Long, String, Long)]) =
      b.toDF("doc_id", "lang", "n_chars")
    var st = (DriftStream.emptyHist(spark), DriftStream.emptyWm(spark))
    docs.grouped((docs.length + 3) / 4).foreach { b =>
      st = DriftStream.step(st._1, st._2, frame(b.toSeq))
    }
    val streamed = operators.Analytics.ksFromHistogram(st._1)
      .collect().map(_.toSeq)
    val batch = operators.Analytics.q324.run(spark, sfDir)
      .collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
  }
}
