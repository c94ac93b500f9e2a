package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PackingStream

/** The exactly-once-resume claim, actually exercised: a
  * transformWithState query writing to the fault-tolerant FILE sink is
  * STOPPED mid-stream and restarted from its checkpoint. The per-key
  * state (running token totals) must continue exactly where the first
  * incarnation committed, and the sink must hold EXACTLY one row per
  * input doc afterwards — no re-emission, no gap at the boundary.
  * (The memory sink refuses checkpoint recovery outright — part of why
  * the engine's durable outputs go through file/DSv2 sinks.)
  */
class StreamRestartSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Budget = 512L

  test("transformWithState resumes from the checkpoint across a query restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString
    val out = Files.createTempDirectory("graft_restart_out").toString

    val docs = (0L until 120L).map(i =>
      PackingStream.DocTok(i, s"lang${i % 3}", 40 + (i * 7) % 90))
    val (phase1, phase2) = docs.splitAt(70)

    val in = MemoryStream[PackingStream.DocTok]
    def start() =
      PackingStream.offsets(in.toDS(), Budget).toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append").format("parquet")
        .option("path", out).start()

    // incarnation 1: two micro-batches, then STOP (state committed)
    val q1 = start()
    phase1.grouped(35).foreach { b => in.addData(b); q1.processAllAvailable() }
    q1.stop()

    // incarnation 2: same checkpoint, fresh query — totals must continue
    val q2 = start()
    phase2.grouped(25).foreach { b => in.addData(b); q2.processAllAvailable() }
    try {
      val rows = spark.read.parquet(out)
        .select($"doc_id", $"off").collect()
        .map(r => r.getLong(0) -> r.getLong(1))

      // exactly-once across the restart: one emission per doc, total
      assert(rows.length === docs.length,
        s"expected ${docs.length} rows, sink holds ${rows.length}")
      val got = rows.toMap

      // reference: serial prefix sum over the FULL input in doc order —
      // the restarted incarnation must CONTINUE the totals, not reset
      val expected = docs.groupBy(_.lang).flatMap { case (_, ds) =>
        var tot = 0L
        ds.sortBy(_.doc_id).map { d => val o = d.doc_id -> tot; tot += d.n_toks; o }
      }
      assert(docs.forall(d => got(d.doc_id) == expected(d.doc_id)),
        "running totals did not survive the restart")
    } finally q2.stop()
  }
}
