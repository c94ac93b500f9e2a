package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.FEv

/** The streaming funnel (watermark sort-buffer + timers) against the
  * batch funnel window on the same events: order sensitivity is the
  * whole point, so the stream delivers them OUT of order (within the
  * watermark delay) and the final snapshots must still equal the batch
  * fold.
  */
class FunnelStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  // base instant far from epoch so watermark arithmetic is realistic
  private val T0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime * 1000L

  /** (user, offset-us, event_id, type) → FEv */
  private def ev(u: Long, off: Long, id: Long, tp: String): FEv =
    FEv(u, ts(T0 + off), id, tp)

  test("out-of-order stream folds to the batch funnel exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState's multiple column families need RocksDB state
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val M = 60L * 1000000L // one minute in micros
    // per-user scripts exercising every qualification rule; offsets in
    // minutes, event ids globally unique
    val all = Seq(
      // u1: click before view (no conversion), then full funnel
      ev(1, 5 * M, 1, "click"), ev(1, 10 * M, 2, "view"),
      ev(1, 15 * M, 3, "purchase"), ev(1, 20 * M, 4, "click"),
      ev(1, 30 * M, 5, "purchase"),
      // u2: views only
      ev(2, 7 * M, 6, "view"), ev(2, 9 * M, 7, "view"),
      // u3: same-microsecond view/click tie, purchase later
      ev(3, 11 * M, 8, "view"), ev(3, 11 * M, 9, "click"),
      ev(3, 12 * M, 10, "purchase"),
      // u4: purchase before any view, never converts past view
      ev(4, 3 * M, 11, "purchase"), ev(4, 8 * M, 12, "view"))
    // stream delivery: scrambled WITHIN each ~5-minute band (disorder
    // below the 10-minute watermark delay), bands in order
    val bands = all.groupBy(_.ts.getTime / (5 * 60 * 1000L)).toSeq
      .sortBy(_._1).map { case (_, evs) =>
        new scala.util.Random(42).shuffle(evs)
      }
    val in = MemoryStream[FEv]
    val q = FunnelStream.track(in.toDS(), watermarkDelay = "10 minutes")
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("funnel_stream").start()
    try {
      bands.foreach { b => in.addData(b); q.processAllAvailable() }
      // flush: a sentinel user far in the future drives the watermark
      // past every real event, so all buffers drain via timers
      in.addData(ev(99, 10000 * M, 999, "view"))
      q.processAllAvailable()
      in.addData(ev(99, 10001 * M, 1000, "view"))
      q.processAllAvailable()
      val finals = spark.table("funnel_stream")
        .filter(col("user_id") =!= 99L)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (u, rows) =>
          val last = rows.maxBy(_.getLong(4)) // max n_done
          assert(last.getLong(5) == 0L, s"user $u still has parked events")
          def opt(i: Int) = if (last.isNullAt(i)) None else Some(last.getLong(i))
          u -> ((opt(1), opt(2), opt(3)))
        }
      val batch = operators.Temporal.funnelPerUser(
          all.map(e => (e.user_id,
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000L,
            e.event_id, e.event_type))
            .toDF("user_id", "us", "event_id", "event_type"))
        .collect().map { r =>
          def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
          r.getLong(0) -> ((opt(1), opt(2), opt(3)))
        }.toMap
      assert(finals == batch, s"\nstream=$finals\nbatch=$batch")
      // and the semantics are the intended ones, not vacuously equal
      assert(batch(1L) == ((Some(T0 + 10 * M), Some(T0 + 20 * M),
        Some(T0 + 30 * M))))
      assert(batch(3L) == ((Some(T0 + 11 * M), Some(T0 + 11 * M),
        Some(T0 + 12 * M))))
      assert(batch(4L) == ((Some(T0 + 8 * M), None, None)))
    } finally q.stop()
  }

  test("funnel state (folded triple + parked buffer) survives a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_funnel_ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_funnel_out").toString
    val M = 60L * 1000000L
    val in = MemoryStream[FunnelStream.FEv]
    def start() = FunnelStream.track(in.toDS(), "10 minutes")
      .toDF().writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format("parquet").option("path", out).start()
    // incarnation 1: the view arrives and is still PARKED (watermark
    // hasn't passed it) when the query stops
    val q1 = start()
    in.addData(ev(1, 5 * M, 1, "view"), ev(1, 6 * M, 2, "click"))
    q1.processAllAvailable()
    in.addData(ev(1, 14 * M, 3, "purchase"))
    q1.processAllAvailable()
    q1.stop()
    // incarnation 2: the purchase + flush sentinel; the parked view and
    // click recovered from state must still qualify the later stages
    val q2 = start()
    in.addData(ev(99, 10000 * M, 999, "view"))
    q2.processAllAvailable()
    in.addData(ev(99, 10001 * M, 1000, "view"))
    q2.processAllAvailable()
    q2.stop()
    val last = spark.read.parquet(out)
      .filter(col("user_id") === 1L)
      .collect().maxBy(_.getLong(4)) // max n_done
    assert(last.getLong(5) == 0L, "parked events not drained")
    assert(last.getLong(1) == 5 * M + T0 && last.getLong(2) == 6 * M + T0
      && last.getLong(3) == 14 * M + T0,
      s"restart lost ordered-fold state: $last")
  }
}
