package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ScdStream
import graft.streaming.ScdStream.OrderEv

/** The streaming SCD-2 (watermark sort-buffer + timers) against a
  * serial islands reference on the same observations: the stream
  * delivers them OUT of order (within the watermark delay) and the
  * closed intervals + latest open snapshot must equal the batch
  * q219-style interval table.
  */
class ScdStreamSpec extends AnyFunSuite {

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

  private val T0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime * 1000L
  private val M = 60L * 1000000L // one minute in micros

  private def ev(c: Long, off: Long, id: Long, pr: String): OrderEv =
    OrderEv(c, ts(T0 + off), id, pr)

  /** Serial q219 islands reference on (us, okey)-ordered observations:
    * (custkey, seq, pr, fromUs, toUs(None=open), nOrders).
    */
  private def serialIntervals(evs: Seq[OrderEv])
      : Set[(Long, Long, String, Long, Option[Long], Long)] = {
    def us(e: OrderEv) =
      e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000L
    evs.groupBy(_.custkey).flatMap { case (c, es) =>
      val sorted = es.sortBy(e => (us(e), e.orderkey))
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long)] // (pr, fromUs, n)
      sorted.foreach { e =>
        if (runs.nonEmpty && runs.last._1 == e.priority) {
          val l = runs.last; runs(runs.length - 1) = (l._1, l._2, l._3 + 1)
        } else runs += ((e.priority, us(e), 1L))
      }
      runs.zipWithIndex.map { case ((pr, from, n), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (c, (i + 1).toLong, pr, from, to, n)
      }
    }.toSet
  }

  private def runStream(bands: Seq[Seq[OrderEv]], name: String)
      : Set[(Long, Long, String, Long, Option[Long], Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[OrderEv]
    val q = ScdStream.track(in.toDS(), watermarkDelay = "10 minutes")
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      bands.foreach { b => in.addData(b); q.processAllAvailable() }
      // sentinel key far in the future drives the watermark past every
      // real event so all buffers drain via timers
      in.addData(ev(999, 100000 * M, 99901, "Z"))
      q.processAllAvailable()
      in.addData(ev(999, 100001 * M, 99902, "Z"))
      q.processAllAvailable()
      val rows = spark.table(name).filter(col("custkey") =!= 999L).collect()
      val closed = rows.filter(_.getBoolean(6)).map { r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          Some(r.getLong(4)): Option[Long], r.getLong(5))
      }
      assert(closed.distinct.length == closed.length,
        "a closed interval was emitted more than once")
      val opens = rows.filter(!_.getBoolean(6))
        .groupBy(_.getLong(0)).map { case (c, rs) =>
          val last = rs.maxBy(_.getLong(7)) // max n_done
          assert(last.getLong(8) == 0L, s"cust $c still has parked events")
          (c, last.getLong(1), last.getString(2), last.getLong(3),
            None: Option[Long], last.getLong(5))
        }
      closed.toSet ++ opens
    } finally q.stop()
  }

  test("out-of-order stream reproduces the batch islands exactly") {
    val all = Seq(
      // c1: three runs incl. a same-microsecond tie broken by orderkey
      // (okey 3 'A' then okey 4 'B' at the same instant)
      ev(1, 1 * M, 1, "A"), ev(1, 2 * M, 2, "A"),
      ev(1, 5 * M, 3, "A"), ev(1, 5 * M, 4, "B"),
      ev(1, 9 * M, 5, "A"),
      // c2: one run only (open interval, never closes)
      ev(2, 3 * M, 6, "C"), ev(2, 8 * M, 7, "C"),
      // c3: alternating every observation
      ev(3, 1 * M, 8, "X"), ev(3, 2 * M, 9, "Y"), ev(3, 3 * M, 10, "X"))
    val bands = all.groupBy(_.ts.getTime / (5 * 60 * 1000L)).toSeq
      .sortBy(_._1).map { case (_, evs) =>
        new scala.util.Random(219).shuffle(evs)
      }
    assert(runStream(bands, "scd_stream_a") == serialIntervals(all))
  }

  test("checkpoint restart: run state and parked buffer survive, intervals exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scd_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_scd_out").toString
    val all = Seq(
      ev(1, 1 * M, 1, "A"), ev(1, 2 * M, 2, "A"), ev(1, 20 * M, 3, "B"),
      ev(1, 40 * M, 4, "A"), ev(2, 5 * M, 5, "C"), ev(2, 30 * M, 6, "D"))
    val in = MemoryStream[OrderEv]
    // 60-minute delay: every cross-incarnation event stays inside the
    // allowed lateness (the 10-minute variant would rightly DROP c2's
    // 5M-old observation once incarnation 1 advanced the watermark —
    // that's the watermark contract, not a recovery bug)
    def start() =
      ScdStream.track(in.toDS(), watermarkDelay = "60 minutes")
        .toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append").format("parquet")
        .option("path", out).start()
    // incarnation 1: first half (some events still parked), then STOP
    val q1 = start()
    in.addData(all.take(3)); q1.processAllAvailable()
    q1.stop()
    // incarnation 2: rest + sentinel flush from the same checkpoint
    val q2 = start()
    in.addData(all.drop(3)); q2.processAllAvailable()
    in.addData(ev(999, 100000 * M, 99901, "Z")); q2.processAllAvailable()
    in.addData(ev(999, 100001 * M, 99902, "Z")); q2.processAllAvailable()
    try {
      val rows = spark.read.parquet(out).filter(col("custkey") =!= 999L).collect()
      val closed = rows.filter(_.getBoolean(6)).map { r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          Some(r.getLong(4)): Option[Long], r.getLong(5))
      }
      assert(closed.distinct.length == closed.length,
        "restart re-emitted a closed interval")
      val opens = rows.filter(!_.getBoolean(6))
        .groupBy(_.getLong(0)).map { case (_, rs) =>
          val last = rs.maxBy(_.getLong(7))
          (last.getLong(0), last.getLong(1), last.getString(2),
            last.getLong(3), None: Option[Long], last.getLong(5))
        }
      assert(closed.toSet ++ opens == serialIntervals(all),
        "intervals after restart differ from the serial reference")
    } finally q2.stop()
  }

  test("randomized shuffled streams == serial reference") {
    val rnd = new scala.util.Random(77)
    val prs = Array("A", "B", "C")
    val all = (1 to 120).map { i =>
      ev(1 + rnd.nextInt(4).toLong, rnd.nextInt(60).toLong * M + i,
        1000 + i, prs(rnd.nextInt(3)))
    }
    val bands = all.groupBy(_.ts.getTime / (5 * 60 * 1000L)).toSeq
      .sortBy(_._1).map { case (_, evs) => rnd.shuffle(evs) }
    assert(runStream(bands, "scd_stream_b") == serialIntervals(all))
  }
}
