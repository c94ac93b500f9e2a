package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TwaStream

/** Stream == batch for the time-weighted-average intervals: the
  * transformWithState last-sample store over several micro-batches must
  * materialize exactly the holding periods q159's batch lead() window
  * derives — cross-micro-batch state continuity and the integer-exact
  * weights together.
  */
class TwaStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming holding intervals equal the batch lead() pairs across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // fixture slice: the real events rows (value is a double that does
    // NOT always hold exact cents — the dec2 conversion is part of what
    // is under test), ordered by time so batch splits keep each user's
    // (t, event_id) monotone across micro-batches
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"),
        (graft.functions.GraftFunctions.dec2(col("value")) * 100)
          .cast("long").as("cents"))
      .orderBy(col("t"), col("event_id"))
      .collect()
      .map(r => TwaStream.Sample(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val in = MemoryStream[TwaStream.Sample]
    val q = TwaStream.intervals(in.toDS()).toDF().writeStream
      .outputMode("append").format("memory").queryName("twa_stream").start()
    try {
      // 5 micro-batches split on the global time order (ties at a batch
      // boundary would break the monotone-arrival contract; the fixture
      // slice is sorted, so a plain index split keeps it)
      ev.grouped(math.max(1, ev.length / 5 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("twa_stream")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents") * col("dt")).as("svw"),
          sum(col("dt")).as("sdt"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap

      // batch twin: consecutive pairs per user, same integer arithmetic
      val expected = ev.groupBy(_.user_id).map { case (u, ss) =>
        val s = ss.sortBy(x => (x.t, x.event_id))
        val pairs = s.zip(s.drop(1))
        u -> (pairs.length.toLong,
          pairs.map { case (a, b) => a.cents * (b.t - a.t) }.sum,
          pairs.map { case (a, b) => b.t - a.t }.sum)
      }
      val expNonEmpty = expected.filter(_._2._1 > 0)
      assert(got === expNonEmpty)
    } finally q.stop()
  }
}
