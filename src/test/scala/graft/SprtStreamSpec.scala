package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SprtStream

/** Stream == batch for the sequential probability ratio test: replaying
  * the fixture's observation stream through the O(1)-state processor in
  * arrival order must land on exactly q262's batch verdicts — totals,
  * crossing index, crossing value, and decision — and the decision must
  * freeze at its first crossing even when later batches keep arriving.
  */
class SprtStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming verdicts equal the q262 batch walk across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // same observation derivation as q262, replayed in (ts, event_id)
    // order so the cross-batch arrival contract holds
    val obs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("arm"),
        unix_micros(col("ts")).as("ts"), col("event_id"),
        when(expr("CAST(FLOOR(value * 100) AS BIGINT) % 4") === 0, 1L)
          .otherwise(0L).as("succ"))
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => SprtStream.Obs(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))

    val in = MemoryStream[SprtStream.Obs]
    val q = SprtStream.verdicts(in.toDS()).toDF().writeStream
      .outputMode("update").format("memory").queryName("sprt_stream").start()
    try {
      obs.grouped(math.max(1, obs.length / 5 + 1)).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // latest verdict per arm = the row with the max n_obs
      val got = spark.table("sprt_stream").collect()
        .groupBy(_.getString(0)).view
        .mapValues(_.maxBy(_.getLong(1))).toMap
        .map { case (arm, r) =>
          arm -> (r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4),
            if (r.isNullAt(5)) 0L else r.getLong(5),
            r.getString(6))
        }

      val expected = operators.Analytics.q262
        .run(spark, "/root/testdata/sf0.001").collect()
        .map { r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4),
            if (r.isNullAt(5)) 0L else r.getLong(5),
            r.getString(6))
        }.toMap
      assert(got === expected)

      // irreversibility: every decided arm's (n_decide, cum_at) must be
      // identical across ALL its emitted verdict rows after the crossing
      spark.table("sprt_stream").collect()
        .groupBy(_.getString(0)).foreach { case (_, rows) =>
          val frozen = rows.filter(!_.isNullAt(4))
            .map(r => (r.getLong(4), r.getLong(5))).distinct
          assert(frozen.length <= 1, "crossing must freeze once reached")
        }
    } finally q.stop()
  }
}
