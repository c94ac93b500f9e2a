package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DecayStream

/** Stream-batch equivalence for the decayed-popularity twin: the
  * decay-on-read serving view over streamed per-day state equals q179's
  * batch answer bit-for-bit on the fixture events — the equivalence the
  * DecayStream scaladoc argues (day-granular aggregation distributes
  * exactly over the shared 2^(K-age) factor; decay-in-state would not).
  */
class DecayStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decay-on-read over streamed day state == q179 batch, bit-exact") {
    val staged = java.nio.file.Files.createTempDirectory("decay_events").toString
    graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("value"))
      .write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, value DOUBLE")
      .parquet(staged)
    // complete mode keeps every window in the result table so the
    // serving view sees the full day history (the fixture spans weeks)
    val q = DecayStream.dailyWeights(stream, "1 day")
      .writeStream.outputMode("complete")
      .format("memory").queryName("decay_test").start()
    try {
      q.processAllAvailable()
      val served = DecayStream.decayedScores(spark.table("decay_test"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.Temporal.q179.run(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(served.nonEmpty && served === batch)
    } finally q.stop()
  }

  test("day-granular state is lossless where score-halving state is not") {
    import spark.implicits._
    // two events on consecutive days with an ODD first-day weight: the
    // exact answer keeps the remainder (w*2^19 is still integral), a
    // running-score halving would floor it away one day later — the
    // counterexample that justifies the decay-on-read design
    val daily = Seq(
      ("2024-01-01 00:00:00", 7L, 3L, 1L),
      ("2024-01-02 00:00:00", 7L, 5L, 1L))
      .toDF("start_s", "item_id", "w_sum", "n_events")
      .select(struct(col("start_s").cast("timestamp").as("start"),
        (col("start_s").cast("timestamp") + expr("INTERVAL 1 DAY")).as("end")).as("win"),
        col("item_id"), col("w_sum"), col("n_events"))
    val got = DecayStream.decayedScores(daily)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact: 3*2^19 + 5*2^20 = 1572864 + 5242880... = 3*524288 + 5*1048576
    assert(got.toSeq == Seq((7L, 3L * 524288L + 5L * 1048576L, 2L)))
  }
}
