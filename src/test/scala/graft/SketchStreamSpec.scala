package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingHash.rollingHash
import graft.streaming.SketchStream

/** Stream-batch equivalence for the count-min sketch twin: the
  * per-window sketches built by Structured Streaming's aggregation
  * state (the native [[graft.functions.CountMinAgg]] running inside
  * streaming ObjectHashAggregate) are bit-identical to batch sketches
  * of the same windows, and merging the per-window sketches by
  * elementwise sum reproduces the one-shot whole-corpus sketch —
  * counts are linear, so the persisted-sketch table answers any time
  * range without re-reading the stream (the q176 pattern, live).
  */
class SketchStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming per-window sketches == batch; merged windows == one-shot sketch") {
    val staged = java.nio.file.Files.createTempDirectory("sketch_docs").toString
    // the q156/q168 event-time axis: each doc's instant is its event's ts
    graft.sources.Tables.documents(spark, sfDir)
      .join(graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id").as("doc_id"), col("ts")), "doc_id")
      .select(col("text"), col("ts"))
      .write.mode("overwrite").parquet(staged)

    def tokenHashes(df: org.apache.spark.sql.DataFrame) =
      df.select(col("ts"), explode(split(trim(col("text")), " ")).as("tok"))
        .select(col("ts"), rollingHash(col("tok")).as("h"))

    val stream = spark.readStream
      .schema("text STRING, ts TIMESTAMP").parquet(staged)
    val q = SketchStream.windowSketches(tokenHashes(stream), "6 days")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sketch_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sketch_test")
        .select(col("win.start").as("ws"), col("sk"), col("n_occ"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getSeq[Long](1).toList, r.getLong(2)))
        .toSet
      val batchHashes = tokenHashes(spark.read.parquet(staged))
      val batchWins = SketchStream.windowSketches(batchHashes, "6 days")
        .select(col("win.start").as("ws"), col("sk"), col("n_occ"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getSeq[Long](1).toList, r.getLong(2)))
        .toSet
      assert(streamed.size > 1, "fixture must span multiple windows")
      assert(streamed === batchWins,
        "streaming aggregation state diverged from the batch sketch")

      // linearity: elementwise-summed window sketches == one-shot sketch
      val merged = SketchStream.mergeSketches(spark.table("sketch_test"))
        .collect()(0)
      val oneShot = batchHashes.agg(
          graft.functions.CountMinAgg.countMinAgg(col("h"),
            SketchStream.Depth, SketchStream.Width, SketchStream.Mod).as("sk"),
          count(lit(1)).as("n_occ"))
        .collect()(0)
      assert(merged.getSeq[Long](0) === oneShot.getSeq[Long](0),
        "merged per-window grids must equal the whole-corpus grid")
      assert(merged.getLong(1) === oneShot.getLong(1))

      // probe parity: estimates off the merged grid == off the one-shot
      // grid for the 5 most frequent tokens (and never undercount)
      val top = batchHashes.groupBy(col("h")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("h")).limit(5)
      val est = top
        .crossJoin(broadcast(SketchStream.mergeSketches(spark.table("sketch_test"))))
        .select(col("n"), SketchStream.estimate(col("sk"), col("h")).as("est"))
        .collect()
      est.foreach(r => assert(r.getLong(1) >= r.getLong(0)))
    } finally q.stop()
  }
}
