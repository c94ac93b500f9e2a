package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EvolutionStream

/** The q213 streaming twin: the schema-evolving events lake consumed as
  * a live stream. The stream starts with ONLY the legacy generation on
  * disk (4-column files, `value`/`props` NULL under the declared merged
  * schema); the post-migration generation lands WHILE THE STREAM RUNS,
  * and the file source's per-trigger glob picks it up — the declared-
  * schema contract (EventsStreaming's "a streaming source needs a
  * DECLARED schema") exercised across a mid-stream migration. The
  * watermarked interval join must equal the batch twin's pairs exactly
  * at both checkpoints (legacy-only, then full).
  *
  * The spec's generation split is BY EVENT TIME (migration at a cutoff
  * instant — the live-migration timeline), unlike q213's adversarial
  * mod-3 interleave which exists to stress the merge-READ path: a
  * streaming replay must respect event time, or generation 2 arrives
  * wholly behind the watermark and is correctly dropped as late data —
  * the first draft of this spec proved exactly that. Cross-boundary
  * pairs (legacy purchase, post-migration error within 30 min) survive
  * because the 1 h watermark delay exceeds the 30 min join bound.
  */
class StreamEvolutionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("pid"), col("eid"), col("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("evolving stream == batch twin, generation 2 arriving mid-stream") {
    val root = Files.createTempDirectory("graft_evo_stream_").toString
    val ev = graft.sources.Tables.events(spark, sfDir)
    val Array(lo, hi) = ev.agg(min(col("ts")), max(col("ts"))).collect()
      .flatMap(r => Seq(r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
    val cutoff = new java.sql.Timestamp(lo + (hi - lo) / 2)
    // stage ONLY the legacy (pre-migration-instant) generation before
    // the stream starts
    ev.filter(col("ts") < lit(cutoff))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .write.parquet(root + "/gen1")

    val stream = EvolutionStream.readEvolved(spark, root)
    val q = EvolutionStream.purchaseErrorPairs(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("evo_pairs").start()
    try {
      q.processAllAvailable()
      val legacyBatch = spark.read.schema(EvolutionStream.mergedSchema)
        .parquet(root + "/gen1")
      val gotLegacy = pairsOf(spark.table("evo_pairs"))
      assert(gotLegacy ===
        pairsOf(EvolutionStream.purchaseErrorPairs(legacyBatch)),
        "legacy-only stream diverged from the legacy-only batch")
      // legacy purchases have no value column: every pair backfills to 0
      assert(gotLegacy.forall(_._3 == 0L),
        "a legacy purchase carried non-backfilled cents")

      // the migration lands while the stream is running
      ev.filter(col("ts") >= lit(cutoff))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.parquet(root + "/gen2")
      q.processAllAvailable()
      val fullBatch = spark.read.option("mergeSchema", "true")
        .parquet(root + "/gen1", root + "/gen2")
      val gotFull = pairsOf(spark.table("evo_pairs"))
      assert(gotFull === pairsOf(EvolutionStream.purchaseErrorPairs(fullBatch)),
        "post-migration stream diverged from the merged batch")
      assert(gotFull.size > gotLegacy.size,
        "fixture degenerate: generation 2 added no pairs")
      assert(gotFull.exists(_._3 != 0L),
        "fixture degenerate: no gen2 purchase carried real cents")
    } finally q.stop()
  }
}
