package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TopKStream

/** Stream-batch equivalence for the SpaceSaving top-k twin. The
  * sketch state is NOT linear (merge trees change raw estimates), so
  * the equivalence gated here is the one that is actually invariant:
  * per window, BOTH twins must satisfy the q199 bound contract against
  * exact per-window counts — zero violations of est ≥ true,
  * est − err ≤ true, err·capacity ≤ N — track every 2N/capacity-heavy
  * key, and agree exactly on n_input and counter count (min(capacity,
  * |window keys|), which every valid merge tree surfaces).
  */
class TopKStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (win, key, c) exact per-window counts + (win, n) totals. */
  private def exact(keyed: DataFrame) =
    keyed.groupBy(window(col("ts"), "6 days").as("win"), col("k"))
      .agg(count(lit(1)).as("c"))

  /** Audit one twin's sketch table: per window, the contract tuple. */
  private val Cap = 4 // < the 15-user fixture domain: eviction churns

  private def audit(perWindow: DataFrame, ex: DataFrame): Set[(java.sql.Timestamp, Long, Long, Long, Long)] = {
    val m = Cap
    val e = TopKStream.entries(perWindow).alias("e")
      .join(ex.alias("x"),
        col("e.win") === col("x.win") && col("key") === col("k"))
    val viol = e.groupBy(col("e.win").as("win"))
      .agg(count(lit(1)).as("n_counters"),
        count(when(col("est") < col("c")
          || col("est") - col("err") > col("c")
          || col("err") * m > col("n_input"), 1)).as("violations"),
        first(col("n_input")).as("n_input"))
    val missed = ex.alias("x")
      .join(TopKStream.entries(perWindow).alias("e"),
        col("e.win") === col("x.win") && col("key") === col("k"),
        "left_anti")
      .join(perWindow.select(col("win"), col("n_input")), "win")
      .groupBy(col("win"))
      .agg(count(when(col("c") * m > lit(2) * col("n_input"), 1)).as("missed"))
    // left join: a window where every key is tracked has NO anti-join
    // rows at all — its missed count is an absent row, not a zero
    viol.join(missed, Seq("win"), "left")
      .select(col("win.start"), col("n_input"), col("n_counters"),
        col("violations"), coalesce(col("missed"), lit(0L)).as("missed"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
  }

  test("streaming and batch per-window top-k sketches satisfy the identical contract") {
    val staged = java.nio.file.Files.createTempDirectory("topk_events").toString
    graft.sources.Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"))
      .write.mode("overwrite").parquet(staged)

    def keyed(df: DataFrame) =
      df.select(col("ts"), col("user_id").cast("long").as("k"))

    val stream = spark.readStream
      .schema("ts TIMESTAMP, user_id BIGINT").parquet(staged)
    val q = TopKStream.windowTopK(keyed(stream), "6 days", Cap)
      .writeStream.outputMode("complete")
      .format("memory").queryName("topk_test").start()
    val (streamAudit, batchAudit, ex) =
      try {
        q.processAllAvailable()
        val batchKeyed = keyed(spark.read.parquet(staged))
        val ex = exact(batchKeyed).localCheckpoint()
        (audit(spark.table("topk_test"), ex),
          audit(TopKStream.windowTopK(batchKeyed, "6 days", Cap), ex),
          ex)
      } finally q.stop()

    assert(streamAudit.nonEmpty, "no windows audited")
    assert(streamAudit === batchAudit,
      "stream and batch disagree on the contract tuple")
    streamAudit.foreach { case (ws, n, counters, violations, missed) =>
      assert(violations === 0L, s"window $ws: bound violations")
      assert(missed === 0L, s"window $ws: missed 2N/m-heavy key")
      assert(n > 0L && counters > 0L)
    }
    // counter count = min(capacity, |window keys|) on both twins
    val expected = ex.groupBy(col("win.start").as("ws"))
      .agg(least(lit(Cap.toLong),
        count(lit(1))).as("nc"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    streamAudit.foreach { case (ws, _, counters, _, _) =>
      assert(counters === expected(ws), s"window $ws: counter count")
    }
  }
}
