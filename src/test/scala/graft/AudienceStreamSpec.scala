package graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.CompactSketch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AudienceStream

/** Stream-batch equivalence for the theta audience twin behind q216:
  * per-window distinct-user sketches built by streaming aggregation
  * state are BIT-identical to batch sketches of the same windows
  * (canonical bytes — a pure function of the window's user set, so
  * trigger boundaries can't show through), and the persisted sketch
  * table alone answers retention/churn: the intersected sketches'
  * ±3σ bounds cover the exact retained/churned counts computed from
  * raw data.
  */
class AudienceStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def est(b: Array[Byte]): Double =
    CompactSketch.heapify(Memory.wrap(b)).getEstimate
  private def lb(b: Array[Byte]): Double =
    CompactSketch.heapify(Memory.wrap(b)).getLowerBound(3)
  private def ub(b: Array[Byte]): Double =
    CompactSketch.heapify(Memory.wrap(b)).getUpperBound(3)

  test("streaming window sketches == batch bytes; sketch-table retention in 3σ of exact") {
    val staged = java.nio.file.Files.createTempDirectory("aud_events").toString
    graft.sources.Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"))
      .repartition(6) // several files => several triggers with maxFilesPerTrigger=1
      .write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, user_id BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
    val q = AudienceStream.windowSketches(stream, "7 days")
      .writeStream.outputMode("complete")
      .format("memory").queryName("aud_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("aud_test")
        .select(col("win.start").as("ws"), col("sk")).collect()
        .map(r => r.getTimestamp(0) -> r.getAs[Array[Byte]]("sk").toList)
        .toMap
      val batch = AudienceStream.windowSketches(
          spark.read.parquet(staged), "7 days")
        .select(col("win.start").as("ws"), col("sk")).collect()
        .map(r => r.getTimestamp(0) -> r.getAs[Array[Byte]]("sk").toList)
        .toMap
      assert(streamed.size > 2, "fixture must span multiple windows")
      assert(streamed === batch,
        "streaming theta state diverged from batch (bytes must be canonical)")

      // retention/churn off the persisted sketch table ONLY
      val ret = AudienceStream.retentionFromSketches(
          spark.table("aud_test"), "7 days")
        .select(col("win.start").as("ws"), col("sk_retained"), col("sk_churned"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2)))
      assert(ret.nonEmpty)

      // exact retained/churned per consecutive window pair, from raw
      val raw = spark.read.parquet(staged)
        .select(window(col("ts"), "7 days")("start").as("ws"), col("user_id"))
        .distinct().collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1))
      val byWin = raw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      ret.foreach { case (ws, skR, skC) =>
        val a = byWin(ws)
        // retention rows exist only where the window exactly 7 days
        // later exists — recompute that start rather than "next present"
        val b = byWin(new java.sql.Timestamp(ws.getTime + 7L * 86400 * 1000))
        val exactRet = (a & b).size
        val exactChurn = (a -- b).size
        assert(lb(skR) <= exactRet && exactRet <= ub(skR),
          s"retained bound miss at $ws: exact=$exactRet est=${est(skR)}")
        assert(lb(skC) <= exactChurn && exactChurn <= ub(skC),
          s"churn bound miss at $ws: exact=$exactChurn est=${est(skC)}")
      }
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS aud_test")
    }
  }
}
