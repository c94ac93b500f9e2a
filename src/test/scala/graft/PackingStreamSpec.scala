package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PackingStream

/** Stream == batch for the sequence-packing offsets: the
  * transformWithState running total over 8 micro-batches must assign
  * every doc the exact offset the batch PrefixSum assigns over the
  * same rows — cross-micro-batch state continuity, per-key ordering,
  * and the chunk-span arithmetic all at once.
  */
class PackingStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Budget = 512L

  test("streaming packing offsets equal the batch prefix sum across micro-batches") {
    // state v2 needs a multi-column-family store: RocksDB, not the
    // default HDFS-backed provider (conf is read at query start)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // graft-docs streams ids monotonically (offset IS the next id), the
    // ordering contract the processor documents; n_chars stands in for
    // the token count
    val streamed = PackingStream.offsets(
      spark.readStream.format("graft-docs")
        .option("rows", 300L).option("rowsPerBatch", 40L).load()
        .select($"doc_id", $"lang", $"n_chars".as("n_toks"))
        .as[PackingStream.DocTok],
      Budget)
    val q = streamed.toDF().writeStream
      .outputMode("append").format("memory").queryName("packing_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("packing_stream")
        .select($"doc_id", $"lang", $"off", $"first_chunk", $"last_chunk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet

      val batch = spark.read.format("graft-docs").option("rows", 300L).load()
        .select($"doc_id", $"lang", $"n_chars".cast("long").as("n_toks"))
      val expected = plans.PrefixSum
        .withRunningTotal(batch, "run", Seq("lang"), "doc_id", "n_toks")
        .withColumn("off", $"run" - $"n_toks")
        .select($"doc_id", $"lang", $"off",
          expr(s"off div $Budget").as("first_chunk"),
          expr(s"(off + n_toks - 1) div $Budget").as("last_chunk"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet

      assert(got.size === 300)
      assert(got === expected)
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
