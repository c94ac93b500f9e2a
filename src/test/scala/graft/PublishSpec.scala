package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Publish, Tables}

/** The publish sink's layout contract: partition directories exist and
  * prune, per-file row bounds hold, in-partition files carry tight
  * cluster-key spans, and dynamic overwrite touches only re-published
  * partitions.
  */
class PublishSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("publishPartitioned: partition dirs, row bounds, round trip, overwrite scope") {
    val out = java.nio.file.Files.createTempDirectory("publish").toString
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("rf", col("l_returnflag"))
    Publish.publishPartitioned(li, out,
      partitionCols = Seq("rf"), clusterCols = Seq("l_orderkey"),
      buckets = 4, maxRecordsPerFile = 1000L)

    // partition directories materialized, one per flag value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("rf=A", "rf=N", "rf=R"))

    // per-file bound + lossless round trip
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
    dirs.foreach { d =>
      new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          assert(spark.read.parquet(f.getPath).count() <= 1000L, f.getName)
        }
    }

    // dynamic overwrite: republish ONE partition with a marker subset;
    // other partitions must be untouched
    val nBefore = back.filter(col("rf") =!= "A").count()
    Publish.publishPartitioned(
      li.filter(col("rf") === "A").limit(10), out,
      partitionCols = Seq("rf"), clusterCols = Seq("l_orderkey"),
      buckets = 1, maxRecordsPerFile = 1000L, overwritePartitions = true)
    val after = spark.read.parquet(out)
    assert(after.filter(col("rf") === "A").count() === 10L, "partition A replaced")
    assert(after.filter(col("rf") =!= "A").count() === nBefore, "other partitions intact")
  }
}
