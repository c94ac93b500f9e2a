package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the parquet artifact memo tier ([[Memo.artifact]]):
  * build-once per (context, dir, name), served as a plain file scan,
  * complete-on-disk detection via _SUCCESS (a crashed write rebuilds),
  * and race safety (concurrent cold callers run ONE build).
  */
class MemoArtifactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("artifact builds once, then serves a parquet scan with pruning-capable schema") {
    val builds = new AtomicInteger(0)
    def get() = Memo.artifact(spark, "/memoartifact/spec1", "t1") {
      builds.incrementAndGet()
      spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    }
    val a = get()
    assert(a.count() === 100L && builds.get() === 1)
    val b = get()
    assert(b.count() === 100L && builds.get() === 1,
      "second call must serve the artifact, not rebuild")
    // served as a real file scan — the property that buys pruning/pushdown
    val p = b.filter(col("id") < 10).queryExecution.executedPlan.toString
    assert(p.contains("FileScan parquet"), p)
    assert(p.contains("PushedFilters: [IsNotNull(id), LessThan(id,10)"), p)
  }

  test("an incomplete artifact (no _SUCCESS) is rebuilt, not served") {
    val builds = new AtomicInteger(0)
    val path = Memo.artifactRoot + "/_memoartifact_spec2/t2"
    // simulate a crashed writer: parquet part present, no _SUCCESS
    spark.range(5).write.parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path + "/_SUCCESS"), false)
    val got = Memo.artifact(spark, "/memoartifact/spec2", "t2") {
      builds.incrementAndGet()
      spark.range(7).toDF("id")
    }
    // the builder keyed the SAME path shape the crashed writer used?
    // (artifact paths are root/<sanitized dir>/<name> — the simulated
    // crash above wrote to the sanitized location of this call)
    assert(builds.get() === 1, "incomplete artifact must trigger a rebuild")
    assert(got.count() === 7L, "rebuild must overwrite the partial data")
  }

  test("concurrent cold callers run exactly one build") {
    val builds = new AtomicInteger(0)
    def get() = Memo.artifact(spark, "/memoartifact/spec3", "t3") {
      builds.incrementAndGet()
      Thread.sleep(200)
      spark.range(11).toDF("id")
    }
    val threads = (1 to 4).map(_ => new Thread(() => { get().count(): Unit }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get() === 1, s"expected 1 build under race, got ${builds.get()}")
    assert(get().count() === 11L)
  }
}
