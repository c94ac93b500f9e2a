package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the parquet artifact memo tier ([[Memo.artifact]]):
  * build-once per (context, dir, name), served as a plain file scan,
  * complete-on-disk detection via the framework-owned _GRAFT_OK marker
  * (a crashed write rebuilds; the committer's _SUCCESS alone does NOT
  * count — it is absent on marksuccessfuljobs=false deployments), race
  * safety (concurrent cold callers run ONE build), stale-lock takeover
  * (a crashed foreign writer's .lock cannot wedge the tier), ledger
  * emission, and collision-proof data-dir path mapping.
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

  test("an incomplete artifact (no _GRAFT_OK) is rebuilt, even when the committer's _SUCCESS is present") {
    val builds = new AtomicInteger(0)
    val path = Memo.artifactRoot + "/" + Memo.dirSegment("/memoartifact/spec2") + "/t2"
    // simulate a crashed graft writer: the parquet job itself finished
    // (parts + the committer's _SUCCESS on disk) but the JVM died
    // before the framework marker — completeness must key on OUR
    // marker, not the committer's (r15 ADVICE: _SUCCESS is config-
    // dependent and absent on object-store committers)
    spark.range(5).write.parquet(path)
    val got = Memo.artifact(spark, "/memoartifact/spec2", "t2") {
      builds.incrementAndGet()
      spark.range(7).toDF("id")
    }
    assert(builds.get() === 1, "incomplete artifact must trigger a rebuild")
    assert(got.count() === 7L, "rebuild must overwrite the partial data")
  }

  test("a stale foreign .lock is reclaimed; a completed foreign build is reused not rebuilt") {
    val builds = new AtomicInteger(0)
    val seg = Memo.dirSegment("/memoartifact/spec4")
    val fs = new org.apache.hadoop.fs.Path(Memo.artifactRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed foreign writer left its advisory lock beside the (not
    // yet existing) artifact dir, hours ago
    val lock = new org.apache.hadoop.fs.Path(
      Memo.artifactRoot + "/" + seg + "/t4.lock")
    fs.create(lock, true).close()
    new java.io.File(lock.toUri.getPath).setLastModified(
      System.currentTimeMillis() - 24L * 3600 * 1000)
    val prevStale = Memo.lockStaleMs
    try {
      Memo.lockStaleMs = 1000 // anything older than 1 s is stale
      val got = Memo.artifact(spark, "/memoartifact/spec4", "t4") {
        builds.incrementAndGet()
        spark.range(9).toDF("id")
      }
      assert(builds.get() === 1, "stale lock must be reclaimed and built over")
      assert(got.count() === 9L)
      assert(!fs.exists(lock), "builder must release the lock")
    } finally Memo.lockStaleMs = prevStale
    // a COMPLETE artifact written by "another JVM" (simulated: parts +
    // _GRAFT_OK on disk before this JVM's first call for the key) is
    // reused without a build, and ledgered as such
    val path5 = Memo.artifactRoot + "/" + Memo.dirSegment("/memoartifact/spec5") + "/t5"
    spark.range(13).toDF("id").write.parquet(path5)
    fs.create(new org.apache.hadoop.fs.Path(path5 + "/_GRAFT_OK"), true).close()
    val builds2 = new AtomicInteger(0)
    val got2 = Memo.artifact(spark, "/memoartifact/spec5", "t5") {
      builds2.incrementAndGet(); spark.range(1).toDF("id")
    }
    assert(builds2.get() === 0 && got2.count() === 13L,
      "a marker-complete foreign artifact must be served, not rebuilt")
    val row = Memo.ledger.filter(r => r.dataDir == "/memoartifact/spec5")
    assert(row.size === 1 && row.head.reused && row.head.bytes > 0)
  }

  test("distinct data dirs that sanitize identically get distinct artifact paths") {
    // /a/sf1 and /a_sf1 collapse under the bare character sanitizer —
    // the appended dir hash must keep their artifacts apart (r15
    // ADVICE: a collision silently serves one corpus the other's data)
    assert(Memo.dirSegment("/a/sf1") !== Memo.dirSegment("/a_sf1"))
    assert(Memo.dirSegment("/data/sf1") !== Memo.dirSegment("/data.sf1"))
    val a = Memo.artifact(spark, "/memocollide/sf1", "t") {
      spark.range(3).toDF("id") }
    val b = Memo.artifact(spark, "/memocollide_sf1", "t") {
      spark.range(8).toDF("id") }
    assert(a.count() === 3L && b.count() === 8L,
      "colliding dir segments served one corpus the other's artifact")
  }

  test("every materialization and reuse appends a ledger row with bytes on disk") {
    Memo.artifact(spark, "/memoledger/spec", "tl") {
      spark.range(50).toDF("id") }.count()
    val rows = Memo.ledger.filter(r =>
      r.dataDir == "/memoledger/spec" && r.name == "tl")
    assert(rows.size === 1 && !rows.head.reused
      && rows.head.bytes > 0 && rows.head.files > 0
      && rows.head.buildWriteS > 0.0, rows.toString)
  }

  test("artifactLayout: builder-owned write runs once, keeps its directory partitioning, and is reused") {
    val builds = new AtomicInteger(0)
    def get() = Memo.artifactLayout(spark, "/memolayout/spec", "bymod") { out =>
      builds.incrementAndGet()
      spark.range(40).select(col("id"), (col("id") % 4).as("m"))
        .write.mode("overwrite").partitionBy("m").parquet(out)
    }
    val p1 = get()
    assert(builds.get() === 1)
    // the layout (not just the rows) is the memo's value: partition
    // dirs on disk + partition pruning in the consumer's plan
    assert(new java.io.File(p1 + "/m=2").isDirectory, p1)
    val plan = spark.read.parquet(p1).filter(col("m") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(m"), plan)
    assert(get() === p1 && builds.get() === 1,
      "second call must serve the laid-down path, not rewrite")
    assert(spark.read.parquet(p1).count() === 40L)
    val rows = Memo.ledger.filter(r => r.dataDir == "/memolayout/spec")
    assert(rows.size === 1 && !rows.head.reused && rows.head.bytes > 0)
  }

  test("artifactLayout: a write without the marker is rebuilt over") {
    val path = Memo.artifactRoot + "/" + Memo.dirSegment("/memolayout/crash") + "/t"
    // simulate a crashed writer: data present, no _GRAFT_OK
    spark.range(5).toDF("id").write.mode("overwrite").parquet(path)
    new java.io.File(path + "/_GRAFT_OK").delete()
    val builds = new AtomicInteger(0)
    val got = Memo.artifactLayout(spark, "/memolayout/crash", "t") { out =>
      builds.incrementAndGet()
      spark.range(9).toDF("id").write.mode("overwrite").parquet(out)
    }
    assert(builds.get() === 1, "marker-less layout must trigger a rebuild")
    assert(spark.read.parquet(got).count() === 9L)
  }

  test("diskState lists the tier; retireArtifact deletes, evicts, and the next call rebuilds") {
    val builds = new AtomicInteger(0)
    def get() = Memo.artifact(spark, "/memoretire/one", "tr") {
      builds.incrementAndGet()
      spark.range(21).toDF("id")
    }
    assert(get().count() === 21L && builds.get() === 1)
    val conf = spark.sparkContext.hadoopConfiguration
    val seg = Memo.dirSegment("/memoretire/one")
    val row = Memo.diskState(conf).find(r => r.dirSegment == seg && r.name == "tr")
    assert(row.isDefined && row.get.complete && !row.get.locked
      && row.get.bytes > 0 && row.get.files > 0, Memo.diskState(conf).toString)
    // a LIVE foreign build lock must refuse retirement, disk untouched
    val fs = new org.apache.hadoop.fs.Path(Memo.artifactRoot).getFileSystem(conf)
    val lock = new org.apache.hadoop.fs.Path(
      Memo.artifactRoot + "/" + seg + "/tr.lock")
    fs.create(lock, true).close()
    assert(!Memo.retireArtifact(spark, "/memoretire/one", "tr"),
      "retire must refuse under a live foreign lock")
    assert(get().count() === 21L && builds.get() === 1, "refused retire must leave the artifact")
    // a STALE lock (crashed writer) does not protect the artifact
    new java.io.File(lock.toUri.getPath).setLastModified(
      System.currentTimeMillis() - 24L * 3600 * 1000)
    val prevStale = Memo.lockStaleMs
    try {
      Memo.lockStaleMs = 1000
      assert(Memo.retireArtifact(spark, "/memoretire/one", "tr"))
    } finally Memo.lockStaleMs = prevStale
    assert(Memo.diskState(conf).forall(r => !(r.dirSegment == seg && r.name == "tr")),
      "retired artifact must leave the disk listing")
    assert(get().count() === 21L && builds.get() === 2,
      "the session cache must be evicted so the next call rebuilds")
  }

  test("retireCorpus removes the whole dir segment unless a live build is in flight") {
    Memo.artifact(spark, "/memoretire/corpus", "a") { spark.range(3).toDF("id") }.count()
    Memo.artifact(spark, "/memoretire/corpus", "b") { spark.range(4).toDF("id") }.count()
    val conf = spark.sparkContext.hadoopConfiguration
    val seg = Memo.dirSegment("/memoretire/corpus")
    assert(Memo.diskState(conf).count(_.dirSegment == seg) === 2)
    // live lock on ONE artifact blocks the whole-tree GC
    val fs = new org.apache.hadoop.fs.Path(Memo.artifactRoot).getFileSystem(conf)
    val lock = new org.apache.hadoop.fs.Path(Memo.artifactRoot + "/" + seg + "/b.lock")
    fs.create(lock, true).close()
    assert(!Memo.retireCorpus(spark, "/memoretire/corpus"))
    assert(Memo.diskState(conf).count(_.dirSegment == seg) === 2)
    fs.delete(lock, false)
    assert(Memo.retireCorpus(spark, "/memoretire/corpus"))
    assert(Memo.diskState(conf).forall(_.dirSegment != seg), "segment tree must be gone")
    // rebuild after corpus retirement works (cache evicted)
    assert(Memo.artifact(spark, "/memoretire/corpus", "a") {
      spark.range(6).toDF("id") }.count() === 6L)
  }

  test("sweepIncomplete GCs only old, unlocked, marker-less wrecks") {
    val conf = spark.sparkContext.hadoopConfiguration
    val seg = Memo.dirSegment("/memosweep/spec")
    // a complete artifact (must survive any sweep)
    Memo.artifact(spark, "/memosweep/spec", "keep") {
      spark.range(4).toDF("id") }.count()
    // a crashed writer's wreck: parquet parts, no _GRAFT_OK
    val wreck = Memo.artifactRoot + "/" + seg + "/wreck"
    spark.range(5).toDF("id").write.parquet(wreck)
    new java.io.File(wreck + "/_SUCCESS").delete()
    // a FRESH wreck is kept by an age-bounded sweep...
    assert(Memo.sweepIncomplete(spark, olderThanMs = 60000L).isEmpty)
    assert(Memo.diskState(conf).exists(r => r.dirSegment == seg && r.name == "wreck"))
    // ...a LOCKED wreck is kept even by an immediate sweep...
    val fs = new org.apache.hadoop.fs.Path(Memo.artifactRoot).getFileSystem(conf)
    val lock = new org.apache.hadoop.fs.Path(wreck + ".lock")
    fs.create(lock, true).close()
    assert(Memo.sweepIncomplete(spark).isEmpty, "a building wreck must not be swept")
    fs.delete(lock, false)
    // ...and an old unlocked wreck goes, leaving the complete artifact
    val swept = Memo.sweepIncomplete(spark)
    assert(swept.contains((seg, "wreck")), swept.toString)
    val after = Memo.diskState(conf).filter(_.dirSegment == seg)
    assert(after.map(_.name) === Seq("keep") && after.head.complete,
      "sweep must take the wreck and only the wreck\n" + after)
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
