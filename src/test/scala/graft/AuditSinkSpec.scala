package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AuditSink

/** The `graft-audit` DSv2 sink (sources.AuditSink): two-phase commit
  * manifest semantics — digests agree with a query-side computation,
  * are partitioning-independent (commutative task-message merge),
  * append merges, overwrite truncates.
  */
class AuditSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = spark.range(0, 1000)
    .select(col("id").as("doc_id"), (col("id") % 7).as("junk"))

  private def expectedDigest: Long =
    docs.select(sum(col("doc_id") % AuditSink.Mod) % AuditSink.Mod)
      .head().getLong(0)

  test("committed manifest matches a query-side digest") {
    AuditSink.clear("t1")
    docs.write.format("graft-audit")
      .option("target", "t1").option("digestColumn", "doc_id")
      .mode("append").save()
    val m = AuditSink.result("t1").get
    assert(m.rows == 1000L)
    assert(m.digest == expectedDigest)
  }

  test("digest is partitioning-independent (commutative message merge)") {
    AuditSink.clear("p3"); AuditSink.clear("p11")
    docs.repartition(3).write.format("graft-audit")
      .option("target", "p3").mode("append").save()
    docs.repartition(11).write.format("graft-audit")
      .option("target", "p11").mode("append").save()
    assert(AuditSink.result("p3") == AuditSink.result("p11"))
  }

  test("append merges manifests; overwrite truncates") {
    AuditSink.clear("t2")
    docs.write.format("graft-audit").option("target", "t2").mode("append").save()
    docs.write.format("graft-audit").option("target", "t2").mode("append").save()
    assert(AuditSink.result("t2").get.rows == 2000L)
    docs.write.format("graft-audit").option("target", "t2").mode("overwrite").save()
    assert(AuditSink.result("t2").get.rows == 1000L)
    assert(AuditSink.result("t2").get.digest == expectedDigest)
  }

  test("non-long digest column is rejected at plan time") {
    val e = intercept[Exception] {
      docs.select(col("doc_id").cast("string").as("doc_id"))
        .write.format("graft-audit").option("target", "bad").mode("append").save()
    }
    assert(e.getMessage.contains("must be LongType"))
  }

  private def epochWrite(target: String, epoch: Long): Unit =
    docs.write.format("graft-audit").option("target", target)
      .option("digestColumn", "doc_id").option("epoch", epoch.toString)
      .mode("append").save()

  test("epoch ledger: duplicate delivery is a no-op, before AND after compaction") {
    val t = "ledger1"
    AuditSink.clearLedger(t)
    epochWrite(t, 1)
    val once = AuditSink.ledger(t).get
    assert(once.manifest.rows == 1000L && once.manifest.digest == expectedDigest)
    assert(once.applied == Set(1L) && once.watermark == -1L)
    // at-least-once retry of the same epoch: log-based dedup
    epochWrite(t, 1)
    assert(AuditSink.ledger(t).get.manifest == once.manifest)
    // a NEW epoch applies
    epochWrite(t, 2)
    assert(AuditSink.ledger(t).get.manifest.rows == 2000L)
    // Raft snapshot: applied ids fold into the watermark
    AuditSink.compact(t)
    val snap = AuditSink.ledger(t).get
    assert(snap.applied.isEmpty && snap.watermark == 2L)
    assert(snap.manifest.rows == 2000L)
    // stale replays from the compacted prefix: watermark-based dedup
    epochWrite(t, 1); epochWrite(t, 2)
    assert(AuditSink.ledger(t).get.manifest.rows == 2000L)
    // the log continues past the snapshot
    epochWrite(t, 3)
    assert(AuditSink.ledger(t).get.manifest.rows == 3000L)
    assert(AuditSink.ledger(t).get.applied == Set(3L))
  }

  test("epoch writes refuse truncate (the ledger is the history)") {
    val e = intercept[Exception] {
      docs.write.format("graft-audit").option("target", "ledger2")
        .option("epoch", "1").mode("overwrite").save()
    }
    assert(e.getMessage.contains("append-only"))
  }
}
