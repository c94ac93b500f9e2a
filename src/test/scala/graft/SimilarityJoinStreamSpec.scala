package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SimilarityJoinStream

/** Streaming unified similarity join == its batch twin: the fixture
  * corpus fed through [[SimilarityJoinStream]] in doc_id order must
  * accumulate exactly batch q322's (metric, doc_a, doc_b, score)
  * relation — across micro-batch boundaries, across a restart, and
  * under duplicate delivery — when scored against the dictionary
  * frozen from that same corpus (the stream's stated contract).
  */
class SimilarityJoinStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureDocs: Array[(Long, String, String, String)] =
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  /** Batch q322 as the reference relation (score kept at full double
    * precision — the stream shares the exact arithmetic, so equality
    * is bit-equality, no rounding).
    */
  private def batchPairs: Set[(String, Long, Long, Double)] =
    operators.TextOps.q322.run(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  private def streamedPairs(outDir: String): Set[(String, Long, Long, Double)] =
    spark.read.parquet(outDir)
      .select(col("metric"), col("doc_a"), col("doc_b"), col("score"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("streamed pairs == batch q322 after 3 micro-batches (frozen-dictionary corpus)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("simjoinstream").toString
    val (stateDir, outDir, ckpt) = (s"$base/state", s"$base/out", s"$base/ckpt")
    val docs = fixtureDocs
    assert(docs.length > 10, "fixture too small to exercise batching")
    val (dict, nDocs) = SimilarityJoinStream.frozenDict(spark, sfDir)

    val in = MemoryStream[(Long, String, String, String)]
    val q = SimilarityJoinStream.start(
      in.toDF().toDF("doc_id", "lang", "source", "text"),
      dict, nDocs, stateDir, outDir, ckpt)
    try {
      docs.grouped((docs.length + 2) / 3).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = streamedPairs(outDir)
    val twin = batchPairs
    assert(streamed === twin,
      s"stream-only=${(streamed -- twin).toSeq.take(5)} " +
        s"twin-only=${(twin -- streamed).toSeq.take(5)}")
    // the fixture corpus has jaccard pairs but no cosine ≥ 0.95 pair
    // at this scale — the cosine leg's non-vacuous equality is the
    // synthetic-corpus test below
    assert(twin.exists(_._1 == "jaccard"),
      "fixture must exercise the jaccard leg or the equality is vacuous")
    // every arrival is committed to the seen-set store, pair or not
    assert(spark.read.parquet(s"$stateDir/jac_vecs").count()
      === docs.length.toLong)
  }

  test("pair relation survives a checkpoint-boundary restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("simjoinstream_restart").toString
    val (stateDir, outDir, ckpt) = (s"$base/state", s"$base/out", s"$base/ckpt")
    val docs = fixtureDocs
    val (phase1, phase2) = docs.splitAt(docs.length / 2)
    val (dict, nDocs) = SimilarityJoinStream.frozenDict(spark, sfDir)

    val in = MemoryStream[(Long, String, String, String)]
    def start() = SimilarityJoinStream.start(
      in.toDF().toDF("doc_id", "lang", "source", "text"),
      dict, nDocs, stateDir, outDir, ckpt)

    val q1 = start()
    phase1.grouped((phase1.length + 1) / 2).foreach { b =>
      in.addData(b.toSeq); q1.processAllAvailable()
    }
    q1.stop()

    val q2 = start()
    try {
      in.addData(phase2.toSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    assert(streamedPairs(outDir) === batchPairs,
      "restarted stream drifted from the batch pair relation")
  }

  test("cosine leg non-vacuous: planted permuted-token twins pair across and within batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("simjoinstream_cos").toString
    val (stateDir, outDir) = (s"$base/state", s"$base/out")
    // 8 planted twin pairs: doc 2i+1 is doc 2i with its tokens
    // REVERSED — identical tf vector (cosine exactly 1) but disjoint
    // bigram shingles (no jaccard pair); each pair's vocabulary is
    // unique so df stays low and the weights stay nonzero. 8 filler
    // docs widen the corpus.
    def vocab(i: Int): Seq[String] = (0 until 8).map(j => s"u${i}_$j")
    val twinsA = (0 until 8).map(i => (2L * i + 1, "en", "web", vocab(i).mkString(" ")))
    val twinsB = (0 until 8).map(i => (2L * i + 2, "en", "web", vocab(i).reverse.mkString(" ")))
    val filler = (0 until 8).map(i =>
      (17L + i, "en", "web", (0 until 8).map(j => s"f${i}_$j").mkString(" ")))
    val docs = (twinsA ++ twinsB ++ filler).sortBy(_._1)
    val docsDF = docs.toDF("doc_id", "lang", "source", "text")

    // frozen snapshot from this synthetic corpus
    val tf = operators.TextOps.termFrequencies(operators.Dedup.tokensOf(docsDF))
    val dict = operators.TextOps.dictOf(tf).localCheckpoint()
    val nDocs = docs.length.toLong

    // batch reference: q322's two legs run over the full corpus with
    // the same operators the oracled query composes
    val jacT = operators.TextOps.SimJoinJacT
    val cosT = operators.TextOps.SimJoinCosT
    val nDocsF = spark.range(1).select(lit(nDocs).as("n_docs"))
    val w = operators.TextOps.weightsFromDict(tf, dict, nDocsF).localCheckpoint()
    val vecs = operators.TextOps.tfidfVecs(w)
    val tauF = spark.range(1).select(lit(cosT).as("tau"))
    val refJac = operators.Dedup.ngramJaccardPairs(
        operators.Dedup.tokensOf(docsDF), jacT)
      .select(lit("jaccard").as("metric"), col("doc_a"), col("doc_b"),
        col("jaccard").as("score"))
    val refCos = operators.TextOps.cosinePrefixPairs(w, vecs, tauF)
      .filter(col("cosine") >= cosT)
      .select(lit("cosine").as("metric"), col("doc_a"), col("doc_b"),
        col("cosine").as("score"))
    val twin = refJac.unionByName(refCos).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(twin.count(_._1 == "cosine") >= 8,
      s"planting failed — cosine twin=${twin.toSeq.take(4)}")

    // the doc_id-ordered split puts twins (1,2)..(7,8) inside batch 1,
    // (9,10)..(15,16) inside batch 2 — and NONE crossing? doc 16 is in
    // batch 2 with doc 15: split at 12 instead so pairs (11,12)→cross
    def frame(b: Seq[(Long, String, String, String)]) =
      b.toDF("doc_id", "lang", "source", "text")
    val (b1, b2) = docs.splitAt(11) // doc_ids 1..11 | 12..24: pair (11,12) crosses
    SimilarityJoinStream.processBatch(frame(b1), dict, nDocs, stateDir, outDir)
    SimilarityJoinStream.processBatch(frame(b2), dict, nDocs, stateDir, outDir)
    val streamed = streamedPairs(outDir)
    assert(streamed === twin,
      s"stream-only=${(streamed -- twin).toSeq.take(5)} " +
        s"twin-only=${(twin -- streamed).toSeq.take(5)}")
    assert(streamed.contains(("cosine", 11L, 12L, 1.0))
      || streamed.exists(p => p._1 == "cosine" && p._2 == 11L && p._3 == 12L),
      "the cross-batch cosine pair (11,12) must be emitted by the probe path")
  }

  test("duplicate delivery of committed docs re-emits nothing") {
    val base = Files.createTempDirectory("simjoinstream_dup").toString
    val (stateDir, outDir) = (s"$base/state", s"$base/out")
    import spark.implicits._
    val docs = fixtureDocs
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val (dict, nDocs) = SimilarityJoinStream.frozenDict(spark, sfDir)
    def frame(b: Seq[(Long, String, String, String)]) =
      b.toDF("doc_id", "lang", "source", "text")
    SimilarityJoinStream.processBatch(frame(b1.toSeq), dict, nDocs, stateDir, outDir)
    SimilarityJoinStream.processBatch(frame(b2.toSeq), dict, nDocs, stateDir, outDir)
    val afterB2 = streamedPairs(outDir)
    assert(afterB2 === batchPairs, "two-batch replay drifted from batch")
    // redeliver BOTH committed batches wholesale: the seen set must
    // absorb them — no new pairs, no new store rows
    val vecRows = spark.read.parquet(s"$stateDir/jac_vecs").count()
    SimilarityJoinStream.processBatch(frame(b1.toSeq), dict, nDocs, stateDir, outDir)
    SimilarityJoinStream.processBatch(frame(b2.toSeq), dict, nDocs, stateDir, outDir)
    assert(streamedPairs(outDir) === afterB2, "redelivery re-emitted pairs")
    assert(spark.read.parquet(s"$stateDir/jac_vecs").count() === vecRows,
      "redelivery re-committed store rows")
  }
}
