package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics proofs for the round-14 curation-audit additions
  * (q324–q328) on CRAFTED corpora where the expected ledgers are
  * hand-computable — the driver's DuckDB gate proves engine==oracle on
  * the fixture; these prove the SEMANTICS are the intended ones (a KS
  * statistic someone can check by hand, a quantization-induced recall
  * loss the two-stage audit must detect, a truncation that provably
  * destroys/preserves the neighborhood order).
  */
class CurationAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // ------------------------------------------------------------- q324

  test("q324 KS: hand-computed cross-multiplied statistic on a 6-doc corpus") {
    // lang a lengths {1,2,3}, lang b {2,4}, lang c {5}
    val dir = tempDir("ks_drift")
    writeDocs(dir, Seq(
      (1L, "t", "a", "s", 1L), (2L, "t", "a", "s", 2L), (3L, "t", "a", "s", 3L),
      (4L, "t", "b", "s", 2L), (5L, "t", "b", "s", 4L),
      (6L, "t", "c", "s", 5L)))
    val rows = operators.Analytics.q324.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // (a,b): cum_a/cum_b over v=1,2,3,4 → |ca·2−cb·3| = 2,1,3,0
    assert(rows(("a", "b")) == ((3L, 2L, 3L, 3L, 500000L)))
    // (a,c): |ca·1−cc·3| over v=1,2,3,5 = 1,2,3,0 → max 3 at v=3
    assert(rows(("a", "c")) == ((3L, 1L, 3L, 3L, 1000000L)))
    // (b,c): |cb·1−cc·2| over v=2,4,5 = 1,2,0 → max 2 at v=4
    assert(rows(("b", "c")) == ((2L, 1L, 2L, 4L, 1000000L)))
    assert(rows.size == 3)
  }

  test("q324 KS: identical distributions score zero") {
    val dir = tempDir("ks_zero")
    writeDocs(dir, Seq(
      (1L, "t", "a", "s", 10L), (2L, "t", "a", "s", 20L),
      (3L, "t", "b", "s", 10L), (4L, "t", "b", "s", 20L)))
    val r = operators.Analytics.q324.run(spark, dir).collect()
    assert(r.length == 1 && r(0).getLong(4) == 0L && r(0).getLong(6) == 0L)
  }

  // ------------------------------------------------------------- q325

  private def writeEmb(dir: String, rows: Seq[(Long, Seq[Float])]): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("q325: information confined to the 16-dim prefix → full recall") {
    // 20-dim vectors, dims 17..20 all zero: the truncated ranking IS the
    // full ranking, so every query must report 5 hits + top-1 survival.
    val dir = tempDir("mat_full")
    def v(seed: Int): Seq[Float] =
      Seq.tabulate(20)(d => if (d < 16) ((seed * 7 + d * 3) % 11 + 1).toFloat else 0f)
    writeEmb(dir, (0L, v(1)) +: (100L to 107L).map(i => (i, v(i.toInt))))
    val rows = operators.Similarity.q325.run(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 5L && rows(0).getLong(2) == 1L)
  }

  test("q325: information confined to dims 17+ → truncation destroys the order") {
    // All candidates share the identical 16-dim prefix (ties resolve by
    // vec_id, so truncated top-5 = ids 100..104); the true order lives in
    // dim 17 and is the REVERSE (largest id = best) → zero overlap.
    val dir = tempDir("mat_none")
    val prefix = 1f +: Seq.fill(15)(0f)
    val query = (0L, prefix ++ Seq(1f, 0f, 0f, 0f))
    val cands = (100L to 109L).map(i =>
      (i, prefix ++ Seq(((i - 99) * 0.05).toFloat, 0f, 0f, 0f)))
    writeEmb(dir, query +: cands)
    val rows = operators.Similarity.q325.run(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 0L && rows(0).getLong(2) == 0L)
  }

  // ------------------------------------------------------------- q326

  test("q326: record cap, value clip, and truncated-user accounting by hand") {
    import spark.implicits._
    val dir = tempDir("contrib_cap")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      // user 1: five purchases; the 3rd (200.00) is kept AND clipped
      (1L, ts(1), 1L, "purchase", 10.00, "{}"),
      (2L, ts(2), 1L, "purchase", 20.00, "{}"),
      (3L, ts(3), 1L, "purchase", 200.00, "{}"),
      (4L, ts(4), 1L, "purchase", 30.00, "{}"),
      (5L, ts(5), 1L, "purchase", 40.00, "{}"),
      // user 2: two purchases, under the cap
      (6L, ts(1), 2L, "purchase", 50.00, "{}"),
      (7L, ts(2), 2L, "purchase", 60.00, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = operators.Pipeline.q326.run(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "purchase")
    assert(row.getLong(1) == 7L, "n_raw")
    assert(row.getLong(2) == 5L, "n_kept: 3 (capped user 1) + 2 (user 2)")
    assert(row.getLong(3) == 2L, "n_users")
    assert(row.getLong(4) == 1L, "only user 1 was truncated")
    assert(row.getLong(5) == 41000L, "sum_cents_raw")
    assert(row.getLong(6) == 34000L, "kept: 23000 (u1 first 3) + 11000 (u2)")
    assert(row.getLong(7) == 24000L, "clipped: 200.00 → 100.00")
  }

  // ------------------------------------------------------------- q327

  test("q327: quantization-induced recall loss is detected (true top-1 past the coarse cut)") {
    // Query = [1, .5, 0, 0]; B (vec 100) equals the query direction
    // exactly (cos = 1, the true top-1) and codes to [127, 63] →
    // coarse 127²+63² = 20098. Each C_i = [.9, .5, δ_i, 0] codes to
    // [127, 70] (mx = .9 stretches the second dim) → coarse 20539 >
    // 20098, while its exact cosine stays < 1. With 21 C's the true
    // top-1 sits at coarse rank 22 — OUTSIDE the top-20 — so the
    // reranked list can recover at most 4 of the exact top-5.
    val dir = tempDir("two_stage")
    val q = (0L, Seq(1f, 0.5f, 0f, 0f))
    val b = (100L, Seq(1f, 0.5f, 0f, 0f))
    val cs = (101L to 121L).map(i =>
      (i, Seq(0.9f, 0.5f, ((i - 100) * 0.0001).toFloat, 0f)))
    writeEmb(dir, q +: b +: cs)
    val rows = operators.Similarity.q327.run(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(2) == 22L, "true top-1 must rank 22nd coarsely")
    assert(rows(0).getLong(1) == 4L,
      "rerank recovers exactly the 4 in-cut members of the exact top-5")
  }

  test("q327: alignment-preserving corpus → perfect two-stage recall") {
    // Candidates colinear with the query at power-of-two scales: the
    // scaling is exact in float AND cancels bitwise in the cosine (both
    // norms and the dot shift by the same 2^k), so every cf ties, every
    // int8 code vector is identical, and BOTH rankings resolve by
    // vec_id — the audit must report 5/5 and coarse rank 1.
    val dir = tempDir("two_stage_ok")
    val q = (0L, Seq(4f, 3f, 2f, 1f))
    val cands = (100L to 107L).map { i =>
      val s = (1 << (i - 100).toInt).toFloat
      (i, Seq(4f / s, 3f / s, 2f / s, 1f / s))
    }
    writeEmb(dir, q +: cands)
    val rows = operators.Similarity.q327.run(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 5L && rows(0).getLong(2) == 1L)
  }

  // ------------------------------------------------------------- q329

  test("q329: temperature weights by hand (isqrt 4→2, 9→3; budget = half)") {
    val dir = tempDir("temp_mix")
    writeDocs(dir, Seq(
      (1L, "w w w w", "a", "s1", 7L),          // domain (a,s1): 4 tokens
      (2L, "w w w w w w w w w", "b", "s2", 17L))) // domain (b,s2): 9 tokens
    val rows = operators.Pipeline.q329.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // total=13, wsum=5, budget=6: drawn a=6·2/5=2 (epochs .500),
    // b=6·3/5=3 (epochs .333)
    assert(rows(("a", "s1")) == ((4L, 2L, 400000L, 2L, 500L)))
    assert(rows(("b", "s2")) == ((9L, 3L, 600000L, 3L, 333L)))
  }

  // ------------------------------------------------------------- q330

  test("q330: MMR demotes the exact copy below the diverse candidate") {
    // Query on the x-axis; A (100) and its exact copy A2 (101) at rel ≈
    // .902; B (102) mirrored (same rel — round 1 tie resolves to the
    // lowest id, A). Round 2: A2's redundancy penalty is 0.3·1 (copy of
    // the selected A) → score ≈ .331; B's penalty is 0.3·sim(B,A) ≈
    // .188 → score ≈ .443 — MMR must pick B second, the copy last.
    val dir = tempDir("mmr")
    writeEmb(dir, Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (100L, Seq(0.9f, 0.43f, 0f, 0f)),
      (101L, Seq(0.9f, 0.43f, 0f, 0f)),
      (102L, Seq(0.9f, -0.43f, 0f, 0f))))
    val rows = operators.Similarity.q330.run(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rows == Map(1L -> 100L, 2L -> 102L, 3L -> 101L),
      "greedy order must be original, diverse mirror, then the copy")
  }

  test("q330: relevance-only round 1 equals the exact top-1") {
    // on the real fixture, every query's round-1 pick must be its exact
    // cosine top-1 (MMR round 1 has no penalty term by construction)
    val sfDir = "/root/testdata/sf0.001"
    val top1 = operators.Similarity.q50.run(spark, sfDir).collect()
      .filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mmr1 = operators.Similarity.q330.run(spark, sfDir).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(mmr1 == top1)
  }

  // ------------------------------------------------------------- q331

  test("q331: cluster split strands zero near-dup pairs; doc split leaks one") {
    // docs 4 and 5 are exact duplicates (one near-dup pair, cluster 4);
    // docs 1 and 10 are singletons. doc_hash folds on id%5: {5,10} test
    // → the (4,5) pair CROSSES. cluster folds on cluster%5: cluster 4
    // keeps both dups in train, cluster 10 goes to test → zero crossings.
    val dir = tempDir("cluster_split")
    writeDocs(dir, Seq(
      (1L, "alpha beta gamma", "en", "s", 16L),
      (4L, "dup text here", "en", "s", 13L),
      (5L, "dup text here", "en", "s", 13L),
      (10L, "other words now", "en", "s", 15L)))
    val rows = operators.Dedup.q331.run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows("cluster") == ((3L, 1L, 9L, 3L, 0L)),
      "cluster policy must keep the dup pair whole (zero cross pairs)")
    assert(rows("doc_hash") == ((2L, 2L, 6L, 6L, 1L)),
      "per-doc policy must strand the dup pair across the fold boundary")
  }

  // ------------------------------------------------------------- q333

  test("q333: a 13-token verbatim overlap is certainly listed (winnowing guarantee boundary)") {
    // docs 1 and 2 share exactly 13 consecutive tokens (distinct words,
    // so all 4-gram hashes differ) embedded in otherwise-disjoint text;
    // 13 tokens ⟹ 6 full windows ⟹ ≥ 2 shared fingerprints ⟹ the pair
    // MUST be listed. doc 3 shares nothing.
    val dir = tempDir("winnow")
    val shared = (1 to 13).map(i => s"m$i").mkString(" ")
    writeDocs(dir, Seq(
      (1L, s"aa bb cc dd ee $shared ff gg hh", "en", "s", 0L),
      (2L, s"pp qq rr $shared ss tt uu vv ww xx", "en", "s", 0L),
      (3L, "zz yy xx2 ww2 vv2 uu2 tt2 ss2 rr2 qq2 pp2 oo2 nn2", "en", "s", 0L)))
    val rows = operators.Dedup.q333.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.contains((1L, 2L)), "the planted overlap must be detected")
    assert(rows((1L, 2L)) >= 2L)
    assert(rows.keySet == Set((1L, 2L)), "no spurious pairs")
  }

  // ------------------------------------------------------------- q339

  test("q339: copies count against their source; representatives and singletons are original") {
    // source A holds the original (id 4) and a singleton (id 1) → 2/2
    // original; source B holds only the copy of 4 (id 5) → 0/1.
    val dir = tempDir("originality")
    writeDocs(dir, Seq(
      (1L, "alpha beta gamma", "en", "A", 16L),
      (4L, "dup text here", "en", "A", 13L),
      (5L, "dup text here", "en", "B", 13L)))
    val rows = operators.Dedup.q339.run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("A") == ((2L, 2L, 1000000L)))
    assert(rows("B") == ((1L, 0L, 0L)))
  }

  // ------------------------------------------------------------- q332

  test("q332: leave-one-source-out shifts by hand (floor-first ppm)") {
    val dir = tempDir("loo_impact")
    writeDocs(dir, Seq(
      (1L, "t", "en", "A", 10L), (2L, "t", "en", "A", 10L),
      (3L, "t", "fr", "B", 40L)))
    val rows = operators.Pipeline.q332.run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // drop A: en 666666→0 (d 666666), fr 333333→1000000 (d 666667);
    // mean chars 20000‰→40000‰
    assert(rows("A") == ((2L, 20L, 1333333L, 20000L)))
    // drop B: en 666666→1000000 (d 333334), fr 333333→0 (d 333333);
    // mean 20000‰→10000‰
    assert(rows("B") == ((1L, 40L, 666667L, 10000L)))
  }

  // ------------------------------------------------------------- q335

  test("q335: the isolated vector ranks first; cluster members score near 1") {
    // 6 vectors tightly around e1 plus one orthogonal outlier (id 200):
    // the outlier's 5th-nearest cosine is ≈ 0, every cluster member's is
    // ≈ 1 — the outlier must lead the ledger.
    val dir = tempDir("knn_out")
    val cluster = (100L to 105L).map(i =>
      (i, Seq(1f, ((i - 100) * 0.01f), 0f, 0f)))
    writeEmb(dir, cluster :+ ((200L, Seq(0f, 0f, 1f, 0f))))
    val rows = operators.Similarity.q335.run(spark, dir).collect()
    assert(rows.head.getLong(0) == 200L, "outlier must rank first")
    assert(rows.head.getLong(2) < 500000L, "outlier 5th-NN cosine ≈ 0")
    assert(rows.filter(_.getLong(0) != 200L).forall(_.getLong(2) > 900000L),
      "cluster members' 5th-NN cosine ≈ 1")
  }

  test("q335: bucket-starved vectors get the sentinel and pin to the front") {
    val dir = tempDir("knn_starved")
    writeEmb(dir, (100L to 103L).map(i => (i, Seq(1f, i * 0.1f, 0f, 0f))))
    val rows = operators.Similarity.q335.run(spark, dir).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.getLong(1) == 3L && r.getLong(2) == -2000000L),
      "with 3 neighbors each, every vector is bucket-starved")
    assert(rows.map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 103L),
      "sentinel ties must order by vec_id")
  }

  // ------------------------------------------------------------- q328

  test("q328: novelty = first-occurrence; copies score zero, partial overlap prorated") {
    val dir = tempDir("novelty")
    writeDocs(dir, Seq(
      (1L, "a b c d", "en", "s", 7L),   // trigrams "a b c","b c d": both novel
      (2L, "a b c d", "en", "s", 7L),   // exact copy: zero novelty
      (3L, "a b c x", "en", "s", 7L),   // "a b c" seen, "b c x" novel
      (4L, "a b", "en", "s", 3L)))      // too short: no trigram, absent
    val rows = operators.TextOps.q328.run(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 3, "the trigram-free doc must be absent")
    assert(rows(1L) == ((2L, 2L, 2L, 1000000L)))
    assert(rows(2L) == ((2L, 2L, 0L, 0L)))
    assert(rows(3L) == ((2L, 2L, 1L, 500000L)))
  }
}
