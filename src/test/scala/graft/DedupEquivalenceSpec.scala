package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingHash
import graft.operators.Dedup

/** q48's equivalence theorem, executed: the inverted-index set-similarity
  * join must produce EXACTLY the brute-force all-pairs result at any
  * positive threshold (Jaccard ≥ t > 0 ⟹ |A∩B| ≥ 1 ⟹ the pair
  * co-occurs in the index; the co-occurrence count is the exact |A∩B|).
  * Checked against an in-Spark brute force — built on the codegen'd
  * [[graft.functions.SortedIntersectCount]] two-pointer merge, the
  * verifier the all-pairs form used — on the fixture corpus and on an
  * adversarial synthetic corpus (identical docs, subsets, empty and
  * one-token docs, cross-block twins, a hot shingle).
  */
class DedupEquivalenceSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The previous all-pairs formulation, kept as the executable oracle:
    * block self-join + sorted-merge intersection per pair.
    */
  private def bruteForce(docs: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.SortedIntersectCount.sortedIntersectCount
    val toks = split(trim(col("text")), " ")
    val bigrams =
      zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit("_"), b))
    val hashed = array_sort(array_distinct(
      transform(bigrams, b => RollingHash.rollingHash(b))))
    val bg = docs
      .select(col("doc_id"), col("lang"), col("source"), hashed.as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val x = bg.alias("x")
    val y = bg.alias("y")
    x.join(y, col("x.lang") === col("y.lang") && col("x.source") === col("y.source")
        && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        sortedIntersectCount(col("x.sh"), col("y.sh")).cast("double").as("inter"),
        (col("x.n_sh") + col("y.n_sh")).as("sz"))
      .select(col("doc_a"), col("doc_b"),
        when(col("sz") - col("inter") > 0,
          col("inter") / (col("sz") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filtered join == brute force on fixture + adversarial corpora") {
    // q204's completeness theorem at several RATIONAL thresholds: the
    // prefix-pruned candidate set must lose no qualifying pair, on the
    // fixture corpus and on the adversarial corpus (hot shingle, twins,
    // subsets — the shapes where a wrong prefix bound would bite)
    val fixture = graft.sources.Tables.documents(spark, sfDir)
    for ((tn, td) <- Seq((1L, 10L), (1L, 2L), (3L, 5L), (4L, 5L))) {
      val fast = asSet(Dedup.prefixFilteredPairs(Dedup.tokensOf(fixture), tn, td))
      val slow = asSet(bruteForce(fixture, tn.toDouble / td))
      assert(fast === slow, s"fixture mismatch at $tn/$td")
    }
    import spark.implicits._
    val adv = Seq(
      (1L, "en", "web", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "web", "alpha beta gamma delta epsilon zeta"),
      (3L, "en", "web", "alpha beta gamma delta epsilon eta"),
      (4L, "en", "web", "alpha beta gamma"),
      (5L, "en", "web", "omicron pi rho sigma tau"),
      (6L, "fr", "web", "alpha beta gamma delta epsilon zeta"),
      (7L, "en", "web", "hot spot aa bb cc dd ee ff"),
      (8L, "en", "web", "hot spot ii jj kk ll mm nn"),
      (9L, "en", "web", "hot spot aa bb cc dd ee zz"))
      .toDF("doc_id", "lang", "source", "text")
    for ((tn, td) <- Seq((1L, 10L), (1L, 2L), (3L, 5L), (9L, 10L))) {
      val fast = asSet(Dedup.prefixFilteredPairs(Dedup.tokensOf(adv), tn, td))
      val slow = asSet(bruteForce(adv, tn.toDouble / td))
      assert(fast === slow, s"adversarial mismatch at $tn/$td")
    }
  }

  test("inverted-index join == brute force on the fixture corpus (several thresholds)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    for (t <- Seq(0.05, 0.1, 0.5)) {
      val fast = asSet(Dedup.ngramJaccardPairs(Dedup.tokensOf(docs), t))
      val slow = asSet(bruteForce(docs, t))
      assert(fast === slow, s"mismatch at threshold $t")
    }
  }

  test("inverted-index join == brute force on an adversarial synthetic corpus") {
    val rows = Seq(
      // identical pair (Jaccard 1.0) and a near-identical third
      (1L, "en", "web", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "web", "alpha beta gamma delta epsilon zeta"),
      (3L, "en", "web", "alpha beta gamma delta epsilon eta"),
      // subset relationship
      (4L, "en", "web", "alpha beta gamma"),
      // disjoint doc in the same block
      (5L, "en", "web", "omicron pi rho sigma tau"),
      // identical text, DIFFERENT block (must never pair)
      (6L, "fr", "web", "alpha beta gamma delta epsilon zeta"),
      (7L, "en", "cc", "alpha beta gamma delta epsilon zeta"),
      // empty + one-token docs: zero bigrams, never candidates
      (8L, "en", "web", ""),
      (9L, "en", "web", "solo"),
      (10L, "en", "web", "   "),
      // hot shingle: "hot spot" appears in many otherwise-unrelated docs
      (11L, "en", "web", "hot spot aa bb cc dd ee ff gg hh"),
      (12L, "en", "web", "hot spot ii jj kk ll mm nn oo pp"),
      (13L, "en", "web", "hot spot qq rr ss tt uu vv ww xx"),
      // chain: 14~15 overlap, 15~16 overlap, 14-16 nearly disjoint
      (14L, "en", "web", "one two three four five six"),
      (15L, "en", "web", "four five six seven eight nine"),
      (16L, "en", "web", "seven eight nine ten eleven twelve"))
    val docs = spark.createDataFrame(rows)
      .toDF("doc_id", "lang", "source", "text")
    for (t <- Seq(0.01, 0.1, 0.3, 1.0)) {
      val fast = asSet(Dedup.ngramJaccardPairs(Dedup.tokensOf(docs), t))
      val slow = asSet(bruteForce(docs, t))
      assert(fast === slow, s"mismatch at threshold $t")
    }
    // sanity: the corpus actually exercises the interesting cases
    val all = asSet(bruteForce(docs, 0.01))
    assert(all.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 },
      "identical pair missing")
    assert(!all.exists { case (a, b, _) => Set(a, b).intersect(Set(6L, 7L)).nonEmpty },
      "cross-block pair leaked")
    assert(!all.exists { case (a, b, _) => Set(a, b).intersect(Set(8L, 9L, 10L)).nonEmpty },
      "bigram-less doc paired")
  }

  test("q45 two-level LSH banding == one-level band join (same candidate set, no dups)") {
    import graft.functions.{MinHashAgg, RollingHash => RH}
    // one-level reference built from Dedup's OWN LSH constants, so a
    // change to the permutations or band geometry can't desynchronize
    // this spec from the query it guards
    val tok = Dedup.tokensOf(graft.sources.Tables.documents(spark, sfDir))
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("tok"))
      .withColumn("h", RH.rollingHash(col("tok")))
    val perms = (0 until Dedup.NumHashes).map(i => (Dedup.permA(i), Dedup.permB(i)))
    val mh = tok.groupBy(col("doc_id"))
      .agg(MinHashAgg.minhashAgg(col("h"), perms, Dedup.P).as("mh"))
    val bandSigs = mh.select(col("doc_id"),
      posexplode(array((0 until Dedup.NumBands).map { b =>
        concat_ws("-", (0 until Dedup.BandSize).map(j =>
          element_at(col("mh"), b * Dedup.BandSize + j + 1)): _*)
      }: _*)).as(Seq("band", "sig")))
    val oneLevel = bandSigs.alias("x").join(bandSigs.alias("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoLevelSeq = Dedup.q45.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exactly-once generation is the invariant that justified dropping
    // the one-level form's pair distinct() — assert it, don't assume it
    assert(twoLevelSeq.distinct.length === twoLevelSeq.length,
      "two-level expansion emitted duplicate pairs")
    val twoLevel = twoLevelSeq.toSet
    assert(twoLevel === oneLevel,
      s"two-level banding changed the candidate set: ${
        (twoLevel diff oneLevel).take(5)} extra, ${(oneLevel diff twoLevel).take(5)} missing")
  }

  test("q93 delta dedup == q47 pairs restricted to exactly-one-endpoint-in-delta") {
    val q47pairs = Dedup.q47.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = q47pairs.flatMap { case (a, b, d) =>
      (a % 10 == 0, b % 10 == 0) match {
        case (true, false) => Some((a, b, d)) // a is the delta doc
        case (false, true) => Some((b, a, d)) // reorient: delta first
        case _ => None // delta-delta and corpus-corpus pairs excluded
      }
    }.toSet
    val got = Dedup.q93.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected,
      s"delta join diverged from the full pair set: ${(got diff expected).take(5)} extra, ${
        (expected diff got).take(5)} missing")
  }

  test("inverted-index join == brute force on random corpora (seeded property sweep)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny vocab + short docs force heavy natural adversaries: exact
    // duplicates, subsets, empty/one-token docs and hot shingles all
    // arise by chance across seeds
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docGen = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    val corpusGen = Gen.listOfN(12, Gen.zip(docGen, Gen.oneOf("en", "fr"), Gen.oneOf("w", "c")))
    for (seed <- 0 until 8) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val rows = corpus.zipWithIndex.map { case ((words, lang, src), i) =>
        (i.toLong, lang, src, words.mkString(" "))
      }
      val docs = spark.createDataFrame(rows).toDF("doc_id", "lang", "source", "text")
      for (t <- Seq(0.01, 0.2, 0.5)) {
        val fast = asSet(Dedup.ngramJaccardPairs(Dedup.tokensOf(docs), t))
        val slow = asSet(bruteForce(docs, t))
        assert(fast === slow, s"mismatch at seed=$seed threshold=$t corpus=$rows")
      }
    }
  }

  test("q132 containment join == brute force; embedded quote detected") {
    import spark.implicits._
    // long doc, a short doc that IS a 24-token slice of it (containment
    // 1.0, Jaccard ~0.2 — the asymmetric case), plus unrelated docs
    val words = (1 to 100).map(i => s"w${i * 7919 % 997}")
    val long1 = words.mkString(" ")
    val quote = words.slice(30, 54).mkString(" ")
    val other = (1 to 80).map(i => s"z${i * 104729 % 9973}").mkString(" ")
    val docs = Seq(
      (1L, long1), (2L, quote), (3L, other),
      (4L, other + " tail tail2 tail3 tail4 tail5")) // overlapping pair
      .map { case (id, t) => (id, t, "en", "src") }
      .toDF("doc_id", "text", "lang", "source")

    def brute(threshold: Double): Set[(Long, Long)] = {
      val sh = graft.operators.Dedup.tokensOf(docs)
        .select(col("doc_id"), when(size(col("toks")) >= 5,
          array_distinct(transform(sequence(lit(1), size(col("toks")) - 4),
            i => array_join(slice(col("toks"), i, lit(5)), "_"))))
          .otherwise(array().cast("array<string>")).as("sh"))
      sh.alias("x").join(sh.alias("y"), col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double")
            / least(size(col("x.sh")), size(col("y.sh")))).as("c"))
        .filter(col("c") >= threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for (t <- Seq(0.5, 0.8, 0.95)) {
      val fast = graft.operators.Dedup
        .containmentPairs(graft.operators.Dedup.tokensOf(docs), t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast === brute(t), s"threshold $t")
    }
    // the embedded quote is specifically caught at full containment
    assert(graft.operators.Dedup
      .containmentPairs(graft.operators.Dedup.tokensOf(docs), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet.contains((1L, 2L)))
  }

  test("q48 registered query still runs end-to-end and is ordered") {
    val out = Dedup.q48.run(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sameElements(out.sortBy(identity)), "output must be ordered by (doc_a, doc_b)")
  }

  test("q197 cosines obey Cauchy-Schwarz and pair/order conventions") {
    val out = graft.operators.TextOps.q197.run(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be (a < b), symmetric-free")
      assert(r.getLong(2) > 0)
      // exact integer vectors: dot <= |a||b| exactly, so the IEEE
      // division can exceed 1 by at most an ulp
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0 + 1e-12)
    }
    val cs = out.map(_.getDouble(3)).toSeq
    assert(cs == cs.sortBy(-_), "must be ordered by cosine desc")
  }

  test("q189 survivorship reconciles with q73 clusters and q83's rollup") {
    val surv = Dedup.q189.run(spark, sfDir).collect()
    val clusters = Dedup.q73.run(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    // one ledger row per cluster, members sum to the corpus
    assert(surv.length == clusters.select(col("cluster")).distinct().count())
    assert(surv.map(_.getLong(1)).sum == docs.count())
    // canonical + retired chars partition each cluster's total mass
    val byCluster = clusters.join(docs, "doc_id")
      .groupBy(col("cluster"))
      .agg(sum(col("n_chars")).as("total"), max(col("n_chars")).as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    surv.foreach { r =>
      val (total, mx) = byCluster(r.getLong(0))
      assert(r.getLong(3) == mx, s"canonical_chars != max for cluster ${r.getLong(0)}")
      assert(r.getLong(3) + r.getLong(6) == total,
        s"canonical + retired != total chars for cluster ${r.getLong(0)}")
    }
    // the survivorship rule: the canonical doc really has the cluster's
    // max chars, ties to the SMALLEST doc_id
    val members = clusters.join(docs, "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getAs[Long]("n_chars")))
      .groupBy(_._1)
    surv.foreach { r =>
      val want = members(r.getLong(0)).map { case (_, id, nc) => (-nc, id) }.min._2
      assert(r.getLong(2) == want, s"canonical pick for cluster ${r.getLong(0)}")
    }
  }

  test("q247 symmetric-delete neighborhood is COMPLETE for dist<=1 on fixed-length keys") {
    // serial simulation of the candidate join on random length-10
    // strings with planted single substitutions: every Levenshtein<=1
    // pair must share a one-deletion variant (i=10 keeps the identity,
    // covering the dist-0 case), so the equi-join candidates ⊇ truth
    val rnd = new scala.util.Random(247)
    def variants(s: String): Set[String] =
      (0 to s.length).map(i => s.take(i) + s.drop(i + 1)).toSet // i=len → s
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val base = Seq.fill(60)((1 to 10).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val edited = base.map { s =>
      val i = rnd.nextInt(10)
      s.updated(i, ('a' + rnd.nextInt(4)).toChar)
    }
    val pool = (base ++ edited).distinct
    for (a <- pool; b <- pool if a < b) {
      val close = lev(a, b) <= 1
      val shared = variants(a).intersect(variants(b)).nonEmpty
      if (close) assert(shared, s"missed pair: $a / $b (dist=${lev(a, b)})")
    }
  }

  test("q247 two-level symspell expansion == in-Spark brute force on the fixture") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val k = docs
      .select(col("doc_id"), substring(lower(trim(col("text"))), 1, 10).as("s"))
      .filter(length(col("s")) === 10)
    val brute = k.alias("a").join(k.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
      .filter(col("dist") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotSeq = Dedup.q247.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // the two-level expansion must emit each pair exactly once
    assert(gotSeq.distinct.length === gotSeq.length, "duplicate pairs emitted")
    assert(gotSeq.toSet === brute,
      s"${(gotSeq.toSet diff brute).take(5)} extra, ${(brute diff gotSeq.toSet).take(5)} missing")
    assert(brute.nonEmpty, "fixture has no dist<=1 prefix pairs — vacuous")
  }

  /** Brute-force within-block Levenshtein join — the executable oracle
    * for [[Dedup.passJoinEditPairs]] (the plan q70 retired).
    */
  private def bruteEdit(p: DataFrame, k: Int): Set[(Long, Long, Long)] =
    p.alias("x").join(p.alias("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        levenshtein(col("x.pfx"), col("y.pfx")).cast("long").as("dist"))
      .filter(col("dist") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def fastEdit(p: DataFrame, k: Int): Set[(Long, Long, Long)] =
    Dedup.passJoinEditPairs(p, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("passJoin edit-distance pairs == brute force on an adversarial corpus") {
    // 40-char base, the q70 shape; edits placed to stress every leg of
    // the pigeonhole proof: clustered in one segment, spread across 8
    // of 9 segments, pure deletions/insertions (max shift), length gaps
    // at exactly k and k+1, short keys with empty segments, identical
    // texts, cross-block twins
    val base = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"
    val rows = Seq(
      (1L, "en", "web", base),
      (2L, "en", "web", base), // identical (dist 0)
      (3L, "en", "web", "ZZZZZZZZ" + base.drop(8)), // 8 subs, clustered
      (4L, "en", "web", "ZZZZZZZZZ" + base.drop(9)), // 9 subs — excluded
      // 8 subs spread over positions 0,5,10,...,35 (8 distinct segments)
      (5L, "en", "web", base.zipWithIndex.map { case (c, i) =>
        if (i % 5 == 0 && i < 40) 'Z' else c }.mkString),
      (6L, "en", "web", base.drop(8)), // 8 deletions (len 32)
      (7L, "en", "web", base.drop(9)), // 9 deletions — excluded vs 1, dist 1 vs 6
      (8L, "en", "web", base.take(20) + "12345678" + base.drop(20)), // 8 inserts
      (9L, "en", "web", "INTERIOR" + base.take(32)), // shifted content
      // short keys: segments of length 0 must still pair
      (10L, "en", "web", "abc"),
      (11L, "en", "web", "abd"),
      (12L, "en", "web", ""),
      (13L, "en", "web", "zzzzzzzzzz"), // dist 10 to 10/11 — excluded at k=8
      // identical text, DIFFERENT block: must never pair
      (14L, "fr", "web", base),
      (15L, "en", "cc", base))
    val p = spark.createDataFrame(rows).toDF("doc_id", "lang", "source", "pfx")
    for (k <- Seq(1, 2, 8)) {
      val want = bruteEdit(p, k)
      val got = fastEdit(p, k)
      assert(got === want, s"k=$k: ${(got diff want).take(5)} extra, ${
        (want diff got).take(5)} missing")
    }
    // sanity: the corpus exercises what it claims to
    val all = bruteEdit(p, 8)
    assert(all.contains((1L, 2L, 0L)), "identical pair missing")
    assert(all.contains((1L, 3L, 8L)), "clustered-subs pair missing")
    assert(all.contains((1L, 6L, 8L)), "deletion pair missing")
    assert(!all.exists { case (a, b, _) => Set(a, b).intersect(Set(14L, 15L)).nonEmpty },
      "cross-block pair leaked")
  }

  test("passJoin edit-distance pairs == brute force on random edit scripts (seeded sweep)") {
    val rnd = new scala.util.Random(70)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    def applyEdits(s: String, n: Int): String = {
      var cur = s
      for (_ <- 1 to n) {
        val op = rnd.nextInt(3)
        val i = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = op match {
          case 0 if cur.nonEmpty => cur.updated(i, ('a' + rnd.nextInt(4)).toChar)
          case 1 if cur.nonEmpty => cur.take(i) + cur.drop(i + 1)
          case _ => cur.take(i) + ('a' + rnd.nextInt(4)).toChar + cur.drop(i)
        }
      }
      cur
    }
    // seeds of varied length (including < k+1, forcing empty segments)
    // plus descendants at edit radii straddling both thresholds
    val seeds = Seq(3, 7, 12, 25, 40, 45).map(randStr)
    val rows = seeds.zipWithIndex.flatMap { case (s, si) =>
      (0 until 10).map(j =>
        (si * 100L + j, "en", "web", applyEdits(s, rnd.nextInt(11))))
    }
    val p = spark.createDataFrame(rows).toDF("doc_id", "lang", "source", "pfx")
    for (k <- Seq(2, 8)) {
      val want = bruteEdit(p, k)
      val got = fastEdit(p, k)
      assert(got === want, s"k=$k: ${(got diff want).take(5)} extra, ${
        (want diff got).take(5)} missing")
      assert(want.nonEmpty, s"k=$k sweep found no close pairs — corpus too sparse")
    }
  }
}
