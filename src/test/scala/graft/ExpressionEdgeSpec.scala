package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingHash.rollingHash
import graft.functions.VecOps.dotF
import graft.functions.SortedIntersectCount.sortedIntersectCount

/** Edge cases of the native Catalyst expressions — null propagation,
  * empty arrays, length mismatch — exercised through both the
  * interpreted (eval) and codegen paths (collect on a real plan uses
  * whole-stage codegen; the literal-only rows below also hit constant
  * folding's interpreted eval).
  */
class ExpressionEdgeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("null inputs propagate null (never crash, never fake a value)") {
    import spark.implicits._
    val df = Seq(("a", Some("abc")), ("b", None)).toDF("id", "s")
    val out = df.select(col("id"), rollingHash(col("s")).as("h"))
      .orderBy(col("id")).collect()
    assert(!out(0).isNullAt(1))
    assert(out(1).isNullAt(1))
  }

  test("empty string hashes to 0; empty arrays dot to 0.0 and intersect to 0") {
    import spark.implicits._
    val r = Seq(1).toDF("x").select(
      rollingHash(lit("")).as("h"),
      dotF(typedLit(Seq.empty[Double]), typedLit(Seq.empty[Double])).as("d"),
      sortedIntersectCount(typedLit(Seq.empty[Long]), typedLit(Seq.empty[Long])).as("c"))
      .head()
    assert(r.getLong(0) === 0L)
    assert(r.getDouble(1) === 0.0)
    assert(r.getInt(2) === 0)
  }

  test("mismatched array lengths yield NULL (corruption, not a partial dot)") {
    import spark.implicits._
    val r = Seq(1).toDF("x").select(
      dotF(typedLit(Seq(1.0, 2.0, 3.0)), typedLit(Seq(10.0, 10.0))).as("d"))
      .head()
    assert(r.isNullAt(0))
  }

  test("codegen and interpreted paths agree on real data") {
    import graft.functions.CompressRatio.compressRatio
    import graft.functions.NormalizeText.nfc
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def run(): Seq[(Long, Long, Double, Int)] =
      docs.select(col("doc_id"), rollingHash(col("text")).as("h"),
          compressRatio(col("text")).as("cr"), length(nfc(col("text"))).as("nl"))
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    // force an interpreted evaluation by collecting through a plan where
    // codegen is disabled, and compare against the default path
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val withCodegen = run()
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(withCodegen === run())
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("SimHashAgg equals the per-bit SUM(CASE) formulation across merges") {
    import spark.implicits._
    import graft.functions.SimHashAgg.simhashAgg
    val bits = 16
    // 10 partitions over 7 groups forces non-trivial partial buffers +
    // merge() at the exchange; include a null hash (must be a no-op vote)
    val rows = (1 to 200).map(i => (i % 7L, Option(i * 2654435761L))) :+ (0L, None)
    val df = rows.toDF("g", "h").repartition(10)
    val native = df.groupBy(col("g")).agg(simhashAgg(col("h"), bits).as("sim"))
      .orderBy(col("g")).collect().map(r => (r.getLong(0), r.getLong(1)))
    // CONTRACT: null hashes are ignored (no vote) — standard aggregate
    // semantics — so the expected side drops them before the SUM(CASE)
    // spelling, whose ELSE branch would otherwise count null as -1
    val votes = df.filter(col("h").isNotNull).groupBy(col("g")).agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("s0"),
      (1 until bits).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")): _*)
    val expected = votes.select(col("g"),
        (0 until bits).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sim"))
      .orderBy(col("g")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(native.toSeq === expected.toSeq)
  }

  test("MinHashAgg equals the per-permutation MIN(pmod) formulation across merges") {
    import spark.implicits._
    import graft.functions.MinHashAgg.minhashAgg
    val perms = Seq((17L, 91L), (19L, 96L), (21L, 101L))
    val mod = 1000000007L
    val rows = (1 to 300).map(i => (i % 5L, i * 48271L))
    val df = rows.toDF("g", "h").repartition(10)
    val native = df.groupBy(col("g")).agg(minhashAgg(col("h"), perms, mod).as("mh"))
      .select(col("g"), col("mh")).orderBy(col("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList))
    val slots = df.groupBy(col("g")).agg(
      min(pmod(col("h") * perms(0)._1 + perms(0)._2, lit(mod))).as("m0"),
      perms.zipWithIndex.tail.map { case ((a, b), i) =>
        min(pmod(col("h") * a + b, lit(mod))).as(s"m$i") }: _*)
    val expected = slots.select(col("g"), array(col("m0"), col("m1"), col("m2")).as("mh"))
      .orderBy(col("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList))
    assert(native.toSeq === expected.toSeq)
  }

  test("MinHashAgg yields NULL for a group with no valid input (MIN contract)") {
    import spark.implicits._
    import graft.functions.MinHashAgg.minhashAgg
    val df = Seq((1L, Option(42L)), (2L, Option.empty[Long]))
      .toDF("g", "h")
    val rows = df.groupBy(col("g"))
      .agg(minhashAgg(col("h"), Seq((17L, 91L)), 1000000007L).as("mh"))
      .orderBy(col("g")).collect()
    assert(!rows(0).isNullAt(1), "group with data must get a signature")
    assert(rows(1).isNullAt(1), "all-null group must yield NULL, not a sentinel")
  }

  test("NormalizeText matches java.text.Normalizer and is idempotent") {
    import spark.implicits._
    import graft.functions.NormalizeText.nfc
    val cases = Seq(
      "e\u0301cole",            // decomposed acute -> composes
      "\u00e9cole",             // already composed
      "A\u030Angstro\u0308m",  // decomposed ring + diaeresis
      "plain ascii text 123",
      "",
      "\uFB01le")               // fi ligature: NFC keeps it (NFKC would fold)
    val df = cases.toDF("s")
      .select(col("s"), nfc(col("s")).as("n"), nfc(nfc(col("s"))).as("nn"))
    df.collect().foreach { r =>
      val (raw, n, nn) = (r.getString(0), r.getString(1), r.getString(2))
      assert(n === java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC))
      assert(nn === n, "NFC must be idempotent")
    }
    // null propagates; composed/decomposed twins unify for fingerprinting
    val fp = Seq(("e\u0301cole", "\u00e9cole"), (null, null)).toDF("a", "b")
      .select(nfc(col("a")).as("na"), nfc(col("b")).as("nb")).collect()
    assert(fp(0).getString(0) === fp(0).getString(1))
    assert(fp(1).isNullAt(0) && fp(1).isNullAt(1))
  }

  test("CountMinAgg grid is partition-order invariant and matches a serial build") {
    import spark.implicits._
    import graft.functions.CountMinAgg
    val depth = 3
    val width = 64
    val mod = 1000000007L
    val hashes = (1 to 500).map(i => (i % 37L) * 48271L)
    // serial reference grid: the same arithmetic, folded in one thread
    val ref = new Array[Long](depth * width)
    hashes.foreach { h =>
      (0 until depth).foreach { i =>
        val m = (h * CountMinAgg.rowA(i) + CountMinAgg.rowB(i)) % mod
        val p = if (m < 0) m + mod else m
        ref(i * width + (p % width).toInt) += 1L
      }
    }
    Seq(1, 7, 32).foreach { parts =>
      val grid = hashes.toDF("h").repartition(parts)
        .agg(CountMinAgg.countMinAgg(col("h"), depth, width, mod).as("sk"))
        .collect()(0).getSeq[Long](0)
      assert(grid.toArray.sameElements(ref), s"grid diverged at $parts partitions")
    }
  }

  test("CountMinAgg point estimates never undercount; empty group is all zeros") {
    import spark.implicits._
    import graft.functions.CountMinAgg
    val depth = 4
    val width = 32 // deliberately tiny: force collisions, prove one-sidedness
    val mod = 1000000007L
    val items = (1 to 400).map(i => i % 23L)
    val df = items.map(v => (v, v * 2654435761L)).toDF("v", "h").repartition(8)
    val sk = df.agg(CountMinAgg.countMinAgg(col("h"), depth, width, mod).as("sk"))
    val est = least((0 until depth).map { i =>
      element_at(col("sk"),
        (lit(i * width)
          + pmod(col("h") * CountMinAgg.rowA(i) + CountMinAgg.rowB(i), lit(mod)) % width
          + 1).cast("int"))
    }: _*)
    val rows = df.groupBy(col("v"), col("h")).agg(count(lit(1)).as("n"))
      .crossJoin(sk).select(col("n"), est.as("est")).collect()
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(0),
      "count-min must never undercount"))
    // null inputs are skipped; a group of only nulls is a valid zero sketch
    val z = Seq(Option.empty[Long], Option.empty[Long]).toDF("h")
      .agg(CountMinAgg.countMinAgg(col("h"), 2, 8, mod).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(z.length === 16 && z.forall(_ == 0L))
  }

  test("SortedDotLong: merge semantics, disjoint/empty/null edges, codegen == interpreted") {
    import spark.implicits._
    import graft.functions.SortedDotLong.sortedDotLong
    def dot(ka: Seq[Long], wa: Seq[Long], kb: Seq[Long], wb: Seq[Long]): java.lang.Long = {
      val r = Seq((ka, wa, kb, wb)).toDF("ka", "wa", "kb", "wb")
        .select(sortedDotLong(col("ka"), col("wa"), col("kb"), col("wb")).as("d"))
        .collect()(0)
      if (r.isNullAt(0)) null else Long.box(r.getLong(0))
    }
    // overlap on keys 2 and 5: 20*3 + 7*(-4) = 32
    assert(dot(Seq(1L, 2L, 5L), Seq(9L, 20L, 7L), Seq(2L, 5L, 6L), Seq(3L, -4L, 8L)) === 32L)
    // disjoint key sets: zero
    assert(dot(Seq(1L, 3L), Seq(5L, 5L), Seq(2L, 4L), Seq(7L, 7L)) === 0L)
    // either side empty: zero
    assert(dot(Seq.empty, Seq.empty, Seq(1L), Seq(1L)) === 0L)
    // identical vectors: the exact norm
    assert(dot(Seq(1L, 2L), Seq(3L, 4L), Seq(1L, 2L), Seq(3L, 4L)) === 25L)
    // null array: null out (BinaryExpression-style null propagation)
    val nr = Seq((Option.empty[Seq[Long]], Seq(1L), Seq(1L), Seq(1L)))
      .toDF("ka", "wa", "kb", "wb")
      .select(sortedDotLong(col("ka"), col("wa"), col("kb"), col("wb")).as("d"))
      .collect()(0)
    assert(nr.isNullAt(0))
    // interpreted path (no-codegen) agrees with the codegen'd value
    val prevWs = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(dot(Seq(1L, 2L, 5L), Seq(9L, 20L, 7L), Seq(2L, 5L, 6L), Seq(3L, -4L, 8L)) === 32L)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWs)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }
}
