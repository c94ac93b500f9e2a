package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** Semantic invariants of the round-4 training-data-prep operators
  * (q96-q103) that the row-level DuckDB oracle doesn't spell out:
  * redaction completeness, packing arithmetic laws, chunk coverage,
  * mixture-weight shape, and the bloom prefilter's exactness +
  * scan-side plan placement.
  */
class TrainingPrepSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q96 flags exactly the injected docs and redaction leaves no residual PII") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val expected = docs.filter(col("doc_id") % 13 === 2).count()
    val out = Pipeline.q96.run(spark, sfDir).collect()
    assert(out.length === expected)
    // every flagged doc carries exactly the one injected email + one phone
    assert(out.forall(r => r.getLong(1) === 1L && r.getLong(2) === 1L))
    // completeness: applying the same injection + redaction leaves zero matches
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val residual = docs.select(
      when(col("doc_id") % 13 === 2,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text")).as("t"))
      .select(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("r"))
      .filter(size(regexp_extract_all(col("r"), lit(emailRe), lit(0))) > 0 ||
        size(regexp_extract_all(col("r"), lit(phoneRe), lit(0))) > 0)
      .count()
    assert(residual === 0L)
  }

  test("q97 repetition ratio is the bigram-duplication fraction, in [0, 1)") {
    val rows = Pipeline.q97.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, distinct, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(distinct >= 1L && distinct <= total)
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (1.0 - distinct.toDouble / total)) === 0.0)
    }
  }

  test("q98 packing arithmetic: chunk count, split bound, fill ratio") {
    val rows = Pipeline.q98.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nTokens, nChunks, nSplit, fill) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nChunks === (nTokens + 511) / 512) // ceil division law
      assert(nSplit <= math.min(nDocs, nChunks)) // a doc straddles at most per-boundary
      assert(fill > 0.0 && fill <= 1.0)
      assert(math.abs(fill - nTokens.toDouble / (nChunks * 512)) === 0.0)
    }
  }

  test("q99 contamination hits are train-side docs sharing >= 1 eval shingle") {
    val rows = Pipeline.q99.run(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 7 != 0L) // never flags the eval slice itself
      assert(r.getLong(1) >= 1L)
    }
    // any train doc whose text EQUALS an eval doc's text must be flagged
    // (identical text => identical shingle set)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val evalTexts = docs.filter(col("doc_id") % 7 === 0).select(col("text")).distinct()
    val dupIds = docs.filter(col("doc_id") % 7 =!= 0)
      .join(evalTexts, "text").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val flagged = rows.map(_.getLong(0)).toSet
    assert(dupIds.subsetOf(flagged))
  }

  test("q100 chunking covers every token exactly once per stride window") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(trim(col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = Pipeline.q100.run(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.keySet === docs.keySet)
    byDoc.foreach { case (id, chunks) =>
      val n = docs(id)
      assert(chunks.length === (n - 1) / 24 + 1) // one chunk per stride start
      chunks.foreach { c =>
        val (idx, tokens) = (c.getLong(1), c.getLong(2))
        assert(tokens === math.min(32, n - idx * 24)) // tail chunk truncates
        assert(tokens >= 1L && tokens <= 32L)
      }
    }
  }

  test("q101 downsamples only the over-represented language") {
    val rows = Pipeline.q101.run(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    val nl = rows.length
    rows.foreach { r =>
      val (nDocs, w, kept) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(w > 0.0 && w <= 1.0)
      if (w === 1.0) assert(kept === nDocs) // under-represented: kept whole
      else {
        assert(nDocs > total.toDouble / nl) // only dominant langs shrink
        assert(kept < nDocs)
      }
    }
  }

  test("q102 cutoffs bound a >= 88% keep band per language") {
    Pipeline.q102.run(spark, sfDir).collect().foreach { r =>
      val (nDocs, lo, hi, kept) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= hi)
      assert(kept <= nDocs)
      assert(kept.toDouble / nDocs >= 0.88) // p05..p95 keeps ~90%, ties can widen
    }
  }

  test("q120 content-defined anchors catch shared runs at DIFFERENT offsets") {
    import spark.implicits._
    // a 40-token verbatim run shared by two docs at offsets 0 and 3 —
    // a fixed-stride anchor grid (10) would align on neither; content-
    // defined selection picks the same windows from the run in both
    val run = (1 to 40).map(i => s"r${i * 7919 % 997}").mkString(" ")
    val padA = (1 to 5).map(i => s"a$i").mkString(" ")
    val padB = (1 to 3).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, run + " " + padA),             // run at offset 0
      (2L, padB + " " + run),             // run at offset 3
      (3L, (1 to 45).map(i => s"u${i * 104729 % 9973}").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val stats = graft.operators.Pipeline.anchorStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // both run-carrying docs flag duplicated anchors; the unrelated doc none
    assert(stats(1L)._2 > 0, s"doc 1 missed: $stats")
    assert(stats(2L)._2 > 0, s"doc 2 missed (offset-shifted run): $stats")
    assert(stats.get(3L).forall(_._2 === 0L), s"false positive on doc 3: $stats")
  }

  test("compress_ratio separates repetitive from diverse text, deterministically") {
    import spark.implicits._
    import graft.functions.CompressRatio.compressRatio
    val rep = ("spam " * 200).trim
    val div = (1 to 200).map(i => s"w${i * 2654435761L % 99991}").mkString(" ")
    val df = Seq(("rep", rep), ("div", div), ("empty", ""), ("null", null))
      .toDF("k", "t")
      .select(col("k"), compressRatio(col("t")).as("cr"))
    val m = df.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(m("rep").get < 0.1, s"repetitive text must compress hard: ${m("rep")}")
    assert(m("div").get > 2 * m("rep").get, "diverse text must compress far less")
    assert(m("div").get > 0.0 && m("div").get < 1.2)
    assert(m("empty").get === 1.0)
    assert(m("null").isEmpty, "null propagates")
    // determinism: same inputs, same ratios on a re-run
    val again = Seq(("rep", rep)).toDF("k", "t")
      .select(compressRatio(col("t"))).head().getDouble(0)
    assert(again === m("rep").get)
    // and the q122 screen runs with sane bounds on the fixture
    graft.operators.Pipeline.q122.run(spark, sfDir).collect().foreach { r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.2) // avg_ratio
      assert(r.getLong(4) >= 0L)
    }
  }

  test("q103 bloom prefilter is exact (equals the plain semi-join) and scan-side") {
    val df = Pipeline.q103.run(spark, sfDir)
    val viaBloom = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val plain = graft.sources.Tables.lineitem(spark, sfDir)
      .join(orders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaBloom === plain) // false positives removed by the exact join
    // plan contract: the bloom membership test sits in the plan as a
    // filter (scan-side, pre-shuffle), not as a post-join residual
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
  }
}
