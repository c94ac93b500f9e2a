package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpaceSavingAgg.spaceSavingAgg

/** [[graft.functions.SpaceSavingAgg]] — the Metwally et al. top-k
  * sketch behind q199. Pins (1) the exact single-stream eviction
  * semantics on a hand-run stream, (2) the classic Σ est = N invariant
  * that holds when no merge is involved, and (3) the merge-safe bound
  * contract (est ≥ true, est − err ≤ true, err ≤ N/m, 2N/m presence,
  * size = min(m, |keys|)) on skewed multi-partition streams — the
  * properties q199's oracle gates at fixture scale, re-checked here on
  * adversarially skewed synthetic data where eviction actually churns.
  */
class SpaceSavingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Run the aggregate and parse the flattened triples. `parallelize`
    * (not `repartition`, which round-robins) keeps the stream order
    * deterministic: contiguous chunks, in-order within each partition.
    */
  private def sketch(keys: Seq[Long], capacity: Int, parts: Int)
      : Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val flat = spark.sparkContext.parallelize(keys, parts).toDF("k")
      .agg(spaceSavingAgg(col("k"), capacity))
      .head.getSeq[Long](0)
    flat.grouped(3).map { t => (t(0), t(1), t(2)) }.toSeq
  }

  test("hand-run eviction: capacity 2 over 1,1,1,2,2,3 (single partition)") {
    // after 1×3, 2×2 the table is {1:(3,0), 2:(2,0)}; 3 evicts the
    // minimum (2, est 2) and inherits it: {1:(3,0), 3:(3,2)}
    val got = sketch(Seq(1L, 1L, 1L, 2L, 2L, 3L), capacity = 2, parts = 1)
    assert(got === Seq((1L, 3L, 0L), (3L, 3L, 2L)),
      "tie order: est desc, err asc, key asc")
  }

  test("single-stream invariant: estimates sum exactly to N") {
    // every update adds exactly 1 to the total (increment or
    // evict-inherit+1), so with no merge in play Σ est = N
    val keys = (1L to 400L).flatMap(k => Seq.fill((401 - k).toInt % 17 + 1)(k))
    val got = sketch(keys, capacity = 16, parts = 1)
    assert(got.map(_._2).sum === keys.size.toLong)
    assert(got.size === 16)
  }

  test("merge-safe bounds hold on a skewed multi-partition stream") {
    // Zipf-ish: key k gets ~N0/k occurrences — heavy keys exist and
    // capacity 16 << 120 distinct keys forces eviction + real merges
    val keys = (1L to 120L).flatMap(k => Seq.fill((600 / k).toInt)(k))
    val n = keys.size.toLong
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = 16
    val got = sketch(new scala.util.Random(42).shuffle(keys), m, parts = 4)
    assert(got.size === m, s"size must be min(m, |keys|), got ${got.size}")
    got.foreach { case (k, est, err) =>
      val f = exact(k)
      assert(est >= f, s"key $k: est $est under true $f")
      assert(est - err <= f, s"key $k: lower bound ${est - err} over true $f")
      assert(err * m <= n, s"key $k: err $err above N/m = ${n / m}")
    }
    val tracked = got.map(_._1).toSet
    exact.foreach { case (k, f) =>
      if (f * m > 2 * n)
        assert(tracked.contains(k), s"2N/m-heavy key $k (freq $f) missing")
    }
  }

  test("fewer keys than capacity: everything tracked exactly, zero error") {
    val keys = Seq(7L, 7L, 8L, 9L, 9L, 9L)
    val got = sketch(keys, capacity = 64, parts = 3)
    assert(got === Seq((9L, 3L, 0L), (7L, 2L, 0L), (8L, 1L, 0L)))
  }

  test("null keys are skipped, not counted") {
    import spark.implicits._
    val got = Seq(Some(1L), None, Some(1L), None, Some(2L))
      .toDF("k")
      .agg(spaceSavingAgg(col("k"), 8))
      .head.getSeq[Long](0).grouped(3).map(t => (t(0), t(1))).toSeq
    assert(got === Seq((1L, 2L), (2L, 1L)))
  }

  test("randomized bound invariants across capacities and partitionings") {
    // 24 seeded configurations: skew profile × capacity × partitions.
    // Every config must satisfy the full q199 contract vs exact counts —
    // the property that must survive ANY merge tree Spark picks.
    for {
      seed <- Seq(1, 2, 3)
      m <- Seq(2, 5, 16)
      parts <- Seq(2, 7)
    } {
      val rnd = new scala.util.Random(seed)
      // Zipf-ish skew: key k ~ 1/k weight over a 90-key domain
      val keys = Seq.fill(3000) {
        val u = rnd.nextDouble()
        (math.exp(u * math.log(90)) - 0.5).toLong.max(0L) + 1L
      }
      val n = keys.size.toLong
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = sketch(keys, m, parts)
      assert(got.size === math.min(m.toLong, exact.size.toLong),
        s"seed=$seed m=$m parts=$parts: size")
      got.foreach { case (k, est, err) =>
        val f = exact(k)
        assert(est >= f && est - err <= f && err * m <= n,
          s"seed=$seed m=$m parts=$parts key=$k: ($est,$err) vs $f")
      }
      val tracked = got.map(_._1).toSet
      exact.foreach { case (k, f) =>
        if (f * m > 2 * n)
          assert(tracked.contains(k),
            s"seed=$seed m=$m parts=$parts: heavy $k (freq $f) missing")
      }
    }
  }
}
