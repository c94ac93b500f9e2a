package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AmsF2Agg
import graft.functions.AmsF2Agg.amsF2Agg

/** The AMS/Count-Sketch F2 aggregate: estimator accuracy on known
  * frequency profiles, bit-exact partitioning invariance (vector-add
  * merge), and the GF(2^61−1) hash arithmetic it stands on.
  */
class AmsF2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def est(keys: Seq[Long], parts: Int): Long = {
    import spark.implicits._
    keys.toDF("k").repartition(parts)
      .agg(amsF2Agg(col("k"), 256, 5).as("e"))
      .head().getLong(0)
  }

  test("mulmod/poly4: field arithmetic matches BigInt over 2^61-1") {
    val p = BigInt(AmsF2Agg.P)
    val vals = Seq(0L, 1L, 2L, AmsF2Agg.P - 1, 0x123456789abcdefL,
      (1L << 60) + 12345L)
    for (a <- vals; b <- vals) {
      val expect = ((BigInt(a) * BigInt(b)) mod p).toLong
      assert(AmsF2Agg.mulmod(a, b) == expect, s"mulmod($a, $b)")
    }
    val c = Array(7L, 11L, 13L, 17L)
    for (x <- vals) {
      val expect = ((BigInt(17) * BigInt(x).pow(3) + BigInt(13) * BigInt(x)
        .pow(2) + BigInt(11) * BigInt(x) + 7) mod p).toLong
      assert(AmsF2Agg.poly4(c, x) == expect, s"poly4($x)")
    }
  }

  test("estimates track exact F2 across frequency profiles") {
    // uniform: 2000 distinct singletons, F2 = 2000
    val uniform = (1L to 2000L)
    // skewed: one key 500 times + 500 singletons, F2 = 250000 + 500
    val skewed = Seq.fill(500)(42L) ++ (1000L to 1499L)
    // two heavy keys, F2 = 300² + 200² + 100
    val two = Seq.fill(300)(7L) ++ Seq.fill(200)(9L) ++ (100L to 199L)
    for ((keys, exact) <- Seq(
        (uniform, 2000L), (skewed, 250500L), (two, 130100L))) {
      val e = est(keys, 4)
      val slack = exact * 265 / 1000
      assert(math.abs(e - exact) <= slack,
        s"est $e vs exact $exact (slack $slack)")
    }
  }

  test("the estimate is a pure function of the multiset: partitioning-proof") {
    val keys = Seq.fill(300)(7L) ++ Seq.fill(200)(9L) ++ (100L to 1099L)
    val one = est(keys, 1)
    assert(est(keys, 4) == one)
    assert(est(keys, 13) == one)
    // order shuffled: same multiset, same estimate
    assert(est(scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(keys), 4) == one)
  }

  test("empty and null-only groups estimate F2 = 0") {
    import spark.implicits._
    assert(spark.emptyDataset[Long].toDF("k")
      .agg(amsF2Agg(col("k"), 256, 5)).head().getLong(0) == 0L)
    assert(Seq[Option[Long]](None, None).toDF("k")
      .agg(amsF2Agg(col("k"), 256, 5)).head().getLong(0) == 0L)
  }
}
