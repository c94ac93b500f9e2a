package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.VectorSumAggregator

/** ScalaCheck properties (SURVEY.md §5 item 3): the algebraic laws the
  * reference's hand-rolled pieces needed but never tested.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic property driver over scalacheck Gens (the
    * scalatest-scalacheck bridge isn't on the offline classpath).
    */
  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach(i => f(g.pureApply(Gen.Parameters.default, Seed(i.toLong))))
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // dyadic rationals: double addition is exact, so the associativity law
  // holds with == (arbitrary doubles only satisfy it up to ulps)
  private val vecGen =
    Gen.listOfN(8, Gen.choose(-40, 40).map(_ / 2.0)).map(_.toArray)

  test("vector-sum aggregator: merge is commutative and associative (A6 law)") {
    forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
      def m(x: Array[Double], y: Array[Double]) =
        VectorSumAggregator.merge(x.clone(), y.clone())
      assert(m(a, b).toSeq == m(b, a).toSeq)
      assert(m(m(a, b), c).toSeq == m(a, m(b, c)).toSeq)
      assert(m(a, VectorSumAggregator.zero).toSeq == a.toSeq)
    }
  }

  test("vector-sum aggregator distributes: Spark agg equals local fold") {
    import spark.implicits._
    val vecs = (1 to 100).map(i => Array.tabulate(8)(j => (i * 31 + j * 7) % 13 / 2.0))
    val ds = spark.createDataset(vecs)
    val got = ds.select(VectorSumAggregator.toColumn).head()
    val want = vecs.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    assert(got.toSeq == want.toSeq)
  }

  test("clamp stays in range and is idempotent (F2 law)") {
    forAll(Gen.choose(-100.0, 100.0)) { x =>
      val c = math.min(math.max(x, 1.0), 5.0)
      assert(c >= 1.0 && c <= 5.0)
      assert(math.min(math.max(c, 1.0), 5.0) == c)
    }
  }

  test("pseudo-avg is a contraction toward the prior (A5 law)") {
    import graft.functions.GraftFunctions.{PseudoAvgCount, PseudoAvgPrior}
    forAll(Gen.choose(1, 1000), Gen.choose(1.0, 5.0)) { (n, mean) =>
      val sum = mean * n
      val pseudo = (PseudoAvgPrior * PseudoAvgCount + sum) / (PseudoAvgCount + n)
      // lies between prior and sample mean
      val lo = math.min(PseudoAvgPrior, mean) - 1e-9
      val hi = math.max(PseudoAvgPrior, mean) + 1e-9
      assert(pseudo >= lo && pseudo <= hi)
    }
  }

  test("rolling hash: equal strings collide, prefix-distinct strings rarely do") {
    import graft.functions.RollingHash
    val h = (s: String) =>
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % RollingHash.DefaultMod)
    forAll(Gen.alphaLowerStr, Gen.alphaLowerStr) { (a, b) =>
      if (a == b) assert(h(a) == h(b))
      else if (h(a) != h(b)) assert(a != b) // no false equality claims
    }
  }

  test("dedup idempotence: distinct of distinct is distinct") {
    import spark.implicits._
    forAll(Gen.listOf(Gen.choose(0, 20)), n = 10) { xs =>
      if (xs.nonEmpty) {
        val ds = spark.createDataset(xs)
        val once = ds.distinct().collect().sorted.toSeq
        val twice = ds.distinct().distinct().collect().sorted.toSeq
        assert(once == twice)
        assert(once == xs.distinct.sorted.toSeq)
      }
    }
  }
}
