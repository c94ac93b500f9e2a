package graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.CompactSketch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ThetaSketchAgg.thetaSketchAgg
import graft.functions.ThetaSetOp.{thetaANotB, thetaIntersect, thetaUnion}
import graft.functions.ThetaInBounds.thetaInBounds

/** [[graft.functions.ThetaSketchAgg]] + the scalar set-op expressions
  * behind q215. Pins (1) exact-mode equality below nominal entries,
  * (2) the determinism the driver's hash gate needs — identical sketch
  * BYTES across partitionings (canonical k-smallest-hash cutback, a
  * pure function of the input set), (3) estimation-mode bound coverage
  * for |A|, |A∩B|, |A∪B|, |A∖B| on sets with known overlap, and
  * (4) the empty-input / disjoint edge cases.
  */
class ThetaSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def est(bytes: Array[Byte]): Double =
    CompactSketch.heapify(Memory.wrap(bytes)).getEstimate

  private def sketchOf(keys: Seq[Long], lgNom: Int, parts: Int): Array[Byte] = {
    import spark.implicits._
    spark.sparkContext.parallelize(keys, parts).toDF("k")
      .agg(thetaSketchAgg(col("k"), lgNom))
      .head.getAs[Array[Byte]](0)
  }

  test("exact mode: below nominal entries the estimate IS the distinct count") {
    val bytes = sketchOf(Seq(1L, 2L, 3L, 2L, 1L, 7L), lgNom = 5, parts = 3)
    assert(est(bytes) == 4.0)
    val sk = CompactSketch.heapify(Memory.wrap(bytes))
    assert(!sk.isEstimationMode)
  }

  test("sketch bytes are a pure function of the input set (partitioning-proof)") {
    val keys = (1L to 5000L).map(i => i % 1361) // dupes + order variety
    val a = sketchOf(keys, lgNom = 5, parts = 1)
    val b = sketchOf(keys.reverse, lgNom = 5, parts = 13)
    assert(a.sameElements(b),
      "theta result must be canonical (k smallest hashes) regardless of order/partitioning")
    assert(CompactSketch.heapify(Memory.wrap(a)).isEstimationMode)
  }

  test("estimation mode: 3σ bounds cover |A|, |A∩B|, |A∪B|, |A∖B|") {
    import spark.implicits._
    // A = [0, 4000), B = [3000, 8000): |A|=4000 |B|=5000 |A∩B|=1000
    // |A∪B|=8000 |A∖B|=3000
    val df = (0L until 8000L).map(k =>
        (k, k < 4000L, k >= 3000L)).toDF("k", "in_a", "in_b")
      .repartition(7)
      .agg(
        thetaSketchAgg(when(col("in_a"), col("k")), 5).as("sa"),
        thetaSketchAgg(when(col("in_b"), col("k")), 5).as("sb"))
      .select(
        thetaInBounds(col("sa"), lit(4000L), 3).as("a_ok"),
        thetaInBounds(col("sb"), lit(5000L), 3).as("b_ok"),
        thetaInBounds(thetaIntersect(col("sa"), col("sb")), lit(1000L), 3)
          .as("i_ok"),
        thetaInBounds(thetaUnion(col("sa"), col("sb")), lit(8000L), 3)
          .as("u_ok"),
        thetaInBounds(thetaANotB(col("sa"), col("sb")), lit(3000L), 3)
          .as("d_ok"))
    val r = df.head
    assert((0 until 5).forall(r.getBoolean), r.toString)
  }

  test("empty and disjoint edges: empty sketch bounds are [0,0]; disjoint ∩ is 0") {
    import spark.implicits._
    val df = Seq((1L, true), (2L, true)).toDF("k", "in_a")
      .agg(
        thetaSketchAgg(when(col("in_a"), col("k")), 5).as("sa"),
        // no row sets in_b: this side aggregates zero keys
        thetaSketchAgg(when(!col("in_a"), col("k")), 5).as("sb"))
      .select(
        thetaInBounds(col("sb"), lit(0L), 3).as("empty_ok"),
        thetaInBounds(thetaIntersect(col("sa"), col("sb")), lit(0L), 3)
          .as("disjoint_ok"),
        thetaIntersect(col("sa"), col("sb")).as("inter"))
    val r = df.head
    assert(r.getBoolean(0) && r.getBoolean(1))
    assert(est(r.getAs[Array[Byte]]("inter")) == 0.0)
  }

  test("merge-agg of per-group sketches == direct sketch of the raw keys") {
    import graft.functions.ThetaMergeAgg.thetaMergeAgg
    import spark.implicits._
    // 40 groups, overlapping key ranges, enough keys for estimation mode
    val rows = (0 until 40).flatMap(g =>
      (0 until 200).map(i => (g.toLong, (g * 150 + i * 7).toLong)))
    val df = rows.toDF("g", "k")
    val direct = df.agg(thetaSketchAgg(col("k"), 6).as("s"))
      .head.getAs[Array[Byte]]("s")
    val merged = df.groupBy(col("g"))
      .agg(thetaSketchAgg(col("k"), 6).as("s"))
      .agg(thetaMergeAgg(col("s"), 6).as("m"))
      .head.getAs[Array[Byte]]("m")
    // canonical cutback: the union of per-group sketches is bit-equal
    // to sketching the union's raw keys — the property that makes a
    // persisted sketch table answer any coarser rollup (q228)
    assert(java.util.Arrays.equals(direct, merged))
    // and across partitionings of the sketch rows
    val merged13 = df.groupBy(col("g"))
      .agg(thetaSketchAgg(col("k"), 6).as("s"))
      .repartition(13)
      .agg(thetaMergeAgg(col("s"), 6).as("m"))
      .head.getAs[Array[Byte]]("m")
    assert(java.util.Arrays.equals(direct, merged13))
  }
}
