package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Advanced

/** Product-quantization ANN (q108): recall against the exact L2 top-5,
  * code-domain invariants, and ADC's approximation contract (the ADC
  * distance equals the exact distance from the query to each vector's
  * RECONSTRUCTION, so it can't be wildly off when quantization error is
  * bounded).
  */
class PqAnnSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q108 codes are within the nibble domain and cover multiple centroids") {
    val (_, codes) = Advanced.pqIndex(spark, sfDir)
    val rows = codes.select(col("codes")).collect().map(_.getSeq[Int](0))
    assert(rows.nonEmpty)
    assert(rows.forall(cs => cs.length === 8 && cs.forall(c => c >= 0 && c < 16)))
    // the fit is not degenerate: each subspace uses > 1 centroid
    (0 until 8).foreach { m =>
      assert(rows.map(_(m)).distinct.length > 1, s"subspace $m collapsed")
    }
  }

  test("q108 ADC top-5 recalls a usable fraction of the exact L2 top-5") {
    import graft.functions.VecOps.dotF
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // exact L2 top-5 per query (same tie-break as q108: distance, vec_b)
    val q = e.filter(col("vec_id") < 10).alias("x")
    val scored = q.join(e.alias("y"), col("y.vec_id") =!= col("x.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("vec_b"),
        (dotF(col("x.embedding"), col("x.embedding"))
          - lit(2.0) * dotF(col("x.embedding"), col("y.embedding"))
          + dotF(col("y.embedding"), col("y.embedding"))).as("d2"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("vec_b"))
    val exact = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val approx = Advanced.pqTopK(spark, sfDir)
      .select(col("query_id"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(approx.size === exact.size)
    val recall = (approx intersect exact).size.toDouble / exact.size
    // 8 subspaces x 16 centroids on 64 dims: recall@5 well above chance
    // (5/499 ~ 1%); the bound has margin under the seeded, deterministic fit
    assert(recall >= 0.4, s"PQ recall@5 = $recall")
  }
}
