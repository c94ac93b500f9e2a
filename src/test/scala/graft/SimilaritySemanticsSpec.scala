package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.VecOps.dotF

/** q150's dedup semantics, executed: under the first-writer-wins-by-id
  * rule ("drop iff a strictly-lower-id near-duplicate exists in the
  * cluster") the kept set must be pairwise NON-near-dup within every
  * cluster — if kept x < kept y were near-dups, y would have a lower-id
  * near-dup and be dropped, contradiction — and every dropped vector
  * must have a strictly-lower-id near-dup in its cluster (soundness: no
  * vector is dropped without a witness). Both invariants are checked on
  * the fixture embeddings with the exact assignment + threshold q150
  * ships.
  */
class SimilaritySemanticsSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("q150 invariants: kept set pairwise non-dup; every drop has a lower-id witness") {
    val decisions = SparkEntry.queries("q150_semantic_dedup")(spark, sfDir)
      .select(col("vec_id"), col("cluster"), col("dropped"))
    val assigned = Similarity.clusteredEmbeddings(spark, sfDir)
    val full = assigned.join(decisions, Seq("vec_id", "cluster"))

    val total = full.count()
    assert(total > 0, "fixture embeddings must be non-empty")
    val nDropped = full.filter(col("dropped")).count()

    def cosPairs(left: org.apache.spark.sql.DataFrame,
                 right: org.apache.spark.sql.DataFrame) =
      left.alias("x").join(right.alias("y"),
          col("x.cluster") === col("y.cluster")
            && col("x.vec_id") < col("y.vec_id"))
        .filter((dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))) >= 0.40)

    // Invariant 1: no near-dup pair survives with BOTH endpoints kept.
    val kept = full.filter(!col("dropped"))
    assert(cosPairs(kept, kept).count() === 0L,
      "kept set must be pairwise below the near-dup threshold per cluster")

    // Invariant 2 (soundness): every dropped vector appears as the
    // HIGHER id of at least one near-dup pair in its cluster.
    val witnesses = cosPairs(full, full.filter(col("dropped")))
      .select(col("y.vec_id")).distinct().count()
    assert(witnesses === nDropped,
      s"every dropped vector needs a lower-id near-dup witness " +
        s"($witnesses witnessed of $nDropped dropped)")

    // The fixture must actually exercise the rule (some drops happen).
    assert(nDropped > 0, "threshold 0.40 should drop at least one vector")
  }

  /** q201's quality claim, measured: JL distortion follows the 1/√k
    * law, so doubling the projection dims must SHRINK the mean absolute
    * cosine error. A linear sign rule would plateau (see the splitmix
    * scaladoc in Similarity) — this test is the tripwire that keeps the
    * mixer honest if anyone "simplifies" it.
    */
  test("q201 JL law: mean |cosK - cos64| shrinks from k=16 to k=32 and is non-trivial at 16") {
    import graft.functions.VecOps.l2Norm
    val e = sources.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 64)
      .withColumn("nrm", l2Norm(col("embedding")))

    def meanErr(k: Int): Double = {
      val p = Similarity.jlProject(e, k)
      val full = e.select(col("vec_id"), col("embedding"), col("nrm"))
        .join(p.select(col("vec_id"), col("cemb"), col("cnrm")), "vec_id")
      full.alias("x").join(full.alias("y"), col("x.vec_id") < col("y.vec_id"))
        .select(abs(
          dotF(col("x.cemb"), col("y.cemb")) / (col("x.cnrm") * col("y.cnrm"))
            - dotF(col("x.embedding"), col("y.embedding"))
              / (col("x.nrm") * col("y.nrm"))).as("err"))
        .agg(avg(col("err"))).head().getDouble(0)
    }

    val (e16, e32) = (meanErr(16), meanErr(32))
    assert(e16 < 0.30, s"16-dim JL should approximate cosine on the fixture (got $e16)")
    assert(e32 < e16, s"doubling dims must reduce distortion (16: $e16, 32: $e32)")
  }
}
