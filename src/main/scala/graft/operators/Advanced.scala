package graft.operators

import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.{oracled, rowsOnly}
import graft.sources.Tables

/** Second-ring relational surface: pivot, correlated subqueries, ALL set
  * variants — plus an IVF-style (k-means-bucketed) ANN as the clustered
  * alternative to sign-LSH.
  */
object Advanced {

  /** q60 — pivot: order counts per (priority × status) matrix. The
    * oracle uses portable conditional aggregation; Spark uses the
    * first-class `pivot` operator (which compiles to the same single
    * hash aggregate — pivot values are declared, so no extra pass).
    */
  val q60 = oracled(
    "q60_pivot",
    "pivot orderstatus into columns per priority",
    """SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
       FROM orders
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""") { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))
  }

  /** q61 — correlated scalar subquery: customers richer than their
    * nation's average balance. Run through spark.sql so Catalyst's
    * subquery decorrelation (RewriteCorrelatedScalarSubquery) is the
    * machinery under test; the oracle is the same ANSI SQL.
    */
  val q61 = oracled(
    "q61_correlated_subquery",
    "correlated scalar subquery (decorrelated to an agg+join by Catalyst)",
    """SELECT c_custkey, c_nationkey, c_acctbal
       FROM customer c1
       WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
                          WHERE c2.c_nationkey = c1.c_nationkey)
       ORDER BY c_custkey""") { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer_q61")
    s.sql("""SELECT c_custkey, c_nationkey, c_acctbal
             FROM customer_q61 c1
             WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_q61 c2
                                WHERE c2.c_nationkey = c1.c_nationkey)
             ORDER BY c_custkey""")
  }

  /** q62 — multiset (ALL) set operations: bag semantics preserve
    * duplicate cardinality, unlike q16/q17's set semantics.
    */
  val q62 = oracled(
    "q62_set_ops_all",
    "INTERSECT ALL / EXCEPT ALL bag semantics",
    """SELECT status_pair, COUNT(*) AS n FROM (
         SELECT 'intersect_all' AS status_pair FROM
           (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
         UNION ALL
         SELECT 'except_all' AS status_pair FROM
           (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'))
       GROUP BY status_pair
       ORDER BY status_pair""") { (s, dir) =>
    def keys(status: String) =
      Tables.orders(s, dir).filter(col("o_orderstatus") === status)
        .select(col("o_custkey"))
    val ia = keys("F").intersectAll(keys("O")).select(lit("intersect_all").as("status_pair"))
    val ea = keys("F").exceptAll(keys("O")).select(lit("except_all").as("status_pair"))
    ia.union(ea)
      .groupBy(col("status_pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status_pair"))
  }

  /** q63 — IVF-style ANN: k-means coarse quantizer (seeded) assigns each
    * vector to a centroid cell; queries probe only their own cell and
    * take top-5 by cosine. The clustered counterpart to q51's sign-LSH —
    * rows-only (centroids depend on seed+partitioning), recall-tested
    * against q50 in the spec.
    */
  val q63 = rowsOnly(
    "q63_ann_ivf_kmeans",
    "IVF ANN: k-means cells (k=16, seeded) + top-5 within the probed cell") { (s, dir) =>
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.VecOps.l2Norm
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"),
        array_to_vector(col("embedding")).as("features"))
      .cache()
    val model = new KMeans().setK(16).setSeed(42L).setMaxIter(5).fit(e)
    val cells = model.transform(e)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("prediction").as("cell"))
    Similarity.topK(
      Similarity.cosineScored(cells.filter(col("vec_id") < 10), cells,
        col("x.cell") === col("y.cell")), 5)
  }

  val all: Seq[GQuery] = Seq(q60, q61, q62, q63)
}
