package graft.operators

import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.{oracled, rowsOnly}
import graft.sources.Tables

/** Set operations + distinct aggregation (SURVEY.md §2.2 rows "Set ops"
  * and "Agg: distinct"). All shapes stay fully distributed: UNION is a
  * plan concat, INTERSECT/EXCEPT compile to semi/anti joins, distinct
  * aggregation is a two-phase hash aggregate.
  */
object SetOps {

  private def custkeysWithStatus(s: org.apache.spark.sql.SparkSession,
      dir: String, status: String) =
    Tables.orders(s, dir).filter(col("o_orderstatus") === status)
      .select(col("o_custkey"))

  /** q15 — UNION (distinct) of two key sets. */
  val q15 = oracled(
    "q15_union_distinct",
    "UNION = union + distinct (two-phase hash aggregate)",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       UNION
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
       ORDER BY o_custkey""") { (s, dir) =>
    custkeysWithStatus(s, dir, "F")
      .union(custkeysWithStatus(s, dir, "P"))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  /** q16 — INTERSECT: customers with both fulfilled and open orders.
    * Catalyst plans this as a left-semi join over distinct inputs.
    */
  val q16 = oracled(
    "q16_intersect",
    "INTERSECT == distinct + left-semi join",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       ORDER BY o_custkey""") { (s, dir) =>
    custkeysWithStatus(s, dir, "F")
      .intersect(custkeysWithStatus(s, dir, "O"))
      .orderBy(col("o_custkey"))
  }

  /** q17 — EXCEPT: customers with fulfilled but no open orders. */
  val q17 = oracled(
    "q17_except",
    "EXCEPT == distinct + left-anti join",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       ORDER BY o_custkey""") { (s, dir) =>
    custkeysWithStatus(s, dir, "F")
      .except(custkeysWithStatus(s, dir, "O"))
      .orderBy(col("o_custkey"))
  }

  /** q18 — exact distinct aggregation per group. */
  val q18 = oracled(
    "q18_count_distinct",
    "per-group COUNT(DISTINCT) — expand + two-phase aggregate",
    """SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers
       FROM customer
       GROUP BY c_mktsegment
       ORDER BY c_mktsegment""") { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** q19 — approximate distinct (HyperLogLog++). Sketch values are
    * engine-specific, so no SQL oracle (driver rows-only check); the
    * ScalaTest spec bounds the estimate against the exact count. At
    * 100 TB this is THE distinct-count operator — fixed-size sketch,
    * mergeable, no expand.
    */
  val q19 = rowsOnly(
    "q19_approx_count_distinct",
    "approx_count_distinct (HLL++, rsd 0.05) next to the exact count") { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey"), 0.05).as("approx_custs"),
        countDistinct(col("o_custkey")).as("exact_custs"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  val all: Seq[GQuery] = Seq(q15, q16, q17, q18, q19)
}
