package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.oracled
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** The relational operator surface (SURVEY.md §2.1 S1-S5/P1-P4/A1-A7/J1-J2
  * + §2.2 gaps), each operator exercised by a named, DuckDB-oracle-checked
  * query over the fixture star schema.
  *
  * Scale posture: every aggregation is a single hash-aggregate shuffle with
  * map-side partial aggregation (the reference's count+sum+join triple,
  * SVDMovieLensSparkJava.java:196-212, collapses into one `groupBy.agg`);
  * dimension joins broadcast; nothing ever collects to the driver.
  */
object Relational {

  /** q01 — pricing summary (A1+A2+A5 lineage). Descendant of the
    * reference's per-key count/sum stats (SVDMovieLensSparkJava.java:196-212)
    * over the measure-bearing fixture table. Exact decimal sums, one
    * shuffle, partial agg map-side.
    */
  val q01 = oracled(
    "q01_pricing_summary",
    "groupBy multi-aggregate with exact decimal sums + derived averages",
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
       COUNT(*) AS count_order
       FROM lineitem
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("sum_disc_price"),
        round(sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val all: Seq[GQuery] = Seq(q01)
}
