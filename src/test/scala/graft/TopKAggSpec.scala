package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg.topKAgg

/** [[graft.functions.TopKAgg]] — the bounded native top-k aggregate
  * behind q210. Exact top-k over a (score desc, id asc) total order is
  * a merge-order-independent selection, so the aggregate must EQUAL
  * the window formulation on any input, under any partitioning —
  * including heavy score ties (resolved by id), groups smaller than
  * k, and null scores (skipped).
  */
class TopKAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(topKAgg(col("s"), col("id"), k).as("tk"))
      .filter(size(col("tk")) > 0) // q210's empty-sketch guard (ADVICE r8)
      .select(col("g"),
        expr("explode(sequence(0L, CAST(size(tk) AS BIGINT) div 2 - 1))").as("i"),
        col("tk"))
      .select(col("g"), (col("i") + 1).as("rn"),
        element_at(col("tk"), (col("i") * 2 + 1).cast("int")).as("s"),
        element_at(col("tk"), (col("i") * 2 + 2).cast("int")).as("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    df.filter(col("s").isNotNull)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("g"), col("rn"), col("s"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("aggregate top-k == window top-k on tie-heavy random data, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // few distinct scores → boundary ties everywhere; ids unique
    val rows = (1L to 2000L).map { id =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(8).toLong, id)
    }
    for (parts <- Seq(1, 4); k <- Seq(1, 3, 10)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("g", "s", "id")
      assert(viaAgg(df, k) === viaWindow(df, k), s"parts=$parts k=$k")
    }
  }

  test("groups smaller than k return all members; null scores skipped") {
    import spark.implicits._
    val df = Seq(("a", Some(5L), 1L), ("a", None, 2L), ("b", Some(1L), 3L))
      .toDF("g", "s", "id")
    assert(viaAgg(df, 10) === Set(("a", 1L, 5L, 1L), ("b", 1L, 1L, 3L)))
  }

  test("a group whose scores are ALL null yields no rows (empty-sketch guard)") {
    import spark.implicits._
    // without the size()>0 guard, sequence(0, -1) steps -1 and
    // element_at(tk, 0) throws 'SQL array indices start at 1' (ADVICE r8)
    val df = Seq(("a", Option.empty[Long], 1L), ("a", Option.empty[Long], 2L),
      ("b", Some(4L), 3L)).toDF("g", "s", "id")
    assert(viaAgg(df, 3) === Set(("b", 1L, 4L, 3L)))
  }
}
