package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans.PrefixSum must agree bit-for-bit with the native window forms
  * it replaces (SUM ... OVER / ROW_NUMBER ... OVER partitioned on a
  * low-cardinality key), for any bucket count — the bucket-invariance
  * property is what lets callers scale buckets with the cluster.
  */
class PrefixSumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // deterministic fixture: 3 groups, skewed sizes, negative + duplicate
  // order-key values (ties broken by the unique id), one singleton group
  private def fixture = {
    val rows = (1 to 400).map { i =>
      val g = if (i % 7 == 0) "b" else "a"
      (g, (i * 37 % 23) - 11L, i.toLong, (i * 13 % 97).toLong)
    } :+ (("c", 5L, 1000L, 42L))
    rows.toDF("g", "ord", "id", "v")
  }

  test("withRunningTotal == SUM OVER (PARTITION BY g ORDER BY ord, id) at any bucket count") {
    val df = fixture
    val w = Window.partitionBy($"g").orderBy($"ord", $"id")
    val expected = df.withColumn("run", sum($"v").over(w))
      .select($"g", $"id", $"run").collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (b <- Seq(1, 3, 64)) {
      val got = plans.PrefixSum
        .withRunningTotal(df, "run", Seq("g"), "ord", "v", buckets = b,
          tiebreaks = Seq($"id"))
        .select($"g", $"id", $"run").collect()
      assert(got.length === expected.size, s"buckets=$b row count")
      got.foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        assert(r.getLong(2) === expected(k), s"buckets=$b key=$k")
      }
    }
  }

  test("withRowNumber == ROW_NUMBER OVER (PARTITION BY g ORDER BY ord, id)") {
    val df = fixture
    val w = Window.partitionBy($"g").orderBy($"ord", $"id")
    val expected = df.withColumn("rn", row_number().over(w))
      .select($"g", $"id", $"rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    val got = plans.PrefixSum
      .withRowNumber(df, "rn", Seq("g"), "ord", tiebreaks = Seq($"id"), buckets = 5)
      .select($"g", $"id", $"rn").collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(r.getLong(2) === expected(k), s"key=$k")
    }
  }

  test("name collision and missing group are rejected") {
    val df = fixture
    intercept[IllegalArgumentException] {
      plans.PrefixSum.withRunningTotal(df, "v", Seq("g"), "ord", "v")
    }
    intercept[IllegalArgumentException] {
      plans.PrefixSum.withRunningTotal(df, "run", Nil, "ord", "v")
    }
  }
}
