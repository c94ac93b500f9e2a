package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The RangeJoinBucketing optimizer rule: fires only under its width
  * conf, rewrites a pure range inner join to the bucket equi-join, and
  * returns EXACTLY the rows the un-rewritten join returns — including
  * boundary hits, empty intervals, and negative domains (trunc-division
  * monotonicity is what the soundness argument leans on).
  */
class RangeJoinRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  private val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private def fixture() = {
    import spark.implicits._
    // points include negatives and exact bounds; intervals include an
    // empty one (lo == hi) and a reversed one (hi < lo) that must emit
    // nothing rather than crash the sequence
    val points = Seq(-7L, -4L, -1L, 0L, 1L, 3L, 5L, 9L, 12L, 30L)
      .toDF("p").withColumn("pid", monotonically_increasing_id())
    val intervals = Seq(
      (1L, -5L, 2L), (2L, 0L, 1L), (3L, 3L, 9L), (4L, 9L, 10L),
      (5L, 7L, 7L), (6L, 8L, 4L), (7L, -10L, 40L))
      .toDF("iid", "lo", "hi")
    (points, intervals)
  }

  private def rangeJoin() = {
    val (points, intervals) = fixture()
    points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("iid"), col("p"))
  }

  test("rule off: plain range join is a nested-loop; rule on: bucket equi-join, same rows") {
    spark.conf.unset(WidthConf)
    val plain = rangeJoin()
    assert(plain.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val expected = plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    spark.conf.set(WidthConf, "4")
    try {
      val bucketed = rangeJoin()
      val opt = bucketed.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_bucket_p") && opt.contains("graft_bucket_i"),
        "rule did not fire\n" + opt)
      assert(!bucketed.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "bucketed join still planned as a nested loop")
      val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
      // sanity on the fixture: boundaries actually exercised
      assert(expected.contains((2L, 0L)) && !expected.contains((2L, 1L)),
        "half-open bounds not exercised")
      assert(expected.exists(_._2 < 0), "negative domain not exercised")
    } finally spark.conf.unset(WidthConf)
  }

  test("q163's fixture shape rewrites (orders intervals x lineitem probes)") {
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    spark.conf.set(WidthConf, "4")
    try {
      def days(c: org.apache.spark.sql.Column) =
        datediff(c.cast("date"), lit("1970-01-01")).cast("long")
      val iv = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), days(col("o_orderdate")).as("st_d"))
        .withColumn("en_d", col("st_d") + (col("o_orderkey") % 3 + 1))
      val pr = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") >= 49)
        .select(days(col("l_shipdate")).as("p_d"), col("l_quantity"))
      val joined = iv.join(pr,
        col("p_d") >= col("st_d") && col("p_d") < col("en_d"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_bucket_p"), "rule did not fire on q163's shape\n" + opt)
      assert(!joined.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset(WidthConf)
  }

  test("rule leaves equi-joins and multi-conjunct conditions alone") {
    val (points, intervals) = fixture()
    spark.conf.set(WidthConf, "4")
    try {
      val equi = points.join(intervals, col("p") === col("lo"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("graft_bucket_p"))
      val three = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi") && col("iid") =!= col("pid"))
      assert(!three.queryExecution.optimizedPlan.toString.contains("graft_bucket_p"))
    } finally spark.conf.unset(WidthConf)
  }
}
