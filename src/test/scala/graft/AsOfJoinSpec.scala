package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin
import graft.sources.Tables

/** The custom AsOfJoinExec physical operator vs the window-composition
  * as-of (operators.Temporal.q56, itself oracle-proven against DuckDB's
  * native ASOF JOIN): three independent implementations of the same
  * semantics must agree row-for-row.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("custom AsOfJoinExec matches the oracle-proven window composition") {
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts_us").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts_us").as("c_ts"))

    val custom = AsOfJoin.asofJoin(purchases, clicks, "p_user", "p_ts", "c_user", "c_ts")
      .select(col("p_id"), col("p_user"), col("p_ts"), col("c_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val windowed = operators.Temporal.q56.run(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("gap_us"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(custom.nonEmpty)
    assert(custom.size === windowed.size,
      s"row counts differ: custom=${custom.size} windowed=${windowed.size}")
    custom.foreach { case (id, u, pts, cts) =>
      val (wu, wgap) = windowed(id)
      assert(u === wu)
      assert(pts - cts === wgap, s"gap mismatch for purchase $id")
    }
  }

  test("the physical plan contains AsOfJoinExec with injected sorts") {
    val ev = Tables.events(spark, sfDir).withColumn("ts_us", unix_micros(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts_us").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))
    val plan = AsOfJoin.asofJoin(p, c, "p_user", "p_ts", "c_user", "c_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"plan missing AsOfJoinExec:\n$plan")
    assert(plan.contains("Sort ["), s"EnsureRequirements should inject sorts:\n$plan")
  }
}
