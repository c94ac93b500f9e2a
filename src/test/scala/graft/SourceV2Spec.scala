package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SyntheticDocsScan, SyntheticDocsScanBuilder}

/** The `graft-docs` DataSource V2 connector (sources.SyntheticDocs):
  * unit contracts on the ScanBuilder (pushdown clamps the planned
  * interval, pruning narrows the generated schema, empty clamps plan
  * zero partitions) plus end-to-end reads through the registered short
  * name. q139 is the oracle-gated twin of these checks.
  */
class SourceV2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def scanOf(
      rows: Long, slices: Int,
      filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
      prune: Option[StructType] = None): SyntheticDocsScan = {
    val b = new SyntheticDocsScanBuilder(rows, slices)
    if (filters.nonEmpty) assert(b.pushFilters(filters.toArray).isEmpty,
      "range filters must be fully absorbed, no residual")
    prune.foreach(b.pruneColumns)
    b.build().asInstanceOf[SyntheticDocsScan]
  }

  test("doc_id range filters clamp the planned interval exactly") {
    val s = scanOf(1000L, 8,
      Seq(GreaterThanOrEqual("doc_id", 100L), LessThan("doc_id", 300L)))
    assert(s.lo == 100L && s.hi == 300L)
    val parts = s.planInputPartitions()
    assert(parts.length == 8)
    assert(s.estimateStatistics().numRows().getAsLong == 200L)
  }

  test("a fully-clamped scan plans ZERO partitions (source-level pruning)") {
    val s = scanOf(1000L, 8,
      Seq(GreaterThanOrEqual("doc_id", 500L), LessThan("doc_id", 500L)))
    assert(s.planInputPartitions().isEmpty)
  }

  test("column pruning reaches the generator schema") {
    val pruned = StructType(graft.sources.SyntheticDocs.fullSchema
      .filter(f => f.name == "doc_id" || f.name == "lang"))
    val s = scanOf(10L, 2, prune = Some(pruned))
    assert(s.readSchema().fieldNames.toSeq == Seq("doc_id", "lang"))
  }

  test("end-to-end read: deterministic rows, slices partition the range") {
    val df = spark.read.format("graft-docs")
      .option("rows", 100L).option("slices", 7).load()
    assert(df.rdd.getNumPartitions == 7)
    val row = df.filter(col("doc_id") === 13L)
      .select(col("lang"), col("n_chars"), col("text")).head()
    assert(row.getString(0) == "en")          // 13 % 10 = 3 -> en
    assert(row.getLong(1) == 50L + 13L * 37 % 200)
    assert(row.getString(2) == "doc-13-" + "x" * (13 % 7))
    assert(df.count() == 100L)
  }

  test("pushed range shows in the physical plan and prunes partitions") {
    val df = spark.read.format("graft-docs")
      .option("rows", 1000L).option("slices", 10).load()
      .filter(col("doc_id") >= 900L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-docs range=[900,1000)"), plan)
    assert(df.rdd.getNumPartitions == 10 || df.count() == 100L)
    assert(df.count() == 100L)
  }
}
