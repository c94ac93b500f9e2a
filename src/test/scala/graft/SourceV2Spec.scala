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

  test("runtime V2 filters clamp partitions after planning (DPP analog)") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    val s = scanOf(1000L, 8)
    assert(s.planInputPartitions().length == 8)
    // a dynamic IN filter arriving from a joined dimension: only ids
    // 640..650 survive -> the runtime clamp re-plans to the tiny range
    val in = new Predicate("IN",
      Array(Expressions.column("doc_id"),
        Expressions.literal(java.lang.Long.valueOf(640L)),
        Expressions.literal(java.lang.Long.valueOf(650L))))
    s.filter(Array(in))
    val parts = s.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.SyntheticDocsRange])
    assert(parts.head.start == 640L && parts.last.end == 651L,
      parts.mkString(","))
    // an unrecognized predicate must be a no-op, not a failure
    s.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty)))
    assert(parts.nonEmpty)
  }

  test("micro-batch stream drains the id space in rowsPerBatch chunks == batch read") {
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.format("graft-docs")
      .option("rows", 100L).option("slices", 4).option("rowsPerBatch", 30L)
      .load()
      .writeStream.format("memory").queryName("docs_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000L)
    val streamed = spark.table("docs_stream")
    val batch = spark.read.format("graft-docs").option("rows", 100L).load()
    assert(streamed.count() == 100L)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // 100 rows at <=30/batch => 4 non-empty micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) == 4, q.recentProgress.map(_.numInputRows).mkString(","))
    q.stop()
  }

  test("streaming offsets honor the pushed doc_id clamp") {
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.format("graft-docs")
      .option("rows", 1000L).option("rowsPerBatch", 500L)
      .load()
      .filter(col("doc_id") >= 990L)
      .writeStream.format("memory").queryName("docs_stream_clamped")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000L)
    val got = spark.table("docs_stream_clamped")
    assert(got.count() == 10L)
    assert(got.agg(min(col("doc_id"))).head().getLong(0) == 990L)
    q.stop()
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

  test("global count/min/max push COMPLETELY into the scan (no aggregate operator)") {
    val df = spark.read.format("graft-docs")
      .option("rows", 1000L).option("slices", 10).load()
      .filter(col("doc_id") >= 100L && col("doc_id") < 600L)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((500L, 100L, 599L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-docs agg range=[100,600)"),
      "scan did not take the aggregation\n" + plan)
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      "complete pushdown must remove Spark's aggregate operator\n" + plan)
  }

  test("aggregate pushdown answers the empty interval with count=0, null min/max") {
    val df = spark.read.format("graft-docs")
      .option("rows", 1000L).load()
      .filter(col("doc_id") >= 600L && col("doc_id") < 600L)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"))
    val r = df.head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1), "MIN over zero rows must be NULL")
  }

  test("grouped aggregation does NOT push down (generator only answers global)") {
    val df = spark.read.format("graft-docs")
      .option("rows", 100L).load()
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), "grouped agg must stay in Spark\n" + plan)
    assert(df.collect().map(_.getLong(1)).sum === 100L)
  }

  test("graft catalog resolves docs_<rows> tables for pure SQL, pushdowns intact") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    val n = spark.sql(
      "SELECT count(*) FROM graft.docs_500 WHERE doc_id >= 100").head().getLong(0)
    assert(n === 400L)
    // the catalog path reaches the same scan: complete agg pushdown fires
    val df = spark.sql(
      "SELECT count(*) AS n, min(doc_id) AS lo FROM graft.docs_500 WHERE doc_id >= 100")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-docs agg range=[100,500)"), plan)
    intercept[Exception] { spark.sql("SELECT 1 FROM graft.nope").collect() }
  }

  test("LIMIT clamps the generated interval at the source") {
    val df = spark.read.format("graft-docs")
      .option("rows", 100000L).option("slices", 10).load()
      .limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-docs range=[0,7)"),
      "limit did not clamp the generator\n" + plan)
    assert(df.count() === 7L)
    // limit composes with a pushed filter: clamp starts at the filtered lo
    val df2 = spark.read.format("graft-docs")
      .option("rows", 100000L).load()
      .filter(col("doc_id") >= 50000L).limit(5)
    assert(df2.queryExecution.executedPlan.toString
      .contains("graft-docs range=[50000,50005)"))
    assert(df2.select(min(col("doc_id")), max(col("doc_id"))).head() ===
      org.apache.spark.sql.Row(50000L, 50004L))
  }
}
