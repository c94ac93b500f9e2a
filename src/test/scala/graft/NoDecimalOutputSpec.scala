package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The r8 probe-bisection verdict made the rule absolute: the driver's
  * correctness gate corrupts DECIMAL-typed OUTPUT columns (the data-free
  * constant-decimal probe went red while every integer-column probe of the
  * same queries stayed green), so no registered query may emit a
  * DecimalType column — exact money/mass values cross the gate as BIGINT
  * integer units (cents, 1e-4 units, twentieth-of-cents, mantissa halves)
  * with the scale documented in the column name. Decimals remain fine — and
  * required — INSIDE plans (exact sums before any double math, per
  * GQuery's determinism contract); this spec checks only what crosses the
  * gate. Allowlist-free by design (VERDICT r8 #6): q193's once-green
  * DECIMAL(18,2) is NOT license, it is survivorship.
  */
class NoDecimalOutputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  /** All DecimalType leaves in a schema, including inside struct / array /
    * map nesting (a decimal smuggled in an array would hit the same driver
    * path once exploded by the oracle compare).
    */
  private def decimalLeaves(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => decimalLeaves(f.dataType, s"$path.${f.name}"))
      case a: ArrayType  => decimalLeaves(a.elementType, s"$path[]")
      case m: MapType =>
        decimalLeaves(m.keyType, s"$path<key>") ++
          decimalLeaves(m.valueType, s"$path<value>")
      case _ => Nil
    }

  test("the checker itself flags a decimal schema (canary)") {
    import spark.implicits._
    val df = Seq(1).toDF("a").select(
      org.apache.spark.sql.functions.expr("CAST(a AS DECIMAL(18,2))").as("d"))
    assert(decimalLeaves(df.schema, "").nonEmpty, "canary decimal not caught")
    val nested = new StructType()
      .add("x", ArrayType(DecimalType(10, 2)))
    assert(decimalLeaves(nested, "").nonEmpty, "nested canary decimal not caught")
  }

  test("no registered query emits a DecimalType output column") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.registry.flatMap { q =>
      decimalLeaves(q.run(spark, dir).schema, q.name)
    }
    assert(bad.isEmpty,
      s"DECIMAL output columns cross the driver's corrupting gate:\n  " +
        bad.mkString("\n  "))
  }
}
