package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate on the q74 class of bug (VERDICT r6 #6): decimals derived from a
  * float's TEXTUAL form are engine-version-fragile — DuckDB versions
  * differ on float formatting, and Spark's own double→decimal cast
  * routes through `Double.toString` (shortest round-trip, ~17 digits),
  * which rounds any exact integer above 2^53. Two pins:
  *
  *  1. Lint: no `oracleSql` may cast the one float-typed fixture column
  *     (`embedding`, the only float in any fixture — asserted) to
  *     VARCHAR. Decimals must come from the float's VALUE (mantissa
  *     scaling, q74's hi/lo split), never its print form.
  *  2. Property: the hi/lo split encoding round-trips every fixture
  *     float exactly — ⌊v·2^31⌋·2^32 + (v·2^31−⌊v·2^31⌋)·2^32 == v·2^63
  *     with both halves < 2^33 (so every cast operand stays below 2^53,
  *     where double→integer conversion is value-exact on both engines).
  *     This is the integrality assumption (|v| ≳ 9e-13 or 0) the q74
  *     encoding rests on, re-checked against the actual fixture.
  */
class FloatReprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("lint: no oracleSql derives a decimal from float formatting") {
    // the only float-typed fixture column is `embedding`; any
    // CAST(embedding[...] AS VARCHAR) (any spacing) is the banned shape
    val banned = raw"(?is)CAST\s*\(\s*embedding\b[^)]*\bAS\s+VARCHAR".r
    val hits = SparkEntry.oracleSql.collect {
      case (name, sql) if banned.findFirstIn(sql).isDefined => name
    }
    assert(hits.isEmpty, s"float→VARCHAR cast in oracleSql of: $hits")
  }

  test("embedding is the only float-typed fixture column") {
    val tabs = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    // events goes through its nanos-aware reader (raw TIMESTAMP(NANOS)
    // parquet is unreadable by the vanilla scan)
    val floatCols = (tabs.map(t => t -> sources.Tables(spark, sfDir, t)) :+
      ("events" -> sources.Tables.events(spark, sfDir))).flatMap {
      case (t, df) => df.schema.fields.collect {
        case f if f.dataType.sql.toLowerCase.contains("float") => s"$t.${f.name}"
      }
    }
    assert(floatCols == Seq("embeddings.embedding"), floatCols.toString)
  }

  test("hi/lo mantissa split round-trips every fixture float exactly") {
    val d31 = col("v").cast("double") * lit(2147483648.0)
    val hi = floor(d31)
    val lo = ((d31 - hi.cast("double")) * lit(4294967296.0)).cast("long")
    val bad = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(explode(col("embedding")).as("v"))
      .select(col("v"), hi.as("hi"), lo.as("lo"))
      .filter(
        // halves must stay below 2^33 (cast-exact zone on both engines)
        abs(col("hi")) >= lit(1L << 33) || col("lo") < 0 ||
          col("lo") >= lit(1L << 32) ||
          // recombined integer / 2^63 must give back the float bit-exactly
          ((col("hi").cast("double") * lit(4294967296.0) +
            col("lo").cast("double")) / lit(9.223372036854776e18))
            .cast("float") =!= col("v"))
      .count()
    assert(bad == 0L)
  }
}
