package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the unit of the driver's correctness gate.
  *
  * `run` builds the DataFrame against the parquet tables in `sfDir`;
  * `oracle` is the equivalent ANSI SQL the driver executes in DuckDB over
  * the same tables (None => driver falls back to a rows-only check).
  *
  * Determinism contract (SURVEY.md §5): every query ends in an explicit
  * orderBy over a unique key, money aggregates go through exact DECIMAL
  * sums before any double math, and doubles in the output are rounded.
  */
final case class GQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GQuery {
  def oracled(name: String, doc: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, doc, fn, Some(sql))

  def rowsOnly(name: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, doc, fn, None)
}
