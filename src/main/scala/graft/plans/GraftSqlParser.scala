package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-introspection SQL statements, injected via the one
  * `SparkSessionExtensions` hook the rest of the extension stack
  * (functions, optimizer rule, planner strategy, DSv2 catalog) doesn't
  * use: `injectParser`.
  *
  *   SHOW GRAFT QUERIES    -- (name, description, oracled) per registered query
  *   SHOW GRAFT FUNCTIONS  -- (name, usage) per native SQL function
  *   SHOW GRAFT ARTIFACTS  -- on-disk state of the parquet artifact tier
  *                            (dir, name, files, bytes, complete, locked,
  *                            modified_ms) — the lifecycle lens an operator
  *                            of a stable SPARK_GRAFT_ARTIFACT_DIR
  *                            deployment retires from ([[graft.Memo
  *                            .retireArtifact]]/[[graft.Memo.retireCorpus]];
  *                            retirement itself stays Scala-API-only
  *                            because a parse-time-executed statement must
  *                            be side-effect-free — EXPLAIN parses too)
  *
  * The parser is a pure delegator: the two statements above parse to
  * [[LocalRelation]]s built from the engine's own registries (static
  * metadata — a LocalRelation keeps them plannable, explainable, and
  * joinable like any other relation, with no command machinery); every
  * other string — plans, expressions, identifiers, schemas — goes
  * verbatim to the session's own parser, so the full Spark SQL surface
  * is untouched. This is the standard delegating-parser pattern used by
  * Delta/Iceberg for their SQL extensions, scoped to read-only
  * introspection. Interception is statement-level (subqueries parse in
  * the delegate's grammar); the result is an ordinary relation, so
  * `.createOrReplaceTempView` makes it joinable/filterable — how a
  * SQL-first reference user discovers the query surface without reading
  * Scala.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    sqlText.trim.stripSuffix(";").trim match {
      case ShowQueries()   => queriesRelation()
      case ShowFunctions() => functionsRelation()
      case ShowArtifacts() => artifactsRelation()
      case _               => delegate.parsePlan(sqlText)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  // anchored, case-insensitive, whitespace-tolerant statement shapes
  private val ShowQueries = "(?i)SHOW\\s+GRAFT\\s+QUERIES".r
  private val ShowFunctions = "(?i)SHOW\\s+GRAFT\\s+FUNCTIONS".r
  private val ShowArtifacts = "(?i)SHOW\\s+GRAFT\\s+ARTIFACTS".r

  private def str(name: String): Attribute =
    AttributeReference(name, StringType, nullable = false)()

  /** Registry access is deferred to parse time (not parser construction)
    * so injecting the parser never forces `SparkEntry`'s object graph
    * during session bootstrap.
    */
  private def queriesRelation(): LogicalPlan = {
    val out = Seq(str("name"), str("description"),
      AttributeReference("oracled", BooleanType, nullable = false)())
    val rows = graft.SparkEntry.registry.sortBy(_.name).map { q =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(q.name), UTF8String.fromString(q.doc),
        q.oracle.isDefined))
    }
    LocalRelation(out, rows)
  }

  /** The artifact tier's on-disk state as a relation — a parse-time
    * snapshot (like the other SHOWs), read through the active session's
    * Hadoop conf so the listing sees whatever filesystem
    * SPARK_GRAFT_ARTIFACT_DIR points at. Read-only: enumeration and
    * marker/lock existence checks, no job, no mutation.
    */
  private def artifactsRelation(): LogicalPlan = {
    val out = Seq(str("dir"), str("name"),
      AttributeReference("files", LongType, nullable = false)(),
      AttributeReference("bytes", LongType, nullable = false)(),
      AttributeReference("complete", BooleanType, nullable = false)(),
      AttributeReference("locked", BooleanType, nullable = false)(),
      AttributeReference("modified_ms", LongType, nullable = false)())
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val rows = graft.Memo.diskState(conf).map { r =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(r.dirSegment), UTF8String.fromString(r.name),
        r.files, r.bytes, r.complete, r.locked, r.modifiedMs))
    }
    LocalRelation(out, rows)
  }

  private def functionsRelation(): LogicalPlan = {
    val out = Seq(str("name"), str("usage"))
    val rows = GraftExtensions.descriptions.sortBy(_._1).map {
      case (name, info, _) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(name), UTF8String.fromString(info.getUsage)))
    }
    LocalRelation(out, rows)
  }
}
