package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft` — a DataSource V2 catalog plugin exposing the synthetic
  * corpus as SQL-addressable tables, so the pure-SQL path needs no
  * `spark.read.format(...)` escape hatch at all:
  *
  * {{{
  *   spark.conf: spark.sql.catalog.graft = graft.sources.GraftCatalog
  *   SELECT count(*) FROM graft.docs_100000 WHERE doc_id >= 90000
  * }}}
  *
  * Table names are `docs_<rows>` (read-only; `slices` defaults to 8 —
  * create the table through the reader API when other options matter).
  * Every pushdown the connector implements (column pruning, doc_id
  * clamp, runtime filters, COMPLETE global aggregates, LIMIT) applies
  * unchanged: the catalog returns the same [[SyntheticDocsTable]] the
  * `graft-docs` format resolves to.
  */
final class GraftCatalog extends CatalogPlugin with TableCatalog {

  private var catalogName: String = "graft"
  private val cache = new ConcurrentHashMap[String, Table]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private val TableName = "docs_([0-9]+)".r

  private def inNamespace(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("default"))

  override def loadTable(ident: Identifier): Table = {
    if (!inNamespace(ident.namespace())) throw new NoSuchTableException(ident)
    ident.name() match {
      case TableName(n) =>
        cache.computeIfAbsent(ident.name(), _ =>
          new SyntheticDocsTable(rows = n.toLong, slices = 8, rowsPerBatch = 100L))
      case _ => throw new NoSuchTableException(ident)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    inNamespace(ident.namespace()) && TableName.pattern.matcher(ident.name()).matches()

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!inNamespace(namespace)) throw new NoSuchNamespaceException(namespace)
    Array(Identifier.of(namespace, "docs_1000")) // the advertised default size
  }

  private def readOnly: Nothing =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = readOnly
  override def alterTable(ident: Identifier, changes: TableChange*): Table = readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = readOnly
}
