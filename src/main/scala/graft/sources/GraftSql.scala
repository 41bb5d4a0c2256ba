package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.CatalogPlugin

/** SQL TABLE-VALUED FUNCTIONS over log tables — Delta's
  * `table_changes` surface: `SELECT * FROM table_changes('cat.t', 2,
  * 5)` serves the change data feed of the inclusive version window
  * as a DISTRIBUTED scan (the TVF builder returns the change-feed
  * DataFrame's logical plan — rows never collect to the driver, the
  * same plan the Scala `changes()` API produces). The table argument
  * is a `catalog.table` name (resolved through the session's
  * [[GraftTableCatalog]]) or a filesystem path; `end_version` may be
  * omitted to read through the current head.
  *
  * Registration is imperative and idempotent
  * ([[GraftSql.register]]): the table-function registry is
  * session-owned, so the call binds the TVF for every later query in
  * that session. [[GraftTableCatalog]] registers on instantiation —
  * any session that touches a graft catalog gets the TVF without a
  * separate setup call. */
object GraftSql {

  private val Name = FunctionIdentifier("table_changes")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    if (reg.functionExists(Name)) return
    val info = new ExpressionInfo(GraftSql.getClass.getCanonicalName,
      null, Name.funcName,
      "table_changes(table, start_version[, end_version]) - change " +
        "data feed of a log table over an inclusive version window",
      "", "", "", "table_funcs", "", "", "built-in")
    reg.registerFunction(Name, info, (args: Seq[Expression]) =>
      build(SparkSession.active, args))
  }

  private def build(spark: SparkSession,
                    args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "table_changes takes (table, start_version[, end_version])")
    def lit(e: Expression, what: String): Any = {
      require(e.foldable, s"table_changes $what must be a literal")
      e.eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
    }
    val table = String.valueOf(lit(args.head, "table name"))
    val start = lit(args(1), "start_version").asInstanceOf[Number]
      .longValue()
    val log = resolve(spark, table)
    val end = if (args.length == 3)
      lit(args(2), "end_version").asInstanceOf[Number].longValue()
    else log.currentVersion.getOrElse(
      throw new IllegalStateException(s"no log table at ${log.path}"))
    require(start >= 0 && end >= start,
      s"bad version window [$start, $end]")
    // inclusive window, Delta-style; changes() is exclusive-from
    log.changes(spark, start - 1, end).queryExecution.analyzed
  }

  /** `cat.t` through the session's catalog manager; anything with a
    * path separator reads as a filesystem path. */
  private def resolve(spark: SparkSession, table: String): LogTable =
    if (table.contains("/")) new LogTable(table)
    else table.split('.') match {
      // first part names the catalog; the rest is the (possibly
      // namespaced) table name the catalog's own parser handles
      case parts if parts.length >= 2 =>
        spark.sessionState.catalogManager.catalog(parts.head) match {
          case g: GraftTableCatalog =>
            g.logTableByName(parts.tail.mkString("."))
          case other: CatalogPlugin => throw new IllegalArgumentException(
            s"catalog '${other.name()}' is not a graft table catalog")
        }
      case _ => throw new IllegalArgumentException(
        s"table_changes target '$table' is neither a path nor " +
          "a catalog.table name")
    }
}
