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
  * Window boundaries take VERSIONS (integers) or TIMESTAMPS
  * (timestamp/date literals, or timestamp strings in the session
  * zone) — Delta's dual form, round-10. Timestamp resolution rides
  * the in-commit monotonic clock, so it is EXACT: a start timestamp
  * resolves to the first commit at-or-after it (changes that
  * happened since that instant — inclusive-start semantics), an end
  * timestamp to the newest commit at-or-before it (`versionAt`, the
  * same rule `TIMESTAMP AS OF` uses), and an instant BETWEEN two
  * commits lands on the commit boundary a reader at that instant
  * would have seen. Pure-integer strings read as versions.
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
      "table_changes(table, start[, end]) - change data feed of a " +
        "log table over an inclusive window of versions (integers) " +
        "or timestamps (timestamp/date literals or strings)",
      "", "", "", "table_funcs", "", "", "built-in")
    reg.registerFunction(Name, info, (args: Seq[Expression]) =>
      build(SparkSession.active, args))
  }

  private def build(spark: SparkSession,
                    args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "table_changes takes (table, start[, end]) — versions or " +
        "timestamps")
    def lit(e: Expression, what: String): Any = {
      require(e.foldable, s"table_changes $what must be a literal")
      e.eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
    }
    val table = String.valueOf(lit(args.head, "table name"))
    val log = resolve(spark, table)
    // each boundary is a VERSION (integer, or pure-integer string)
    // or a TIMESTAMP (timestamp/date literal, or a timestamp string
    // cast in the session zone) → Right(version) | Left(millis)
    def boundary(e: Expression, what: String): Either[Long, Long] = {
      import org.apache.spark.sql.types._
      def asTs(expr: Expression): Long =
        LogTable.evalTimestampMillis(spark, expr).getOrElse(
          throw new IllegalArgumentException(
            s"table_changes $what: cannot read '${lit(e, what)}' as " +
              "a timestamp or version"))
      e.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Right(lit(e, what).asInstanceOf[Number].longValue())
        case StringType =>
          val s = String.valueOf(lit(e, what))
          if (s.matches("-?\\d+")) Right(s.toLong) else Left(asTs(e))
        case TimestampType | TimestampNTZType | DateType =>
          Left(asTs(e))
        case other => throw new IllegalArgumentException(
          s"table_changes $what must be a version (integer) or a " +
            s"timestamp, got ${other.simpleString}")
      }
    }
    val head = log.currentVersion.getOrElse(
      throw new IllegalStateException(s"no log table at ${log.path}"))
    val start = boundary(args(1), "start") match {
      case Right(v) => v
      // first commit AT or AFTER the instant — Delta's inclusive
      // startingTimestamp rule ("changes since this moment"),
      // shared with the stream source's same-named option
      case Left(ms) =>
        try log.versionFrom(ms)
        catch { case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"table_changes start timestamp is after the latest " +
              s"commit: ${e.getMessage}") }
    }
    val end = if (args.length < 3) head
    else boundary(args(2), "end") match {
      case Right(v) => v
      // newest commit at-or-before — the TIMESTAMP AS OF rule, made
      // exact by in-commit monotonic timestamps
      case Left(ms) => log.versionAt(ms)
    }
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
