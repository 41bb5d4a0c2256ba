package graft.sources

import org.apache.spark.sql.{DataFrame, GraftStreamShim, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming source over a [[LogTable]] — the "stream
  * from a Delta table" surface (Delta's own streaming source is this
  * exact v1 `Source` shape): offsets are log VERSIONS, each
  * micro-batch is the set of files added by the commits in
  * `(startVersion, endVersion]`, read through Spark's ordinary
  * parquet scan. Because appends commit only their delta, a
  * subscriber tails a 100 TB table at the cost of its arrival rate.
  *
  * {{{
  * spark.readStream.format("graft-log").option("path", dir).load()
  * }}}
  *
  * Non-append commits follow Delta's rules: `optimize` commits are
  * skipped silently (pure data reorganization — no row-level change,
  * Delta's `dataChange = false`); row-level `delete` / `update` /
  * `overwrite` / `restore` commits FAIL the stream by default — a
  * version-offset stream cannot retract rows — unless
  * `.option("skipChangeCommits", "true")` opts into Delta's
  * same-named semantics (change commits are passed over entirely;
  * only subsequent appends flow). Restart recovery is the engine's:
  * committed offsets replay exactly, because a version's file list
  * is immutable. */
final class LogStreamProvider extends StreamSourceProvider
  with DataSourceRegister {

  override def shortName(): String = "graft-log"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(throw new IllegalArgumentException(
        "graft-log stream needs .option(\"path\", <table dir>)"))

  override def sourceSchema(ctx: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]):
      (String, StructType) =
    (shortName(), new LogTable(pathOf(parameters)).schema)

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val skipChanges = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("skipChangeCommits") =>
        v.toBoolean }
      .getOrElse(false)
    new LogStreamSource(ctx, new LogTable(pathOf(parameters)), skipChanges)
  }
}

private[sources] final class LogStreamSource(ctx: SQLContext, log: LogTable,
                                             skipChangeCommits: Boolean)
  extends Source {

  override val schema: StructType = log.schema

  private def ver(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(
      s"unexpected offset type: $other")
  }

  override def getOffset: Option[Offset] =
    log.currentVersion.map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(-1L)
    val to = ver(end)
    val files = log.versions.filter(v => v > from && v <= to).flatMap { v =>
      val op = log.commitOp(v)
      val adds = log.addedPaths(v)
      op match {
        case "append" | "create" => adds
        case "optimize"          => Seq.empty // dataChange = false
        case changeOp =>
          if (!skipChangeCommits) throw new IllegalStateException(
            s"commit $v is a '$changeOp' — a streaming read of a log " +
              "table requires append-only commits; set " +
              ".option(\"skipChangeCommits\", \"true\") to pass over " +
              "change commits and stream only subsequent appends")
          Seq.empty
      }
    }
    val spark = ctx.sparkSession
    val batch =
      if (files.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      else spark.read.schema(schema)
        .parquet(files.map(p => s"${log.path}/$p"): _*)
    GraftStreamShim.streamingFrame(batch)
  }

  override def stop(): Unit = ()
}
