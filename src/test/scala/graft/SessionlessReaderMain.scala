package graft

/** Child-JVM helper for the session-less checkpoint-read spec: opens
  * a [[graft.sources.LogTable]] WITHOUT ever creating a SparkSession
  * (none exists in this JVM) and dumps the live file-state — path,
  * rows, bytes, dv — to the given output file. Proves the
  * parquet-checkpoint fallback ([[graft.sources.LogTable.readAddsParquetLocal]])
  * serves a bare maintenance CLI even after the raw commits below
  * the checkpoint were expired. */
object SessionlessReaderMain {
  def main(args: Array[String]): Unit = {
    val Array(table, out) = args
    if (org.apache.spark.sql.SparkSession.getActiveSession.isDefined ||
        org.apache.spark.sql.SparkSession.getDefaultSession.isDefined)
      sys.error("this main must run session-less")
    val t = new graft.sources.LogTable(table)
    val lines = t.liveAdds().sortBy(_.path).map { a =>
      s"${a.path}|${a.rows}|${a.bytes}|${a.dv.map(_.path).getOrElse("-")}"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      lines.mkString("\n").getBytes("UTF-8"))
    ()
  }
}
