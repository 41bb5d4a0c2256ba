package graft

import graft.sources.{GraftSql, GraftTableCatalog, LogTable}
import org.apache.spark.sql.functions._

/** The `table_changes` TABLE-VALUED FUNCTION — Delta's batch-CDF SQL
  * surface: `SELECT * FROM table_changes('cat.t', a[, b])` resolves
  * to the change feed's DISTRIBUTED plan (no driver collect),
  * inclusive version window, name- or path-addressed. */
class LogTvfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tvf").toString

  private def seeded(): (String, LogTable) = {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v0
    t.append(Seq((3L, "c")).toDF("k", "v"))            // v1
    t.delete(spark, col("k") === 2L)                   // v2
    (dir, t)
  }

  test("path form: inclusive window serves inserts and deletes; " +
    "2-arg form reads through the head") {
    GraftSql.register(spark)
    val (dir, _) = seeded()
    val all = spark.sql(
      s"SELECT k, v, _change_type, _commit_version " +
        s"FROM table_changes('$dir', 0) ORDER BY _commit_version, k")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(all == Seq((1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (3L, "c", "insert", 1L), (2L, "b", "delete", 2L)))
    // window [1, 2]: the seed commit excluded
    val win = spark.sql(
      s"SELECT k, _change_type FROM table_changes('$dir', 1, 2) " +
        "ORDER BY _change_type, k").as[(Long, String)].collect().toSeq
    assert(win == Seq((2L, "delete"), (3L, "insert")))
  }

  test("catalog.table form resolves through the graft catalog, which " +
    "auto-registers the TVF; the plan is a scan, not a local relation") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gtvf",
      classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtvf.warehouse", wh)
    val tn = s"t_${System.nanoTime}"
    spark.sql(s"CREATE TABLE gtvf.$tn (k BIGINT, v STRING) USING log")
    spark.sql(s"INSERT INTO gtvf.$tn VALUES (1, 'a'), (2, 'b')")
    val df = spark.sql(
      s"SELECT k, _change_type FROM table_changes('gtvf.$tn', 0)")
    assert(df.as[(Long, String)].collect().toSet ==
      Set((1L, "insert"), (2L, "insert")))
    // distributed contract: the feed comes off a file scan
    assert(df.queryExecution.executedPlan.toString.contains("Scan"),
      df.queryExecution.executedPlan.toString)
  }

  test("refusals: bad window, non-literal argument, unknown shape") {
    GraftSql.register(spark)
    val (dir, _) = seeded()
    intercept[Exception](
      spark.sql(s"SELECT * FROM table_changes('$dir', 3, 1)").collect())
    intercept[Exception](
      spark.sql(s"SELECT * FROM table_changes('$dir', k)").collect())
    intercept[Exception](
      spark.sql("SELECT * FROM table_changes('nopath', 0)").collect())
  }

  test("round-10 TIMESTAMP boundaries: start = first commit " +
    "at-or-after the instant, end = newest at-or-before (the " +
    "TIMESTAMP AS OF rule); a between-commits instant lands on the " +
    "boundary a reader then would have seen; string/date/version-" +
    "string forms all parse") {
    GraftSql.register(spark)
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v0
    Thread.sleep(40)
    t.append(Seq((3L, "c")).toDF("k", "v"))            // v1
    Thread.sleep(40)
    t.delete(spark, col("k") === 2L)                   // v2
    val Seq(ts0, ts1, ts2) = Seq(0L, 1L, 2L).map(t.commitTime)
    assert(ts0 < ts1 && ts1 < ts2) // real gaps for the between test
    def iso(ms: Long): String = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    // start at EXACTLY v1's instant (string form) → [v1, head]
    val fromTs1 = spark.sql(
      s"SELECT k, _change_type FROM table_changes('$dir', " +
        s"'${iso(ts1)}') ORDER BY _change_type, k")
      .as[(Long, String)].collect().toSeq
    assert(fromTs1 == Seq((2L, "delete"), (3L, "insert")), fromTs1)
    // end BETWEEN v1 and v2 (timestamp literal) → versions 0..1:
    // the snapshot boundary a reader at that instant saw
    val mid = ts1 + (ts2 - ts1) / 2
    val toMid = spark.sql(
      s"SELECT k FROM table_changes('$dir', 0, TIMESTAMP'${iso(mid)}') " +
        "ORDER BY k").as[Long].collect().toSeq
    assert(toMid == Seq(1L, 2L, 3L), toMid)
    // start BETWEEN v0 and v1 → first commit at-or-after = v1
    val fromMid0 = spark.sql(
      s"SELECT k, _change_type FROM table_changes('$dir', " +
        s"TIMESTAMP'${iso(ts0 + (ts1 - ts0) / 2)}') " +
        "ORDER BY _change_type, k").as[(Long, String)].collect().toSeq
    assert(fromMid0 == Seq((2L, "delete"), (3L, "insert")), fromMid0)
    // a DATE start far in the past admits the whole feed
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('$dir', DATE'2020-01-01')")
      .head.getLong(0) == 4L)
    // version-as-string still reads as a version
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('$dir', '1', '2')")
      .head.getLong(0) == 2L)
    // a start timestamp after the newest commit refuses loudly
    val err = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('$dir', TIMESTAMP'${iso(ts2 + 60000)}')")
      .collect())
    assert(err.getMessage.contains("after the latest commit"),
      err.getMessage)
  }
}
