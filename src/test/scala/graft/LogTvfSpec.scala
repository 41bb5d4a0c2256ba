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
}
