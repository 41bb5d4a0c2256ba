package graft

import graft.sources.{GraftTableCatalog, LogTable, VersionedParquetSink}
import org.apache.spark.sql.functions._

/** The transaction-log table's SQL DML surface through the DSv2
  * catalog: INSERT INTO / INSERT OVERWRITE / DELETE FROM / CTAS /
  * time travel — the by-name read-write contract the reference's
  * users have on Delta tables. */
class Dsv2LogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private var n = 0
  private def freshCatalog(warehouse: String): String = {
    n += 1
    val cat = s"g2l_$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    cat
  }

  test("CREATE TABLE USING log + INSERT INTO appends; SELECT reads " +
    "the union; prior files carry by reference") {
    val wh = tmp("dsv2log")
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING log")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
    val log = new LogTable(s"$wh/t")
    val firstFiles = log.liveAdds().map(_.path).toSet
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(firstFiles.subsetOf(log.liveAdds().map(_.path).toSet))
    assert(log.commitOp(log.currentVersion.get) == "append")
  }

  test("INSERT OVERWRITE replaces the snapshot; the old version " +
    "stays time-travelable") {
    val wh = tmp("dsv2log")
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING log")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a')")
    spark.sql(s"INSERT OVERWRITE $cat.t VALUES (9, 'z')")
    assert(spark.sql(s"SELECT k, v FROM $cat.t")
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(spark.sql(s"SELECT k, v FROM $cat.t VERSION AS OF 1")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("DELETE FROM by name: stats-pruned file rewrite, null-safe " +
    "semantics") {
    val wh = tmp("dsv2log")
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING log")
    // two single-file commits with disjoint ranges
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.t VALUES (10, 'c'), (11, NULL)")
    val log = new LogTable(s"$wh/t")
    val lowFile = log.liveAdds().find(_.stats("k").max.contains(2L)).get.path
    spark.sql(s"DELETE FROM $cat.t WHERE k = 10")
    assert(spark.sql(s"SELECT k FROM $cat.t ORDER BY k")
      .as[Long].collect().toSeq == Seq(1L, 2L, 11L))
    // the low-range file was never rewritten
    assert(log.liveAdds().map(_.path).contains(lowFile))
    assert(log.commitOp(log.currentVersion.get) == "delete")
    // DELETE with a predicate that is NULL for the NULL row keeps it
    spark.sql(s"DELETE FROM $cat.t WHERE v = 'zzz'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head() == 3L)
  }

  test("CTAS: CREATE TABLE ... USING log AS SELECT lands the query " +
    "result as the first commits") {
    val wh = tmp("dsv2log")
    val cat = freshCatalog(wh)
    Seq((1L, "x"), (2L, "y")).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE $cat.c USING log AS SELECT * FROM ctas_src")
    assert(spark.sql(s"SELECT k, v FROM $cat.c ORDER BY k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "x"), (2L, "y")))
  }

  test("TIMESTAMP AS OF resolves log commit wall-clocks") {
    val wh = tmp("dsv2log")
    val ticks = Iterator(1000L, 2000L, 3000L)
    val log = new LogTable(s"$wh/t", () => ticks.next())
    log.append(Seq((1L, "a")).toDF("k", "v"))
    log.append(Seq((2L, "b")).toDF("k", "v"))
    log.delete(spark, col("k") === 1L)
    val cat = freshCatalog(wh)
    def at(millis: Long): Seq[Long] =
      spark.sql(s"SELECT k FROM $cat.t " +
          s"TIMESTAMP AS OF timestamp_micros(${millis * 1000}L) ORDER BY k")
        .as[Long].collect().toSeq
    assert(at(1500L) == Seq(1L))
    assert(at(2500L) == Seq(1L, 2L))
    assert(at(9999L) == Seq(2L))
  }

  test("log reads push filters and pruning into the parquet scan") {
    val wh = tmp("dsv2log")
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING log")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
    val plan = spark.sql(s"SELECT k FROM $cat.t WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(k)"),
      s"expected pushdown through the log-table scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<k:bigint>"),
      s"expected pruning to drop v:\n$plan")
  }

  test("SHOW TABLES lists sinks and log tables side by side; DROP " +
    "removes a log table") {
    val wh = tmp("dsv2log")
    val sink = new VersionedParquetSink(s"$wh/dim")
    sink.overwrite(Seq((1L, "a")).toDF("k", "v"))
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT) USING log")
    val listed = spark.sql(s"SHOW TABLES IN $cat").select("tableName")
      .as[String].collect().toSet
    assert(listed == Set("dim", "t"))
    spark.sql(s"DROP TABLE $cat.t")
    assert(spark.sql(s"SHOW TABLES IN $cat").count() == 1)
  }

  test("writes to a pinned historic version are rejected") {
    val wh = tmp("dsv2log")
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT) USING log")
    spark.sql(s"INSERT INTO $cat.t VALUES (1)")
    val err = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.t VERSION AS OF 0 VALUES (2)"))
    assert(err.getMessage.toLowerCase.contains("does not support")
      || err.getMessage.toLowerCase.contains("unsupported")
      || err.getMessage.toLowerCase.contains("parse"),
      s"unexpected: ${err.getMessage}")
  }
}
