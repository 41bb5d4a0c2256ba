package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generated columns on the transaction-log table (Delta's
  * GENERATED ALWAYS AS): auto-filled on append, faithfulness-
  * enforced when provided, recomputed when an UPDATE touches a
  * source, and — the point — predicates on the SOURCE column derive
  * predicates on the generated one, so a table partitioned by
  * `event_date = CAST(ts AS DATE)` prunes files on plain `ts`
  * filters. */
class LogGeneratedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_loggen").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("event_date", DateType)))

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  private def mkTable(partitioned: Boolean): LogTable = {
    val t = new LogTable(s"${tmp()}/t")
    t.create(schema,
      partitionBy = if (partitioned) Seq("event_date") else Seq.empty,
      generatedAlwaysAs = Map("event_date" -> "CAST(ts AS DATE)"))
    t
  }

  test("appends omitting the generated column get it computed; " +
    "provided-but-wrong values refuse the commit") {
    val t = mkTable(partitioned = false)
    t.append(Seq((1L, ts("2024-03-01 10:00:00")),
      (2L, ts("2024-03-02 09:00:00"))).toDF("id", "ts"))
    val got = t.load(spark).select("id", "event_date")
      .as[(Long, java.sql.Date)].collect().toMap
    assert(got(1L).toString == "2024-03-01")
    assert(got(2L).toString == "2024-03-02")
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((3L, ts("2024-03-03 08:00:00"),
        java.sql.Date.valueOf("1999-01-01")))
        .toDF("id", "ts", "event_date"))
    }
    assert(e.getMessage.contains("generated column event_date"))
    assert(t.load(spark).count() == 2L)
    // provided-and-correct passes
    t.append(Seq((3L, ts("2024-03-03 08:00:00"),
      java.sql.Date.valueOf("2024-03-03"))).toDF("id", "ts", "event_date"))
    assert(t.load(spark).count() == 3L)
  }

  test("an UPDATE touching the source column recomputes the " +
    "generated one from the NEW value") {
    val t = mkTable(partitioned = false)
    t.append(Seq((1L, ts("2024-03-01 10:00:00"))).toDF("id", "ts"))
    t.update(spark, col("id") === 1L,
      Map("ts" -> lit(ts("2024-07-15 12:00:00"))))
    val row = t.load(spark).select("event_date").as[java.sql.Date].head()
    assert(row.toString == "2024-07-15")
    // merge-on-read update recomputes too
    t.updateMor(spark, col("id") === 1L,
      Map("ts" -> lit(ts("2024-09-01 00:30:00"))))
    assert(t.load(spark).select("event_date").as[java.sql.Date]
      .head().toString == "2024-09-01")
  }

  test("predicates on ts derive predicates on the generated " +
    "partition column and PRUNE files — the daily-partitioning UX") {
    // ts is deliberately OUTSIDE the stats columns (maxStatsCols=2
    // over schema [id, event_date, ts]), so any skipping here can
    // come ONLY from the derived event_date conjunct — the test
    // isolates the derivation, not ts min/max
    val t = new LogTable(s"${tmp()}/t", maxStatsCols = 2)
    t.create(StructType(Seq(
      StructField("id", LongType),
      StructField("event_date", DateType),
      StructField("ts", TimestampType))),
      generatedAlwaysAs = Map("event_date" -> "CAST(ts AS DATE)"))
    Seq("2024-03-01", "2024-03-02", "2024-03-03").zipWithIndex
      .foreach { case (d, i) =>
        t.append(Seq((i.toLong, ts(s"$d 12:00:00"))).toDF("id", "ts"))
      }
    // plain ts range delete: files of other days never scanned
    val r = t.delete(spark, col("ts") >= lit(ts("2024-03-03 00:00:00")))
    assert(r.rowsAffected == 1L)
    assert(r.filesSkippedByStats == 2, s"got $r")
    assert(r.filesScanned == 1)
    // equality derives equality
    val r2 = t.deleteMor(spark,
      col("ts") === lit(ts("2024-03-01 12:00:00")))
    assert(r2.rowsAffected == 1L && r2.filesSkippedByStats == 1, s"got $r2")
    assert(t.load(spark).select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("the generated config replays through checkpoints and fresh " +
    "instances") {
    val t = new LogTable(s"${tmp()}/t", checkpointInterval = 2)
    t.create(schema, generatedAlwaysAs =
      Map("event_date" -> "CAST(ts AS DATE)"))
    (0 until 4).foreach(i =>
      t.append(Seq((i.toLong, ts("2024-01-01 00:00:00"))).toDF("id", "ts")))
    val t2 = new LogTable(t.path)
    assert(t2.generatedCols == Map("event_date" -> "CAST(ts AS DATE)"))
    t2.append(Seq((9L, ts("2024-06-06 06:00:00"))).toDF("id", "ts"))
    assert(t2.load(spark).filter(col("id") === 9L)
      .select("event_date").as[java.sql.Date].head().toString ==
      "2024-06-06")
  }

  test("the SQL surface reaches all three features through " +
    "TBLPROPERTIES on CREATE TABLE ... USING log") {
    val dir = tmp()
    spark.conf.set("spark.sql.catalog.ggen",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.ggen.warehouse", dir)
    try {
      spark.sql("""CREATE TABLE ggen.t (
          id BIGINT, ts TIMESTAMP, event_date DATE) USING log
        PARTITIONED BY (event_date)
        TBLPROPERTIES (
          'bloom' = 'id',
          'check.id_pos' = 'id > 0',
          'generated.event_date' = 'CAST(ts AS DATE)')""")
      val t = new LogTable(s"$dir/t")
      assert(t.bloomCols == Seq("id"))
      assert(t.checkConstraints == Map("id_pos" -> "id > 0"))
      assert(t.generatedCols == Map("event_date" -> "CAST(ts AS DATE)"))
      assert(t.partitionCols == Seq("event_date"))
      // generated auto-fill + constraint enforcement live via the API
      t.append(Seq((5L, ts("2024-05-05 05:00:00"))).toDF("id", "ts"))
      intercept[IllegalArgumentException] {
        t.append(Seq((-1L, ts("2024-05-05 05:00:00"))).toDF("id", "ts"))
      }
      assert(spark.sql("SELECT event_date FROM ggen.t")
        .as[java.sql.Date].head().toString == "2024-05-05")
    } finally {
      spark.conf.unset("spark.sql.catalog.ggen")
      spark.conf.unset("spark.sql.catalog.ggen.warehouse")
    }
  }

  test("IN-lists on the source column derive IN on the generated " +
    "one; OPTIMIZE WHERE compacts only the predicate's files") {
    val t = new LogTable(s"${tmp()}/t", maxStatsCols = 2)
    t.create(StructType(Seq(
      StructField("id", LongType),
      StructField("event_date", DateType),
      StructField("ts", TimestampType))),
      generatedAlwaysAs = Map("event_date" -> "CAST(ts AS DATE)"))
    Seq("2024-03-01", "2024-03-02", "2024-03-03").zipWithIndex
      .foreach { case (d, i) =>
        t.append(Seq((i.toLong, ts(s"$d 12:00:00"))).toDF("id", "ts"))
      }
    // ts has no stats (maxStatsCols=2) — skipping proves derivation
    val r = t.deleteMor(spark, col("ts").isin(
      ts("2024-03-01 12:00:00"), ts("2024-03-02 12:00:00")))
    assert(r.rowsAffected == 2L && r.filesSkippedByStats == 1, s"got $r")
    // OPTIMIZE WHERE: a second day-3 file, then a ts-scoped compact
    // — the surviving out-of-scope file must carry forward untouched
    t.append(Seq((9L, ts("2024-03-03 13:00:00"))).toDF("id", "ts"))
    t.append(Seq((8L, ts("2024-02-01 08:00:00"))).toDF("id", "ts"))
    val feb = t.liveAdds().map(_.path).toSet
      .filter(_ => true) // snapshot before
    t.compactFiles(spark,
      where = Some(col("ts") >= lit(ts("2024-03-03 00:00:00"))))
    val after = t.liveAdds().map(_.path).toSet
    assert(t.load(spark).select("id").as[Long].collect().toSet ==
      Set(2L, 8L, 9L))
    // the two day-3 files merged into one; the Feb file untouched
    assert(t.commitOp(t.currentVersion.get) == "optimize")
    assert((feb -- after).size == 2) // exactly the two day-3 files
    assert((after -- feb).size == 1) // one compacted output
  }

  test("a session in a DIFFERENT timezone refuses generated-column " +
    "writes and declines derivation (shifted date boundaries would " +
    "be silently wrong / unsoundly pruned)") {
    val t = mkTable(partitioned = false)
    t.append(Seq((1L, ts("2024-03-01 23:30:00"))).toDF("id", "ts"))
    val orig = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    try {
      val e = intercept[IllegalArgumentException] {
        t.append(Seq((2L, ts("2024-03-02 01:00:00"))).toDF("id", "ts"))
      }
      assert(e.getMessage.contains("timezone"))
      // reads and data-free deletes still run CORRECTLY — the
      // derivation just declines, so the file is scanned instead of
      // (unsoundly) skipped; a copy-on-write rewrite would refuse
      // like any other write under the wrong zone
      assert(t.load(spark).count() == 1L)
      val r = t.deleteMor(spark,
        col("ts") === lit(ts("2024-03-01 23:30:00")))
      assert(r.rowsAffected == 1L && r.filesSkippedByStats == 0)
      assert(t.load(spark).count() == 0L)
    } finally spark.conf.set("spark.sql.session.timeZone", orig)
  }

  test("prefix-substring generation derives string-prefix pruning") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(Seq(
      StructField("url", StringType), StructField("host3", StringType))),
      generatedAlwaysAs = Map("host3" -> "substring(url, 1, 3)"))
    t.append(Seq(Tuple1("aaa-one"), Tuple1("aab-two")).toDF("url")
      .repartition(1))
    t.append(Seq(Tuple1("zzz-nine")).toDF("url").repartition(1))
    val r = t.delete(spark, col("url") === "zzz-nine")
    // min/max on url itself would also prune here; the point is the
    // derived host3 conjunct is sound and the op lands
    assert(r.rowsAffected == 1L)
    assert(t.load(spark).count() == 2L)
  }
}
