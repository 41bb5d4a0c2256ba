package graft

import graft.sources.{LogStreamProvider, LogTable, SqlMerge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg-style HIDDEN PARTITIONING on the transaction-log table:
  * `PARTITIONED BY (days(ts), bucket(16, id), truncate(4, c))`
  * synthesizes hidden generated columns the user never writes or
  * sees; writes compute them and lay files out by them; plain
  * predicates on the SOURCE column skip files through derived
  * predicates on the hidden column (equality-only for buckets);
  * evolution onto a transform is one metadata commit with a
  * null-guard keeping old-epoch files prunable-but-never-lost. */
class LogHiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_hidpart").toString

  private def events(lo: Int, hi: Int) =
    (lo to hi).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-03-${(i % 5) + 1}%02d 0${i % 9}:15:00"), s"u${i % 7}")
    }.toDF("k", "ts", "user")

  test("days(ts): the hidden column is computed at write, laid out " +
    "hive-style, invisible on read, and a plain ts predicate SKIPS " +
    "files via the derived hidden predicate") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("ts", TimestampType), StructField("user", StringType))),
      partitionBy = Seq("days(ts)"))
    assert(t.partitionCols == Seq("ts_day"))
    assert(t.partitionTransforms == Map("ts_day" -> "days(ts)"))
    t.append(events(1, 40))
    // the user never provided ts_day, yet every file carries it as
    // its hive partition value
    assert(t.liveAdds().nonEmpty)
    assert(t.liveAdds().forall(_.partitionValues.keySet == Set("ts_day")))
    // reads hide it
    assert(t.load(spark).columns.toSeq == Seq("k", "ts", "user"))
    assert(t.userSchema.fieldNames.toSeq == Seq("k", "ts", "user"))
    assert(t.schema.fieldNames.contains("ts_day")) // layout contract
    assert(t.load(spark).count() == 40L)
    // a plain source-column predicate prunes files it provably
    // cannot touch — Iceberg's hidden-partitioning UX
    val r = t.delete(spark,
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-02 00:00:00")))
    assert(r.rowsAffected > 0L)
    assert(r.filesSkippedByStats > 0, s"expected hidden-partition skips: $r")
    val left = t.load(spark).select("ts").as[java.sql.Timestamp].collect()
    assert(left.forall(_.compareTo(
      java.sql.Timestamp.valueOf("2024-03-02 00:00:00")) >= 0))
  }

  test("bucket(8, k): equality predicates derive bucket skips; range " +
    "predicates do NOT derive (hash buckets are unordered) and stay " +
    "correct") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("v", StringType))), partitionBy = Seq("bucket(8,k)"))
    assert(t.partitionCols == Seq("k_bucket_8"))
    t.append((1L to 64L).map(i => (i, s"v$i")).toDF("k", "v"))
    val rEq = t.delete(spark, col("k") === 7L)
    assert(rEq.rowsAffected == 1L)
    assert(rEq.filesSkippedByStats > 0,
      s"bucket equality should skip sibling buckets: $rEq")
    val rRange = t.delete(spark, col("k") > 60L)
    assert(rRange.rowsAffected == 4L)
    assert(t.load(spark).count() == 64L - 5L)
    assert(t.load(spark).columns.toSeq == Seq("k", "v"))
  }

  test("truncate on strings and integers: monotonic width-truncation " +
    "derives range skips") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("code", StringType))),
      partitionBy = Seq("truncate(1,code)", "truncate(20,k)"))
    assert(t.partitionCols == Seq("code_trunc_1", "k_trunc_20"))
    t.append((1L to 80L).map(i =>
      (i, s"${('A' + (i % 4).toInt).toChar}${i}")).toDF("k", "code"))
    val r = t.delete(spark, col("k") <= 20L)
    assert(r.rowsAffected == 20L)
    assert(r.filesSkippedByStats > 0,
      s"numeric truncate should derive range skips: $r")
    val r2 = t.delete(spark, col("code") >= "D")
    assert(t.load(spark).select("code").as[String].collect()
      .forall(c => c < "D"))
    assert(t.load(spark).columns.toSeq == Seq("k", "code"))
  }

  test("EVOLUTION onto days(ts): one metadata commit; old-epoch " +
    "files (no hidden column) are never lost to derived skips; " +
    "OPTIMIZE migrates them with computed hidden values") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(events(1, 20)) // unpartitioned epoch, no hidden column
    val before = t.currentVersion.get
    t.setPartitionColumns(Seq("days(ts)"))
    assert(t.partitionTransforms == Map("ts_day" -> "days(ts)"))
    assert(t.commitOp(t.currentVersion.get) == "partition")
    t.append(events(21, 40)) // hive epoch with computed ts_day
    assert(t.liveAdds().map(_.partitionValues.keySet).toSet
      == Set(Set.empty[String], Set("ts_day")))
    assert(t.load(spark).count() == 40L)
    assert(t.load(spark).columns.toSeq == Seq("k", "ts", "user"))
    // the null-guard: old files carry NO ts_day values, so the
    // derived conjunct must decline there — the delete still finds
    // and removes their matching rows
    val cut = java.sql.Timestamp.valueOf("2024-03-02 00:00:00")
    val expected = t.load(spark).filter(col("ts") < cut).count()
    val r = t.delete(spark, col("ts") < cut)
    assert(r.rowsAffected == expected && expected > 0L)
    assert(t.load(spark).filter(col("ts") < cut).count() == 0L)
    // a rewrite heals: compaction writes every surviving row under
    // the new layout with a COMPUTED hidden value
    t.compactFiles(spark, smallBytes = Long.MaxValue)
    assert(t.liveAdds().forall(_.partitionValues.keySet == Set("ts_day")))
    // … so a later source predicate prunes even the migrated rows
    val r2 = t.delete(spark, col("ts") >=
      lit(java.sql.Timestamp.valueOf("2024-03-05 00:00:00")))
    assert(r2.filesSkippedByStats > 0)
    // time travel before the evolution serves the old layout
    assert(t.partitionColsAt(before).isEmpty)
    assert(t.load(spark, Some(before)).count() == 20L)
  }

  test("catalog SQL end-to-end: CREATE TABLE PARTITIONED BY " +
    "(days(ts), bucket(4, k)), INSERT, SELECT, DELETE, MERGE, " +
    "stream — the hidden columns never surface") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.ghid",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.ghid.warehouse", wh)
    try {
      spark.sql("CREATE TABLE ghid.ev (k BIGINT, ts TIMESTAMP, " +
        "user STRING) USING log PARTITIONED BY (days(ts), bucket(4, k))")
      val t = new LogTable(s"$wh/ev")
      assert(t.partitionCols == Seq("ts_day", "k_bucket_4"))
      events(1, 30).createOrReplaceTempView("ev_src")
      spark.sql("INSERT INTO ghid.ev SELECT k, ts, user FROM ev_src")
      assert(spark.table("ghid.ev").columns.toSeq
        == Seq("k", "ts", "user"))
      assert(spark.sql("SELECT * FROM ghid.ev").count() == 30L)
      // the staged INSERT was laid out hive-style with computed
      // hidden values
      assert(t.liveAdds().forall(
        _.partitionValues.keySet == Set("ts_day", "k_bucket_4")))
      spark.sql("DELETE FROM ghid.ev WHERE k <= 5")
      assert(spark.sql("SELECT COUNT(*) FROM ghid.ev").head.getLong(0)
        == 25L)
      // native MERGE recomputes layout columns for the rewrite
      spark.sql("MERGE INTO ghid.ev t USING ev_src s ON t.k = s.k " +
        "WHEN MATCHED AND s.k <= 10 THEN DELETE " +
        "WHEN NOT MATCHED THEN INSERT (k, ts, user) " +
        "VALUES (s.k, s.ts, s.user)")
      assert(spark.sql("SELECT COUNT(*) FROM ghid.ev").head.getLong(0)
        == 25L) // 5 deleted (6..10), 5 re-inserted (1..5)
      assert(t.liveAdds().forall(
        _.partitionValues.keySet == Set("ts_day", "k_bucket_4")))
      // DESCRIBE-level introspection shows the TRANSFORMS
      val parts = spark.sessionState.catalogManager.catalog("ghid")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array.empty, "ev")).partitioning().map(_.toString).toSeq
      assert(parts == Seq("days(ts)", "bucket(4, k)"), parts.toString)
      // stream tail: user columns only
      val q = spark.readStream
        .format(classOf[LogStreamProvider].getName)
        .option("path", s"$wh/ev").option("skipChangeCommits", "true")
        .load()
        .writeStream.format("memory").queryName("hid_stream")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      assert(spark.table("hid_stream").columns.toSeq
        == Seq("k", "ts", "user"))
      // evolution through the stored procedure
      spark.sql("CALL ghid.set_partition('ev', 'bucket(4,k)')")
      assert(t.partitionCols == Seq("k_bucket_4"))
      assert(t.partitionTransforms == Map("k_bucket_4" -> "bucket(4,k)"))
      assert(spark.sql("SELECT * FROM ghid.ev").columns.toSeq
        == Seq("k", "ts", "user"))
    } finally {
      spark.conf.unset("spark.sql.catalog.ghid")
      spark.conf.unset("spark.sql.catalog.ghid.warehouse")
    }
  }

  test("guards: unknown source, colliding hidden name, bad transform " +
    "shapes refuse; a bucket re-spec with a different modulus gets a " +
    "DIFFERENT hidden column (stale stats can never serve it)") {
    val t = new LogTable(s"${tmp()}/t")
    intercept[IllegalArgumentException] {
      t.create(StructType(Seq(StructField("k", LongType))),
        partitionBy = Seq("days(nope)"))
    }
    intercept[IllegalArgumentException] {
      t.create(StructType(Seq(StructField("k", LongType))),
        partitionBy = Seq("days(k)")) // non-time source
    }
    intercept[IllegalArgumentException] {
      t.create(StructType(Seq(StructField("k", LongType))),
        partitionBy = Seq("mod(7,k)")) // unsupported transform
    }
    val t2 = new LogTable(s"${tmp()}/t2")
    t2.create(StructType(Seq(StructField("k", LongType),
      StructField("v", StringType))), partitionBy = Seq("bucket(8,k)"))
    t2.append((1L to 8L).map(i => (i, s"v$i")).toDF("k", "v"))
    t2.setPartitionColumns(Seq("bucket(16,k)"))
    assert(t2.partitionCols == Seq("k_bucket_16"))
    assert(!t2.schema.fieldNames.contains("k_bucket_8"))
    t2.append((9L to 16L).map(i => (i, s"v$i")).toDF("k", "v"))
    assert(t2.load(spark).count() == 16L)
    assert(t2.load(spark).columns.toSeq == Seq("k", "v"))
    // the API-level merge also recomputes across the epochs
    Seq((3L, "vv")).toDF("k", "v").createOrReplaceTempView("hid_merge_src")
    val res = SqlMerge.mergeLog(spark,
      s"""MERGE INTO t USING hid_merge_src s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin, t2)
    assert(res.updated == 1L)
    assert(t2.load(spark).filter(col("k") === 3L)
      .select("v").as[String].head() == "vv")
  }
}
