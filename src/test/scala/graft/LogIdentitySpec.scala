package graft

import graft.sources.{IdentitySpec, LogTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Identity columns (`GENERATED ALWAYS AS IDENTITY`) and column
  * DEFAULTs on the transaction-log table: distributed allocation
  * from a logged high-water mark (unique + per-append monotonic,
  * gappy like Delta), commit-time race detection with transparent
  * retry, DEFAULT fill for omitted columns, and the ALTER surface. */
class LogIdentitySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_logid").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("k", LongType),
    StructField("status", StringType)))

  private def freshTable(start: Long = 100L, step: Long = 2L): LogTable = {
    val t = new LogTable(s"${tmp()}/t")
    t.create(schema,
      identityColumns = Map("id" -> IdentitySpec(start, step)),
      columnDefaults = Map("status" -> "'new'"))
    t
  }

  test("appends allocate unique step-aligned ids from the start " +
    "value; a second append allocates strictly past the first; " +
    "omitted DEFAULT columns fill") {
    val t = freshTable()
    t.append(Seq(1L, 2L, 3L).toDF("k").repartition(2))
    val first = t.load(spark).select("id").as[Long].collect()
    assert(first.length == 3 && first.distinct.length == 3)
    assert(first.forall(id => id >= 100L && (id - 100L) % 2L == 0L))
    assert(t.identityColumns("id").highWater.contains(first.max))
    // DEFAULT filled on every row the frame omitted it for
    assert(t.load(spark).select("status").as[String].collect()
      .forall(_ == "new"))
    // an explicitly-provided non-identity column wins over DEFAULT
    t.append(Seq((4L, "old")).toDF("k", "status"))
    val second = t.load(spark).filter(col("k") === 4L)
      .select("id").as[Long].head()
    assert(second > first.max) // monotonic across appends
    assert(t.load(spark).filter(col("k") === 4L)
      .select("status").as[String].head() == "old")
    // all ids still unique
    val all = t.load(spark).select("id").as[Long].collect()
    assert(all.distinct.length == all.length)
  }

  test("explicit identity values refuse on append; UPDATE SET and " +
    "RENAME of the identity column refuse") {
    val t = freshTable()
    t.append(Seq(1L).toDF("k"))
    intercept[IllegalArgumentException] {
      t.append(Seq((999L, 2L)).toDF("id", "k"))
    }
    intercept[IllegalArgumentException] {
      t.update(spark, col("k") === 1L, Map("id" -> lit(0L)))
    }
    intercept[IllegalArgumentException] {
      t.updateMor(spark, col("k") === 1L, Map("id" -> lit(0L)))
    }
    // non-identity updates still work
    assert(t.update(spark, col("k") === 1L,
      Map("status" -> lit("seen"))).rowsAffected == 1L)
  }

  test("MERGE and DSv2 INSERT cannot mint or rewrite identity " +
    "values EXPLICITLY: UPDATE SET id refuses, INSERT with an id " +
    "value refuses, INSERT * refuses, SQL INSERT INTO refuses; " +
    "matched-only merges still work") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gidm",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gidm.warehouse", wh)
    try {
      val t = new LogTable(s"$wh/t")
      t.create(StructType(Seq(StructField("id", LongType),
        StructField("k", LongType), StructField("v", StringType))),
        identityColumns = Map("id" -> IdentitySpec(1L, 1L)))
      t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      Seq((1L, "x"), (9L, "y")).toDF("k", "v")
        .createOrReplaceTempView("idm_src")
      // assigning the identity column in a merge action refuses
      intercept[IllegalArgumentException] {
        graft.sources.SqlMerge.mergeLog(spark,
          """MERGE INTO gidm.t t USING idm_src s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET id = 0""", t)
      }
      // so does an INSERT that supplies the id explicitly…
      intercept[IllegalArgumentException] {
        graft.sources.SqlMerge.mergeLog(spark,
          """MERGE INTO gidm.t t USING idm_src s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT (id, k, v)
             VALUES (77, s.k, s.v)""", t)
      }
      // …and INSERT * (it assigns every target column, id included)
      Seq((77L, 9L, "y")).toDF("id", "k", "v")
        .createOrReplaceTempView("idm_src_star")
      intercept[IllegalArgumentException] {
        graft.sources.SqlMerge.mergeLog(spark,
          """MERGE INTO gidm.t t USING idm_src_star s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT *""", t)
      }
      // matched-only actions keep working, ids untouched
      val before = t.load(spark).select("id").as[Long].collect().sorted
      val r = graft.sources.SqlMerge.mergeLog(spark,
        """MERGE INTO gidm.t t USING idm_src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v""", t)
      assert(r.updated == 1L)
      assert(t.load(spark).select("id").as[Long].collect().sorted
        .toSeq == before.toSeq)
      // DSv2 INSERT (schema includes the identity column) refuses
      // up front instead of accepting unchecked ids
      val err = intercept[Exception] {
        spark.sql("INSERT INTO gidm.t VALUES (999, 3, 'c')")
      }
      assert(err.getMessage.contains("GENERATED ALWAYS"),
        s"unexpected: ${err.getMessage}")
      // …and a later append still allocates above the real high-water
      t.append(Seq((5L, "e")).toDF("k", "v"))
      val ids = t.load(spark).select("id").as[Long].collect()
      assert(ids.distinct.length == ids.length, "id collision")
    } finally {
      spark.conf.unset("spark.sql.catalog.gidm")
      spark.conf.unset("spark.sql.catalog.gidm.warehouse")
    }
  }

  test("MERGE INSERT that OMITS the identity column allocates from " +
    "the high-water mark: the surrogate-keyed dimension maintained " +
    "by MERGE (Delta's identity-in-merge); CDF serves the SAME ids " +
    "the table committed; later appends allocate past them") {
    val wh = tmp()
    val t = new LogTable(s"$wh/t")
    t.create(StructType(Seq(StructField("id", LongType),
      StructField("k", LongType), StructField("v", StringType))),
      identityColumns = Map("id" -> IdentitySpec(100L, 3L)))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val hw0 = t.identityColumns("id").highWater.get
    val idOfK1 = t.load(spark).filter(col("k") === 1L)
      .select("id").as[Long].head()
    Seq((1L, "a2"), (9L, "i9"), (10L, "i10")).toDF("k", "v")
      .createOrReplaceTempView("idalloc_src")
    val preCdf = t.currentVersion.get
    val r = graft.sources.SqlMerge.mergeLog(spark,
      """MERGE INTO t t USING idalloc_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""", t)
    assert(r.updated == 1L && r.inserted == 2L)
    val rows = t.load(spark).orderBy("k")
      .select("id", "k", "v").as[(Long, Long, String)].collect().toSeq
    val ids = rows.map(_._1)
    // unique, step-aligned, and the NEW ids all clear the old mark
    assert(ids.distinct.length == 4)
    assert(ids.forall(id => (id - 100L) % 3L == 0L), rows)
    val newIds = rows.filter(x => x._2 >= 9L).map(_._1)
    assert(newIds.forall(_ > hw0), s"allocated under the mark: $rows")
    // the high-water mark advanced to the max allocated id
    assert(t.identityColumns("id").highWater.contains(ids.max))
    // the change feed's insert rows carry the SAME ids the table has
    val cdfIns = t.changes(spark, preCdf, t.currentVersion.get)
      .filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq
    assert(cdfIns == newIds.sorted.toSeq, s"cdf $cdfIns vs $newIds")
    // a post-merge append allocates strictly past the merge's ids
    t.append(Seq((20L, "z")).toDF("k", "v"))
    val all = t.load(spark).select("id").as[Long].collect()
    assert(all.distinct.length == 5 && all.max > ids.max)
    // the matched-UPDATE row kept its original identity value
    assert(rows.find(_._2 == 1L).map(_._1).contains(idOfK1), rows)
  }

  test("a negative step descends from the start value") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(schema,
      identityColumns = Map("id" -> IdentitySpec(-10L, -5L)))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "status"))
    val ids = t.load(spark).select("id").as[Long].collect()
    assert(ids.forall(id => id <= -10L && (id + 10L) % 5L == 0L))
    assert(t.identityColumns("id").highWater.contains(ids.min))
    t.append(Seq((3L, "c")).toDF("k", "status"))
    val id3 = t.load(spark).filter(col("k") === 3L)
      .select("id").as[Long].head()
    assert(id3 < ids.min)
  }

  test("identity state replays through the log AND through a " +
    "checkpoint; the config rides create-time validation") {
    val t = freshTable()
    // enough commits to cross the checkpoint interval (10)
    (1 to 12).foreach(i => t.append(Seq(i.toLong).toDF("k")))
    val hw = t.identityColumns("id").highWater
    assert(hw.nonEmpty)
    val reread = new LogTable(t.path)
    assert(reread.identityColumns ==
      Map("id" -> IdentitySpec(100L, 2L, hw)))
    assert(reread.columnDefaults == Map("status" -> "'new'"))
    val ids = reread.load(spark).select("id").as[Long].collect()
    assert(ids.length == 12 && ids.distinct.length == 12)
    // invalid create-time specs refuse
    intercept[IllegalArgumentException] {
      new LogTable(s"${tmp()}/bad").create(schema,
        identityColumns = Map("status" -> IdentitySpec(1L, 1L)))
    }
    intercept[IllegalArgumentException] {
      new LogTable(s"${tmp()}/bad2").create(schema,
        identityColumns = Map("id" -> IdentitySpec(1L, 0L)))
    }
  }

  test("RACING appends from independent table handles never " +
    "allocate overlapping ids (commit-time basis check + retry)") {
    val dir = s"${tmp()}/t"
    new LogTable(dir).create(schema,
      identityColumns = Map("id" -> IdentitySpec(1L, 1L)))
    val perWriter = 6
    val writers = 3
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        val mine = new LogTable(dir) // separate handle, shared log
        (0 until perWriter).foreach { i =>
          mine.append(Seq((w * 1000L + i, s"w$w")).toDF("k", "status"))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val t = new LogTable(dir)
    val ids = t.load(spark).select("id").as[Long].collect()
    assert(ids.length == writers * perWriter,
      s"expected ${writers * perWriter} rows, got ${ids.length}")
    assert(ids.distinct.length == ids.length,
      "overlapping identity allocations: " +
        ids.groupBy(identity).filter(_._2.length > 1).keys.mkString(", "))
    assert(t.identityColumns("id").highWater.contains(ids.max))
  }

  test("SET DEFAULT applies to future appends only; DROP DEFAULT " +
    "restores the required-column rule; the commits are " +
    "metadata-only and streams skip them") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("status", StringType))))
    t.append(Seq((1L, "x")).toDF("k", "status"))
    // no default yet: omitting the column refuses
    intercept[IllegalArgumentException] { t.append(Seq(2L).toDF("k")) }
    val filesBefore = t.liveAdds().size
    t.setColumnDefault("status", "'filled'")
    assert(t.liveAdds().size == filesBefore) // metadata-only
    t.append(Seq(2L).toDF("k"))
    assert(t.load(spark).filter(col("k") === 2L)
      .select("status").as[String].head() == "filled")
    // existing rows untouched
    assert(t.load(spark).filter(col("k") === 1L)
      .select("status").as[String].head() == "x")
    t.dropColumnDefault("status")
    intercept[IllegalArgumentException] { t.append(Seq(3L).toDF("k")) }
    // guards: unknown column, double-policy
    intercept[IllegalArgumentException] {
      t.setColumnDefault("nope", "'x'")
    }
    // a streaming tail passes over the default commits silently
    val q = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", t.path).load()
      .writeStream.format("memory").queryName("id_default_tail")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("id_default_tail").count() == 2L)
  }

  test("SQL DDL surface: TBLPROPERTIES identity.<col>/default.<col> " +
    "configure the created table; CALL detail reports both") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gid", "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gid.warehouse", wh)
    try {
      // the DEFAULT expression is SQL text, so the property value is
      // a quoted string literal: '' escapes ' inside SQL strings
      spark.sql("CREATE TABLE gid.t (id BIGINT, k BIGINT, status STRING) " +
        "USING log TBLPROPERTIES ('identity.id' = 'start=500, step=5', " +
        "'default.status' = '''fresh''')")
      val t = new LogTable(s"$wh/t")
      assert(t.identityColumns == Map("id" -> IdentitySpec(500L, 5L)))
      assert(t.columnDefaults == Map("status" -> "'fresh'"))
      t.append(Seq(1L, 2L).toDF("k"))
      val rows = t.load(spark).select("id", "status")
        .as[(Long, String)].collect()
      assert(rows.forall { case (id, st) =>
        id >= 500L && (id - 500L) % 5L == 0L && st == "fresh" })
      val d = spark.sql("CALL gid.detail('t')").collect().head
      assert(d.getAs[String]("identity").contains("start=500 step=5"))
      assert(d.getAs[String]("defaults").contains("status: 'fresh'"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gid")
      spark.conf.unset("spark.sql.catalog.gid.warehouse")
    }
  }
}
