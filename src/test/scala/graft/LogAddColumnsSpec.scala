package graft

import graft.sources.{GraftTableCatalog, LogTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `ALTER TABLE ADD COLUMNS` as a metadata-only schema append (old
  * files read the new columns as NULL, zero rewrites), plus the
  * feature it unlocks: Spark's native `MERGE WITH SCHEMA EVOLUTION
  * INTO`, whose analyzer resolves source-only columns to AddColumn
  * changes and applies them through the catalog's alterTable before
  * planning the merge. */
class LogAddColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_addcol").toString

  test("addColumns is metadata-only: same files, old rows null-fill, " +
    "new appends carry values; time travel serves the old schema") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val preV = t.currentVersion.get
    val preFiles = t.load(spark).inputFiles.toSet
    t.addColumns(Seq(StructField("score", DoubleType),
      StructField("tag", StringType)))
    assert(t.load(spark).inputFiles.toSet == preFiles)
    assert(t.commitOp(t.currentVersion.get) == "add")
    assert(t.schema.fieldNames.toSeq == Seq("k", "v", "score", "tag"))
    t.append(Seq((2L, "b", 0.5, "x")).toDF("k", "v", "score", "tag"))
    assert(t.load(spark).orderBy("k")
      .as[(Long, String, Option[Double], Option[String])]
      .collect().toSeq ==
      Seq((1L, "a", None, None), (2L, "b", Some(0.5), Some("x"))))
    assert(t.load(spark, Some(preV)).schema.fieldNames.toSeq ==
      Seq("k", "v"))
    // refusals: duplicate, existing
    intercept[IllegalArgumentException](
      t.addColumns(Seq(StructField("k", LongType))))
    intercept[IllegalArgumentException](t.addColumns(
      Seq(StructField("z", LongType), StructField("z", LongType))))
  }

  test("a column-mapped table assigns fresh field ids to added " +
    "columns; a retired name refuses") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("v", StringType))), columnMapping = true)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.renameColumn(spark, "v", "w")
    intercept[IllegalArgumentException](
      t.addColumns(Seq(StructField("v", StringType))))
    t.addColumns(Seq(StructField("extra", LongType)))
    val f = t.schema("extra")
    assert(f.metadata.contains(LogTable.FieldIdKey))
    assert(f.metadata.getLong(LogTable.FieldIdKey) >
      t.schema("w").metadata.getLong(LogTable.FieldIdKey))
    t.append(Seq((2L, "b", 9L)).toDF("k", "w", "extra"))
    assert(t.load(spark).orderBy("k")
      .as[(Long, String, Option[Long])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "b", Some(9L))))
  }

  test("a column added AFTER a drop never reuses the dropped field " +
    "id — old files serve NULL, not the dropped column's bytes") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("c", StringType))),
      columnMapping = true)
    t.append(Seq((1L, "a", "SECRET")).toDF("k", "v", "c"))
    val droppedId = t.schema("c").metadata.getLong(LogTable.FieldIdKey)
    t.dropColumn(spark, "c")
    t.addColumns(Seq(StructField("d", StringType)))
    val newId = t.schema("d").metadata.getLong(LogTable.FieldIdKey)
    assert(newId > droppedId,
      s"field id $newId reuses dropped id $droppedId — readers " +
        "resolve by id and would resurrect the dropped bytes")
    // the old file must serve NULL for d, never 'SECRET'
    assert(t.load(spark).select("d").as[Option[String]]
      .collect().toSeq == Seq(None))
    // and a mergeSchema append assigns past the high water too
    t.append(Seq((2L, "b", 7L)).toDF("k", "v", "e"), mergeSchema = true)
    assert(t.schema("e").metadata.getLong(LogTable.FieldIdKey) > newId)
  }

  test("SQL ALTER TABLE ADD COLUMNS + MERGE WITH SCHEMA EVOLUTION: " +
    "the merge's source-only column evolves the target through the " +
    "catalog and lands its values") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gadd",
      classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gadd.warehouse", wh)
    val tn = s"t_${System.nanoTime}"
    spark.sql(s"CREATE TABLE gadd.$tn (k BIGINT, v STRING) USING log")
    spark.sql(s"INSERT INTO gadd.$tn VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE gadd.$tn ADD COLUMNS (note STRING)")
    assert(spark.sql(s"SELECT * FROM gadd.$tn").columns.toSeq ==
      Seq("k", "v", "note"))
    // schema evolution: src carries `score`, absent in the target —
    // the WITH SCHEMA EVOLUTION clause resolves it to an AddColumn
    // change through alterTable (star actions require source ⊇
    // target, Delta's rule too, so the assignments are explicit)
    Seq((2L, "B", 7.0), (3L, "c", 9.0)).toDF("k", "v", "score")
      .createOrReplaceTempView("gadd_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO gadd.$tn t
         |USING gadd_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v, score = s.score
         |WHEN NOT MATCHED THEN INSERT (k, v, score)
         |  VALUES (s.k, s.v, s.score)""".stripMargin)
    val out = spark.sql(
      s"SELECT k, v, note, score FROM gadd.$tn ORDER BY k")
      .as[(Long, String, Option[String], Option[Double])]
      .collect().toSeq
    assert(out == Seq((1L, "a", None, None), (2L, "B", None, Some(7.0)),
      (3L, "c", None, Some(9.0))))
    // the evolution rode a metadata-only "add" commit
    val log = new LogTable(s"$wh/$tn")
    assert(log.versions.map(log.commitOp).contains("add"))
    // without the clause, an extra source column refuses instead of
    // silently evolving
    Seq((4L, "d", 1.0)).toDF("k", "v", "s2")
      .createOrReplaceTempView("gadd_src2")
    intercept[Exception](spark.sql(
      s"""MERGE INTO gadd.$tn t USING gadd_src2 s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT (k, v, s2)
         |  VALUES (s.k, s.v, s.s2)""".stripMargin))
  }

  test("streams skip the add commit; post-add appends serve the " +
    "started-stream's schema with the old columns only") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.addColumns(Seq(StructField("x", LongType)))
    t.append(Seq((2L, "b", 5L)).toDF("k", "v", "x"))
    val q = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", t.path).load()
      .writeStream.format("memory").queryName("addcol_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("addcol_stream").orderBy("k")
      .as[(Long, String, Option[Long])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "b", Some(5L))))
  }

  test("a mixed ALTER pre-validates EVERY change before applying " +
    "any: a failing ADD leaves a preceding valid widen uncommitted " +
    "(r9 advice: no half-altered tables)") {
    import org.apache.spark.sql.connector.catalog.{Identifier,
      TableCatalog, TableChange}
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.galterpre",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.galterpre.warehouse", wh)
    try {
      val tn = s"t_${System.nanoTime}"
      spark.sql(s"CREATE TABLE galterpre.$tn (k INT, v STRING) USING log")
      spark.sql(s"INSERT INTO galterpre.$tn VALUES (1, 'a')")
      val cat = spark.sessionState.catalogManager.catalog("galterpre")
        .asInstanceOf[TableCatalog]
      val ident = Identifier.of(Array.empty[String], tn)
      val vBefore = new LogTable(s"$wh/$tn").currentVersion.get
      // valid widen + duplicate-name add in ONE change set
      intercept[Exception] {
        cat.alterTable(ident,
          TableChange.updateColumnType(Array("k"), LongType),
          TableChange.addColumn(Array("v"), StringType))
      }
      val t = new LogTable(s"$wh/$tn")
      // NOTHING committed: the widen did not apply, no new version
      assert(t.currentVersion.get == vBefore)
      assert(t.schema("k").dataType == IntegerType)
      // the reverse order fails identically (order-independent)
      intercept[Exception] {
        cat.alterTable(ident,
          TableChange.addColumn(Array("w"), IntegerType),
          TableChange.updateColumnType(Array("v"), LongType)) // lossy
      }
      assert(t.currentVersion.get == vBefore)
      assert(!t.schema.fieldNames.contains("w"))
      // and the same mixed set with BOTH valid applies both
      cat.alterTable(ident,
        TableChange.updateColumnType(Array("k"), LongType),
        TableChange.addColumn(Array("w"), IntegerType))
      assert(t.schema("k").dataType == LongType)
      assert(t.schema.fieldNames.contains("w"))
    } finally {
      spark.conf.unset("spark.sql.catalog.galterpre")
      spark.conf.unset("spark.sql.catalog.galterpre.warehouse")
    }
  }
}
