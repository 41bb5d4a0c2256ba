package graft

import java.io.File

import graft.sources.LogTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only RENAME COLUMN via column mapping (parquet field
  * ids): files written before and after a rename resolve by id,
  * zero data moves, time travel serves each version under its own
  * names, DML and the change feed keep working, and unsound cases
  * (partition cols, constraint references, name reuse) refuse. */
class LogRenameSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_logren").toString

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def mapped(): LogTable = {
    val t = new LogTable(s"${tmp()}/t")
    t.create(schema, columnMapping = true)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    t
  }

  test("rename is metadata-only: same data files byte-identical, " +
    "old and new files read under the new name") {
    val t = mapped()
    val files = t.liveAdds().map(_.path)
    val mtimes = files.map(p =>
      p -> new File(t.path, p).lastModified()).toMap
    t.renameColumn(spark, "v", "val")
    t.append(Seq((3L, "c")).toDF("k", "val").repartition(1))
    assert(t.schema.fieldNames.toSeq == Seq("k", "val"))
    assert(t.load(spark).select("k", "val").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    files.foreach(p =>
      assert(new File(t.path, p).lastModified() == mtimes(p)))
    // pushdown on the renamed column over pre-rename files
    assert(t.load(spark).filter(col("val") === "a")
      .select("k").as[Long].head() == 1L)
  }

  test("time travel serves each version under ITS column names") {
    val t = mapped()
    t.renameColumn(spark, "v", "val")
    assert(t.schemaAt(1L).fieldNames.toSeq == Seq("k", "v"))
    assert(t.load(spark, Some(1L)).select("v").as[String]
      .collect().toSet == Set("a", "b"))
    assert(t.load(spark).select("val").as[String]
      .collect().toSet == Set("a", "b"))
  }

  test("DML keeps working across the rename; stats under the old " +
    "name stop pruning but never mis-prune") {
    val t = mapped()
    t.renameColumn(spark, "v", "val")
    val r = t.delete(spark, col("val") === "a")
    assert(r.rowsAffected == 1L)
    t.update(spark, col("k") === 2L, Map("val" -> lit("B")))
    assert(t.load(spark).select("k", "val").as[(Long, String)]
      .collect().toSet == Set((2L, "B")))
    // post-rename files carry stats under the new name and prune
    t.append(Seq((10L, "x")).toDF("k", "val").repartition(1))
    val r2 = t.delete(spark, col("k") === 999L)
    assert(r2.filesScanned == 0)
  }

  test("the change feed spanning a rename serves one consistent " +
    "column set (by id)") {
    val t = mapped() // v0 create, v1 append
    t.delete(spark, col("v") === "a") // v2: cdf under old name
    t.renameColumn(spark, "v", "val") // v3
    t.append(Seq((5L, "e")).toDF("k", "val")) // v4
    val feed = t.changes(spark, 1L, 4L)
    assert(feed.columns.contains("val") && !feed.columns.contains("v"))
    assert(feed.filter(col("_change_type") === "delete")
      .select("val").as[String].collect().toSeq == Seq("a"))
    assert(feed.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().toSet == Set(5L))
  }

  test("catalog SQL reads and DSv2 INSERT work on a mapped, " +
    "renamed table (TBLPROPERTIES columnMapping)") {
    val dir = tmp()
    spark.conf.set("spark.sql.catalog.gren",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gren.warehouse", dir)
    try {
      spark.sql("""CREATE TABLE gren.t (k BIGINT, v STRING) USING log
        TBLPROPERTIES ('columnMapping' = 'true')""")
      spark.sql("INSERT INTO gren.t VALUES (1, 'a'), (2, 'b')")
      val t = new LogTable(s"$dir/t")
      t.renameColumn(spark, "v", "val")
      spark.sql("INSERT INTO gren.t VALUES (3, 'c')")
      assert(spark.sql("SELECT k, val FROM gren.t WHERE val >= 'a'")
        .as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally {
      spark.conf.unset("spark.sql.catalog.gren")
      spark.conf.unset("spark.sql.catalog.gren.warehouse")
    }
  }

  test("bloom sidecars follow the rename and keep skipping") {
    val t = new LogTable(s"${tmp()}/t", bloomExpectedItems = 1000L)
    t.create(schema, bloomFilterBy = Seq("v"), columnMapping = true)
    t.append(Seq((1L, "aa"), (2L, "zz")).toDF("k", "v").repartition(1))
    t.append(Seq((3L, "ab"), (4L, "zy")).toDF("k", "v").repartition(1))
    t.renameColumn(spark, "v", "val")
    assert(t.bloomCols == Seq("val"))
    val r = t.delete(spark, col("val") === "absent")
    assert(r.filesScanned == 0 && r.filesSkippedByStats == 2)
    assert(t.delete(spark, col("val") === "zz").rowsAffected == 1L)
  }

  test("DROP COLUMN is metadata-only: files untouched, the name " +
    "retires, time travel still shows it, re-adding refuses") {
    val t = mapped()
    val files = t.liveAdds().map(_.path)
    val mtimes = files.map(p =>
      p -> new File(t.path, p).lastModified()).toMap
    t.dropColumn(spark, "v")
    assert(t.schema.fieldNames.toSeq == Seq("k"))
    assert(t.load(spark).columns.toSeq == Seq("k"))
    files.foreach(p =>
      assert(new File(t.path, p).lastModified() == mtimes(p)))
    // the dropped column is still visible at its own versions
    assert(t.load(spark, Some(1L)).select("v").as[String]
      .collect().toSet == Set("a", "b"))
    // narrower appends now conform; re-adding the name refuses
    t.append(Seq(Tuple1(9L)).toDF("k"))
    assert(t.load(spark).count() == 3L)
    intercept[IllegalArgumentException] {
      t.append(Seq((10L, "zz")).toDF("k", "v"), mergeSchema = true)
    }
  }

  test("unsound renames refuse: unmapped table, partition column, " +
    "constraint/generated references, retired-name reuse") {
    val plain = new LogTable(s"${tmp()}/t")
    plain.create(schema)
    intercept[IllegalArgumentException] {
      plain.renameColumn(spark, "v", "val")
    }
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(Seq(
      StructField("k", LongType), StructField("p", StringType),
      StructField("v", StringType))),
      partitionBy = Seq("p"),
      checkConstraints = Map("k_pos" -> "k > 0"),
      columnMapping = true)
    intercept[IllegalArgumentException] {
      t.renameColumn(spark, "p", "part") // partition column
    }
    intercept[IllegalArgumentException] {
      t.renameColumn(spark, "k", "key") // constraint references k
    }
    t.renameColumn(spark, "v", "val")
    intercept[IllegalArgumentException] {
      t.renameColumn(spark, "val", "v") // 'v' is retired
    }
    // a retired name cannot come back through schema evolution
    intercept[IllegalArgumentException] {
      t.append(Seq((1L, "x", "y", "z"))
        .toDF("k", "p", "val", "v"), mergeSchema = true)
    }
  }
}
