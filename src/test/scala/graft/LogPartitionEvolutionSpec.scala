package graft

import graft.sources.{LogStreamProvider, LogTable}
import org.apache.spark.sql.functions._

/** Iceberg-style partition evolution on the transaction-log table:
  * one metadata-only commit changes the hive layout for FUTURE
  * writes; old files keep their epoch's layout and stay fully
  * readable (values from their dirs), snapshot reads union the
  * layout groups, row-level DML spans epochs and rewrites into the
  * new layout, OPTIMIZE migrates stragglers, time travel serves each
  * version under ITS layout, and streams skip the evolve commit. */
class LogPartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_pevo").toString

  private def rows(lo: Long, hi: Long): org.apache.spark.sql.DataFrame =
    (lo to hi).map(i => (i, s"s${i % 3}", i * 10.0))
      .toDF("k", "seg", "bal")

  test("unpartitioned → partitioned: one metadata commit, old files " +
    "keep their layout, reads union epochs, new appends stage " +
    "hive-style") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(rows(1, 6))
    val v = t.setPartitionColumns(Seq("seg"))
    assert(t.commitOp(v) == "partition")
    assert(t.partitionCols == Seq("seg"))
    // partition column normalized to the schema tail (create's rule)
    assert(t.schema.fieldNames.toSeq == Seq("k", "bal", "seg"))
    // metadata-only: no files added/removed by the evolve
    assert(t.liveAdds().forall(_.partitionValues.isEmpty))
    t.append(rows(7, 12))
    // new files carry partition values, old files none
    val sigs = t.liveAdds().map(_.partitionValues.keySet).toSet
    assert(sigs == Set(Set.empty[String], Set("seg")))
    val got = t.load(spark).select("k", "seg", "bal")
      .as[(Long, String, Double)].collect().toSeq.sorted
    assert(got == (1L to 12L).map(i => (i, s"s${i % 3}", i * 10.0)))
  }

  test("row-level DELETE spans epochs and rewrites into the NEW " +
    "layout; OPTIMIZE migrates the remaining old-layout files") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(rows(1, 6))
    t.setPartitionColumns(Seq("seg"))
    t.append(rows(7, 12))
    t.delete(spark, col("k") % 2L === 0L)
    val got = t.load(spark).select("k").as[Long].collect().toSeq.sorted
    assert(got == (1L to 12L).filter(_ % 2 == 1))
    t.compactFiles(spark, smallBytes = Long.MaxValue)
    // every live file now carries the new layout
    assert(t.liveAdds().forall(_.partitionValues.keySet == Set("seg")))
    assert(t.load(spark).select("k").as[Long].collect().toSeq.sorted
      == (1L to 12L).filter(_ % 2 == 1))
  }

  test("partitioned → unpartitioned and → a different column; time " +
    "travel serves each version under its own layout") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bal",
        org.apache.spark.sql.types.DoubleType))),
      partitionBy = Seq("seg"))
    t.append(rows(1, 6))
    val vPartitioned = t.currentVersion.get
    t.setPartitionColumns(Seq.empty)
    assert(t.partitionCols.isEmpty)
    t.append(rows(7, 9))
    val afterUnpart = t.load(spark).select("k").as[Long].collect().toSeq
    assert(afterUnpart.sorted == (1L to 9L))
    // pinned read BEFORE the evolve: old layout, old rows
    assert(t.load(spark, Some(vPartitioned)).select("k").as[Long]
      .collect().toSeq.sorted == (1L to 6L))
    assert(t.partitionColsAt(vPartitioned) == Seq("seg"))
    // evolve again, to a different column — three epochs coexist
    t.setPartitionColumns(Seq("k"))
    t.append(rows(10, 12))
    assert(t.load(spark).select("k").as[Long].collect().toSeq.sorted
      == (1L to 12L))
    assert(t.liveAdds().map(_.partitionValues.keySet).toSet
      == Set(Set("seg"), Set.empty[String], Set("k")))
  }

  test("catalog SQL reads a mixed-layout snapshot (V1 bridge) and " +
    "prunes partition predicates via the stats layer") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gpevo",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gpevo.warehouse", wh)
    try {
      val t = new LogTable(s"$wh/t")
      t.append(rows(1, 6))
      t.setPartitionColumns(Seq("seg"))
      t.append(rows(7, 12))
      val got = spark.sql(
        "SELECT k FROM gpevo.t WHERE seg = 's0' ORDER BY k")
        .as[Long].collect().toSeq
      assert(got == (1L to 12L).filter(_ % 3 == 0))
    } finally {
      spark.conf.unset("spark.sql.catalog.gpevo")
      spark.conf.unset("spark.sql.catalog.gpevo.warehouse")
    }
  }

  test("streams skip the evolve commit; identity/unknown columns " +
    "refuse; evolving to the current layout refuses") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(rows(1, 3))
    t.setPartitionColumns(Seq("seg"))
    t.append(rows(4, 6))
    val q = spark.readStream
      .format(classOf[LogStreamProvider].getName)
      .option("path", dir).load()
      .writeStream.format("memory").queryName("pevo_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("pevo_stream").count() == 6L)
    intercept[IllegalArgumentException] {
      t.setPartitionColumns(Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      t.setPartitionColumns(Seq("seg"))
    }
    val idT = new LogTable(s"${tmp()}/id")
    idT.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))),
      identityColumns = Map("id" -> graft.sources.IdentitySpec(1L, 1L)))
    intercept[IllegalArgumentException] {
      idT.setPartitionColumns(Seq("id"))
    }
  }
}
