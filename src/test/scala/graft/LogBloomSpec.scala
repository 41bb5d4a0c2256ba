package graft

import java.io.File

import graft.sources.LogTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloom-filter file index on the transaction-log table: per-file
  * sidecars built at commit time, probed by the stats pruner for
  * equality predicates that min/max ranges cannot decide — the
  * point-lookup skip lever for high-cardinality columns whose value
  * ranges overlap across every file. */
class LogBloomSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_logbloom").toString

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("v", LongType)))

  /** Two files whose `id` RANGES fully overlap (both span "a".."z"
    * prefixes) but whose value SETS are disjoint — the shape where
    * min/max skipping is useless and a bloom is decisive. */
  private def overlappingTable(): LogTable = {
    val t = new LogTable(s"${tmp()}/t", bloomExpectedItems = 1000L)
    t.create(schema, bloomFilterBy = Seq("id"))
    t.append(Seq(("apple-1", 1L), ("zebra-1", 2L), ("mango-1", 3L))
      .toDF("id", "v").repartition(1))
    t.append(Seq(("apple-2", 4L), ("zebra-2", 5L), ("mango-2", 6L))
      .toDF("id", "v").repartition(1))
    t
  }

  test("sidecars are written per new file and per indexed column") {
    val t = overlappingTable()
    t.liveAdds().foreach { a =>
      val name = new File(a.path).getName
      assert(new File(t.path, s"_bloom/$name.id.bloom").isFile)
      assert(!new File(t.path, s"_bloom/$name.v.bloom").exists())
    }
  }

  test("equality DELETE skips files the bloom proves absent — " +
    "where min/max ranges overlap and prune nothing") {
    val t = overlappingTable()
    val r = t.delete(spark, col("id") === "mango-2")
    // ranges overlap (apple..zebra in both files) so stats alone
    // would scan both; the bloom proves file 1 cannot hold mango-2
    assert(r.filesSkippedByStats == 1)
    assert(r.filesScanned == 1 && r.filesRewritten == 1)
    assert(r.rowsAffected == 1L)
    assert(t.load(spark).count() == 5L)
  }

  test("no false skips: present values are always scanned, absent " +
    "values affect nothing") {
    val t = overlappingTable()
    // delete every present id one by one; each must take effect
    val ids = Seq("apple-1", "zebra-1", "mango-1", "apple-2", "zebra-2")
    ids.foreach { id =>
      assert(t.delete(spark, col("id") === id).rowsAffected == 1L,
        s"id $id must be found")
    }
    assert(t.load(spark).select("id").as[String].collect().toSeq ==
      Seq("mango-2"))
    // an absent value: both files skipped, nothing scanned
    val r = t.delete(spark, col("id") === "durian-9")
    assert(r.rowsAffected == 0L && r.filesScanned == 0)
  }

  test("a missing sidecar is merely not a skip — never an error") {
    val t = overlappingTable()
    Option(new File(t.path, "_bloom").listFiles())
      .foreach(_.foreach(_.delete()))
    val r = t.delete(spark, col("id") === "mango-2")
    assert(r.rowsAffected == 1L)
    assert(r.filesSkippedByStats == 0) // no bloom, ranges overlap
  }

  test("IN-lists probe per element; a file matching none of them " +
    "is skipped") {
    val t = overlappingTable()
    val r = t.delete(spark,
      col("id").isin("apple-2", "zebra-2", "nope-0"))
    assert(r.filesSkippedByStats == 1) // file 1 holds none of the 3
    assert(r.rowsAffected == 2L)
  }

  test("casts on the attribute side disable the bloom (sound), " +
    "same-type literals after analyzer casts still probe") {
    val t = new LogTable(s"${tmp()}/t", bloomExpectedItems = 1000L)
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("v", StringType))), bloomFilterBy = Seq("k"))
    t.append(Seq((1L, "a"), (3L, "b")).toDF("k", "v").repartition(1))
    t.append(Seq((2L, "c"), (4L, "d")).toDF("k", "v").repartition(1))
    // k = 9 (absent): both files bloom-skip even though an INT
    // literal arrives (the analyzer casts the literal to LONG)
    val r = t.delete(spark, col("k") === 9)
    assert(r.filesScanned == 0 && r.filesSkippedByStats == 2)
    // a present value still lands
    assert(t.delete(spark, col("k") === 3L).rowsAffected == 1L)
  }

  test("rewrites re-index: files born from compaction carry fresh " +
    "sidecars and keep skipping") {
    val t = overlappingTable()
    t.compactFiles(spark)
    t.liveAdds().foreach { a =>
      val name = new File(a.path).getName
      assert(new File(t.path, s"_bloom/$name.id.bloom").isFile)
    }
    assert(t.delete(spark, col("id") === "absent-id").filesScanned == 0)
    assert(t.load(spark).count() == 6L)
  }

  test("vacuum expires sidecars with their data files and keeps " +
    "live ones") {
    val t = overlappingTable()
    val oldNames = t.liveAdds().map(a => new File(a.path).getName)
    t.overwrite(Seq(("kept-1", 9L)).toDF("id", "v"))
    val dropped = t.vacuum(retainLast = 1, retentionMillis = 0L)
    assert(dropped.count(_.startsWith("_bloom/")) == oldNames.size)
    val liveName = new File(t.liveAdds().head.path).getName
    assert(new File(t.path, s"_bloom/$liveName.id.bloom").isFile)
  }

  test("blooms survive checkpointed replay (the bloom config rides " +
    "the checkpoint state)") {
    val t = new LogTable(s"${tmp()}/t", checkpointInterval = 3,
      bloomExpectedItems = 1000L)
    t.create(schema, bloomFilterBy = Seq("id"))
    (0 until 5).foreach(i =>
      t.append(Seq((s"row-$i", i.toLong)).toDF("id", "v")))
    // a fresh instance resolves bloomCols through the checkpoint
    val t2 = new LogTable(t.path)
    assert(t2.bloomCols == Seq("id"))
    val r = t2.delete(spark, col("id") === "row-never")
    assert(r.filesScanned == 0 && r.filesSkippedByStats == 5)
  }
}
