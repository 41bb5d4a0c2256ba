package graft

import graft.sources.LogTable
import org.apache.spark.sql.types._

/** Delta-style AUTO COMPACTION (`graft.autoCompact.*`
  * TBLPROPERTIES): appends self-heal the many-small-files pattern —
  * once a scope (a hive partition; the whole table when
  * unpartitioned) accumulates `minNumFiles` files under
  * `smallBytes`, the append runs a follow-on `optimize` bin-pack of
  * exactly that scope. Off by default; content is never changed. */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_autoc").toString

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def batch(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, s"v$i")).toDF("k", "v").repartition(1)

  private def ops(t: LogTable): Seq[String] =
    t.history(spark).orderBy("version")
      .select("op").as[String].collect().toSeq

  test("unpartitioned: the append crossing minNumFiles triggers one " +
    "optimize commit; content identical, file count collapses") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(schema, properties = Map(
      LogTable.PropAutoCompact -> "true",
      LogTable.PropAutoCompactMinFiles -> "4"))
    (0 until 3).foreach(i => t.append(batch(i * 10L, i * 10L + 9L)))
    // below threshold: three appends, three files, no optimize
    assert(t.load(spark).inputFiles.length == 3)
    assert(!ops(t).contains("optimize"))
    t.append(batch(30L, 39L)) // 4th small file crosses the threshold
    assert(ops(t).count(_ == "optimize") == 1)
    assert(t.load(spark).inputFiles.length == 1)
    assert(t.load(spark).count() == 40L)
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq ==
      (0L to 39L))
    // census resets: the compacted file + one new small file is 2 < 4
    t.append(batch(40L, 49L))
    assert(ops(t).count(_ == "optimize") == 1)
    assert(t.load(spark).inputFiles.length == 2)
  }

  test("disabled (default): small files accumulate untouched") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(schema)
    (0 until 5).foreach(i => t.append(batch(i * 10L, i * 10L + 9L)))
    assert(t.load(spark).inputFiles.length == 5)
    assert(!ops(t).contains("optimize"))
  }

  test("partitioned: each hive partition is its own scope — the hot " +
    "partition compacts, the cold partition's file is untouched") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(schema.fields :+ StructField("p", StringType)),
      partitionBy = Seq("p"),
      properties = Map(
        LogTable.PropAutoCompact -> "true",
        LogTable.PropAutoCompactMinFiles -> "4"))
    t.append(Seq((100L, "x", "b")).toDF("k", "v", "p").repartition(1))
    val coldFile = t.load(spark).inputFiles.filter(_.contains("p=b")).toSeq
    (0 until 4).foreach(i => t.append(
      (i * 10L to i * 10L + 9L).map(j => (j, s"v$j", "a"))
        .toDF("k", "v", "p").repartition(1)))
    // the 4th a-append compacted partition a only
    assert(ops(t).count(_ == "optimize") == 1)
    val files = t.load(spark).inputFiles
    assert(files.count(_.contains("p=a")) == 1)
    assert(files.filter(_.contains("p=b")).toSeq == coldFile)
    assert(t.load(spark).count() == 41L)
  }

  test("two hot partitions compact as TWO scope-local commits — one " +
    "output file each, never a cross-scope shuffle") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(StructType(schema.fields :+ StructField("p", StringType)),
      partitionBy = Seq("p"),
      properties = Map(
        LogTable.PropAutoCompact -> "true",
        LogTable.PropAutoCompactMinFiles -> "4"))
    // interleave appends so BOTH partitions cross the threshold on
    // the same (last) append
    (0 until 4).foreach { i =>
      t.append((i * 10L to i * 10L + 9L).map(j => (j, s"a$j", "a"))
        .toDF("k", "v", "p").repartition(1))
      t.append((i * 10L to i * 10L + 9L).map(j => (j, s"b$j", "b"))
        .toDF("k", "v", "p").repartition(1))
    }
    assert(ops(t).count(_ == "optimize") == 2)
    val files = t.load(spark).inputFiles
    assert(files.count(_.contains("p=a")) == 1, files.toSeq)
    assert(files.count(_.contains("p=b")) == 1, files.toSeq)
    assert(t.load(spark).count() == 80L)
  }

  test("streaming appends auto-compact too, and the optimize commit " +
    "is invisible to the change feed") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(schema, properties = Map(
      LogTable.PropAutoCompact -> "true",
      LogTable.PropAutoCompactMinFiles -> "3"))
    (0 until 3).foreach(i =>
      t.appendStreamBatch(batch(i * 10L, i * 10L + 9L), "app", i.toLong))
    assert(ops(t).count(_ == "optimize") == 1)
    assert(t.load(spark).inputFiles.length == 1)
    // change feed over the whole history: inserts only, no
    // row-level change from the optimize
    val ch = t.changes(spark, -1L, t.currentVersion.get)
    assert(ch.count() == 30L)
    assert(ch.select("_change_type").distinct().as[String]
      .collect().toSeq == Seq("insert"))
  }
}
