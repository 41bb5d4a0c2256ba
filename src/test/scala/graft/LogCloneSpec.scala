package graft

import java.io.File

import graft.sources.LogTable
import org.apache.spark.sql.functions._

/** Shallow CLONE: a metadata-only commit referencing the source
  * snapshot's files by absolute path — zero data copies, then fully
  * independent evolution on both sides. */
class LogCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_logclone").toString

  private def dataFiles(t: LogTable): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new File(t.path, "data"))
  }

  test("clone copies no data, reads the source snapshot, and both " +
    "sides evolve independently") {
    val src = new LogTable(s"${tmp()}/src")
    src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    val clone = new LogTable(s"${tmp()}/clone")
    clone.cloneFrom(src)
    assert(dataFiles(clone).isEmpty) // zero copies
    assert(clone.load(spark).select("k").as[Long].collect().toSet ==
      Set(1L, 2L))
    // source evolves — clone pinned to its seed snapshot
    src.append(Seq((3L, "c")).toDF("k", "v"))
    assert(clone.load(spark).count() == 2L)
    // clone evolves — source untouched
    clone.append(Seq((9L, "z")).toDF("k", "v"))
    assert(clone.load(spark).count() == 3L)
    assert(src.load(spark).count() == 3L) // 1,2,3 — no 9
    assert(dataFiles(clone).size == 1)    // only the clone's append
  }

  test("a CoW delete on the clone rewrites locally; the source " +
    "file stays byte-identical") {
    val src = new LogTable(s"${tmp()}/src")
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(1))
    val srcFile = dataFiles(src).head
    val mtime = srcFile.lastModified()
    val clone = new LogTable(s"${tmp()}/clone")
    clone.cloneFrom(src)
    val r = clone.delete(spark, col("k") === 2L)
    assert(r.rowsAffected == 1L)
    assert(clone.load(spark).select("k").as[Long].collect().toSet ==
      Set(1L, 3L))
    assert(srcFile.lastModified() == mtime)
    assert(src.load(spark).count() == 3L)
    assert(dataFiles(clone).size == 1) // the rewrite landed locally
  }

  test("cloning a version pins that snapshot; deletion vectors and " +
    "partitioning carry over") {
    val src = new LogTable(s"${tmp()}/src")
    src.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType))),
      partitionBy = Seq("p"))
    src.append(Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("k", "p")) // v1
    src.deleteMor(spark, col("k") === 1L) // v2: dv
    val clone1 = new LogTable(s"${tmp()}/c1")
    clone1.cloneFrom(src, Some(1L))
    assert(clone1.load(spark).count() == 3L) // pre-delete snapshot
    assert(clone1.partitionCols == Seq("p"))
    val clone2 = new LogTable(s"${tmp()}/c2")
    clone2.cloneFrom(src) // current: vector applies
    assert(clone2.load(spark).select("k").as[Long].collect().toSet ==
      Set(2L, 3L))
    // partition pruning through the absolute-root read
    val r = clone2.delete(spark, col("p") === "y")
    assert(r.rowsAffected == 1L && r.filesSkippedByStats >= 1)
  }

  test("CALL clone wires the same through SQL, and the clone is " +
    "catalog-addressable") {
    val dir = tmp()
    val cat = s"gclone${System.identityHashCode(this)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    try {
      val src = new LogTable(s"$dir/src")
      src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      val v = spark.sql(s"CALL $cat.clone('src', 'dst')").as[Long].head()
      assert(v == 0L)
      assert(spark.sql(s"SELECT k FROM $cat.dst").as[Long]
        .collect().toSet == Set(1L, 2L))
      spark.sql(s"INSERT INTO $cat.dst VALUES (9, 'z')")
      assert(spark.sql(s"SELECT count(*) FROM $cat.dst").as[Long]
        .head() == 3L)
      assert(src.load(spark).count() == 2L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("a streaming tail of a clone serves the seed snapshot then " +
    "its own appends") {
    val src = new LogTable(s"${tmp()}/src")
    src.append(Seq((1L, "a")).toDF("k", "v"))
    val clone = new LogTable(s"${tmp()}/clone")
    clone.cloneFrom(src)
    clone.append(Seq((2L, "b")).toDF("k", "v"))
    val q = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", clone.path).load()
      .writeStream.format("memory").queryName("clone_tail")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("clone_tail").select("k").as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("catalog SQL reads a PARTITIONED clone (mixed data roots " +
    "drop to the V1 bridge instead of pinning a wrong basePath)") {
    val dir = tmp()
    val cat = s"gclonep${System.identityHashCode(this)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    try {
      val src = new LogTable(s"$dir/src")
      src.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.StringType))),
        partitionBy = Seq("p"))
      src.append(Seq((1L, "x"), (2L, "y")).toDF("k", "p"))
      new LogTable(s"$dir/dst").cloneFrom(src)
      assert(spark.sql(s"SELECT k, p FROM $cat.dst WHERE p = 'x'")
        .as[(Long, String)].collect().toSeq == Seq((1L, "x")))
      assert(spark.sql(s"SELECT count(*) FROM $cat.dst").as[Long]
        .head() == 2L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("a clone of a deletion-vectored PARTITIONED source streams " +
    "and change-feeds exactly its logical rows") {
    val src = new LogTable(s"${tmp()}/src")
    src.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType))),
      partitionBy = Seq("p"))
    src.append(Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("k", "p"))
    src.deleteMor(spark, col("k") === 2L)
    val clone = new LogTable(s"${tmp()}/clone")
    clone.cloneFrom(src)
    // the seed commit's references carry the vector AND live under
    // the source's data root — both must be handled by the stream
    val q = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", clone.path).load()
      .writeStream.format("memory").queryName("clone_dv_tail")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("clone_dv_tail").select("k").as[Long]
      .collect().toSet == Set(1L, 3L)) // no resurrection of k=2
    // change feed of the seed commit: inserts = logical rows only
    val feed = clone.changes(spark, -1L, 0L)
    assert(feed.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().toSet == Set(1L, 3L))
  }
}
