package graft

import java.io.File

import graft.sources.{AddFile, ColStats, LogTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Round-12 scan-planning contract: the manifest is never a driver
  * Seq unless something actually needs the full file list. Metadata
  * is lazy (Snapshot.adds is a thunk), and selective planning above
  * the parquet-checkpoint threshold evaluates file-skipping as a
  * Spark job over the distributed manifest, collecting ONLY the
  * surviving AddFiles — the 100-TB posture item the r11 checkpoint
  * work started. */
class LogTablePruneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_prune").toString

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().toSet

  private def fakes(n: Int): Seq[AddFile] =
    (0 until n).map { i =>
      AddFile(f"data/fake-$i%06d.parquet", rows = 10L, bytes = 512L,
        stats = Map("k" -> ColStats(Some(i * 10L), Some(i * 10L + 9L), 0L)))
    }

  test("100k-file manifest: selective planning runs DISTRIBUTED and " +
    "collects only the matching subset — bit-equal to the driver walk") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    t.registerFiles(fakes(100000))                              // v1 ckpt
    val pred = col("k") >= 500000L && col("k") <= 500099L

    val fresh = new LogTable(dir)
    val (survivors, total) = fresh.prunedAddsFor(spark, pred)
    assert(fresh.lastPruneMode == "distributed")
    assert(total == 100001L)
    // exactly the ten fake files whose [min,max] overlaps the range
    // — the COLLECTED set is the pruned subset, not the manifest
    assert(survivors.map(_.path) ==
      (50000 until 50010).map(i => f"data/fake-$i%06d.parquet"))

    // ground truth: the all-driver walk over a raw-commit replay
    val raw = new LogTable(dir)
    raw.ignoreCheckpointsForTest = true
    val (driverSurvivors, driverTotal) = raw.prunedAddsFor(spark, pred)
    assert(raw.lastPruneMode == "driver")
    assert(driverTotal == total)
    assert(driverSurvivors == survivors) // full AddFile equality
  }

  test("metadata-only operations never materialize the manifest; " +
    "a file-list consumer pays exactly once") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    t.registerFiles(fakes(20000))                               // v1 ckpt
    val fresh = new LogTable(dir)
    val head = fresh.currentVersion.get
    // schema, layout, commit metadata, history surface — all lazy
    assert(fresh.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(fresh.partitionCols.isEmpty)
    assert(fresh.commitOp(head) == "append")
    fresh.history(spark).collect()
    assert(!fresh.addsMaterializedAt(Some(head)),
      "a metadata-only consumer forced the 20k-file manifest")
    // and a selective DISTRIBUTED plan still leaves it lazy
    val (s, _) = fresh.prunedAddsFor(spark, col("k") === 5L)
    assert(fresh.lastPruneMode == "distributed" && s.size == 1)
    assert(!fresh.addsMaterializedAt(Some(head)))
    fresh.liveAdds()
    assert(fresh.addsMaterializedAt(Some(head)))
  }

  test("DELETE and loadWhere on a real parquet-checkpointed table " +
    "plan through the distributed walk with unchanged results") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 2)
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("v", StringType))),
      properties = Map("graft.checkpoint.parquetThreshold" -> "1")) // v0
    (0 until 4).foreach { i =>
      t.append(Seq((i * 10L, s"a$i"), (i * 10L + 1, s"b$i"))
        .toDF("k", "v").repartition(1))                   // v1..v4
    }
    // v4 is a checkpoint boundary (interval 2) with parquet state
    assert(new File(dir, "_log").listFiles().exists(
      _.getName.matches("\\d{20}\\.ckpt\\..+\\.parquet")))

    val reader = new LogTable(dir)
    val got = rows(reader.loadWhere(spark, col("k") >= 20L))
    assert(reader.lastPruneMode == "distributed")
    assert(got == rows(reader.load(spark).filter(col("k") >= 20L)))

    val del = new LogTable(dir)
    val res = del.delete(spark, col("k") === 30L)
    assert(del.lastPruneMode == "distributed")
    assert(res.rowsAffected == 1L)
    // files that provably can't hold k=30 were skipped at planning
    assert(res.filesSkippedByStats >= 3, res.toString)
    assert(rows(del.load(spark)) ==
      rows(reader.load(spark, Some(4L)).filter(col("k") =!= 30L)))
  }

  test("a FAT commit checkpoints immediately, keeping the manifest " +
    "tail bounded whatever the interval cadence") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1000)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    t.registerFiles(fakes(LogTable.FatCommitCheckpointActions))  // v1
    val names = new File(dir, "_log").listFiles().map(_.getName)
    assert(names.exists(_.endsWith(".ckpt.json")),
      s"fat commit did not force a checkpoint: ${names.toSeq}")
    // and the distributed manifest serves from it (no 50k-line fold)
    val fresh = new LogTable(dir)
    val (s, total) = fresh.prunedAddsFor(spark, col("k") === 15L)
    assert(fresh.lastPruneMode == "distributed")
    assert(total == 50001L && s.size == 1)
  }

  test("addsDF tail fold anti-joins a fat touched set instead of one " +
    "giant isin literal list") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 2)
    t.create(StructType(Seq(StructField("k", LongType),
      StructField("v", StringType))),
      properties = Map("graft.checkpoint.parquetThreshold" -> "1")) // v0
    t.registerFiles(fakes(1500))                                // v1
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v2 ckpt
    // one post-checkpoint commit RE-ADDING 1200 known paths — the
    // >1000 regime that would have pushed 1200 literals into one In
    t.registerFiles(fakes(1200))                                // v3
    val df = t.addsDF(spark)
    assert(df.count() == 1501L)
    assert(df.select("path").as[String].collect().toSet ==
      t.liveAdds().map(_.path).toSet)
    // the re-added rows carry the TAIL's entries exactly once
    assert(df.filter(col("path") === "data/fake-000000.parquet")
      .count() == 1L)
  }
}
