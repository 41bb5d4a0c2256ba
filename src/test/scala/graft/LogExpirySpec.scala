package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._

/** [[LogTable.expireSnapshots]] — Iceberg's expire_snapshots /
  * Delta's log retention: bound the metadata by deleting commit
  * entries below a floor anchored by a full checkpoint. Retained
  * versions replay bit-identically; everything crossing the floor
  * (time travel, change feeds, resuming streams) refuses loudly;
  * a brand-new stream serves the floor snapshot as its first batch. */
class LogExpirySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_expiry").toString

  private def batch(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, s"v$i")).toDF("k", "v").repartition(1)

  private def logFiles(t: LogTable): Seq[String] =
    Option(new java.io.File(t.path, "_log").listFiles()).toSeq.flatten
      .map(_.getName).filter(_.endsWith(".json")).sorted

  test("expiry deletes pre-floor commits and checkpoints, anchors a " +
    "floor checkpoint, and every retained version still replays " +
    "exactly; below-floor reads fail with a clear error") {
    val t = new LogTable(s"${tmp()}/t", checkpointInterval = 100)
    (0 until 8).foreach(i => t.append(batch(i * 10L, i * 10L + 9L)))
    t.delete(spark, col("k") % 9L === 0L) // v8
    val preCounts = (6L to 8L).map(v => t.load(spark, Some(v)).count())
    val dropped = t.expireSnapshots(retainLast = 3)
    assert(dropped.nonEmpty)
    assert(t.earliestVersion.contains(6L))
    assert(t.versions == Seq(6L, 7L, 8L))
    // the floor checkpoint anchors replay of every retained version
    assert((6L to 8L).map(v => t.load(spark, Some(v)).count()) ==
      preCounts)
    // a FRESH reader (no warm caches) replays identically too
    val cold = new LogTable(t.path, checkpointInterval = 100)
    assert(cold.load(spark).count() == preCounts.last)
    // below the floor: clear expiry error, and restore refuses
    val e = intercept[IllegalStateException] {
      new LogTable(t.path).load(spark, Some(2L)).count()
    }
    assert(e.getMessage.contains("expired"))
    intercept[IllegalArgumentException] { t.restore(1L) }
    // log directory is bounded: 3 commits + the floor checkpoint
    assert(logFiles(t).size == 4)
  }

  test("tagged and branch-fork versions CLAMP the floor; dropping " +
    "the ref releases it") {
    val t = new LogTable(s"${tmp()}/t", checkpointInterval = 100)
    (0 until 6).foreach(i => t.append(batch(i * 10L, i * 10L + 9L)))
    t.createTag("old", Some(1L)) // v6 (ref commit)
    assert(t.expireSnapshots(retainLast = 2).nonEmpty)
    // the tag pins v1: nothing below it may expire
    assert(t.earliestVersion.contains(1L))
    assert(t.load(spark, Some(t.resolveTag("old"))).count() == 20L)
    t.dropRef("old") // v7+
    t.expireSnapshots(retainLast = 2)
    assert(t.earliestVersion.contains(t.currentVersion.get - 1))
  }

  test("change feed within the retained window works; crossing the " +
    "floor refuses; idempotent-txn lookups stop at the floor") {
    val t = new LogTable(s"${tmp()}/t", checkpointInterval = 100)
    t.appendStreamBatch(batch(0, 9), "app", 0L)   // v0
    (1 until 6).foreach(i => t.append(batch(i * 10L, i * 10L + 9L)))
    assert(t.lastCommittedBatch("app").contains(0L))
    t.expireSnapshots(retainLast = 3)
    val e3 = t.earliestVersion.get
    // in-window feed serves the retained commits
    assert(t.changes(spark, e3 - 1, t.currentVersion.get)
      .filter(col("_change_type") === "insert").count() == 30L)
    val err = intercept[IllegalArgumentException] {
      t.changes(spark, 0L, t.currentVersion.get)
    }
    assert(err.getMessage.contains("expired"))
    // the txn marker at v0 is forgotten (documented horizon caveat)
    assert(t.lastCommittedBatch("app").isEmpty)
  }

  test("a BRAND-NEW stream on an expired-floor table serves the " +
    "floor snapshot as its first batch, then deltas; a resuming " +
    "stream below the floor refuses") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 100)
    (0 until 5).foreach(i => t.append(batch(i * 10L, i * 10L + 9L)))
    t.expireSnapshots(retainLast = 2) // floor = 3, snapshot holds 40
    val q = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", dir).load()
      .writeStream.format("memory").queryName("expiry_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // floor snapshot (40 rows through v3) + v4's delta (10)
      assert(spark.table("expiry_stream").count() == 50L)
      t.append(batch(50L, 54L))
      q.processAllAvailable()
      assert(spark.table("expiry_stream").count() == 55L)
    } finally q.stop()
  }

  test("expiry then vacuum: the files only expired versions " +
    "referenced become reclaimable") {
    val t = new LogTable(s"${tmp()}/t", checkpointInterval = 100)
    t.append(batch(0, 9))
    t.overwrite(batch(100, 109)) // v0's file now unreferenced by head
    t.append(batch(110, 119))
    t.expireSnapshots(retainLast = 2)
    // v0 is gone from the log; vacuum with the same retention sees
    // only retained references and reclaims v0's orphaned file
    val reclaimed = t.vacuum(retainLast = 2, retentionMillis = 0L)
    assert(reclaimed.nonEmpty)
    assert(t.load(spark).count() == 20L)
  }

  test("an OVERWRITE at the expiry floor refuses the e-1 feed up " +
    "front with the real reason instead of crashing on the expired " +
    "snapshot mid-read (r9 advice)") {
    val t = new LogTable(s"${tmp()}/t", checkpointInterval = 100)
    t.append(batch(0, 9))         // v0
    t.append(batch(10, 19))       // v1
    t.overwrite(batch(100, 104))  // v2 — the future floor
    t.append(batch(105, 109))     // v3
    t.expireSnapshots(retainLast = 2) // floor e = 2
    val e = t.earliestVersion.get
    assert(t.commitOp(e) == "overwrite")
    val err = intercept[IllegalArgumentException] {
      t.changes(spark, e - 1, t.currentVersion.get).count()
    }
    assert(err.getMessage.contains("overwrite"), err.getMessage)
    assert(err.getMessage.contains(s"changes(from = $e)"), err.getMessage)
    // from the floor itself the feed serves normally
    assert(t.changes(spark, e, t.currentVersion.get).count() == 5L)
  }
}
