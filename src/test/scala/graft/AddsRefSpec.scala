package graft

import java.io.File

import graft.sources.{AddFile, CkptAdd, ColStats, LogTable}
import org.apache.spark.sql.functions._

/** Round-14 by-reference commit contract ([[LogTable.registerFilesFrom]],
  * the `addsRef` action): a CONVERT-scale registration commits its add
  * set as a parquet sidecar written by a Spark job — the driver never
  * holds the file list, on the write side OR any read side. The
  * distributed manifest stitches the sidecar in as an ordered segment
  * even before (or without) the version's checkpoint, the driver
  * replay folds it identically, and expiry sweeps the sidecar with its
  * commit. */
class AddsRefSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_addsref").toString

  /** A synthetic manifest of `n` disjoint-stat files as a DISTRIBUTED
    * dataset — built by a Spark job, never a driver Seq. */
  private def fakeDs(n: Int) =
    spark.range(n.toLong).map { i =>
      CkptAdd(i, f"data/fake-$i%06d.parquet", 10L, 512L,
        s"""{"k":{"min":${i * 10},"max":${i * 10 + 9},"nulls":0}}""",
        Map.empty[String, String], None, None, None)
    }

  test("100k-file by-reference registration: the driver never " +
    "materializes the add set, and selective planning stays " +
    "distributed and bit-equal to the driver replay") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    val v = t.registerFilesFrom(spark, fakeDs(100000))          // v1
    assert(v == 1L)
    // the WRITER's own snapshot stayed lazy end-to-end: sidecar
    // write, commit, and checkpoint all ran manifest-to-manifest
    assert(!t.addsMaterializedAt(Some(v)),
      "registerFilesFrom materialized the add set on the driver")
    // the commit is protocol-gated: an addsRef-blind reader must
    // refuse the table, never half-read it as empty
    assert(t.protocolAt(Some(v))
      .exists(_.readerFeatures.contains("addsRef")))

    val fresh = new LogTable(dir)
    val pred = col("k") >= 500000L && col("k") <= 500099L
    val (survivors, total) = fresh.prunedAddsFor(spark, pred)
    assert(fresh.lastPruneMode == "distributed")
    assert(total == 100001L) // v0's real file + 100k refs
    assert(survivors.map(_.path) ==
      (50000 until 50010).map(i => f"data/fake-$i%06d.parquet"))
    assert(!fresh.addsMaterializedAt(Some(v)))

    // metadata surfaces serve the O(1) action facts, sidecar closed
    val h = fresh.history(spark).filter(col("version") === v)
      .select("n_added").as[Long].head()
    assert(h == 100000L)
    assert(!fresh.addsMaterializedAt(Some(v)))

    // ground truth: raw-commit driver replay (checkpoints ignored)
    // folds the sidecar through fileStateAt — identical results
    val raw = new LogTable(dir)
    raw.ignoreCheckpointsForTest = true
    val (driverSurvivors, driverTotal) = raw.prunedAddsFor(spark, pred)
    assert(raw.lastPruneMode == "driver")
    assert(driverTotal == total)
    assert(driverSurvivors == survivors)
  }

  test("the sidecar SEGMENT serves distributed even without the " +
    "commit's checkpoint (crash between claim and checkpoint), " +
    "with inline actions on both sides of the sidecar") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 100)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    val v = t.registerFilesFrom(spark, fakeDs(20000))           // v1
    // simulate the crash: the commit landed, the checkpoint did not
    val log = new File(dir, "_log")
    Option(log.listFiles()).get
      .filter(_.getName.startsWith(f"$v%020d.ckpt"))
      .foreach { f =>
        def rm(x: File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
        }
        rm(f)
      }
    // an inline re-add AFTER the sidecar (span-after-side segment):
    // its stats must override the sidecar row in the stitched fold
    val t2 = new LogTable(dir, checkpointInterval = 100)
    t2.registerFiles(Seq(AddFile("data/fake-005432.parquet", 10L, 512L,
      Map("k" -> ColStats(Some(777000L), Some(777009L), 0L)))))  // v2
    val fresh = new LogTable(dir)
    val (survivors, total) =
      fresh.prunedAddsFor(spark, col("k") === 54321L)
    assert(fresh.lastPruneMode == "distributed",
      "a checkpoint-less addsRef tail fell back to the driver walk")
    assert(total == 20001L)
    assert(survivors.isEmpty,
      "the post-sidecar inline re-add's stats did not override")
    val (hit, _) = fresh.prunedAddsFor(spark, col("k") === 777005L)
    assert(hit.map(_.path) == Seq("data/fake-005432.parquet"))
    assert(!fresh.addsMaterializedAt(Some(t2.currentVersion.get)))
    // a checkpoint written FROM the stitched manifest replays
    // ORDER-IDENTICAL to the raw driver walk (Seq equality)
    val t3 = new LogTable(dir, checkpointInterval = 1)
    t3.append(Seq((9L, "z")).toDF("k", "v"))                    // v3+ckpt
    val viaCkpt = new LogTable(dir)
    val raw = new LogTable(dir)
    raw.ignoreCheckpointsForTest = true
    assert(viaCkpt.liveAdds() == raw.liveAdds())
  }

  test("interleaved inline actions around the sidecar fold with " +
    "latest-wins order, replay-identical to the driver walk") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 100)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    t.registerFilesFrom(spark, fakeDs(50))                      // v1 (+ckpt)
    // inline RE-ADD of a sidecar path AFTER the sidecar commit: the
    // later action's stats must win, and the path must move to the
    // manifest's END (the latest-action-order rule), in every replay
    t.registerFiles(Seq(AddFile("data/fake-000007.parquet", 10L, 512L,
      Map("k" -> ColStats(Some(999000L), Some(999009L), 0L)))))  // v2
    val head = t.currentVersion.get
    val fresh = new LogTable(dir)
    val raw = new LogTable(dir)
    raw.ignoreCheckpointsForTest = true
    val a = fresh.liveAdds()
    val b = raw.liveAdds()
    assert(a == b, "checkpointed replay diverged from raw replay")
    assert(a.last.path == "data/fake-000007.parquet")
    assert(a.last.stats("k").min.contains(999000L))
    assert(a.count(_.path == "data/fake-000007.parquet") == 1)
    // and the DISTRIBUTED manifest agrees with both, order included
    val ds = fresh.addsDF(spark, Some(head))
      .select("path").as[String].collect().toSeq
    assert(ds.toSet == a.map(_.path).toSet)
  }

  test("expiry sweeps the by-reference sidecar with its commit; " +
    "the floor checkpoint keeps the table readable") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 100)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    t.registerFilesFrom(spark, fakeDs(1000))                    // v1
    t.append(Seq((2L, "b")).toDF("k", "v"))                     // v2
    t.append(Seq((3L, "c")).toDF("k", "v"))                     // v3
    val log = new File(dir, "_log")
    def refDirs() = Option(log.listFiles()).get
      .filter(_.getName.startsWith("addsref.")).toSeq
    assert(refDirs().nonEmpty)
    t.expireSnapshots(retainLast = 1)
    assert(refDirs().isEmpty,
      "expiry left the expired commit's addsRef sidecar behind")
    val fresh = new LogTable(dir)
    assert(fresh.liveAdds().size == 1003)
  }

  test("a by-reference registration RACES a concurrent append: both " +
    "land (blind appends never conflict), the stitched state holds " +
    "both sets") {
    val dir = s"${tmp()}/t"
    new LogTable(dir).append(Seq((1L, "a")).toDF("k", "v"))     // v0
    val t1 = new LogTable(dir, checkpointInterval = 100)
    val t2 = new LogTable(dir, checkpointInterval = 100)
    val others = (0 until 50).map { i =>
      AddFile(f"data/other-$i%03d.parquet", 10L, 512L,
        Map("k" -> ColStats(Some(-1000L - i), Some(-1000L - i), 0L)))
    }
    @volatile var v1 = -1L
    @volatile var v2 = -1L
    val th1 = new Thread(() => v1 = t1.registerFilesFrom(
      spark, fakeDs(20000)))
    val th2 = new Thread(() => v2 = t2.registerFiles(others))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert(v1 > 0 && v2 > 0 && v1 != v2,
      s"racing commits collided: $v1 / $v2")
    val fresh = new LogTable(dir)
    val (_, total) = fresh.prunedAddsFor(spark, col("k") === 0L)
    assert(total == 20051L,
      s"a racing writer's files were lost: $total")
    assert(fresh.lastPruneMode == "distributed")
  }

  test("vacuum sweeps a crash-orphaned addsref sidecar no commit " +
    "claims, keeps the claimed one, and honors the retention guard") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    t.registerFilesFrom(spark, fakeDs(50))                      // v1
    val logDir = new File(dir, "_log")
    val claimed = logDir.listFiles()
      .filter(_.getName.startsWith("addsref."))
    assert(claimed.length == 1)
    // simulate the crash window: a sidecar written but never claimed
    // by a commit (registerFilesFrom died between write and commit)
    val orphan = new File(logDir, "addsref.deadbeef.parquet")
    orphan.mkdirs()
    java.nio.file.Files.writeString(
      new File(orphan, "part-0.parquet").toPath, "garbage")
    // fresh orphan + real retention window: the in-flight guard
    // keeps it (a concurrent registerFilesFrom's sidecar looks
    // exactly like this)
    val kept = t.vacuum(retainLast = 1,
      retentionMillis = 3600L * 1000L)
    assert(!kept.exists(_.contains("addsref.deadbeef")), kept)
    assert(orphan.isDirectory)
    // expired retention: the orphan sweeps, the claimed sidecar
    // stays (its commit is live)
    val dropped = t.vacuum(retainLast = 1, retentionMillis = 0L)
    assert(dropped.contains("_log/addsref.deadbeef.parquet"), dropped)
    assert(!orphan.exists())
    assert(claimed.head.isDirectory,
      "vacuum deleted a sidecar a live commit references")
    // the table still serves its by-reference files
    val fresh = new LogTable(dir)
    val (_, total) = fresh.prunedAddsFor(spark, col("k") === 0L)
    assert(total == 51L)
  }

  test("a ROW-TRACKING table takes a by-reference registration: " +
    "contiguous disjoint base-row-id ranges assign distributively " +
    "and the high-water advances in the same commit") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1))                                          // v0
    t.enableRowTracking()                                       // v1
    val hw0 = t.tableProperties(LogTable.PropRowIdHighWater).toLong
    assert(hw0 == 2L)
    val v = t.registerFilesFrom(spark, fakeDs(5000))            // v2
    assert(v == 2L)
    val fresh = new LogTable(dir)
    assert(fresh.tableProperties(LogTable.PropRowIdHighWater)
      .toLong == hw0 + 50000L,
      "the registration must advance the row-id high-water")
    assert(!fresh.addsMaterializedAt(),
      "the tracked registration materialized the set on the driver")
    val (all, total) = fresh.prunedAddsFor(spark, lit(true))
    assert(total == 5001L)
    val fakes = all.filter(_.path.startsWith("data/fake-"))
    assert(fakes.forall(_.baseRowId.isDefined),
      "every by-reference file needs its assigned range")
    // ranges start at the prior high-water, stack contiguously, and
    // never overlap
    val ranges = fakes.map(a => (a.baseRowId.get, a.rows))
      .sortBy(_._1)
    assert(ranges.head._1 == hw0)
    ranges.sliding(2).foreach {
      case scala.collection.Seq((b1, r1), (b2, _)) =>
        assert(b2 == b1 + r1, s"gap/overlap at $b1+$r1 vs $b2")
      case _ => ()
    }
  }

  test("by-reference registered REAL files serve metadata row ids: " +
    "unique and contiguous across the table's own rows and the " +
    "registered set") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1))                                          // v0
    t.enableRowTracking()                                       // v1
    val staging = s"$dir/data/reg"
    Seq((10L, "x"), (11L, "y"), (12L, "z")).toDF("k", "v")
      .repartition(1).write.parquet(staging)
    val files = new File(staging).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val ds = spark.createDataset(files.toSeq.zipWithIndex.map {
      case (f, i) => CkptAdd(i.toLong, s"data/reg/${f.getName}",
        3L, f.length(), "{}", Map.empty, None, None, None)
    })
    t.registerFilesFrom(spark, ds)                              // v2
    val got = t.loadWithRowIds(spark)
      .select(col("k"), col("_row_id")).as[(Long, Long)]
      .collect().toSeq
    assert(got.map(_._2).distinct.size == 5,
      s"row ids must be unique: $got")
    assert(got.map(_._2).toSet == (0L until 5L).toSet, got)
    // further tracked DML keeps allocating past the advanced mark
    t.append(Seq((20L, "w")).toDF("k", "v"))
    val after = t.loadWithRowIds(spark)
      .select("_row_id").as[Long].collect().toSeq
    assert(after.distinct.size == 6 && after.toSet == (0L until 6L).toSet,
      after.sorted)
  }

  test("duplicate paths refuse; an empty set is a no-op") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    val dup = fakeDs(10).union(fakeDs(3))
    val e = intercept[IllegalArgumentException] {
      t.registerFilesFrom(spark, dup)
    }
    assert(e.getMessage.contains("duplicate"))
    val before = t.currentVersion.get
    assert(t.registerFilesFrom(spark,
      fakeDs(0)) == before)
    assert(t.currentVersion.get == before)
  }
}
