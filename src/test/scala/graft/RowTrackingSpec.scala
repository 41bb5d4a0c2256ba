package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._

/** ROW TRACKING on the transaction-log table (Delta row tracking /
  * Iceberg v3 row lineage): every row gets a stable id — metadata
  * for fresh files (`baseRowId` + parquet position, assigned inside
  * the commit loop so concurrent appends stay blind-retryable),
  * materialized into the reserved `_graft_row_id` parquet column
  * whenever a rewrite moves rows. Ids survive deletion vectors,
  * copy-on-write DELETE/UPDATE, MOR update post-images, OPTIMIZE
  * (bin-pack and zorder), purge, RESTORE and branch fast-forward. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rt").toString

  private def freshTracked(): LogTable = {
    val t = new LogTable(s"${tmp()}/t")
    t.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))),
      properties = Map(LogTable.PropRowTracking -> "true"))
    t
  }

  private def batch(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, s"v$i")).toDF("k", "v")
      .orderBy("k").coalesce(1)

  /** k → _row_id map of the current snapshot. */
  private def idsOf(t: LogTable): Map[Long, Long] =
    t.loadWithRowIds(spark).select("k", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appends assign metadata-only ids (base + position); a second " +
    "append continues above the high-water; ids are unique") {
    val t = freshTracked()
    t.append(batch(1, 10))
    t.append(batch(11, 15))
    val ids = idsOf(t)
    // single ordered file per append → id = rank - 1
    assert(ids == (1L to 15L).map(k => k -> (k - 1)).toMap)
    assert(ids.values.toSeq.distinct.size == ids.size)
    // nothing materialized yet: ids are pure metadata
    assert(t.liveAdds().forall(_.baseRowId.isDefined))
  }

  test("enableRowTracking backfills an EXISTING table without " +
    "touching data (same physical files), and is idempotent") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 8))
    assert(!t.rowTrackingEnabled())
    val filesBefore = t.liveAdds().map(_.path).toSet
    val v = t.enableRowTracking()
    assert(t.commitOp(v) == "rowtracking")
    assert(t.rowTrackingEnabled())
    assert(t.liveAdds().map(_.path).toSet == filesBefore) // zero rewrite
    assert(t.liveAdds().forall(_.baseRowId.isDefined))
    assert(idsOf(t).values.toSeq.sorted == (0L to 7L))
    assert(t.enableRowTracking() == t.currentVersion.get) // idempotent
    // streams skip the backfill commit: a fresh stream sees ONE batch
    // of 8 rows, not 16
    val read = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", t.path).load()
    val q = read.writeStream.format("memory")
      .queryName("rt_backfill_stream").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.table("rt_backfill_stream").count() == 8L)
  }

  test("deletion vectors keep ids stable; CoW delete keeps survivor " +
    "ids; CoW update keeps updated rows' ids (materialized)") {
    val t = freshTracked()
    t.append(batch(1, 20))
    val before = idsOf(t)
    t.deleteMor(spark, col("k") % 5 === 0L) // DV: positions untouched
    val afterDv = idsOf(t)
    assert(afterDv == before.filter { case (k, _) => k % 5 != 0 })
    t.delete(spark, col("k") === 7L) // CoW rewrite of the file
    val afterCow = idsOf(t)
    assert(afterCow == afterDv - 7L)
    t.update(spark, col("k") === 11L, Map("v" -> lit("UPDATED")))
    val afterUpd = idsOf(t)
    assert(afterUpd == afterCow) // same ids, including row 11
    assert(t.loadWithRowIds(spark).filter(col("k") === 11L)
      .select("v").head().getString(0) == "UPDATED")
  }

  test("OPTIMIZE bin-pack, zorder cluster and purge preserve every " +
    "id across the rewrite") {
    val t = freshTracked()
    t.append(batch(1, 30))
    t.append(batch(31, 60))
    t.deleteMor(spark, col("k") % 7 === 0L)
    val before = idsOf(t)
    t.compactFiles(spark) // merges both files, materializes the DV away
    assert(idsOf(t) == before)
    t.cluster(spark, Seq("k"), nFiles = 3)
    assert(idsOf(t) == before)
    t.deleteMor(spark, col("k") % 11 === 0L)
    val afterDv = idsOf(t)
    t.purgeDeletes(spark)
    assert(idsOf(t) == afterDv)
  }

  test("MOR update: the post-image carries the matched row's id into " +
    "its new file") {
    val t = freshTracked()
    t.append(batch(1, 12))
    val before = idsOf(t)
    t.updateMor(spark, col("k") <= 3L, Map("v" -> lit("X")))
    val after = idsOf(t)
    assert(after == before)
    assert(t.loadWithRowIds(spark).filter(col("v") === "X").count() == 3L)
  }

  test("RESTORE keeps ids and the high-water NEVER regresses: an " +
    "append after rollback cannot collide with rolled-back ids") {
    val t = freshTracked()
    t.append(batch(1, 10))   // ids 0..9
    val v1 = t.currentVersion.get
    t.append(batch(11, 20))  // ids 10..19
    t.restore(v1)
    assert(idsOf(t) == (1L to 10L).map(k => k -> (k - 1)).toMap)
    t.append(batch(21, 25))
    val now = idsOf(t)
    // fresh rows allocate ABOVE the rolled-back range: the v2
    // snapshot (still time-travelable) holds ids 10..19, which must
    // stay unique table-history-wide
    assert(now.filter { case (k, _) => k >= 21 }.values.forall(_ >= 20L))
    assert(now.values.toSeq.distinct.size == now.size)
  }

  test("branch fast-forward publish: fork files keep their ids, " +
    "branch-minted rows get fresh ids at publish (WAP semantics)") {
    val t = freshTracked()
    t.append(batch(1, 10))
    val before = idsOf(t)
    val br = t.createBranch("dev")
    br.append(batch(11, 14))
    br.deleteMor(spark, col("k") === 2L)
    t.mergeBranch("dev")
    val after = idsOf(t)
    // untouched fork rows keep ids; the DV'd one is gone
    assert(after.filter(_._1 <= 10) == before - 2L)
    // branch-minted rows were assigned fresh ids at the merge commit
    val minted = after.filter(_._1 >= 11).values.toSeq
    assert(minted.forall(_ >= 10L) && minted.distinct.size == 4)
    assert(after.values.toSeq.distinct.size == after.size)
  }

  test("two appends from independent handles allocate disjoint " +
    "ranges (assignment inside the commit loop)") {
    val dir = s"${tmp()}/t"
    val a = new LogTable(dir)
    a.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))),
      properties = Map(LogTable.PropRowTracking -> "true"))
    val b = new LogTable(dir)
    a.append(batch(1, 5))
    b.append(batch(6, 9)) // b's handle never saw a's commit until now
    val ids = idsOf(a)
    assert(ids.size == 9 && ids.values.toSeq.distinct.size == 9)
  }

  test("reserved column names are refused at create and on " +
    "mergeSchema widening; row-id reads demand the feature") {
    val t = new LogTable(s"${tmp()}/t")
    intercept[IllegalArgumentException] {
      t.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_row_id",
          org.apache.spark.sql.types.LongType))))
    }
    t.append(batch(1, 3))
    intercept[IllegalArgumentException] {
      t.append(batch(4, 5).withColumn("_graft_row_id", lit(0L)),
        mergeSchema = true)
    }
    intercept[IllegalArgumentException] { t.loadWithRowIds(spark) }
  }

  test("SQL MERGE: surviving and UPDATED target rows keep their ids " +
    "through the file rewrite; merge-inserted rows id fresh") {
    val t = freshTracked()
    t.append(batch(1, 10))
    val before = idsOf(t)
    Seq((3L, "M3"), (7L, "M7"), (99L, "NEW")).toDF("k", "v")
      .createOrReplaceTempView("rt_merge_src")
    val stats = graft.sources.SqlMerge.mergeLog(spark,
      """MERGE INTO t USING rt_merge_src AS s ON t.k = s.k
        |WHEN MATCHED AND s.k = 7 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin, t)
    assert(stats.updated == 1L && stats.deleted == 1L &&
      stats.inserted == 1L)
    val after = idsOf(t)
    // survivors (incl. the updated row 3) keep their ids; 7 is gone
    assert(after.filter(_._1 <= 10) == (before - 7L))
    assert(t.loadWithRowIds(spark).filter(col("k") === 3L)
      .select("v").head().getString(0) == "M3")
    // the insert minted a fresh id above the high-water basis
    assert(after(99L) >= 10L)
    assert(after.values.toSeq.distinct.size == after.size)
    spark.catalog.dropTempView("rt_merge_src")
  }

  test("seeded random op mix holds the invariants: ids unique, " +
    "surviving rows stable, high-water at or above every live id") {
    val t = freshTracked()
    val rnd = new scala.util.Random(20260815L)
    var nextK = 1L
    def appendSome(): Unit = {
      val n = 3 + rnd.nextInt(8)
      t.append(batch(nextK, nextK + n - 1)); nextK += n
    }
    appendSome()
    var prev = idsOf(t)
    (1 to 18).foreach { _ =>
      rnd.nextInt(6) match {
        case 0 => appendSome()
        case 1 => t.deleteMor(spark, col("k") % (2 + rnd.nextInt(5)) === 1L)
        case 2 => t.delete(spark, col("k") % (3 + rnd.nextInt(4)) === 2L)
        case 3 => t.update(spark, col("k") % 5 === 3L,
          Map("v" -> concat(col("v"), lit("u"))))
        case 4 => t.compactFiles(spark)
        case 5 => t.purgeDeletes(spark)
      }
      val cur = idsOf(t)
      assert(cur.values.toSeq.distinct.size == cur.size, "ids not unique")
      val common = cur.keySet intersect prev.keySet
      assert(common.forall(k => cur(k) == prev(k)),
        "a surviving row changed its id")
      val hw = t.tableProperties(LogTable.PropRowIdHighWater).toLong
      assert(cur.values.forall(_ < hw), "live id at/above the high-water")
      prev = cur
    }
  }
}
