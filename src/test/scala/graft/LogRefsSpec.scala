package graft

import graft.sources.{IdentitySpec, LogTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tags and fast-forward branches on the transaction-log table
  * (Iceberg's ref surface): tags pin a snapshot under a name for
  * by-name time travel and VACUUM protection; branches fork the
  * table as a zero-copy shallow clone, take real commits through
  * the full table API, and fast-forward back onto main in one
  * metadata commit — refused if main moved. */
class LogRefsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_refs").toString

  private def batch(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, s"v$i")).toDF("k", "v")

  test("tags: by-name time travel, duplicate/unknown guards, drop; " +
    "the ref commit is metadata-only and streams skip it") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 5))
    val v0 = t.currentVersion.get
    t.createTag("v1.0")
    t.append(batch(6, 10))
    assert(t.refs == Map("v1.0" -> ("tag", v0)))
    assert(t.resolveTag("v1.0") == v0)
    assert(t.load(spark, Some(t.resolveTag("v1.0"))).count() == 5L)
    assert(t.load(spark).count() == 10L)
    assert(t.commitOp(v0 + 1) == "ref")
    intercept[IllegalArgumentException] { t.createTag("v1.0") }
    intercept[IllegalArgumentException] { t.createTag("bad name!") }
    intercept[IllegalArgumentException] { t.resolveTag("nope") }
    t.dropRef("v1.0")
    assert(t.refs.isEmpty)
    intercept[IllegalArgumentException] { t.dropRef("v1.0") }
  }

  test("VACUUM keeps a tagged snapshot's files however old; " +
    "untagged expired versions still vacuum") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 5))
    val tagged = t.currentVersion.get
    t.createTag("keep")
    t.overwrite(batch(6, 9)) // retires the tagged files
    t.overwrite(batch(10, 12))
    // zero retention: everything outside the head would normally go
    val dropped = t.vacuum(retainLast = 1, retentionMillis = 0L)
    // tagged snapshot still loads in full
    assert(t.load(spark, Some(tagged)).select("k").as[Long]
      .collect().sorted.toSeq == (1L to 5L))
    // …while the middle (untagged, retired) overwrite's files went
    assert(dropped.nonEmpty)
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == (10L to 12L))
  }

  test("branches: zero-copy fork, real commits on the branch, main " +
    "untouched, FAST-FORWARD publishes the branch state in one " +
    "commit and consumes the ref") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 6))
    val b = t.createBranch("dev")
    assert(t.refs("dev")._1 == "branch")
    // work on the branch: append + row-level delete + schema-free
    b.append(batch(7, 9))
    b.delete(spark, col("k") <= 2L)
    // main is untouched
    assert(t.load(spark).count() == 6L)
    assert(t.branchTable("dev").load(spark).select("k").as[Long]
      .collect().sorted.toSeq == (3L to 9L))
    // fast-forward: one commit, state becomes the branch's
    val v = t.mergeBranch("dev")
    assert(t.commitOp(v) == "merge")
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == (3L to 9L))
    assert(t.refs.isEmpty) // ref consumed
    // the published state replays and survives vacuum (branch-local
    // files are referenced from main's log now)
    t.vacuum(retainLast = 1, retentionMillis = 0L)
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == (3L to 9L))
  }

  test("content-aware merge: ref bookkeeping never blocks a " +
    "fast-forward; DISJOINT post-fork data commits on main merge " +
    "cleanly with both sides' rows surviving") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 3))
    val b = t.createBranch("dev")
    b.append(batch(4, 6))
    t.createTag("checkpoint") // a ref commit on main — harmless
    t.mergeBranch("dev")
    assert(t.load(spark).count() == 6L)
    val b2 = t.createBranch("dev2")
    b2.append(batch(7, 9))
    t.append(batch(100, 101)) // main moves — but a DISJOINT file set
    t.mergeBranch("dev2") // replays the branch delta on the new head
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == ((1L to 9L) ++ Seq(100L, 101L)))
    assert(!t.refs.contains("dev2")) // ref consumed
  }

  test("merge refuses a TRUE conflict: both sides touched the same " +
    "file, or table metadata diverged on both sides") {
    // both sides row-DML the single seed file → file-set clash
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 5).coalesce(1)) // ONE data file
    val b = t.createBranch("dev")
    b.delete(spark, col("k") === 1L) // branch rewrites the seed file
    t.delete(spark, col("k") === 2L) // …and so does main
    intercept[java.util.ConcurrentModificationException] {
      t.mergeBranch("dev")
    }
    // main kept its state; the branch is intact and re-mergeable
    // only after re-branching
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L, 4L, 5L))
    assert(t.branchTable("dev").load(spark).select("k").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L, 4L, 5L))
    // metadata divergence on both sides refuses even with disjoint
    // files: branch re-partitions, main re-partitions differently
    val t2 = new LogTable(s"${tmp()}/t")
    t2.append(batch(1, 3).withColumn("seg", lit("a")))
    val b2 = t2.createBranch("dev")
    b2.setPartitionColumns(Seq("seg"))
    t2.setPartitionColumns(Seq("k"))
    intercept[java.util.ConcurrentModificationException] {
      t2.mergeBranch("dev")
    }
    // …but a branch-only metadata change rides the merge
    val t3 = new LogTable(s"${tmp()}/t")
    t3.append(batch(1, 3).withColumn("seg", lit("a")))
    val b3 = t3.createBranch("dev")
    b3.setPartitionColumns(Seq("seg"))
    t3.append(batch(10, 11).withColumn("seg", lit("b"))) // disjoint
    t3.mergeBranch("dev")
    assert(t3.partitionCols == Seq("seg"))
    assert(t3.load(spark).select("k").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 10L, 11L))
  }

  test("SQL surface: VERSION AS OF 'tag' and VERSION AS OF 'branch', " +
    "CALL create_tag/create_branch/merge_branch/show_refs") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gref",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gref.warehouse", wh)
    try {
      val t = new LogTable(s"$wh/t")
      t.append(batch(1, 5))
      spark.sql("CALL gref.create_tag('t', 'rel')")
      spark.sql("INSERT INTO gref.t VALUES (6, 'v6'), (7, 'v7')")
      assert(spark.sql("SELECT COUNT(*) FROM gref.t").head.getLong(0)
        == 7L)
      assert(spark.sql(
        "SELECT COUNT(*) FROM gref.t VERSION AS OF 'rel'")
        .head.getLong(0) == 5L)
      spark.sql("CALL gref.create_branch('t', 'dev')")
      // write to the branch through its own table handle, then read
      // it by name from SQL
      t.branchTable("dev").append(batch(8, 9))
      assert(spark.sql(
        "SELECT COUNT(*) FROM gref.t VERSION AS OF 'dev'")
        .head.getLong(0) == 9L)
      assert(spark.sql("SELECT COUNT(*) FROM gref.t").head.getLong(0)
        == 7L)
      val refRows = spark.sql("CALL gref.show_refs('t')")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(refRows.toSet == Set(("rel", "tag"), ("dev", "branch")))
      spark.sql("CALL gref.merge_branch('t', 'dev')")
      assert(spark.sql("SELECT COUNT(*) FROM gref.t").head.getLong(0)
        == 9L)
      spark.sql("CALL gref.drop_ref('t', 'rel')")
      assert(new LogTable(s"$wh/t").refs.isEmpty)
    } finally {
      spark.conf.unset("spark.sql.catalog.gref")
      spark.conf.unset("spark.sql.catalog.gref.warehouse")
    }
  }

  test("CREATE BRANCH AS OF an older version serves the historic " +
    "snapshot; its disjoint delta content-aware-merges onto the " +
    "advanced head; SQL CALL takes the version") {
    val wh = tmp()
    val t = new LogTable(s"$wh/t")
    t.append(batch(1, 3))
    val v0 = t.currentVersion.get
    t.append(batch(4, 6))
    val b = t.createBranch("old", Some(v0))
    assert(b.load(spark).count() == 3L) // the historic snapshot
    b.append(batch(10, 12)) // disjoint from main's post-fork commit
    t.mergeBranch("old")
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == ((1L to 6L) ++ (10L to 12L)))
    intercept[IllegalArgumentException] {
      t.createBranch("bad", Some(999L))
    }
    spark.conf.set("spark.sql.catalog.gasof",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gasof.warehouse", wh)
    try {
      spark.sql(s"CALL gasof.create_branch('t', 'old2', $v0)")
      assert(spark.sql(
        "SELECT COUNT(*) FROM gasof.t VERSION AS OF 'old2'")
        .head.getLong(0) == 3L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gasof")
      spark.conf.unset("spark.sql.catalog.gasof.warehouse")
    }
  }

  test("VACUUM covers branch data roots: a fast-forwarded-then-" +
    "retired branch file reclaims; live-branch heads and still-" +
    "published files survive; dry-run parity") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 3)) // main file M1
    val live = t.createBranch("live") // fork pins M1's snapshot
    live.append(batch(20, 22)) // F2 under _branch_live/data
    val dev = t.createBranch("dev")
    dev.append(batch(4, 6)) // F1 under _branch_dev/data
    t.mergeBranch("dev") // main now serves M1 + F1 by reference
    // while main's head references F1, nothing branch-side reclaims
    val dry1 = t.vacuum(retainLast = 1, retentionMillis = 0L,
      dryRun = true)
    assert(!dry1.exists(_.startsWith("_branch_")))
    t.overwrite(t.load(spark)) // rewrite retires M1 + F1 on main
    val dry = t.vacuum(retainLast = 1, retentionMillis = 0L,
      dryRun = true)
    val dropped = t.vacuum(retainLast = 1, retentionMillis = 0L)
    assert(dry.sorted == dropped.sorted)
    // the merged-then-retired branch file went…
    assert(dropped.exists(_.startsWith("_branch_dev/")))
    // …the live branch's head file did not…
    assert(!dropped.exists(_.startsWith("_branch_live/")))
    // …and every surface still reads in full
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == (1L to 6L))
    assert(t.branchTable("live").load(spark).select("k").as[Long]
      .collect().sorted.toSeq == ((1L to 3L) ++ (20L to 22L)))
  }

  test("drop_branch lifecycle: refuses while the branch's files are " +
    "still referenced; reclaims a merged branch's leaked directory " +
    "and frees the name; SQL CALL surface") {
    val wh = tmp()
    val t = new LogTable(s"$wh/t")
    t.append(batch(1, 3))
    val dev = t.createBranch("dev")
    dev.append(batch(4, 6))
    t.mergeBranch("dev") // ref consumed; _branch_dev/ leaks
    // the name is burned while the directory lingers
    intercept[IllegalArgumentException] { t.createBranch("dev") }
    // main's head still references _branch_dev files → refuse
    val err = intercept[IllegalArgumentException] { t.dropBranch("dev") }
    assert(err.getMessage.contains("still referenced"))
    // ref-only drop has nothing to do here (no ref), but the
    // directory survives a delete_data=false call on a LIVE branch
    val b2 = t.createBranch("side")
    b2.append(batch(50, 52))
    t.dropBranch("side", deleteData = false)
    assert(!t.refs.contains("side"))
    assert(new java.io.File(s"$wh/t/_branch_side").exists())
    t.dropBranch("side") // no ref, unreferenced dir → reclaims
    assert(!new java.io.File(s"$wh/t/_branch_side").exists())
    // migrate the published files into the main tree, then reclaim
    t.overwrite(t.load(spark))
    spark.conf.set("spark.sql.catalog.gdrop",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gdrop.warehouse", wh)
    try {
      spark.sql("CALL gdrop.drop_branch('t', 'dev')")
      assert(!new java.io.File(s"$wh/t/_branch_dev").exists())
      // the name is free again
      val again = t.createBranch("dev")
      again.append(batch(7, 9))
      t.mergeBranch("dev")
      assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
        == (1L to 9L))
    } finally {
      spark.conf.unset("spark.sql.catalog.gdrop")
      spark.conf.unset("spark.sql.catalog.gdrop.warehouse")
    }
  }

  private def idTable(dir: String): LogTable = {
    val t = new LogTable(dir)
    t.create(StructType(Seq(StructField("id", LongType),
      StructField("k", LongType), StructField("v", StringType))),
      identityColumns = Map("id" -> IdentitySpec(1L, 1L)))
    t
  }

  test("merge publishes branch-side GOVERNANCE metadata: a CHECK " +
    "constraint, a column DEFAULT and the identity high-water " +
    "survive the fast-forward (r9 advice: they silently dropped)") {
    val t = idTable(s"${tmp()}/t")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val dev = t.createBranch("dev")
    dev.addCheckConstraint(spark, "k_pos", "k > 0")
    dev.setColumnDefault("v", "'filled'")
    dev.append(Seq(2L, 3L).toDF("k")) // allocates ids 2,3; fills v
    t.mergeBranch("dev")
    assert(t.checkConstraints.get("k_pos").contains("k > 0"))
    assert(t.columnDefaults.get("v").contains("'filled'"))
    // the published constraint ENFORCES on main
    intercept[Exception] { t.append(Seq((-5L, "x")).toDF("k", "v")) }
    // the branch's identity allocation advanced main's high water:
    // a fresh main append cannot reuse the branch's ids
    t.append(Seq((9L, "z")).toDF("k", "v"))
    val ids = t.load(spark).select("id").as[Long].collect()
    assert(ids.length == 4 && ids.distinct.length == 4, ids.toSeq)
    assert(t.identityColumns("id").highWater.contains(ids.max))
  }

  test("content-aware merge validates the branch's added rows " +
    "against a CHECK constraint main declared AFTER the fork: " +
    "violating rows refuse, passing rows publish under it") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 3))
    val ok = t.createBranch("ok")
    ok.append(batch(10, 12)) // k > 0 — passes the future constraint
    val neg = t.createBranch("neg")
    neg.append(Seq((-7L, "bad")).toDF("k", "v"))
    t.addCheckConstraint(spark, "k_pos", "k > 0") // post-fork on main
    val err = intercept[java.util.ConcurrentModificationException] {
      t.mergeBranch("neg")
    }
    assert(err.getMessage.contains("k_pos"), err.getMessage)
    // the failed merge committed nothing: main unchanged, ref alive
    assert(t.load(spark).count() == 3L)
    assert(t.refs.contains("neg"))
    // the clean branch content-aware-merges and the constraint stays
    t.mergeBranch("ok")
    assert(t.load(spark).count() == 6L)
    assert(t.checkConstraints.contains("k_pos"))
    intercept[Exception] { t.append(Seq((-1L, "x")).toDF("k", "v")) }
  }

  test("identity high-water merging: BOTH sides allocating since " +
    "the fork refuses (overlapping ranges); branch-only allocation " +
    "over a metadata interloper publishes the merged mark") {
    val t = idTable(s"${tmp()}/t")
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val dev = t.createBranch("dev")
    dev.append(Seq((2L, "b")).toDF("k", "v"))
    t.append(Seq((3L, "c")).toDF("k", "v")) // main allocates too
    val err = intercept[java.util.ConcurrentModificationException] {
      t.mergeBranch("dev")
    }
    assert(err.getMessage.contains("identity"), err.getMessage)
    // branch-only allocation: main's interloper is metadata-only
    val t2 = idTable(s"${tmp()}/t")
    t2.append(Seq((1L, "a")).toDF("k", "v"))
    val d2 = t2.createBranch("dev")
    d2.append(Seq((2L, "b"), (3L, "c")).toDF("k", "v")) // ids 2,3
    t2.addCheckConstraint(spark, "k_pos", "k > 0") // no allocation
    t2.mergeBranch("dev")
    t2.append(Seq((9L, "z")).toDF("k", "v"))
    val ids = t2.load(spark).select("id").as[Long].collect()
    assert(ids.length == 4 && ids.distinct.length == 4, ids.toSeq)
  }

  test("drop_branch retain_last widens the still-referenced check " +
    "to vacuum's retained window (r9 advice: sub-head time travel)") {
    val wh = tmp()
    val t = new LogTable(s"$wh/t")
    t.append(batch(1, 3))
    val dev = t.createBranch("dev")
    dev.append(batch(4, 6))
    t.mergeBranch("dev")       // head references _branch_dev files
    t.overwrite(t.load(spark)) // head no longer does; head-1 still
    // a 2-version time-travel window still needs the branch files
    val err = intercept[IllegalArgumentException] {
      t.dropBranch("dev", retainLast = 2)
    }
    assert(err.getMessage.contains("still referenced"))
    // vacuum's default window (head + refs) allows the reclaim
    t.dropBranch("dev")
    assert(!new java.io.File(s"$wh/t/_branch_dev").exists())
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == (1L to 6L))
  }
}
