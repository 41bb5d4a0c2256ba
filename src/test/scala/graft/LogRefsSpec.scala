package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._

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

  test("fast-forward refuses when main advanced past the fork; ref " +
    "bookkeeping commits do not block it") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(batch(1, 3))
    val b = t.createBranch("dev")
    b.append(batch(4, 6))
    t.createTag("checkpoint") // a ref commit on main — harmless
    val v = t.mergeBranch("dev")
    assert(t.load(spark).count() == 6L)
    val b2 = t.createBranch("dev2")
    b2.append(batch(7, 9))
    t.append(batch(100, 101)) // main moves: data commit after fork
    intercept[java.util.ConcurrentModificationException] {
      t.mergeBranch("dev2")
    }
    // main kept its own state; the branch is still intact
    assert(t.load(spark).count() == 8L)
    assert(t.branchTable("dev2").load(spark).count() == 9L)
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
}
