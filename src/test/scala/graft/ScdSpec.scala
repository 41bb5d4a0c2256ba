package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val history = Seq(
    // key, ts, attr — k1 changes A->B->B(collapse)->C, k2 stays X
    (1L, ts("2024-01-01 00:00:00"), "A"),
    (1L, ts("2024-01-02 00:00:00"), "B"),
    (1L, ts("2024-01-03 00:00:00"), "B"),
    (1L, ts("2024-01-04 00:00:00"), "C"),
    (2L, ts("2024-01-01 00:00:00"), "X"),
    (2L, ts("2024-01-05 00:00:00"), "X")
  ).toDF("k", "t", "attr")

  test("latestPerKey keeps one deterministic row per key") {
    val out = Scd.latestPerKey(history, Seq("k"), Seq(col("t")))
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("attr") == "C")
    assert(out(1).getAs[java.sql.Timestamp]("t") == ts("2024-01-05 00:00:00"))
  }

  test("scd2FromHistory collapses runs and closes versions") {
    val dim = Scd.scd2FromHistory(history, Seq("k"), "t", Seq("attr"))
      .orderBy("k", "valid_from").collect()
    // k1: A[1..2), B[2..4), C[4..null); k2: X[1..null)
    assert(dim.length == 4)
    val k1 = dim.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[String]("attr")).toSeq == Seq("A", "B", "C"))
    assert(k1(0).getAs[java.sql.Timestamp]("valid_to") == ts("2024-01-02 00:00:00"))
    assert(k1(1).getAs[java.sql.Timestamp]("valid_to") == ts("2024-01-04 00:00:00"))
    assert(k1(2).getAs[java.sql.Timestamp]("valid_to") == null)
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, true))
    assert(dim.filter(_.getLong(0) == 2L).length == 1)
  }

  test("scd2ApplySnapshot closes versions for keys missing from the snapshot") {
    val dim = Scd.scd2FromHistory(history, Seq("k"), "t", Seq("attr"))
    // snapshot: k1 unchanged ('C'), k3 new, k2 ABSENT → delete
    val snap = Seq((1L, "C"), (3L, "N")).toDF("k", "attr")
    val t0 = ts("2024-02-01 00:00:00")
    val out = Scd.scd2ApplySnapshot(dim, snap, Seq("k"), Seq("attr"), t0)
      .orderBy("k", "valid_from").collect()
    // k1: 3 untouched versions; k2: X closed at t0, no new version;
    // k3: N opened at t0
    assert(out.length == 5)
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1)
    assert(!k2(0).getAs[Boolean]("is_current"))
    assert(k2(0).getAs[java.sql.Timestamp]("valid_to") == t0)
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.length == 1 && k3(0).getAs[Boolean]("is_current") &&
      k3(0).getAs[java.sql.Timestamp]("valid_from") == t0)
    assert(out.count(_.getAs[Boolean]("is_current")) == 2) // k1 'C', k3 'N'
  }

  test("scd2Merge applies a batch like the reference MERGE") {
    val dim = Scd.scd2FromHistory(history, Seq("k"), "t", Seq("attr"))
    val batch = Seq((1L, "C"), (2L, "Y"), (3L, "N")).toDF("k", "attr")
    val t0 = ts("2024-02-01 00:00:00")
    val out = Scd.scd2Merge(dim, batch, Seq("k"), Seq("attr"), t0)
      .orderBy("k", "valid_from").collect()
    // k1 'C' unchanged → untouched (3 rows); k2 X closed + Y opened;
    // k3 N inserted.
    assert(out.length == 6)
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 2)
    val closed = k2.find(!_.getAs[Boolean]("is_current")).get
    assert(closed.getAs[java.sql.Timestamp]("valid_to") == t0)
    val opened = k2.find(_.getAs[Boolean]("is_current")).get
    assert(opened.getAs[String]("attr") == "Y")
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.length == 1 && k3(0).getAs[Boolean]("is_current"))
    // idempotence: re-merging the same batch changes nothing
    val again = Scd.scd2Merge(
      Scd.scd2Merge(dim, batch, Seq("k"), Seq("attr"), t0),
      batch, Seq("k"), Seq("attr"), ts("2024-03-01 00:00:00"))
    assert(again.count() == 6)
  }

  test("scd1Upsert is last-writer-wins with inserts") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val upd = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    val out = Scd.scd1Upsert(base, upd, Seq("k"), Seq("v"))
      .orderBy("k").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("changeDetect classifies new/changed/unchanged incl. null attrs") {
    val current = Seq((1L, "a"), (2L, "b"), (4L, null)).toDF("k", "v")
    val incoming = Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, null))
      .toDF("k", "v")
    val out = Scd.changeDetect(incoming, current, Seq("k"), Seq("v"))
      .orderBy("k").select("change_type").as[String].collect()
    assert(out.toSeq == Seq("unchanged", "changed", "new", "unchanged"))
  }

  test("changeFeed emits CDF rows for insert/delete/update, none for unchanged") {
    val pre = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "s", "v")
    val post = Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40))
      .toDF("k", "s", "v")
    val out = Scd.changeFeed(pre, post, Seq("k"))
      .orderBy("k", "_change_type")
      .as[(Long, String, Int, String)].collect().toSeq
    assert(out == Seq(
      (2L, "B", 20, "update_postimage"),
      (2L, "b", 20, "update_preimage"),
      (3L, "c", 30, "delete"),
      (4L, "d", 40, "insert")))
    // null attr vs empty string must NOT hash equal
    val preN = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    val postN = Seq((1L, "")).toDF("k", "s")
    assert(Scd.changeFeed(preN, postN, Seq("k")).count() == 2)
  }
}
