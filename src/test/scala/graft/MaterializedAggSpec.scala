package graft

import graft.sources.{LogTable, MaterializedAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained materialized aggregates over log tables:
  * the refreshed view must be bit-identical to a from-scratch
  * group-by of the base after ANY sequence of appends / deletes /
  * updates / overwrites, refresh must be exactly-once under replay,
  * a no-change refresh must not commit, and a RESTORE in the window
  * must fall back to a full rebuild. */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mv").toString

  private def baseRows(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"g${i % 7}",
      if (i % 11 == 0) None else Some(i * 1.5)))
      .toDF("id", "grp", "x")

  /** From-scratch reference aggregate with the MV's exact algebra. */
  private def reference(base: LogTable): DataFrame =
    base.load(spark).groupBy("grp").agg(
      count(lit(1)).as("cnt"),
      when(count(col("x")) === 0L, lit(null).cast(DecimalType(38, 4)))
        .otherwise(sum(col("x").cast("decimal(28,4)"))
          .cast(DecimalType(38, 4))).as("sum_v"))

  private def assertMatches(mvPath: String, base: LogTable): Unit = {
    val got = MaterializedAgg.read(spark, mvPath)
      .orderBy("grp").collect().toSeq
    val want = reference(base).orderBy("grp").collect().toSeq
    assert(got == want)
  }

  test("seed equals a from-scratch group-by; incremental refresh " +
    "tracks appends, deletes and updates exactly") {
    val dir = tmp()
    val base = new LogTable(s"$dir/base")
    base.append(baseRows(200).filter(col("id") <= 100L))
    MaterializedAgg.create(spark, base.path, s"$dir/mv",
      Seq("grp"), "x")
    assertMatches(s"$dir/mv", base)

    base.append(baseRows(200).filter(col("id") > 100L))
    base.delete(spark, col("id") % 5L === 0L)
    base.update(spark, col("grp") === "g3",
      Map("x" -> (coalesce(col("x"), lit(0.0)) * 3)))
    val r = MaterializedAgg.refresh(spark, s"$dir/mv")
    assert(r.mode == "incremental")
    assertMatches(s"$dir/mv", base)
  }

  test("keys whose count reaches zero are DELETED from the view, " +
    "new keys are inserted") {
    val dir = tmp()
    val base = new LogTable(s"$dir/base")
    base.append(Seq((1L, "only", Some(2.0)), (2L, "keep", Some(3.0)))
      .toDF("id", "grp", "x"))
    MaterializedAgg.create(spark, base.path, s"$dir/mv", Seq("grp"), "x")
    base.delete(spark, col("grp") === "only")
    base.append(Seq((3L, "fresh", Some(7.0))).toDF("id", "grp", "x"))
    MaterializedAgg.refresh(spark, s"$dir/mv")
    val grps = MaterializedAgg.read(spark, s"$dir/mv")
      .select("grp").as[String].collect().toSet
    assert(grps == Set("keep", "fresh"))
    assertMatches(s"$dir/mv", base)
  }

  test("refresh with no new base commits is a no-op (no new MV " +
    "version); replaying a refresh never double-applies") {
    val dir = tmp()
    val base = new LogTable(s"$dir/base")
    base.append(baseRows(50))
    MaterializedAgg.create(spark, base.path, s"$dir/mv", Seq("grp"), "x")
    val mv = new LogTable(s"$dir/mv")
    val v1 = mv.currentVersion.get
    assert(MaterializedAgg.refresh(spark, s"$dir/mv").mode == "noop")
    assert(mv.currentVersion.get == v1)

    base.append(baseRows(80).filter(col("id") > 50L))
    MaterializedAgg.refresh(spark, s"$dir/mv")
    val v2 = mv.currentVersion.get
    // replay of the same window: deduplicated at the commit layer
    assert(MaterializedAgg.refresh(spark, s"$dir/mv").mode == "noop")
    assert(mv.currentVersion.get == v2)
    assertMatches(s"$dir/mv", base)
  }

  test("a zero-net-effect window advances the watermark with a " +
    "metadata-only marker commit") {
    val dir = tmp()
    val base = new LogTable(s"$dir/base")
    base.append(Seq((1L, "a", Some(1.0))).toDF("id", "grp", "x"))
    MaterializedAgg.create(spark, base.path, s"$dir/mv", Seq("grp"), "x")
    // add then remove the same row: net delta per key is zero
    base.append(Seq((99L, "a", Some(5.0))).toDF("id", "grp", "x"))
    base.delete(spark, col("id") === 99L)
    val r = MaterializedAgg.refresh(spark, s"$dir/mv")
    assert(r.mode == "incremental")
    val mv = new LogTable(s"$dir/mv")
    assert(mv.commitOp(mv.currentVersion.get) == "refresh")
    // watermark advanced: nothing to re-read
    assert(MaterializedAgg.refresh(spark, s"$dir/mv").mode == "noop")
    assertMatches(s"$dir/mv", base)
  }

  test("a RESTORE on the base falls back to a full rebuild (the " +
    "change feed cannot represent a rewind)") {
    val dir = tmp()
    val base = new LogTable(s"$dir/base")
    base.append(baseRows(30))
    val preV = base.currentVersion.get
    MaterializedAgg.create(spark, base.path, s"$dir/mv", Seq("grp"), "x")
    base.append(baseRows(60).filter(col("id") > 30L))
    base.restore(preV)
    val r = MaterializedAgg.refresh(spark, s"$dir/mv")
    assert(r.mode == "full")
    assertMatches(s"$dir/mv", base)
  }

  test("SQL surface: CALL create_mv / refresh_mv; definition rides " +
    "TBLPROPERTIES") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gmv",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gmv.warehouse", wh)
    try {
      val base = new LogTable(s"$wh/base")
      base.append(baseRows(40))
      spark.sql("CALL gmv.create_mv('base', 'mv', 'grp', 'x')")
      val mv = new LogTable(s"$wh/mv")
      // keys persist as a JSON array since round 10
      assert(mv.tableProperties(MaterializedAgg.PropKeys) == "[\"grp\"]")
      base.append(baseRows(70).filter(col("id") > 40L))
      val r = spark.sql("CALL gmv.refresh_mv('mv')").collect().head
      assert(r.getAs[String]("mode") == "incremental")
      assertMatches(s"$wh/mv", base)
    } finally {
      spark.conf.unset("spark.sql.catalog.gmv")
      spark.conf.unset("spark.sql.catalog.gmv.warehouse")
    }
  }

  test("withMinMax: deleting a group's max re-derives it from a " +
    "group-scoped re-scan — bit-equal to a full rebuild; vanished " +
    "groups DELETE, new groups INSERT, untouched files survive") {
    def referenceMM(base: LogTable): DataFrame =
      base.load(spark).groupBy("grp").agg(
        count(lit(1)).as("cnt"),
        when(count(col("x")) === 0L, lit(null).cast(DecimalType(38, 4)))
          .otherwise(sum(col("x").cast("decimal(28,4)"))
            .cast(DecimalType(38, 4))).as("sum_v"),
        min(col("x")).as("min_v"), max(col("x")).as("max_v"))
    def check(mvPath: String, base: LogTable): Unit =
      assert(MaterializedAgg.read(spark, mvPath)
        .orderBy("grp").collect().toSeq ==
        referenceMM(base).orderBy("grp").collect().toSeq)

    val dir = tmp()
    val base = new LogTable(s"$dir/base")
    base.append(baseRows(100))
    MaterializedAgg.create(spark, base.path, s"$dir/mv",
      Seq("grp"), "x", withMinMax = true)
    check(s"$dir/mv", base)
    val mv = new LogTable(s"$dir/mv")
    val before = mv.liveAdds().map(_.path).toSet
    // one window with all three shapes: g1 loses its max row (no
    // signed fold can recover the new max — only a re-scan), g2
    // vanishes wholesale, g9 is brand new
    base.delete(spark, col("id") === 99L) // g1's max (99*1.5)
    base.delete(spark, col("grp") === "g2")
    base.append(Seq((1001L, "g9", Some(7.5)), (1002L, "g9", None))
      .toDF("id", "grp", "x"))
    val r = MaterializedAgg.refresh(spark, s"$dir/mv")
    assert(r.mode == "rescan")
    check(s"$dir/mv", base)
    assert(MaterializedAgg.read(spark, s"$dir/mv")
      .filter(col("grp") === "g2").isEmpty)
    // the re-scan is group-scoped: view files holding only untouched
    // groups carry by reference (when the seed spread over >1 file)
    val after = mv.liveAdds().map(_.path).toSet
    if (before.size > 1)
      assert(before.intersect(after).nonEmpty,
        "every view file was rewritten — the re-scan was not scoped")
    // second window exercises replay-idempotence on the rescan path
    base.update(spark, col("grp") === "g4" && col("id") < 20L,
      Map("x" -> lit(1000.0)))
    val r2 = MaterializedAgg.refresh(spark, s"$dir/mv")
    assert(r2.mode == "rescan")
    val r3 = MaterializedAgg.refresh(spark, s"$dir/mv")
    assert(r3.mode == "noop")
    check(s"$dir/mv", base)
  }

  test("round-10: the key list encodes as a JSON array — a " +
    "comma-named key column round-trips losslessly; a pre-r10 " +
    "comma-joined definition still reads (back-compat)") {
    val dir = tmp()
    val base = new LogTable(s"$dir/base")
    base.append(Seq(("x", 1L, 10.0), ("y", 2L, 20.0), ("x", 1L, 5.0))
      .toDF("a,b", "seg", "v"))
    MaterializedAgg.create(spark, base.path, s"$dir/mv",
      Seq("a,b", "seg"), "v")
    base.append(Seq(("x", 1L, 2.5), ("z", 3L, 7.0))
      .toDF("a,b", "seg", "v"))
    val r = MaterializedAgg.refresh(spark, s"$dir/mv")
    assert(r.mode == "incremental")
    val got = MaterializedAgg.read(spark, s"$dir/mv")
      .orderBy(col("`a,b`"), col("seg"))
      .select(col("`a,b`"), col("seg"), col("cnt")).collect().toSeq
    val want = base.load(spark).groupBy(col("`a,b`"), col("seg"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("`a,b`"), col("seg")).collect().toSeq
    assert(got == want)
    // back-compat: rewrite the definition in the OLD comma-joined
    // form (a pre-r10 view) — defOf still parses and refresh works
    val dir2 = tmp()
    val base2 = new LogTable(s"$dir2/base")
    base2.append(Seq(("g1", 1.0), ("g2", 2.0)).toDF("grp", "x"))
    MaterializedAgg.create(spark, base2.path, s"$dir2/mv",
      Seq("grp"), "x")
    val mv2 = new LogTable(s"$dir2/mv")
    mv2.setTableProperties(Map(MaterializedAgg.PropKeys -> "grp"))
    base2.append(Seq(("g1", 3.0)).toDF("grp", "x"))
    val r2 = MaterializedAgg.refresh(spark, s"$dir2/mv")
    assert(r2.mode == "incremental")
    assert(MaterializedAgg.read(spark, s"$dir2/mv")
      .filter(col("grp") === "g1").select("cnt").as[Long].head() == 2L)
  }
}
