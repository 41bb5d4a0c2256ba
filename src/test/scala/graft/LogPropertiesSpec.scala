package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Free-form TBLPROPERTIES on the transaction-log table: create-time
  * seeding, SET/UNSET metadata commits (full-map, head-pinned),
  * checkpoint round-trip, time travel, and the SQL surfaces (ALTER
  * TABLE SET/UNSET TBLPROPERTIES, SHOW TBLPROPERTIES, CALL detail). */
class LogPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_props").toString

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("create seeds properties; SET merges; UNSET drops; absent " +
    "UNSET keys are ignored; commits are metadata-only") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(schema, properties = Map("tier" -> "bronze", "team" -> "etl"))
    assert(t.tableProperties == Map("tier" -> "bronze", "team" -> "etl"))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val before = t.currentVersion.get
    t.setTableProperties(Map("tier" -> "silver", "retention" -> "30"))
    assert(t.tableProperties == Map(
      "tier" -> "silver", "team" -> "etl", "retention" -> "30"))
    t.unsetTableProperties(Seq("team", "no_such_key"))
    assert(t.tableProperties == Map(
      "tier" -> "silver", "retention" -> "30"))
    // both commits metadata-only: no files added or removed, data
    // unchanged
    assert(t.commitOp(before + 1) == "tblproperties")
    assert(t.commitOp(before + 2) == "tblproperties")
    assert(t.load(spark).count() == 1L)
    assert(t.liveAdds().size == 1)
  }

  test("properties refuse on a nonexistent table (no bricked dir)") {
    val t = new LogTable(s"${tmp()}/t")
    intercept[IllegalStateException] {
      t.setTableProperties(Map("a" -> "b"))
    }
    assert(!t.exists)
  }

  test("properties survive checkpoints and resolve per-version " +
    "under time travel") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(schema, properties = Map("tier" -> "bronze"))
    val v0 = t.currentVersion.get
    // push past a checkpoint boundary so the replay starts from the
    // checkpointed state, not version 0
    (1 to 12).foreach(i => t.append(Seq((i.toLong, "x")).toDF("k", "v")))
    t.setTableProperties(Map("tier" -> "gold"))
    (1 to 12).foreach(i => t.append(Seq((i.toLong, "y")).toDF("k", "v")))
    // a FRESH handle resolves through the checkpoint, not a replay
    // from version 0
    val t2 = new LogTable(dir)
    assert(t2.tableProperties == Map("tier" -> "gold"))
    // data reads at a pre-SET version still work (the property
    // commit did not disturb snapshot replay)
    assert(t2.load(spark, Some(v0)).count() == 0L)
    assert(t2.load(spark, Some(v0 + 12)).count() == 12L)
    assert(t2.load(spark).count() == 24L)
  }

  test("SQL surface: CREATE TABLE TBLPROPERTIES seeds free keys, " +
    "ALTER TABLE SET/UNSET commits, SHOW TBLPROPERTIES and CALL " +
    "detail read back; reserved keys are rejected") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gprops",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gprops.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gprops.t (k BIGINT, v STRING) USING log " +
        "TBLPROPERTIES ('tier' = 'bronze', 'bloom' = 'k')")
      val t = new LogTable(s"$wh/t")
      // 'bloom' is a feature knob, not a free property
      assert(t.tableProperties == Map("tier" -> "bronze"))
      assert(t.bloomCols == Seq("k"))
      spark.sql("ALTER TABLE gprops.t SET TBLPROPERTIES " +
        "('tier' = 'silver', 'owner.team' = 'data')")
      spark.sql("ALTER TABLE gprops.t UNSET TBLPROPERTIES ('owner.team')")
      assert(t.tableProperties == Map("tier" -> "silver"))
      val shown = spark.sql("SHOW TBLPROPERTIES gprops.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(shown.get("tier").contains("silver"))
      val d = spark.sql("CALL gprops.detail('t')").collect().head
      assert(d.getAs[String]("properties") == "tier: silver")
      intercept[Exception] {
        spark.sql("ALTER TABLE gprops.t SET TBLPROPERTIES " +
          "('identity.k' = 'start=1')")
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.gprops")
      spark.conf.unset("spark.sql.catalog.gprops.warehouse")
    }
  }

  test("streams skip tblproperties commits (dataChange = false)") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(schema)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.setTableProperties(Map("tier" -> "x"))
    t.append(Seq((2L, "b")).toDF("k", "v"))
    val out = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", dir).load()
    val q = out.writeStream.format("memory")
      .queryName("props_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("props_stream").count() == 2L)
  }
}
