package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._

/** SQL stored procedures over log tables (Spark 4 ProcedureCatalog):
  * every table-maintenance verb reachable as `CALL cat.proc(...)`
  * with no graft API in sight. */
class LogProcedureSpec extends SparkSpec {
  import spark.implicits._

  // one catalog NAME per test: Spark caches catalog instances by
  // name, so re-pointing the same name at a new warehouse would keep
  // serving the old one
  private val catSeq = new java.util.concurrent.atomic.AtomicInteger

  private def withCatalog(f: (String, LogTable) => Unit): Unit = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_proc").toString
    val cat = s"gproc${catSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    try {
      val t = new LogTable(s"$dir/t")
      t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
        .repartition(1))
      f(cat, t)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("CALL mirror_delta / mirror_iceberg / convert_from_delta / " +
    "convert_from_iceberg: the interop layer is reachable from " +
    "plain SQL") {
    withCatalog { (cat, t) =>
      // mirror the table as a Delta log, one CALL at a time
      val exported = spark.sql(s"CALL $cat.mirror_delta('t')")
        .as[Long].collect().toSeq
      assert(exported == Seq(0L))
      assert(spark.sql(s"CALL $cat.mirror_delta('t')").count() == 0L,
        "a current mirror must report no newly exported versions")
      t.delete(spark, col("k") === 2L) // v1
      assert(spark.sql(s"CALL $cat.mirror_delta('t')")
        .as[Long].collect().toSeq == Seq(1L))
      // and as Iceberg metadata (retention knobs included)
      val p = spark.sql(
        s"CALL $cat.mirror_iceberg('t', keep_metadata => 2)")
        .as[String].head()
      assert(p.endsWith("v1.metadata.json"), p)
      assert(spark.sql(s"CALL $cat.mirror_iceberg('t')").count() == 0L)
      // convert: strip the graft log, CALL rebuilds it in place from
      // the Delta mirror, and the catalog serves the converted table
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(t.path, "_log"))
      val cv = spark.sql(s"CALL $cat.convert_from_delta('t')")
        .as[Long].head()
      assert(cv == 1L)
      assert(spark.sql(s"SELECT k FROM $cat.t").as[Long]
        .collect().toSet == Set(1L, 3L))
      // and the Iceberg convert path, from the Iceberg metadata
      rm(new java.io.File(t.path, "_log"))
      rm(new java.io.File(t.path, "_delta_log"))
      val cv2 = spark.sql(s"CALL $cat.convert_from_iceberg('t')")
        .as[Long].head()
      assert(cv2 == 1L)
      assert(spark.sql(s"SELECT k FROM $cat.t").as[Long]
        .collect().toSet == Set(1L, 3L))
    }
  }

  test("CALL restore rolls back and returns the new version; " +
    "history lists every commit") {
    withCatalog { (cat, t) =>
      t.delete(spark, col("k") === 2L) // v1
      val v = spark.sql(s"CALL $cat.restore('t', 0)")
        .as[Long].head()
      assert(v == 2L)
      assert(t.load(spark).count() == 3L)
      val hist = spark.sql(s"CALL $cat.history('t')")
        .select("version", "op").as[(Long, String)].collect().toSeq
      assert(hist.map(_._2) == Seq("append", "delete", "restore"))
    }
  }

  test("CALL optimize bin-packs; with zorder_by it clusters; " +
    "namespace-qualified CALL works (cat.system.x)") {
    withCatalog { (cat, t) =>
      t.append(Seq((4L, "d")).toDF("k", "v").repartition(1))
      val v1 = spark.sql(s"CALL $cat.system.optimize('t')").as[Long].head()
      assert(t.commitOp(v1) == "optimize")
      assert(t.liveAdds().size == 1)
      val v2 = spark.sql(s"CALL $cat.optimize('t', 'k', 2)")
        .as[Long].head()
      assert(t.commitOp(v2) == "optimize")
      assert(t.load(spark).count() == 4L)
    }
  }

  test("CALL detail reports the table's metadata in one row") {
    withCatalog { (cat, t) =>
      t.deleteMor(spark, col("k") === 2L)
      val d = spark.sql(s"CALL $cat.detail('t')").collect().head
      assert(d.getAs[Long]("version") == t.currentVersion.get)
      assert(d.getAs[Long]("num_files") == 1L)
      assert(d.getAs[Long]("num_rows") == 2L) // logical, minus the dv
      assert(d.getAs[Long]("dv_files") == 1L)
    }
  }

  test("CALL purge_deletes materializes deletion vectors; CALL " +
    "vacuum (named args) drops expired files and reports them") {
    withCatalog { (cat, t) =>
      t.deleteMor(spark, col("k") === 2L)
      assert(t.liveAdds().exists(_.dv.isDefined))
      spark.sql(s"CALL $cat.purge_deletes('t')").collect()
      assert(t.liveAdds().forall(_.dv.isEmpty))
      // dry run reports the same candidates and deletes nothing
      val wouldDrop = spark.sql(
        s"CALL $cat.vacuum(`table` => 't', retain_last => 1, " +
          "retention_hours => 0, dry_run => true)")
        .as[String].collect().toSeq
      assert(wouldDrop.nonEmpty)
      wouldDrop.foreach(p =>
        assert(new java.io.File(t.path, p).exists(), s"$p deleted by dry run"))
      val dropped = spark.sql(
        s"CALL $cat.vacuum(`table` => 't', retain_last => 1, " +
          "retention_hours => 0)")
        .as[String].collect().toSeq
      assert(dropped.toSet == wouldDrop.toSet)
      assert(t.load(spark).count() == 2L)
    }
  }

  test("round-10: CALL restore by TIMESTAMP — an instant between " +
    "commits restores the snapshot current then; named arg, epoch " +
    "millis, and the version/timestamp exclusivity all work") {
    withCatalog { (cat, t) =>
      Thread.sleep(40)
      t.delete(spark, col("k") === 2L) // v1
      val ts0 = t.commitTime(0L)
      val ts1 = t.commitTime(1L)
      val mid = ts0 + (ts1 - ts0) / 2 // strictly between v0 and v1
      def iso(ms: Long): String = java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val v = spark.sql(
        s"CALL $cat.restore('t', timestamp => '${iso(mid)}')")
        .as[Long].head()
      assert(t.commitOp(v) == "restore")
      assert(t.load(spark).count() == 3L) // v0's state is back
      // integer-string convention (round-11): a pure-integer
      // argument means a VERSION everywhere (table_changes' rule) —
      // restore's timestamp parameter REFUSES it and points at the
      // version parameter instead of treating it as epoch millis
      t.delete(spark, col("k") === 3L)
      val tsDel = t.commitTime(t.currentVersion.get)
      val intErr = intercept[Exception](spark.sql(
        s"CALL $cat.restore('t', timestamp => '$tsDel')").collect())
      assert(intErr.getMessage.contains("version"), intErr.getMessage)
      spark.sql(s"CALL $cat.restore('t', timestamp => '${iso(tsDel)}')")
      assert(t.load(spark).count() == 2L)
      // exactly one of version/timestamp
      intercept[Exception](spark.sql(
        s"CALL $cat.restore('t', 0, '${iso(mid)}')").collect())
      intercept[Exception](spark.sql(
        s"CALL $cat.restore('t')").collect())
    }
  }

  test("the procedure REGISTRY is pinned: every maintenance verb is " +
    "CALLable, drift fails here first") {
    // the full surface, alphabetical — adding a procedure without
    // extending this list (or vice versa) must fail a test, not ship
    // silently
    val expected = Set(
      "analyze_table", "checkpoint", "clone", "convert_from_delta",
      "convert_from_iceberg", "create_branch", "create_mv",
      "create_tag", "detail", "drop_branch", "drop_ref",
      "expire_snapshots", "history", "merge_branch", "mirror_delta",
      "mirror_iceberg", "optimize", "purge_deletes", "refresh_mv",
      "restore", "set_partition", "set_properties", "show_refs",
      "unset_properties", "vacuum")
    val names = graft.sources.GraftProcedure.Names
    assert(names == expected,
      s"registry drift: +${(names -- expected).toSeq.sorted} " +
        s"-${(expected -- names).toSeq.sorted}")
    // and each one BINDS through a real catalog (parameters +
    // output schema resolve; a typo'd case match would throw here)
    withCatalog { (cat, t) =>
      val catalog = spark.sessionState.catalogManager
        .catalog(cat)
        .asInstanceOf[org.apache.spark.sql.connector.catalog
          .ProcedureCatalog]
      expected.foreach { n =>
        val proc = catalog.loadProcedure(
          org.apache.spark.sql.connector.catalog.Identifier
            .of(Array.empty, n))
        assert(proc.name() == n)
      }
    }
  }

  test("CALL set_properties / unset_properties / checkpoint: the " +
    "round-15 maintenance verbs work end to end") {
    withCatalog { (cat, t) =>
      val v1 = spark.sql(s"CALL $cat.set_properties('t', " +
        "'owner=etl, tier=gold')").as[Long].head()
      assert(v1 == t.currentVersion.get)
      assert(t.tableProperties.get("owner").contains("etl"))
      assert(t.tableProperties.get("tier").contains("gold"))
      val v2 = spark.sql(
        s"CALL $cat.unset_properties('t', 'tier')").as[Long].head()
      assert(v2 == v1 + 1)
      assert(t.tableProperties.get("tier").isEmpty)
      assert(t.tableProperties.get("owner").contains("etl"))
      // checkpoint: not a commit — the version does not move, but
      // the head resolves from the pointer afterwards
      val v3 = spark.sql(s"CALL $cat.checkpoint('t')").as[Long].head()
      assert(v3 == v2)
      assert(t.currentVersion.contains(v2))
      val fresh = new LogTable(t.path)
      assert(fresh.load(spark).count() == 3L)
    }
  }
}
