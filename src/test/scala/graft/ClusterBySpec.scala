package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._

/** WRITE-TIME CLUSTERING (`graft.clusterBy` TBLPROPERTIES — Delta's
  * CLUSTER BY shape): every write locally sorts by the cluster key
  * (tight per-file min/max, no shuffle), and compaction
  * range-partitions on it so the compacted files' key ranges stop
  * overlapping — ingest-time local order becomes global skip order
  * exactly at the maintenance step. Rewrites (CoW delete) stay
  * clustered because every write passes the same choke point. */
class ClusterBySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_clby").toString

  private def shuffled(lo: Long, hi: Long) = {
    val rnd = new scala.util.Random(7)
    rnd.shuffle((lo to hi).toList).map(i => (i, s"v$i"))
      .toDF("k", "v")
  }

  private def boundsOf(t: LogTable): Seq[(Long, Long)] =
    t.liveAdds().map { a =>
      val st = a.stats("k")
      (st.min.get.asInstanceOf[Long], st.max.get.asInstanceOf[Long])
    }

  test("appends sort within each written file (tight stats), even " +
    "from a shuffled frame") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(shuffled(0, 0).schema,
      properties = Map(LogTable.PropClusterBy -> "k"))
    t.append(shuffled(0, 199).repartition(2))
    t.load(spark).inputFiles.foreach { f =>
      val ks = spark.read.parquet(f).select("k").as[Long].collect().toSeq
      assert(ks == ks.sorted, s"file $f not sorted on the cluster key")
    }
  }

  test("compaction range-partitions a clustered table: compacted " +
    "file ranges are pairwise non-overlapping and the data is intact") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(shuffled(0, 0).schema,
      properties = Map(LogTable.PropClusterBy -> "k"))
    // interleaved key ranges across appends: bin-packing would keep
    // every file spanning nearly the whole domain
    (0 until 6).foreach(i =>
      t.append(shuffled(0, 299).filter(col("k") % 6 === i)
        .repartition(1)))
    val totalBytes = t.liveAdds().map(_.bytes).sum
    t.compactFiles(spark, targetBytes = totalBytes / 3)
    val bounds = boundsOf(t).sortBy(_._1)
    assert(bounds.size >= 2, s"expected multiple compacted files: $bounds")
    bounds.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping compacted ranges: $bounds")
      case _ => ()
    }
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq ==
      (0L to 299L))
  }

  test("a CoW delete's rewritten survivors stay clustered; an " +
    "unclustered table is untouched by the property machinery") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(shuffled(0, 0).schema,
      properties = Map(LogTable.PropClusterBy -> "k"))
    t.append(shuffled(0, 99).repartition(1))
    t.delete(spark, col("k") % 10 === 3)
    t.load(spark).inputFiles.foreach { f =>
      val ks = spark.read.parquet(f).select("k").as[Long].collect().toSeq
      assert(ks == ks.sorted, s"rewritten file $f lost clustering")
    }
    assert(t.load(spark).count() == 90)
    // control: no property, no reordering obligations — content equal
    val u = new LogTable(s"${tmp()}/u")
    u.append(shuffled(0, 99).repartition(1))
    assert(u.load(spark).count() == 100)
  }

  test("a hive-partitioned clustered table keeps the key sort inside " +
    "each partition's files (the dynamic-partition writer's own sort " +
    "must not scramble it)") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType))),
      partitionBy = Seq("p"), columnMapping = true,
      properties = Map(LogTable.PropClusterBy -> "k"))
    val rnd = new scala.util.Random(11)
    t.append(rnd.shuffle((0L to 199L).toList)
      .map(i => (i, s"v$i", if (i % 2 == 0) "a" else "b"))
      .toDF("k", "v", "p").repartition(2))
    t.load(spark).inputFiles.foreach { f =>
      val ks = spark.read.parquet(f).select("k").as[Long].collect().toSeq
      assert(ks == ks.sorted,
        s"partitioned file $f lost the cluster-key sort")
    }
    // rename/drop of the cluster key refuses (the spec is name-keyed)
    assert(intercept[IllegalArgumentException](
      t.renameColumn(spark, "k", "kk"))
      .getMessage.contains("cluster-key"))
  }

  test("SQL surface: CREATE TABLE ... CLUSTER BY maps to the " +
    "property; INSERTs write key-sorted files; OPTIMIZE " +
    "range-partitions") {
    val wh = java.nio.file.Files.createTempDirectory("graft_clbysql")
    spark.conf.set("spark.sql.catalog.gclby",
      classOf[graft.sources.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gclby.warehouse", wh.toString)
    val tn = s"t_${System.nanoTime}"
    spark.sql(
      s"CREATE TABLE gclby.$tn (k BIGINT, v STRING) USING log " +
        "CLUSTER BY (k)")
    val t = new LogTable(s"$wh/$tn")
    assert(t.tableProperties(LogTable.PropClusterBy) == "k")
    shuffled(0, 199).repartition(1).createOrReplaceTempView(s"src_$tn")
    spark.sql(s"INSERT INTO gclby.$tn SELECT * FROM src_$tn")
    t.load(spark).inputFiles.foreach { f =>
      val ks = spark.read.parquet(f).select("k").as[Long].collect().toSeq
      assert(ks == ks.sorted, s"SQL-inserted file $f not key-sorted")
    }
    // unknown cluster column refuses at create
    intercept[Exception](spark.sql(
      s"CREATE TABLE gclby.${tn}_bad (k BIGINT) USING log " +
        "CLUSTER BY (nope)"))
  }

  test("clusterBy set AFTER create takes effect for later writes " +
    "and the next compaction") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(shuffled(0, 99).repartition(1)) // unclustered epoch
    t.setTableProperties(Map(LogTable.PropClusterBy -> "k"))
    (0 until 3).foreach(i =>
      t.append(shuffled(100, 399).filter(col("k") % 3 === i)
        .repartition(1)))
    val totalBytes = t.liveAdds().map(_.bytes).sum
    t.compactFiles(spark, targetBytes = totalBytes / 3)
    val bounds = boundsOf(t).sortBy(_._1)
    bounds.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping ranges after evolve: $bounds")
      case _ => ()
    }
    assert(t.load(spark).count() == 400)
  }

  test("round-10: 3-column OPTIMIZE ZORDER (generalized Morton) — a " +
    "box on the NON-leading dimensions prunes most files off the " +
    "committed stats (a lexicographic sort could prune none), a " +
    "corner box touches ~1 octant; SQL CLUSTER BY (a,b,c) + CALL " +
    "optimize accept; >6 columns refuse") {
    val t = new LogTable(s"${tmp()}/t")
    val rnd = new scala.util.Random(11)
    val grid = rnd.shuffle((for {
      a <- 0 until 16; b <- 0 until 16; c <- 0 until 16
    } yield (a.toLong, b.toLong, c.toLong)).toVector)
      .toDF("a", "b", "c")
    t.append(grid.repartition(4))
    t.cluster(spark, Seq("a", "b", "c"), nFiles = 8)
    assert(t.load(spark).distinct().count() == 4096L)
    def candidates(box: Map[String, (Long, Long)]): Int =
      t.liveAdds().count { f =>
        box.forall { case (cname, (lo, hi)) =>
          val st = f.stats(cname)
          st.max.get.asInstanceOf[Long] >= lo &&
            st.min.get.asInstanceOf[Long] <= hi
        }
      }
    val total = t.liveAdds().size
    assert(total >= 6, s"expected ~8 files, got $total")
    // b,c box with a unconstrained: files covering the two b<8,c<8
    // octants qualify — a (a,b,c) lexicographic sort would leave
    // EVERY file a candidate (each a-slice spans all of b and c)
    val bc = candidates(Map("b" -> (0L, 3L), "c" -> (0L, 3L)))
    assert(bc * 2 <= total, s"b,c box hit $bc of $total files")
    // corner box on all three dimensions: ~1 octant. The range
    // partitioner's sample seed derives from the GLOBAL rdd id, so
    // file boundaries jitter off exact octant edges depending on
    // what ran before in the JVM — allow a straddling neighbor or
    // two (≤3 of ~8 is still an octant-shaped cut; a lexicographic
    // sort would be discriminated by the b,c box above, not this)
    val abc = candidates(
      Map("a" -> (0L, 3L), "b" -> (0L, 3L), "c" -> (0L, 3L)))
    assert(abc <= 3, s"corner box hit $abc of $total files")
    intercept[IllegalArgumentException] {
      t.cluster(spark, Seq("a", "b", "c", "a", "b", "c", "a"),
        nFiles = 2)
    }
    // SQL: CREATE ... CLUSTER BY (a, b, c) + 3-column CALL optimize
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gcl3",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gcl3.warehouse", wh)
    try {
      val tn = s"t_${System.nanoTime}"
      spark.sql(s"CREATE TABLE gcl3.$tn (a BIGINT, b BIGINT, c BIGINT) " +
        "USING log CLUSTER BY (a, b, c)")
      grid.limit(500).createOrReplaceTempView(s"src_$tn")
      spark.sql(s"INSERT INTO gcl3.$tn SELECT * FROM src_$tn")
      spark.sql(s"CALL gcl3.optimize('$tn', 'a,b,c', 4)")
      assert(spark.sql(s"SELECT count(*) FROM gcl3.$tn")
        .head.getLong(0) == 500L)
      val lt = new LogTable(s"$wh/$tn")
      assert(lt.commitOp(lt.currentVersion.get) == "optimize")
    } finally {
      spark.conf.unset("spark.sql.catalog.gcl3")
      spark.conf.unset("spark.sql.catalog.gcl3.warehouse")
    }
  }

  test("round-10: SCOPED clustering — OPTIMIZE ... WHERE ... ZORDER " +
    "rewrites only the stats-matching files (cost ∝ the scope); " +
    "content invariant; CALL optimize takes both args together") {
    val wh = tmp()
    val t = new LogTable(s"$wh/t")
    // two disjoint key ranges land in separate files
    t.append(shuffled(0, 199).repartition(1))    // file A: k 0..199
    t.append(shuffled(1000, 1199).repartition(1)) // file B: k 1000..
    val before = t.liveAdds().map(_.path).toSet
    assert(before.size == 2)
    val v = t.cluster(spark, Seq("k"), nFiles = 2,
      where = Some(col("k") < 500L))
    assert(t.commitOp(v) == "optimize")
    val after = t.liveAdds().map(_.path).toSet
    // file B (k >= 1000) provably can't match — carried by reference
    val carried = before.intersect(after)
    assert(carried.size == 1, s"before $before after $after")
    // content invariant across the scoped rebuild
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == ((0L to 199L) ++ (1000L to 1199L)))
    // SQL surface: zorder_by + where together
    spark.conf.set("spark.sql.catalog.gclw",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gclw.warehouse", wh)
    try {
      val v2 = spark.sql(
        "CALL gclw.optimize('t', 'k', 2, 'k >= 1000')").as[Long].head()
      assert(new LogTable(s"$wh/t").commitOp(v2) == "optimize")
      assert(spark.sql("SELECT count(*) FROM gclw.t").head.getLong(0)
        == 400L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gclw")
      spark.conf.unset("spark.sql.catalog.gclw.warehouse")
    }
  }

  test("round-11 incremental (liquid-style) clustering: the second " +
    "OPTIMIZE rewrites only the files that arrived since the epoch " +
    "— cost ∝ new data, prior generations untouched; a no-delta " +
    "call is a no-op; changed columns fall back to a full rebuild") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    // three fully interleaved appends: stats prune nothing before
    // clustering
    (0 until 3).foreach(i => t.append(
      shuffled(0, 299).filter(pmod(col("k"), lit(3)) === i)
        .repartition(1)))
    // pass 1: no marker → full rebuild, marker committed atomically
    t.clusterIncremental(spark, Seq("k"), 3)
    val gen1 = t.liveAdds().map(_.path).toSet
    assert(gen1.size == 3)
    assert(t.tableProperties(graft.sources.LogTable.PropClusterEpoch)
      .startsWith("k|"))
    // new data lands (one file), plus nothing else
    t.append(shuffled(300, 399).repartition(1))
    val appended =
      (t.liveAdds().map(_.path).toSet -- gen1).head
    // pass 2: rewrites ONLY the appended file — every generation-1
    // file survives BY IDENTITY (the ∝-new-data claim), the
    // appended file retires, and its replacements carry disjoint
    // k-ranges among themselves off the committed stats
    val v2 = t.clusterIncremental(spark, Seq("k"), 2)
    assert(t.commitOp(v2) == "optimize")
    val after = t.liveAdds().map(_.path).toSet
    assert(gen1.subsetOf(after),
      "a prior-generation file was rewritten by the incremental pass")
    assert(!after.contains(appended), "the new file must re-cluster")
    val newBounds = t.liveAdds().filterNot(a => gen1.contains(a.path))
      .map { a =>
        val st = a.stats("k")
        (st.min.get.asInstanceOf[Long], st.max.get.asInstanceOf[Long])
      }.sortBy(_._1)
    newBounds.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo,
        s"incremental outputs overlap: $newBounds")
      case _ => ()
    }
    // content invariant across both passes
    assert(t.load(spark).select("k").as[Long].collect().sorted.toSeq
      == (0L to 399L))
    // nothing new → no-op (no commit)
    assert(t.clusterIncremental(spark, Seq("k"), 2)
      == t.currentVersion.get)
    assert(t.commitOp(t.currentVersion.get) == "optimize")
    // different cluster columns → the marker doesn't apply: full
    // rebuild rewrites every live file
    val v3 = t.clusterIncremental(spark, Seq("v"), 2)
    assert(t.commitOp(v3) == "optimize")
    assert((t.liveAdds().map(_.path).toSet intersect after).isEmpty,
      "a column change must trigger a full rebuild")
    assert(t.tableProperties(graft.sources.LogTable.PropClusterEpoch)
      .startsWith("v|"))
    // RESTORE soundness (round-11 review): rolling back to a
    // pre-marker version resurrects files that were NOT alive at the
    // marker commit — the next incremental pass must rewrite them
    // instead of trusting the stale whole-table coverage claim
    val restoreDir = s"${tmp()}/t"
    val rt = new LogTable(restoreDir)
    rt.append(shuffled(0, 99).repartition(1))               // v0
    rt.clusterIncremental(spark, Seq("k"), 2)               // v1 marker
    rt.append(shuffled(100, 149).repartition(1))            // v2
    rt.restore(0L)                                          // v3: F back
    val resurrected = rt.liveAdds().map(_.path).toSet
    rt.clusterIncremental(spark, Seq("k"), 2)               // must act
    assert((rt.liveAdds().map(_.path).toSet
      intersect resurrected).isEmpty,
      "restored pre-marker files were skipped as already clustered")
    assert(rt.load(spark).select("k").as[Long].collect().sorted.toSeq
      == (0L to 99L))
    // SQL surface: CALL optimize(..., incremental => true) — only
    // the newly-appended file rewrites, prior generation survives
    t.append(shuffled(400, 449).repartition(1))
    val wh = new java.io.File(dir).getParent
    spark.conf.set("spark.sql.catalog.gclinc",
      "graft.sources.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.gclinc.warehouse", wh)
    try {
      val gen2 = t.liveAdds().map(_.path).toSet
      val appended2 = gen2 -- t.liveAdds(Some(v3)).map(_.path).toSet
      val v4 = spark.sql(
        "CALL gclinc.optimize('t', 'v', 2, incremental => true)")
        .as[Long].head()
      assert(t.commitOp(v4) == "optimize")
      val after4 = t.liveAdds().map(_.path).toSet
      assert((gen2 -- appended2).subsetOf(after4))
      assert(appended2.forall(p => !after4.contains(p)))
      // incremental and where are mutually exclusive
      val err = intercept[Exception](spark.sql(
        "CALL gclinc.optimize('t', 'v', 2, 'k > 0', true)").collect())
      assert(err.getMessage.contains("not both"), err.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.gclinc")
      spark.conf.unset("spark.sql.catalog.gclinc.warehouse")
    }
  }
}
