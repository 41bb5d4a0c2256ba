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
}
