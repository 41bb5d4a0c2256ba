package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Storage-layout behaviors: bucketed co-located joins and
  * partition pruning — asserted on the PHYSICAL plan, not just the
  * result, because the whole point is which exchanges/scans the
  * planner emits. */
class LayoutSpec extends SparkSpec {

  test("same-bucketing join plans with zero exchange") {
    val sf = "/root/testdata/sf0.001"
    Tables.writeBucketed(Tables.load(spark, sf, "orders"),
      "t_orders_b", "/tmp/graft_test_buckets/orders", 4, Seq("o_orderkey"))
    Tables.writeBucketed(Tables.load(spark, sf, "lineitem"),
      "t_lineitem_b", "/tmp/graft_test_buckets/lineitem", 4, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("t_orders_b")
        .join(spark.table("t_lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned write + predicate scans only matching partitions") {
    val sf = "/root/testdata/sf0.001"
    val path = "/tmp/graft_test_part/events"
    Tables.writePartitioned(Tables.load(spark, sf, "events"), path,
      Seq("event_type"))
    val q = spark.read.parquet(path)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val s = scan.toString
    assert(s.contains("PartitionFilters") &&
      s.contains("event_type"), s"no partition filter pushed:\n$s")
    // pruning is real: the executed scan reads strictly fewer files
    // than the dataset holds (inputFiles is logical — pre-pruning)
    q.collect()
    val read = q.queryExecution.executedPlan.collectLeaves().head
      .metrics("numFiles").value
    val all = spark.read.parquet(path).inputFiles.length
    assert(read < all, s"scan read $read/$all files")
  }

  test("z-order layout clusters 2-D boxes into few files") {
    import spark.implicits._
    // Morton kernel bit-exactness against a reference interleave
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    for ((a, b) <- Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
        (12345L, 54321L), (70000L, -5L))) {
      val clamped = (math.min(math.max(a, 0L), 65535L),
        math.min(math.max(b, 0L), 65535L))
      val got = graft.plans.ZOrder.interleave16(a, b)
      assert(got == ref(clamped._1, clamped._2), s"($a,$b)")
    }
    // two independent uniform dimensions, written z-ordered vs
    // single-column-sorted; a small 2-D box must touch far fewer
    // files under z-order than under the lexicographic layout
    val n = 40000
    // full 200×200 grid: x and y genuinely independent
    val df = (0 until n).map(i => (i.toLong, (i % 200).toLong,
      (i / 200).toLong)).toDF("id", "x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("graft_z_spec")
    val zPath = tmp.resolve("z").toString
    val lexPath = tmp.resolve("lex").toString
    Tables.writeZOrdered(df, zPath, "x", "y", nFiles = 16)
    df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.parquet(lexPath)
    def filesTouched(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("x") >= 20 && col("x") < 40 &&
          col("y") >= 20 && col("y") < 40)
      q.select(org.apache.spark.sql.functions.input_file_name())
        .distinct().count()
    }
    val zf = filesTouched(zPath)
    val lf = filesTouched(lexPath)
    // the box is 1% of the plane: z-order confines it to a corner of
    // the curve; the lexicographic layout slices it across every
    // x-range file
    assert(zf < lf, s"z-order touched $zf files, lexicographic $lf")
    assert(zf <= 8, s"z-order box spread over $zf of 16 files")
    // content preserved
    assert(spark.read.parquet(zPath).count() == n)
  }

  test("manifest pruning skips files and preserves the filtered set") {
    val sf = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, sf, "orders")
    val tmp = java.nio.file.Files.createTempDirectory("graft_mani_spec")
    val p = tmp.resolve("orders_clustered").toString
    orders.repartitionByRange(16, col("o_totalprice"))
      .sortWithinPartitions(col("o_totalprice"))
      .write.mode("overwrite").parquet(p)
    val manifest = Tables.buildManifest(spark, p, "o_totalprice")
    val total = manifest.count()
    assert(total >= 8, s"expected many files, got $total")
    val files = Tables.pruneFiles(manifest, lit(30000.0), lit(45000.0))
    assert(files.nonEmpty && files.length < total / 2,
      s"band should prune most files: kept ${files.length} of $total")
    val pruned = Tables.manifestPrunedRead(spark, p, files.toSeq,
        "o_totalprice", lit(30000.0), lit(45000.0))
      .select(col("o_orderkey"), col("o_totalprice"))
    val direct = orders
      .where(col("o_totalprice").between(30000.0, 45000.0))
      .select(col("o_orderkey"), col("o_totalprice"))
    assert(pruned.exceptAll(direct).isEmpty &&
      direct.exceptAll(pruned).isEmpty)
    // empty band falls back to a schema-preserving empty scan
    val none = Tables.pruneFiles(manifest, lit(-10.0), lit(-1.0))
    assert(none.isEmpty)
    val empty = Tables.manifestPrunedRead(spark, p, none.toSeq,
      "o_totalprice", lit(-10.0), lit(-1.0))
    assert(empty.count() == 0 &&
      empty.columns.sameElements(orders.columns))
    // incremental maintenance: manifest(all) == manifest(old files)
    // ∪ manifest(new files) — append never rescans the table
    val all = manifest.select("file").collect().map(_.getString(0)).sorted
    val (oldF, newF) = all.splitAt(all.length / 2)
    val incremental = Tables.buildManifestFor(spark, oldF.toSeq,
        "o_totalprice")
      .unionAll(Tables.buildManifestFor(spark, newF.toSeq, "o_totalprice"))
    assert(incremental.exceptAll(manifest).isEmpty &&
      manifest.exceptAll(incremental).isEmpty)
  }
}
