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
}
