package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics operators (TPC-H-flavoured) over the star
  * schema. Everything is declarative DataFrame code so Catalyst gets
  * predicate pushdown / column pruning / join planning for free, and
  * AQE can re-plan shuffles at runtime on a real cluster.
  *
  * Numeric policy: money aggregations run over DECIMAL so the result
  * is independent of partitioning/visit order (bit-reproducible on
  * any cluster size, and hash-comparable against an external oracle);
  * final outputs are cast back to DOUBLE.
  */
object Analytics {

  /** Sum doubles exactly: cast each value to decimal first so
    * addition is associative, cast the total back to double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Order-insensitive average via decimal sum / count. */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(s"decimal(28,$scale)")).cast("double") / count(c))

  /** TPC-H Q1-style pricing summary over lineitem. */
  def q1Pricing(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style: unshipped-order revenue top-k.
    * customer is broadcast (small dim at any SF relative to facts);
    * orders⋈lineitem shuffles on orderkey.
    */
  def q3Shipping(customer: DataFrame, orders: DataFrame,
                 lineitem: DataFrame): DataFrame =
    broadcast(customer.filter(col("c_mktsegment") === "BUILDING"))
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5-style: revenue by nation within a region; dims
    * broadcast, facts shuffle once on their join keys. */
  def q5LocalVolume(region: DataFrame, nation: DataFrame,
                    customer: DataFrame, supplier: DataFrame,
                    orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Top-N rows per group via ranked window — hash-partitioned by the
    * group key, no global sort. */
  def topKPerGroup(df: DataFrame, partCols: Seq[String],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Hierarchical rollup region→nation with grouping ids. */
  def rollupAgg(region: DataFrame, nation: DataFrame,
                customer: DataFrame, orders: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
      .select(col("r_name"), col("n_name"), col("total_price"), col("n_orders"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  /** Customers with no orders (anti-join). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Customers with at least one order (semi-join). */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Tumbling-window event aggregation — the batch twin of the
    * Structured Streaming windowed agg in graft.streaming. */
  def windowedEvents(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value"), 6).as("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** Sessionization: a new session starts after a >30 min gap per
    * user; session ids via lag + running sum, all within per-user
    * windows (hash-partitioned by user, scales linearly). */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevTs = lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(prevTs.isNull ||
      (unix_micros(col("ts")) - prevTs) > gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("new_session", isNew)
      .withColumn("session_seq", sum(col("new_session")).over(byUser).cast("long"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Exact interpolated percentiles of order totals per priority. */
  def percentiles(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
      .orderBy(col("o_orderpriority"))

  /** Running (cumulative) revenue per customer ordered by time. */
  def runningAgg(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      sum(col("o_totalprice").cast("decimal(28,4)")).over(w)
        .cast("double").as("cum_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Exact distinct counts per group (shuffle-dedup then count). */
  def distinctCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Approximate distinct counts via HyperLogLog++ — the 100 TB path:
    * constant memory per group, no dedup shuffle, mergeable partials.
    * rsd = relative standard deviation target. */
  def approxDistinctCounts(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Full cube over two document dimensions — every grouping-set
    * combination in one pass (Spark expands the cube map-side;
    * partial aggregation still applies per grouping set). */
  def cubeAgg(docs: DataFrame): DataFrame =
    docs.cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (grouping(col("lang")) * 2 + grouping(col("source")))
          .cast("long").as("gid"))
      .orderBy(col("gid"), col("lang").asc_nulls_first,
        col("source").asc_nulls_first)

  /** TPC-H Q18 shape — customers with large-volume orders: the
    * having-filter runs as a pre-aggregation on lineitem alone
    * (map-side partial sums, tiny qualifying set), and only
    * qualifying orders join through to customers (semi-join by
    * construction, dims broadcast). */
  def q18LargeOrders(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, minQty: Double = 250): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(28,4)")).as("__q"))
      .filter(col("__q") > minQty)
      .select(col("l_orderkey"), col("__q").cast("double").as("sum_qty"))
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q10 shape — revenue lost to returned items per customer
    * over a quarter: date + returnflag filters push to the scans;
    * nation broadcasts; one shuffle for the customer aggregation. */
  def q10ReturnedItems(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame,
                       qStart: String = "1996-01-01",
                       qEnd: String = "1996-04-01"): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .filter(col("o_orderdate") >= lit(qStart).cast("timestamp") &&
        col("o_orderdate") < lit(qEnd).cast("timestamp") &&
        col("l_returnflag") === "R")
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(28,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Approximate percentiles per group (Greenwald-Khanna sketch):
    * the 100 TB path for quantiles — bounded memory per group,
    * mergeable partials, no per-group sort. `accuracy` trades sketch
    * size for error (1/accuracy relative rank error); tested against
    * the exact percentiles within tolerance. */
  def approxPercentiles(orders: DataFrame, accuracy: Int = 10000): DataFrame =
    orders.groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(accuracy))
          .as("p50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(accuracy))
          .as("p90"),
        percentile_approx(col("o_totalprice"), lit(0.99), lit(accuracy))
          .as("p99"))
      .orderBy(col("o_orderpriority"))

  /** Pivot event_type into per-type count columns per user. */
  def pivotAgg(events: DataFrame, types: Seq[String]): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("user_id"))
}
