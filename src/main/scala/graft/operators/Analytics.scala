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

  /** Sessionization: a new session starts after a >`gapSeconds` gap
    * per user — TWO-PHASE so a hot user never pins one reducer.
    *
    * A single `Window.partitionBy(user_id)` puts a user's ENTIRE
    * event history on one task — a bot emitting millions of events
    * (guaranteed in web logs) stalls that reducer no matter how many
    * executors exist. Instead: phase 1 sessionizes within
    * (user, time-`bucket`) partitions — the hot user's volume spreads
    * over its active buckets — and emits one summary row per partial
    * session; phase 2 stitches partial sessions across bucket
    * boundaries with the same gap rule over (start, prev end). The
    * phase-2 per-user row count is bounded by the session count,
    * which is itself time-bounded (a user can open at most
    * bucketSeconds/gap sessions per bucket — with the defaults, 48 a
    * day — regardless of event volume), so the second window is
    * skew-immune BY CONSTRUCTION, not by sampling. Output is
    * row-identical to the one-window formulation (asserted in
    * SkewSpec on a hot-user fixture; DuckDB oracle-checked). */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800,
                 bucket: String = "day"): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    // phase 1: partial sessions within (user, bucket)
    val w1 = Window.partitionBy(col("user_id"), col("__bkt"))
      .orderBy(col("ts"), col("event_id"))
    val prevTs = lag(unix_micros(col("ts")), 1).over(w1)
    val isNew = when(prevTs.isNull ||
      (unix_micros(col("ts")) - prevTs) > gapUs, 1).otherwise(0)
    val partial = events
      .withColumn("__bkt", date_trunc(bucket, col("ts")))
      .withColumn("__new", isNew)
      .withColumn("__pseq", sum(col("__new")).over(w1))
      .groupBy(col("user_id"), col("__bkt"), col("__pseq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
    // phase 2: stitch partials whose boundary gap is within the rule
    // (consecutive partials inside one bucket are > gap apart by
    // construction, so the same predicate numbers them correctly)
    val w2 = Window.partitionBy("user_id").orderBy(col("session_start"))
    val prevEnd = lag(unix_micros(col("session_end")), 1).over(w2)
    val chainNew = when(prevEnd.isNull ||
      (unix_micros(col("session_start")) - prevEnd) > gapUs, 1).otherwise(0)
    partial
      .withColumn("__cnew", chainNew)
      .withColumn("session_seq", sum(col("__cnew")).over(w2).cast("long"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(sum(col("n_events")).as("n_events"),
        min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"))
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

  // ---------------------------------------------------------------
  // Correlated-subquery / set-operation shapes (TPC-H Q2/Q4/Q11/
  // Q17/Q21/Q22 analogues over this schema). Each is written as the
  // decorrelated plan Catalyst would want: the correlated subquery
  // becomes a keyed aggregate joined back (shuffle on the key, partial
  // aggregation map-side), never a per-row re-scan.
  // ---------------------------------------------------------------

  /** TPC-H Q2 shape — min-per-group join-back: for each part, the
    * supplier row achieving the minimum observed price (min suppkey on
    * ties). The per-part minimum is a partial-agged shuffle on
    * l_partkey; the join-back reuses the same key so AQE can co-plan
    * both shuffles. part/supplier join in for names — part shuffles
    * (it scales with SF), supplier broadcasts (bounded dim). */
  def q2MinCostSupplier(part: DataFrame, supplier: DataFrame,
                        lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"), col("l_suppkey"),
      col("l_extendedprice"))
    val minp = li.groupBy(col("l_partkey")).agg(
      min(col("l_extendedprice")).as("min_price"))
      .withColumnRenamed("l_partkey", "mp_partkey")
    val best = li
      .join(minp, col("l_partkey") === col("mp_partkey") &&
        col("l_extendedprice") === col("min_price"))
      .groupBy(col("l_partkey"), col("min_price"))
      .agg(min(col("l_suppkey")).as("s_suppkey"))
    best
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier), "s_suppkey")
      .select(col("p_partkey"), col("p_name"), col("min_price"),
        col("s_suppkey"), col("s_name"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H Q4 shape — EXISTS as a left-semi join with a residual
    * non-equi predicate: orders in a window that have at least one
    * line shipped more than `lateDays` after the order date. The equi
    * part (orderkey) drives the shuffle; the range predicate rides
    * along as the join residual — no pair blow-up, no second pass. */
  def q4OrderPriority(orders: DataFrame, lineitem: DataFrame,
                      start: String = "1996-01-01",
                      end: String = "1996-04-01",
                      lateDays: Int = 30): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(start).cast("timestamp") &&
        col("o_orderdate") < lit(end).cast("timestamp"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q11 shape — global-total scalar threshold: suppliers whose
    * revenue exceeds `fraction` of total revenue. The total is one
    * partial-agged scalar broadcast against the per-supplier rollup —
    * the "scalar subquery" costs one extra reduce, not a re-scan. */
  def q11RevenueShare(supplier: DataFrame, lineitem: DataFrame,
                      fraction: Double = 0.002): DataFrame = {
    // keep the per-supplier sums in DECIMAL so the global total can
    // be derived from them EXACTLY (decimal addition is associative):
    // one scan + one tiny re-aggregate instead of two full scans of
    // the fact table — and the shared partial-agg subplan lets Spark
    // reuse the exchange if both branches do materialize.
    val perSupp = lineitem.groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(28,4)")).as("__rev_dec"))
    val total = perSupp.agg(sum(col("__rev_dec")).as("__tot_dec"))
    perSupp
      .crossJoin(broadcast(total))
      .withColumn("revenue", col("__rev_dec").cast("double"))
      .filter(col("revenue") > col("__tot_dec").cast("double") * fraction)
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("s_suppkey"))
  }

  /** TPC-H Q17 shape — correlated per-group average: revenue impact of
    * small-quantity lines for one brand. The correlated
    * `avg(l_quantity) per part` decorrelates into a keyed aggregate
    * joined back on l_partkey; the brand-filtered part list broadcasts
    * (a filtered dim). Quantities are integer-valued doubles, so the
    * average is order-independent without a decimal detour. */
  def q17SmallQuantity(part: DataFrame, lineitem: DataFrame,
                       brand: String = "Brand#23"): DataFrame = {
    val pk = broadcast(
      part.filter(col("p_brand") === brand).select(col("p_partkey")))
    val li = lineitem
      .join(pk, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val lim = li.groupBy(col("l_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1)) * 0.2).as("qty_limit"))
      .withColumnRenamed("l_partkey", "lp_partkey")
    li.join(lim, col("l_partkey") === col("lp_partkey"))
      .filter(col("l_quantity") < col("qty_limit"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q21 shape — the EXISTS/NOT-EXISTS pair ("another supplier
    * in the order" / "no other supplier was late") reformulated as ONE
    * order-grained aggregate: per order count distinct suppliers and
    * distinct late suppliers, keep orders where exactly one supplier
    * was late but others participated. One orders⋈lineitem shuffle +
    * one aggregate replaces Q21's three lineitem self-joins — same
    * rows, and at 100 TB two fewer passes over the fact table. */
  def q21LateSuppliers(supplier: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, lateDays: Int = 60,
                       topK: Int = 10): DataFrame = {
    val o = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = lineitem.select(col("l_orderkey"), col("l_suppkey"),
      col("l_shipdate"))
    val perOrder = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late"),
        min(when(col("is_late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    perOrder.groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier), col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(topK)
  }

  /** TPC-H Q22 shape — scalar-average gate + anti-join: customers
    * with above-average balances and no orders, rolled up by segment.
    * The average is one broadcast scalar (decimal-exact sum / count);
    * the NOT EXISTS is a left-anti shuffle join on custkey. */
  def q22IdleCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(28,4)")).cast("double") /
        count(lit(1))).as("avg_bal"))
    customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q12 shape (no shipmode column in the synthetic schema —
    * the return flag plays the mode bucket): shipping-bucket order
    * priority audit over one ship-year. ONE fact⋈fact equi-join
    * (lineitem projected to 2 columns, orders to 2 — both sides
    * shuffle only what the aggregate reads) and a partial-agged
    * conditional count pair; the date range reaches the scan as a
    * PushedFilter. */
  def q12ShipPriority(orders: DataFrame, lineitem: DataFrame,
                      year: Int = 1996): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(hi, 1)).as("high_line_count"),
        count(when(!hi, 1)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q16 shape (lineitem plays the part-supplier relation —
    * the synthetic schema has no partsupp): distinct supplier counts
    * per (brand, type, size) for a filtered part family, excluding a
    * denylisted supplier set (negative balances stand in for Q16's
    * complaint scan). Both dims broadcast (part post-filter,
    * denylist by construction); the single fact shuffle is the
    * count-distinct aggregate itself — partial-agged, no pre-pass
    * distinct. */
  def q16SupplierCnt(part: DataFrame, supplier: DataFrame,
                     lineitem: DataFrame): DataFrame = {
    val denied = supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val p = part.filter(col("p_brand") =!= "Brand#13" &&
      col("p_type") =!= "MEDIUM" &&
      col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(denied), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape (no partsupp/availqty in the synthetic schema,
    * so "excess stock" degrades to shipment dominance): suppliers
    * who shipped MORE THAN HALF of some name-family part's total
    * volume over one ship-year. The per-(part,supplier) and per-part
    * totals come off the SAME single fact pass (the part total is a
    * window re-aggregate over the already part-grouped rows — the
    * second "pass" touches only family-part groups, not lineitem);
    * the dominance test compares exact decimals (`2·qty > total`),
    * so the boundary is bit-deterministic. Output is the qualifying
    * supplier roster with its nation — dims broadcast. */
  def q20ExcessSuppliers(part: DataFrame, supplier: DataFrame,
                         nation: DataFrame, lineitem: DataFrame,
                         namePrefix: String = "red ",
                         year: Int = 1996): DataFrame = {
    val fam = broadcast(part.filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey")))
    val shipped = lineitem
      .filter(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .join(fam, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(28,4)")).as("qty"))
    val dominant = shipped
      .withColumn("total",
        sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qty") * 2 > col("total"))
      .select(col("l_suppkey")).distinct()
    dominant
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Time-range sliding window — per-event trailing aggregate over the
    * preceding hour (RANGE frame on event time). Hash-partitioned by
    * user; each partition sorts once and the frame slides in O(n).
    * The decimal inner sum keeps the running value order-exact. */
  def movingWindow(events: DataFrame, seconds: Long = 3600): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-seconds * 1000000L, 0)
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("user_id"), col("event_id"), col("ts"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("value").cast("decimal(28,6)")).over(w)
          .cast("double").as("sum_trailing"))
      .drop("ts_us")
  }

  /** Distribution bands — ntile deciles within each order priority,
    * summarized per band. The window sorts each priority partition
    * once (unique tiebreak ⇒ deterministic band edges); the band
    * summary is a partial-agged rollup. */
  def ntileBands(orders: DataFrame, bands: Int = 10): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders
      .select(col("o_orderpriority"), col("o_totalprice"),
        ntile(bands).over(w).cast("long").as("band"))
      .groupBy(col("o_orderpriority"), col("band"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy(col("o_orderpriority"), col("band"))
  }

  /** Incremental aggregate maintenance — fold a new batch into a
    * maintained per-key (count, sum) state WITHOUT re-scanning
    * history: at 100 TB the aggregate table is maintained, never
    * recomputed. The batch collapses map-side to per-key partials
    * first, so the full-outer merge shuffles only |keys| rows from
    * each side; the sum state stays DECIMAL end-to-end, so the
    * maintained result is bit-identical to a from-scratch aggregate
    * regardless of how history was batched. Finalize for reporting
    * with `finalizeCountSum`. */
  def maintainCountSum(prev: DataFrame, batch: DataFrame,
                       keys: Seq[String], valueCol: String): DataFrame = {
    val b = batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__b_n"),
        sum(col(valueCol).cast("decimal(28,4)")).as("__b_sum"))
    prev.join(b, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__b_n"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_state"), lit(0).cast("decimal(28,4)")) +
          coalesce(col("__b_sum"), lit(0).cast("decimal(28,4)")))
          .cast("decimal(28,4)").as("sum_state")): _*)
  }

  /** Empty maintained state for `maintainCountSum`. */
  def emptyCountSum(spark: org.apache.spark.sql.SparkSession,
                    template: DataFrame, keys: Seq[String]): DataFrame =
    template.select(keys.map(col): _*).limit(0)
      .withColumn("n_rows", lit(0L))
      .withColumn("sum_state", lit(0).cast("decimal(28,4)"))

  /** Reporting view of a maintained state: double-valued sum. */
  def finalizeCountSum(state: DataFrame): DataFrame =
    state.withColumn("total", col("sum_state").cast("double"))
      .drop("sum_state")

  /** Numeric data profiling — equi-width histogram plus null
    * accounting for one column, with the bucket edges derived from an
    * in-plan min/max scalar (one tiny aggregate broadcast against the
    * scan; no driver round-trip, no second pass with hardcoded
    * edges). The bucket formula is written out explicitly
    * (floor((v−mn)/(mx−mn)·n)+1, the width_bucket convention: v = mx
    * lands in bucket n+1) so any engine computing the same IEEE
    * expression buckets identically. */
  def numericHistogram(df: DataFrame, valueCol: String,
                       buckets: Int = 16): DataFrame = {
    val mm = df.agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    df.crossJoin(broadcast(mm))
      // null accounting is explicit: nulls land in bucket 0 (lo/hi null
      // there), so the null population is a first-class histogram row
      // rather than a surprise `bucket = null` group.
      // constant column ⇒ mx = mn: (v-mn)/(mx-mn) is NaN and the long
      // cast throws under ANSI — everything belongs in bucket 1 then
      .select(when(col(valueCol).isNull, lit(0L))
        .when(col("mx") === col("mn"), lit(1L))
        .otherwise(floor((col(valueCol) - col("mn"))
          / (col("mx") - col("mn")) * buckets) + 1L).as("bucket"),
        col(valueCol), col("mn"), col("mx"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
      .orderBy(col("bucket"))
  }

  /** Arbitrary grouping sets — the general form behind rollup/cube:
    * exactly the requested combinations ((priority, status),
    * (priority), ()) in ONE pass (Spark expands the sets map-side;
    * partial aggregation applies per set — no per-set re-scan). */
  def groupingSetsAgg(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        (grouping(col("o_orderpriority")) * 2 +
          grouping(col("o_orderstatus"))).cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  /** Cohort retention matrix: users bucketed by first-activity week,
    * counted in every week they return. One aggregate finds each
    * user's cohort, the (user, week) activity set dedups map-side
    * before its shuffle, and the final rollup is partial-agged — the
    * classic retention triangle in three keyed shuffles, independent
    * of event volume per user. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val cohorts = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("act_week"))
      .distinct()
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), col("act_week"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("act_week"))
  }

  /** Funnel analysis — ordered step completion per user: step k
    * counts only if it happens strictly AFTER the user's step k−1
    * time (first-touch semantics at every level). Each level is a
    * keyed aggregate joined back on the user — k levels ⇒ k
    * user-partitioned shuffles over ever-shrinking frames, never a
    * per-user sort of the full event history. Output: funnel depth →
    * user count. */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty)
    // level 1: first touch of the entry step
    val levels = steps.zipWithIndex.drop(1).scanLeft(
      events.filter(col("event_type") === steps.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))) {
      case (prev, (step, i)) =>
        events.filter(col("event_type") === step)
          .join(prev.select(col("user_id"), col(s"t$i")), "user_id")
          .filter(col("ts") > col(s"t$i"))
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"t${i + 1}"))
    }
    val depth = levels.tail.zipWithIndex.foldLeft(
      levels.head.select(col("user_id"), lit(1L).as("depth"))) {
      case (acc, (lvl, i)) =>
        acc.join(lvl.select(col("user_id"), lit(true).as(s"__hit${i + 2}")),
          Seq("user_id"), "left")
          .withColumn("depth", when(col(s"__hit${i + 2}"), lit(i + 2L))
            .otherwise(col("depth")))
          .drop(s"__hit${i + 2}")
    }
    depth.groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))
  }

  /** Semi-structured column processing: parse a JSON string column
    * with an EXPLICIT schema (`from_json` — schema inference over a
    * JSON column means a second full scan at 100 TB) and aggregate
    * the extracted field. The parse is map-side codegen; only the
    * extracted scalars shuffle. */
  def jsonExtractAgg(events: DataFrame, propsCol: String = "props"): DataFrame =
    events
      .withColumn("k",
        from_json(col(propsCol), "k BIGINT", Map.empty[String, String])
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Order-independent statistical moments: mean/variance/stddev/
    * correlation derived from DECIMAL power sums, so results are
    * bit-reproducible under any partitioning — the built-in
    * `stddev`/`corr` stream updates in doubles and drifts with
    * visit order, which can never hash-match an external oracle.
    * The per-row squares/products are IEEE doubles (deterministic);
    * only their SUMS need the decimal detour. */
  def momentStats(lineitem: DataFrame): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val sums = lineitem.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x.cast("decimal(28,4)")).cast("double").as("sx"),
        sum((x * x).cast("decimal(38,6)")).cast("double").as("sx2"),
        sum(y.cast("decimal(28,4)")).cast("double").as("sy"),
        sum((y * y).cast("decimal(38,6)")).cast("double").as("sy2"),
        sum((x * y).cast("decimal(38,6)")).cast("double").as("sxy"))
    val n = col("n").cast("double")
    sums.select(col("l_returnflag"), col("n"),
      round(col("sy") / n, 6).as("mean_price"),
      round(sqrt((n * col("sy2") - col("sy") * col("sy"))
        / (n * (n - 1))), 6).as("stddev_price"),
      round((n * col("sxy") - col("sx") * col("sy"))
        / (sqrt(n * col("sx2") - col("sx") * col("sx"))
          * sqrt(n * col("sy2") - col("sy") * col("sy"))), 6)
        .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Rank-feature family over one window: dense_rank, percent_rank
    * and cume_dist per partition — the normalized-rank features
    * quality-gating and curriculum-ordering pipelines attach to each
    * row. One sort per partition serves all three functions (they
    * share the window frame). */
  def rankFeatures(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders.select(
      col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
      dense_rank().over(w).cast("long").as("drank"),
      round(percent_rank().over(w), 9).as("prank"),
      round(cume_dist().over(w), 9).as("cdist"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Set reconciliation — INTERSECT / EXCEPT between two keyed
    * activity snapshots, tagged and unioned. Spark plans set ops as
    * hash aggregates + joins on the full row, so each leg is one
    * shuffle on the key — used here for cohort retention (both /
    * left-only / right-only). */
  def setReconcile(left: DataFrame, right: DataFrame,
                   leftTag: String = "left_only",
                   rightTag: String = "right_only"): DataFrame = {
    val both = left.intersect(right).withColumn("cohort", lit("both"))
    val l = left.except(right).withColumn("cohort", lit(leftTag))
    val r = right.except(left).withColumn("cohort", lit(rightTag))
    both.unionByName(l).unionByName(r)
  }

  /** Event-rate spike detection: per (event_type, hour) counts
    * flagged when the hour exceeds `factor`× the type's mean hourly
    * rate. The comparison is pure integer cross-multiplication
    * (n·hours > factor·total — no float mean, no stddev ulp drift),
    * so the flag is bit-identical on any engine. Per-type totals are
    * a tiny broadcast aggregate; both aggregates partial-agg, so a
    * hot hour never pins a reducer. */
  def rateSpikes(events: DataFrame, factor: Int = 2): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val totals = hourly.groupBy(col("event_type"))
      .agg(sum(col("n")).as("__tot"), count(lit(1)).as("__hours"))
    hourly.join(broadcast(totals), "event_type")
      .withColumn("spike",
        col("n") * col("__hours") > lit(factor.toLong) * col("__tot"))
      .select(col("event_type"), col("hour"), col("n"), col("spike"))
  }

  /** Per-column data-quality profile — the lakehouse audit pass:
    * for each requested column, row count, null count and exact
    * distinct count, in ONE scan (a single multi-aggregate row,
    * unpivoted to long form). count_distinct per column expands to
    * one aggregation path each, all partial-agged; for very wide
    * tables or unbounded cardinalities swap in
    * approx_count_distinct — same plan shape. */
  def dqProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      count_distinct(col(c)).as(s"__nd_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"))): _*)).as("__p"))
      .select(col("__p.col_name"), col("__p.n_rows"),
        col("__p.n_nulls"), col("__p.n_distinct"))
  }

  /** TPC-H Q6 shape — the forecasting-revenue-change query: pure
    * scan + filter + one-row aggregate. The point at 100 TB is the
    * plan, not the arithmetic: all three predicates (date range,
    * discount band, quantity cap) push into the parquet scan as
    * PushedFilters, so row groups outside the year never leave disk;
    * no shuffle except the single partial→final agg. */
  def q6RevenueDelta(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6)
        .as("revenue_delta"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q13 shape — customer order-count distribution, including
    * zero-order customers: LEFT join customer→orders (count skips the
    * null orderkeys), then the tiny histogram over counts. Two keyed
    * shuffles; the second input is |customers| rows of two ints. */
  def q13OrderDistribution(customer: DataFrame,
                           orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q14 shape — promo revenue share for one ship-year:
    * conditional aggregate over the part join, dim side broadcast.
    * Both sums decimal-folded; the final share is one double divide
    * rounded to 6 (correctly-rounded IEEE — engine-independent). */
  def q14PromoShare(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        (dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 6) /
          dsum(rev, 6)), 6).as("promo_revenue_pct"))
  }

  /** TPC-H Q19 shape — disjunctive predicate revenue: OR-of-ANDs over
    * (brand, size band, quantity band). Catalyst extracts the common
    * `l_partkey = p_partkey` equi-condition, broadcasts the dim, and
    * evaluates the disjunction as a post-join residual; the partkey
    * IN-set implied by the brands prunes the fact scan. */
  def q19Disjunctive(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 35)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 50))
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Per-group z-score standardization — the feature-hygiene pass a
    * training pipeline applies before mixing numeric features: center
    * and scale each value by its group's mean/stddev. Moments come
    * from DECIMAL power sums (one partial-agged pass, bit-stable
    * under any partitioning — the moment_stats policy); the tiny
    * per-group moment table broadcasts back onto the fact rows, so
    * the fact side is one map-only pass. Degenerate groups (n < 2 or
    * zero variance) emit z = 0 rather than NaN/err. */
  def zscoreNormalize(df: DataFrame, grpCol: String, valCol: String,
                      keyCols: Seq[String]): DataFrame = {
    val x = col(valCol)
    val m = df.groupBy(col(grpCol)).agg(
      count(lit(1)).as("__n"),
      sum(x.cast("decimal(28,4)")).cast("double").as("__sx"),
      sum((x * x).cast("decimal(38,6)")).cast("double").as("__sx2"))
    val n = col("__n").cast("double")
    val mean = col("__sx") / n
    val varPop = (col("__sx2") - col("__sx") * col("__sx") / n) / n
    val moments = m.select(col(grpCol), mean.as("__mean"),
      when(varPop > 0, sqrt(varPop)).otherwise(lit(0.0)).as("__sd"))
    df.join(broadcast(moments), grpCol)
      .select((keyCols :+ grpCol).map(col) :+ x :+
        round(when(col("__sd") === 0, lit(0.0))
          .otherwise((x - col("__mean")) / col("__sd")), 6).as("zscore"): _*)
  }

  /** Peak concurrency per group — the capacity question ("how many
    * sessions were open at once?") answered with the classic +1/−1
    * boundary sweep: each event opens an interval [ts, ts+duration);
    * a running sum over (time, delta) boundaries peaks at the max
    * concurrency. Determinism on ties: the window's default RANGE
    * frame aggregates peer rows (equal (t, delta)) together, and
    * ends (−1) sort before starts (+1) at the same instant, so
    * half-open adjacency never counts as overlap. One keyed window
    * over 2 narrow rows per event; partial-agged max on top. */
  def peakConcurrency(events: DataFrame, grpCol: String = "event_type",
                      tsCol: String = "ts",
                      duration: String = "5 minutes"): DataFrame = {
    val starts = events.select(col(grpCol), col(tsCol).as("t"),
      lit(1L).as("delta"))
    val ends = events.select(col(grpCol),
      (col(tsCol) + expr(s"INTERVAL $duration")).as("t"),
      lit(-1L).as("delta"))
    val w = Window.partitionBy(grpCol).orderBy(col("t"), col("delta"))
    starts.union(ends)
      .withColumn("__c", sum(col("delta")).over(w))
      .groupBy(col(grpCol))
      .agg(max(col("__c")).as("peak"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
  }

  /** Co-occurrence counts between event types: for each unordered
    * type pair (a < b), in how many (user, hour) baskets both
    * appear. The market-basket / co-engagement primitive, built
    * join-free: one collect_set shuffle per basket (a SET of types —
    * bounded by the type vocabulary, never the event stream), then
    * map-side pair expansion and a tiny pair-count aggregate. A user
    * with 10^7 events in an hour contributes the same bounded set as
    * one with 10, so event-count skew cannot pin a reducer; for
    * unbounded item vocabularies, cap the per-basket set (top-N by
    * recency) before expansion — the standard recipe. */
  def eventCooccurrence(events: DataFrame,
                        userCol: String = "user_id",
                        typeCol: String = "event_type",
                        tsCol: String = "ts",
                        bucket: String = "hour"): DataFrame = {
    val sets = events
      .groupBy(col(userCol), date_trunc(bucket, col(tsCol)).as("__b"))
      .agg(sort_array(collect_set(col(typeCol))).as("types"))
    val pairs = sets.select(explode(flatten(transform(col("types"),
      (x, i) => transform(
        slice(col("types"), i + 2, size(col("types"))),
        y => struct(x.as("type_a"), y.as("type_b")))))).as("p"))
    pairs.groupBy(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("n_baskets"))
  }

  /** TPC-H Q7 shape — bilateral trade volume: revenue shipped
    * between two nations per direction per year. The fact table
    * joins two independent dim CHAINS (supplier→nation and
    * orders→customer→nation); all four dims broadcast, so the plan
    * is one fact scan with four map-side probes, a year extraction,
    * and a tiny keyed aggregate. Pushing the nation filter into each
    * broadcast side shrinks the hash relations to the two nations
    * before the probe. */
  def q7TradeVolume(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, supplier: DataFrame,
                    nation: DataFrame, nationA: String,
                    nationB: String): DataFrame = {
    val pair = nation
      .filter(col("n_name") === nationA || col("n_name") === nationB)
    val supp = supplier.join(broadcast(pair),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer.join(broadcast(pair),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    * per-supplier aggregate, a one-row max broadcast back onto it
    * (the "revenue view + max" formulation without a global sort),
    * ties kept. Decimal-folded revenue makes the max comparison
    * exact — double equality against a value computed from the SAME
    * decimal sum is safe. */
  def q15TopSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("total_rev"))
    val top = rev.groupBy().agg(max(col("total_rev")).as("__max"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_rev") === col("__max"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
  }

  /** TPC-H Q8 shape — national market share: of all revenue
    * delivered to one region's customers for one part type, the
    * fraction supplied by a given nation, per order year. Broadcast
    * posture by dim size class: nation/region chains and supplier
    * (the smallest fact dim) always broadcast; the type-filtered
    * part probe and the region-restricted customer probe stay
    * keyed joins that AQE converts to broadcast when the filtered
    * side fits — at 100 TB a sixth of `part` does not. Numerator
    * and denominator come from the SAME decimal fold, so the final
    * double divide is the only rounding step (round 6dp, §5). */
  def q8MarketShare(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, supplier: DataFrame,
                    nation: DataFrame, region: DataFrame,
                    part: DataFrame, regionName: String,
                    shareNation: String, partType: String): DataFrame = {
    val pt = part.filter(col("p_type") === partType)
      .select(col("p_partkey"))
    val supp = supplier.join(broadcast(nation),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val regCust = customer.join(
        broadcast(nation
          .join(broadcast(region.filter(col("r_name") === regionName)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .join(pt, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(regCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        dsum(when(col("supp_nation") === shareNation, rev)
          .otherwise(lit(0.0)), 6) / dsum(rev, 6), 6).as("mkt_share"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q9 shape — supplier-nation revenue by order year for a
    * part-name family (the synthetic schema has no partsupp/
    * supplycost, so "profit" degrades to discounted revenue — the
    * join topology and aggregation shape are Q9's). The name
    * pattern prunes `part` to a semi-join probe; supplier→nation
    * broadcasts; orders joins on its key purely to supply the
    * order year. One fact scan, one keyed aggregate. */
  def q9NationRevenue(lineitem: DataFrame, orders: DataFrame,
                      supplier: DataFrame, nation: DataFrame,
                      part: DataFrame, namePattern: String): DataFrame = {
    val pt = part.filter(col("p_name").like(namePattern))
      .select(col("p_partkey"))
    val supp = supplier.join(broadcast(nation),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    lineitem
      .join(pt, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Distributed sweep line — max concurrent spans per hour (the
    * "how many sessions were open at once" capacity profile). The
    * classic solution is one global ordered prefix sum over ±1
    * endpoint events — inherently sequential. Distributed here as a
    * two-level scan: endpoints partition by HOUR for the local
    * running sum (a keyed window, parallel across hours), and only
    * the per-hour delta totals — one row per hour, provably tiny —
    * go through a global window to produce each hour's carry-in.
    * `max(carry + local_run) = carry + max(local_run)` since the
    * carry is constant within an hour, so the two levels compose
    * exactly; the hour-start carry itself joins the max, so an hour
    * that only DRAINS open spans still reports the concurrency it
    * held (not a sub-carry running value). Endpoint order
    * (t, delta, id) is total, with ends before starts at equal t ⇒
    * half-open [start, end) spans. Hours with no endpoints at all
    * are omitted — the carry is unchanged through them, so the
    * profile is the previous emitted hour's closing level.
    * At 100 TB: endpoints shuffle ONCE by hour (the per-hour
    * aggregate reuses the local window's exchange; salt a hot hour
    * by sub-bucketing the window key if needed); the global window
    * sees |hours| rows. */
  def concurrencyProfile(spans: DataFrame, idCol: String,
                         startCol: String, endCol: String): DataFrame = {
    val pts = spans.select(col(idCol).as("__id"),
        col(startCol).as("__t"), lit(1L).as("__d"))
      .unionAll(spans.select(col(idCol).as("__id"),
        col(endCol).as("__t"), lit(-1L).as("__d")))
      .withColumn("__h", date_trunc("hour", col("__t")))
    val local = Window.partitionBy(col("__h"))
      .orderBy(col("__t"), col("__d"), col("__id"))
    // one pass over the endpoints: hour-local running sum, then the
    // per-hour aggregate on the SAME hour-partitioned exchange
    val perHour = pts.withColumn("__run", sum(col("__d")).over(local))
      .groupBy(col("__h"))
      .agg(max(col("__run")).as("__localmax"),
        sum(col("__d")).as("__hd"),
        sum(when(col("__d") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("__d") === -1L, 1L).otherwise(0L)).as("n_ends"))
    // carry-in: cumulative delta of all PRIOR hours (tiny input:
    // one row per hour; the global window is over that summary)
    val carryW = Window.orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perHour
      .withColumn("__carry",
        coalesce(sum(col("__hd")).over(carryW), lit(0L)))
      .select(col("__h").as("hour"),
        greatest(col("__carry") + col("__localmax"), col("__carry"))
          .as("max_concurrency"),
        col("n_starts"), col("n_ends"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for each (from_type, to_type) pair, the transition
    * count and row-normalized probability — the next-event-modeling
    * / funnel-simulation primitive. One keyed window (user, ordered
    * by time with the unique event id as tie-break) computes `lead`;
    * counts partial-agg; probabilities divide by the from-type row
    * total (a tiny whole-partition window over |types|² rows). For
    * bot users with unbounded event counts, pre-bucket the sequence
    * the way `sessionize` does (per-(user, day) partials + boundary
    * stitch) — transitions only cross bucket edges at the stitch. */
  def eventTransitions(events: DataFrame, userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts",
                       idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val counts = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      round(col("n") / sum(col("n"))
        .over(Window.partitionBy(col("from_type"))), 6))
  }

  /** Per-group winsorization: clip a value to its group's [pLo, pHi]
    * percentile band. Cutoffs use the discrete-percentile definition
    * "smallest value whose cume_dist ≥ p" — a pure function of the
    * value multiset (tie-safe, engine-independent; no interpolation
    * arithmetic to drift). One keyed window sort over just
    * (group, value) computes cume_dist; the per-group cutoff table is
    * tiny and broadcasts back onto the fact rows. At 100 TB swap the
    * exact window for the mergeable GK sketch (`approx_percentile`)
    * — same plan shape minus the per-group sort; this operator is the
    * exact form that oracle-verifies the recipe. */
  def winsorize(df: DataFrame, grpCol: String, valCol: String,
                keyCols: Seq[String], pLo: Double = 0.05,
                pHi: Double = 0.95): DataFrame = {
    val w = Window.partitionBy(grpCol).orderBy(col(valCol))
    // the cutoff pass sorts ONLY (group, value) — the wide fact rows
    // never enter the window, and the fact side stays a map-only
    // broadcast join (windowing the full rows would also recompute
    // the sort once per consumer branch)
    val cuts = df.select(col(grpCol), col(valCol))
      .withColumn("__cd", cume_dist().over(w))
      .groupBy(col(grpCol)).agg(
        min(when(col("__cd") >= pLo, col(valCol))).as("__lo"),
        min(when(col("__cd") >= pHi, col(valCol))).as("__hi"))
    df.join(broadcast(cuts), grpCol)
      .select((keyCols :+ grpCol).map(col) :+
        col(valCol) :+
        least(greatest(col(valCol), col("__lo")), col("__hi"))
          .as("clipped"): _*)
  }
}
