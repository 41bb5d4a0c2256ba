package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize splits on >30min gaps per user") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:10:00"), 1L, "view", 1.0),
      (3L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0),  // 50min gap → new
      (4L, ts("2024-01-01 00:05:00"), 2L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.sessionize(ev)
      .select("user_id", "session_seq", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("topKPerGroup ranks within groups deterministically") {
    val df = Seq((1, 10.0, 100L), (1, 20.0, 101L), (1, 20.0, 102L),
      (2, 5.0, 103L)).toDF("g", "v", "id")
    val out = Analytics.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), 2)
      .select("g", "rn", "id").as[(Int, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(out == Seq((1, 1L, 101L), (1, 2L, 102L), (2, 1L, 103L)))
  }

  test("dsum is exact and partitioning-independent") {
    val vals = (1 to 10000).map(i => i * 0.01)
    val one = vals.toDF("v").coalesce(1)
      .agg(Analytics.dsum(col("v"))).as[Double].head()
    val many = vals.toDF("v").repartition(17)
      .agg(Analytics.dsum(col("v"))).as[Double].head()
    assert(one == many) // bit-identical, not just close
    assert(math.abs(one - 500050.0) < 1e-9)
  }

  test("decorrelated subquery shapes plan as joins, not nested-loop re-scans") {
    val d = "/root/testdata/sf0.001"
    def tb(n: String) = graft.sources.Tables.load(spark, d, n)
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // Q4 shape: the EXISTS must be ONE semi join on the order key
    val q4 = plan(Analytics.q4OrderPriority(tb("orders"), tb("lineitem")))
    assert(q4.contains("LeftSemi"))
    assert(!q4.contains("CartesianProduct"))
    // Q17 shape: the per-part average is a keyed aggregate joined
    // back; only the one-row scalar may broadcast-nested-loop
    val q17 = plan(Analytics.q17SmallQuantity(tb("part"), tb("lineitem")))
    assert(!q17.contains("CartesianProduct"))
    // Q21 shape: single aggregate over one orders⋈lineitem join —
    // no lineitem self-join
    val q21 = plan(Analytics.q21LateSuppliers(tb("supplier"), tb("orders"),
      tb("lineitem")))
    assert(!q21.contains("CartesianProduct"))
    assert(q21.sliding("Scan parquet".length)
      .count(_ == "Scan parquet") <= 3) // lineitem+orders+supplier, once each
    // Q11/Q22: the scalar gate is a broadcast of ONE row
    val q22 = plan(Analytics.q22IdleCustomers(tb("customer"), tb("orders")))
    assert(q22.contains("BroadcastNestedLoopJoin") ||
      q22.contains("BroadcastExchange"))
  }

  test("rateSpikes flags only hours beyond factor x the type mean") {
    // type A: hours with 1,1,10 events — only the 10 spikes (30 > 24);
    // type B: flat 2,2,2 — nothing spikes
    val ev = (Seq.fill(1)(ts("2024-01-01 00:10:00")) ++
      Seq.fill(1)(ts("2024-01-01 01:10:00")) ++
      Seq.fill(10)(ts("2024-01-01 02:10:00"))).map(t => ("A", t)) ++
      Seq(ts("2024-01-01 00:05:00"), ts("2024-01-01 00:06:00"),
        ts("2024-01-01 01:05:00"), ts("2024-01-01 01:06:00"),
        ts("2024-01-01 02:05:00"), ts("2024-01-01 02:06:00"))
        .map(t => ("B", t))
    val df = ev.toDF("event_type", "ts")
    val out = Analytics.rateSpikes(df).orderBy("event_type", "hour")
      .select("event_type", "n", "spike")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(out == Seq(("A", 1L, false), ("A", 1L, false), ("A", 10L, true),
      ("B", 2L, false), ("B", 2L, false), ("B", 2L, false)))
  }

  test("dqProfile counts nulls and exact distincts per column") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), None),
      (Some(2L), Some("y")), (None, Some("x"))
    ).toDF("k", "v")
    val out = Analytics.dqProfile(df, Seq("k", "v")).orderBy("col_name")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("k", 4L, 1L, 2L), ("v", 4L, 1L, 2L)))
  }

  test("eventCooccurrence counts baskets per unordered type pair, join-free") {
    val h0 = ts("2024-01-01 00:10:00")
    val h0b = ts("2024-01-01 00:40:00") // same hour basket as h0
    val h1 = ts("2024-01-01 01:10:00")
    val ev = Seq(
      (1L, "a", h0), (1L, "b", h0b), (1L, "a", h0), // repeat: one basket
      (1L, "a", h1), // new hour, alone — no pair
      (2L, "a", h0), (2L, "b", h0), (2L, "c", h0),
      (3L, "c", h0)
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.eventCooccurrence(ev)
      .orderBy("type_a", "type_b")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
    // join-free: the plan is two aggregates around a generator,
    // never a self-join whose fan-out tracks event counts
    val plan = Analytics.eventCooccurrence(ev)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
  }

  test("q6/q19 predicates reach the parquet scan; q14/q19 broadcast part") {
    def tb(n: String) = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", n)
    val q6 = Analytics.q6RevenueDelta(tb("lineitem"))
      .queryExecution.executedPlan.toString
    assert(q6.contains("PushedFilters: ["), s"q6 must push filters:\n$q6")
    assert(q6.contains("l_shipdate") && q6.contains("l_quantity"),
      "date and quantity predicates should push into the scan")
    assert(!q6.contains("Exchange hashpartitioning"),
      "q6 is scan+filter+global agg — no keyed shuffle")
    for (df <- Seq(Analytics.q14PromoShare(tb("lineitem"), tb("part")),
        Analytics.q19Disjunctive(tb("lineitem"), tb("part")))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"part side must broadcast:\n$p")
    }
    // sanity on values: q14 share is a percentage, q19 revenue > 0
    val pct = Analytics.q14PromoShare(tb("lineitem"), tb("part"))
      .as[Double].head()
    assert(pct > 0.0 && pct < 100.0)
    val (rev, n) = Analytics.q19Disjunctive(tb("lineitem"), tb("part"))
      .as[(Double, Long)].head()
    assert(rev > 0.0 && n > 0)
  }

  test("q7/q15 plans: dim chains broadcast; no fact self-join or sort") {
    def tb(n: String) = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", n)
    val q7 = Analytics.q7TradeVolume(tb("lineitem"), tb("orders"),
      tb("customer"), tb("supplier"), tb("nation"),
      "NATION_3", "NATION_7")
    val p7 = q7.queryExecution.executedPlan.toString
    assert(p7.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 3,
      s"dim chains must broadcast:\n$p7")
    // the ONLY join allowed to be non-broadcast is lineitem⋈orders —
    // the one legitimate fact-fact keyed join of the Q7 topology; no
    // dim chain may fall back to a shuffle join
    val shuffleJoins = "SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(p7).length
    assert(shuffleJoins <= 1,
      s"only the lineitem-orders join may shuffle, found $shuffleJoins:\n$p7")
    // directions are disjoint row sets over the same pair
    val rows = q7.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("NATION_3", "NATION_7")))
    val q15 = Analytics.q15TopSupplier(tb("lineitem"), tb("supplier"))
      .collect()
    assert(q15.nonEmpty, "at least one top supplier")
    val revs = q15.map(_.getDouble(2)).toSet
    assert(revs.size == 1, "all returned suppliers tie at the max")
  }

  test("q8/q9 plans: nation chains broadcast; shares/revenues sane") {
    def tb(n: String) = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", n)
    val q8 = Analytics.q8MarketShare(tb("lineitem"), tb("orders"),
      tb("customer"), tb("supplier"), tb("nation"), tb("region"),
      tb("part"), "ASIA", "NATION_2", "STANDARD")
    val p8 = q8.queryExecution.executedPlan.toString
    assert(p8.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2,
      s"supplier/nation chains must broadcast:\n$p8")
    val r8 = q8.collect()
    assert(r8.nonEmpty)
    assert(r8.forall { r =>
      val s = r.getDouble(1); s >= 0.0 && s <= 1.0
    }, "market share is a fraction")
    val r9 = Analytics.q9NationRevenue(tb("lineitem"), tb("orders"),
      tb("supplier"), tb("nation"), tb("part"), "%red%").collect()
    assert(r9.nonEmpty)
    assert(r9.forall(_.getDouble(2) > 0.0), "revenue positive")
    assert(r9.map(_.getString(0)).toSet.size > 1,
      "multiple supplier nations present")
  }

  test("concurrencyProfile matches a hand-computed sequential sweep") {
    // spans crossing hour boundaries, nested spans, a start exactly
    // at another span's end (half-open: end applies first), and a
    // span-free gap hour (absent from the output)
    val spans = Seq(
      (1L, "2026-01-01 00:10:00", "2026-01-01 02:30:00"),
      (2L, "2026-01-01 00:20:00", "2026-01-01 00:40:00"),
      (3L, "2026-01-01 00:40:00", "2026-01-01 01:00:00"),
      (4L, "2026-01-01 01:30:00", "2026-01-01 01:45:00"),
      (5L, "2026-01-01 03:00:00", "2026-01-01 03:05:00"))
      .toDF("id", "s", "e")
      .select(col("id"), col("s").cast("timestamp").as("s"),
        col("e").cast("timestamp").as("e"))
    val got = Analytics.concurrencyProfile(spans, "id", "s", "e")
      .orderBy(col("hour")).collect()
      .map(r => (r.getTimestamp(0).toString.substring(11, 13),
        r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = Array(
      ("00", 2L, 3L, 1L), // 1+2 overlap; 3 starts as 2 ends
      ("01", 2L, 1L, 2L), // 1 carried in, 4 nested
      ("02", 1L, 0L, 1L), // span 1 HELD through the hour until 02:30
      ("03", 1L, 1L, 1L)) // isolated span after the gap hour
    assert(got.sameElements(expected), got.mkString(", "))
  }

  test("q13 order-count distribution includes zero-order customers") {
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val ords = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val out = Analytics.q13OrderDistribution(cust, ords)
      .orderBy("c_count").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("eventTransitions counts ordered next-event pairs, row-normalized") {
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00")),
      (2L, 1L, "b", ts("2024-01-01 00:01:00")),
      (3L, 1L, "a", ts("2024-01-01 00:02:00")),
      (4L, 2L, "a", ts("2024-01-01 00:00:30")),
      (5L, 2L, "c", ts("2024-01-01 00:01:30"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    // user1: a→b→a; user2: a→c — last events emit no transition
    val out = Analytics.eventTransitions(ev)
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "a", 1L, 1.0)))
  }

  test("zscoreNormalize standardizes per group; degenerate groups emit 0") {
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 7.0), (5L, "b", 7.0), // zero variance
      (6L, "c", 99.0) // single row
    ).toDF("k", "g", "v")
    val out = Analytics.zscoreNormalize(df, "g", "v", Seq("k"))
      .orderBy("k").select("zscore").as[Double].collect().toSeq
    // group a: mean 20, population sd = sqrt(200/3)
    val sd = math.sqrt(200.0 / 3.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) == r6(-10.0 / sd) && out(1) == 0.0 &&
      out(2) == r6(10.0 / sd))
    assert(out(3) == 0.0 && out(4) == 0.0 && out(5) == 0.0)
  }

  test("peakConcurrency counts max open intervals; half-open at bounds") {
    // type A: [00:00,00:05) [00:02,00:07) [00:04,00:09) → 3 deep at 00:04;
    // type B: [00:00,00:05) [00:05,00:10) touch but never overlap → 1
    val ev = Seq(
      ("A", ts("2024-01-01 00:00:00")), ("A", ts("2024-01-01 00:02:00")),
      ("A", ts("2024-01-01 00:04:00")),
      ("B", ts("2024-01-01 00:00:00")), ("B", ts("2024-01-01 00:05:00"))
    ).toDF("event_type", "ts")
    val out = Analytics.peakConcurrency(ev)
      .orderBy("event_type")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("A", 3L, 3L), ("B", 1L, 2L)))
  }

  test("winsorize clips to the group's discrete percentile band") {
    val df = (1 to 100).map(i => (i.toLong, 1, "g", i.toDouble))
      .toDF("k1", "k2", "g", "v")
    val out = Analytics.winsorize(df, "g", "v", Seq("k1", "k2"),
      pLo = 0.10, pHi = 0.90)
    val clipped = out.orderBy("k1").select("clipped")
      .as[Double].collect()
    // smallest value with cume_dist >= .10 over 1..100 is 10; >= .90 is 90
    assert(clipped.min == 10.0 && clipped.max == 90.0)
    assert(clipped(49) == 50.0, "interior values pass through untouched")
    // ties: cume_dist is a function of the value, so equal values can
    // never straddle a cutoff
    val tied = Seq.fill(10)(5.0).zipWithIndex
      .map { case (v, i) => (i.toLong, 1, "g", v) }
      .toDF("k1", "k2", "g", "v")
    val tiedOut = Analytics.winsorize(tied, "g", "v", Seq("k1", "k2"))
      .select("clipped").as[Double].collect()
    assert(tiedOut.forall(_ == 5.0))
    // plan: exactly ONE window, over the slim (group, value) cutoff
    // branch — the wide fact rows reach the output through a
    // broadcast join only, never a sort
    val plan = Analytics.winsorize(df, "g", "v", Seq("k1", "k2"))
      .queryExecution.sparkPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.size == 1, s"expected one window:\n$plan")
    assert(wins.head.output.map(_.name).toSet
      .intersect(Set("k1", "k2")).isEmpty,
      "the window must not carry the fact columns")
  }
}
