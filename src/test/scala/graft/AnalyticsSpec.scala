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
}
