package graft

import graft.operators.{Clustering, Temporal}
import graft.operators.Analytics
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin attaches latest right state at or before left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 50.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 09:59:00"), "t0"), // before any quote → null
      (1L, ts("2024-01-01 10:00:00"), "t1"), // equal ts → inclusive
      (1L, ts("2024-01-01 10:59:59"), "t2"),
      (1L, ts("2024-01-01 12:00:00"), "t3"),
      (2L, ts("2024-01-01 11:00:00"), "t4"),
      (3L, ts("2024-01-01 11:00:00"), "t5")  // key with no right rows
    ).toDF("sym", "tts", "tid")
    val out = Temporal.asOfJoin(trades, "sym", "tts",
      quotes, "sym", "qts", Seq("px"))
      .orderBy("tid")
      .select("tid", "px").as[(String, Option[Double])].collect().toSeq
    assert(out == Seq(("t0", None), ("t1", Some(100.0)), ("t2", Some(100.0)),
      ("t3", Some(110.0)), ("t4", Some(50.0)), ("t5", None)))
  }

  test("connectedComponents finds min-label components") {
    val vertices = (0L to 9L).toDF("id")
    // components: {0,1,2,3}, {4,5}, singletons 6..9
    val edges = Seq((1L, 2L), (2L, 3L), (0L, 1L), (4L, 5L)).toDF("src", "dst")
    val out = Clustering.connectedComponents(vertices, edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("connectedComponents: distributed loop matches local union-find") {
    // a chain (worst case for propagation), a clique, and singletons
    val vertices = (0L to 19L).toDF("id")
    val edges = ((0L to 8L).map(i => (i, i + 1)) ++
      Seq((12L, 13L), (13L, 14L), (12L, 14L), (17L, 18L)))
      .toDF("src", "dst")
    val local = Clustering.connectedComponents(vertices, edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val dist = Clustering.connectedComponents(vertices, edges,
      localSolveMaxEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(local == dist)
    assert(local.take(10).forall(_._2 == 0L))
  }

  test("dupClusters marks representatives") {
    val ids = Seq(10L, 11L, 12L).toDF("vec_id")
    val pairs = Seq((10L, 12L)).toDF("id_a", "id_b")
    val out = Clustering.dupClusters(ids, "vec_id", pairs)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((10L, 10L, true), (11L, 11L, true), (12L, 10L, false)))
  }

  test("intervalJoin picks the covering SCD2 version") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dim = Seq(
      (1L, "v1", ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00")), false),
      (1L, "v2", ts("2024-02-01 00:00:00"), None, true),
      (2L, "w1", ts("2024-01-15 00:00:00"), None, true))
      .toDF("user_id", "ver", "valid_from", "valid_to", "is_current")
    val facts = Seq(
      (100L, 1L, ts("2024-01-10 00:00:00")), // inside v1
      (101L, 1L, ts("2024-02-01 00:00:00")), // boundary → v2 (half-open)
      (102L, 2L, ts("2024-01-01 00:00:00")), // before w1 → no match
      (103L, 3L, ts("2024-01-01 00:00:00"))) // unknown key
      .toDF("fact_id", "user_id", "ts")
    val inner = Temporal.intervalJoin(facts, "user_id", "ts", dim, "user_id")
      .select("fact_id", "ver").as[(Long, String)].collect().toSeq.sorted
    assert(inner == Seq((100L, "v1"), (101L, "v2")))
    val outer = Temporal.intervalJoin(facts, "user_id", "ts", dim,
      "user_id", leftOuter = true)
      .select("fact_id", "ver").as[(Long, Option[String])]
      .collect().toSeq.sorted
    assert(outer == Seq((100L, Some("v1")), (101L, Some("v2")),
      (102L, None), (103L, None)))
  }

  test("approx percentiles within 1% of exact") {
    val orders = Tables("orders")
    val exact = Analytics.percentiles(orders)
      .select("o_orderpriority", "p99").as[(String, Double)].collect().toMap
    val approx = Analytics.approxPercentiles(orders)
      .select("o_orderpriority", "p99").as[(String, Double)].collect().toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) / math.abs(v) < 0.01,
        s"$k: approx ${approx(k)} vs exact $v")
    }
  }

  test("approx distinct within 5% of exact") {
    val ev = Tables("events")
    val exact = Analytics.distinctCounts(ev)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val approx = Analytics.approxDistinctCounts(ev)
      .select("event_type", "n_users_approx").as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05,
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  private def Tables(name: String) =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.01", name)
}
