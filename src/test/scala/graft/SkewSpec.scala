package graft

import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin is row-identical to the plain join") {
    val sf = "/root/testdata/sf0.001"
    val lineitem = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = lineitem.join(orders, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(lineitem, orders, Seq("l_orderkey"),
      salts = 8, saltBy = struct(col("l_orderkey"), col("l_linenumber")))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("adaptiveSaltedJoin salts only hot keys and stays row-identical") {
    import spark.implicits._
    // key 1 is hot (200 rows), keys 2..20 are cold (1 row each)
    val fact = ((1 to 200).map(i => (1L, i.toLong)) ++
      (2 to 20).map(k => (k.toLong, 0L))).toDF("k", "row_id")
    val dim = (1 to 25).map(k => (k.toLong, s"attr$k")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
    val adaptive = Skew.adaptiveSaltedJoin(fact, dim, Seq("k"),
      salts = 8, saltBy = col("row_id"), hotThreshold = 100L)
    assert(adaptive.count() == plain.count())
    assert(adaptive.exceptAll(plain).isEmpty &&
      plain.exceptAll(adaptive).isEmpty)
    // the hot key really spreads over multiple salt buckets, cold
    // keys pay nothing (exactly one replica each in the dim side)
    val hotSalts = fact.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("row_id")), lit(8)).cast("int").as("s"))
      .distinct().count()
    assert(hotSalts > 1)
  }

  test("two-phase sessionize is row-identical on a hot-user fixture") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // user 1 is a bot: 5000 events over 3 days, mixing sub-gap bursts
    // and super-gap silences (sessions must stitch across midnight);
    // users 2..20 are ordinary
    val t0 = 1700000000000000L // µs
    val events = ((0 until 5000).map { i =>
      // bursts of 50 events 10 min apart, then a 2 h silence;
      // 10-minute steps roll sessions across day boundaries
      (i.toLong, 1L, t0 + i / 50 * 7200000000L + i % 50 * 600000000L)
    } ++ (0 until 200).map { i =>
      (10000L + i, 2L + i % 19, t0 + i * 3600000000L)
    }).toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val twoPhase = graft.operators.Analytics.sessionize(events)
    // reference: the single-window formulation (what the oracle runs)
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val prevTs = lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(prevTs.isNull ||
      (unix_micros(col("ts")) - prevTs) > 1800L * 1000000L, 1).otherwise(0)
    val oneWindow = events
      .withColumn("__n", isNew)
      .withColumn("session_seq", sum(col("__n")).over(byUser).cast("long"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
    assert(twoPhase.count() == oneWindow.count())
    assert(twoPhase.exceptAll(oneWindow).isEmpty &&
      oneWindow.exceptAll(twoPhase).isEmpty)
    // and a session genuinely crosses a bucket boundary somewhere
    val crossing = twoPhase.filter(col("user_id") === 1L &&
      to_date(col("session_start")) =!= to_date(col("session_end"))).count()
    assert(crossing > 0, "fixture must exercise cross-bucket stitching")
  }

  test("segmentDupStats hot-segment guard is row-identical") {
    import spark.implicits._
    // one boilerplate segment appears in 300 docs (hot under a
    // threshold of 100); every doc also has a unique segment
    val docs = (0L until 300L).map { i =>
      // first 8-word chunk identical in every doc, tail unique
      (i, "common boilerplate licence header text goes right here " +
        s"unique$i body content for document number $i")
    }.toDF("doc_id", "text")
    val guarded = graft.operators.Dedup.segmentDupStats(docs, k = 8,
      hotSegmentThreshold = 100L, salts = 8)
    val plain = graft.operators.Dedup.segmentDupStats(docs, k = 8)
    assert(guarded.count() == 300)
    assert(guarded.exceptAll(plain).isEmpty &&
      plain.exceptAll(guarded).isEmpty)
    // the guard must actually engage on this fixture: the hot set is
    // non-empty at threshold 100
    val segs = graft.operators.Dedup
      .wordChunkSegments(docs, "doc_id", "text", 8)
      .groupBy(xxhash64(col("seg"))).count().filter(col("count") >= 100)
    assert(segs.count() >= 1)
  }

  test("joinBlowupProfile predicts the self-join explosion exactly") {
    import spark.implicits._
    // planted skew: key 7 has 100 rows, key 1 has 10, keys 2-6 one each
    val rows = Seq.fill(100)(7L) ++ Seq.fill(10)(1L) ++ (2L to 6L)
    val df = rows.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "payload")
    val prof = Skew.joinBlowupProfile(df, df, "k", "k", k = 3).collect()
    assert(prof.length == 3)
    // top contributor: 100*100 = 10000 of 10105 total
    assert(prof(0).getLong(0) == 7L && prof(0).getLong(3) == 10000L)
    assert(prof(1).getLong(0) == 1L && prof(1).getLong(3) == 100L)
    assert(math.abs(prof(0).getDouble(4) - 10000.0 / 10105.0) < 1e-4)
    // prediction matches the real join size
    val actual = df.as("a").join(df.as("b"), "k").count()
    assert(actual == 10105L)
  }

  test("skewedDistinctCount matches exact distinct counts") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.load(spark, sf, "lineitem")
    val exact = li.groupBy("l_orderkey")
      .agg(count_distinct(col("l_suppkey")).as("n_distinct"))
    val salted = Skew.skewedDistinctCount(li, Seq("l_orderkey"),
      "l_suppkey", salts = 16)
    assert(salted.join(exact.withColumnRenamed("n_distinct", "ref"),
      "l_orderkey").filter(col("n_distinct") =!= col("ref")).count() == 0)
    assert(salted.count() == exact.count())
  }

  test("retentionCohorts stays partial-aggregated under a hot user") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // one user with 20k events (a bot) against 50 normal users: the
    // per-user aggregates must combine map-side so no reducer ever
    // receives the bot's raw event volume
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hot = (0 until 20000).map(i =>
      (999L, new java.sql.Timestamp(base + i.toLong * 60000)))
    val normal = (1 to 50).flatMap(u => (0 until 3).map(w =>
      (u.toLong, new java.sql.Timestamp(base + w.toLong * 7 * 86400000L))))
    val events = (hot ++ normal).toDF("user_id", "ts")
    val out = graft.operators.Analytics.retentionCohorts(events)
    // plan: both user-keyed aggregates run a partial phase before
    // their exchange — the skew guard is map-side combine itself
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"expected map-side partial_min in:\n$plan")
    // row-identity vs an independent window-based formulation
    val ref = events
      .withColumn("cohort_week", date_trunc("week",
        min(col("ts")).over(Window.partitionBy("user_id"))))
      .select(col("user_id"), col("cohort_week"),
        date_trunc("week", col("ts")).as("act_week"))
      .distinct()
      .groupBy("cohort_week", "act_week")
      .agg(count_distinct(col("user_id")).as("n_users"))
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty)
  }
}
