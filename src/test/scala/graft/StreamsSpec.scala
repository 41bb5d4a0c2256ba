package graft

import graft.operators.Analytics
import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    Event(1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
    Event(2L, ts("2024-01-01 00:20:00"), 2L, "view", 2.0),
    Event(3L, ts("2024-01-01 01:10:00"), 1L, "click", 3.0),
    Event(4L, ts("2024-01-01 01:40:00"), 1L, "purchase", 4.0),
    Event(5L, ts("2024-01-01 02:05:00"), 2L, "click", 5.0))

  test("streaming windowedAgg matches the batch twin on bounded input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = Streams.windowedAgg(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_out")
      .orderBy("win_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = Analytics.windowedEvents(events.toDF())
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("streaming windowedApproxDistinct matches exact counts on bounded input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = Streams.windowedApproxDistinct(mem.toDF())
      .writeStream.format("memory").queryName("adist_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("adist_out")
      .orderBy("win_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSeq
    // at 5 events the HLL++ sketch is exact; window boundaries and
    // group keys must line up with the batch formulation
    val exact = events.toDF()
      .groupBy(date_trunc("hour", col("ts")).as("win_start"),
        col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("win_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSeq
    assert(streamed == exact)
  }

  test("streamingScd1 keeps last-writer-wins state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamingScd1(mem.toDS())
      .writeStream.format("memory").queryName("scd1_out")
      .outputMode("update").start()
    try {
      mem.addData(events.take(2): _*)
      q.processAllAvailable()
      mem.addData(events.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val state = spark.table("scd1_out")
      .groupBy("user_id").agg(last("event_type").as("event_type"))
      .orderBy("user_id")
      .as[(Long, String)].collect().toSeq
    assert(state == Seq((1L, "purchase"), (2L, "click")))
  }

  test("streamingSessionize closes sessions on gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamingSessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 50-min
      // gap inside the same batch → first session closes in-batch
      mem.addData(
        Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-01 00:10:00"), 1L, "view", 1.0),
        Event(3L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past user 1's last event + gap so
      // the open session times out and flushes
      mem.addData(Event(9L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(10L, ts("2024-01-01 23:00:00"), 2L, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess_out")
      .orderBy("user_id", "session_start")
      .as[Streams.SessionOut].collect().toSeq
    val u1 = out.filter(_.user_id == 1L)
    assert(u1.map(s => (s.session_start, s.session_end, s.n_events)) == Seq(
      (ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2L),
      (ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00"), 1L)))
  }

  test("sinkToDim maintains an SCD2 dimension across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val cfg = graft.operators.Pipeline.TableConfig("user_dim",
      keyCols = Seq("user_id"), attrCols = Seq("event_type"),
      recencyCols = Seq("ts", "event_id"))
    val mem = MemoryStream[Event]
    val q = Streams.sinkToDim(mem.toDF(), cfg, "ts",
      s"$dir/dim", s"$dir/ckpt")
    try {
      mem.addData(Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      mem.addData(
        Event(2L, ts("2024-01-02 00:00:00"), 1L, "purchase", 1.0),
        Event(3L, ts("2024-01-02 00:00:00"), 2L, "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val dim = spark.read.parquet(s"$dir/dim")
      .orderBy("user_id", "valid_from")
      .select("user_id", "event_type", "is_current")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(dim == Seq(
      (1L, "click", false),
      (1L, "purchase", true),
      (2L, "view", true)))
  }

  test("streamingDedup drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events ++ Seq(events.head.copy(value = 99.0)): _*)
    val q = Streams.streamingDedup(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup_out").count() == 5)
  }
}
