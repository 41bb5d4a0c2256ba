package graft

import graft.sources.{GraftTableCatalog, LogTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** The native DSv2 STREAMING SINK: `df.writeStream.toTable("cat.t")`
  * lands each micro-batch as one exactly-once log append tagged
  * (queryId, epochId) — Delta's txnAppId/txnVersion idempotence. A
  * checkpoint restart that replays an epoch deduplicates at the
  * commit layer; the table stays readable (and time-travelable)
  * between batches like any other log table. */
class Dsv2StreamWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dsw").toString

  private var n = 0
  private def freshCatalog(warehouse: String): String = {
    n += 1
    val cat = s"gdsw_$n"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    cat
  }

  test("writeStream.toTable appends micro-batches as txn-tagged log " +
    "commits; content exact across batches") {
    val wh = tmp()
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING log")
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$wh/_ckpt")
      .trigger(Trigger.ProcessingTime(50))
      .toTable(s"$cat.t")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
    val log = new LogTable(s"$wh/t")
    // every data commit is an append carrying the stream's txn tag
    val ops = log.versions.map(log.commitOp)
    assert(ops.count(_ == "append") == 2, ops)
  }

  test("a replayed epoch after a checkpoint restart deduplicates — " +
    "exactly-once across kill/resume") {
    val wh = tmp()
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING log")
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$wh/_ckpt")
      .trigger(Trigger.ProcessingTime(50))
      .toTable(s"$cat.t")
    val q1 = start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint: the engine may replay the
    // last epoch; the txn tag must drop it, not duplicate it
    val q2 = start()
    try {
      mem.addData((3L, "c"))
      q2.processAllAvailable()
      assert(spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q2.stop()
    // belt-and-braces: the commit layer itself refuses a stale epoch
    // under the SAME app id the stream committed with
    val log = new LogTable(s"$wh/t")
    val before = log.currentVersion.get
    val tags = log.versions.flatMap(v => log.commitTxn(v)).map(_._1)
    assert(tags.nonEmpty, "stream commits must carry txn tags")
    val app = tags.head
    val last = log.lastCommittedBatch(app).get
    assert(log.appendStreamBatch(
      Seq((9L, "dup")).toDF("k", "v"), app, last).isEmpty)
    assert(log.currentVersion.get == before)
  }

  test("streaming complete-mode (truncate) and identity tables refuse") {
    val wh = tmp()
    val cat = freshCatalog(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING log")
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ex = intercept[Exception] {
      val q = mem.toDF().toDF("k", "v")
        .groupBy("v").count()
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", s"$wh/_ckpt2")
        .toTable(s"$cat.t")
      try { mem.addData((1L, "a")); q.processAllAvailable() }
      finally q.stop()
    }
    assert(ex.getMessage != null)
  }
}
