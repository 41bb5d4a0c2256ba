package graft

import graft.sources.{LogTable, Protocol}
import org.apache.spark.sql.functions._

/** Protocol / table-feature gating — Delta's PROTOCOL.md discipline
  * (round-12): a reader REFUSES, by feature name, a table whose
  * protocol demands features it does not know, instead of silently
  * carrying unknown actions through a replay; a writer refuses to
  * commit to a table demanding unknown writer features while reads
  * keep working; feature-activating commits auto-upgrade the
  * protocol at the commit choke point. */
class LogProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_proto").toString

  test("writer-only features never fence readers: constraints, " +
    "defaults, generated and identity columns land in " +
    "writerFeatures ONLY; reader-relevant ones gate both sides") {
    val t = new LogTable(s"${tmp()}/t")
    t.create(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))),
      checkConstraints = Map("k_pos" -> "k > 0"),
      columnDefaults = Map("v" -> "'new'"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    val p = t.protocolAt().get
    assert(p.writerFeatures.contains("checkConstraints") &&
      p.writerFeatures.contains("columnDefaults"), p.toString)
    // the data is readable without understanding either feature —
    // a lighter reader must not be fenced (Delta's writer-only rule)
    assert(!p.readerFeatures.contains("checkConstraints") &&
      !p.readerFeatures.contains("columnDefaults"), p.toString)
    // a DV changes what rows a scan must serve: reader-relevant
    t.deleteMor(spark, col("k") === 1L)
    val p2 = t.protocolAt().get
    assert(p2.readerFeatures.contains("deletionVectors"))
    assert(p2.writerFeatures.contains("deletionVectors"))
  }

  test("create records a protocol action; feature activation " +
    "auto-upgrades it in the same commit") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1))                                          // v0
    val p0 = t.protocolAt().get
    assert(p0.minReader == 1 && p0.minWriter == 1)
    assert(p0.readerFeatures.isEmpty, p0.toString)
    // the FIRST deletion vector upgrades the protocol atomically
    // with the commit that introduces it
    t.deleteMor(spark, col("k") === 1L)                         // v1
    assert(t.protocolAt().get.readerFeatures == Set("deletionVectors"))
    // time travel BEFORE the upgrade serves the old protocol
    assert(t.protocolAt(Some(0L)).get.readerFeatures.isEmpty)
    // row tracking adds its feature too; earlier ones persist
    t.enableRowTracking()                                       // v2
    assert(t.protocolAt().get.readerFeatures ==
      Set("deletionVectors", "rowTracking"))
    // no-op commits don't churn protocol actions: the next plain
    // append leaves the state identical
    val before = t.protocolAt().get
    t.append(Seq((3L, "c")).toDF("k", "v"))
    assert(t.protocolAt().get == before)
  }

  test("a table demanding an UNKNOWN reader feature refuses to load " +
    "with a message naming the feature — no half-read") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    // simulate a FUTURE writer: its protocol demands a feature this
    // build does not know
    t.commitProtocol(Protocol(1, 1,
      readerFeatures = Set("vectorIndexV9"),
      writerFeatures = Set("vectorIndexV9")))                   // v1
    val fresh = new LogTable(dir)
    val e = intercept[IllegalStateException](fresh.load(spark))
    assert(e.getMessage.contains("vectorIndexV9"), e.getMessage)
    assert(e.getMessage.contains("reader feature"), e.getMessage)
    // metadata access refuses the same way (the gate is the
    // snapshot fold itself, not one read path)
    val e2 = intercept[IllegalStateException](
      new LogTable(dir).schema)
    assert(e2.getMessage.contains("vectorIndexV9"))
    // and writes refuse too (the foreign table is fully fenced)
    val e3 = intercept[IllegalStateException](
      new LogTable(dir).append(Seq((2L, "b")).toDF("k", "v")))
    assert(e3.getMessage.contains("vectorIndexV9"))
    // TIME TRAVEL to the pre-upgrade version still reads: the gate
    // is per-snapshot state, exactly Delta's rule
    assert(new LogTable(dir).load(spark, Some(0L)).count() == 1L)
  }

  test("an unknown WRITER feature fences commits but leaves reads " +
    "working; a too-new minReader refuses by version") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    t.commitProtocol(Protocol(1, 1,
      readerFeatures = Set.empty,
      writerFeatures = Set("asyncCompactionV2")))               // v1
    val fresh = new LogTable(dir)
    assert(fresh.load(spark).count() == 1L) // reads fine
    val e = intercept[IllegalStateException](
      fresh.append(Seq((2L, "b")).toDF("k", "v")))
    assert(e.getMessage.contains("asyncCompactionV2"), e.getMessage)
    assert(e.getMessage.contains("writer feature"), e.getMessage)
    assert(fresh.load(spark).count() == 1L, "table must stay readable")

    val dir2 = s"${tmp()}/t2"
    val t2 = new LogTable(dir2)
    t2.append(Seq((1L, "a")).toDF("k", "v"))
    t2.commitProtocol(Protocol(9, 9, Set.empty, Set.empty))
    val e2 = intercept[IllegalStateException](
      new LogTable(dir2).load(spark))
    assert(e2.getMessage.contains("reader version 9"), e2.getMessage)
  }

  test("protocol rides checkpoints: a replay THROUGH a checkpoint " +
    "sees the same protocol state as a raw replay, and the gate " +
    "still fires past one") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 2)
    t.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))),
      properties = Map("graft.checkpoint.parquetThreshold" -> "1")) // v0
    t.append(Seq((1L, "a"), (9L, "x")).toDF("k", "v")
      .repartition(1))                                          // v1
    t.deleteMor(spark, col("k") === 1L)                         // v2 ckpt
    t.append(Seq((2L, "b")).toDF("k", "v"))                     // v3
    val viaCkpt = new LogTable(dir)
    val raw = new LogTable(dir)
    raw.ignoreCheckpointsForTest = true
    (0L to 3L).foreach { v =>
      assert(viaCkpt.protocolAt(Some(v)) == raw.protocolAt(Some(v)),
        s"protocol diverges at v$v")
    }
    assert(viaCkpt.protocolAt(Some(3L)).get.readerFeatures
      .contains("deletionVectors"))
    // an unknown feature committed AFTER the checkpoint still fences
    // a checkpoint-based replay (landing on an off-interval version —
    // the injecting writer itself could not checkpoint a state it
    // can no longer read)
    t.append(Seq((3L, "c")).toDF("k", "v"))                     // v4 ckpt
    t.commitProtocol(Protocol(1, 1, Set("futureThing"), Set.empty)) // v5
    val e = intercept[IllegalStateException](
      new LogTable(dir).load(spark))
    assert(e.getMessage.contains("futureThing"))
  }

  test("legacy tables without a protocol action keep reading; their " +
    "next commit records a baseline protocol") {
    // build a pre-protocol log by writing commits through the seam,
    // then stripping the protocol lines — the on-disk shape of every
    // pre-round-12 table
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    val log = new java.io.File(dir, "_log")
    log.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
      val kept = java.nio.file.Files.readString(f.toPath)
        .linesIterator.filterNot(_.contains("\"protocol\""))
        .mkString("\n")
      java.nio.file.Files.writeString(f.toPath, kept)
    }
    val legacy = new LogTable(dir)
    assert(legacy.protocolAt().isEmpty)
    assert(legacy.load(spark).count() == 1L)
    legacy.append(Seq((2L, "b")).toDF("k", "v"))                // v1
    val p = legacy.protocolAt().get
    assert(p.minReader == 1 && p.readerFeatures.isEmpty)
  }
}
