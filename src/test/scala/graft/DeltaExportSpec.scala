package graft

import java.io.File

import graft.sources.{DeltaExport, LogTable}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta-protocol EXPORT (round-12): a LogTable snapshot emitted as
  * a spec-compliant `_delta_log/` an external Delta reader could
  * consume — JSON commit with protocol/metaData/add actions,
  * single-part parquet checkpoint, `_last_checkpoint` pointer. No
  * Delta implementation exists in this environment (offline), so
  * conformance is STRUCTURAL (spec-required fields) plus a
  * round-trip through this library's own reader as a proxy —
  * documented as weaker than the usual executable-oracle bar. */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dexp").toString

  test("export emits the spec's commit shape: protocol, metaData, " +
    "one add per live file with Delta-rendered stats") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    t.append(Seq((3L, null.asInstanceOf[String])).toDF("k", "v"))
    val commit = DeltaExport.exportDeltaLog(spark, t)
    val lines = java.nio.file.Files.readString(new File(commit).toPath)
      .linesIterator.filter(_.nonEmpty).toSeq
    // line 1: protocol with the spec's version fields
    val proto = JsonMethods.parse(lines.head) \ "protocol"
    assert((proto \ "minReaderVersion") == JInt(1))
    assert((proto \ "minWriterVersion") == JInt(2))
    // line 2: metaData with id/format/schemaString/partitionColumns
    val meta = JsonMethods.parse(lines(1)) \ "metaData"
    assert((meta \ "id").isInstanceOf[JString])
    assert((meta \ "format" \ "provider") == JString("parquet"))
    val schemaStr = (meta \ "schemaString").asInstanceOf[JString].s
    assert(org.apache.spark.sql.types.DataType.fromJson(schemaStr)
      .isInstanceOf[org.apache.spark.sql.types.StructType])
    assert((meta \ "partitionColumns") == JArray(Nil))
    assert((meta \ "configuration") == JObject(Nil))
    // the rest: one add per live file, spec fields + stats JSON
    val adds = lines.drop(2).map(l => JsonMethods.parse(l) \ "add")
    assert(adds.size == t.liveAdds().size)
    adds.foreach { a =>
      assert((a \ "path").isInstanceOf[JString])
      assert((a \ "dataChange") == JBool(true))
      assert((a \ "size").isInstanceOf[JInt] ||
        (a \ "size").isInstanceOf[JLong])
      val stats = JsonMethods.parse(
        (a \ "stats").asInstanceOf[JString].s)
      assert((stats \ "numRecords") != JNothing)
      assert((stats \ "minValues") != JNothing)
      assert((stats \ "maxValues") != JNothing)
      assert((stats \ "nullCount") != JNothing)
    }
    // the null v in file 2: nullCount records it, minValues omits it
    val nullAdd = adds.find(a => (JsonMethods.parse(
      (a \ "stats").asInstanceOf[JString].s) \ "numRecords") ==
      JInt(1)).get
    val st = JsonMethods.parse((nullAdd \ "stats").asInstanceOf[JString].s)
    assert((st \ "nullCount" \ "v") == JInt(1))
    assert((st \ "minValues" \ "v") == JNothing)
  }

  test("export writes the spec checkpoint (single part, action " +
    "columns, _last_checkpoint pointer) and round-trips through " +
    "the import reader") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(2))
    t.delete(spark, col("k") === 2L) // CoW — exportable
    DeltaExport.exportDeltaLog(spark, t)
    val dlog = new File(dir, "_delta_log")
    val v = t.currentVersion.get
    val ckpt = new File(dlog, f"$v%020d.checkpoint.parquet")
    assert(ckpt.isFile, dlog.listFiles().map(_.getName).toSeq)
    val cols = spark.read.parquet(ckpt.getPath).columns.toSet
    assert(Set("protocol", "metaData", "add").subsetOf(cols), cols)
    val last = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dlog, "_last_checkpoint").toPath))
    assert((last \ "version") == JInt(BigInt(v)))
    assert((last \ "size") != JNothing)
    // round-trip: the imported snapshot serves exactly the rows
    val got = DeltaExport.loadDelta(spark, dir)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "c")))
  }

  test("a hive-partitioned snapshot exports with partitionColumns " +
    "and add-level partitionValues, and round-trips") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg",
        org.apache.spark.sql.types.StringType))),
      partitionBy = Seq("seg"))
    t.append(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "seg"))
    val commit = DeltaExport.exportDeltaLog(spark, t)
    val lines = java.nio.file.Files.readString(new File(commit).toPath)
      .linesIterator.filter(_.nonEmpty).toSeq
    assert((JsonMethods.parse(lines(1)) \ "metaData" \
      "partitionColumns") == JArray(List(JString("seg"))))
    val pvs = lines.drop(2).map(l =>
      (JsonMethods.parse(l) \ "add" \ "partitionValues" \ "seg"))
    assert(pvs.forall(_.isInstanceOf[JString]))
    val got = DeltaExport.loadDelta(spark, dir)
      .select("k", "seg").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "a"), (3L, "b")))
  }

  test("date/timestamp/boolean stats render as Delta's TYPED JSON " +
    "(ISO-8601 strings, booleans) — never graft's raw longs") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq(
      ("2021-04-01", "2021-04-01 12:30:45.123456", true),
      ("2023-12-31", "2023-12-31 23:59:59.000001", false))
      .toDF("ds", "tss", "flag")
      .select(to_date(col("ds")).as("d"),
        to_timestamp(col("tss")).as("ts"), col("flag"))
      .repartition(1))
    val commit = DeltaExport.exportDeltaLog(spark, t)
    val add = java.nio.file.Files.readString(new File(commit).toPath)
      .linesIterator.filter(_.nonEmpty).toSeq.drop(2).head
    val st = JsonMethods.parse((JsonMethods.parse(add) \ "add" \
      "stats").asInstanceOf[JString].s)
    assert((st \ "minValues" \ "d") == JString("2021-04-01"), st)
    assert((st \ "maxValues" \ "d") == JString("2023-12-31"), st)
    // timestamps: ISO instants, micro precision, zone-suffixed —
    // the exact instant is the column's true minimum (tz-independent
    // check against Spark's own micros)
    val tsMin = (st \ "minValues" \ "ts").asInstanceOf[JString].s
    assert(tsMin.endsWith("Z") && tsMin.contains("T"), tsMin)
    val expMicros = t.load(spark)
      .agg(min(unix_micros(col("ts")))).as[Long].collect().head
    assert(java.time.Instant.parse(tsMin) ==
      java.time.Instant.EPOCH.plus(expMicros,
        java.time.temporal.ChronoUnit.MICROS), tsMin)
    assert((st \ "minValues" \ "flag") == JBool(false), st)
    assert((st \ "maxValues" \ "flag") == JBool(true), st)
  }

  test("a second FULL export refuses (it would resurrect removed " +
    "files for replaying readers) and v>0 without a checkpoint " +
    "refuses (no contiguous replay start)") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v"))                     // v0
    t.append(Seq((2L, "b")).toDF("k", "v"))                     // v1
    val e1 = intercept[IllegalArgumentException](
      DeltaExport.exportDeltaLog(spark, t, withCheckpoint = false))
    assert(e1.getMessage.contains("no version 0") &&
      e1.getMessage.contains("_last_checkpoint"), e1.getMessage)
    DeltaExport.exportDeltaLog(spark, t) // checkpointed: fine
    val e2 = intercept[IllegalArgumentException](
      DeltaExport.exportDeltaLog(spark, t))
    assert(e2.getMessage.contains("exportTail"), e2.getMessage)
  }

  test("exportTail mirrors commits gaplessly: one Delta commit per " +
    "graft commit, removes included, metaData re-emitted on schema " +
    "change, and the importer replays the tail to the same live set") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1))                                          // v0
    DeltaExport.exportDeltaLog(spark, t, version = Some(0L))
    t.append(Seq((3L, "c")).toDF("k", "v"))                     // v1
    t.delete(spark, col("k") === 1L)                            // v2 CoW
    t.append(Seq((4L, "d"), (5L, null.asInstanceOf[String]))
      .toDF("k", "v").withColumn("extra", lit(7L)),
      mergeSchema = true)                                       // v3
    // a gap refuses by name
    val eGap = intercept[IllegalArgumentException](
      DeltaExport.exportTail(spark, t, 2L, 3L))
    assert(eGap.getMessage.contains("GAP"), eGap.getMessage)
    val commits = DeltaExport.exportTail(spark, t, 1L, 3L)
    assert(commits.size == 3)
    // gapless numbering on disk: 0..3 all present
    val names = new File(dir, "_delta_log").listFiles()
      .map(_.getName).filter(_.matches("\\d{20}\\.json")).sorted
    assert(names.toSeq == (0L to 3L).map(v => f"$v%020d.json"))
    // v2 carries the CoW remove + add; v3 re-emits metaData
    val v2 = java.nio.file.Files.readString(
      new File(dir, f"_delta_log/${2L}%020d.json").toPath)
    assert(v2.contains("\"remove\""), v2)
    val v3 = java.nio.file.Files.readString(
      new File(dir, f"_delta_log/${3L}%020d.json").toPath)
    assert(v3.contains("\"metaData\"") && v3.contains("extra"), v3)
    // the importer's replayed live set is graft's own
    val (schema, _, files) = DeltaExport.readDeltaSnapshot(spark, dir)
    assert(schema.fieldNames.contains("extra"))
    assert(files.map(_._1).toSet == t.liveAdds().map(_.path).toSet)
    val got = DeltaExport.loadDelta(spark, dir)
      .select("k").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L, 5L))
    // re-exporting an already-mirrored commit refuses
    val eDup = intercept[IllegalArgumentException](
      DeltaExport.exportTail(spark, t, 3L, 3L))
    assert(eDup.getMessage.contains("already exported"), eDup.getMessage)
  }

  test("a 100k-file registered snapshot exports THROUGH the " +
    "distributed manifest: adds render on executors, the driver " +
    "never materializes the file list, and the import folds the " +
    "checkpoint slim") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a")).toDF("k", "v").repartition(1))      // v0
    t.registerFiles((0 until 100000).map { i =>
      graft.sources.AddFile(f"data/fake-$i%06d.parquet",
        rows = 10L, bytes = 512L,
        stats = Map("k" -> graft.sources.ColStats(
          Some(i * 10L), Some(i * 10L + 9L), 0L)))
    })                                                          // v1 ckpt
    val fresh = new LogTable(dir)
    DeltaExport.exportDeltaLog(spark, fresh)
    assert(!fresh.addsMaterializedAt(),
      "the export materialized the 100k-file manifest on the driver")
    val (_, _, files) = DeltaExport.readDeltaSnapshot(spark, dir)
    assert(files.size == 100001)
    val last = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "_delta_log/_last_checkpoint").toPath))
    assert((last \ "size") == JInt(BigInt(100003)), last)
  }

  test("checkpoints are SPEC-SHAPED, never schema-inferred: " +
    "partitionValues is map<string,string> and present on an " +
    "unpartitioned table, format.options/configuration survive " +
    "empty, and no commitInfo row leaks in") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    DeltaExport.exportDeltaLog(spark, t) // unpartitioned + checkpoint
    val ckpt = spark.read.parquet(
      s"$dir/_delta_log/00000000000000000000.checkpoint.parquet")
    val addT = ckpt.schema("add").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(addT("partitionValues").dataType ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType),
      s"partitionValues must be map<string,string>: $addT")
    val metaT = ckpt.schema("metaData").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaT("configuration").dataType
      .isInstanceOf[org.apache.spark.sql.types.MapType])
    assert(metaT("format").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("options"))
    // the empty maps are PRESENT (not null): strict readers read
    // them by contract
    val m = ckpt.filter(col("metaData").isNotNull)
      .select("metaData.configuration").collect().head
    assert(m.getMap[String, String](0) != null)
    assert(!ckpt.columns.contains("commitInfo"))
    // and exportCheckpoint's multi-row path produces the same shape
    t.append(Seq((3L, "c")).toDF("k", "v").repartition(1))
    DeltaExport.exportTail(spark, t, 1L, 1L)
    DeltaExport.exportCheckpoint(spark, t)
    val ckpt2 = spark.read.parquet(
      s"$dir/_delta_log/00000000000000000001.checkpoint.parquet")
    assert(ckpt2.schema("add").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType](
        "partitionValues").dataType ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
  }

  test("checkpoint rows carry dataChange = false whatever the " +
    "commit said — a strict consumer bootstrapping from the " +
    "checkpoint never double-counts the snapshot as changes") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    DeltaExport.exportDeltaLog(spark, t) // writeCheckpoint path
    val ckpt = spark.read.parquet(
      s"$dir/_delta_log/00000000000000000000.checkpoint.parquet")
    val dcs = ckpt.filter(col("add").isNotNull)
      .select("add.dataChange").collect().map(_.getBoolean(0))
    assert(dcs.nonEmpty && dcs.forall(_ == false),
      s"checkpoint add.dataChange must be false: ${dcs.toSeq}")
    // the COMMIT keeps dataChange = true (it IS the change record)
    val v0 = java.nio.file.Files.readString(new File(dir,
      f"_delta_log/${0L}%020d.json").toPath)
    assert(v0.contains("\"dataChange\":true"), v0)
    // exportCheckpoint's path too, over a commit that REMOVED files
    t.delete(spark, col("k") === 1L)                            // v1
    DeltaExport.exportTail(spark, t, 1L, 1L)
    DeltaExport.exportCheckpoint(spark, t)
    val ckpt2 = spark.read.parquet(
      s"$dir/_delta_log/00000000000000000001.checkpoint.parquet")
    val dcs2 = ckpt2.filter(col("add").isNotNull)
      .select("add.dataChange").collect().map(_.getBoolean(0))
    assert(dcs2.nonEmpty && dcs2.forall(_ == false), dcs2.toSeq)
  }

  test("a mirrored OPTIMIZE commit carries dataChange = false — " +
    "followers never double-count compacted rows") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    (1 to 3).foreach(i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("k", "v").repartition(1)))
    DeltaExport.mirrorDelta(spark, t)
    t.compactFiles(spark, smallBytes = 1L << 20)                // v3
    assert(t.commitOp(t.currentVersion.get) == "optimize")
    DeltaExport.mirrorDelta(spark, t)
    val v3 = java.nio.file.Files.readString(new File(dir,
      f"_delta_log/${3L}%020d.json").toPath)
    val actions = v3.linesIterator.filter(_.nonEmpty)
      .map(JsonMethods.parse(_)).toSeq
    val adds = actions.filter(j => (j \ "add") != JNothing)
    val removes = actions.filter(j => (j \ "remove") != JNothing)
    assert(adds.nonEmpty && removes.nonEmpty)
    assert(adds.forall(j =>
      (j \ "add" \ "dataChange") == JBool(false)), v3)
    assert(removes.forall(j =>
      (j \ "remove" \ "dataChange") == JBool(false)), v3)
    // a DATA commit keeps dataChange = true
    t.append(Seq((9L, "z")).toDF("k", "v").repartition(1))      // v4
    DeltaExport.mirrorDelta(spark, t)
    val v4 = java.nio.file.Files.readString(new File(dir,
      f"_delta_log/${4L}%020d.json").toPath)
    assert(v4.contains("\"dataChange\":true"), v4)
  }

  test("convertFromDelta folds a 100k-file foreign checkpoint as a " +
    "SPARK JOB: the driver never holds the add set (by-reference " +
    "commit), and the converted table prunes from commit one") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a")).toDF("k", "v").repartition(1))      // v0
    t.registerFiles((0 until 100000).map { i =>
      graft.sources.AddFile(f"data/fake-$i%06d.parquet",
        rows = 10L, bytes = 512L,
        stats = Map("k" -> graft.sources.ColStats(
          Some(i * 10L), Some(i * 10L + 9L), 0L)))
    })                                                          // v1 ckpt
    DeltaExport.exportDeltaLog(spark, new LogTable(dir))
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log")) // a PURE Delta table remains
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(!conv.addsMaterializedAt(),
      "the convert materialized the foreign add set on the driver")
    assert(conv.commitOp(1L) == "convert")
    val fresh = new LogTable(dir)
    val (surv, total) = fresh.prunedAddsFor(spark, col("k") === 54321L)
    assert(fresh.lastPruneMode == "distributed")
    assert(total == 100001L)
    assert(surv.map(_.path) == Seq("data/fake-005432.parquet"))
    assert(!fresh.addsMaterializedAt())
  }

  test("hidden partitioning exports as Delta GENERATED partition " +
    "columns (minWriterVersion 4), and convert rebuilds the hidden " +
    "layout — bucket included (Delta generation runs Spark's own " +
    "hash)") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ts TIMESTAMP, name STRING"),
      partitionBy = Seq("days(ts)", "bucket(4, k)"))
    t.append(Seq(
      (1L, "2021-03-15 10:22:33", "alpha"),
      (2L, "2021-03-15 18:00:00", "alpine"),
      (3L, "2023-07-04 01:02:03", "beta"))
      .toDF("k", "s", "name")
      .select(col("k"), org.apache.spark.sql.functions
        .to_timestamp(col("s")).as("ts"), col("name")))
    DeltaExport.exportDeltaLog(spark, t)
    val cv = t.currentVersion.get
    val c0 = java.nio.file.Files.readString(new File(dir,
      f"_delta_log/$cv%020d.json").toPath)
    assert(c0.contains("delta.generationExpression"), c0.take(500))
    assert(c0.contains("\"minWriterVersion\":4"), c0.take(200))
    // the Delta view serves the hidden columns as REAL generated
    // partition columns (values from the log's partitionValues)
    val dl = DeltaExport.loadDelta(spark, dir)
    assert(dl.columns.toSet ==
      Set("k", "ts", "name", "ts_day", "k_bucket_4"))
    assert(dl.count() == 3L)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.partitionTransforms == Map(
      "ts_day" -> "days(ts)", "k_bucket_4" -> "bucket(4,k)"),
      conv.partitionTransforms)
    // hidden columns leave the USER schema again
    assert(conv.load(spark).columns.toSeq == Seq("k", "ts", "name"))
    val (surv, total) = conv.prunedAddsFor(spark,
      col("ts") === org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2023-07-04 01:02:03")))
    assert(surv.size < total,
      s"source-column pruning lost: ${surv.size} of $total")
    // the converted table keeps writing the SAME layout
    conv.append(Seq((9L, "2024-01-01 00:00:00", "gamma"))
      .toDF("k", "s", "name")
      .select(col("k"), org.apache.spark.sql.functions
        .to_timestamp(col("s")).as("ts"), col("name")))
    assert(conv.load(spark).count() == 4L)
  }

  test("every transform kind's generation expression parses back on " +
    "convert: years/months/hours/truncate-int round-trip the Delta " +
    "boundary with the hidden layout rebuilt") {
    def roundTrip(spec: String, hidden: String): Unit = {
      val dir = s"${tmp()}/t"
      val t = new LogTable(dir)
      t.create(org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, ts TIMESTAMP"), partitionBy = Seq(spec))
      t.append(Seq((1L, "1969-05-15 10:22:33"),
        (2L, "2021-03-15 18:45:00"))
        .toDF("k", "s")
        .select(col("k"), org.apache.spark.sql.functions
          .to_timestamp(col("s")).as("ts")))
      DeltaExport.exportDeltaLog(spark, t)
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new File(dir, "_log"))
      val conv = DeltaExport.convertFromDelta(spark, dir)
      assert(conv.partitionTransforms == Map(hidden -> spec),
        s"$spec: ${conv.partitionTransforms}")
      assert(conv.load(spark).select("k").as[Long].collect().toSet ==
        Set(1L, 2L), s"$spec lost rows")
      conv.append(Seq((3L, "2024-01-01 08:09:10")).toDF("k", "s")
        .select(col("k"), org.apache.spark.sql.functions
          .to_timestamp(col("s")).as("ts")))
      assert(conv.load(spark).count() == 3L)
    }
    roundTrip("years(ts)", "ts_year")
    roundTrip("months(ts)", "ts_month")
    roundTrip("hours(ts)", "ts_hour")

    // integral truncate: `k - pmod(k, 100L)` parses back too
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING"), partitionBy = Seq("truncate(100, k)"))
    t.append(Seq((101L, "a"), (250L, "b")).toDF("k", "v"))
    DeltaExport.exportDeltaLog(spark, t)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.partitionTransforms ==
      Map("k_trunc_100" -> "truncate(100,k)"),
      conv.partitionTransforms)
    assert(conv.load(spark).select("k").as[Long].collect().toSet ==
      Set(101L, 250L))
  }

  test("exportTail mirrors a BY-REFERENCE (convert-scale) commit " +
    "with executor-rendered adds — the driver never materializes " +
    "the 100k-file set") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 100)
    t.append(Seq((1L, "a")).toDF("k", "v").repartition(1))      // v0
    DeltaExport.exportDeltaLog(spark, t)                        // mirror v0
    val refDs = spark.range(100000L).map { i =>
      graft.sources.CkptAdd(i, f"data/fake-$i%06d.parquet", 10L, 512L,
        s"""{"k":{"min":${i * 10},"max":${i * 10 + 9},"nulls":0}}""",
        Map.empty[String, String], None, None, None)
    }
    val v = t.registerFilesFrom(spark, refDs)                   // v1
    DeltaExport.exportTail(spark, t, v, v)
    assert(!t.addsMaterializedAt(Some(v)),
      "the tail mirror materialized the by-reference set")
    // the mirrored commit carries one Delta add line per file
    val src = scala.io.Source.fromFile(
      new File(dir, f"_delta_log/$v%020d.json"), "UTF-8")
    val nAdds = try src.getLines().count(_.contains("\"add\""))
      finally src.close()
    assert(nAdds == 100000, s"expected 100000 mirrored adds: $nAdds")
    // and the import reader replays the mirrored state
    val (_, _, files) = DeltaExport.readDeltaSnapshot(spark, dir)
    assert(files.size == 100001)
  }

  test("mirrorDelta follows the table one call at a time, and " +
    "exportCheckpoint (multi-part form included) keeps a CLEANED " +
    "log replayable after old commits are deleted") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v").repartition(1))      // v0
    assert(DeltaExport.mirrorDelta(spark, t) == Seq(0L))
    assert(DeltaExport.mirrorDelta(spark, t).isEmpty) // already current
    t.append(Seq((2L, "b")).toDF("k", "v").repartition(1))      // v1
    t.delete(spark, col("k") === 1L)                            // v2
    assert(DeltaExport.mirrorDelta(spark, t,
      checkpointEvery = 2) == Seq(1L, 2L))
    val dlog = new File(dir, "_delta_log")
    // the sync landed a checkpoint at v2 (2 commits past the anchor)
    assert(new File(dlog, f"${2L}%020d.checkpoint.parquet").isFile,
      dlog.listFiles().map(_.getName).sorted.mkString(", "))
    t.append(Seq((3L, "c"), (4L, "d")).toDF("k", "v")
      .repartition(1))                                          // v3
    assert(DeltaExport.mirrorDelta(spark, t,
      checkpointEvery = 100) == Seq(3L))
    // force a MULTI-PART checkpoint at the head (partRows = 2 →
    // ≥2 parts for 2 header + 3 add actions)
    DeltaExport.exportCheckpoint(spark, t, partRows = 2L)
    val parts = dlog.listFiles().map(_.getName).filter(
      _.matches(f"${3L}%020d\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
    assert(parts.length >= 2, dlog.listFiles().map(_.getName).sorted
      .mkString(", "))
    val last = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dlog, "_last_checkpoint").toPath))
    assert((last \ "version") == JInt(3))
    assert((last \ "parts") == JInt(BigInt(parts.length)), last)
    // LOG CLEANUP: drop every commit and checkpoint below the head —
    // a strict reader must still replay from _last_checkpoint alone
    (0L to 2L).foreach { v =>
      new File(dlog, f"$v%020d.json").delete()
      new File(dlog, f"$v%020d.checkpoint.parquet").delete()
    }
    val (_, _, files) = DeltaExport.readDeltaSnapshot(spark, dir)
    assert(files.map(_._1).toSet == t.liveAdds().map(_.path).toSet)
    assert(DeltaExport.loadDelta(spark, dir)
      .select("k").as[Long].collect().toSet == Set(2L, 3L, 4L))
    // the mirror CONTINUES after cleanup — the checkpoint is the
    // head, not a fresh root (a full re-export would resurrect
    // removed files)
    t.append(Seq((5L, "e")).toDF("k", "v"))                     // v4
    assert(DeltaExport.mirrorDelta(spark, t,
      checkpointEvery = 100) == Seq(4L))
    assert(DeltaExport.loadDelta(spark, dir)
      .select("k").as[Long].collect().toSet == Set(2L, 3L, 4L, 5L))
    // metaData.id is STABLE across the whole mirrored log — a
    // changed id reads as "table was replaced" to followers
    val ids = dlog.listFiles().filter(_.getName.endsWith(".json"))
      .flatMap(f => java.nio.file.Files.readString(f.toPath)
        .linesIterator.flatMap(l =>
          JsonMethods.parse(l) \ "metaData" \ "id" match {
            case JString(id) => Some(id); case _ => None
          })).toSet ++
      spark.read.parquet(dlog.listFiles()
        .filter(_.getName.contains(".checkpoint")).map(_.getPath): _*)
        .filter(col("metaData").isNotNull)
        .select("metaData.id").as[String].collect().toSet
    assert(ids.size == 1, s"table id churned: $ids")
  }

  test("path codec unit contract: spaces and colons round-trip, " +
    "fully-qualified URIs pass through verbatim") {
    import graft.sources.{DeltaExport => DE}
    for (p <- Seq("data/f x.parquet", "a:b/c.parquet",
      "data/seg=New York/f.parquet", "data/plain.parquet")) {
      val enc = DE.encodePath(p)
      assert(!enc.contains(" ") && DE.decodePath(enc) == p,
        s"$p -> $enc -> ${DE.decodePath(enc)}")
    }
    // a spec-legal absolute URI is preserved, never scheme-stripped
    val uri = "s3a://bucket/data/f%20x.parquet"
    assert(DE.decodePath(uri) == uri)
    assert(DE.hasUriScheme(uri) && !DE.hasUriScheme("data/f.parquet"))
  }

  test("paths URL-encode on export and decode on import: a " +
    "partition value with a space survives the round trip and the " +
    "log carries the spec's percent-escaped form") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg",
        org.apache.spark.sql.types.StringType))),
      partitionBy = Seq("seg"))
    t.append(Seq((1L, "New York"), (2L, "LA")).toDF("k", "seg"))
    val commit = DeltaExport.exportDeltaLog(spark, t)
    val raw = java.nio.file.Files.readString(new File(commit).toPath)
    if (t.liveAdds().exists(_.path.contains(" ")))
      assert(raw.contains("%20"),
        "a space in the on-disk path must percent-escape in the log")
    val got = DeltaExport.loadDelta(spark, dir)
      .select("k", "seg").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "New York"), (2L, "LA")))
  }

  test("convertFromDelta registers the live files BY REFERENCE with " +
    "stats parsed back type-aware: file-skipping prunes from commit " +
    "one, partition values survive, and the result takes graft DML") {
    val dir = s"${tmp()}/t"
    val src = new LogTable(dir)
    src.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("seg",
        org.apache.spark.sql.types.StringType))),
      partitionBy = Seq("seg"))
    src.append(Seq((1L, "2021-01-01", "a"), (2L, "2021-06-01", "a"),
      (30L, "2023-01-01", "b"), (40L, "2023-06-01", "b"))
      .toDF("k", "ds", "seg")
      .select(col("k"), to_date(col("ds")).as("d"), col("seg")))
    DeltaExport.exportDeltaLog(spark, src)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log")) // a PURE Delta table remains
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.load(spark).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 30L, 40L))
    // stats survived the round-trip: a selective predicate PRUNES
    // (numeric long AND the ISO-rendered date column)
    val (surv, total) = conv.prunedAddsFor(spark, col("k") === 30L)
    assert(total >= 2 && surv.size < total,
      s"no file-skipping after convert: $surv of $total")
    val (survD, totalD) = conv.prunedAddsFor(spark,
      col("d") === to_date(lit("2021-01-01")))
    assert(survD.size < totalD, "date stats lost in conversion")
    // partition values survived
    assert(conv.liveAdds().forall(_.partitionValues.contains("seg")))
    // the converted table is a LIVE graft table
    conv.delete(spark, col("k") === 2L)
    assert(conv.load(spark).count() == 3L)
    assert(conv.commitOp(1L) == "convert")
  }

  test("convertFromDelta backfills numRecords-less adds with ONE " +
    "parquet-footer job, and refuses Delta deletion vectors") {
    val dir = s"${tmp()}/t"
    val src = new LogTable(dir)
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(2))
    DeltaExport.exportDeltaLog(spark, src, withCheckpoint = false)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    // strip the stats field from every add (a stats-less writer)
    val commit = new File(dir, "_delta_log/00000000000000000000.json")
    val doctored = java.nio.file.Files.readString(commit.toPath)
      .linesIterator.filter(_.nonEmpty).map { l =>
        val j = JsonMethods.parse(l)
        if ((j \ "add") == JNothing) l
        else JsonMethods.compact(JsonMethods.render(
          j.removeField { case (n, _) => n == "stats" }))
      }.mkString("\n")
    java.nio.file.Files.writeString(commit.toPath, doctored)
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.liveAdds().map(_.rows).sum == 3L,
      "footer backfill must recover exact per-file row counts")
    assert(conv.load(spark).count() == 3L)

    // a MALFORMED DV descriptor refuses by field name, never
    // half-imports (a real one converts — see the round-trip tests)
    val dir2 = s"${tmp()}/t"
    val src2 = new LogTable(dir2)
    src2.append(Seq((1L, "a")).toDF("k", "v"))
    DeltaExport.exportDeltaLog(spark, src2, withCheckpoint = false)
    rm(new File(dir2, "_log"))
    val c2 = new File(dir2, "_delta_log/00000000000000000000.json")
    val withDv = java.nio.file.Files.readString(c2.toPath)
      .replace("\"dataChange\":true",
        "\"dataChange\":true,\"deletionVector\":{\"storageType\":\"u\"}")
    java.nio.file.Files.writeString(c2.toPath, withDv)
    val e = intercept[IllegalArgumentException](
      DeltaExport.convertFromDelta(spark, dir2))
    assert(e.getMessage.contains("deletionVector"), e.getMessage)
  }

  test("the import protocol gate: reader 3 WITHOUT a feature list " +
    "(malformed) refuses, reader 3 with an unknown feature refuses " +
    "by name, legacy reader 2 (column mapping) passes") {
    def doctored(repl: String => String): String = {
      val dir = s"${tmp()}/t"
      val t = new LogTable(dir)
      t.append(Seq((1L, "a")).toDF("k", "v"))
      DeltaExport.exportDeltaLog(spark, t, withCheckpoint = false)
      val dlog = new File(dir, "_delta_log")
      val commit = dlog.listFiles()
        .filter(_.getName.matches("\\d{20}\\.json")).head
      java.nio.file.Files.writeString(commit.toPath,
        repl(java.nio.file.Files.readString(commit.toPath)))
      dir
    }
    val d1 = doctored(
      _.replace("\"minReaderVersion\":1", "\"minReaderVersion\":3"))
    val e1 = intercept[IllegalStateException](
      DeltaExport.loadDelta(spark, d1))
    assert(e1.getMessage.contains("minReaderVersion 3"), e1.getMessage)
    val d2 = doctored(_.replace("\"minReaderVersion\":1",
      "\"minReaderVersion\":3,\"readerFeatures\":[\"v2Checkpoint\"]"))
    val e2 = intercept[IllegalStateException](
      DeltaExport.loadDelta(spark, d2))
    assert(e2.getMessage.contains("v2Checkpoint"), e2.getMessage)
    // reader 2 is the column-mapping legacy version — accepted (the
    // metadata layer gates on the MODE; name mode refuses there)
    val d3 = doctored(
      _.replace("\"minReaderVersion\":1", "\"minReaderVersion\":2"))
    assert(DeltaExport.loadDelta(spark, d3).count() == 1L)
  }

  test("deletion vectors EXPORT: a MOR delete mirrors as " +
    "add.deletionVector under a reader-3/writer-7 protocol upgrade, " +
    "the proxy reader subtracts it, and checkpoints carry it") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append((1L to 500L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2))                                          // v0
    assert(DeltaExport.mirrorDelta(spark, t) == Seq(0L))
    // base protocol is legacy (1, 2) — no DVs yet
    val c0 = java.nio.file.Files.readString(new File(dir,
      f"_delta_log/${0L}%020d.json").toPath)
    assert(c0.contains("\"minReaderVersion\":1"), c0.take(200))
    t.deleteMor(spark, col("k") <= 100L)                        // v1
    assert(DeltaExport.mirrorDelta(spark, t) == Seq(1L))
    val c1 = java.nio.file.Files.readString(new File(dir,
      f"_delta_log/${1L}%020d.json").toPath)
    // the DV-bearing commit upgrades the protocol in-line and
    // renders the spec descriptor
    assert(c1.contains("\"minReaderVersion\":3") &&
      c1.contains("\"deletionVectors\""), c1.take(400))
    assert(c1.contains("\"deletionVector\""), c1.take(800))
    val dvs = c1.linesIterator
      .filter(_.contains("\"deletionVector\""))
      .map(l => JsonMethods.parse(l) \ "add" \ "deletionVector")
      .toSeq
    assert(dvs.nonEmpty)
    dvs.foreach(dv => assert(Set("i", "u").contains(
      (dv \ "storageType").asInstanceOf[JString].s), dv))
    // the delete touched both files — cardinalities SUM to the
    // matched rows
    assert(dvs.map(dv => (dv \ "cardinality") match {
      case JInt(i) => i.toLong; case JLong(l) => l; case _ => 0L
    }).sum == 100L, dvs)
    // the proxy reader SUBTRACTS the vector
    assert(DeltaExport.loadDelta(spark, dir).count() == 400L)
    assert(DeltaExport.loadDelta(spark, dir)
      .agg(org.apache.spark.sql.functions.min(col("k")))
      .as[Long].head() == 101L)
    // checkpoint: descriptors ride the add rows; replay from the
    // checkpoint ALONE still subtracts
    DeltaExport.exportCheckpoint(spark, t)
    val ckpt = spark.read.parquet(
      s"$dir/_delta_log/00000000000000000001.checkpoint.parquet")
    assert(ckpt.filter(col("add.deletionVector").isNotNull)
      .count() >= 1L)
    (0L to 1L).foreach(v =>
      new File(dir, f"_delta_log/$v%020d.json").delete())
    assert(DeltaExport.loadDelta(spark, dir).count() == 400L)
  }

  test("deletion vectors CONVERT: export → convert round-trips " +
    "row-level deletes with NO purge on either side — counts exact, " +
    "vectors serve as graft DVs, further MOR DML works, and the " +
    "converted table's by-reference commit re-exports its vectors") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append((1L to 500L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2))                                          // v0
    t.deleteMor(spark, col("k") <= 100L)                        // v1
    t.deleteMor(spark, col("k") > 490L)                         // v2
    assert(t.load(spark).count() == 390L)
    DeltaExport.mirrorDelta(spark, t)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    // a PURE Delta table remains: data + _delta_log + DV blobs;
    // graft's own log and pair dirs go away
    rm(new File(dir, "_log"))
    rm(new File(dir, "_dv"))
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.load(spark).count() == 390L)
    assert(conv.load(spark).agg(
      org.apache.spark.sql.functions.min(col("k")),
      org.apache.spark.sql.functions.max(col("k")))
      .as[(Long, Long)].head() == ((101L, 490L)))
    assert(conv.liveAdds().exists(_.dv.isDefined),
      "converted adds must carry their vectors")
    assert(conv.liveAdds().flatMap(_.dv).map(_.rows).sum == 110L)
    // further merge-on-read DML on the CONVERTED table
    conv.deleteMor(spark, col("k") === 250L)
    assert(conv.load(spark).count() == 389L)
    // and the converted table's commits — the by-reference convert
    // seed included — export BACK out with their vectors. The old
    // foreign log's numbering belongs to the foreign table, so the
    // re-mirror starts a fresh log: v0 (create) full, then the tail
    // exercises the by-reference DV render (commit 1 is the convert
    // seed) and the MOR commit (commit 2).
    rm(new File(dir, "_delta_log"))
    DeltaExport.exportDeltaLog(spark, conv, version = Some(0L))
    DeltaExport.exportTail(spark, conv, 1L, 2L)
    assert(java.nio.file.Files.readString(new File(dir,
      f"_delta_log/${1L}%020d.json").toPath)
      .contains("\"deletionVector\""))
    assert(DeltaExport.loadDelta(spark, dir).count() == 389L)
  }

  test("deletion vectors convert under PARTITIONED layouts: pair " +
    "keys match the scan's own URI rendering for hive dirs with " +
    "encoded characters") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, seg STRING"), partitionBy = Seq("seg"))
    t.append((1L to 200L).map(i =>
      (i, if (i % 2 == 0) "a b" else "c:d")).toDF("k", "seg"))
    t.deleteMor(spark, col("k") <= 50L)                         // DV
    assert(t.load(spark).count() == 150L)
    DeltaExport.mirrorDelta(spark, t)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    rm(new File(dir, "_dv"))
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.load(spark).count() == 150L)
    assert(conv.load(spark).agg(
      org.apache.spark.sql.functions.min(col("k")))
      .as[Long].head() == 51L)
    conv.deleteMor(spark, col("seg") === "a b" && col("k") <= 60L)
    assert(conv.load(spark).count() == 145L)
  }

  test("column mapping exports in ID MODE: a renamed mapped table " +
    "mirrors with delta.columnMapping metadata under a reader-2 " +
    "protocol, the proxy reader resolves renames by field id, and " +
    "convert rebuilds a COLUMN-MAPPED graft table") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING"), columnMapping = true)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1))
    t.renameColumn(spark, "v", "label")   // pure metadata — old
    t.append(Seq((3L, "c")).toDF("k", "label").repartition(1))
    DeltaExport.mirrorDelta(spark, t)
    val cv = t.currentVersion.get
    val c0 = java.nio.file.Files.readString(new File(dir,
      f"_delta_log/$cv%020d.json").toPath)
    assert(c0.contains("\"minReaderVersion\":2") &&
      c0.contains("\"minWriterVersion\":5"), c0.take(200))
    assert(c0.contains("\"delta.columnMapping.mode\":\"id\""),
      c0.take(600))
    assert(c0.contains("delta.columnMapping.maxColumnId"), c0.take(600))
    assert(c0.contains("delta.columnMapping.id") &&
      c0.contains("delta.columnMapping.physicalName"), c0.take(1200))
    // the proxy reader serves the RENAMED column from pre-rename
    // files (id resolution — the files store the old name)
    val dl = DeltaExport.loadDelta(spark, dir)
    assert(dl.columns.toSeq == Seq("k", "label"))
    assert(dl.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.load(spark).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the converted table is itself column-mapped: renames keep
    // working and the id high-water carried over
    conv.renameColumn(spark, "label", "tag")
    assert(conv.load(spark).columns.toSeq == Seq("k", "tag"))
    assert(conv.load(spark).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // NAME mode refuses by name on import
    val dir2 = s"${tmp()}/t"
    val t2 = new LogTable(dir2)
    t2.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING"), columnMapping = true)
    t2.append(Seq((1L, "a")).toDF("k", "v"))
    val v2 = t2.currentVersion.get
    DeltaExport.exportDeltaLog(spark, t2)
    rm(new File(dir2, "_log"))
    // force JSON replay so the doctored commit is what the import
    // reads
    val dlog2 = new File(dir2, "_delta_log")
    new File(dlog2, "_last_checkpoint").delete()
    dlog2.listFiles().filter(_.getName.contains(".checkpoint."))
      .foreach(_.delete())
    val c2 = new File(dir2, f"_delta_log/$v2%020d.json")
    java.nio.file.Files.writeString(c2.toPath,
      java.nio.file.Files.readString(c2.toPath).replace(
        "\"delta.columnMapping.mode\":\"id\"",
        "\"delta.columnMapping.mode\":\"name\""))
    val e = intercept[IllegalStateException](
      DeltaExport.convertFromDelta(spark, dir2))
    assert(e.getMessage.contains("'name'") &&
      e.getMessage.contains("id mode only"), e.getMessage)
  }

  test("column mapping COMBINES with deletion vectors: a mapped " +
    "table with MOR deletes exports under reader 3 with BOTH " +
    "features and round-trips through convert") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING"), columnMapping = true)
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1))
    t.renameColumn(spark, "v", "label")
    t.deleteMor(spark, col("k") <= 20L)
    DeltaExport.mirrorDelta(spark, t)
    val cv = t.currentVersion.get
    val c0 = java.nio.file.Files.readString(new File(dir,
      f"_delta_log/$cv%020d.json").toPath)
    assert(c0.contains("\"minReaderVersion\":3"), c0.take(300))
    assert(c0.contains("\"columnMapping\"") &&
      c0.contains("\"deletionVectors\""), c0.take(400))
    assert(DeltaExport.loadDelta(spark, dir).count() == 80L)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    rm(new File(dir, "_dv"))
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.load(spark).count() == 80L)
    assert(conv.load(spark).columns.toSeq == Seq("k", "label"))
    conv.deleteMor(spark, col("k") === 99L)
    assert(conv.load(spark).count() == 79L)
  }

  test("CHECK constraints cross the boundary both ways: the export " +
    "stamps delta.constraints.* under a writer-3 floor, and the " +
    "converted table keeps refusing what the Delta writers refused") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING"),
      checkConstraints = Map("k_pos" -> "k > 0"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    DeltaExport.mirrorDelta(spark, t) // full export at the head
    import scala.jdk.CollectionConverters._
    def jsons() = new File(dir, "_delta_log").listFiles()
      .filter(_.getName.matches("\\d{20}\\.json")).sortBy(_.getName)
    def lineIn(f: File, key: String): JValue =
      java.nio.file.Files.readAllLines(f.toPath).asScala
        .find(_.contains(s""""$key"""")).map(JsonMethods.parse(_))
        .get \ key
    // the create-time constraint stamps the config under writer 3
    val proto = lineIn(jsons().head, "protocol")
    assert((proto \ "minWriterVersion") == JInt(3),
      JsonMethods.pretty(JsonMethods.render(proto)))
    assert((proto \ "minReaderVersion") == JInt(1))
    assert((lineIn(jsons().head, "metaData") \ "configuration" \
      "delta.constraints.k_pos") == JString("k > 0"))
    // a constraint ADD between mirrors re-emits metaData AND the
    // protocol in ITS commit (the tail export path)
    t.addCheckConstraint(spark, "v_nonempty", "length(v) > 0")
    DeltaExport.mirrorDelta(spark, t)
    val tailJson = jsons().last
    assert(tailJson != jsons().head)
    val conf1 = lineIn(tailJson, "metaData") \ "configuration"
    assert((conf1 \ "delta.constraints.k_pos") == JString("k > 0"))
    assert((conf1 \ "delta.constraints.v_nonempty") ==
      JString("length(v) > 0"))
    assert((lineIn(tailJson, "protocol") \ "minWriterVersion") ==
      JInt(3))
    // strip graft, convert: both constraints survive and ENFORCE
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    val conv = DeltaExport.convertFromDelta(spark, dir)
    assert(conv.checkConstraints == Map("k_pos" -> "k > 0",
      "v_nonempty" -> "length(v) > 0"), conv.checkConstraints)
    val err = intercept[Exception](
      conv.append(Seq((-1L, "x")).toDF("k", "v")))
    assert(err.getMessage.contains("k_pos"), err.getMessage)
    conv.append(Seq((3L, "c")).toDF("k", "v"))
    assert(conv.load(spark).count() == 3L)
  }
}
