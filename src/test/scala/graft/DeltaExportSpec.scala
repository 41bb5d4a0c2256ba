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

  test("exports refuse state Delta readers would misread, naming " +
    "the blocker; the import reader gates on minReaderVersion") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    t.deleteMor(spark, col("k") === 1L) // DV
    val e = intercept[IllegalArgumentException](
      DeltaExport.exportDeltaLog(spark, t))
    assert(e.getMessage.contains("deletion vectors") &&
      e.getMessage.contains("purgeDeletes"), e.getMessage)
    t.purgeDeletes(spark)
    DeltaExport.exportDeltaLog(spark, t) // now exportable
    assert(DeltaExport.loadDelta(spark, dir).count() == 1L)

    // a future-protocol Delta log refuses on import, never half-read
    val dlog = new File(dir, "_delta_log")
    val commit = dlog.listFiles()
      .filter(_.getName.matches("\\d{20}\\.json")).head
    val doctored = java.nio.file.Files.readString(commit.toPath)
      .replace("\"minReaderVersion\":1", "\"minReaderVersion\":3")
    java.nio.file.Files.writeString(commit.toPath, doctored)
    new File(dlog, "_last_checkpoint").delete() // force JSON replay
    val e2 = intercept[IllegalStateException](
      DeltaExport.loadDelta(spark, dir))
    assert(e2.getMessage.contains("minReaderVersion 3"), e2.getMessage)
  }
}
