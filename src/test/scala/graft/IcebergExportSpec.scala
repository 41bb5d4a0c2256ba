package graft

import java.io.File

import graft.sources.{IcebergExport, LogTable}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg metadata EXPORT (round-13): a LogTable snapshot emitted
  * as Apache Iceberg format-version-2 table metadata — the spec's
  * `vN.metadata.json`, manifest-list + manifest Avro files with
  * field-id-annotated record schemas, `version-hint.text` — written
  * with the raw avro-1.12 API on Spark's own classpath. No Iceberg
  * runtime exists in this offline environment, so conformance is
  * STRUCTURAL (spec-required fields, Avro field ids, snapshot log)
  * plus a round-trip through this library's own reader as a proxy —
  * the same documented-weaker bar as DeltaExportSpec. */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_iexp").toString

  test("export emits the spec's metadata shape: format-version 2, " +
    "schemas with field ids, partition specs, sort orders, " +
    "snapshots with manifest-list, version-hint") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    val metaPath = IcebergExport.exportIcebergMetadata(spark, t)
    assert(new File(metaPath).getName == "v1.metadata.json")
    val meta = JsonMethods.parse(
      java.nio.file.Files.readString(new File(metaPath).toPath))
    assert((meta \ "format-version") == JInt(2))
    assert((meta \ "table-uuid").isInstanceOf[JString])
    assert((meta \ "location").isInstanceOf[JString])
    // schema: field ids assigned 1..n, spec type names
    val fields = (meta \ "schemas")(0) \ "fields"
    assert(fields == JArray(List(
      JObject(List("id" -> JInt(1), "name" -> JString("k"),
        "required" -> JBool(false), "type" -> JString("long"))),
      JObject(List("id" -> JInt(2), "name" -> JString("v"),
        "required" -> JBool(false), "type" -> JString("string"))))),
      JsonMethods.pretty(JsonMethods.render(fields)))
    assert((meta \ "default-spec-id") == JInt(0))
    assert(((meta \ "partition-specs")(0) \ "spec-id") == JInt(0))
    assert((meta \ "sort-orders") != JNothing)
    assert((meta \ "last-column-id") == JInt(2))
    // name mapping for graft's field-id-less parquet
    val nm = (meta \ "properties" \ "schema.name-mapping.default")
      .asInstanceOf[JString].s
    assert(JsonMethods.parse(nm).isInstanceOf[JArray], nm)
    // one snapshot, listed in snapshot-log, hinted
    val snaps = (meta \ "snapshots").asInstanceOf[JArray].arr
    assert(snaps.size == 1)
    assert((meta \ "current-snapshot-id") ==
      (snaps.head \ "snapshot-id"))
    assert((snaps.head \ "manifest-list").isInstanceOf[JString])
    assert((meta \ "snapshot-log").asInstanceOf[JArray].arr.size == 1)
    assert(java.nio.file.Files.readString(
      new File(dir, "metadata/version-hint.text").toPath).trim == "1")
  }

  test("manifest-list and manifest Avro files carry the spec's " +
    "field-id-annotated records, and the round-trip serves the " +
    "snapshot's rows") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1))                    // file A
    t.append(Seq((3L, "c")).toDF("k", "v").repartition(1)) // file B
    t.delete(spark, col("k") === 2L) // CoW — A rewritten, 2 files live
    IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    val listPath = ((meta \ "snapshots")(0) \ "manifest-list")
      .asInstanceOf[JString].s
    // manifest-list: spec field ids on the avro schema
    val lr = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](new File(listPath),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val listSchema = lr.getSchema
    def fid(s: org.apache.avro.Schema, f: String): Int =
      s.getField(f).getObjectProp("field-id")
        .asInstanceOf[Number].intValue()
    assert(fid(listSchema, "manifest_path") == 500)
    assert(fid(listSchema, "sequence_number") == 515)
    assert(fid(listSchema, "added_files_count") == 504)
    val mf = lr.next()
    lr.close()
    assert(mf.get("content").asInstanceOf[Integer] == 0)
    assert(mf.get("added_files_count").asInstanceOf[Integer] == 2)
    // manifest: entry schema ids + key-value metadata
    val mr = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](
      new File(mf.get("manifest_path").toString),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val es = mr.getSchema
    assert(fid(es, "status") == 0)
    assert(fid(es, "data_file") == 2)
    val dfSchema = es.getField("data_file").schema()
    assert(fid(dfSchema, "file_path") == 100)
    assert(fid(dfSchema, "record_count") == 103)
    assert(mr.getMetaString("format-version") == "2")
    assert(mr.getMetaString("content") == "data")
    assert(JsonMethods.parse(mr.getMetaString("schema")) \
      "type" == JString("struct"))
    var n = 0
    while (mr.hasNext) {
      val e = mr.next()
      assert(e.get("status").asInstanceOf[Integer] == 1)
      val df = e.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(df.get("file_format").toString == "PARQUET")
      assert(new File(df.get("file_path").toString).isFile,
        s"manifest references a missing data file: ${df.get("file_path")}")
      n += 1
    }
    mr.close()
    assert(n == 2)
    // round-trip: the reader serves exactly the live rows
    val got = IcebergExport.loadIceberg(spark, dir)
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "c")))
  }

  test("a hive-partitioned snapshot exports an identity partition " +
    "spec with TYPED partition values, and round-trips") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg",
        org.apache.spark.sql.types.StringType))),
      partitionBy = Seq("seg"))
    t.append(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "seg"))
    IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    val specField = ((meta \ "partition-specs")(0) \ "fields")(0)
    assert((specField \ "name") == JString("seg"))
    assert((specField \ "transform") == JString("identity"))
    assert((specField \ "field-id") == JInt(1000))
    val got = IcebergExport.loadIceberg(spark, dir)
      .select("k", "seg").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "a"), (3L, "b")))
  }

  test("sequential exports MIRROR the table: v2 metadata carries v1's " +
    "snapshot forward, snapshot-log grows, version-hint advances, " +
    "and the reader serves the newest state") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1))
    IcebergExport.exportIcebergMetadata(spark, t)
    t.append(Seq((3L, "c")).toDF("k", "v"))
    t.delete(spark, col("k") === 1L)
    val p2 = IcebergExport.exportIcebergMetadata(spark, t)
    assert(new File(p2).getName == "v2.metadata.json")
    val meta = JsonMethods.parse(
      java.nio.file.Files.readString(new File(p2).toPath))
    val snaps = (meta \ "snapshots").asInstanceOf[JArray].arr
    assert(snaps.size == 2, JsonMethods.pretty(JsonMethods.render(meta)))
    assert((meta \ "snapshot-log").asInstanceOf[JArray].arr.size == 2)
    assert((meta \ "last-sequence-number") == JInt(2))
    assert(java.nio.file.Files.readString(
      new File(dir, "metadata/version-hint.text").toPath).trim == "2")
    val got = IcebergExport.loadIceberg(spark, dir)
      .select("k").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
    // table-uuid is stable across metadata versions (the spec's
    // identity check a refreshing reader enforces), and the delete
    // snapshot reports an honest non-append operation
    val v1m = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    assert((meta \ "table-uuid") == (v1m \ "table-uuid"),
      "table-uuid churned across sequential exports")
    val op2 = (meta \ "snapshots")(1) \ "summary" \ "operation"
    assert(op2 == JString("overwrite"),
      s"a CoW-delete snapshot must not claim append: $op2")
  }

  test("schema evolution across sequential exports: prior schemas " +
    "carry forward with their ids, snapshots are stamped with THEIR " +
    "schema-id, and re-exporting the same snapshot is a no-op") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v").repartition(1))      // v0
    val p1 = IcebergExport.exportIcebergMetadata(spark, t)
    // duplicate export of the SAME snapshot: no new metadata, no
    // duplicate snapshot-id
    assert(IcebergExport.exportIcebergMetadata(spark, t) == p1)
    assert(java.nio.file.Files.readString(
      new File(dir, "metadata/version-hint.text").toPath).trim == "1")
    // evolve the schema, export again
    t.append(Seq((2L, "b", 7L)).toDF("k", "v", "extra"),
      mergeSchema = true)                                       // v1
    val p2 = IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(
      java.nio.file.Files.readString(new File(p2).toPath))
    val schemas = (meta \ "schemas").asInstanceOf[JArray].arr
    assert(schemas.size == 2, JsonMethods.pretty(JsonMethods.render(meta)))
    assert(schemas.map(s => s \ "schema-id").toSet ==
      Set(JInt(0), JInt(1)))
    assert((meta \ "current-schema-id") == JInt(1))
    val snaps = (meta \ "snapshots").asInstanceOf[JArray].arr
    assert((snaps.head \ "schema-id") == JInt(0),
      "the historical snapshot must keep ITS schema-id")
    assert((snaps.last \ "schema-id") == JInt(1))
    // an unchanged follow-up export reuses schema-id 1
    t.append(Seq((3L, "c", 8L)).toDF("k", "v", "extra"))        // v2
    val p3 = IcebergExport.exportIcebergMetadata(spark, t)
    val meta3 = JsonMethods.parse(
      java.nio.file.Files.readString(new File(p3).toPath))
    assert((meta3 \ "schemas").asInstanceOf[JArray].arr.size == 2)
    assert((meta3 \ "current-schema-id") == JInt(1))
    assert(IcebergExport.loadIceberg(spark, dir).count() == 3L)
  }

  test("a DELETE manifest in the manifest list refuses by name — " +
    "never a half-read that resurrects deleted rows") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    val listPath = ((meta \ "snapshots")(0) \ "manifest-list")
      .asInstanceOf[JString].s
    // doctor the manifest list: rewrite its single entry with
    // content = 1 (a delete manifest, as a real v2 writer with
    // row-level deletes would emit)
    val lr = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](new File(listPath),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val schema = lr.getSchema
    val rec = lr.next(); lr.close()
    rec.put("content", Integer.valueOf(1))
    val doctored = new File(dir, "metadata/doctored-list.avro")
    val w = new org.apache.avro.file.DataFileWriter[
      org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.setMeta("format-version", "2")
    w.create(schema, doctored)
    w.append(rec); w.close()
    java.nio.file.Files.writeString(
      new File(dir, "metadata/v1.metadata.json").toPath,
      java.nio.file.Files.readString(
        new File(dir, "metadata/v1.metadata.json").toPath)
        .replace(listPath, doctored.getAbsolutePath))
    val e = intercept[IllegalStateException](
      IcebergExport.loadIceberg(spark, dir))
    assert(e.getMessage.contains("DELETE manifests"), e.getMessage)
  }

  test("a COLUMN-MAPPED table reuses its existing parquet field ids " +
    "as the Iceberg ids (the data files resolve by id, so the " +
    "metadata must match them)") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))),
      columnMapping = true)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val schema = t.schema
    val expIds = schema.fields.map(f =>
      f.metadata.getLong(graft.sources.LogTable.FieldIdKey)).toSeq
    IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    val gotIds = ((meta \ "schemas")(0) \ "fields")
      .asInstanceOf[JArray].arr.map(f => (f \ "id") match {
        case JInt(i) => i.toLong; case JLong(l) => l; case _ => -1L
      })
    assert(gotIds == expIds, s"$gotIds vs $expIds")
  }

  test("convertFromIceberg registers the live files by reference " +
    "(record counts from the manifests, hive partition values from " +
    "paths) and the result takes graft DML") {
    val dir = s"${tmp()}/t"
    val src = new LogTable(dir)
    src.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg",
        org.apache.spark.sql.types.StringType))),
      partitionBy = Seq("seg"))
    src.append(Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("k", "seg"))
    IcebergExport.exportIcebergMetadata(spark, src)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log")) // pure Iceberg metadata remains
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(conv.load(spark).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    assert(conv.liveAdds().map(_.rows).sum == 4L,
      "record counts must carry from the manifests")
    assert(conv.liveAdds().forall(a =>
      a.partitionValues.get("seg").exists(Set("a", "b"))))
    conv.delete(spark, col("seg") === "a")
    assert(conv.load(spark).select("k").as[Long].collect().toSet ==
      Set(3L, 4L))
    assert(conv.commitOp(1L) == "convert")
  }

  test("convertFromIceberg folds a 100k-file foreign manifest as a " +
    "SPARK JOB: sizes come from file_size_in_bytes (no per-file " +
    "filesystem calls), the driver never holds the add set, and the " +
    "converted table prunes from commit one") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir, checkpointInterval = 1)
    t.append(Seq((1L, "a")).toDF("k", "v").repartition(1))      // v0
    t.registerFiles((0 until 100000).map { i =>
      graft.sources.AddFile(f"data/fake-$i%06d.parquet",
        rows = 10L, bytes = 512L,
        stats = Map("k" -> graft.sources.ColStats(
          Some(i * 10L), Some(i * 10L + 9L), 0L)))
    })                                                          // v1 ckpt
    IcebergExport.exportIcebergMetadata(spark, new LogTable(dir))
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log")) // pure Iceberg metadata remains
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(!conv.addsMaterializedAt(),
      "the convert materialized the foreign add set on the driver")
    assert(conv.commitOp(1L) == "convert")
    val fresh = new LogTable(dir)
    val (surv, total) = fresh.prunedAddsFor(spark, col("k") === 54321L)
    assert(fresh.lastPruneMode == "distributed")
    assert(total == 100001L)
    assert(surv.map(_.path) == Seq("data/fake-005432.parquet"))
    // the fake files do not exist on disk — a File.length() pass
    // would have registered bytes = 0; the manifest's spec-required
    // file_size_in_bytes must carry instead
    assert(surv.head.bytes == 512L,
      "file size must come from the manifest, not a filesystem stat")
    assert(!fresh.addsMaterializedAt())
  }

  test("column bounds round-trip: the exporter emits single-value-" +
    "serialized lower/upper bounds + null counts, and a converted " +
    "table file-skips from commit one (long AND date columns)") {
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
      .select(col("k"), org.apache.spark.sql.functions
        .to_date(col("ds")).as("d"), col("seg")))
    IcebergExport.exportIcebergMetadata(spark, src)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(conv.load(spark).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 30L, 40L))
    val (surv, total) = conv.prunedAddsFor(spark, col("k") === 30L)
    assert(total >= 2 && surv.size < total,
      s"no file-skipping after convert: ${surv.size} of $total")
    val (survD, totalD) = conv.prunedAddsFor(spark,
      col("d") === org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.lit("2021-01-01")))
    assert(survD.size < totalD, "date bounds lost in conversion")
    // the converted table is live: DML works on top
    conv.delete(spark, col("k") === 2L)
    assert(conv.load(spark).count() == 3L)
  }

  test("nested columns (struct + array + map) export per the spec's " +
    "nested type JSON with unique field ids and a nested name " +
    "mapping, and round-trip through loadIceberg AND " +
    "convertFromIceberg") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        col("tag").as("name"), (col("k") * 10).as("score")))
      .withColumn("tags", org.apache.spark.sql.functions.array(
        col("tag"), org.apache.spark.sql.functions.lit("x")))
      .withColumn("props", org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("source"), col("tag")))
      .drop("tag")
    t.append(df.repartition(1))
    IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    // every assigned id (top-level + element/key/value/nested
    // struct) is unique, and last-column-id covers them all
    def idsIn(v: JValue): Seq[BigInt] = v match {
      case JObject(fs) => fs.flatMap {
        case (k, JInt(i)) if Set("id", "element-id", "key-id",
          "value-id")(k) => Seq(i)
        case (_, sub) => idsIn(sub)
      }
      case JArray(a) => a.flatMap(idsIn)
      case _         => Seq.empty
    }
    val schema0 = (meta \ "schemas").asInstanceOf[JArray].arr.head
    val allIds = idsIn(schema0 \ "fields")
    assert(allIds.distinct.size == allIds.size,
      s"duplicate field ids in nested schema: $allIds")
    assert((meta \ "last-column-id") == JInt(allIds.max))
    // nested name mapping rides the same ids
    val nm = (meta \ "properties" \ "schema.name-mapping.default")
      .asInstanceOf[JString].s
    assert(nm.contains("\"element\"") && nm.contains("\"key\""),
      nm)
    // readback serves the nested data
    val got = IcebergExport.loadIceberg(spark, dir)
    assert(got.select(col("meta.score")).as[Long].collect().toSet ==
      Set(10L, 20L))
    // and a CONVERT round-trips into a live graft table
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(conv.load(spark).select(col("meta.score")).as[Long]
      .collect().toSet == Set(10L, 20L))
    assert(conv.load(spark)
      .select(org.apache.spark.sql.functions.element_at(
        col("props"), "source")).as[String].collect().toSet ==
      Set("a", "b"))
  }

  test("hidden partitioning exports as Iceberg TRANSFORMS (day, " +
    "month, truncate) with converted partition values, and the " +
    "convert round-trip rebuilds the same hidden layout — pruning " +
    "on the SOURCE column works on both sides") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ts TIMESTAMP, name STRING"),
      partitionBy = Seq("days(ts)", "truncate(3, name)"))
    t.append(Seq(
      (1L, "2021-03-15 10:22:33", "alpha"),
      (2L, "2021-03-15 18:00:00", "alpine"),
      (3L, "2023-07-04 01:02:03", "beta"))
      .toDF("k", "s", "name")
      .select(col("k"), org.apache.spark.sql.functions
        .to_timestamp(col("s")).as("ts"), col("name")))
    IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    // spec fields carry the Iceberg transform names; the schema is
    // the USER schema (no hidden ts_day / name_trunc_3 columns)
    val spec = ((meta \ "partition-specs")(0) \ "fields")
      .asInstanceOf[JArray].arr
    assert(spec.map(f => (f \ "transform")) ==
      List(JString("day"), JString("truncate[3]")), spec)
    val schemaCols = ((meta \ "schemas")(0) \ "fields")
      .asInstanceOf[JArray].arr
      .map(f => (f \ "name").asInstanceOf[JString].s)
    assert(schemaCols == List("k", "ts", "name"), schemaCols)
    // the proxy reader serves the data (all columns live in-file)
    val got = IcebergExport.loadIceberg(spark, dir)
      .select("k").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
    // convert rebuilds the SAME hidden layout and prunes on the
    // source column from commit one
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(conv.partitionTransforms == Map(
      "ts_day" -> "days(ts)", "name_trunc_3" -> "truncate(3,name)"),
      conv.partitionTransforms)
    assert(conv.load(spark).columns.toSeq == Seq("k", "ts", "name"))
    val (surv, total) = conv.prunedAddsFor(spark,
      col("ts") === org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2023-07-04 01:02:03")))
    assert(surv.size < total,
      s"source-column pruning lost through the round trip: " +
        s"${surv.size} of $total")
    // the converted table keeps writing the SAME layout
    conv.append(Seq((4L, "2024-01-01 00:00:00", "gamma"))
      .toDF("k", "s", "name")
      .select(col("k"), org.apache.spark.sql.functions
        .to_timestamp(col("s")).as("ts"), col("name")))
    assert(conv.load(spark).count() == 4L)
    val (s2, t2) = conv.prunedAddsFor(spark,
      col("name") === "gamma")
    assert(s2.size < t2)
  }

  test("year/month/hour transform VALUES convert exactly (ordinals " +
    "since 1970 / epoch hours) through export and back through " +
    "convert — pruning on the source column survives each") {
    def roundTrip(spec: String, hidden: String): Unit = {
      val dir = s"${tmp()}/t"
      val t = new LogTable(dir)
      t.create(org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, ts TIMESTAMP"), partitionBy = Seq(spec))
      t.append(Seq((1L, "1969-05-15 10:22:33"),
        (2L, "2021-03-15 18:45:00"), (3L, "2023-07-04 01:02:03"))
        .toDF("k", "s")
        .select(col("k"), org.apache.spark.sql.functions
          .to_timestamp(col("s")).as("ts")))
      IcebergExport.exportIcebergMetadata(spark, t)
      // export side: the typed manifest partition values decode back
      // through the proxy reader's pv conversion to graft's strings
      assert(IcebergExport.loadIceberg(spark, dir)
        .select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))
      def rm(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new File(dir, "_log"))
      val conv = IcebergExport.convertFromIceberg(spark, dir)
      assert(conv.partitionTransforms == Map(hidden -> spec),
        s"$spec: ${conv.partitionTransforms}")
      assert(conv.load(spark).select("k").as[Long].collect().toSet ==
        Set(1L, 2L, 3L), s"$spec lost rows")
      // value conversion EXACTNESS: the rebuilt hidden values must
      // equal what graft itself writes — a fresh append of the same
      // rows lands in the SAME partitions (pv strings equal)
      conv.append(Seq((4L, "2021-03-15 06:06:06")).toDF("k", "s")
        .select(col("k"), org.apache.spark.sql.functions
          .to_timestamp(col("s")).as("ts")))
      val pvs = conv.liveAdds().flatMap(_.partitionValues.get(hidden))
      val from2021 = conv.liveAdds()
        .filter(_.stats.get("k").exists(_.min.exists(m =>
          m == 2L || m == 4L)))
        .flatMap(_.partitionValues.get(hidden)).distinct
      // rows 2 (converted) and 4 (freshly written) share the 2021
      // bucket for year/month; for hour they differ — just assert
      // the converted values parse as graft's own format (the fresh
      // append's values are graft-written by construction)
      assert(pvs.nonEmpty && pvs.forall(_.nonEmpty))
      if (spec.startsWith("years") || spec.startsWith("months"))
        assert(from2021.size == 1,
          s"$spec: converted and fresh 2021 values diverged: " +
            s"$from2021")
      val (surv, total) = conv.prunedAddsFor(spark,
        col("ts") === org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.lit("2023-07-04 01:02:03")))
      assert(surv.size < total, s"$spec: no pruning after convert")
    }
    roundTrip("years(ts)", "ts_year")
    roundTrip("months(ts)", "ts_month")
    roundTrip("hours(ts)", "ts_hour")
  }

  test("mirrorIceberg follows the table one call at a time, and " +
    "retention bounds the metadata dir: old vN.metadata.json drop, " +
    "snapshots cap, orphan manifest Avro sweeps") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v").repartition(1))      // v0
    assert(IcebergExport.mirrorIceberg(spark, t).isDefined)
    assert(IcebergExport.mirrorIceberg(spark, t).isEmpty,
      "a current mirror must be a no-op")
    t.append(Seq((2L, "b")).toDF("k", "v").repartition(1))      // v1
    assert(IcebergExport.mirrorIceberg(spark, t).isDefined)
    assert(IcebergExport.loadIceberg(spark, dir)
      .count() == 2L, "the follower must see each mirrored state")
    // many more commits under tight retention
    (3 to 6).foreach { i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("k", "v").repartition(1))
      IcebergExport.mirrorIceberg(spark, t,
        keepMetadata = 2, keepSnapshots = 2)
    }
    val metaDir = new File(dir, "metadata")
    val metaFiles = metaDir.listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
    assert(metaFiles.length <= 2,
      s"metadata files grew unboundedly: ${metaFiles.length}")
    val newest = JsonMethods.parse(java.nio.file.Files.readString(
      metaFiles.maxBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toInt).toPath))
    assert((newest \ "snapshots").asInstanceOf[JArray].arr.size <= 2,
      "snapshots array grew unboundedly")
    // each retained snapshot references 1 manifest-list + 1
    // manifest; everything else swept
    val avros = metaDir.listFiles().filter(_.getName.endsWith(".avro"))
    assert(avros.length <= 2 * 2 * 2,
      s"orphan manifests not swept: ${avros.length}")
    assert(IcebergExport.loadIceberg(spark, dir).count() == 6L)
  }

  test("exports refuse state an Iceberg reader would misread, " +
    "naming the blocker") {
    // hidden partitioning: transform mapping not implemented
    // bucket transforms refuse by HASH incompatibility (time
    // transforms export since round 14)
    val d2 = s"${tmp()}/t"
    val t2 = new LogTable(d2)
    t2.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType))),
      partitionBy = Seq("bucket(4, k)"))
    t2.append(Seq(Tuple1(1L), Tuple1(2L)).toDF("k"))
    val e2 = intercept[IllegalArgumentException](
      IcebergExport.exportIcebergMetadata(spark, t2))
    assert(e2.getMessage.contains("Murmur3"), e2.getMessage)

    // a type the Iceberg spec cannot express refuses by column
    // name (nested struct/list/map export since round 14)
    val d3 = s"${tmp()}/t"
    val t3 = new LogTable(d3)
    t3.append(Seq(Tuple1(1L)).toDF("k").withColumn("iv",
      org.apache.spark.sql.functions.expr(
        "make_ym_interval(1, 2)")))
    val e3 = intercept[IllegalArgumentException](
      IcebergExport.exportIcebergMetadata(spark, t3))
    assert(e3.getMessage.contains("iv"), e3.getMessage)
  }

  test("foreign file_path URI handling: file: schemes decode and " +
    "relativize, foreign schemes and out-of-root paths refuse") {
    val root = "/tables/t1"
    def rel(p: String) = IcebergExport.relativizeForeignPath(root, p)
    // the forms real writers emit: plain absolute, file:/, file:///
    assert(rel("/tables/t1/data/f.parquet") == "data/f.parquet")
    assert(rel("file:/tables/t1/data/f.parquet") == "data/f.parquet")
    assert(rel("file:///tables/t1/data/f.parquet") == "data/f.parquet")
    // percent-encoded and raw special chars both decode
    assert(rel("file:///tables/t1/data/f%20x.parquet") ==
      "data/f x.parquet")
    assert(rel("file:/tables/t1/data/f x.parquet") ==
      "data/f x.parquet")
    // already-relative passes through
    assert(rel("data/f.parquet") == "data/f.parquet")
    // a foreign scheme must refuse, never register verbatim
    val e1 = intercept[IllegalArgumentException](
      rel("s3://bucket/tables/t1/data/f.parquet"))
    assert(e1.getMessage.contains("fully-qualified URI"),
      e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      rel("hdfs://nn:8020/tables/t1/data/f.parquet"))
    assert(e2.getMessage.contains("fully-qualified URI"),
      e2.getMessage)
    // a decoded file: URI outside the root refuses like any
    // absolute out-of-root path
    val e3 = intercept[IllegalArgumentException](
      rel("file:///elsewhere/data/f.parquet"))
    assert(e3.getMessage.contains("outside the table root"),
      e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      rel("/elsewhere/data/f.parquet"))
    assert(e4.getMessage.contains("outside the table root"),
      e4.getMessage)
  }

  test("field ids CARRY FORWARD across exports: evolution keeps " +
    "unchanged columns' ids, mints new ones above last-column-id " +
    "(ids are never re-dealt), and partition-spec field-ids " +
    "continue from last-partition-id instead of restarting at 1000") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a", ("x", 1.0))).toDF("k", "v", "s")
      .repartition(1))
    IcebergExport.exportIcebergMetadata(spark, t)
    def metaN(n: Int) = JsonMethods.parse(
      java.nio.file.Files.readString(
        new File(dir, s"metadata/v$n.metadata.json").toPath))
    def fieldId(schema: JValue, name: String): Int =
      (schema \ "fields") match {
        case JArray(fs) => fs.collectFirst {
          case f if (f \ "name") == JString(name) =>
            (f \ "id") match { case JInt(i) => i.toInt; case _ => -1 }
        }.getOrElse(-1)
        case _ => -1
      }
    def currentSchema(m: JValue): JValue = {
      val cur = (m \ "current-schema-id") match {
        case JInt(i) => i.toInt; case _ => -1 }
      (m \ "schemas") match {
        case JArray(ss) => ss.find(s =>
          (s \ "schema-id") == JInt(BigInt(cur))).get
        case _ => JNothing
      }
    }
    val s1 = currentSchema(metaN(1))
    assert(fieldId(s1, "k") == 1 && fieldId(s1, "v") == 2 &&
      fieldId(s1, "s") == 3)
    assert((metaN(1) \ "last-column-id") == JInt(5)) // nested _1/_2

    // ADD a column: carried ids stay, the new column mints ABOVE
    // every id ever assigned (6, not a re-deal of positions)
    t.addColumns(Seq(org.apache.spark.sql.types.StructField("w",
      org.apache.spark.sql.types.StringType)))
    t.append(Seq((2L, "b", ("y", 2.0), "w2")).toDF("k", "v", "s", "w")
      .repartition(1))
    IcebergExport.exportIcebergMetadata(spark, t)
    val m2 = metaN(2)
    val s2 = currentSchema(m2)
    assert(fieldId(s2, "k") == 1 && fieldId(s2, "v") == 2 &&
      fieldId(s2, "s") == 3, JsonMethods.pretty(JsonMethods.render(s2)))
    assert(fieldId(s2, "w") == 6,
      JsonMethods.pretty(JsonMethods.render(s2)))
    assert((m2 \ "last-column-id") == JInt(6))
    // BOTH schemas carry in the history, the old one bit-unchanged
    assert(((m2 \ "schemas"): @unchecked) match {
      case JArray(ss) => ss.size == 2 &&
        ss.exists(s => (s \ "fields") == (s1 \ "fields"))
    })

    // a further ADD keeps minting above the high-water — w keeps 6,
    // z claims 7 (ids are immutable per column, never re-dealt)
    t.addColumns(Seq(org.apache.spark.sql.types.StructField("z",
      org.apache.spark.sql.types.LongType)))
    t.append(Seq((3L, "c", ("z", 3.0), "w3", 9L))
      .toDF("k", "v", "s", "w", "z").repartition(1))
    IcebergExport.exportIcebergMetadata(spark, t)
    val s3 = currentSchema(metaN(3))
    assert(fieldId(s3, "z") == 7,
      JsonMethods.pretty(JsonMethods.render(s3)))
    assert(fieldId(s3, "k") == 1 && fieldId(s3, "w") == 6)

    // partition-spec field-ids: evolution CONTINUES from
    // last-partition-id instead of restarting at 1000
    val d2 = s"${tmp()}/p"
    val p = new LogTable(d2)
    p.append(Seq((1L, "r1", "s1")).toDF("k", "region", "seg")
      .repartition(1))
    p.setPartitionColumns(Seq("region"))
    p.append(Seq((2L, "r2", "s2")).toDF("k", "region", "seg")
      .repartition(1))
    IcebergExport.exportIcebergMetadata(spark, p)
    p.setPartitionColumns(Seq("seg"))
    p.append(Seq((3L, "r3", "s3")).toDF("k", "region", "seg")
      .repartition(1))
    IcebergExport.exportIcebergMetadata(spark, p)
    val pm = JsonMethods.parse(java.nio.file.Files.readString(
      new File(d2, "metadata/v2.metadata.json").toPath))
    val specs = (pm \ "partition-specs") match {
      case JArray(ss) => ss; case _ => Nil }
    assert(specs.size == 2, JsonMethods.pretty(JsonMethods.render(pm)))
    def specFieldId(sp: JValue, name: String): Int =
      (sp \ "fields") match {
        case JArray(fs) => fs.collectFirst {
          case f if (f \ "name") == JString(name) =>
            (f \ "field-id") match {
              case JInt(i) => i.toInt; case _ => -1 }
        }.getOrElse(-1)
        case _ => -1
      }
    assert(specs.exists(sp => specFieldId(sp, "region") == 1000))
    assert(specs.exists(sp => specFieldId(sp, "seg") == 1001),
      JsonMethods.pretty(JsonMethods.render(pm)))
    assert((pm \ "last-partition-id") == JInt(1001))
  }

  test("iceberg_bucket layouts CROSS the boundary: the spec's own " +
    "hash exports as a real bucket[N] transform, a foreign reader's " +
    "recomputation names the right files, and convert rebuilds the " +
    "layout for further writes") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, name STRING"),
      partitionBy = Seq("iceberg_bucket(4, k)"))
    t.append((1L to 40L).map(i => (i, s"n$i")).toDF("k", "name"))
    // point query on the SOURCE column prunes via the hidden bucket
    val (surv, total) = t.prunedAddsFor(spark, col("k") === 7L)
    assert(surv.size < total, s"${surv.size} of $total")
    val expected = graft.plans.IcebergBucketHash.bucketLong(7L, 4)
    assert(surv.forall(_.partitionValues.get("k_ibucket_4")
      .contains(expected.toString)),
      surv.map(_.partitionValues).mkString(", "))

    IcebergExport.exportIcebergMetadata(spark, t)
    // the exported spec carries the REAL bucket[4] transform
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    val specFields = (meta \ "partition-specs") match {
      case JArray(List(sp)) => sp \ "fields"
      case other => fail(s"one spec expected: $other")
    }
    assert((specFields \ "transform") == JString("bucket[4]") ||
      ((specFields \ "transform") match {
        case JArray(ts) => ts.contains(JString("bucket[4]"))
        case _ => false
      }), JsonMethods.pretty(JsonMethods.render(specFields)))
    // a FOREIGN reader recomputing the spec hash for k = 7 selects
    // exactly the files graft wrote for that bucket
    val (_, _, files) = IcebergExport.readIcebergSnapshot(spark, dir)
    val wanted = files.filter(_._3.get("k_ibucket_4")
      .contains(expected.toString))
      .map(f => new File(f._1).getName).toSet
    // graft's own pruning is TIGHTER (bucket + per-file k min/max),
    // so its survivors must sit inside the foreign bucket selection
    // — and the bucket selection must be a strict subset of all files
    assert(surv.map(a => new File(a.path).getName).toSet
      .subsetOf(wanted), s"$wanted vs ${surv.map(_.path)}")
    assert(wanted.nonEmpty && wanted.size < files.size)

    // convert rebuilds the SAME layout: future writes bucket by the
    // spec hash, so stats stay one hash function
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(conv.partitionTransforms ==
      Map("k_ibucket_4" -> "iceberg_bucket(4,k)"),
      conv.partitionTransforms)
    assert(conv.load(spark).count() == 40L)
    conv.append((41L to 48L).map(i => (i, s"n$i")).toDF("k", "name"))
    assert(conv.load(spark).count() == 48L)
    val (surv2, total2) = conv.prunedAddsFor(spark, col("k") === 43L)
    assert(surv2.size < total2)
    val exp43 = graft.plans.IcebergBucketHash.bucketLong(43L, 4)
    assert(surv2.forall(_.partitionValues.get("k_ibucket_4")
      .contains(exp43.toString)))

    // the SPARK-hash bucket still refuses at this boundary, naming
    // the working alternative
    val d2 = s"${tmp()}/t"
    val t2 = new LogTable(d2)
    t2.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, name STRING"), partitionBy = Seq("bucket(4, k)"))
    t2.append(Seq((1L, "a")).toDF("k", "name"))
    val e = intercept[IllegalArgumentException](
      IcebergExport.exportIcebergMetadata(spark, t2))
    assert(e.getMessage.contains("iceberg_bucket"), e.getMessage)
  }

  test("deletion vectors export as v2 POSITION DELETE files: the " +
    "spec's reserved field ids, per-file sort, content=1 delete " +
    "manifest with file_path bounds, and the proxy reader refuses") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append((1L to 100L).map(i => (i, s"n$i")).toDF("k", "v")
      .repartition(2))
    t.deleteMor(spark, col("k") % 10 === 0) // 10 rows, MOR
    IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    val listPath = ((meta \ "snapshots")(0) \ "manifest-list")
      .asInstanceOf[JString].s
    // manifest list: one data entry + one delete entry
    val lr = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](new File(listPath),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val entries = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.avro.generic.GenericRecord]
    while (lr.hasNext) entries += lr.next()
    lr.close()
    assert(entries.map(e => e.get("content")
      .asInstanceOf[Number].intValue()).sorted == Seq(0, 1), entries)
    val del = entries.find(_.get("content")
      .asInstanceOf[Number].intValue() == 1).get
    assert(del.get("added_rows_count")
      .asInstanceOf[Number].longValue() == 10L)
    // the delete manifest: content=1 entries, record counts sum to
    // the deleted rows, file_path bounds on the reserved field id
    val dmPath = del.get("manifest_path").toString
    val dr = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](new File(dmPath),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    assert(new String(dr.getMeta("content"),
      java.nio.charset.StandardCharsets.UTF_8) == "deletes")
    var total = 0L
    val delFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    while (dr.hasNext) {
      val e = dr.next()
      val df = e.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(df.get("content").asInstanceOf[Number].intValue() == 1)
      total += df.get("record_count").asInstanceOf[Number].longValue()
      delFiles += df.get("file_path").toString
      val lo = df.get("lower_bounds")
        .asInstanceOf[java.util.Collection[_]]
      assert(lo != null && lo.size == 1)
      val kv = lo.iterator.next()
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(kv.get("key").asInstanceOf[Number].intValue() ==
        2147483546)
    }
    dr.close()
    assert(total == 10L)
    assert(delFiles.forall(_.contains("_ice_deletes/")), delFiles)
    // one delete parquet: reserved field ids in the footer, rows
    // sorted by (file_path, pos)
    val conf = spark.sessionState.newHadoopConf()
    val pf = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(delFiles.head), conf))
    val mt = pf.getFooter.getFileMetaData.getSchema
    import scala.jdk.CollectionConverters._
    def idOf(name: String): Int =
      mt.getFields.asScala.find(_.getName == name).get.getId.intValue
    assert(idOf("file_path") == 2147483546)
    assert(idOf("pos") == 2147483545)
    pf.close()
    val rows = spark.read.parquet(delFiles.head)
      .select(col("file_path"), col("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == rows.sortBy(identity), "delete rows not sorted")
    // the proxy reader cannot subtract — refuses toward convert
    val e = intercept[IllegalStateException](
      IcebergExport.loadIceberg(spark, dir))
    assert(e.getMessage.contains("convertFromIceberg"), e.getMessage)
  }

  test("position deletes ROUND-TRIP: export a MOR-deleted snapshot, " +
    "strip the graft state, convertFromIceberg subtracts exactly " +
    "and the converted table stays writable") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append((1L to 150L).map(i => (i, s"n$i")).toDF("k", "v")
      .repartition(3))
    t.deleteMor(spark, col("k") % 10 === 0)  // 15 rows
    t.deleteMor(spark, col("k") > 140)       // 9 more, vector UNION
    assert(t.load(spark).count() == 126L)
    IcebergExport.exportIcebergMetadata(spark, t)
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    rm(new File(dir, "_dv")) // the foreign table must stand alone
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(conv.load(spark).count() == 126L)
    assert(conv.load(spark).filter(col("k") % 10 === 0).count() == 0L)
    assert(conv.load(spark).filter(col("k") === 141L).count() == 0L)
    // the manifest's logical row counts subtract the vectors
    assert(conv.liveAdds(None).map(_.logicalRows).sum == 126L)
    // further MOR delete on the CONVERTED table: new vectors union
    // with the imported ones
    conv.deleteMor(spark, col("k") <= 5)
    assert(conv.load(spark).count() == 121L)
    assert(conv.load(spark).agg(sum(col("k"))).head.getLong(0) ==
      (1L to 150L).filter(k => k % 10 != 0 && k <= 140 && k > 5).sum)
  }

  test("position deletes cross a PARTITIONED boundary as GLOBAL " +
    "(unpartitioned-spec) deletes: a second empty-fields spec " +
    "carries them, and the converted layout still prunes") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, p STRING"), partitionBy = Seq("p"))
    t.append((1L to 60L).map(i => (i, s"p${i % 3}")).toDF("k", "p"))
    t.deleteMor(spark, col("k") % 4 === 0) // 15 rows across partitions
    IcebergExport.exportIcebergMetadata(spark, t)
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    val specs = (meta \ "partition-specs").asInstanceOf[JArray].arr
    assert(specs.size == 2, JsonMethods.pretty(JsonMethods.render(
      meta \ "partition-specs")))
    assert(specs.exists(s => (s \ "fields") == JArray(Nil)))
    assert((meta \ "default-spec-id") == JInt(0))
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    rm(new File(dir, "_dv"))
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(conv.load(spark).count() == 45L)
    assert(conv.load(spark).filter(col("p") === "p1").count() ==
      (1L to 60L).count(i => i % 3 == 1 && i % 4 != 0))
    // identity partition pruning survives the round trip
    val (surv, totalFiles) =
      conv.prunedAddsFor(spark, col("p") === "p1")
    assert(surv.size < totalFiles)
  }

  test("duplicate positions across foreign delete files subtract " +
    "ONCE (the spec allows overlap), and EQUALITY deletes refuse " +
    "by name") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append((1L to 50L).map(i => (i, s"n$i")).toDF("k", "v")
      .repartition(1))
    t.deleteMor(spark, col("k") <= 10)
    IcebergExport.exportIcebergMetadata(spark, t)
    // doctor the delete manifest: append a SECOND entry referencing
    // a copy of the same delete parquet — a foreign writer may emit
    // overlapping delete files
    val meta = JsonMethods.parse(java.nio.file.Files.readString(
      new File(dir, "metadata/v1.metadata.json").toPath))
    val listPath = ((meta \ "snapshots")(0) \ "manifest-list")
      .asInstanceOf[JString].s
    val lr = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](new File(listPath),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    var dmPath: String = null
    while (lr.hasNext) {
      val e = lr.next()
      if (e.get("content").asInstanceOf[Number].intValue() == 1)
        dmPath = e.get("manifest_path").toString
    }
    lr.close()
    val dr = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](new File(dmPath),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val dSchema = dr.getSchema
    val first = dr.next()
    dr.close()
    val origDf = first.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
    val origPath = new File(origDf.get("file_path").toString)
    val copy = new File(origPath.getParentFile, "dup-" +
      origPath.getName)
    java.nio.file.Files.copy(origPath.toPath, copy.toPath)
    origDf.put("file_path", copy.getAbsolutePath)
    val dw = new org.apache.avro.file.DataFileWriter[
      org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](dSchema))
    dw.setMeta("format-version", "2")
    dw.setMeta("content", "deletes")
    dw.create(dSchema, new File(dmPath)) // rewrite in place
    dw.append(first) // now points at the copy
    val second = new org.apache.avro.generic.GenericData.Record(
      dSchema)
    second.put("status", first.get("status"))
    second.put("snapshot_id", first.get("snapshot_id"))
    second.put("sequence_number", first.get("sequence_number"))
    second.put("file_sequence_number",
      first.get("file_sequence_number"))
    val df2 = new org.apache.avro.generic.GenericData.Record(
      origDf.getSchema)
    origDf.getSchema.getFields.forEach { f =>
      df2.put(f.name(), origDf.get(f.name()))
    }
    df2.put("file_path", origPath.getAbsolutePath)
    second.put("data_file", df2)
    dw.append(second)
    dw.close()
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    rm(new File(dir, "_dv"))
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    // overlapping delete files: positions subtract ONCE
    assert(conv.load(spark).count() == 40L)
    assert(conv.liveAdds(None).map(_.logicalRows).sum == 40L)

    // equality deletes (content=2) refuse by name
    val d2 = s"${tmp()}/t"
    val t2 = new LogTable(d2)
    t2.append((1L to 20L).map(i => (i, s"n$i")).toDF("k", "v")
      .repartition(1))
    t2.deleteMor(spark, col("k") === 1L)
    IcebergExport.exportIcebergMetadata(spark, t2)
    val meta2 = JsonMethods.parse(java.nio.file.Files.readString(
      new File(d2, "metadata/v1.metadata.json").toPath))
    val lp2 = ((meta2 \ "snapshots")(0) \ "manifest-list")
      .asInstanceOf[JString].s
    val lr2 = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](new File(lp2),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    var dm2: String = null
    while (lr2.hasNext) {
      val e = lr2.next()
      if (e.get("content").asInstanceOf[Number].intValue() == 1)
        dm2 = e.get("manifest_path").toString
    }
    lr2.close()
    val dr3 = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](new File(dm2),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val sch3 = dr3.getSchema
    val e3 = dr3.next()
    dr3.close()
    e3.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
      .put("content", Integer.valueOf(2)) // EQUALITY_DELETES
    val dw3 = new org.apache.avro.file.DataFileWriter[
      org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](sch3))
    dw3.setMeta("format-version", "2")
    dw3.setMeta("content", "deletes")
    dw3.create(sch3, new File(dm2))
    dw3.append(e3)
    dw3.close()
    rm(new File(d2, "_log"))
    rm(new File(d2, "_dv"))
    val err = intercept[IllegalStateException](
      IcebergExport.convertFromIceberg(spark, d2))
    assert(err.getMessage.contains("EQUALITY"), err.getMessage)
  }

  test("mirrorIceberg keeps the delete files its retained metadata " +
    "references and reclaims superseded _ice_deletes dirs") {
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append((1L to 40L).map(i => (i, s"n$i")).toDF("k", "v")
      .repartition(1))
    t.deleteMor(spark, col("k") <= 4)
    assert(IcebergExport.mirrorIceberg(spark, t,
      keepMetadata = 1, keepSnapshots = 1).isDefined)
    val delRoot = new File(dir, "_ice_deletes")
    val firstDirs = delRoot.listFiles().map(_.getName).toSet
    assert(firstDirs.size == 1)
    // another MOR delete → another export renders FRESH delete
    // files; retention keepMetadata=1 reclaims the superseded dir
    t.deleteMor(spark, col("k") > 36)
    assert(IcebergExport.mirrorIceberg(spark, t,
      keepMetadata = 1, keepSnapshots = 1).isDefined)
    val secondDirs = delRoot.listFiles().map(_.getName).toSet
    assert(secondDirs.size == 1)
    assert(secondDirs.intersect(firstDirs).isEmpty,
      s"superseded delete dir not reclaimed: $firstDirs vs $secondDirs")
    // the surviving metadata still serves: round-trip via convert
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new File(dir, "_log"))
    rm(new File(dir, "_dv"))
    val conv = IcebergExport.convertFromIceberg(spark, dir)
    assert(conv.load(spark).count() == 32L)
  }

  test("graft TAGS export as Iceberg refs (with the main branch at " +
    "the current snapshot); tags outside the carried snapshots and " +
    "branches stay behind") {
    def metaAt(dir: String): JValue = {
      val n = java.nio.file.Files.readString(
        new File(dir, "metadata/version-hint.text").toPath).trim.toInt
      JsonMethods.parse(java.nio.file.Files.readString(
        new File(dir, s"metadata/v$n.metadata.json").toPath))
    }
    val dir = s"${tmp()}/t"
    val t = new LogTable(dir)
    t.append(Seq((1L, "a")).toDF("k", "v"))           // v0
    IcebergExport.mirrorIceberg(spark, t)             // snap 0
    t.createTag("release-1", Some(0L))                // v1, pins v0
    t.append(Seq((2L, "b")).toDF("k", "v"))           // v2
    IcebergExport.mirrorIceberg(spark, t)             // snap 2
    val refs2 = (metaAt(dir) \ "refs")
      .asInstanceOf[JObject].obj.toMap
    assert(refs2.contains("main"))
    assert((refs2("main") \ "type") == JString("branch"))
    assert((refs2("main") \ "snapshot-id") ==
      (metaAt(dir) \ "current-snapshot-id"))
    // release-1 pins snapshot 0 — carried — exports as a tag ref
    // (json4s parses numbers back as JInt — compare by value)
    def idOfRef(j: JValue): Long = (j \ "snapshot-id") match {
      case JInt(i) => i.toLong; case JLong(l) => l; case _ => -1L
    }
    assert(refs2.get("release-1").map(idOfRef).contains(0L),
      refs2.keys)
    assert((refs2("release-1") \ "type") == JString("tag"))

    // a tag pinning a version never exported as a snapshot, and a
    // branch (its head lives on its OWN log), both stay behind; a
    // tight keepSnapshots carry drops release-1's snapshot too
    t.createTag("mid", Some(1L))                      // v3, pins v1
    t.createBranch("dev")                             // v4
    t.append(Seq((3L, "c")).toDF("k", "v"))           // v5
    IcebergExport.mirrorIceberg(spark, t,
      keepSnapshots = 2)                              // carries 2, 5
    val refs5 = (metaAt(dir) \ "refs")
      .asInstanceOf[JObject].obj.toMap
    assert(refs5.contains("main"))
    assert(!refs5.contains("release-1"), refs5.keys) // snap 0 dropped
    assert(!refs5.contains("mid"), refs5.keys)       // never a snap
    assert(!refs5.contains("dev"), refs5.keys)       // branch
  }
}
