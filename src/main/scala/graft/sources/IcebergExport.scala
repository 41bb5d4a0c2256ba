package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import java.util.UUID

import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One-way EXPORT of a [[LogTable]] snapshot as Apache Iceberg
  * TABLE METADATA, per Iceberg's PUBLIC table spec (format-version
  * 2, iceberg.apache.org/spec): `metadata/vN.metadata.json` with the
  * spec's required fields (schemas with field ids, partition specs,
  * sort orders, snapshots, snapshot-log), a manifest-list Avro file
  * and a manifest Avro file carrying the spec's `manifest_file` /
  * `manifest_entry` records (field-id-annotated Avro schemas), and
  * the HadoopCatalog `version-hint.text` pointer — written with the
  * RAW avro-1.12 API already on Spark's classpath (no spark-avro,
  * no Iceberg runtime; both absent in this offline environment, so
  * conformance is verified structurally plus a round-trip through
  * [[IcebergExport.readIcebergSnapshot]], this library's own reader
  * for the format).
  *
  * Data files are referenced IN PLACE by absolute path (Iceberg's
  * own convention), so an external Iceberg reader pointed at the
  * table location consumes the parquet bytes graft wrote. graft's
  * parquet carries no field ids (unless column-mapped, in which case
  * the EXISTING ids are reused), so the metadata sets the spec's
  * `schema.name-mapping.default` property — the standard fallback
  * Iceberg readers apply to id-less files.
  *
  * Sequential exports MIRROR the table: each call writes the next
  * `vN.metadata.json`, carrying the previous snapshots and
  * snapshot-log forward, so the Iceberg history follows graft's.
  *
  * Refused loudly (state an Iceberg reader would misread): deletion
  * vectors (v2 delete FILES are a different encoding), graft hidden
  * partitioning (transform mapping is not implemented — Iceberg
  * could express it, the translation isn't built), nested column
  * types (graft stats and this exporter handle flat schemas), and
  * partition columns outside {string, int, long, date}. */
object IcebergExport {

  /** Iceberg primitive type name for a Spark type — the spec's
    * string forms. Nested / exotic types refuse by column name. */
  private def icebergType(name: String, dt: DataType): String =
    dt match {
      case ByteType | ShortType | IntegerType => "int"
      case LongType                           => "long"
      case FloatType                          => "float"
      case DoubleType                         => "double"
      case BooleanType                        => "boolean"
      case StringType                         => "string"
      case BinaryType                         => "binary"
      case DateType                           => "date"
      case TimestampType                      => "timestamptz"
      case TimestampNTZType                   => "timestamp"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case other => throw new IllegalArgumentException(
        s"cannot export column '$name': Iceberg metadata export " +
          s"handles flat primitive schemas, not ${other.simpleString}")
    }

  private def sparkType(t: String): DataType = t match {
    case "int"         => IntegerType
    case "long"        => LongType
    case "float"       => FloatType
    case "double"      => DoubleType
    case "boolean"     => BooleanType
    case "string"      => StringType
    case "binary"      => BinaryType
    case "date"        => DateType
    case "timestamptz" => TimestampType
    case "timestamp"   => TimestampNTZType
    case d if d.startsWith("decimal") =>
      val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")")
        .split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalStateException(
      s"unknown Iceberg type in exported metadata: $other")
  }

  /** Field ids: a column-mapped table already stamped parquet field
    * ids — reuse them so the Iceberg ids MATCH the data files;
    * otherwise assign 1..n (name mapping covers the id-less files). */
  private def fieldIds(schema: StructType): Seq[(StructField, Int)] =
    if (schema.fields.exists(_.metadata.contains(LogTable.FieldIdKey)))
      schema.fields.toSeq.map(f =>
        f -> f.metadata.getLong(LogTable.FieldIdKey).toInt)
    else schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      f -> (i + 1) }

  private def icebergSchemaJson(ids: Seq[(StructField, Int)]): JValue =
    JObject(List(
      "type" -> JString("struct"), "schema-id" -> JInt(0),
      "fields" -> JArray(ids.toList.map { case (f, id) =>
        JObject(List("id" -> JInt(id), "name" -> JString(f.name),
          "required" -> JBool(false),
          "type" -> JString(icebergType(f.name, f.dataType))))
      })))

  private def nameMappingJson(ids: Seq[(StructField, Int)]): JValue =
    JArray(ids.toList.map { case (f, id) =>
      JObject(List("field-id" -> JInt(id),
        "names" -> JArray(List(JString(f.name)))))
    })

  /** Partition-spec fields: identity transforms over the hive-style
    * partition columns (field-ids from 1000, the spec's floor). */
  private def specFieldsJson(partCols: Seq[String],
      ids: Seq[(StructField, Int)]): JValue =
    JArray(partCols.toList.zipWithIndex.map { case (c, i) =>
      val sourceId = ids.find(_._1.name == c).map(_._2).getOrElse(
        throw new IllegalArgumentException(
          s"partition column '$c' is not in the schema"))
      JObject(List("name" -> JString(c),
        "transform" -> JString("identity"),
        "source-id" -> JInt(sourceId), "field-id" -> JInt(1000 + i)))
    })

  /** Avro type (JSON fragment) for a partition value of an Iceberg
    * primitive — nullable union, logicalType on date. */
  private def partAvroType(iceType: String): String = iceType match {
    case "int"    => "\"int\""
    case "long"   => "\"long\""
    case "string" => "\"string\""
    case "date"   => "{\"type\":\"int\",\"logicalType\":\"date\"}"
    case other => throw new IllegalArgumentException(
      s"partition columns of Iceberg type '$other' are not " +
        "exportable — supported: string, int, long, date")
  }

  private def partitionAvroFields(partCols: Seq[String],
      ids: Seq[(StructField, Int)]): String =
    partCols.zipWithIndex.map { case (c, i) =>
      val f = ids.find(_._1.name == c).get._1
      val t = icebergType(c, f.dataType)
      s"""{"name":"$c","type":["null",${partAvroType(t)}],""" +
        s""""default":null,"field-id":${1000 + i}}"""
    }.mkString(",")

  private def manifestEntrySchema(partCols: Seq[String],
      ids: Seq[(StructField, Int)]): org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int","field-id":0},
        {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
          {"name":"content","type":"int","field-id":134},
          {"name":"file_path","type":"string","field-id":100},
          {"name":"file_format","type":"string","field-id":101},
          {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[${partitionAvroFields(partCols, ids)}]}},
          {"name":"record_count","type":"long","field-id":103},
          {"name":"file_size_in_bytes","type":"long","field-id":104}
        ]}}
      ]}""")

  private val manifestFileSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string","field-id":500},
        {"name":"manifest_length","type":"long","field-id":501},
        {"name":"partition_spec_id","type":"int","field-id":502},
        {"name":"content","type":"int","field-id":517},
        {"name":"sequence_number","type":"long","field-id":515},
        {"name":"min_sequence_number","type":"long","field-id":516},
        {"name":"added_snapshot_id","type":"long","field-id":503},
        {"name":"added_files_count","type":"int","field-id":504},
        {"name":"existing_files_count","type":"int","field-id":505},
        {"name":"deleted_files_count","type":"int","field-id":506},
        {"name":"added_rows_count","type":"long","field-id":512},
        {"name":"existing_rows_count","type":"long","field-id":513},
        {"name":"deleted_rows_count","type":"long","field-id":514}
      ]}""")

  /** A partition value string (graft stores hive-style strings) to
    * the TYPED Avro value the manifest's partition struct carries. */
  private def typedPartValue(dt: DataType, v: String): AnyRef =
    dt match {
      case ByteType | ShortType | IntegerType =>
        Integer.valueOf(v.toInt)
      case LongType   => java.lang.Long.valueOf(v.toLong)
      case StringType => v
      case DateType   => Integer.valueOf(
        java.time.LocalDate.parse(v).toEpochDay.toInt)
      case other => throw new IllegalArgumentException(
        s"partition value of type ${other.simpleString} is not " +
          "exportable to Iceberg metadata")
    }

  /** Export the snapshot at `version` (default: current) as the next
    * Iceberg metadata version under `<table>/metadata/`. Returns the
    * metadata JSON path. Sequential calls mirror the table (previous
    * snapshots carry forward). */
  def exportIcebergMetadata(spark: SparkSession, log: LogTable,
                            version: Option[Long] = None): String = {
    val v = version.orElse(log.currentVersion).getOrElse(
      throw new IllegalStateException(s"no log table at ${log.path}"))
    require(log.partitionTransformsAt(v).isEmpty,
      "cannot export a hidden-partitioned snapshot — mapping graft " +
        "transforms to Iceberg partition transforms is not " +
        "implemented; export an identity-partitioned table")
    val schema = log.schemaAt(v)
    val ids = fieldIds(schema)
    ids.foreach { case (f, _) => icebergType(f.name, f.dataType) }
    val partCols = log.partitionColsAt(v)
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap

    // file-state gates answered where the manifest lives (the same
    // discipline as DeltaExport)
    val dist =
      if (log.addsMaterializedAt(Some(v))) None
      else log.distributedManifest(spark, v)
    dist match {
      case Some(_) =>
        val (anyDv, _, _) = log.bridgeFacts(spark, Some(v))
        require(!anyDv,
          "cannot export a snapshot carrying deletion vectors — " +
            "Iceberg v2 delete files are a different encoding; run " +
            "purgeDeletes() or OPTIMIZE first")
      case None =>
        require(log.liveAdds(Some(v)).forall(_.dv.isEmpty),
          "cannot export a snapshot carrying deletion vectors — " +
            "Iceberg v2 delete files are a different encoding; run " +
            "purgeDeletes() or OPTIMIZE first")
    }

    val metaDir = new File(log.path, "metadata")
    metaDir.mkdirs()
    val root = new File(log.path).getAbsolutePath
    val prevN: Int = {
      val hint = new File(metaDir, "version-hint.text")
      if (hint.isFile) Files.readString(hint.toPath).trim.toInt else 0
    }
    val n = prevN + 1
    // table-uuid is STABLE across metadata versions (the spec's
    // identity check — a refreshing reader throws on a changed
    // uuid): carry the previous metadata's forward
    val tableUuid: String =
      (if (prevN == 0) None
       else (JsonMethods.parse(Files.readString(
         new File(metaDir, s"v$prevN.metadata.json").toPath)) \
         "table-uuid") match {
         case JString(u) => Some(u); case _ => None
       }).getOrElse(UUID.randomUUID().toString)
    // honest snapshot summary.operation per the spec's vocabulary —
    // incremental-append consumers skip or refuse non-append
    // snapshots, so a delete exported as "append" double-counts.
    // A snapshot may cover SEVERAL graft commits (sequential mirror
    // calls can skip versions), so the operation folds over every
    // commit since the previously exported version: any row-removing
    // commit makes the whole span "overwrite", a rewrite-only span
    // is "replace", and an unknowable span (expired commits) is
    // conservatively "overwrite" — never a false "append".
    val prevExportedV: Option[Long] =
      if (prevN == 0) None
      else (JsonMethods.parse(Files.readString(
        new File(metaDir, s"v$prevN.metadata.json").toPath)) \
        "current-snapshot-id") match {
        case JInt(i) => Some(i.toLong); case JLong(l) => Some(l)
        case _       => None
      }
    val operation: String = {
      val span = prevExportedV.map(p => (p + 1) to v)
        .getOrElse(v to v)
      val retained = log.versions.toSet
      if (!span.forall(retained.contains)) "overwrite"
      else {
        val ops = span.map(log.commitOp).toSet
        def appendLike(o: String) = Set("append", "create", "convert",
          "ref", "protocol", "properties", "schema", "analyze")(o)
        if (ops.forall(appendLike)) "append"
        else if (ops.forall(o => appendLike(o) || o == "optimize") &&
          ops.contains("optimize") && !ops.contains("append"))
          "replace"
        else "overwrite"
      }
    }
    val snapshotId = v
    val seq = n.toLong
    val ts = log.commitTime(v)

    // ---- manifest Avro: one entry per live file, STREAMED from the
    // distributed manifest when one serves (toLocalIterator — the
    // driver holds one partition of rows at a time, never the list)
    val entrySchema = manifestEntrySchema(partCols, ids)
    val manifestFile = new File(metaDir, s"${UUID.randomUUID()}-m0.avro")
    var nFiles = 0L
    var nRows = 0L
    val mw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    mw.setMeta("schema", JsonMethods.compact(
      JsonMethods.render(icebergSchemaJson(ids))))
    mw.setMeta("partition-spec", JsonMethods.compact(
      JsonMethods.render(specFieldsJson(partCols, ids))))
    mw.setMeta("partition-spec-id", "0")
    mw.setMeta("format-version", "2")
    mw.setMeta("content", "data")
    mw.create(entrySchema, manifestFile)
    try {
      val it: Iterator[AddFile] = dist match {
        case Some(ds) =>
          import scala.jdk.CollectionConverters._
          ds.orderBy(org.apache.spark.sql.functions.col("idx"))
            .toLocalIterator().asScala.map(LogTable.decodeCkptAdd)
        case None => log.liveAdds(Some(v)).iterator
      }
      it.foreach { a =>
        val df = new GenericData.Record(
          entrySchema.getField("data_file").schema())
        df.put("content", Integer.valueOf(0))
        df.put("file_path",
          if (a.path.startsWith("/")) a.path else s"$root/${a.path}")
        df.put("file_format", "PARQUET")
        val part = new GenericData.Record(
          entrySchema.getField("data_file").schema()
            .getField("partition").schema())
        partCols.foreach { c =>
          part.put(c, a.partitionValues.get(c)
            .map(pv => typedPartValue(byName(c), pv)).orNull)
        }
        df.put("partition", part)
        df.put("record_count", java.lang.Long.valueOf(a.rows))
        df.put("file_size_in_bytes", java.lang.Long.valueOf(a.bytes))
        val e = new GenericData.Record(entrySchema)
        e.put("status", Integer.valueOf(1)) // ADDED
        e.put("snapshot_id", java.lang.Long.valueOf(snapshotId))
        e.put("sequence_number", java.lang.Long.valueOf(seq))
        e.put("file_sequence_number", java.lang.Long.valueOf(seq))
        e.put("data_file", df)
        mw.append(e)
        nFiles += 1; nRows += a.rows
      }
    } finally mw.close()

    // ---- manifest-list Avro
    val listFile = new File(metaDir,
      s"snap-$snapshotId-1-${UUID.randomUUID()}.avro")
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestFileSchema))
    lw.setMeta("format-version", "2")
    lw.create(manifestFileSchema, listFile)
    try {
      val m = new GenericData.Record(manifestFileSchema)
      m.put("manifest_path", manifestFile.getAbsolutePath)
      m.put("manifest_length",
        java.lang.Long.valueOf(manifestFile.length()))
      m.put("partition_spec_id", Integer.valueOf(0))
      m.put("content", Integer.valueOf(0)) // data
      m.put("sequence_number", java.lang.Long.valueOf(seq))
      m.put("min_sequence_number", java.lang.Long.valueOf(seq))
      m.put("added_snapshot_id", java.lang.Long.valueOf(snapshotId))
      m.put("added_files_count", Integer.valueOf(nFiles.toInt))
      m.put("existing_files_count", Integer.valueOf(0))
      m.put("deleted_files_count", Integer.valueOf(0))
      m.put("added_rows_count", java.lang.Long.valueOf(nRows))
      m.put("existing_rows_count", java.lang.Long.valueOf(0L))
      m.put("deleted_rows_count", java.lang.Long.valueOf(0L))
      lw.append(m)
    } finally lw.close()

    // ---- vN.metadata.json: previous snapshots + snapshot-log carry
    // forward so the Iceberg history mirrors graft's
    val (prevSnaps, prevLog) =
      if (prevN == 0) (Nil, Nil)
      else {
        val prev = JsonMethods.parse(Files.readString(
          new File(metaDir, s"v$prevN.metadata.json").toPath))
        ((prev \ "snapshots") match {
          case JArray(a) => a; case _ => Nil
        }, (prev \ "snapshot-log") match {
          case JArray(a) => a; case _ => Nil
        })
      }
    val snapJson = JObject(List(
      "snapshot-id" -> JLong(snapshotId),
      "timestamp-ms" -> JLong(ts),
      "sequence-number" -> JLong(seq),
      "summary" -> JObject(List(
        "operation" -> JString(operation),
        "graft-version" -> JString(v.toString))),
      "manifest-list" -> JString(listFile.getAbsolutePath),
      "schema-id" -> JInt(0)))
    val meta = JObject(List(
      "format-version" -> JInt(2),
      "table-uuid" -> JString(tableUuid),
      "location" -> JString(root),
      "last-sequence-number" -> JLong(seq),
      "last-updated-ms" -> JLong(ts),
      "last-column-id" -> JInt(ids.map(_._2).max),
      "current-schema-id" -> JInt(0),
      "schemas" -> JArray(List(icebergSchemaJson(ids))),
      "default-spec-id" -> JInt(0),
      "partition-specs" -> JArray(List(JObject(List(
        "spec-id" -> JInt(0),
        "fields" -> specFieldsJson(partCols, ids))))),
      "last-partition-id" -> JInt(999 + partCols.size),
      "default-sort-order-id" -> JInt(0),
      "sort-orders" -> JArray(List(JObject(List(
        "order-id" -> JInt(0), "fields" -> JArray(Nil))))),
      "properties" -> JObject(List(
        "schema.name-mapping.default" -> JString(JsonMethods.compact(
          JsonMethods.render(nameMappingJson(ids)))))),
      "current-snapshot-id" -> JLong(snapshotId),
      "snapshots" -> JArray(prevSnaps :+ snapJson),
      "snapshot-log" -> JArray(prevLog :+ JObject(List(
        "timestamp-ms" -> JLong(ts),
        "snapshot-id" -> JLong(snapshotId)))),
      "metadata-log" -> JArray(Nil)))
    val target = new File(metaDir, s"v$n.metadata.json")
    val tmp = new File(metaDir, s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp.toPath,
      JsonMethods.pretty(JsonMethods.render(meta)))
    Files.move(tmp.toPath, target.toPath,
      StandardCopyOption.ATOMIC_MOVE)
    Files.writeString(new File(metaDir, "version-hint.text").toPath,
      n.toString)
    target.getPath
  }

  /** One manifest-entry partition value back to graft's hive-style
    * string form, typed by its Avro field schema (date logical type
    * → ISO date; everything else via toString). */
  private def partValueString(
      fieldSchema: org.apache.avro.Schema, v: AnyRef): Option[String] = {
    if (v == null) return None
    import scala.jdk.CollectionConverters._
    val nn =
      if (fieldSchema.getType == org.apache.avro.Schema.Type.UNION)
        fieldSchema.getTypes.asScala
          .find(_.getType != org.apache.avro.Schema.Type.NULL)
          .getOrElse(fieldSchema)
      else fieldSchema
    if (Option(nn.getLogicalType).exists(_.getName == "date"))
      Some(java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Number].longValue()).toString)
    else Some(v.toString)
  }

  /** Read exported Iceberg metadata back: version-hint → metadata
    * JSON → current snapshot → manifest list → manifests → live
    * files. THIS library's reader for the format (no Iceberg runtime
    * exists here) — the round-trip proxy. Returns (schema, partition
    * columns, one (absolute path, record count, typed partition
    * values rendered hive-style) triple per live file). REFUSES
    * Iceberg v2 DELETE manifests/files (content != 0) by name —
    * ignoring them would resurrect deleted rows, a half-read. */
  def readIcebergSnapshot(spark: SparkSession, tableRoot: String)
      : (StructType, Seq[String],
         Seq[(String, Long, Map[String, String])]) = {
    val metaDir = new File(tableRoot, "metadata")
    val hint = new File(metaDir, "version-hint.text")
    require(hint.isFile, s"no metadata/version-hint.text under $tableRoot")
    val n = Files.readString(hint.toPath).trim.toInt
    val meta = JsonMethods.parse(Files.readString(
      new File(metaDir, s"v$n.metadata.json").toPath))
    (meta \ "format-version") match {
      case JInt(fv) if fv <= 2 => ()
      case other => throw new IllegalStateException(
        s"the Iceberg metadata at $tableRoot declares format-version " +
          s"$other — this import reads v1/v2 only; refusing to " +
          "half-read")
    }
    val curId = (meta \ "current-snapshot-id") match {
      case JInt(i) => i.toLong; case JLong(l) => l
      case _ => throw new IllegalStateException("no current-snapshot-id")
    }
    val curSchemaId = (meta \ "current-schema-id") match {
      case JInt(i) => i.toInt; case _ => 0
    }
    val schemaJ = (meta \ "schemas") match {
      case JArray(ss) => ss.find(s => (s \ "schema-id") ==
        JInt(BigInt(curSchemaId))).getOrElse(ss.head)
      case _ => throw new IllegalStateException("no schemas array")
    }
    val fields = (schemaJ \ "fields") match {
      case JArray(fs) => fs.map { f =>
        StructField((f \ "name").asInstanceOf[JString].s,
          sparkType((f \ "type").asInstanceOf[JString].s))
      }
      case _ => Nil
    }
    val partCols = (meta \ "partition-specs") match {
      case JArray(specs) => specs.headOption.toList.flatMap(s =>
        (s \ "fields") match {
          case JArray(fs) => fs.map(f =>
            (f \ "name").asInstanceOf[JString].s)
          case _ => Nil
        })
      case _ => Nil
    }
    val snap = (meta \ "snapshots") match {
      case JArray(ss) => ss.find { s =>
        (s \ "snapshot-id") match {
          case JInt(i)  => i.toLong == curId
          case JLong(l) => l == curId
          case _        => false
        }
      }.getOrElse(throw new IllegalStateException(
        s"current-snapshot-id $curId not in snapshots"))
      case _ => throw new IllegalStateException("no snapshots array")
    }
    val listPath = (snap \ "manifest-list").asInstanceOf[JString].s
    val manifests = scala.collection.mutable.ArrayBuffer.empty[String]
    val lr = new DataFileReader[GenericRecord](new File(listPath),
      new GenericDatumReader[GenericRecord]())
    try while (lr.hasNext) {
      val m = lr.next()
      // content 1 = a DELETE manifest (v2 position/equality
      // deletes): this reader cannot subtract delete files —
      // ignoring them would resurrect deleted rows. Refuse, never
      // half-read. (v1 manifests lack the field: data by
      // definition.)
      val content =
        if (m.getSchema.getField("content") == null) 0
        else Option(m.get("content")).map(
          _.asInstanceOf[Number].intValue()).getOrElse(0)
      if (content != 0) throw new IllegalStateException(
        s"the Iceberg table at $tableRoot carries DELETE manifests " +
          "(v2 position/equality deletes) — this reader cannot " +
          "subtract them; compact/rewrite the table Iceberg-side " +
          "first, refusing to half-read")
      manifests += m.get("manifest_path").toString
    } finally lr.close()
    val files = scala.collection.mutable
      .ArrayBuffer.empty[(String, Long, Map[String, String])]
    manifests.foreach { mp =>
      val mr = new DataFileReader[GenericRecord](new File(mp),
        new GenericDatumReader[GenericRecord]())
      try while (mr.hasNext) {
        val e = mr.next()
        val status = e.get("status").asInstanceOf[Integer].intValue()
        if (status != 2) { // 2 = DELETED
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fileContent =
            if (df.getSchema.getField("content") == null) 0
            else Option(df.get("content")).map(
              _.asInstanceOf[Number].intValue()).getOrElse(0)
          if (fileContent != 0) throw new IllegalStateException(
            s"the Iceberg table at $tableRoot carries delete FILES " +
              "(data_file.content != 0) — this reader cannot " +
              "subtract them; refusing to half-read")
          // partition values come from the TYPED manifest struct —
          // never re-parsed from the path (non-hive layouts and
          // escaped values would mislead)
          val pvRec = Option(df.get("partition"))
            .map(_.asInstanceOf[GenericRecord])
          import scala.jdk.CollectionConverters._
          val pv: Map[String, String] = pvRec.map { r =>
            r.getSchema.getFields.asScala.flatMap { f =>
              partValueString(f.schema(), r.get(f.name()))
                .map(f.name() -> _)
            }.toMap
          }.getOrElse(Map.empty)
          files += ((df.get("file_path").toString,
            df.get("record_count").asInstanceOf[java.lang.Long]
              .longValue(), pv))
        }
      } finally mr.close()
    }
    (StructType(fields), partCols, files.toSeq)
  }

  /** CONVERT FROM ICEBERG metadata (the reverse of
    * [[exportIcebergMetadata]], Iceberg's own `add_files`/migrate
    * shape): resolve the current snapshot's live files, create a
    * graft LogTable IN PLACE at the table root, and register the
    * files BY REFERENCE — zero data movement, rows from the
    * manifests' record_count. Column bounds are NOT carried (this
    * exporter writes none and foreign manifests encode theirs as
    * optional single-value-serialized binary — skipping simply
    * starts cold; the next OPTIMIZE/cluster rewrites stats in).
    * Hive-style partition values parse back from the file paths.
    * Refuses a root that already holds a graft log. */
  def convertFromIceberg(spark: SparkSession,
                         tableRoot: String): LogTable = {
    val pre = new LogTable(tableRoot)
    require(pre.currentVersion.isEmpty,
      s"a graft log table already exists at $tableRoot")
    val (schema, partCols, files) = readIcebergSnapshot(spark, tableRoot)
    val root = new File(tableRoot).getAbsolutePath
    val adds = files.map { case (p, n, pv) =>
      val rel =
        if (p.startsWith(root + "/")) p.substring(root.length + 1)
        else p
      // partition values come decoded from the TYPED manifest
      // struct (readIcebergSnapshot), never re-parsed from the path
      AddFile(rel, n, new File(tableRoot, rel).length(),
        Map.empty, pv.view.filterKeys(partCols.contains).toMap)
    }
    val t = new LogTable(tableRoot)
    t.create(schema, partitionBy = partCols)
    if (adds.nonEmpty) t.registerFiles(adds, op = "convert")
    t
  }

  /** Snapshot DataFrame over exported Iceberg metadata — the
    * round-trip read (hive partition discovery when partitioned). */
  def loadIceberg(spark: SparkSession, tableRoot: String): DataFrame = {
    val (schema, partCols, files) = readIcebergSnapshot(spark, tableRoot)
    val paths = files.map(_._1)
    if (paths.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val reader = spark.read.schema(schema)
    if (partCols.isEmpty) reader.parquet(paths: _*)
    else reader.option("basePath", s"$tableRoot/data")
      .parquet(paths: _*)
  }
}
