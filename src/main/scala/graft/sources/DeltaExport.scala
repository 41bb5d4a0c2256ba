package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One-way EXPORT of a [[LogTable]] snapshot as a spec-compliant
  * Delta Lake transaction log (`_delta_log/`), per Delta's PUBLIC
  * protocol spec (delta-io PROTOCOL.md; the design is the published
  * Delta VLDB'20 paper): a single JSON commit
  * `00000000000000000000.json` carrying `protocol`, `metaData` and
  * one `add` per live file (Delta-rendered stats JSON), an optional
  * single-part parquet CHECKPOINT with the spec's top-level action
  * columns, and the `_last_checkpoint` pointer. Data files are
  * referenced IN PLACE (table-relative paths) — the export writes
  * metadata only, so a external Delta reader pointed at the table
  * root consumes the same parquet bytes graft wrote.
  *
  * No Delta implementation exists in this environment (offline — r5
  * verified), so conformance is verified structurally (spec-required
  * fields, stats rendering, checkpoint action schema) plus a
  * round-trip through [[DeltaExport.readDeltaSnapshot]], this
  * library's own reader for the format, as a proxy.
  *
  * Unsupported-by-Delta state refuses loudly rather than exporting a
  * log a Delta reader would misread: deletion vectors (graft's DV
  * sidecar layout is not Delta's), hidden partitioning (the
  * synthesized column is not in the user schema), and column
  * mapping (graft stamps parquet field ids without Delta's
  * `delta.columnMapping.*` metadata). Run OPTIMIZE/purgeDeletes
  * first — the export names the blocker. */
object DeltaExport {

  /** Export the snapshot at `version` (default: current) into
    * `<table>/_delta_log/`. Returns the commit file path. */
  def exportDeltaLog(spark: SparkSession, log: LogTable,
                     version: Option[Long] = None,
                     withCheckpoint: Boolean = true): String = {
    val v = version.orElse(log.currentVersion).getOrElse(
      throw new IllegalStateException(s"no log table at ${log.path}"))
    val adds = log.liveAdds(Some(v))
    require(adds.forall(_.dv.isEmpty),
      "cannot export a snapshot carrying deletion vectors — graft's " +
        "DV sidecars are not Delta's format; run purgeDeletes() or " +
        "OPTIMIZE first")
    require(log.partitionTransformsAt(v).isEmpty,
      "cannot export a hidden-partitioned snapshot — the synthesized " +
        "transform column is not part of the user schema Delta " +
        "readers expect")
    val schema = log.schemaAt(v)
    require(!schema.fields.exists(
      _.metadata.contains(LogTable.FieldIdKey)),
      "cannot export a column-mapped snapshot — graft's parquet " +
        "field-id stamps lack Delta's delta.columnMapping.* metadata")
    require(adds.forall(!_.path.startsWith("/")),
      "cannot export a shallow clone — its snapshot references " +
        "absolute paths outside this table root")
    val partCols = log.partitionColsAt(v)
    val dir = new File(log.path, "_delta_log")
    dir.mkdirs()

    // spec-minimal protocol: plain parquet table, no table features
    val protocol = JObject(List("protocol" -> JObject(List(
      "minReaderVersion" -> JInt(1), "minWriterVersion" -> JInt(2)))))
    val metaData = JObject(List("metaData" -> JObject(List(
      "id" -> JString(UUID.randomUUID().toString),
      "format" -> JObject(List("provider" -> JString("parquet"),
        "options" -> JObject(Nil))),
      "schemaString" -> JString(schema.json),
      "partitionColumns" -> JArray(partCols.toList.map(JString(_))),
      "configuration" -> JObject(Nil),
      "createdTime" -> JLong(log.commitTime(v))))))
    def statsJson(a: AddFile): String = {
      def side(pick: ColStats => Option[Any]): JValue = JObject(
        a.stats.toList.flatMap { case (c, st) => pick(st).map {
          case l: Long   => c -> (JLong(l): JValue)
          case d: Double => c -> (JDouble(d): JValue)
          case s: String => c -> (JString(s): JValue)
          case o         => c -> (JString(o.toString): JValue)
        }})
      JsonMethods.compact(JsonMethods.render(JObject(List(
        "numRecords" -> JLong(a.rows),
        "minValues" -> side(_.min), "maxValues" -> side(_.max),
        "nullCount" -> JObject(a.stats.toList.map { case (c, st) =>
          c -> (JLong(st.nulls): JValue) })))))
    }
    def addAction(a: AddFile): JObject = {
      // Delta paths are URL-encoded RELATIVE paths; graft's are
      // already relative (clones were refused above)
      JObject(List("add" -> JObject(List(
        "path" -> JString(a.path),
        "partitionValues" -> JObject(a.partitionValues.toList
          .map { case (k, pv) => k -> (JString(pv): JValue) }),
        "size" -> JLong(a.bytes),
        "modificationTime" -> JLong(log.commitTime(v)),
        "dataChange" -> JBool(true),
        "stats" -> JString(statsJson(a))))))
    }
    val commit = new File(dir, f"$v%020d.json")
    val tmp = new File(dir, s".tmp-${UUID.randomUUID()}")
    val lines = (protocol :: metaData ::
      adds.toList.map(addAction(_): JValue))
      .map(j => JsonMethods.compact(JsonMethods.render(j)))
    val w = Files.newBufferedWriter(tmp.toPath)
    try lines.foreach { l => w.write(l); w.write("\n") }
    finally w.close()
    Files.move(tmp.toPath, commit.toPath,
      StandardCopyOption.ATOMIC_MOVE)

    if (withCheckpoint) writeCheckpoint(spark, dir, v, lines)
    commit.getPath
  }

  /** The spec's checkpoint: one parquet file whose rows each carry
    * exactly one top-level action column (`protocol` / `metaData` /
    * `add`), plus the `_last_checkpoint` pointer `{version, size}`.
    * Built by reading the commit's own JSON lines back through
    * Spark's JSON reader so the struct schema mirrors the actions
    * verbatim — single part, spec name. */
  private def writeCheckpoint(spark: SparkSession, dir: File, v: Long,
                              actionLines: Seq[String]): Unit = {
    import spark.implicits._
    val df = spark.read.json(
      spark.createDataset(actionLines)(
        org.apache.spark.sql.Encoders.STRING))
    val tmp = new File(dir, s".tmp-ckpt-${UUID.randomUUID()}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet"))
      .head
    val target = new File(dir, f"$v%020d.checkpoint.parquet")
    Files.move(part.toPath, target.toPath,
      StandardCopyOption.ATOMIC_MOVE)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    val last = new File(dir, "_last_checkpoint")
    Files.writeString(last.toPath, JsonMethods.compact(
      JsonMethods.render(JObject(List("version" -> JLong(v),
        "size" -> JLong(actionLines.size.toLong))))))
    ()
  }

  /** Read a `_delta_log/` directory back into (schema, partition
    * columns, live files): THIS library's reader for the exported
    * format — the round-trip proxy (no external Delta reader exists
    * here), and a one-way metadata-level import for plain-parquet
    * Delta tables (minReaderVersion 1, no table features). Resolves
    * `_last_checkpoint` when present, replays the JSON commit tail,
    * folds add/remove with latest-wins, and GATES on the protocol —
    * an unknown minReaderVersion refuses, never half-reads. */
  def readDeltaSnapshot(spark: SparkSession, tableRoot: String)
      : (StructType, Seq[String], Seq[(String, Long)]) = {
    val dir = new File(tableRoot, "_delta_log")
    require(dir.isDirectory, s"no _delta_log under $tableRoot")
    val last = new File(dir, "_last_checkpoint")
    val ckptV: Option[Long] =
      if (!last.isFile) None
      else JsonMethods.parse(Files.readString(last.toPath)) \
        "version" match {
        case JInt(i) => Some(i.toLong); case JLong(l) => Some(l)
        case _       => None
      }
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Seq.empty
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def applyAction(kind: String, j: JValue): Unit = kind match {
      case "protocol" =>
        val mr = (j \ "minReaderVersion") match {
          case JInt(i) => i.toInt; case JLong(l) => l.toInt; case _ => 1
        }
        if (mr > 1) throw new IllegalStateException(
          s"the Delta log at $tableRoot requires minReaderVersion " +
            s"$mr — this import reads protocol 1 (plain parquet) " +
            "only; refusing to half-read")
      case "metaData" =>
        schema = Some(org.apache.spark.sql.types.DataType.fromJson(
          (j \ "schemaString").asInstanceOf[JString].s)
          .asInstanceOf[StructType])
        (j \ "partitionColumns") match {
          case JArray(arr) =>
            partCols = arr.collect { case JString(s) => s }
          case _ => ()
        }
      case "add" =>
        val p = (j \ "path").asInstanceOf[JString].s
        val size = (j \ "size") match {
          case JInt(i) => i.toLong; case JLong(l) => l; case _ => 0L
        }
        live(p) = size
      case "remove" =>
        live.remove((j \ "path").asInstanceOf[JString].s); ()
      case _ => () // txn, commitInfo, cdc: no file-state effect
    }
    val kinds = Seq("protocol", "metaData", "add", "remove", "txn")
    ckptV.foreach { cv =>
      val ckpt = new File(dir, f"$cv%020d.checkpoint.parquet")
      // a checkpoint row carries exactly one non-null action column
      spark.read.parquet(ckpt.getPath).toJSON.collect().foreach { l =>
        val j = JsonMethods.parse(l)
        kinds.foreach(k =>
          if ((j \ k) != JNothing) applyAction(k, j \ k))
      }
    }
    val from = ckptV.map(_ + 1).getOrElse(0L)
    val commits = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("\\d{20}\\.json"))
      .map(f => f.getName.stripSuffix(".json").toLong -> f)
      .filter(_._1 >= from).sortBy(_._1)
    commits.foreach { case (_, f) =>
      Files.readString(f.toPath).linesIterator.filter(_.nonEmpty)
        .foreach { l =>
          val j = JsonMethods.parse(l)
          kinds.foreach(k =>
            if ((j \ k) != JNothing) applyAction(k, j \ k))
        }
    }
    (schema.getOrElse(throw new IllegalStateException(
      s"the Delta log at $tableRoot has no metaData action")),
      partCols, live.toSeq)
  }

  /** Snapshot DataFrame over an imported Delta log — the round-trip
    * read: resolve the live files, scan them with the logged schema
    * (hive partition discovery when partitioned). */
  def loadDelta(spark: SparkSession, tableRoot: String): DataFrame = {
    val (schema, partCols, files) = readDeltaSnapshot(spark, tableRoot)
    val paths = files.map { case (p, _) =>
      new File(tableRoot, p).getPath }
    if (paths.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val reader = spark.read.schema(schema)
    if (partCols.isEmpty) reader.parquet(paths: _*)
    else reader.option("basePath", s"$tableRoot/data")
      .parquet(paths: _*)
  }
}
