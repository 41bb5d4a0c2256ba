package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures over log tables — the Iceberg-procedure
  * surface (`CALL cat.system.rewrite_data_files(...)`) on Spark 4's
  * native `ProcedureCatalog` API, so every table-maintenance verb is
  * reachable from plain SQL with no graft import in sight:
  *
  * {{{
  * CALL g.restore(`table` => 't', version => 3)
  * CALL g.vacuum('t', 2, 0)         -- retain_last, retention_hours
  * CALL g.optimize('t')             -- bin-pack small files
  * CALL g.optimize('t', 'k')        -- ... clustered by k (z-order)
  * CALL g.purge_deletes('t')        -- materialize deletion vectors
  * CALL g.history('t')              -- DESCRIBE HISTORY rows
  * }}}
  *
  * Each call runs the existing engine entry point and returns its
  * result as rows (a `LocalScan` — procedure outputs are metadata-
  * sized: versions, dropped paths, history lines). All the scale
  * properties are the callee's: RESTORE and vacuum stay
  * metadata-only, OPTIMIZE rewrites ∝ selected files. */
private[sources] final class GraftProcedure(catalog: GraftTableCatalog,
                                            procName: String)
  extends UnboundProcedure with BoundProcedure {

  import GraftProcedure._

  override def name(): String = procName
  override def description(): String = s"graft log-table $procName"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  private def in(n: String, dt: DataType) = ProcedureParameter.in(n, dt)

  override def parameters(): Array[ProcedureParameter] = procName match {
    case "restore" =>
      // version OR timestamp (Delta's RESTORE TO VERSION/TIMESTAMP
      // AS OF — users think in time; in-commit monotonic timestamps
      // make the instant→version resolution exact)
      Array(in("table", StringType).build(),
        in("version", LongType).defaultValue("-1").build(),
        in("timestamp", StringType).defaultValue("''").build())
    case "vacuum" =>
      Array(in("table", StringType).build(),
        in("retain_last", IntegerType).defaultValue("1").build(),
        in("retention_hours", IntegerType).defaultValue("168").build(),
        in("dry_run", BooleanType).defaultValue("false").build())
    case "optimize" =>
      Array(in("table", StringType).build(),
        in("zorder_by", StringType).defaultValue("''").build(),
        in("target_files", IntegerType).defaultValue("8").build(),
        in("where", StringType).defaultValue("''").build(),
        in("incremental", BooleanType).defaultValue("false").build())
    case "purge_deletes" | "history" | "detail" | "refresh_mv" |
         "analyze_table" | "checkpoint" =>
      Array(in("table", StringType).build())
    case "set_properties" =>
      // `properties`: comma-separated k=v pairs ("a=1,b=x")
      Array(in("table", StringType).build(),
        in("properties", StringType).build())
    case "unset_properties" =>
      // `keys`: comma-separated property names
      Array(in("table", StringType).build(),
        in("keys", StringType).build())
    case "expire_snapshots" =>
      Array(in("table", StringType).build(),
        in("retain_last", IntegerType).defaultValue("1").build())
    case "create_tag" =>
      Array(in("table", StringType).build(),
        in("name", StringType).build(),
        in("version", LongType).defaultValue("-1").build())
    case "create_branch" =>
      Array(in("table", StringType).build(),
        in("name", StringType).build(),
        in("version", LongType).defaultValue("-1").build())
    case "merge_branch" | "drop_ref" =>
      Array(in("table", StringType).build(),
        in("name", StringType).build())
    case "drop_branch" =>
      Array(in("table", StringType).build(),
        in("name", StringType).build(),
        in("delete_data", BooleanType).defaultValue("true").build(),
        // widen the still-referenced check to the newest N versions
        // (match the table's vacuum retain_last to keep its
        // time-travel window readable across the drop)
        in("retain_last", IntegerType).defaultValue("1").build())
    case "show_refs" =>
      Array(in("table", StringType).build())
    case "set_partition" =>
      // `spec`: comma-separated partition columns and/or transforms
      // ("seg", "days(ts)", "bucket(16,id)"); empty unpartitions
      Array(in("table", StringType).build(),
        in("spec", StringType).defaultValue("''").build())
    case "create_mv" =>
      Array(in("table", StringType).build(),
        in("target", StringType).build(),
        in("keys", StringType).build(),
        in("value", StringType).build(),
        in("with_minmax", BooleanType).defaultValue("false").build())
    case "clone" =>
      Array(in("table", StringType).build(),
        in("target", StringType).build(),
        in("version", LongType).defaultValue("-1").build())
    case "mirror_delta" =>
      Array(in("table", StringType).build(),
        in("checkpoint_every", IntegerType).defaultValue("10").build())
    case "mirror_iceberg" =>
      Array(in("table", StringType).build(),
        in("keep_metadata", IntegerType).defaultValue("10").build(),
        in("keep_snapshots", IntegerType).defaultValue("100").build())
    case "convert_from_delta" | "convert_from_iceberg" =>
      Array(in("table", StringType).build())
    case other =>
      throw new UnsupportedOperationException(s"procedure $other")
  }

  private def outSchema: StructType = procName match {
    case "restore" | "purge_deletes" | "optimize" | "clone" |
         "create_mv" | "set_partition" | "create_tag" |
         "create_branch" | "merge_branch" | "drop_ref" |
         "drop_branch" | "set_properties" | "unset_properties" |
         "checkpoint" =>
      StructType(Seq(StructField("version", LongType)))
    case "refresh_mv" =>
      StructType(Seq(StructField("version", LongType),
        StructField("from_version", LongType),
        StructField("to_version", LongType),
        StructField("mode", StringType)))
    case "vacuum" =>
      StructType(Seq(StructField("dropped", StringType)))
    case "mirror_delta" =>
      StructType(Seq(StructField("exported_version", LongType)))
    case "mirror_iceberg" =>
      StructType(Seq(StructField("metadata_path", StringType)))
    case "convert_from_delta" | "convert_from_iceberg" =>
      StructType(Seq(StructField("version", LongType)))
    case "expire_snapshots" =>
      StructType(Seq(StructField("expired", StringType)))
    case "show_refs" =>
      StructType(Seq(StructField("name", StringType),
        StructField("kind", StringType),
        StructField("version", LongType)))
    case "history" =>
      StructType(Seq(StructField("version", LongType),
        StructField("commit_ts", LongType), StructField("op", StringType),
        StructField("n_added", LongType), StructField("n_removed", LongType)))
    case "analyze_table" =>
      StructType(Seq(StructField("column", StringType),
        StructField("ndv", LongType), StructField("nulls", LongType),
        StructField("min", StringType), StructField("max", StringType),
        StructField("avg_len", LongType), StructField("max_len", LongType),
        StructField("row_count", LongType),
        StructField("analyzed_version", LongType)))
    case "detail" =>
      StructType(Seq(StructField("version", LongType),
        StructField("num_files", LongType),
        StructField("num_rows", LongType),
        StructField("size_bytes", LongType),
        StructField("dv_files", LongType),
        StructField("partition_cols", StringType),
        StructField("bloom_cols", StringType),
        StructField("constraints", StringType),
        StructField("generated", StringType),
        StructField("identity", StringType),
        StructField("defaults", StringType),
        StructField("properties", StringType)))
  }

  override def call(input: InternalRow): JIterator[Scan] = {
    val spark = SparkSession.active
    // lazy: the convert procedures name a table that does not exist
    // as a GRAFT log yet — only its foreign metadata does
    lazy val t = catalog.logTableByName(input.getUTF8String(0).toString)
    val out: Seq[InternalRow] = procName match {
      case "restore" =>
        val v = input.getLong(1)
        val ts = input.getUTF8String(2).toString
        require((v >= 0) ^ ts.nonEmpty,
          "restore takes a version OR a timestamp, exactly one")
        // integer-string convention, shared across the dual-form
        // surfaces: a pure-integer argument means a VERSION
        // everywhere (table_changes' rule). restore already has a
        // dedicated version parameter, so its `timestamp` REFUSES
        // integer strings instead of silently assigning them the
        // opposite meaning (epoch millis) — users moving between
        // restore and table_changes get one rule, not two.
        if (ts.matches("-?\\d+")) throw new IllegalArgumentException(
          s"restore timestamp '$ts' is a pure integer — integer " +
            "arguments mean a VERSION; pass it as the version " +
            "parameter, or give a timestamp string. (BREAKING " +
            "CHANGE, round 11: this argument was previously " +
            "accepted as epoch MILLIS — callers relying on that " +
            "should convert with a timestamp string, e.g. " +
            "from_unixtime(millis / 1000).)")
        val target =
          if (ts.isEmpty) v
          else t.versionAt(LogTable.evalTimestampMillis(spark,
            org.apache.spark.sql.catalyst.expressions.Literal(
              UTF8String.fromString(ts),
              org.apache.spark.sql.types.StringType)).getOrElse(
            throw new IllegalArgumentException(
              s"cannot read restore timestamp '$ts'")))
        Seq(row(t.restore(target)))
      case "vacuum" =>
        t.vacuum(input.getInt(1),
          input.getInt(2).toLong * 3600L * 1000L,
          dryRun = input.getBoolean(3))
          .map(p => row(UTF8String.fromString(p)))
      case "optimize" =>
        val zorder = input.getUTF8String(1).toString
        val where = input.getUTF8String(3).toString
        val pred =
          if (where.isEmpty) None
          else Some(org.apache.spark.sql.functions.expr(where))
        // zorder_by + where = SCOPED clustering (Delta's
        // OPTIMIZE ... WHERE ... ZORDER BY): only stats-matching
        // files rewrite, cost ∝ the scope. incremental => true
        // (round-11, liquid-style): rewrite only the files that
        // arrived since the last incremental pass — cost ∝ new
        // data; mutually exclusive with `where` (the epoch marker
        // describes whole-table layout coverage, which a
        // predicate-scoped pass cannot claim)
        val incremental = input.getBoolean(4)
        require(!incremental || where.isEmpty,
          "optimize takes incremental OR where, not both")
        val keys =
          zorder.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val v =
          if (incremental) {
            require(keys.nonEmpty,
              "incremental optimize requires zorder_by columns")
            t.clusterIncremental(spark, keys, input.getInt(2))
          }
          else if (keys.isEmpty) t.compactFiles(spark, where = pred)
          else t.cluster(spark, keys, input.getInt(2), pred)
        Seq(row(v))
      case "purge_deletes" =>
        Seq(row(t.purgeDeletes(spark)))
      case "expire_snapshots" =>
        t.expireSnapshots(input.getInt(1))
          .map(n => row(UTF8String.fromString(n)))
      case "create_tag" =>
        val ver = input.getLong(2)
        Seq(row(t.createTag(input.getUTF8String(1).toString,
          if (ver < 0) None else Some(ver))))
      case "create_branch" =>
        val asOf = input.getLong(2)
        t.createBranch(input.getUTF8String(1).toString,
          if (asOf < 0) None else Some(asOf))
        Seq(row(t.currentVersion.get))
      case "merge_branch" =>
        Seq(row(t.mergeBranch(input.getUTF8String(1).toString)))
      case "drop_ref" =>
        Seq(row(t.dropRef(input.getUTF8String(1).toString)))
      case "drop_branch" =>
        Seq(row(t.dropBranch(input.getUTF8String(1).toString,
          deleteData = input.getBoolean(2),
          retainLast = input.getInt(3))))
      case "show_refs" =>
        t.refs.toSeq.sortBy(_._1).map { case (n, (kind, v)) =>
          row(UTF8String.fromString(n), UTF8String.fromString(kind), v) }
      case "set_partition" =>
        // split on top-level commas only — transform arguments
        // ("bucket(16,id)") keep theirs
        val spec = input.getUTF8String(1).toString
        Seq(row(t.setPartitionColumns(
          spec.split(",(?![^(]*\\))").map(_.trim)
            .filter(_.nonEmpty).toSeq)))
      case "clone" =>
        // `table` is the SOURCE; `target` gets the metadata-only
        // shallow clone (zero data copies)
        val target = catalog.newLogTableAt(
          input.getUTF8String(1).toString)
        val ver = input.getLong(2)
        Seq(row(target.cloneFrom(t,
          if (ver < 0) None else Some(ver))))
      case "history" =>
        t.history(spark).collect().map(r => row(
          r.getLong(0), r.getLong(1),
          UTF8String.fromString(r.getString(2)),
          r.getLong(3), r.getLong(4))).toSeq
      case "detail" =>
        // DESCRIBE DETAIL analog: driver-local metadata only
        val adds = t.liveAdds()
        Seq(row(t.currentVersion.getOrElse(-1L),
          adds.size.toLong, adds.map(_.logicalRows).sum,
          adds.map(_.bytes).sum,
          adds.count(_.dv.isDefined).toLong,
          UTF8String.fromString(t.partitionCols
            .map(c => t.partitionTransforms.getOrElse(c, c))
            .mkString(",")),
          UTF8String.fromString(t.bloomCols.mkString(",")),
          UTF8String.fromString(t.checkConstraints.toSeq.sorted
            .map { case (k, v) => s"$k: $v" }.mkString("; ")),
          UTF8String.fromString(t.generatedCols.toSeq.sorted
            .map { case (k, v) => s"$k: $v" }.mkString("; ")),
          UTF8String.fromString(t.identityColumns.toSeq.sortBy(_._1)
            .map { case (c, s) =>
              s"$c: start=${s.start} step=${s.step}" +
                s.highWater.map(h => s" highWater=$h").getOrElse("") }
            .mkString("; ")),
          UTF8String.fromString(t.columnDefaults.toSeq.sorted
            .map { case (k, v) => s"$k: $v" }.mkString("; ")),
          UTF8String.fromString(t.tableProperties.toSeq.sorted
            .map { case (k, v) => s"$k: $v" }.mkString("; "))))
      case "create_mv" =>
        // `table` is the BASE; `target` gets the materialized
        // aggregate (`keys` comma-separated, `value` the summed col)
        val target = catalog.newLogTableAt(
          input.getUTF8String(1).toString)
        Seq(row(MaterializedAgg.create(spark, t.path, target.path,
          input.getUTF8String(2).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          input.getUTF8String(3).toString,
          withMinMax = input.getBoolean(4))))
      case "refresh_mv" =>
        val r = MaterializedAgg.refresh(spark, t.path)
        Seq(row(r.mvVersion, r.fromVersion, r.toVersion,
          UTF8String.fromString(r.mode)))
      case "mirror_delta" =>
        // one-call incremental Delta mirror of the named table —
        // returns the newly exported versions (empty = was current)
        DeltaExport.mirrorDelta(spark, t,
          checkpointEvery = input.getInt(1)).map(v => row(v))
      case "mirror_iceberg" =>
        // one-call Iceberg metadata mirror + retention — returns
        // the new metadata path (no rows = was already current)
        IcebergExport.mirrorIceberg(spark, t,
          keepMetadata = input.getInt(1),
          keepSnapshots = input.getInt(2))
          .map(p => row(UTF8String.fromString(p))).toSeq
      case "convert_from_delta" =>
        // in-place CONVERT of a catalog-path Delta table — the graft
        // table the catalog serves afterwards IS the converted one
        val target = catalog.newLogTableAt(
          input.getUTF8String(0).toString)
        val conv = DeltaExport.convertFromDelta(spark, target.path)
        Seq(row(conv.currentVersion.getOrElse(-1L)))
      case "convert_from_iceberg" =>
        val target = catalog.newLogTableAt(
          input.getUTF8String(0).toString)
        val conv = IcebergExport.convertFromIceberg(spark, target.path)
        Seq(row(conv.currentVersion.getOrElse(-1L)))
      case "set_properties" =>
        val props = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty)
          .map { kv =>
            val i = kv.indexOf('=')
            require(i > 0, s"set_properties expects k=v pairs, got '$kv'")
            kv.take(i).trim -> kv.drop(i + 1).trim
          }.toMap
        require(props.nonEmpty, "set_properties needs at least one k=v")
        Seq(row(t.setTableProperties(props)))
      case "unset_properties" =>
        val keys = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(keys.nonEmpty, "unset_properties needs at least one key")
        Seq(row(t.unsetTableProperties(keys)))
      case "checkpoint" =>
        // force a checkpoint at the head — the maintenance verb that
        // bounds every later reader's commit-tail replay
        Seq(row(t.checkpointNow()))
      case "analyze_table" =>
        // ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS: one
        // distributed pass, stats committed to TBLPROPERTIES, exact
        // numbers returned as rows
        val stats = t.analyze(spark)
        stats.cols.toSeq.sortBy(_._1).map { case (n, c) =>
          row(UTF8String.fromString(n), c.ndv, c.nulls,
            c.min.map(UTF8String.fromString).orNull,
            c.max.map(UTF8String.fromString).orNull,
            c.avgLen.map(Long.box).orNull, c.maxLen.map(Long.box).orNull,
            stats.rows, stats.analyzedVersion)
        }
    }
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = outSchema
      override def rows(): Array[InternalRow] = out.toArray
    }
    Collections.singletonList(scan).iterator()
  }
}

private[graft] object GraftProcedure {
  val Names: Set[String] =
    Set("restore", "vacuum", "optimize", "purge_deletes", "history",
      "detail", "clone", "create_mv", "refresh_mv", "set_partition",
      "create_tag", "create_branch", "merge_branch", "drop_ref",
      "drop_branch", "show_refs", "analyze_table", "expire_snapshots",
      "mirror_delta", "mirror_iceberg", "convert_from_delta",
      "convert_from_iceberg", "set_properties", "unset_properties",
      "checkpoint")

  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)
}
