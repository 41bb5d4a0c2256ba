package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat,
  CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSet,
  NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Command,
  DeleteFromTable, Histogram, HistogramBin, LogicalPlan, MergeIntoTable,
  Project, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation,
  DataSourceV2ScanRelation}

/** Logical READ substitution for the snapshots the plain parquet scan
  * cannot serve (deletion vectors, partitioned clones, mixed layouts
  * — [[GraftLogTableV2.needsV1Bridge]]): replace the DSv2 relation
  * with [[LogTable.load]]'s OWN logical plan, aliased to the
  * relation's output ids.
  *
  * Why: Spark wraps a `V1Scan` in `V1ScanWrapper` during pushdown,
  * and the wrapper implements ONLY `Scan` — the bridge's
  * `SupportsReportStatistics` is dropped on the floor, so a bridged
  * relation costs `defaultSizeInBytes` (8 EiB): a small DV-carrying
  * dimension can never broadcast on its own numbers, and the
  * execution is a row-based V1 `TableScan` — no whole-stage codegen,
  * no vectorized parquet. Substituting the real logical plan fixes
  * BOTH: the leaves are ordinary parquet relations with real sizes
  * (and the single-data-leaf case carries the table's manifest
  * row count + ANALYZE column stats/histograms as catalog
  * statistics, so CBO sees NDV and per-bucket selectivity), and the
  * physical plan is the same codegen'd, vectorized one the Scala
  * `load()` API gets. Delta serves its SQL reads through exactly
  * this shape (a file relation with attached stats) for the same
  * reasons.
  *
  * Registered through `experimental.extraOptimizations` (the public
  * live-session hook, like [[GraftRowLevelStrategy]]) by every
  * [[GraftTableCatalog]] initialize. Conservative by construction:
  * plans containing ANY command or row-level DML node are left
  * untouched (write targets and the DML dispatch must keep their
  * DSv2 relations), as are relations whose metadata columns are
  * referenced, relations whose output shape does not match the
  * load plan, and anything that throws — the V1 bridge remains the
  * fallback for every case the substitution declines. */
object GraftReadSubstitution extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val unsafe = plan.exists {
      case _: Command | _: UpdateTable | _: MergeIntoTable |
           _: DeleteFromTable => true
      case _ => false
    }
    if (unsafe) return plan
    lazy val referenced = AttributeSet(
      plan.collect { case p => p.references.toSeq }.flatten)
    // the WHOLE per-node substitution — including target(), whose
    // needsV1Bridge replays the manifest and can throw on an
    // empty/just-dropped log — honors the rule's contract: anything
    // that throws declines, and the V1 bridge serves the read
    plan.transform {
      case r: DataSourceV2Relation
          if r.metadataOutput.forall(a => !referenced.contains(a)) =>
        try target(r.table).flatMap(t =>
          substituted(t._1, t._2, r.output)).getOrElse(r)
        catch { case scala.util.control.NonFatal(_) => r }
      // if the user-optimizer batch runs after scan pushdown, the
      // relation is already scan-wrapped — substitute it the same way
      case s: DataSourceV2ScanRelation =>
        try target(s.relation.table).flatMap(t =>
          substituted(t._1, t._2, s.output)).getOrElse(s)
        catch { case scala.util.control.NonFatal(_) => s }
    }
  }

  /** needsV1Bridge replays the whole manifest, and this rule sits on
    * EVERY query's planning path (also re-entrantly, via the nested
    * optimization in [[substituted]]) — memoize the decision per
    * (table root, head version). A snapshot at a version is
    * immutable, so the cached answer can never go stale; a new
    * commit changes the key. Bounded by wholesale clear. */
  private val bridgeCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), Boolean]()

  private def cachedNeedsBridge(log: LogTable): Boolean = {
    // key on (path, head, table incarnation): a dropped-and-recreated
    // table at the same path must not inherit the old table's cached
    // decision once the new log reaches the same head. The
    // incarnation is the _log DIRECTORY's creation time — stable
    // across commits AND across log expiry (the v0 commit file, the
    // obvious anchor, is deleted once the expiry floor rises, which
    // would degenerate the key to 0 for exactly the long-lived
    // tables that run expiry); a recreate makes a fresh directory.
    val born = try java.nio.file.Files.readAttributes(
      new java.io.File(log.path, "_log").toPath,
      classOf[java.nio.file.attribute.BasicFileAttributes])
      .creationTime().toMillis
    catch { case scala.util.control.NonFatal(_) =>
      // no incarnation witness → do NOT degrade the key to a
      // constant (a drop-and-recreate reaching the same head would
      // inherit the stale decision); skip the cache entirely
      return GraftLogTableV2.needsV1Bridge(log, None)
    }
    val key = (log.path, log.currentVersion.getOrElse(-1L), born)
    if (bridgeCache.size > 1024) bridgeCache.clear()
    bridgeCache.computeIfAbsent(key,
      _ => GraftLogTableV2.needsV1Bridge(log, None))
  }

  private def target(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[(LogTable, Option[Long])] = t match {
    case g: GraftLogTableV2 if cachedNeedsBridge(g.logTable) =>
      Some((g.logTable, None))
    case d: DvReadTable => Some((d.logTable, d.pinnedVersion))
    case _ => None
  }

  private def substituted(
      log: LogTable, version: Option[Long],
      out: Seq[org.apache.spark.sql.catalyst.expressions.AttributeReference])
      : Option[LogicalPlan] = {
      try {
        val spark = SparkSession.active
        val sub = log.load(spark, version).queryExecution.optimizedPlan
        if (sub.output.size != out.size ||
            sub.output.zip(out).exists { case (n, o) =>
              n.name != o.name || n.dataType != o.dataType })
          None
        else {
          val withStats = attachStats(log, version, sub)
          val aliases: Seq[NamedExpression] =
            withStats.output.zip(out).map { case (n, o) =>
              Alias(n, o.name)(exprId = o.exprId) }
          Some(Project(aliases, withStats))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** DV sidecar leaves read `_dv/<id>` pair files — tiny, and not
    * the table; stats attach only to the DATA leaf. */
  private def isDvLeaf(lr: LogicalRelation): Boolean = lr.relation match {
    case f: HadoopFsRelation =>
      f.location.rootPaths.exists(_.toString.contains("/_dv/"))
    case _ => false
  }

  /** Attach manifest row counts plus the latest ANALYZE column stats
    * (NDV, bounds, lengths, equi-height histogram) as catalog
    * statistics on the plan's data leaves — the channel
    * `LogicalRelation.computeStats` already serves to the planner
    * (attribute stats under CBO, row count always). Each leaf's row
    * count comes from ITS OWN files' manifest entries (a DV read
    * splits clean and vectored files into separate legs; a clone
    * mixes roots), while the column stats are the table-wide pass —
    * bounds and NDV are valid upper estimates for any subset of
    * rows, and Spark's UnionEstimation recombines the legs. */
  private def attachStats(log: LogTable, version: Option[Long],
                          sub: LogicalPlan): LogicalPlan = {
    val leaf = sub.collect {
      case lr: LogicalRelation if !isDvLeaf(lr) => lr
    }.headOption.getOrElse(return sub)
    val (rows, bytes, _) = log.manifestStatistics(version)
    // ANALYZE stats describe the CURRENT version only — a pinned
    // historical read must not inherit a later pass's numbers
    val analyzed =
      if (version.isDefined &&
          !version.contains(log.currentVersion.getOrElse(-1L))) None
      else log.columnStatistics
    // CatalogColumnStat externalizes min/max in a TYPE-SPECIFIC
    // format (timestamps as micros strings, dates as days) — the
    // ANALYZE pass stored plain cast-to-string values, which only
    // round-trip for the plain numeric types; other columns carry
    // NDV/nulls/lengths without bounds (an absent bound is merely a
    // weaker estimate, a misparsed one fails the query)
    def plainNumeric(n: String): Boolean =
      leaf.schema.fields.find(_.name == n).map(_.dataType).exists {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType => true
        case _ => false
      }
    val colStats: Map[String, CatalogColumnStat] =
      analyzed.map(_.cols.collect {
        case (n, c) if leaf.schema.fieldNames.contains(n) =>
          n -> CatalogColumnStat(
            distinctCount = Some(BigInt(c.ndv)),
            min = c.min.filter(_ => plainNumeric(n)),
            max = c.max.filter(_ => plainNumeric(n)),
            nullCount = Some(BigInt(c.nulls)),
            avgLen = c.avgLen, maxLen = c.maxLen,
            histogram = c.histogram.filter(_.size >= 2).map { edges =>
              val nb = edges.size - 1
              val tsRows = analyzed.map(_.rows).getOrElse(rows)
              Histogram(math.max(0L, tsRows - c.nulls).toDouble / nb,
                Array.tabulate(nb)(j => HistogramBin(edges(j),
                  edges(j + 1), math.max(1L, c.ndv / nb))))
            })
      }).getOrElse(Map.empty)
    def synth(schema: org.apache.spark.sql.types.StructType,
              st: CatalogStatistics): CatalogTable = CatalogTable(
      identifier = TableIdentifier(
        s"graft_stats_${java.util.UUID.randomUUID().toString.take(8)}"),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = schema, stats = Some(st))
    // per-leaf PHYSICAL row counts off the manifest — each leg of a
    // DV/clone read scans a known file subset; a directory-discovery
    // leg (hive-partitioned) resolves no per-file entries and keeps
    // its real file sizes with no row count
    val adds = log.liveAdds(version)
    val rowsByPath: Map[String, Long] =
      adds.map(a => log.absLivePath(a) -> a.rows).toMap
    def leafRows(lr: LogicalRelation): Option[Long] = lr.relation match {
      case f: HadoopFsRelation =>
        val per = f.location.rootPaths.map(p =>
          rowsByPath.get(p.toString.stripPrefix("file:")))
        if (per.nonEmpty && per.forall(_.isDefined))
          Some(per.flatten.sum)
        else None
      case _ => None
    }
    // the DV-pairs leaves need a row count too: CBO join estimation
    // only propagates attribute stats when BOTH join sides carry
    // one — without it the anti-join falls back to size-only stats
    // and the data leaf's histogram dies at the join
    val dvRows = adds.flatMap(_.dv.map(_.rows)).sum
    val tableCt = synth(leaf.schema, CatalogStatistics(
      BigInt(math.max(1L, bytes)), Some(BigInt(rows)), colStats))
    sub.transform {
      case lr: LogicalRelation
          if !isDvLeaf(lr) && lr.catalogTable.isEmpty =>
        leafRows(lr) match {
          case Some(n) => lr.copy(catalogTable = Some(synth(lr.schema,
            CatalogStatistics(
              BigInt(math.max(1L, lr.relation.sizeInBytes)),
              Some(BigInt(n)),
              colStats.filter { case (c, _) =>
                lr.schema.fieldNames.contains(c) }))))
          case None if sub.collect {
              case x: LogicalRelation if !isDvLeaf(x) => x
            }.size == 1 =>
            // single data leaf whose paths didn't resolve (discovery
            // scan): the table-wide numbers still describe it exactly
            lr.copy(catalogTable = Some(tableCt))
          case None => lr
        }
      case lr: LogicalRelation if isDvLeaf(lr) && lr.catalogTable.isEmpty =>
        lr.copy(catalogTable = Some(synth(lr.schema, CatalogStatistics(
          BigInt(math.max(1L, lr.relation.sizeInBytes)),
          Some(BigInt(math.max(0L, dvRows))), Map.empty))))
    }
  }

  /** Idempotently hook the rule into a LIVE session. */
  def register(spark: SparkSession): Unit = {
    val exp = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraOptimizations.contains(GraftReadSubstitution))
        exp.extraOptimizations =
          exp.extraOptimizations :+ GraftReadSubstitution
    }
  }
}
