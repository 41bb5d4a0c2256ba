package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  InsertAction, InsertStarAction, MergeAction, MergeIntoTable, SubqueryAlias,
  UpdateAction, UpdateStarAction}
import org.apache.spark.sql.functions._

/** Executable ANSI `MERGE INTO` over graft's own dimension sinks —
  * the SQL surface the reference's users write (reference:
  * notebooks/Load & SCD-Merge.py:24-38, Mini-ETL-Pipeline in
  * Databricks.py:55-66) without requiring Delta/Iceberg jars.
  *
  * The statement is parsed by SPARK'S OWN grammar
  * (`sessionState.sqlParser.parsePlan` → `MergeIntoTable`) — no
  * hand-rolled SQL dialect — and executed as one declarative plan:
  * target FULL OUTER JOIN source on the merge condition, a branch
  * label chosen per row by the first action whose condition holds
  * (ANSI action-order semantics), every output column a CASE over the
  * branch, then one transactional commit through the [[DimSink]].
  * Against a [[VersionedParquetSink]] the commit is an atomic
  * manifest swap: readers never see partial merge state and the
  * pre-merge version stays time-travel-readable — the MVCC semantics
  * Delta's MERGE provides, over plain parquet.
  *
  * Scale: the plan is a single keyed equi-join shuffle (plus AQE skew
  * split) and a full-snapshot rewrite — copy-on-write, the same cost
  * model as Delta MERGE without deletion vectors. Supported actions:
  * WHEN MATCHED [AND c] THEN UPDATE SET .. or DELETE, WHEN NOT
  * MATCHED [AND c] THEN INSERT .., WHEN NOT MATCHED BY SOURCE
  * [AND c] THEN UPDATE SET .. or DELETE, plus the star forms of
  * UPDATE/INSERT — the full delete-quadrant surface (the MERGE
  * formulation of scd2_deletes).
  *
  * ANSI cardinality rule enforced: a target row matched by more than
  * one source row is an error, as in Delta/Iceberg/SQL:2003.
  */
object SqlMerge {

  /** Outcome counters: rows entering each branch of the merge. */
  final case class MergeResult(updated: Long, deleted: Long,
                               inserted: Long, unchanged: Long)

  private case class Parsed(targetName: String, targetAlias: String,
                            sourceName: String, sourceAlias: String,
                            condition: Column,
                            matched: Seq[MergeAction],
                            notMatched: Seq[MergeAction],
                            notMatchedBySource: Seq[MergeAction])

  private def nameAndAlias(plan: org.apache.spark.sql.catalyst.plans
      .logical.LogicalPlan): (String, String) = plan match {
    case SubqueryAlias(id, UnresolvedRelation(parts, _, _)) =>
      (parts.mkString("."), id.name)
    case UnresolvedRelation(parts, _, _) =>
      (parts.mkString("."), parts.last)
    case other => throw new IllegalArgumentException(
      s"MERGE target/source must be a plain table reference, got $other")
  }

  private def parse(spark: SparkSession, sql: String): Parsed = {
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case m: MergeIntoTable =>
        val (tn, ta) = nameAndAlias(m.targetTable)
        val (sn, sa) = nameAndAlias(m.sourceTable)
        Parsed(tn, ta, sn, sa, GraftColumnShim.column(m.mergeCondition),
          m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
      case other => throw new IllegalArgumentException(
        s"not a MERGE statement: ${other.getClass.getSimpleName}")
    }
  }

  private def actionCond(a: MergeAction): Column = a match {
    case UpdateAction(c, _, _) => c.map(GraftColumnShim.column).getOrElse(lit(true))
    case DeleteAction(c) => c.map(GraftColumnShim.column).getOrElse(lit(true))
    case InsertAction(c, _) => c.map(GraftColumnShim.column).getOrElse(lit(true))
    case _: UpdateStarAction => lit(true)
    case _: InsertStarAction => lit(true)
    case other => throw new IllegalArgumentException(s"unsupported $other")
  }

  /** Column-name → value map of an action's assignments; `None` for
    * DELETE. Star actions assign every target column from the
    * same-named source column. */
  private def assignments(a: MergeAction, targetCols: Seq[String],
                          sourceAlias: String): Option[Map[String, Column]] =
    a match {
      case UpdateAction(_, as, _) => Some(asMap(as))
      case InsertAction(_, as) => Some(asMap(as))
      case _: UpdateStarAction | _: InsertStarAction =>
        Some(targetCols.map(c => c -> col(s"$sourceAlias.$c")).toMap)
      case DeleteAction(_) => None
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }

  private def asMap(as: Seq[Assignment]): Map[String, Column] =
    as.map { case Assignment(k, v) =>
      val name = k match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          u.nameParts.last
        case other => throw new IllegalArgumentException(
          s"unsupported assignment key $other")
      }
      name -> GraftColumnShim.column(v)
    }.toMap

  /** The analyzed merge: everything both commit strategies
    * (copy-on-write [[merge]] and merge-on-read [[mergeMor]]) need. */
  private final case class Core(p: Parsed, target: DataFrame,
                                targetCols: Seq[String], labeled: DataFrame,
                                updates: Seq[Int], deletes: Seq[Int],
                                byIdx: Map[Int, Option[Map[String, Column]]]) {
    val tPresent: Column = col("__t_present").isNotNull
    val sPresent: Column = col("__s_present").isNotNull

    /** Post-merge rows projected to the target schema. */
    def next: DataFrame = {
      val keepExpr: Column = !col("__branch").isin(deletes :+ -2: _*)
      labeled.filter(keepExpr).select(outCols: _*)
    }

    /** Output columns: CASE over the branch per target column. */
    def outCols: Seq[Column] = targetCols.map { c =>
      val tField = target.schema(c)
      val base: Column = col(s"${p.targetAlias}.$c")
      val cased = byIdx.toSeq.sortBy(_._1).foldRight(base) {
        case ((i, Some(as)), acc) if as.contains(c) =>
          when(col("__branch") === i, as(c)).otherwise(acc)
        case ((i, Some(_)), acc) =>
          // column not assigned: UPDATE keeps target value, INSERT
          // fills NULL (ANSI) — distinguish by target presence
          when(col("__branch") === i && col("__t_present").isNull,
            lit(null)).otherwise(acc)
        case ((_, None), acc) => acc
      }
      cased.cast(tField.dataType).as(c)
    }

    /** ONE aggregate job over the labeled join: the ANSI cardinality
      * check (max source matches per target row, via the partial-agged
      * per-`__tid` level) and all four branch counters come out of the
      * same pass — the join is never materialized just to validate it.
      * Throws on a cardinality violation BEFORE anything commits. */
    def statsChecked(): MergeResult = {
      val isUpd = col("__branch").isin(updates.map(i => i: Any): _*)
      val isDel = col("__branch").isin(deletes.map(i => i: Any): _*)
      val perTid = labeled.groupBy(col("__tid")).agg(
        sum(when(tPresent && sPresent, 1L).otherwise(0L)).as("__nm"),
        sum(when(isUpd && tPresent, 1L).otherwise(0L)).as("__u"),
        sum(when(isDel, 1L).otherwise(0L)).as("__d"),
        sum(when(isUpd && !tPresent, 1L).otherwise(0L)).as("__i"),
        sum(when(col("__branch") === -1, 1L).otherwise(0L)).as("__k"))
      // the null-__tid group holds every insert row; all aggregates
      // are partial-agged so the "hot" null key never skews a reducer
      val r = perTid.agg(
        max(when(col("__tid").isNotNull, col("__nm"))).as("max_match"),
        sum(col("__u")).as("updated"), sum(col("__d")).as("deleted"),
        sum(col("__i")).as("inserted"), sum(col("__k")).as("unchanged"))
        .head()
      if (!r.isNullAt(0) && r.getLong(0) > 1L) throw new IllegalStateException(
        "MERGE cardinality violation: a target row matched by " +
          "multiple source rows (as in ANSI/Delta, this is an error)")
      def l(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
      MergeResult(l(1), l(2), l(3), l(4))
    }

    /** [[statsChecked]] fused with the touched-file aggregate: ONE
      * pass over the labeled join yields the ANSI cardinality check,
      * all four branch counters, AND the distinct set of target
      * files containing a changed row — mergeLog's first two join
      * executions become one. The per-`__tid` level additionally
      * carries the row's file (a target row lives in exactly one
      * file; null when the row is unchanged), and the second level
      * groups those per-tid rows BY FILE — same stage shape as
      * [[statsChecked]]'s global aggregate, so the fusion is pure
      * saving. The driver folds the per-file partials (exact long
      * sums/max — order-free) and reads the touched set off the
      * non-null file keys; collected rows are bounded by #touched
      * files + 1, the same driver profile as the old touched-file
      * collect. Throws on a cardinality violation BEFORE anything
      * is written, like [[statsChecked]]. */
    def statsAndTouched(fileCol: Column): (MergeResult, Set[String]) = {
      val isUpd = col("__branch").isin(updates.map(i => i: Any): _*)
      val isDel = col("__branch").isin(deletes.map(i => i: Any): _*)
      val perTid = labeled.groupBy(col("__tid")).agg(
        sum(when(tPresent && sPresent, 1L).otherwise(0L)).as("__nm"),
        sum(when(isUpd && tPresent, 1L).otherwise(0L)).as("__u"),
        sum(when(isDel, 1L).otherwise(0L)).as("__d"),
        sum(when(isUpd && !tPresent, 1L).otherwise(0L)).as("__i"),
        sum(when(col("__branch") === -1, 1L).otherwise(0L)).as("__k"),
        min(when(tPresent && (isUpd || isDel), fileCol)).as("__tf"))
      val rows = perTid.groupBy(col("__tf")).agg(
        max(when(col("__tid").isNotNull, col("__nm"))).as("max_match"),
        sum(col("__u")).as("updated"), sum(col("__d")).as("deleted"),
        sum(col("__i")).as("inserted"), sum(col("__k")).as("unchanged"))
        .collect()
      def l(r: org.apache.spark.sql.Row, n: String): Long = {
        val i = r.fieldIndex(n)
        if (r.isNullAt(i)) 0L else r.getLong(i)
      }
      if (rows.exists(r => l(r, "max_match") > 1L))
        throw new IllegalStateException(
          "MERGE cardinality violation: a target row matched by " +
            "multiple source rows (as in ANSI/Delta, this is an error)")
      val touched = rows.iterator.filter(!_.isNullAt(0))
        .map(_.getString(0)).toSet
      (MergeResult(rows.map(l(_, "updated")).sum,
        rows.map(l(_, "deleted")).sum,
        rows.map(l(_, "inserted")).sum,
        rows.map(l(_, "unchanged")).sum), touched)
    }
  }

  private def analyze(spark: SparkSession, mergeSql: String,
                      sink: DimSink): Core = {
    val p = parse(spark, mergeSql)
    val target = sink.load(spark).getOrElse(
      throw new IllegalArgumentException(
        s"MERGE target '${p.targetName}' has no current state — " +
          "seed the sink before merging"))
    analyzeFrame(spark, p, target, target.columns.toSeq)
  }

  /** Build the labeled-join [[Core]] for a target frame. `targetCols`
    * may be a subset of `target`'s columns — extra passthrough
    * columns (e.g. the log-merge `__file` lineage) ride along the
    * join without entering the output schema. */
  private def analyzeFrame(spark: SparkSession, p: Parsed,
                           target: DataFrame,
                           targetCols: Seq[String]): Core = {
    val source = spark.table(p.sourceName)

    // presence markers survive the full outer join where every data
    // column can legitimately be null
    val t = target.withColumn("__t_present", lit(true))
      .withColumn("__tid", monotonically_increasing_id())
      .alias(p.targetAlias)
    val s = source.withColumn("__s_present", lit(true)).alias(p.sourceAlias)
    val joined = t.join(s, p.condition, "full_outer")
    val tPresent = col("__t_present").isNotNull
    val sPresent = col("__s_present").isNotNull

    // branch label: first action (in statement order) whose clause
    // kind and condition hold; -1 = keep target row unchanged,
    // -2 = no-op insert miss (row vanishes)
    val actions: Seq[(Int, MergeAction, Column)] =
      (p.matched.map(a => (a, tPresent && sPresent && actionCond(a))) ++
        p.notMatched.map(a => (a, !tPresent && sPresent && actionCond(a))) ++
        p.notMatchedBySource.map(a => (a, tPresent && !sPresent &&
          actionCond(a)))).zipWithIndex.map { case ((a, c), i) =>
        (i, a, c)
      }
    val fallback = when(tPresent, lit(-1)).otherwise(lit(-2))
    val branch = actions.foldRight(fallback) { case ((i, _, c), acc) =>
      when(c, lit(i)).otherwise(acc)
    }
    val labeled = joined.withColumn("__branch", branch)

    val byIdx: Map[Int, Option[Map[String, Column]]] = actions.map {
      case (i, a, _) => i -> assignments(a, targetCols, p.sourceAlias)
    }.toMap
    // an assignment to a column the target doesn't have is a typo,
    // not a no-op — fail like Delta/ANSI instead of dropping it
    val unknown = byIdx.values.flatten.flatMap(_.keys)
      .filterNot(targetCols.contains).toSeq.distinct
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"MERGE assigns to column(s) not in the target: " +
        unknown.mkString(", "))
    val deletes = byIdx.collect { case (i, None) => i }.toSeq
    val updates = byIdx.collect { case (i, Some(_)) => i }.toSeq
    Core(p, target, targetCols, labeled, updates, deletes, byIdx)
  }

  /** Execute `mergeSql` against `sink` (the target table name in the
    * statement is informational — the sink IS the target). The source
    * must be a registered temp view or catalog name. Commits the
    * post-merge snapshot through the sink and returns branch counters.
    *
    * Two passes over the (unmaterialized) join, not three and no
    * persist: one combined aggregate (cardinality check + counters,
    * [[Core.statsChecked]]) and the output write itself. At a 100 TB
    * target, re-running the keyed join for the write costs two input
    * scans but never materializes a full joined copy of the table —
    * the previous persist WAS that extra full write. */
  def merge(spark: SparkSession, mergeSql: String,
            sink: DimSink): MergeResult = {
    val core = analyze(spark, mergeSql, sink)
    val stats = core.statsChecked()
    sink.overwrite(core.next)
    stats
  }

  /** Resolve the MERGE target from the statement's own table name via
    * [[GraftCatalog]] — the `spark.sql`-shaped surface (reference:
    * notebooks/Load & SCD-Merge.py:24-38 merges into a NAMED table).
    * Refreshes the registered view after the commit so a subsequent
    * `spark.table(name)` / `SELECT ... FROM name` sees the new
    * snapshot. */
  def merge(spark: SparkSession, mergeSql: String): MergeResult = {
    val p = parse(spark, mergeSql)
    val sink = GraftCatalog.sinkFor(spark, p.targetName).getOrElse(
      throw new IllegalArgumentException(
        s"MERGE target '${p.targetName}' is not a graft-registered " +
          "table — GraftCatalog.register it (or pass a DimSink)"))
    val r = merge(spark, mergeSql, sink)
    GraftCatalog.refresh(spark, p.targetName)
    r
  }

  /** Merge-on-read execution: instead of rewriting the full target
    * snapshot (copy-on-write [[merge]]), commit ONLY the delta — the
    * update/insert rows as an upsert patch and the deleted keys as a
    * delete patch — through [[MergeOnReadSink.commitPatch]]. Write
    * cost is ∝ the merge's change set, not the table (Delta's
    * deletion-vector / MoR trade: cheap frequent merges, a read-side
    * apply, compaction folds patches back into a full snapshot). The
    * updated keys double as delete keys so the reader's anti-join
    * drops the superseded base rows. */
  def mergeMor(spark: SparkSession, mergeSql: String,
               sink: MergeOnReadSink): MergeResult = {
    val core = analyze(spark, mergeSql, sink)
    val stats = core.statsChecked()
    val isChange = col("__branch")
      .isin(core.updates.map(i => i: Any): _*)
    val isDelete = col("__branch")
      .isin(core.deletes.map(i => i: Any): _*)
    val upserts = core.labeled.filter(isChange).select(core.outCols: _*)
    // deleted OR updated existing rows vanish from the base on read;
    // keys come from the TARGET side (present for both branches)
    val gone = core.labeled
      .filter((isDelete || (isChange && core.tPresent)))
      .select(sink.keyCols.map(k =>
        col(s"${core.p.targetAlias}.$k").as(k)): _*)
    sink.commitPatch(upserts, gone)
    stats
  }

  /** File-granularity MERGE into a [[LogTable]] — Delta's actual
    * merge-on-write algorithm: capture each target row's source FILE
    * at scan time (`input_file_name`), run the same labeled join,
    * then rewrite ONLY the files that contain a row some action
    * changed (update/delete, matched or not-matched-by-source) plus
    * one new file set for the inserts; every untouched file carries
    * into the new version by reference. Write cost ∝ touched data +
    * inserts, never the table — between copy-on-write [[merge]]
    * (rewrite everything) and [[mergeMor]] (rewrite nothing, pay at
    * read) this is the pay-once-proportionally point Delta ships.
    *
    * Two passes over the (never-materialized) join before the change
    * feed: ONE fused aggregate (cardinality check + branch counters +
    * touched-file set, [[Core.statsAndTouched]] — it early-outs the
    * no-op merge) and the rewrite itself. The touched-file set is
    * collected to the driver (bounded by #touched files,
    * metadata-scale) and pushed back as an `IN` filter. */
  def mergeLog(spark: SparkSession, mergeSql: String,
               log: LogTable): MergeResult =
    mergeLog(spark, mergeSql, log, txn = None)

  /** [[mergeLog]] with an idempotent-txn tag on the merge commit
    * (Delta's txnAppId/txnVersion riding a MERGE): the
    * exactly-once primitive [[MaterializedAgg]]'s refresh uses —
    * a crashed-and-replayed refresh whose merge already committed
    * is dropped by the commit layer, not double-applied.
    *
    * Identity-allocating merges (an insert pass on a table with
    * `GENERATED ALWAYS AS IDENTITY`) retry the WHOLE merge on an
    * allocation race, like identity appends: the staged insert rows
    * hold ids drawn from a stale high-water mark and must be
    * re-planned (Delta's transaction-retry rule). */
  def mergeLog(spark: SparkSession, mergeSql: String, log: LogTable,
               txn: Option[(String, Long)]): MergeResult = {
    var attempts = 0
    while (true) {
      attempts += 1
      try return mergeLogOnce(spark, mergeSql, log, txn)
      catch {
        case _: IdentityAllocationConflict
          if attempts < 20 => () // reallocate against the new head
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def mergeLogOnce(spark: SparkSession, mergeSql: String,
                           log: LogTable,
                           txn: Option[(String, Long)]): MergeResult = {
    val p = parse(spark, mergeSql)
    // GENERATED ALWAYS AS IDENTITY: no merge action may mint or
    // rewrite identity values EXPLICITLY — an explicit assignment
    // breaks the uniqueness promise (Delta refuses the same way).
    // An insert that OMITS the identity column allocates, like an
    // append: the insert rows stage once with values drawn from the
    // commit-basis high-water mark, the change feed reads the staged
    // files back (so both passes serve the SAME ids), and the commit
    // advances the mark under the allocation-race check — a racing
    // writer advancing it first re-plans this merge.
    val idSpecs = log.identityColumns
    val idCols = idSpecs.keySet
    if (idCols.nonEmpty) {
      def assigned(a: MergeAction): Set[String] = a match {
        case UpdateAction(_, as, _) => asMap(as).keySet
        case InsertAction(_, as) => asMap(as).keySet
        case _: UpdateStarAction | _: InsertStarAction => idCols
        case _ => Set.empty
      }
      (p.matched ++ p.notMatchedBySource).foreach { a =>
        val hit = assigned(a).intersect(idCols)
        require(hit.isEmpty,
          s"cannot UPDATE identity column(s) ${hit.mkString(", ")} — " +
            "GENERATED ALWAYS AS IDENTITY values are table-managed")
      }
      p.notMatched.foreach {
        case a: InsertAction =>
          val hit = asMap(a.assignments).keySet.intersect(idCols)
          require(hit.isEmpty,
            s"cannot INSERT explicit value(s) for identity " +
              s"column(s) ${hit.mkString(", ")} — GENERATED ALWAYS " +
              "AS IDENTITY values are table-managed; omit them and " +
              "the merge allocates from the high-water mark")
        case _: InsertStarAction =>
          throw new IllegalArgumentException(
            s"INSERT * into a table with identity column(s) " +
              s"${idCols.mkString(", ")} assigns them explicitly — " +
              "list the insert columns and omit the identity column")
        case other => throw new IllegalArgumentException(
          s"unsupported $other")
      }
    }
    val readVersion = log.currentVersion
    // scan-time file provenance (NOT input_file_name, which goes
    // empty after an exchange — and a deletion-vectored snapshot's
    // read plan contains an anti-join), deletion vectors subtracted.
    // Row-tracked targets read WITH their effective ids, so the
    // rewrite below can carry each surviving/updated row's identity
    // into the new files (merge-inserted rows id fresh at commit).
    val tracked = log.rowTrackingEnabled()
    val target =
      if (tracked) log.loadWithFileAndRowIds(spark)
      else log.loadWithFileColumn(spark)
    val snapCols = target.columns.toSeq.filterNot(c =>
      c == "__file" || c == LogTable.RowIdPhysCol)
    val core = analyzeFrame(spark, p, target, snapCols)
    // one fused pass: counters + cardinality check + touched files
    // (was two full executions of the labeled join)
    val (stats, touchedNames) =
      core.statsAndTouched(col(s"${p.targetAlias}.__file"))
    // __file carries the scan-time file-path URI; normalize both
    // sides to absolute paths for the attribution (clone snapshots
    // mix data roots, so bare names could collide across roots)
    val touchedPaths = touchedNames.map(LogTable.provPath)
    val touched = log.liveAdds().filter(a =>
      touchedPaths.contains(log.absLivePath(a)))

    if (touchedNames.isEmpty && stats.inserted == 0L) return stats

    // rewritten rows of the touched files (updates applied, deletes
    // dropped, unchanged neighbors byte-equivalent) + the insert rows
    val keep = !col("__branch").isin(core.deletes :+ -2: _*)
    val inTouched = col(s"${p.targetAlias}.__file")
      .isin(touchedNames.toSeq: _*)
    val outSel =
      if (!tracked) core.outCols
      else core.outCols :+
        when(core.tPresent,
          col(s"${p.targetAlias}.${LogTable.RowIdPhysCol}"))
          .as(LogTable.RowIdPhysCol)
    val staged = log.newStagingDir()
    // identity-allocating merge: the INSERT rows stage to their own
    // directory with ids filled (base + step × monotonic id, the
    // append allocator), get READ BACK for the change feed below —
    // re-executing the join there would draw different ids for the
    // same logical row — and then move into the main staging for one
    // atomic commit. Non-identity merges keep the single-write path.
    val allocates = idCols.nonEmpty && stats.inserted > 0L
    val insStaged: Option[String] =
      if (!allocates) {
        core.labeled
          .filter(((core.tPresent && inTouched) || !core.tPresent) && keep)
          .select(outSel: _*)
          .write.mode("overwrite").parquet(staged)
        None
      } else {
        core.labeled.filter(core.tPresent && inTouched && keep)
          .select(outSel: _*)
          .write.mode("overwrite").parquet(staged)
        val insSel: Seq[Column] = snapCols.zip(core.outCols).map {
          case (c, o) => idSpecs.get(c) match {
            case Some(spec) =>
              val base =
                spec.highWater.map(_ + spec.step).getOrElse(spec.start)
              (lit(base) +
                lit(spec.step) * monotonically_increasing_id())
                .cast(core.target.schema(c).dataType).as(c)
            case None => o
          }
        } ++ (if (!tracked) Seq.empty
              else Seq(lit(null).cast("long").as(LogTable.RowIdPhysCol)))
        val dir = log.newStagingDir()
        core.labeled.filter(!core.tPresent && keep)
          .select(insSel: _*)
          .write.mode("overwrite").parquet(dir)
        Some(dir)
      }

    // change feed: pre-images of updated/deleted target rows,
    // post-images of updates, the insert rows — Delta's merge CDF
    // shape. ONE more execution of the (never-materialized) join:
    // each joined row emits its 0-2 change images as an array of
    // structs and explodes, where the old union-of-three-filters
    // shape re-executed the join (and the merge SOURCE pipeline
    // under it) once per branch — three scans of the target per CDF
    // write at a 100 TB target, now one
    val isUpd = col("__branch").isin(core.updates.map(i => i: Any): _*)
    val isDel = col("__branch").isin(core.deletes.map(i => i: Any): _*)
    val targetImage = snapCols.map(c =>
      col(s"${p.targetAlias}.$c").as(c))
    val preStruct = struct(targetImage :+
      when(isDel, lit("delete")).otherwise(lit("update_preimage"))
        .as("_change_type"): _*)
    val postStruct = struct(
      core.outCols :+ lit("update_postimage").as("_change_type"): _*)
    val insStruct = struct(
      core.outCols :+ lit("insert").as("_change_type"): _*)
    // allocated-identity inserts come from the staged files (the
    // SAME ids the commit publishes); everything else rides the
    // fused pass's insert branch
    val contributes = (core.tPresent && (isUpd || isDel)) ||
      (lit(!allocates) && !core.tPresent && keep)
    val fused = core.labeled.filter(contributes)
      .select(explode(
        when(core.tPresent && isUpd, array(preStruct, postStruct))
          .when(core.tPresent && isDel, array(preStruct))
          .otherwise(array(insStruct))).as("__c"))
      .select(col("__c.*"))
    val cdf = insStaged match {
      case Some(dir) =>
        fused.unionByName(spark.read.parquet(dir)
          .drop(LogTable.RowIdPhysCol)
          .withColumn("_change_type", lit("insert")))
      case None => fused
    }
    val cdfRel = s"_cdf/${java.util.UUID.randomUUID()}"
    cdf.write.mode("overwrite").parquet(s"${log.path}/$cdfRel")

    // fold the insert staging into the main one for a single commit
    insStaged.foreach { dir =>
      val d = new java.io.File(dir)
      Option(d.listFiles()).toSeq.flatten
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("."))
        .foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(staged, s"ins-${f.getName}").toPath)
        }
      Option(d.listFiles()).toSeq.flatten.foreach(_.delete())
      d.delete()
    }

    try log.commitStagedRewrite(spark, staged, touched.map(_.path),
      op = "merge", readVersion = readVersion, cdfDir = Some(cdfRel),
      txn = txn,
      identityUpdate = if (allocates) idSpecs else Map.empty,
      identityBasis =
        if (allocates)
          Some(idSpecs.map { case (c, s) => c -> s.highWater })
        else None)
    catch { case e: Throwable =>
      // the attempt's change-feed directory is a dead orphan once
      // the commit refuses (identity-race re-plans and true
      // conflicts both) — reclaim it rather than waiting out
      // vacuum's retention horizon; the staged data files are
      // reclaimed by the commit layer itself
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(s"${log.path}/$cdfRel"))
      throw e
    }
    stats
  }

  /** Resolve a log-table MERGE target from the statement's own
    * `catalog.table` name via the [[GraftTableCatalog]] warehouse
    * config — `MERGE INTO cat.t USING src ON ...` with no handles
    * passed. */
  def mergeLog(spark: SparkSession, mergeSql: String): MergeResult = {
    val p = parse(spark, mergeSql)
    val parts = p.targetName.split('.')
    require(parts.length >= 2,
      s"MERGE INTO a log table needs a catalog-qualified name " +
        s"(cat.table), got '${p.targetName}'")
    val wh = spark.conf.getOption(
      s"spark.sql.catalog.${parts.head}.warehouse").getOrElse(
      throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured GraftTableCatalog"))
    mergeLog(spark, mergeSql,
      new LogTable((wh +: parts.tail.toSeq).mkString("/")))
  }

  /** In-memory convenience for tests and pipelines that hold the
    * dimension as a frame: returns the post-merge state instead of
    * committing to a sink. */
  def mergeFrames(spark: SparkSession, mergeSql: String,
                  target: DataFrame): DataFrame = {
    val sink = new DimSink {
      var out: DataFrame = _
      override def load(s: SparkSession): Option[DataFrame] = Some(target)
      override def overwrite(dim: DataFrame): Unit = {
        out = dim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        ()
      }
    }
    merge(spark, mergeSql, sink)
    sink.out
  }
}
