package graft.sources

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained materialized aggregate over a
  * [[LogTable]] — the materialized-view maintenance surface
  * (reference capability: the notebooks recompute gold aggregates
  * from scratch each run, notebooks/pipeline_core.py:274-296; Delta
  * ships the same idea as materialized views refreshed from the
  * change data feed).
  *
  * The view is `SELECT keys, COUNT(*), COUNT(v), SUM(v) GROUP BY
  * keys` over a base log table, persisted as its OWN log table whose
  * definition rides the base's TBLPROPERTIES machinery
  * (`graft.mv.*` keys) and whose refresh state rides the
  * idempotent-txn commit tag. [[refresh]] reads ONLY the base's
  * change feed since the last refreshed version and MERGEs the
  * signed per-key delta into the view — cost ∝ |changes| + the view
  * files holding touched keys, never ∝ the base table. At 100 TB
  * with a daily 0.1% delta that is the difference between a 100 GB
  * refresh and a 100 TB recompute.
  *
  * Maintenance algebra: every change-feed row carries weight +1
  * (`insert` / `update_postimage`) or −1 (`delete` /
  * `update_preimage`); counts fold by summed weight and sums by
  * weight-signed DECIMAL(38,4) folds, so the refreshed state is
  * BIT-IDENTICAL to a from-scratch group-by under any partitioning
  * and any batching (the `agg_maintain` policy, lifted to tables).
  * Keys whose count reaches zero are deleted. Only the
  * distributive/algebraic aggregate class (count/sum, and avg =
  * sum/count) maintains under deletes; min/max would need a
  * re-scan of the affected group and are deliberately out.
  *
  * Exactly-once: the seed append and every refresh commit are
  * tagged `(graft-mv-refresh, baseVersion)`, so a crashed and
  * replayed refresh deduplicates at the commit layer instead of
  * double-applying its delta; a refresh window containing a commit
  * the feed cannot represent row-wise (RESTORE) falls back to a
  * full rebuild committed under the same tag. */
object MaterializedAgg {

  /** Idempotent-txn app id of the refresh stream. */
  val App = "graft-mv-refresh"

  val PropBase   = "graft.mv.base"
  val PropKeys   = "graft.mv.keys"
  val PropValue  = "graft.mv.value"
  val PropMinMax = "graft.mv.minmax"

  /** `full` = seed or rebuild, `incremental` = CDF merge, `noop` =
    * already refreshed through the base head. */
  final case class RefreshStats(mvVersion: Long, fromVersion: Long,
                                toVersion: Long, mode: String)

  private val SumType  = DecimalType(38, 4)
  private val CastType = "decimal(28,4)"

  /** Full aggregate state of `df`: (count, non-null count, decimal
    * sum) per key — the same fold [[refresh]] applies incrementally,
    * so the two paths agree bitwise. `sum0` stores 0 (not null) for
    * all-null groups; [[read]] reconstructs SQL null from `cntx`. */
  private def fullState(df: DataFrame, keys: Seq[String],
                        value: String,
                        minMax: Boolean = false): DataFrame = {
    val core = Seq(
      count(lit(1)).as("cnt"),
      count(col(value)).as("cntx"),
      coalesce(sum(col(value).cast(CastType)).cast(SumType),
        lit(0).cast(SumType)).as("sum0"))
    val mm = if (minMax)
      Seq(min(col(value)).as("min0"), max(col(value)).as("max0"))
    else Seq.empty
    df.groupBy(keys.map(col): _*).agg(core.head, (core.tail ++ mm): _*)
  }

  /** Create the view table at `mvPath` and seed it with the full
    * aggregate of the base's CURRENT snapshot, recording "refreshed
    * through base version N" on the seed commit. A crash between
    * create and seed leaves a view with no txn tag, which
    * [[refresh]] repairs with a full rebuild. */
  def create(spark: SparkSession, basePath: String, mvPath: String,
             keys: Seq[String], valueCol: String,
             withMinMax: Boolean = false): Long = {
    require(keys.nonEmpty, "materialized aggregate needs group keys")
    // the definition round-trips through TBLPROPERTIES (keys as a
    // JSON array — any column name encodes losslessly, r9 advice)
    // and MERGE SQL (backtick-quoted) — only a backtick in a name
    // would corrupt the quoting layer, so only that refuses
    (keys :+ valueCol).foreach(c =>
      require(!c.contains("`"),
        s"column name '$c' contains '`' — unsupported in a " +
          "materialized-aggregate definition"))
    val base = new LogTable(basePath)
    val baseV = base.currentVersion.getOrElse(
      throw new IllegalStateException(s"no base log table at $basePath"))
    val baseSchema = base.schemaAt(baseV)
    (keys :+ valueCol).foreach(c =>
      require(baseSchema.fieldNames.contains(c),
        s"base table has no column '$c'"))
    require(!keys.contains(valueCol),
      s"value column '$valueCol' cannot also be a key")
    val valueType = baseSchema.fields.find(_.name == valueCol).get.dataType
    val mv = new LogTable(mvPath)
    val mvSchema = StructType(
      keys.map(k => baseSchema.fields.find(_.name == k).get
        .copy(nullable = true)).toArray ++
        Array(StructField("cnt", LongType), StructField("cntx", LongType),
          StructField("sum0", SumType)) ++
        (if (withMinMax)
          Array(StructField("min0", valueType), StructField("max0", valueType))
         else Array.empty[StructField]))
    mv.create(mvSchema, properties = Map(
      PropBase -> new java.io.File(basePath).getAbsolutePath,
      PropKeys -> org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          org.json4s.JArray(keys.toList.map(org.json4s.JString(_))))),
      PropValue -> valueCol) ++
      (if (withMinMax) Map(PropMinMax -> "true") else Map.empty))
    mv.appendStreamBatch(
      fullState(base.load(spark, Some(baseV)), keys, valueCol, withMinMax),
      App, baseV)
    mv.currentVersion.get
  }

  private def defOf(mv: LogTable)
      : (String, Seq[String], String, Boolean) = {
    val props = mv.tableProperties
    def need(k: String): String = props.getOrElse(k,
      throw new IllegalArgumentException(
        s"${mv.path} is not a materialized aggregate (no $k property)"))
    // keys: JSON array since round 10 (lossless for any column
    // name); pre-r10 views carry the comma-joined form — still read
    val rawKeys = need(PropKeys)
    val keys =
      if (rawKeys.startsWith("["))
        org.json4s.jackson.JsonMethods.parse(rawKeys) match {
          case org.json4s.JArray(a) =>
            a.collect { case org.json4s.JString(s) => s }
          case other => throw new IllegalArgumentException(
            s"bad $PropKeys property: $other")
        }
      else rawKeys.split(",").toSeq
    (need(PropBase), keys, need(PropValue),
      props.get(PropMinMax).contains("true"))
  }

  /** Advance the view to the base's current head. Incremental when
    * every commit in the window is change-feed-representable; a
    * RESTORE in the window (row rewind without row-level deltas)
    * forces a full rebuild. Calling with nothing new is a no-op
    * (no commit). */
  def refresh(spark: SparkSession, mvPath: String): RefreshStats = {
    val mv = new LogTable(mvPath)
    val (basePath, keys, valueCol, withMM) = defOf(mv)
    val base = new LogTable(basePath)
    val baseV = base.currentVersion.getOrElse(
      throw new IllegalStateException(s"no base log table at $basePath"))
    val last = mv.lastCommittedBatch(App)
    if (last.exists(_ >= baseV))
      return RefreshStats(mv.currentVersion.get, last.get, baseV, "noop")

    val representable = last.exists(l =>
      base.versions.filter(v => v > l && v <= baseV)
        .forall(v => base.commitOp(v) != "restore"))
    if (!representable) {
      mv.overwrite(
        fullState(base.load(spark, Some(baseV)), keys, valueCol, withMM),
        txn = Some((App, baseV)))
      return RefreshStats(mv.currentVersion.get,
        last.getOrElse(-1L), baseV, "full")
    }
    if (withMM)
      return refreshRescan(spark, mv, base, baseV, last.get, keys,
        valueCol)

    val ch = base.changes(spark, last.get, baseV)
    val w = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val vdec = coalesce(col(valueCol).cast(CastType),
      lit(0).cast(CastType))
    val zero = lit(0).cast(SumType)
    val delta = ch.groupBy(keys.map(col): _*).agg(
      sum(w).as("cnt_d"),
      sum(when(col(valueCol).isNotNull, w).otherwise(lit(0L)))
        .as("cntx_d"),
      coalesce(sum(when(w > 0, vdec).otherwise(-vdec)).cast(SumType), zero)
        .as("sum_d"))
      // zero-effect keys (a row added and removed inside the window)
      // would only rewrite view files for nothing — drop them
      .filter(col("cnt_d") =!= 0L || col("cntx_d") =!= 0L ||
        col("sum_d") =!= zero)

    val view = s"mv_delta_${UUID.randomUUID().toString.take(8)}"
    // NOT persisted: the merge re-executes its join once per pass
    // (stats, touched files, rewrite, CDF), recomputing the
    // change-feed aggregate each time — but measured median-of-5,
    // caching the delta is reliably SLOWER here (8.6 vs 6.9 s at
    // sf0.1): the InMemoryRelation denies the planner its join
    // strategy and the recompute is cheap relative to the barrier
    delta.createOrReplaceTempView(view)
    try {
      // null-safe key equality: a NULL group key is a real group in
      // the aggregate, and plain `=` would never match it
      val on = keys.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
      val cols = (keys ++ Seq("cnt", "cntx", "sum0"))
        .map(c => s"`$c`").mkString(", ")
      val vals = (keys.map(k => s"s.`$k`") ++
        Seq("s.cnt_d", "s.cntx_d", "s.sum_d")).mkString(", ")
      SqlMerge.mergeLog(spark,
        s"""MERGE INTO mv_state t USING $view s ON $on
           WHEN MATCHED AND t.cnt + s.cnt_d <= 0 THEN DELETE
           WHEN MATCHED THEN UPDATE SET cnt = t.cnt + s.cnt_d,
             cntx = t.cntx + s.cntx_d, sum0 = t.sum0 + s.sum_d
           WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)""",
        mv, txn = Some((App, baseV)))
    } finally {
      spark.catalog.dropTempView(view)
      ()
    }
    // an all-no-op delta makes the MERGE commit nothing — record the
    // advanced watermark with a metadata-only txn marker so the next
    // refresh does not re-read this window
    if (!mv.lastCommittedBatch(App).contains(baseV))
      mv.commitTxnMarker(App, baseV)
    RefreshStats(mv.currentVersion.get, last.get, baseV, "incremental")
  }

  /** MIN/MAX maintenance — Delta's recipe for the non-associative
    * aggregate class: a delete can RAISE a group's min or LOWER its
    * max, which no signed fold can reproduce, so the change feed is
    * used only to NAME the touched groups and each one re-aggregates
    * from a group-scoped base scan (a broadcast semi-join pushes the
    * refresh-window-sized key set into the scan). Cost ∝ the touched
    * groups' base data, never the table; every aggregate (cnt/sum
    * included) comes off the same scan, so the refreshed rows are
    * BIT-EQUAL to a from-scratch rebuild by construction. Groups
    * whose rows all vanished surface as a NULL-cnt left-join row and
    * DELETE. */
  private def refreshRescan(spark: SparkSession, mv: LogTable,
                            base: LogTable, baseV: Long, last: Long,
                            keys: Seq[String], valueCol: String)
      : RefreshStats = {
    val ch = base.changes(spark, last, baseV)
    val tkeys = keys.map(k => s"__t_$k")
    val touched = ch.select(keys.zip(tkeys).map {
      case (k, a) => col(k).as(a) }: _*).distinct()
    val baseDf = base.load(spark, Some(baseV))
    val scoped = baseDf.join(broadcast(touched),
      keys.zip(tkeys).map { case (k, a) =>
        baseDf(k) <=> touched(a) }.reduce(_ && _), "leftsemi")
    val state = fullState(scoped, keys, valueCol, minMax = true)
    val src = touched.join(state,
      keys.zip(tkeys).map { case (k, a) =>
        state(k) <=> touched(a) }.reduce(_ && _), "left")
      .select(keys.zip(tkeys).map { case (k, a) =>
        touched(a).as(k) } ++ Seq(state("cnt"), state("cntx"),
        state("sum0"), state("min0"), state("max0")): _*)
    val view = s"mv_rescan_${UUID.randomUUID().toString.take(8)}"
    // PERSIST here, unlike the signed-fold path (whose delta is one
    // cheap CDF aggregate and measured faster re-executed): this
    // source embeds a BASE TABLE scan + aggregation, and the merge
    // re-executes its source once per pass (stats, rewrite, CDF) —
    // caching the O(touched groups) state buys back two full scans.
    // MEMORY_AND_DISK: the state spills, never OOMs, at any scale.
    val cached = src.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count() // materialize before the merge's first pass
    cached.createOrReplaceTempView(view)
    try {
      val on = keys.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
      val stateCols = Seq("cnt", "cntx", "sum0", "min0", "max0")
      val cols = (keys ++ stateCols).map(c => s"`$c`").mkString(", ")
      val vals = (keys ++ stateCols).map(c => s"s.`$c`").mkString(", ")
      val sets = stateCols.map(c => s"`$c` = s.`$c`").mkString(", ")
      SqlMerge.mergeLog(spark,
        s"""MERGE INTO mv_state t USING $view s ON $on
           WHEN MATCHED AND s.cnt IS NULL THEN DELETE
           WHEN MATCHED THEN UPDATE SET $sets
           WHEN NOT MATCHED AND s.cnt IS NOT NULL THEN
             INSERT ($cols) VALUES ($vals)""",
        mv, txn = Some((App, baseV)))
    } finally {
      spark.catalog.dropTempView(view)
      cached.unpersist()
      ()
    }
    if (!mv.lastCommittedBatch(App).contains(baseV))
      mv.commitTxnMarker(App, baseV)
    RefreshStats(mv.currentVersion.get, last, baseV, "rescan")
  }

  /** The view with SQL aggregate semantics restored: `cnt` =
    * COUNT(*), `sum_v` = SUM(value) (NULL for all-null groups, like
    * the SQL aggregate it materializes); `min_v`/`max_v` when the
    * view was created `withMinMax` (already NULL for all-null
    * groups, like the SQL aggregates). */
  def read(spark: SparkSession, mvPath: String): DataFrame = {
    val mv = new LogTable(mvPath)
    val (_, keys, _, withMM) = defOf(mv)
    val mm = if (withMM)
      Seq(col("min0").as("min_v"), col("max0").as("max_v"))
    else Seq.empty
    mv.load(spark).select(keys.map(col) ++ Seq(col("cnt"),
      when(col("cntx") === 0L, lit(null).cast(SumType))
        .otherwise(col("sum0")).as("sum_v")) ++ mm: _*)
  }
}
