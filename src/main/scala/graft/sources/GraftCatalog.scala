package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-catalog names over graft's dimension sinks — the last
  * usability seam between "operators that take DataFrames/sink
  * objects" and the way the reference's users actually address their
  * tables: by NAME, through `spark.sql` (reference: notebooks/Load &
  * SCD-Merge.py:24 `MERGE INTO dim_customer`, Mini-ETL-Pipeline in
  * Databricks.py:55-66 — every statement names a catalog table).
  *
  * `register(name, sink)` binds a sink under a session-scoped name
  * and surfaces its CURRENT snapshot as a temp view, so any
  * `spark.table(name)` / `spark.sql("SELECT ... FROM name")` works
  * immediately. Commits routed through the catalog ([[sql]] /
  * [[SqlMerge.merge(spark,sql)*]] / [[commit]]) refresh the view, so
  * readers-by-name always resolve the latest committed version —
  * the manifest-swap atomicity of [[VersionedParquetSink]] carries
  * straight through (a view refresh re-reads the manifest; an
  * un-refreshed view keeps reading its pinned older snapshot, which
  * is exactly MVCC snapshot semantics, never partial state).
  *
  * Scale note: the catalog holds NAMES and sink handles (driver-side
  * metadata, O(#tables)), never data; the view body is a lazy scan of
  * the sink's current version directory, so all pushdown/pruning on
  * the underlying parquet still applies.
  */
object GraftCatalog {

  /** (session identity, lowercased name) → sink. Keyed per session so
    * two SparkSessions can bind the same name to different sinks,
    * matching temp-view scoping. */
  private val sinks = TrieMap.empty[(Int, String), DimSink]

  private def key(spark: SparkSession, name: String): (Int, String) =
    (System.identityHashCode(spark), name.toLowerCase(java.util.Locale.ROOT))

  /** Bind `name` to `sink` and publish its current snapshot as a temp
    * view (an empty sink registers the name; the view appears on the
    * first commit). */
  def register(spark: SparkSession, name: String, sink: DimSink): Unit = {
    sinks.put(key(spark, name), sink)
    refresh(spark, name)
  }

  /** The sink registered under `name`, if any. */
  def sinkFor(spark: SparkSession, name: String): Option[DimSink] =
    sinks.get(key(spark, name))

  /** Re-point the temp view at the sink's current snapshot (one
    * manifest read — cheap, metadata-only). */
  def refresh(spark: SparkSession, name: String): Unit =
    sinks.get(key(spark, name)).foreach { sink =>
      sink.load(spark).foreach(_.createOrReplaceTempView(name))
    }

  /** Drop the binding and its view. */
  def unregister(spark: SparkSession, name: String): Unit = {
    sinks.remove(key(spark, name))
    spark.catalog.dropTempView(name)
    ()
  }

  /** Commit a new snapshot to the named table and refresh its view —
    * the write half of the by-name surface. */
  def commit(spark: SparkSession, name: String, dim: DataFrame): Unit = {
    val sink = sinkFor(spark, name).getOrElse(
      throw new IllegalArgumentException(s"'$name' is not registered"))
    sink.overwrite(dim)
    refresh(spark, name)
  }

  /** The `spark.sql` front door: MERGE INTO statements are routed to
    * [[SqlMerge]] with the target resolved BY NAME from this catalog
    * (Spark itself rejects MERGE against a temp view — v1 relations
    * have no row-level-operation support); everything else passes
    * through to `spark.sql` unchanged, where SELECTs see the
    * registered views. Returns the merge's branch counters as a
    * one-row frame, mirroring Delta's MERGE metrics output. */
  def sql(spark: SparkSession, statement: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
    val isMerge =
      try spark.sessionState.sqlParser.parsePlan(statement)
        .isInstanceOf[MergeIntoTable]
      catch { case _: Throwable => false }
    if (isMerge) {
      val r = SqlMerge.merge(spark, statement)
      import spark.implicits._
      Seq((r.updated, r.deleted, r.inserted, r.unchanged))
        .toDF("num_updated_rows", "num_deleted_rows",
          "num_inserted_rows", "num_unchanged_rows")
    } else spark.sql(statement)
  }
}
