package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven per-table pipeline orchestration — the reference's
  * top-level loop (reference: notebooks/pipeline_core.py:274-296 and
  * the multi-table config map in notebooks/Mini-ETL-Pipeline in
  * Databricks.py), as pure functions over DataFrames.
  *
  * One `TableConfig` per dimension: where the data comes from, the
  * business key, the compared attributes, the recency ordering and
  * the SCD flavor. `runIncrement` is one bronze→silver→dim step:
  * ingest-tag → clean → latest-per-key → SCD merge. Everything
  * stays one declarative plan per table — no driver-side row counts
  * — so an orchestrator can run hundreds of table configs as
  * independent jobs.
  */
object Pipeline {

  /** Per-table pipeline configuration (the reference's config dict,
    * typed). `cleanCols` names the string columns to trim before
    * comparison (the reference trims every string compare column). */
  case class TableConfig(
      name: String,
      keyCols: Seq[String],
      attrCols: Seq[String],
      recencyCols: Seq[String],
      scdType: Int = 2,
      cleanCols: Seq[String] = Nil)

  /** Bronze step: tag a raw batch with ingest metadata. */
  def ingest(raw: DataFrame, source: String,
             batchTs: java.sql.Timestamp): DataFrame =
    Tables.withIngestMetadata(raw, source, batchTs)

  /** Silver step: trim configured string columns, keep the latest
    * row per business key by the recency ordering, project to
    * key + attrs (the reference's transform_dim). */
  def stage(raw: DataFrame, cfg: TableConfig): DataFrame =
    Scd.latestPerKey(
      Scd.cleanStrings(raw, cfg.cleanCols),
      cfg.keyCols, cfg.recencyCols.map(col))
      .select((cfg.keyCols ++ cfg.attrCols).map(col): _*)

  /** An empty SCD2-shaped dimension for a config (first run). */
  def emptyDim(spark: SparkSession, like: DataFrame,
               cfg: TableConfig): DataFrame = {
    val base = like.select((cfg.keyCols ++ cfg.attrCols).map(col): _*)
      .limit(0)
    base
      .withColumn("valid_from", lit(null).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
  }

  /** Gold step: merge a staged batch into the dimension — SCD1
    * last-writer-wins or SCD2 close-and-insert, per config. */
  def mergeInto(dim: DataFrame, staged: DataFrame, cfg: TableConfig,
                batchTs: java.sql.Timestamp): DataFrame = cfg.scdType match {
    case 1 => Scd.scd1Upsert(dim, staged, cfg.keyCols, cfg.attrCols)
    case 2 => Scd.scd2Merge(dim, staged, cfg.keyCols, cfg.attrCols, batchTs)
    case other => throw new IllegalArgumentException(
      s"table ${cfg.name}: unsupported scdType $other (1 or 2)")
  }

  /** One full bronze→silver→dim increment for one table. */
  def runIncrement(rawBatch: DataFrame, dim: DataFrame, cfg: TableConfig,
                   source: String,
                   batchTs: java.sql.Timestamp): DataFrame =
    mergeInto(dim, stage(ingest(rawBatch, source, batchTs), cfg),
      cfg, batchTs)

  /** Run a batch through every configured table (the reference's
    * for-loop over the config map); `batches` supplies each table's
    * raw input, `dims` the current dimension state (absent = first
    * run). Returns the new dimension per table. */
  def runAll(spark: SparkSession, configs: Seq[TableConfig],
             batches: Map[String, DataFrame],
             dims: Map[String, DataFrame],
             batchTs: java.sql.Timestamp): Map[String, DataFrame] =
    configs.map { cfg =>
      val raw = batches(cfg.name)
      val dim = dims.getOrElse(cfg.name, emptyDim(spark, raw, cfg))
      cfg.name -> runIncrement(raw, dim, cfg, s"batch:${cfg.name}", batchTs)
    }.toMap
}
