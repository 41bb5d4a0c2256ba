package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-checked readers for the lakehouse tables.
  *
  * Mirrors the reference's raw-layer loaders
  * (reference: notebooks/pipeline_core.py:50-77 `load_raw`) but
  * Spark-first: parquet scans stay declarative so Catalyst pushes
  * filters/column pruning into the scan; CSV ingest is option-driven
  * like the reference's config map
  * (reference: notebooks/Mini-ETL-Pipeline in Databricks.py defaults).
  */
object Tables {
  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory.
    *
    * Parquet TIMESTAMP(NANOS) (the events table) is unsupported by
    * Spark's reader; read it as raw long nanos and convert to a
    * micros timestamp (floor division — the same truncation DuckDB
    * applies when reading nanos into its micros timestamps).
    */
  /** Expected column sets per table — `load` fails fast with a
    * schema-drift message instead of letting a renamed column surface
    * as an unresolved-attribute error twelve operators later. */
  private val expectedCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    expectedCols.get(name).foreach { want =>
      val missing = want.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"table '$name' at $sfDir is missing expected columns " +
          s"${missing.mkString(", ")} (found: ${df.columns.mkString(", ")})")
    }
    // events fixtures have shipped `ts` as nanos-as-long (parquet
    // timestamp[ns] under the nanosAsLong flag), timestamp[us] (reads
    // as TIMESTAMP_NTZ), or a session-zoned timestamp; every operator
    // downstream sees one type — TIMESTAMP, micros precision (session
    // tz is UTC throughout, so the NTZ cast is wall-clock-identity)
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    } else df
  }

  /** Register all tables as temp views (for spark.sql use). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tpch.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Ingest metadata, as the reference's `with_ingest_metadata`
    * (reference: notebooks/pipeline_core.py:33-44) — but with an
    * injectable batch timestamp so pipelines are replayable /
    * deterministic; wall-clock defaults live at the call site, not
    * inside the operator.
    */
  def withIngestMetadata(df: DataFrame, source: String,
                         batchTs: java.sql.Timestamp): DataFrame =
    df.withColumn("ingest_ts", lit(batchTs))
      .withColumn("ingest_source", lit(source))

  /** Option-driven CSV reader, covering the reference's full
    * per-file defaults map (reference: notebooks/Mini-ETL-Pipeline
    * in Databricks.py:6-14 — delimiter, header, encoding, AND
    * `quoting=QUOTE_NONE`, `line_terminator='\r\n'`, `locale`):
    *
    *  - `quoting = false` disables quote handling entirely
    *    (QUOTE_NONE): quote characters pass through as data;
    *  - `\r\n` / `\r` / `\n` line endings are all covered by the
    *    parser's default; `lineSep` pins an explicit single-char
    *    separator for exotic files (the underlying parser caps
    *    read-side separators at one character);
    *  - `mode` is the malformed-row policy: PERMISSIVE (null-fill),
    *    DROPMALFORMED, or FAILFAST;
    *  - `locale` drives date/timestamp/decimal parsing (de-DE etc.);
    *  - `encoding` accepts Spark 4's default charset allowlist
    *    (utf-8/16/32, iso-8859-1, us-ascii); the wider JVM charset
    *    set (cp1252, …) is gated behind
    *    `spark.sql.legacy.javaCharsets=true`;
    *  - an explicit `schema` skips inference's second pass over the
    *    data — at scale always pass one.
    */
  def readCsv(spark: SparkSession, path: String,
              delimiter: String = ",", header: Boolean = true,
              encoding: String = "UTF-8", quote: String = "\"",
              inferSchema: Boolean = true,
              quoting: Boolean = true,
              lineSep: Option[String] = None,
              mode: String = "PERMISSIVE",
              nullValue: String = "",
              locale: String = "en-US",
              schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val r = spark.read
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("encoding", encoding)
      // an empty quote value disables quote handling (QUOTE_NONE)
      .option("quote", if (quoting) quote else "")
      .option("mode", mode)
      .option("nullValue", nullValue)
      .option("locale", locale)
      .option("inferSchema", (inferSchema && schema.isEmpty).toString)
    val r2 = lineSep.fold(r)(ls => r.option("lineSep", ls))
    schema.fold(r2)(s => r2.schema(s)).csv(path)
  }

  /** Write a table bucketed (and sorted) by join/aggregation keys.
    *
    * Bucketing is THE storage-layout lever for repeated big joins at
    * scale: two tables bucketed by the same keys into the same
    * bucket count join with zero exchange — the shuffle is paid once
    * at write time instead of per query. Bucket counts should be
    * sized so one bucket of the big table fits an executor core
    * (hundreds to thousands at 100 TB, not 16).
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    buckets: Int, keys: Seq[String]): Unit =
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(name)

  /** Write a table hive-partitioned by low-cardinality columns, so
    * partition pruning turns predicate queries into partial scans
    * (PartitionFilters in the physical plan, not data filters). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Option-driven JSON-lines reader — the other ubiquitous
    * training-data interchange format. Pass an explicit schema at
    * scale (schema inference reads the data twice); `multiLine`
    * stays false so files split by line across executors. */
  def readJsonl(spark: SparkSession, path: String,
                schema: Option[org.apache.spark.sql.types.StructType] = None,
                timeZone: String = "UTC"): DataFrame = {
    val r = spark.read
      .option("timeZone", timeZone)
      .option("multiLine", "false")
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** ORC writer — the other columnar interchange format Spark ships
    * a native vectorized reader/writer for. Same layout levers as
    * parquet (splittable stripes, predicate pushdown, column
    * pruning); useful when an upstream system emits ORC. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC reader — vectorized scan with pushdown, same contract as
    * the parquet loads. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw-file ingestion via Spark's `binaryFile` source: one row per
    * file with (path, modificationTime, length, content). This is the
    * real on-ramp for the multimodal tables — image/audio/video blobs
    * land as binary rows WITHOUT a driver-side listing loop, and the
    * source parallelizes file reads across executors. Pair with
    * `spark.sql.files.maxPartitionBytes` so many small blobs pack
    * into one task. `glob` filters server-side (e.g. "*.png"). */
  def readBinaryFiles(spark: SparkSession, dir: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Z-ordered write — the OPTIMIZE ZORDER half of lakehouse layout
    * maintenance: rank both columns into 2^16 equi-width buckets
    * (edges from ONE tiny in-plan min/max aggregate), Morton-
    * interleave the ranks (codegen'd kernel), then range-partition +
    * sort by the z-value. Rows close in BOTH dimensions land in the
    * same files, so parquet min/max stats prune 2-D box predicates
    * at file and row-group granularity — a single-column sort only
    * prunes on its leading column. */
  def writeZOrdered(df: DataFrame, path: String,
                    c1: String, c2: String, nFiles: Int): Unit = {
    val mm = df.agg(
      min(col(c1)).as("__mn1"), max(col(c1)).as("__mx1"),
      min(col(c2)).as("__mn2"), max(col(c2)).as("__mx2"))
    def rank(c: String, mn: String, mx: String) =
      when(col(mx) === col(mn), lit(0L)).otherwise(
        floor((col(c).cast("double") - col(mn)) /
          (col(mx) - col(mn)) * 65535.0).cast("long"))
    val cols = df.columns
    df.crossJoin(broadcast(mm))
      .withColumn("__z", graft.plans.ZOrderExpressions.zorder(
        rank(c1, "__mn1", "__mx1"), rank(c2, "__mn2", "__mx2")))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** File-level min/max manifest — the metadata half of
    * Iceberg/Delta-style file skipping, without the table format
    * (no Delta/Iceberg jars ship in this environment, SURVEY §1; the
    * DATA-layout mechanism is format-independent). One distributed
    * pass groups by `input_file_name()` and records each file's key
    * range + row count: the shuffle carries one tiny row per file,
    * and at 100 TB the manifest (one row per ~128 MB file) is ~1M
    * rows — itself a table, never driver state until a query prunes
    * with it. Pair with a clustered write (`writeZOrdered` /
    * `repartitionByRange`) so ranges are actually disjoint. */
  def buildManifest(spark: SparkSession, path: String,
                    keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"),
        count(lit(1)).as("n_rows"))

  /** Manifest rows for an explicit file list — the incremental half
    * of manifest maintenance: on append, scan ONLY the newly landed
    * files (pair with `newFilesFromLog`) and union with the prior
    * manifest, instead of rescanning the table. Work per ingest is
    * proportional to the batch, exactly like `dedup_incremental`'s
    * posture; SourcesSpec asserts incremental == full rebuild. */
  def buildManifestFor(spark: SparkSession, files: Seq[String],
                       keyCol: String): DataFrame =
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"),
        count(lit(1)).as("n_rows"))

  /** The files whose [key_min, key_max] stripe intersects [lo, hi] —
    * the manifest-side pruning step. The collect is file PATHS (query
    * metadata, like a listing), not data. */
  def pruneFiles(manifest: DataFrame, lo: Column, hi: Column): Array[String] =
    manifest.where(col("key_max") >= lo && col("key_min") <= hi)
      .select("file").collect().map(_.getString(0)).sorted

  /** Read only the manifest-selected files, with the residual range
    * predicate re-applied (stripe intersection over-approximates).
    * Falls back to an empty scan of the full directory when nothing
    * survives pruning, so the schema is preserved. */
  def manifestPrunedRead(spark: SparkSession, path: String,
                         files: Seq[String], keyCol: String,
                         lo: Column, hi: Column): DataFrame = {
    val base = if (files.nonEmpty) spark.read.parquet(files: _*)
    else spark.read.parquet(path).where(lit(false))
    base.where(col(keyCol).between(lo, hi))
  }

  /** Small-file compaction — the OPTIMIZE half of lakehouse table
    * maintenance: streaming/incremental writers leave thousands of
    * KB-sized files whose per-file open/footer cost dominates scans.
    * Rewrite a parquet directory into ceil(bytes/target) files via
    * `coalesce` (a shuffle-free partition merge — compaction must not
    * pay a full shuffle just to concatenate). Returns the file count
    * written. Total input size comes from the filesystem listing —
    * driver-side metadata, not data movement. */
  def compactFiles(spark: SparkSession, inPath: String, outPath: String,
                   targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).coalesce(nFiles)
      .write.mode("overwrite").parquet(outPath)
    fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** New-file detection: which candidate files are not yet ingested.
    * The reference lists blobs and pattern-matches client-side
    * (reference: notebooks/Mini-ETL-Pipeline in Databricks.py blob
    * listing); at scale this is an anti-join of the listing against
    * the ingest log, distributed rather than a driver loop.
    */
  def newFiles(listing: DataFrame, ingestLog: DataFrame,
               nameCol: String = "name"): DataFrame =
    listing.join(ingestLog, Seq(nameCol), "left_anti")

  // ----------------------------------------------------------------
  // Persistent ingest log: processed-files tracking across runs.
  // The reference implies this state (its blob loop re-lists and
  // skips already-loaded files); here it is an explicit append-only
  // parquet log so the anti-join has a durable right side.
  // ----------------------------------------------------------------

  /** (name, batch_id, ingest_ts) — one row per file per ingest. */
  val ingestLogSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("batch_id",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("ingest_ts",
        org.apache.spark.sql.types.TimestampType, nullable = false)))

  /** Read the ingest log (empty frame with the right schema if no
    * run has written it yet). */
  def readIngestLog(spark: SparkSession, logPath: String): DataFrame =
    if (new java.io.File(logPath).exists)
      spark.read.schema(ingestLogSchema).parquet(logPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ingestLogSchema)

  /** Record a batch of ingested files. Append-only — each run adds
    * its own parquet files, no rewrite of prior state (safe for
    * concurrent pipelines on different batches). */
  def appendIngestLog(files: DataFrame, logPath: String, batchId: String,
                      batchTs: java.sql.Timestamp,
                      nameCol: String = "name"): Unit =
    files.select(col(nameCol).cast("string").as("name"))
      .withColumn("batch_id", lit(batchId))
      .withColumn("ingest_ts", lit(batchTs))
      .write.mode("append").parquet(logPath)

  /** New-file detection against the persistent log: list −
    * already-ingested, as one distributed anti-join. */
  def newFilesFromLog(spark: SparkSession, listing: DataFrame,
                      logPath: String, nameCol: String = "name"): DataFrame =
    newFiles(listing,
      readIngestLog(spark, logPath).select(col("name").as(nameCol)), nameCol)

  // ----------------------------------------------------------------
  // Pluggable store listing: the remote-blob abstraction behind
  // incremental ingest.
  // ----------------------------------------------------------------

  /** Listing source for incremental ingest: produces (name,
    * size_bytes, last_modified) rows for the anti-join against the
    * ingest log. The reference lists Azure blobs client-side with
    * pattern + last-modified filtering (reference: Mini-ETL-Pipeline
    * in Databricks.py:31-44); this trait is that seam — swap in an
    * object-store-API lister where a Hadoop connector doesn't fit. */
  trait BlobLister {
    def list(spark: SparkSession, pathPattern: String,
             modifiedSince: Option[java.sql.Timestamp] = None): DataFrame
  }

  /** Hadoop-FileSystem-backed lister — the pluggable remote-store
    * binding Spark itself uses: the same call lists a local dir,
    * HDFS, or (with the provider jars on the classpath) abfss:// and
    * s3a:// object stores, selected by URI scheme. Glob patterns and
    * the last-modified cutoff reproduce the reference's client-side
    * loop, but the result is a DataFrame so new-file detection stays
    * a distributed anti-join. Listing metadata is driver-side (it is
    * file COUNTS, not data; for stores with tens of millions of
    * objects, page by prefix and union the frames). */
  object HadoopFsLister extends BlobLister {
    override def list(spark: SparkSession, pathPattern: String,
                      modifiedSince: Option[java.sql.Timestamp] = None)
        : DataFrame = {
      import spark.implicits._
      val p = new org.apache.hadoop.fs.Path(pathPattern)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val matched = Option(fs.globStatus(p)).toSeq.flatten
      val files = matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
      val cutoff = modifiedSince.map(_.getTime).getOrElse(Long.MinValue)
      files.filter(_.getModificationTime >= cutoff)
        .map(st => (st.getPath.toString, st.getLen,
          new java.sql.Timestamp(st.getModificationTime)))
        .toDF("name", "size_bytes", "last_modified")
    }
  }
}
