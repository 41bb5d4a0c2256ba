package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory)
  * and §7 (build plan). Each `queries` key is one operator; each
  * `oracleSql` entry is the DuckDB-equivalent ANSI SQL over the same
  * parquet tables.
  *
  * Oracle-parity conventions (SURVEY.md §5):
  *  - identical column aliases on both sides;
  *  - money/double aggregations via DECIMAL inner sums (order-
  *    independent) cast back to DOUBLE;
  *  - timestamp outputs cast to TIMESTAMP_NTZ (session tz = UTC) so
  *    parquet files carry naive timestamps, matching DuckDB's;
  *  - every query totally ordered by a unique key on both sides.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** timestamp → naive (NTZ) for parquet/oracle comparison. */
  private def ntz(c: Column): Column = c.cast("timestamp_ntz")

  private val batchTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  /** DuckDB twin of [[plantedClusters]] + exact top-3: shared by the
    * ann_lsh / ann_ivf / ann_index oracle entries. */
  private val annPlantedOracle: String =
    """WITH n AS (
         SELECT GREATEST(1, LEAST(COUNT(*) // 5, (1 << 24) - 1)) AS c
         FROM embeddings),
       f AS (
         SELECT i AS vec_id,
                ((i // 5 + 1) * 2654435761) % (1 << 24) AS h FROM (
           SELECT unnest(range(0, (SELECT c FROM n) * 5)) AS i)),
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           (24 - 2 * bit_count(xor(q.h, c.h))) / 24.0 AS cos
         FROM f q JOIN f c
           ON q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos, row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS "rank"
         FROM scored)
       SELECT query_id, "rank", neighbor_id, round(cos, 6) AS cosine
       FROM ranked WHERE "rank" <= 3 ORDER BY query_id, "rank""""

  /** Planted exact-regime ANN corpus (round-11): `n/5` clusters of
    * FIVE IDENTICAL vectors each, sized from the embeddings table so
    * the fixture scales with SF. Cluster `g`'s direction is the
    * ±1 encoding of the 24-bit pattern of `h = g·2654435761 mod 2²⁴`
    * (an odd multiplier — a BIJECTION on 24-bit space, so distinct
    * clusters keep distinct patterns). The hash + sign encoding is
    * what makes the fixture behave like real embedding data for the
    * bucketed structures: ±1 corners spread over ALL orthants with
    * equal norms (a 0/1 encoding confines every vector to one
    * orthant, where random hyperplanes barely separate anything —
    * measured as a 1.32 sweep exponent before the fix), and hashing
    * decorrelates consecutive cluster ids (raw counters share high
    * bits, co-bucketing near-identical directions). Exactness is BY
    * CONSTRUCTION, independent of any seed:
    *  - identical vectors hash to the same SRP bucket in every
    *    table and assign to the same IVF cell, so a query's
    *    candidate set always contains its 4 cluster mates;
    *  - within-cluster cosine is exactly 1.0 (float: 1 ± 2 ulp,
    *    rounds to 1.0) while the worst cross-cluster cosine of
    *    distinct ±1 patterns is (24−2·1)/24 ≈ 0.917 — a 0.08
    *    margin no floating-point noise can cross;
    * so approximate top-3 == exact top-3 (ties broken by
    * neighbor_id), and the DuckDB oracle is plain exact ranking via
    * integer Hamming math: cos(a,b) = (24 − 2·bit_count(ha ⊕ hb))/24
    * (equal norms √24 cancel). */
  private def plantedClusterCount(s: SparkSession, d: String): Long =
    math.max(1L, math.min(
      t(s, d, "embeddings").count() / 5L, (1L << 24) - 1L))

  private def plantedClusters(s: SparkSession, c: Long): DataFrame = {
    s.range(0, c * 5L)
      .select(col("id").as("vec_id"),
        expr("pmod((id DIV 5 + 1) * 2654435761, 16777216)").as("__h"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 23), " +
          "d -> CAST(2 * (shiftright(__h, d) & 1) - 1 AS FLOAT))")
        .as("embedding"))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(
      t(spark, "/root/testdata/sf0.001", "lineitem"))

  // ---------------------------------------------------------------
  // Query registry: one entry per SURVEY.md §2 operator.
  // ---------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 lakehouse core -----------------------------------------
    "ingest_metadata" -> ((s, d) =>
      Tables.withIngestMetadata(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber")),
        "parquet:lineitem", batchTs)
        .select(col("l_orderkey"), col("l_linenumber"),
          ntz(col("ingest_ts")).as("ingest_ts"), col("ingest_source"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "latest_per_key" -> ((s, d) =>
      Scd.latestPerKey(t(s, d, "orders"), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"),
          ntz(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"))
        .orderBy(col("o_custkey"))),

    "scd2_build" -> ((s, d) =>
      Scd.scd2FromHistory(t(s, d, "events"), Seq("user_id"), "ts",
        Seq("event_type"), Seq("event_id"))
        .select(col("user_id"), col("event_type"),
          ntz(col("valid_from")).as("valid_from"),
          ntz(col("valid_to")).as("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"))),

    "scd2_current" -> ((s, d) =>
      Scd.scd2Current(
        Scd.scd2FromHistory(t(s, d, "events"), Seq("user_id"), "ts",
          Seq("event_type"), Seq("event_id")))
        .select(col("user_id"), col("event_type"),
          ntz(col("valid_from")).as("valid_from"))
        .orderBy(col("user_id"))),

    "scd1_upsert" -> ((s, d) => {
      val ev = t(s, d, "events")
      def latest(df: DataFrame) =
        Scd.latestPerKey(df, Seq("user_id"), Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_type"), col("ts"))
      val base = latest(ev.filter(col("ts") < lit("2024-01-15").cast("timestamp")))
      val upd = latest(ev.filter(col("ts") >= lit("2024-01-15").cast("timestamp")))
      Scd.scd1Upsert(base, upd, Seq("user_id"), Seq("event_type", "ts"))
        .select(col("user_id"), col("event_type"), ntz(col("ts")).as("last_ts"))
        .orderBy(col("user_id"))
    }),

    "change_detect" -> ((s, d) => {
      val ev = t(s, d, "events")
      def latest(df: DataFrame) =
        Scd.latestPerKey(df, Seq("user_id"), Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_type"))
      val current = latest(ev.filter(col("ts") < lit("2024-01-15").cast("timestamp")))
      val incoming = latest(ev)
      Scd.changeDetect(incoming, current, Seq("user_id"), Seq("event_type"))
        .select(col("user_id"), col("event_type"), col("change_type"))
        .orderBy(col("user_id"))
    }),

    "string_clean" -> ((s, d) =>
      Scd.cleanStrings(t(s, d, "customer"), Seq("c_name", "c_mktsegment"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    "csv_ingest" -> ((s, d) => {
      // deterministic fixture: write a small CSV, read it back with
      // option-driven parsing (rows-only check; no CSV in testdata).
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv")
      val f = tmp.resolve("kosten.csv")
      java.nio.file.Files.writeString(f,
        "Kostenstelle;Bezeichnung;Bereich\n1000;IT;Zentral\n2000;HR;Verwaltung\n")
      Tables.readCsv(s, f.toString, delimiter = ";")
        .select(col("Kostenstelle").cast("int"), col("Bezeichnung"),
          col("Bereich"))
        .orderBy(col("Kostenstelle"))
    }),

    "jsonl_ingest" -> ((s, d) => {
      // deterministic fixture: write JSONL, read with explicit schema
      // (rows-only check; no JSONL in testdata)
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl")
      val f = tmp.resolve("docs.jsonl")
      java.nio.file.Files.writeString(f,
        """{"id": 1, "text": "hallo welt", "score": 0.5}
          |{"id": 2, "text": "zweite zeile", "score": 0.9}
          |""".stripMargin)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType)))
      Tables.readJsonl(s, f.toString, Some(schema)).orderBy(col("id"))
    }),

    "orc_roundtrip" -> ((s, d) => {
      // columnar-format parity: write ORC, read it back vectorized,
      // aggregate — the oracle computes the same aggregate from the
      // parquet original, so the round-trip must be lossless.
      val tmp = java.nio.file.Files.createTempDirectory("graft_orc")
      Tables.writeOrc(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice")),
        tmp.resolve("lineitem_orc").toString)
      Tables.readOrc(s, tmp.resolve("lineitem_orc").toString)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          Analytics.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    "binary_ingest" -> ((s, d) => {
      // raw multimodal on-ramp: blobs land as (path, length, content)
      // rows via the distributed binaryFile source — no driver-side
      // file loop. Fixture bytes are ASCII so the VALUES oracle can
      // state the expected decode.
      val tmp = java.nio.file.Files.createTempDirectory("graft_bin")
      java.nio.file.Files.write(tmp.resolve("img_a.bin"),
        "PNG:payload-aaaa".getBytes("UTF-8"))
      java.nio.file.Files.write(tmp.resolve("img_b.bin"),
        "JPG:payload-bb".getBytes("UTF-8"))
      java.nio.file.Files.write(tmp.resolve("skip.txt"),
        "not-a-blob".getBytes("UTF-8"))
      Tables.readBinaryFiles(s, tmp.toString, "*.bin")
        .select(
          regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
          col("length").as("n_bytes"),
          substring(col("content").cast("string"), 1, 3).as("head"))
        .orderBy(col("name"))
    }),

    "incremental_files" -> ((s, d) => {
      val listing = t(s, d, "documents").select(col("source").as("name")).distinct()
      val log = listing.filter(col("name").isin("src0", "src1"))
      Tables.newFiles(listing, log).orderBy(col("name"))
    }),

    "ingest_log" -> ((s, d) => {
      // the DURABLE form of incremental_files: run 1 records its
      // files in the append-only parquet log; this run's listing
      // anti-joins the log read back from disk (re-runs append the
      // same names again — idempotent for the anti-join)
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val log = s"/tmp/graft_ilog_$tag/log"
      val listing = t(s, d, "documents")
        .select(col("source").as("name")).distinct()
      Tables.appendIngestLog(
        listing.filter(col("name").isin("src0", "src1")), log, "b1", batchTs)
      Tables.newFilesFromLog(s, listing, log).orderBy(col("name"))
    }),

    "merge_stats" -> ((s, d) => {
      // merge observability: the new/changed/unchanged key split for
      // the second pipeline_e2e batch, as ONE aggregate job (the
      // reference computes the same three numbers as three count()s)
      val cfg = Pipeline.TableConfig("cust_orders",
        keyCols = Seq("o_custkey"),
        attrCols = Seq("o_orderpriority", "o_totalprice"),
        recencyCols = Seq("o_orderdate", "o_orderkey"))
      val orders = t(s, d, "orders")
      val split = lit("1998-01-01").cast("timestamp")
      val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val ts2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
      val dim1 = Pipeline.runIncrement(
        orders.filter(col("o_orderdate") < split),
        Pipeline.emptyDim(s, orders, cfg), cfg, "b1", ts1)
      val staged2 = Pipeline.stage(
        Pipeline.ingest(orders.filter(col("o_orderdate") >= split), "b2", ts2),
        cfg)
      Pipeline.mergeStats(dim1, staged2, cfg)
    }),

    "dim_sink_e2e" -> ((s, d) => {
      // pipeline_e2e driven through the DimSink storage seam instead
      // of in-memory frames: each increment loads current state from
      // the sink and commits the merge back; the final read-back must
      // equal the pure-DataFrame formulation (same oracle).
      val cfg = Pipeline.TableConfig("cust_orders",
        keyCols = Seq("o_custkey"),
        attrCols = Seq("o_orderpriority", "o_totalprice"),
        recencyCols = Seq("o_orderdate", "o_orderkey"))
      val orders = t(s, d, "orders")
      val split = lit("1998-01-01").cast("timestamp")
      val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val ts2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_sink_$tag")
      val sink = new graft.sources.ParquetDimSink(s"$dir/dim")
      Pipeline.runIncrementInto(sink,
        orders.filter(col("o_orderdate") < split), cfg, "b1", ts1)
      Pipeline.runIncrementInto(sink,
        orders.filter(col("o_orderdate") >= split), cfg, "b2", ts2)
      sink.load(s).get
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice"), ntz(col("valid_from")).as("valid_from"),
          ntz(col("valid_to")).as("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"))
    }),

    "dim_sink_versions" -> ((s, d) => {
      // snapshot versioning / time travel through the versioned sink:
      // two SCD2 increments commit two immutable versions; the query
      // reads BACK version 0 — the dimension as of batch 1 — after
      // version 1 became current. The oracle recomputes batch 1's
      // staged state directly from orders.
      val cfg = Pipeline.TableConfig("cust_orders",
        keyCols = Seq("o_custkey"),
        attrCols = Seq("o_orderpriority", "o_totalprice"),
        recencyCols = Seq("o_orderdate", "o_orderkey"))
      val orders = t(s, d, "orders")
      val split = lit("1998-01-01").cast("timestamp")
      val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val ts2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
      val dir = java.nio.file.Files.createTempDirectory("graft_vsink")
      val sink = new graft.sources.VersionedParquetSink(s"$dir/dim")
      Pipeline.runIncrementInto(sink,
        orders.filter(col("o_orderdate") < split), cfg, "b1", ts1)
      Pipeline.runIncrementInto(sink,
        orders.filter(col("o_orderdate") >= split), cfg, "b2", ts2)
      sink.loadVersion(s, 0)
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice"), ntz(col("valid_from")).as("valid_from"),
          col("is_current"))
        .orderBy(col("o_custkey"))
    }),

    "quarantine" -> ((s, d) => {
      // bronze→silver constraint gate on a deterministically
      // corrupted batch: every 97th key duplicated, every 89th
      // status nulled; rows tag instead of failing the load
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val batch = o.unionByName(
          o.filter(pmod(col("o_orderkey"), lit(97)) === 0))
        .withColumn("o_orderstatus",
          when(pmod(col("o_orderkey"), lit(89)) === 0,
            lit(null).cast("string")).otherwise(col("o_orderstatus")))
      Pipeline.validateBatch(batch, Seq("o_orderkey"), Seq("o_orderstatus"))
        .orderBy(col("o_orderkey"), col("_violation"))
    }),

    "dim_changes" -> ((s, d) => {
      // change data feed between two committed dim versions (the
      // table_changes surface of log-based formats, computed
      // set-theoretically over the versioned sink's snapshots):
      // closed versions surface as update_pre/postimage on the
      // (key, valid_from) row identity, new versions as inserts;
      // the oracle re-derives the feed from the two staged batches
      val cfg = Pipeline.TableConfig("cust_orders",
        keyCols = Seq("o_custkey"),
        attrCols = Seq("o_orderpriority", "o_totalprice"),
        recencyCols = Seq("o_orderdate", "o_orderkey"))
      val orders = t(s, d, "orders")
      val split = lit("1998-01-01").cast("timestamp")
      val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val ts2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
      val dir = java.nio.file.Files.createTempDirectory("graft_cdf")
      val sink = new graft.sources.VersionedParquetSink(s"$dir/dim")
      Pipeline.runIncrementInto(sink,
        orders.filter(col("o_orderdate") < split), cfg, "b1", ts1)
      Pipeline.runIncrementInto(sink,
        orders.filter(col("o_orderdate") >= split), cfg, "b2", ts2)
      Scd.changeFeed(sink.loadVersion(s, 0), sink.loadVersion(s, 1),
        Seq("o_custkey", "valid_from"))
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice"), ntz(col("valid_from")).as("valid_from"),
          ntz(col("valid_to")).as("valid_to"), col("is_current"),
          col("_change_type"))
        .orderBy(col("o_custkey"), col("valid_from"), col("_change_type"))
    }),

    "sql_merge" -> ((s, d) => {
      // executable ANSI MERGE INTO surface (the statement the
      // reference's users write — Load & SCD-Merge.py): parsed by
      // Spark's own grammar, executed as one full-outer-join plan
      // with ANSI action-order + cardinality semantics, exercising
      // update, delete, insert and untouched branches at once; the
      // oracle computes the post-merge state declaratively
      val target = t(s, d, "customer").filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), lit("init").as("status"),
          lit(0L).as("n"))
      t(s, d, "orders")
        .filter(col("o_custkey") > 200 && col("o_custkey") <= 400)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .select(col("o_custkey").as("k"), col("n_orders"))
        .createOrReplaceTempView("sql_merge_updates")
      graft.sources.SqlMerge.mergeFrames(s,
        """MERGE INTO dim t USING sql_merge_updates s ON t.k = s.k
           WHEN MATCHED AND s.n_orders > 10 THEN DELETE
           WHEN MATCHED THEN UPDATE SET status = 'active', n = s.n_orders
           WHEN NOT MATCHED THEN
             INSERT (k, status, n) VALUES (s.k, 'new', s.n_orders)""",
        target).orderBy(col("k"))
    }),

    "sql_merge_catalog" -> ((s, d) => {
      // the by-NAME surface: the dim lives in the session catalog
      // (GraftCatalog temp view over a versioned sink) and BOTH
      // statements address it by its table name — `MERGE INTO dim`
      // resolved to the registered sink, then a plain
      // `spark.sql("SELECT ... FROM dim")` reading the refreshed
      // snapshot (reference: Load & SCD-Merge.py:24-38 does exactly
      // this against named Delta tables); exercises the NOT MATCHED
      // BY SOURCE quadrant by name as well
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val dim = s"dim_cat_$tag"
      val dir = java.nio.file.Files.createTempDirectory("graft_cat")
      val sink = new graft.sources.VersionedParquetSink(s"$dir/$dim")
      sink.overwrite(t(s, d, "customer").filter(col("c_custkey") <= 250)
        .select(col("c_custkey").as("k"), lit("init").as("status"),
          lit(0L).as("n")))
      graft.sources.GraftCatalog.register(s, dim, sink)
      t(s, d, "orders")
        .filter(col("o_custkey") > 150 && col("o_custkey") <= 350)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .select(col("o_custkey").as("k"), col("n_orders"))
        .createOrReplaceTempView(s"cat_updates_$tag")
      graft.sources.GraftCatalog.sql(s,
        s"""MERGE INTO $dim t USING cat_updates_$tag s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET status = 'active', n = s.n_orders
            WHEN NOT MATCHED THEN
              INSERT (k, status, n) VALUES (s.k, 'new', s.n_orders)
            WHEN NOT MATCHED BY SOURCE AND t.k <= 20 THEN DELETE""")
      graft.sources.GraftCatalog.sql(s,
        s"SELECT k, status, n FROM $dim ORDER BY k")
    }),

    "sql_merge_mor" -> ((s, d) => {
      // merge-on-read commit path: the same ANSI MERGE semantics, but
      // the commit lands ONLY the change set (upsert rows + deleted
      // keys) as a patch beside the base snapshot — write ∝ delta —
      // and the read-back applies patches by key; the oracle computes
      // the identical post-merge state declaratively, so
      // patch-apply ≡ copy-on-write is oracle-proven
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val dir = java.nio.file.Files.createTempDirectory("graft_mor")
      val sink = new graft.sources.MergeOnReadSink(s"$dir/dim", Seq("k"))
      sink.overwrite(t(s, d, "customer").filter(col("c_custkey") <= 280)
        .select(col("c_custkey").as("k"), lit("init").as("status"),
          lit(0L).as("n")))
      t(s, d, "orders")
        .filter(col("o_custkey") > 180 && col("o_custkey") <= 380)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .select(col("o_custkey").as("k"), col("n_orders"))
        .createOrReplaceTempView(s"mor_updates_$tag")
      graft.sources.SqlMerge.mergeMor(s,
        s"""MERGE INTO dim t USING mor_updates_$tag s ON t.k = s.k
            WHEN MATCHED AND s.n_orders > 12 THEN DELETE
            WHEN MATCHED THEN UPDATE SET status = 'active', n = s.n_orders
            WHEN NOT MATCHED THEN
              INSERT (k, status, n) VALUES (s.k, 'new', s.n_orders)""",
        sink)
      sink.load(s).get.orderBy(col("k"))
    }),

    "sink_time_travel" -> ((s, d) => {
      // TIMESTAMP AS OF over the versioned sink: commits carry an
      // injected wall-clock, and a between-commits timestamp resolves
      // to the snapshot that was current THEN (Delta/Iceberg
      // semantics); the oracle recomputes that middle snapshot
      val dir = java.nio.file.Files.createTempDirectory("graft_tt")
      val ticks = Iterator(1000L, 2000L, 3000L)
      val sink = new graft.sources.VersionedParquetSink(
        s"$dir/dim", () => ticks.next())
      val cust = t(s, d, "customer")
      sink.overwrite(cust.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      sink.overwrite(cust.filter(col("c_custkey") <= 200)
        .select(col("c_custkey").as("k"), upper(col("c_name")).as("name")))
      sink.overwrite(cust.filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), lower(col("c_name")).as("name")))
      sink.loadVersionAt(s, 2500L).orderBy(col("k"))
    }),

    "catalog_time_travel" -> ((s, d) => {
      // the DSv2-catalog surface end-to-end: a versioned sink under a
      // registered catalog plugin, read back PURELY through SQL with
      // native TIMESTAMP AS OF — Spark routes the clause to
      // GraftTableCatalog.loadTable(ident, micros), which resolves
      // the manifest to the snapshot current at that instant
      // (timestamp_micros keeps the literal timezone-free)
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val dir = java.nio.file.Files.createTempDirectory("graft_dsv2")
      val ticks = Iterator(1000L, 2000L, 3000L)
      val sink = new graft.sources.VersionedParquetSink(
        s"$dir/dim", () => ticks.next())
      val cust = t(s, d, "customer")
      sink.overwrite(cust.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      sink.overwrite(cust.filter(col("c_custkey") <= 200)
        .select(col("c_custkey").as("k"), upper(col("c_name")).as("name")))
      sink.overwrite(cust.filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), lower(col("c_name")).as("name")))
      s.conf.set(s"spark.sql.catalog.tt_$tag",
        classOf[graft.sources.GraftTableCatalog].getName)
      s.conf.set(s"spark.sql.catalog.tt_$tag.warehouse", dir.toString)
      s.sql(s"""SELECT k, name FROM tt_$tag.dim
                TIMESTAMP AS OF timestamp_micros(2500000L)
                ORDER BY k""")
    }),

    "log_table_dml" -> ((s, d) => {
      // the transaction-log table's full SQL DML surface by name:
      // CREATE USING log, two INSERT INTO appends (each commits ONLY
      // its delta — file-granularity MVCC, the Delta trade the CoW
      // sink cannot make), then DELETE FROM whose stats-pruned
      // rewrite touches only files that contain matching rows; the
      // oracle recomputes the final state declaratively
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val wh = java.nio.file.Files.createTempDirectory("graft_logdml")
      val cat = s"logdml_$tag"
      // catalogs cache BY NAME: re-invocation (bench reps) keeps the
      // first warehouse, so the table name must be fresh each time
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftTableCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      }
      val tbl = s"dim_${System.nanoTime}"
      s.sql(s"CREATE TABLE $cat.$tbl (k BIGINT, status STRING, " +
        "bal DOUBLE) USING log")
      t(s, d, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey").as("k"), lit("init").as("status"),
          col("c_acctbal").as("bal"))
        .createOrReplaceTempView(s"log_b1_$tag")
      s.sql(s"INSERT INTO $cat.$tbl SELECT * FROM log_b1_$tag")
      t(s, d, "customer")
        .filter(col("c_custkey") > 200 && col("c_custkey") <= 350)
        .select(col("c_custkey").as("k"), lit("late").as("status"),
          col("c_acctbal").as("bal"))
        .createOrReplaceTempView(s"log_b2_$tag")
      s.sql(s"INSERT INTO $cat.$tbl SELECT * FROM log_b2_$tag")
      s.sql(s"DELETE FROM $cat.$tbl WHERE k > 150 AND k <= 250")
      s.sql(s"SELECT k, status, bal FROM $cat.$tbl ORDER BY k")
    }),

    "log_table_update" -> ((s, d) => {
      // row-level UPDATE on the log table: only files whose stats
      // admit matching rows are rewritten (everything else carries
      // forward by reference); matching rows get SET applied, the
      // rest are byte-identical — oracle is the CASE expression
      val dir = java.nio.file.Files.createTempDirectory("graft_logupd")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.append(t(s, d, "customer").filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal")))
      lt.update(s, col("bal") < 0.0,
        Map("bal" -> lit(0.0)))
      lt.load(s).select(col("k"), col("bal")).orderBy(col("k"))
    }),

    "log_table_bloom" -> ((s, d) => {
      // bloom-filter file index: per-file sidecars over xxhash64 of
      // the indexed column, probed by the stats pruner for equality
      // predicates min/max cannot decide — customer names interleave
      // across files (every file spans the whole alphabet) so range
      // stats prune nothing, but each name lives in exactly one
      // file's bloom; the deletes below scan only that file
      val dir = java.nio.file.Files.createTempDirectory("graft_logbloom")
      val lt = new graft.sources.LogTable(s"$dir/t",
        bloomExpectedItems = 10000L)
      val cust = t(s, d, "customer").filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), col("c_name").as("name"))
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType))),
        bloomFilterBy = Seq("name"))
      // two interleaved halves: both files cover the full key range
      lt.append(cust.filter(col("k") % 2 === 0))
      lt.append(cust.filter(col("k") % 2 === 1))
      val victims = cust.filter(col("k") % 50 === 0)
        .select("name").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().toSeq
      lt.delete(s, col("name").isin(victims: _*))
      lt.load(s).select(col("k"), col("name")).orderBy(col("k"))
    }),

    "log_table_procedures" -> ((s, d) => {
      // Iceberg-style SQL stored procedures on Spark 4's native
      // ProcedureCatalog: OPTIMIZE bin-packs the two appends' files,
      // a DELETE mutates, RESTORE rolls it back — every maintenance
      // verb a plain CALL statement, and the final state is the two
      // appended batches exactly
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val wh = java.nio.file.Files.createTempDirectory("graft_logproc")
      val cat = s"logproc_$tag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftTableCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      val lt = new graft.sources.LogTable(s"$wh/t")
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      lt.append(cust.filter(col("k") <= 150))
      lt.append(cust.filter(col("k") > 150 && col("k") <= 300))
      s.sql(s"CALL $cat.system.optimize('t')").collect()
      val preDelete = lt.currentVersion.get
      s.sql(s"DELETE FROM $cat.t WHERE k > 100")
      s.sql(s"CALL $cat.restore('t', $preDelete)").collect()
      s.sql(s"SELECT k, bal FROM $cat.t ORDER BY k")
    }),

    "log_table_clone" -> ((s, d) => {
      // shallow clone: a metadata-only commit referencing the source
      // snapshot's files by absolute path (zero data copies), then
      // independent evolution — a stats-pruned delete lands in the
      // CLONE's log and data dir while the source stays whole; the
      // oracle recomputes the clone's final state
      val dir = java.nio.file.Files.createTempDirectory("graft_logclone")
      val src = new graft.sources.LogTable(s"$dir/src")
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      src.append(cust.filter(col("k") <= 200))
      src.append(cust.filter(col("k") > 200 && col("k") <= 300))
      val cl = new graft.sources.LogTable(s"$dir/clone")
      cl.cloneFrom(src)
      cl.delete(s, col("k") > 250L)
      cl.load(s).orderBy(col("k"))
    }),

    "log_table_rename" -> ((s, d) => {
      // metadata-only RENAME COLUMN via column mapping: files
      // written before AND after the rename resolve by parquet field
      // id; a post-rename append, a filter on the renamed column and
      // the final read all run under the new name with zero data
      // rewritten — the oracle recomputes the union declaratively
      val dir = java.nio.file.Files.createTempDirectory("graft_logren")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seg",
          org.apache.spark.sql.types.StringType))),
        columnMapping = true)
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
      lt.append(cust.filter(col("k") <= 150))
      lt.renameColumn(s, "seg", "segment")
      lt.append(cust.filter(col("k") > 150 && col("k") <= 300)
        .withColumnRenamed("seg", "segment"))
      lt.delete(s, col("segment") === "BUILDING")
      lt.load(s).select(col("k"), col("segment")).orderBy(col("k"))
    }),

    "log_table_generated" -> ((s, d) => {
      // generated columns (GENERATED ALWAYS AS) + the derivation
      // that makes them matter: a table partitioned by
      // event_date = CAST(ts AS DATE) auto-fills the column on
      // append and prunes files from plain ts predicates (the
      // ts-conjunct derives an event_date-conjunct, which matches
      // the partition min=max stats)
      val dir = java.nio.file.Files.createTempDirectory("graft_loggen")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_date",
          org.apache.spark.sql.types.DateType))),
        partitionBy = Seq("event_date"),
        generatedAlwaysAs = Map("event_date" -> "CAST(ts AS DATE)"))
      lt.append(t(s, d, "events").filter(col("user_id") <= 100)
        .select(col("event_id"), col("user_id"), col("ts")))
      lt.delete(s, col("ts") <
        lit("2024-01-05 00:00:00").cast("timestamp"))
      lt.load(s)
        .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
          // the comparison harness reads Spark DATE as python date
          // objects but DuckDB DATE as datetime64 — align dtypes by
          // emitting the date at midnight as a timestamp on BOTH
          // sides (the feature under test is unchanged)
          ntz(col("event_date").cast("timestamp")).as("event_date"))
        .orderBy(col("event_id"))
    }),

    "log_table_constraints" -> ((s, d) => {
      // CHECK constraints enforced inside the commit-time stats
      // aggregate (zero extra scans, Delta semantics): a valid
      // append lands, a batch carrying ONE violating row refuses the
      // WHOLE commit, and a pre-filtered retry lands — the oracle is
      // the two committed batches
      val dir = java.nio.file.Files.createTempDirectory("graft_logck")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bal",
          org.apache.spark.sql.types.DoubleType))),
        checkConstraints = Map("bal_nonneg" -> "bal >= 0"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      lt.append(cust.filter(col("k") <= 150 && col("bal") >= 0))
      // one synthetic violating row makes the dirty batch refuse
      // deterministically at ANY scale factor
      val dirty = cust.filter(col("k") > 150 && col("k") <= 300)
        .unionByName(s.range(1)
          .select(lit(999999999L).as("k"), lit(-1.0).as("bal")))
      val refused =
        try { lt.append(dirty); false }
        catch { case _: IllegalArgumentException => true }
      require(refused, "constraint should have refused the dirty batch")
      lt.append(cust.filter(col("k") > 150 && col("k") <= 300 &&
        col("bal") >= 0))
      lt.load(s).orderBy(col("k"))
    }),

    "log_table_identity" -> ((s, d) => {
      // GENERATED ALWAYS AS IDENTITY + column DEFAULTs (Delta's
      // identity columns): ids allocate DISTRIBUTED from the logged
      // high-water mark — one pass, no count job, no global sort —
      // and are unique, step-aligned, and strictly advancing across
      // appends, but GAPPY like Delta's (concurrency-safe
      // allocation never promises density). Values depend on
      // physical partitioning, so the oracle pins the INVARIANTS
      // (all BIGINT, deterministic at any scale factor), not ids.
      val dir = java.nio.file.Files.createTempDirectory("graft_logid")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bal",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("status",
          org.apache.spark.sql.types.StringType))),
        identityColumns =
          Map("id" -> graft.sources.IdentitySpec(1000L, 3L)),
        columnDefaults = Map("status" -> "'new'"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey").cast("long").as("k"),
          col("c_acctbal").as("bal"))
      // first append omits id AND status (identity + default fill);
      // second provides status explicitly and lands strictly above
      lt.append(cust.filter(col("k") <= 150))
      lt.append(cust.filter(col("k") > 150 && col("k") <= 300)
        .withColumn("status", lit("old")))
      // round-10: the surrogate-keyed dimension MAINTAINED BY MERGE
      // (Delta's identity-in-merge) — matched rows update in place
      // keeping their ids, not-matched rows INSERT with the identity
      // column omitted and the merge ALLOCATES from the commit-basis
      // high-water mark (strictly above every existing id)
      val srcView = s"idm_src_${System.nanoTime}"
      cust.filter(col("k") > 250 && col("k") <= 400)
        .createOrReplaceTempView(srcView)
      graft.sources.SqlMerge.mergeLog(s,
        s"""MERGE INTO t t USING $srcView s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET status = 'upd'
            WHEN NOT MATCHED THEN INSERT (k, bal, status)
            VALUES (s.k, s.bal, 'merged')""", lt)
      lt.load(s).agg(
        count(lit(1)).as("n"),
        countDistinct(col("id")).as("n_ids"),
        min(when(col("id") >= 1000L &&
          (col("id") - 1000L) % 3L === 0L, 1L).otherwise(0L))
          .as("aligned"),
        when(max(when(col("status") === "new", col("id"))) <
          min(when(col("status").isin("old", "upd"), col("id"))), 1L)
          .otherwise(0L).as("batches_ordered"),
        when(min(when(col("status") === "merged", col("id"))) >
          max(when(col("status") =!= "merged", col("id"))), 1L)
          .otherwise(0L).as("merged_above"),
        sum(when(col("status") === "new", 1L).otherwise(0L))
          .as("n_default"),
        sum(when(col("status") === "old", 1L).otherwise(0L))
          .as("n_old"),
        sum(when(col("status") === "upd", 1L).otherwise(0L))
          .as("n_upd"),
        sum(when(col("status") === "merged", 1L).otherwise(0L))
          .as("n_merged"))
    }),

    "log_table_dv" -> ((s, d) => {
      // merge-on-read DML via deletion vectors: a DELETE that moves
      // NO table data (matching row indices go to a vector sidecar;
      // touched files re-commit by reference) and an UPDATE that
      // vectors out pre-images and appends only post-images — the
      // write cost is ∝ matched rows where copy-on-write pays
      // ∝ touched-file bytes. Reads subtract the vectors; the oracle
      // recomputes the final state declaratively
      val dir = java.nio.file.Files.createTempDirectory("graft_logdv")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.append(t(s, d, "customer").filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal")))
      lt.deleteMor(s, col("k") > 100L && col("k") <= 150L)
      lt.updateMor(s, col("bal") < 0.0, Map("bal" -> lit(0.0)))
      lt.load(s).select(col("k"), col("bal")).orderBy(col("k"))
    }),

    "log_table_time_travel" -> ((s, d) => {
      // log-table time travel end-to-end through SQL: three commits
      // under an injected clock (append / append / delete), then
      // TIMESTAMP AS OF pinned between the 2nd and 3rd — the state
      // the delete has not yet touched
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val wh = java.nio.file.Files.createTempDirectory("graft_logtt")
      val ticks = Iterator(1000L, 2000L, 3000L)
      val lt = new graft.sources.LogTable(s"$wh/t", () => ticks.next())
      val cust = t(s, d, "customer")
      lt.append(cust.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.append(cust
        .filter(col("c_custkey") > 100 && col("c_custkey") <= 200)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.delete(s, col("k") <= 50L)
      val cat = s"logtt_$tag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftTableCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      s.sql(s"""SELECT k, name FROM $cat.t
                TIMESTAMP AS OF timestamp_micros(2500000L)
                ORDER BY k""")
    }),

    "log_table_changes" -> ((s, d) => {
      // the change-data-feed surface: row-level changes between two
      // versions — appends derive inserts from their committed
      // files, a delete commit reads its recorded change files; the
      // oracle reconstructs the same feed from the base tables
      val dir = java.nio.file.Files.createTempDirectory("graft_logcdf")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val cust = t(s, d, "customer")
      lt.append(cust.filter(col("c_custkey") <= 150)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.append(cust
        .filter(col("c_custkey") > 150 && col("c_custkey") <= 250)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.delete(s, col("k") > 100L && col("k") <= 200L)
      lt.changes(s, -1L, lt.currentVersion.get)
        .select(col("k"), col("name"),
          col("_change_type").as("change_type"),
          col("_commit_version").cast("long").as("commit_version"))
        .orderBy(col("commit_version"), col("change_type"), col("k"))
    }),

    "log_table_changes_sql" -> ((s, d) => {
      // the change feed from PURE SQL — Delta's `table_changes` TVF:
      // the same window semantics as the Scala changes() API but
      // addressed by name in a query, resolving to the distributed
      // feed plan (no driver materialization). Window [1,2] excludes
      // the seed commit: v1's inserts and v2's deletes only
      val dir = java.nio.file.Files.createTempDirectory("graft_tvfq")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val cust = t(s, d, "customer")
      lt.append(cust.filter(col("c_custkey") <= 150)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.append(cust
        .filter(col("c_custkey") > 150 && col("c_custkey") <= 250)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.delete(s, col("k") > 100L && col("k") <= 200L)
      graft.sources.GraftSql.register(s)
      s.sql(s"SELECT k, name, _change_type AS change_type, " +
          s"CAST(_commit_version AS BIGINT) AS commit_version " +
          s"FROM table_changes('${lt.path}', 1, 2)")
        .orderBy(col("commit_version"), col("change_type"), col("k"))
    }),

    "sql_merge_log" -> ((s, d) => {
      // file-granularity MERGE (Delta's merge-on-write): the target
      // is a log table addressed BY NAME from the statement; only
      // files containing changed rows are rewritten, inserts append,
      // untouched files carry by reference — write ∝ touched +
      // inserts; read-back through the same catalog
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val wh = java.nio.file.Files.createTempDirectory("graft_logmrg")
      val lt = new graft.sources.LogTable(s"$wh/dim")
      lt.append(t(s, d, "customer").filter(col("c_custkey") <= 250)
        .select(col("c_custkey").as("k"), lit("init").as("status"),
          lit(0L).as("n")))
      val cat = s"logmrg_$tag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftTableCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      t(s, d, "orders")
        .filter(col("o_custkey") > 150 && col("o_custkey") <= 350)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .select(col("o_custkey").as("k"), col("n_orders"))
        .createOrReplaceTempView(s"logmrg_src_$tag")
      graft.sources.SqlMerge.mergeLog(s,
        s"""MERGE INTO $cat.dim t USING logmrg_src_$tag s ON t.k = s.k
            WHEN MATCHED AND s.n_orders > 14 THEN DELETE
            WHEN MATCHED THEN UPDATE SET status = 'active', n = s.n_orders
            WHEN NOT MATCHED THEN
              INSERT (k, status, n) VALUES (s.k, 'new', s.n_orders)""")
      s.sql(s"SELECT k, status, n FROM $cat.dim ORDER BY k")
    }),

    "log_table_evolution" -> ((s, d) => {
      // schema evolution on append (Delta's mergeSchema): the second
      // batch carries a new column — the commit widens the table
      // schema in place, old files read NULL for it with NO rewrite;
      // the oracle is the null-filled union
      val dir = java.nio.file.Files.createTempDirectory("graft_logevo")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val cust = t(s, d, "customer")
      lt.append(cust.filter(col("c_custkey") <= 150)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.append(cust
        .filter(col("c_custkey") > 150 && col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_acctbal").as("bal")),
        mergeSchema = true)
      lt.load(s).orderBy(col("k"))
    }),

    "log_table_cluster" -> ((s, d) => {
      // OPTIMIZE ZORDER-style clustering: three appends with fully
      // interleaved key ranges (stats prune nothing), then a layout
      // rebuild sorted by key — content identical (the oracle), file
      // ranges disjoint afterwards (skip counts asserted in
      // LogTableSpec). Round-11: the maintenance pass after the next
      // append is INCREMENTAL (liquid-style) — it rewrites only the
      // appended file (cost ∝ new data, prior generations survive by
      // identity — asserted, since a silent full rebuild would pass
      // the content oracle), which is what keeps re-clustering a
      // 100-TB table a routine call instead of a capital event
      val dir = java.nio.file.Files.createTempDirectory("graft_logclu")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_name").as("name"))
        .filter(col("k") <= 300)
      (0 until 3).foreach(i =>
        lt.append(cust.filter(pmod(col("k"), lit(3)) === i)
          .repartition(1)))
      lt.clusterIncremental(s, Seq("k"), nFiles = 3) // full: no epoch
      val gen1 = lt.liveAdds().map(_.path).toSet
      lt.append(t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_name").as("name"))
        .filter(col("k") > 300 && col("k") <= 400).repartition(1))
      lt.clusterIncremental(s, Seq("k"), nFiles = 2) // ∝ the append
      require(gen1.subsetOf(lt.liveAdds().map(_.path).toSet),
        "incremental pass must not rewrite prior generations")
      lt.load(s).orderBy(col("k"))
    }),

    "log_table_restore" -> ((s, d) => {
      // RESTORE: roll the table back to a prior version with ONE
      // metadata-only commit — the target's files re-added by
      // reference, the post-dating files retired; zero data movement
      // at any table size, rolled-back history stays travelable
      val dir = java.nio.file.Files.createTempDirectory("graft_logrst")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val cust = t(s, d, "customer")
      lt.append(cust.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.append(cust
        .filter(col("c_custkey") > 100 && col("c_custkey") <= 200)
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      lt.delete(s, col("k") <= 150L)
      lt.restore(1L)
      lt.load(s).orderBy(col("k"))
    }),

    "log_table_history" -> ((s, d) => {
      // DESCRIBE HISTORY: one row per commit (version, injected
      // wall-clock, op, add/remove file counts) — the audit surface;
      // single-file appends pin the counts deterministically
      val dir = java.nio.file.Files.createTempDirectory("graft_loghist")
      val ticks = Iterator(1000L, 2000L, 3000L)
      val lt = new graft.sources.LogTable(s"$dir/t", () => ticks.next())
      val cust = t(s, d, "customer")
      lt.append(cust.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("k"), col("c_name").as("name"))
        .repartition(1))
      lt.append(cust
        .filter(col("c_custkey") > 100 && col("c_custkey") <= 200)
        .select(col("c_custkey").as("k"), col("c_name").as("name"))
        .repartition(1))
      lt.delete(s, col("k") <= 50L)
      lt.history(s).orderBy(col("version"))
    }),

    "log_table_partitioned" -> ((s, d) => {
      // hive-partitioned transaction-log table (Delta's PARTITIONED
      // BY, the most-used layout lever): partition values ride in
      // the add-file actions AND the hive dirs, so BOTH pruners act
      // — Spark's reader-side PartitionFilters on SELECT (asserted
      // in Dsv2LogSpec) and the log-side stats pruner on row-level
      // DML (min = max = the partition value per file). CREATE
      // PARTITIONED BY + INSERT + partition-predicate DELETE, all by
      // name; the oracle recomputes the surviving state
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val wh = java.nio.file.Files.createTempDirectory("graft_logpart")
      val cat = s"logpart_$tag"
      // catalogs cache BY NAME (first warehouse wins on re-invocation)
      // — fresh table name per run instead
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftTableCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      }
      val tbl = s"dim_${System.nanoTime}"
      s.sql(s"CREATE TABLE $cat.$tbl (k BIGINT, seg STRING, bal DOUBLE) " +
        "USING log PARTITIONED BY (seg)")
      // partition columns order to the END of the table schema
      // (hive-discovery contract), so name the insert columns
      t(s, d, "customer").filter(col("c_custkey") <= 400)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
        .createOrReplaceTempView(s"logpart_src_$tag")
      s.sql(s"INSERT INTO $cat.$tbl (k, seg, bal) " +
        s"SELECT k, seg, bal FROM logpart_src_$tag")
      s.sql(s"DELETE FROM $cat.$tbl WHERE seg = 'BUILDING' AND k <= 200")
      s.sql(s"SELECT k, seg, bal FROM $cat.$tbl " +
        "WHERE seg <> 'MACHINERY' ORDER BY k")
    }),

    "log_table_sql_dml" -> ((s, d) => {
      // NATIVE SQL row-level dispatch (round-7): a SQL-first user
      // types plain UPDATE and MERGE INTO statements against the
      // catalog name — no API entry point anywhere. The planner
      // strategy (GraftRowLevelStrategy, hooked automatically when
      // the catalog initializes) claims the analyzed UpdateTable /
      // MergeIntoTable plans and executes the stats-pruned
      // file-granularity pipelines underneath
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val wh = java.nio.file.Files.createTempDirectory("graft_logsql")
      val cat = s"logsql_$tag"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftTableCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
      }
      val tbl = s"dim_${System.nanoTime}"
      s.sql(s"CREATE TABLE $cat.$tbl (k BIGINT, status STRING, " +
        "bal DOUBLE) USING log")
      t(s, d, "customer").filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), lit("init").as("status"),
          col("c_acctbal").as("bal"))
        .createOrReplaceTempView(s"logsql_b1_$tag")
      s.sql(s"INSERT INTO $cat.$tbl SELECT * FROM logsql_b1_$tag")
      s.sql(s"UPDATE $cat.$tbl SET bal = 0.0, status = 'zeroed' " +
        "WHERE bal < 0")
      t(s, d, "customer")
        .filter(col("c_custkey") > 200 && col("c_custkey") <= 400)
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
        .createOrReplaceTempView(s"logsql_src_$tag")
      s.sql(
        s"""MERGE INTO $cat.$tbl t USING logsql_src_$tag s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET status = 'merged'
            WHEN NOT MATCHED THEN
              INSERT (k, status, bal) VALUES (s.k, 'new', s.bal)""")
      s.sql(s"SELECT k, status, bal FROM $cat.$tbl ORDER BY k")
    }),

    "log_table_merge_evolve" -> ((s, d) => {
      // ALTER TABLE ADD COLUMNS + MERGE WITH SCHEMA EVOLUTION —
      // both metadata-only schema appends (old files read the new
      // columns as NULL, zero rewrites): ADD COLUMNS lands `tier`
      // by statement, then the merge's source-only `bal` column
      // rides Spark's native WITH SCHEMA EVOLUTION clause (resolved
      // to an AddColumn change, applied through the catalog's
      // alterTable, then the file-granularity merge plans against
      // the evolved target). The oracle recomputes the final frame
      val cat = "gevo"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftTableCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_evo").toString)
      }
      val tn = s"t_${System.nanoTime}"
      s.sql(s"CREATE TABLE $cat.$tn (k BIGINT, name STRING) USING log")
      t(s, d, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey").as("k"), col("c_name").as("name"))
        .createOrReplaceTempView(s"evo_seed_$tn")
      s.sql(s"INSERT INTO $cat.$tn SELECT * FROM evo_seed_$tn")
      s.sql(s"ALTER TABLE $cat.$tn ADD COLUMNS (tier STRING)")
      t(s, d, "customer")
        .filter(col("c_custkey") > 100 && col("c_custkey") <= 300)
        .select(col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_acctbal").as("bal"))
        .createOrReplaceTempView(s"evo_src_$tn")
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.$tn t
            USING evo_src_$tn s ON t.k = s.k
            WHEN MATCHED THEN
              UPDATE SET name = s.name, bal = s.bal, tier = 'upd'
            WHEN NOT MATCHED THEN
              INSERT (k, name, bal, tier)
              VALUES (s.k, s.name, s.bal, 'new')""")
      s.sql(s"SELECT k, name, tier, bal FROM $cat.$tn ORDER BY k")
    }),

    "log_table_properties" -> ((s, d) => {
      // free-form TBLPROPERTIES in the transaction log (Delta's
      // table-property surface): create-time seeding, SET merges,
      // UNSET drops — all metadata-only commits (zero data I/O at
      // any table size). The output reads the final property map
      // back OUT of the log next to a data count proving the
      // property commits disturbed nothing; the oracle states the
      // expected survivors declaratively
      val dir = java.nio.file.Files.createTempDirectory("graft_logprops")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType))),
        properties = Map("tier" -> "bronze", "owner.team" -> "ingest"))
      lt.append(t(s, d, "nation")
        .select(col("n_nationkey").as("k"), col("n_name").as("name")))
      lt.setTableProperties(Map("tier" -> "silver",
        "retention.days" -> "30"))
      lt.unsetTableProperties(Seq("owner.team"))
      val n = lt.load(s).count()
      import s.implicits._
      lt.tableProperties.toSeq.sortBy(_._1).toDF("key", "value")
        .withColumn("n_rows", lit(n)).orderBy(col("key"))
    }),

    "log_table_mv" -> ((s, d) => {
      // incrementally-maintained materialized aggregate (Delta's MV
      // refresh from the change data feed): seed a per-customer
      // count/sum view, then run an append + a row-level DELETE + a
      // row-level UPDATE against the BASE and refresh — the refresh
      // reads ONLY the change feed of those three commits (cost ∝
      // the delta, never the base), folds signed decimal deltas, and
      // MERGEs them into the view with an exactly-once txn tag. The
      // oracle recomputes the final view from scratch; matching
      // bit-for-bit proves the incremental algebra
      val dir = java.nio.file.Files.createTempDirectory("graft_logmv")
      val base = new graft.sources.LogTable(s"$dir/base")
      val o = t(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      base.append(o.filter(col("o_orderkey") % 3 === 0))
      graft.sources.MaterializedAgg.create(s, base.path, s"$dir/mv",
        Seq("o_custkey"), "o_totalprice")
      base.append(o.filter(col("o_orderkey") % 3 === 1))
      // merge-on-read DML: the delete commits a deletion vector and
      // the update commits only its post-image patch — commit cost ∝
      // matched rows, and the change feed serves both row-level (the
      // MV refresh reads pre/post images off the DV commits exactly
      // as off copy-on-write ones)
      base.deleteMor(s, col("o_totalprice") < 1000.0)
      base.updateMor(s, col("o_orderstatus") === "F",
        Map("o_totalprice" -> (col("o_totalprice") * 2)))
      graft.sources.MaterializedAgg.refresh(s, s"$dir/mv")
      graft.sources.MaterializedAgg.read(s, s"$dir/mv")
        .select(col("o_custkey"), col("cnt"),
          col("sum_v").cast("double").as("total"))
        .orderBy(col("o_custkey"))
    }),

    "log_table_mv_minmax" -> ((s, d) => {
      // MIN/MAX materialized aggregate (Delta's recipe for the
      // non-associative class): a delete can RAISE a group's min or
      // LOWER its max — no signed fold recovers it — so the refresh
      // uses the change feed only to NAME the touched groups and
      // re-aggregates each from a group-scoped base scan (broadcast
      // semi-join; cost ∝ touched groups' data, never the table).
      // The window deletes every order above a price ceiling, so
      // most groups' maxes MUST drop and some groups vanish; the
      // oracle recomputes the view from scratch — matching
      // bit-for-bit proves the re-scan maintenance
      val dir = java.nio.file.Files.createTempDirectory("graft_logmvmm")
      val base = new graft.sources.LogTable(s"$dir/base")
      val o = t(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
      base.append(o.filter(col("o_orderkey") % 2 === 0))
      graft.sources.MaterializedAgg.create(s, base.path, s"$dir/mv",
        Seq("o_custkey"), "o_totalprice", withMinMax = true)
      base.append(o.filter(col("o_orderkey") % 2 === 1))
      base.delete(s, col("o_totalprice") > 300000.0)
      graft.sources.MaterializedAgg.refresh(s, s"$dir/mv")
      graft.sources.MaterializedAgg.read(s, s"$dir/mv")
        .select(col("o_custkey"), col("cnt"),
          col("sum_v").cast("double").as("total"),
          col("min_v").as("min_price"), col("max_v").as("max_price"))
        .orderBy(col("o_custkey"))
    }),

    "log_table_repartition" -> ((s, d) => {
      // Iceberg-style PARTITION EVOLUTION: one metadata-only commit
      // changes the hive layout for future writes — zero data
      // rewritten. The query spans the epochs: an unpartitioned
      // append, the evolve, a hive-partitioned append, and a
      // row-level DELETE whose predicate crosses both layouts (old
      // files prune via in-file stats, new ones via partition-value
      // stats; survivors of old-epoch rewrites land in the NEW
      // layout). The oracle recomputes the final state
      val dir = java.nio.file.Files.createTempDirectory("graft_logpevo")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
      lt.append(cust.filter(col("k") <= 200))
      lt.setPartitionColumns(Seq("seg"))
      lt.append(cust.filter(col("k") > 200 && col("k") <= 400))
      lt.delete(s, col("seg") === "BUILDING" && col("k") <= 300)
      lt.load(s).select(col("k"), col("seg"), col("bal"))
        .orderBy(col("k"))
    }),

    "log_table_hidden" -> ((s, d) => {
      // Iceberg-style HIDDEN PARTITIONING: PARTITIONED BY
      // (bucket(8,k)) synthesizes a hidden generated column the
      // user never writes or sees — writes compute it and lay files
      // out by it; equality predicates on k skip sibling buckets
      // via the derived hidden predicate. Mid-query the layout
      // EVOLVES to truncate(1,seg) (one metadata commit), so the
      // final DELETE spans a bucket epoch and a truncate epoch and
      // its seg predicate prunes the new epoch's files. The user
      // surface is user columns only, at every step
      val dir = java.nio.file.Files.createTempDirectory("graft_loghid")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seg",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("bal",
          org.apache.spark.sql.types.DoubleType))),
        partitionBy = Seq("bucket(8,k)"))
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
      lt.append(cust.filter(col("k") <= 200))
      lt.setPartitionColumns(Seq("truncate(1,seg)"))
      lt.append(cust.filter(col("k") > 200 && col("k") <= 400))
      lt.delete(s, col("seg") === "BUILDING" && col("k") <= 300)
      lt.load(s).select(col("k"), col("seg"), col("bal"))
        .orderBy(col("k"))
    }),

    "log_table_refs" -> ((s, d) => {
      // Iceberg-style REFS: tag the seed snapshot, fork a WRITABLE
      // branch (zero-copy shallow clone + ref), do real work on the
      // branch (append + row-level delete) while main stays
      // untouched, then FAST-FORWARD main onto the branch in one
      // metadata commit. A second round runs the same loop ENTIRELY
      // in SQL — Iceberg's write-audit-publish: stage rows on
      // `cat.tbl__branch_wap` by name, audit (delete the rejects),
      // CALL merge_branch to publish. The tag still serves the seed
      // snapshot (asserted); main never holds unaudited rows
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val cat = s"grefs_$tag"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftTableCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_logref")
            .toString)
      }
      // catalogs cache their warehouse at first resolution — a
      // per-invocation table NAME keeps reruns in one JVM isolated
      val tbl = s"t_${System.nanoTime()}"
      val lt = new graft.sources.LogTable(
        s"${s.conf.get(s"spark.sql.catalog.$cat.warehouse")}/$tbl")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
      lt.append(cust.filter(col("k") <= 300))
      lt.createTag("seed")
      val br = lt.createBranch("dev")
      br.append(cust.filter(col("k") > 300 && col("k") <= 400))
      br.delete(s, col("seg") === "BUILDING" && col("k") <= 200)
      require(lt.load(s).count() ==
        lt.load(s, Some(lt.resolveTag("seed"))).count(),
        "main must be untouched while the branch works")
      lt.mergeBranch("dev")
      // round 2: the same workflow as pure SQL (WAP)
      s.sql(s"CALL $cat.create_branch('$tbl', 'wap')")
      cust.filter(col("k") > 400 && col("k") <= 450)
        .createOrReplaceTempView(s"refs_stage_$tag")
      s.sql(s"INSERT INTO $cat.${tbl}__branch_wap " +
        s"SELECT k, seg, bal FROM refs_stage_$tag")
      // audit: the staged AUTOMOBILE rows fail review
      s.sql(s"DELETE FROM $cat.${tbl}__branch_wap " +
        "WHERE seg = 'AUTOMOBILE' AND k > 400")
      require(s.sql(s"SELECT COUNT(*) FROM $cat.$tbl").head.getLong(0)
        == lt.load(s).count(),
        "main must be untouched while WAP stages")
      s.sql(s"CALL $cat.merge_branch('$tbl', 'wap')")
      s.sql(s"SELECT k, seg, bal FROM $cat.$tbl ORDER BY k")
    }),

    "log_table_meta_sql" -> ((s, d) => {
      // round-11 SQL METADATA TABLES (Iceberg's inspection surface):
      // cat.t.history / cat.t.files / cat.t.refs resolve as
      // read-only relations — metadata users project, filter and
      // JOIN, not procedures they CALL and collect. The files
      // relation is LogTable.addsDF: above the checkpoint threshold
      // a DISTRIBUTED scan of the parquet checkpoint plus a bounded
      // commit tail (at 100 TB the ~1M-row manifest is a table, not
      // driver state). Injected clock + single-file appends pin the
      // history; the files facts aggregate to SF-deterministic
      // numbers the oracle recomputes from the customer table.
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val cat = s"gmeta_$tag"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftTableCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_logmeta")
            .toString)
      }
      val tbl = s"t_${System.nanoTime()}"
      val ticks = Iterator(1000L, 2000L, 3000L, 4000L) ++
        Iterator.continually(5000L)
      val lt = new graft.sources.LogTable(
        s"${s.conf.get(s"spark.sql.catalog.$cat.warehouse")}/$tbl",
        () => ticks.next())
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      lt.append(cust.filter(col("k") <= 100).repartition(1))   // v0
      lt.append(cust.filter(col("k") > 100 && col("k") <= 200)
        .repartition(1))                                       // v1
      lt.deleteMor(s, col("k") <= 50)                          // v2 DV
      lt.createTag("seed", Some(0L))                           // v3
      s.sql(
        s"""SELECT 'history' AS surface, CAST(version AS STRING)
                     AS item, op AS detail, commit_ts AS num
            FROM $cat.$tbl.history
            UNION ALL
            SELECT 'refs', name, kind, version FROM $cat.$tbl.refs
            UNION ALL
            SELECT 'files', 'live', 'files', count(*)
            FROM $cat.$tbl.files
            UNION ALL
            SELECT 'files', 'rows', 'logical',
                   sum(rows) - sum(coalesce(dv_rows, 0))
            FROM $cat.$tbl.files
            UNION ALL
            SELECT 'partitions', 'count', 'parts', count(*)
            FROM $cat.$tbl.partitions
            ORDER BY surface, item, detail""")
    }),

    "log_table_snapshots" -> ((s, d) => {
      // round-12 inspection surfaces: cat.t.snapshots (one row per
      // retained commit — parent chain, operation, a SUMMARY map
      // carrying add/remove counts and the idempotent-txn tag;
      // Iceberg's snapshots table) and cat.t.all_files (every file
      // ANY retained version still references, live-flagged — the
      // vacuum-audit view, assembled from the floor manifest, which
      // rides the distributed parquet-checkpoint scan above the
      // threshold, plus the bounded retained commit tail). Injected
      // clock + single-file commits pin every value; the oracle
      // recomputes the row sums from the customer table.
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val cat = s"gsnap_$tag"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftTableCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_logsnap")
            .toString)
      }
      val tbl = s"t_${System.nanoTime()}"
      val ticks = Iterator(1000L, 2000L, 3000L, 4000L) ++
        Iterator.continually(5000L)
      val lt = new graft.sources.LogTable(
        s"${s.conf.get(s"spark.sql.catalog.$cat.warehouse")}/$tbl",
        () => ticks.next())
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      lt.append(cust.filter(col("k") <= 40).repartition(1))    // v0
      lt.append(cust.filter(col("k") > 40 && col("k") <= 80)
        .repartition(1))                                       // v1
      lt.deleteMor(s, col("k") <= 20)                          // v2 DV
      lt.overwrite(cust.filter(col("k") > 80 && col("k") <= 90)
        .repartition(1))                                       // v3
      lt.appendStreamBatch(cust.filter(col("k") > 90 && col("k") <= 120)
        .repartition(1), "app1", 5L)                           // v4 txn
      s.sql(
        s"""SELECT 'snap' AS surface, CAST(version AS STRING) AS item,
                   concat(operation,
                          '|p=', CAST(coalesce(parent, -1) AS STRING),
                          '|a=', summary['n_added'],
                          '|r=', summary['n_removed']) AS detail,
                   committed_at AS num
            FROM $cat.$tbl.snapshots
            UNION ALL
            SELECT 'txn', summary['txn_app'], summary['txn_batch'],
                   version
            FROM $cat.$tbl.snapshots
            WHERE summary['txn_app'] IS NOT NULL
            UNION ALL
            SELECT 'all_files', 'live', 'files', count(*)
            FROM $cat.$tbl.all_files WHERE live
            UNION ALL
            SELECT 'all_files', 'live', 'rows', sum(rows)
            FROM $cat.$tbl.all_files WHERE live
            UNION ALL
            SELECT 'all_files', 'retired', 'files', count(*)
            FROM $cat.$tbl.all_files WHERE NOT live
            UNION ALL
            SELECT 'all_files', 'retired', 'rows', sum(rows)
            FROM $cat.$tbl.all_files WHERE NOT live
            UNION ALL
            SELECT 'all_files', 'retired', 'dv_rows',
                   sum(coalesce(dv_rows, 0))
            FROM $cat.$tbl.all_files WHERE NOT live
            ORDER BY surface, item, detail""")
    }),

    "delta_export" -> ((s, d) => {
      // round-12 Delta-protocol EXPORT: the snapshot re-emitted as a
      // spec-compliant _delta_log (protocol + metaData + adds with
      // Delta stats JSON, parquet checkpoint, _last_checkpoint) that
      // an external Delta reader could consume in place; verified
      // here by round-tripping through the library's own import
      // reader (no Delta binary exists in this offline environment —
      // the structural spec asserts live in DeltaExportSpec).
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_dexpq").toString
      val lt = new graft.sources.LogTable(s"$wh/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      lt.append(cust.filter(col("k") <= 120).repartition(2))
      lt.delete(s, col("k") % 10 === 0)  // CoW — stays exportable
      graft.sources.DeltaExport.exportDeltaLog(s, lt)
      graft.sources.DeltaExport.loadDelta(s, lt.path)
        .select(col("k"), col("name")).orderBy("k")
    }),

    "delta_convert" -> ((s, d) => {
      // round-13 CONVERT FROM DELTA (metadata-only, in place): fold
      // a _delta_log into a graft LogTable registering the files by
      // reference — stats parsed back type-aware, so file-skipping
      // works from commit one; the result is a full read-write
      // graft table (the DML below proves it). The fixture Delta
      // log is built by this library's own exporter, then the graft
      // log is removed so the convert starts from a PURE Delta
      // table.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_dconvq").toString
      val src = new graft.sources.LogTable(s"$wh/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      src.append(cust.filter(col("k") <= 150).repartition(3))
      graft.sources.DeltaExport.exportDeltaLog(s, src)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(s"$wh/t/_log"))
      val conv = graft.sources.DeltaExport.convertFromDelta(s, s"$wh/t")
      conv.delete(s, col("k") % 10 === 0) // converted table is LIVE
      conv.load(s).select(col("k"), col("name")).orderBy("k")
    }),

    "delta_dv_roundtrip" -> ((s, d) => {
      // round-15 DELETION-VECTOR INTEROP, both directions and no
      // purge anywhere: merge-on-read deletes export as Delta's
      // public add.deletionVector encoding (portable roaring
      // bitmaps, Z85, inline or packed .bin blobs, reader-3/writer-7
      // protocol), the graft log is stripped to leave a PURE Delta
      // table with live row-level deletes, convertFromDelta decodes
      // the foreign vectors back into graft pair form, and a further
      // MOR delete runs on the converted table — counts stay exact
      // through every hop or the oracle catches it.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_ddvq").toString
      val src = new graft.sources.LogTable(s"$wh/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      src.append(cust.filter(col("k") <= 150).repartition(3))
      src.deleteMor(s, col("k") % 10 === 0)   // vectors, no rewrite
      src.deleteMor(s, col("k") > 140)        // vector UNION on touched
      graft.sources.DeltaExport.mirrorDelta(s, src)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(s"$wh/t/_log"))
      rm(new java.io.File(s"$wh/t/_dv"))
      val conv = graft.sources.DeltaExport.convertFromDelta(s, s"$wh/t")
      conv.deleteMor(s, col("k") % 7 === 0)   // MOR on the convert
      conv.load(s).select(col("k"), col("name")).orderBy("k")
    }),

    "delta_mapping" -> ((s, d) => {
      // round-15 COLUMN MAPPING (id mode) across the Delta boundary:
      // a column-mapped graft table — parquet field-id stamps,
      // renames are pure metadata — exports with the spec's
      // delta.columnMapping.{mode,id,physicalName} under a reader-2
      // protocol instead of refusing; the convert translates the ids
      // back to graft stamps, so the converted table keeps renaming.
      // Rows written BEFORE the rename must serve under the newest
      // name at every hop (id resolution) or the oracle catches it.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_dmapq").toString
      val src = new graft.sources.LogTable(s"$wh/t")
      src.create(org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, name STRING"), columnMapping = true)
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      src.append(cust.filter(col("k") <= 100).repartition(2))
      src.renameColumn(s, "name", "label")
      src.append(cust.filter(col("k") > 100 && col("k") <= 150)
        .withColumnRenamed("name", "label").repartition(2))
      graft.sources.DeltaExport.mirrorDelta(s, src)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(s"$wh/t/_log"))
      val conv = graft.sources.DeltaExport.convertFromDelta(s, s"$wh/t")
      conv.renameColumn(s, "label", "tag")   // still column-mapped
      conv.load(s).select(col("k"), col("tag")).orderBy("k")
    }),

    "delta_constraints" -> ((s, d) => {
      // round-15 CHECK-CONSTRAINT INTEROP: graft CHECK constraints
      // cross the Delta boundary as the spec's
      // `delta.constraints.<name>` configuration under a writer-3
      // protocol floor (legacy ladder), and convertFromDelta carries
      // them back so the converted table keeps refusing what the
      // Delta writers refused. The query proves the round trip by
      // appending MORE rows to the converted table under the
      // surviving constraint — enforcement (a refused violating
      // append) is asserted in DeltaExportSpec.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_dconq").toString
      val src = new graft.sources.LogTable(s"$wh/t")
      src.create(org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, name STRING"),
        checkConstraints = Map("k_nonneg" -> "k >= 0"))
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      src.append(cust.filter(col("k") <= 100).repartition(2))
      src.addCheckConstraint(s, "name_ne", "length(name) > 0")
      graft.sources.DeltaExport.mirrorDelta(s, src)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(s"$wh/t/_log"))
      val conv = graft.sources.DeltaExport.convertFromDelta(s, s"$wh/t")
      require(conv.checkConstraints.keySet == Set("k_nonneg", "name_ne"),
        s"constraints lost in convert: ${conv.checkConstraints}")
      conv.append(cust.filter(col("k") > 100 && col("k") <= 150))
      conv.load(s).select(col("k"), col("name")).orderBy("k")
    }),

    "iceberg_convert" -> ((s, d) => {
      // round-13 CONVERT FROM ICEBERG metadata (in place): resolve
      // the current snapshot through the manifest chain, register
      // the live files by reference (rows from record_count), and
      // run graft DML on the result.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_iconvq").toString
      val src = new graft.sources.LogTable(s"$wh/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      src.append(cust.filter(col("k") <= 150).repartition(3))
      graft.sources.IcebergExport.exportIcebergMetadata(s, src)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(s"$wh/t/_log"))
      val conv = graft.sources.IcebergExport
        .convertFromIceberg(s, s"$wh/t")
      conv.delete(s, col("k") % 10 === 0)
      conv.load(s).select(col("k"), col("name")).orderBy("k")
    }),

    "iceberg_bucket_interop" -> ((s, d) => {
      // round-15: `iceberg_bucket(n, c)` hidden partitioning — the
      // Iceberg spec's OWN bucket hash (Appendix B murmur3, seed 0;
      // graft.plans.IcebergBucketHash, codegen'd) as a graft
      // transform, so bucketed layouts cross the Iceberg metadata
      // boundary as a real `bucket[N]` a foreign reader prunes by,
      // instead of refusing (Spark's hash() differs). Export →
      // convert → further writes under the SAME hash → DML.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_ibkq").toString
      val src = new graft.sources.LogTable(s"$wh/t")
      src.create(org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, name STRING"),
        partitionBy = Seq("iceberg_bucket(4, k)"))
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      src.append(cust.filter(col("k") <= 150))
      graft.sources.IcebergExport.exportIcebergMetadata(s, src)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(s"$wh/t/_log"))
      val conv = graft.sources.IcebergExport
        .convertFromIceberg(s, s"$wh/t")
      conv.append(cust.filter(col("k") > 150 && col("k") <= 180))
      conv.delete(s, col("k") % 10 === 0)
      conv.load(s).select(col("k"), col("name")).orderBy("k")
    }),

    "iceberg_dv_roundtrip" -> ((s, d) => {
      // round-15 POSITION-DELETE INTEROP, both directions and no
      // purge anywhere (delta_dv_roundtrip's Iceberg twin):
      // merge-on-read deletes export as the Iceberg spec's own v2
      // position delete files — (file_path, pos) parquet with the
      // reserved field ids, global (unpartitioned-spec) with
      // file_path bounds, in a content=1 delete manifest — the
      // graft log and pair dirs are stripped to leave a PURE
      // Iceberg table with live row-level deletes, convertFromIceberg
      // decodes the foreign deletes back into graft pair form, and
      // a further MOR delete runs on the converted table — counts
      // stay exact through every hop or the oracle catches it.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_idvq").toString
      val src = new graft.sources.LogTable(s"$wh/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      src.append(cust.filter(col("k") <= 150).repartition(3))
      src.deleteMor(s, col("k") % 10 === 0)   // vectors, no rewrite
      src.deleteMor(s, col("k") > 140)        // vector UNION on touched
      graft.sources.IcebergExport.exportIcebergMetadata(s, src)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(s"$wh/t/_log"))
      rm(new java.io.File(s"$wh/t/_dv"))
      val conv = graft.sources.IcebergExport
        .convertFromIceberg(s, s"$wh/t")
      conv.deleteMor(s, col("k") % 7 === 0)   // MOR on the convert
      conv.load(s).select(col("k"), col("name")).orderBy("k")
    }),

    "iceberg_mirror" -> ((s, d) => {
      // round-14 ONE-CALL Iceberg mirror (mirrorDelta's analog):
      // follow the table one commit at a time — export + retention
      // in a single call, so a long-lived mirror stays BOUNDED
      // (metadata files capped at keepMetadata, carried snapshots
      // at keepSnapshots — the expire-snapshots analog — and Avro
      // manifests no retained metadata references sweep as
      // orphans). Idempotent when already current. The final
      // mirrored state reads back through the library's own
      // reader.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_imirq").toString
      val lt = new graft.sources.LogTable(s"$wh/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      def sync(): Unit = { graft.sources.IcebergExport
        .mirrorIceberg(s, lt, keepMetadata = 2, keepSnapshots = 2); () }
      lt.append(cust.filter(col("k") <= 60).repartition(2))     // v0
      sync()
      lt.append(cust.filter(col("k") > 60 && col("k") <= 120)
        .repartition(2))                                        // v1
      sync()
      lt.delete(s, col("k") % 10 === 0)                         // v2
      sync()
      sync() // already current — a no-op, never a duplicate snapshot
      graft.sources.IcebergExport.loadIceberg(s, lt.path)
        .select(col("k"), col("name")).orderBy("k")
    }),

    "iceberg_export" -> ((s, d) => {
      // round-13 Iceberg metadata EXPORT (public table spec,
      // format-version 2): vN.metadata.json + manifest-list and
      // manifest Avro files (raw avro-1.12 API — on Spark's own
      // classpath) + version-hint.text; sequential exports mirror
      // the table (snapshots carry forward). Round-tripped through
      // the library's own reader — no Iceberg runtime exists in
      // this offline environment; the structural spec asserts live
      // in IcebergExportSpec.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_iexpq").toString
      val lt = new graft.sources.LogTable(s"$wh/t")
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seg",
          org.apache.spark.sql.types.StringType))),
        partitionBy = Seq("seg"))
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"), col("c_mktsegment").as("seg"))
      lt.append(cust.filter(col("k") <= 120))
      graft.sources.IcebergExport.exportIcebergMetadata(s, lt) // v1
      lt.delete(s, col("k") % 10 === 0)  // CoW — stays exportable
      graft.sources.IcebergExport.exportIcebergMetadata(s, lt) // v2
      graft.sources.IcebergExport.loadIceberg(s, lt.path)
        .select(col("k"), col("name"), col("seg")).orderBy("k")
    }),

    "log_table_protocol" -> ((s, d) => {
      // round-12 PROTOCOL / table-feature gating (Delta PROTOCOL.md
      // discipline): create records a protocol action; the commit
      // choke point auto-upgrades it when a commit first activates
      // a gated feature (the first deletion vector, row tracking);
      // a reader REFUSES a table demanding unknown reader features
      // by NAME instead of half-reading it, and unknown writer
      // features fence commits while reads keep working. The row
      // counts tie every fixture state to the customer table.
      import s.implicits._
      val wh = java.nio.file.Files
        .createTempDirectory("graft_protoq").toString
      val ticks = Iterator(1000L, 2000L) ++ Iterator.continually(3000L)
      val lt = new graft.sources.LogTable(s"$wh/t", () => ticks.next())
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"))
      lt.append(cust.filter(col("k") <= 100).repartition(1))   // v0
      lt.deleteMor(s, col("k") <= 50)                          // v1 DV
      lt.enableRowTracking()                                   // v2
      def feats(v: Long): String = lt.protocolAt(Some(v)).get
        .readerFeatures.toSeq.sorted.mkString(",")
      def rowsAt(v: Long): Long = lt.load(s, Some(v)).count()
      // a FUTURE writer's unknown reader feature → refusal BY NAME
      val rt = new graft.sources.LogTable(s"$wh/r")
      rt.append(cust.filter(col("k") <= 10).repartition(1))
      rt.commitProtocol(graft.sources.Protocol(1, 1,
        Set("futureFeatureX"), Set.empty))
      val readerRefused =
        try { new graft.sources.LogTable(s"$wh/r").load(s).count(); 0L }
        catch { case e: IllegalStateException
            if e.getMessage.contains("futureFeatureX") => 1L }
      // unknown WRITER feature → commits fence, reads keep working
      val wt = new graft.sources.LogTable(s"$wh/w")
      wt.append(cust.filter(col("k") <= 20).repartition(1))
      wt.commitProtocol(graft.sources.Protocol(1, 1,
        Set.empty, Set("writerFeatureY")))
      val fresh = new graft.sources.LogTable(s"$wh/w")
      val writerRefused =
        try { fresh.append(cust.filter(col("k") === 200L)); 0L }
        catch { case e: IllegalStateException
            if e.getMessage.contains("writerFeatureY") => 1L }
      val stillReadable = fresh.load(s).count()
      Seq(
        ("features", "v0", feats(0), rowsAt(0)),
        ("features", "v1", feats(1), rowsAt(1)),
        ("features", "v2", feats(2), rowsAt(2)),
        ("gate", "reader", "refused", readerRefused),
        ("gate", "writer", "refused", writerRefused),
        ("gate", "writer", "readable_rows", stillReadable))
        .toDF("surface", "item", "detail", "num")
        .orderBy("surface", "item", "detail")
    }),

    "log_table_analyze" -> ((s, d) => {
      // ANALYZE TABLE as data: one distributed pass computes exact
      // per-column NDV / null count / min / max + the table's
      // logical row count, commits them to TBLPROPERTIES (metadata-
      // only), and returns them as rows. The fixture injects nulls
      // (BUILDING → NULL) and MOR-deletes every 7th key first, so
      // the pass must honor deletion vectors — the numbers are over
      // the LOGICAL table, which is exactly what the oracle computes
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val cat = s"ganalyze_$tag"
      if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
        s.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.GraftTableCatalog].getName)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_loganalyze")
            .toString)
      }
      val tbl = s"t_${System.nanoTime()}"
      val lt = new graft.sources.LogTable(
        s"${s.conf.get(s"spark.sql.catalog.$cat.warehouse")}/$tbl")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_nationkey").cast("long").as("nat"),
        when(col("c_mktsegment") === "BUILDING", lit(null))
          .otherwise(col("c_mktsegment")).as("seg"))
      lt.append(cust.filter(col("k") <= 500))
      lt.deleteMor(s, col("k") % 7 === 0)
      s.sql(s"CALL $cat.analyze_table('$tbl')")
        .select(col("column").as("col"), col("ndv"), col("nulls"),
          col("min").as("min_v"), col("max").as("max_v"),
          col("row_count").as("n_rows"))
        .orderBy(col("col"))
    }),

    "log_table_rowids" -> ((s, d) => {
      // ROW TRACKING (Delta row tracking / Iceberg v3 row lineage):
      // each row's stable id is assigned at commit as METADATA
      // (baseRowId + parquet position — an append's id cost is one
      // long in the log) and survives a DV delete (positions
      // untouched), a copy-on-write UPDATE (survivors and post-
      // images materialize their ids into the rewritten file) and
      // OPTIMIZE (bin-pack merge). Two ordered single-file appends
      // make the ids deterministic: global insert order = key order,
      // so id = rank - 1 — exactly what the oracle's ROW_NUMBER
      // computes over the SAME insert set, with deletes and the
      // update applied on top
      val dir = java.nio.file.Files.createTempDirectory("graft_rowids")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seg",
          org.apache.spark.sql.types.StringType))),
        properties = Map(
          graft.sources.LogTable.PropRowTracking -> "true"))
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"))
      lt.append(cust.filter(col("k") <= 100)
        .repartition(1).sortWithinPartitions("k"))
      lt.append(cust.filter(col("k") > 100 && col("k") <= 200)
        .repartition(1).sortWithinPartitions("k"))
      lt.deleteMor(s, col("k") % 10 === 0)
      lt.update(s, col("k") <= 50, Map("seg" -> lit("PRIME")))
      lt.compactFiles(s)
      lt.loadWithRowIds(s)
        .select(col("k"), col("seg"), col("_row_id").as("row_id"))
        .orderBy(col("k"))
    }),

    "log_table_expire" -> ((s, d) => {
      // EXPIRE SNAPSHOTS (Iceberg expire_snapshots / Delta log
      // retention): bound the METADATA — five commits, then keep the
      // newest three; a checkpoint anchored AT the floor keeps every
      // retained version bit-replayable while pre-floor commit
      // entries delete. Time travel below the floor must fail with
      // the expiry error (asserted inline); the surviving state is
      // what the oracle recomputes
      val dir = java.nio.file.Files.createTempDirectory("graft_expire")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"))
      lt.append(cust.filter(col("k") <= 100))
      lt.append(cust.filter(col("k") > 100 && col("k") <= 200))
      lt.append(cust.filter(col("k") > 200 && col("k") <= 300))
      lt.append(cust.filter(col("k") > 300 && col("k") <= 400))
      lt.delete(s, col("k") % 9 === 0)
      val dropped = lt.expireSnapshots(retainLast = 3)
      require(dropped.nonEmpty, "expiry must drop pre-floor metadata")
      require(lt.versions.size == 3, "exactly the window survives")
      val belowFloorFails =
        try { lt.load(s, Some(0L)).count(); false }
        catch { case _: IllegalStateException => true }
      require(belowFloorFails, "below-floor time travel must refuse")
      lt.load(s).orderBy(col("k"))
    }),

    "log_table_widen" -> ((s, d) => {
      // TYPE WIDENING (Delta's typeWidening): ALTER COLUMN TYPE as a
      // metadata-only commit — int files upcast to BIGINT, float to
      // DOUBLE, decimal grows precision, all AT SCAN TIME (zero
      // bytes rewritten at any table size; Spark 4's readers do the
      // upcast natively, both vectorized and row-based). The query
      // widens three columns, then appends a row only the WIDE
      // types can hold; the oracle recomputes both generations
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_widen")
      val lt = new graft.sources.LogTable(s"$dir/t")
      lt.append(t(s, d, "customer").select(
        col("c_custkey").cast("int").as("k"),
        (col("c_custkey") % 1000).cast("decimal(10,2)").as("bal"),
        col("c_acctbal").cast("float").as("f")))
      lt.widenColumnType(s, "k", org.apache.spark.sql.types.LongType)
      lt.widenColumnType(s, "bal",
        org.apache.spark.sql.types.DecimalType(22, 4))
      lt.widenColumnType(s, "f", org.apache.spark.sql.types.DoubleType)
      lt.append(Seq((6000000000L, BigDecimal("123456789.2500"), 0.5))
        .toDF("k", "bal", "f"))
      lt.load(s).select(col("k"), col("bal").cast("double").as("bal"),
        col("f")).orderBy(col("k"))
    }),

    "log_table_clusterby" -> ((s, d) => {
      // WRITE-TIME CLUSTERING (Delta's CLUSTER BY): with
      // graft.clusterBy every write locally sorts by the key (tight
      // per-file stats, no shuffle) and OPTIMIZE range-partitions on
      // it — four interleaved appends would leave every file
      // spanning the whole key domain under plain bin-packing; here
      // the compacted files' ranges are provably disjoint (required
      // inline off the committed stats). The oracle recomputes the
      // content — layout must be invisible to it
      val dir = java.nio.file.Files.createTempDirectory("graft_clby")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val cust = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_acctbal").as("bal"))
      lt.create(cust.schema, properties = Map(
        graft.sources.LogTable.PropClusterBy -> "k"))
      (0 until 4).foreach(i =>
        lt.append(cust.filter(col("k") % 4 === i).repartition(1)))
      val totalBytes = lt.liveAdds().map(_.bytes).sum
      lt.compactFiles(s, targetBytes = math.max(1L, totalBytes / 3))
      val bounds = lt.liveAdds().map { a =>
        val st = a.stats("k")
        (st.min.get.asInstanceOf[Long], st.max.get.asInstanceOf[Long])
      }.sortBy(_._1)
      require(bounds.size >= 2, s"expected >=2 compacted files")
      bounds.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) => require(aMax < bMin,
          s"compacted ranges overlap: $bounds")
        case _ => ()
      }
      lt.load(s).orderBy(col("k"))
    }),

    "log_table_autocompact" -> ((s, d) => {
      // AUTO COMPACTION (Delta's autoOptimize.autoCompact): with
      // graft.autoCompact.enabled the many-small-appends ingest
      // pattern self-heals — the append that brings a scope to
      // minNumFiles small files runs a follow-on best-effort
      // bin-pack commit. Five single-file appends under
      // minNumFiles=4: the 4th triggers ONE optimize (4 files → 1),
      // the 5th leaves 2 files (census reset below threshold). The
      // inline requires pin the file/commit contract; the oracle
      // recomputes the data — compaction must be invisible to it
      val dir = java.nio.file.Files.createTempDirectory("graft_autoc")
      val lt = new graft.sources.LogTable(s"$dir/t")
      val sup = t(s, d, "supplier").select(col("s_suppkey").as("k"),
        col("s_name").as("name"), col("s_acctbal").as("bal"))
      lt.create(sup.schema, properties = Map(
        graft.sources.LogTable.PropAutoCompact -> "true",
        graft.sources.LogTable.PropAutoCompactMinFiles -> "4"))
      (0 until 5).foreach(i =>
        lt.append(sup.filter(col("k") % 5 === i).repartition(1)))
      val nOpt = lt.history(s).filter(col("op") === "optimize").count()
      require(nOpt == 1L, s"expected exactly one auto-compact, got $nOpt")
      val nFiles = lt.load(s).inputFiles.length
      require(nFiles == 2,
        s"expected compacted+fresh = 2 files, got $nFiles")
      lt.load(s).orderBy(col("k"))
    }),

    "bucketed_join" -> ((s, d) => {
      // the shuffle paid at write time: both facts bucketed by the
      // join key co-locate, so the join plans with zero exchange
      // (asserted in LayoutSpec)
      // project to the query's columns before the write: bucket
      // files carry only what downstream joins need
      val tag = java.lang.Integer.toHexString(d.hashCode)
      Tables.writeBucketed(
        t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        s"g_orders_$tag", s"/tmp/graft_buckets_$tag/orders", 16,
        Seq("o_orderkey"))
      Tables.writeBucketed(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
        s"g_lineitem_$tag", s"/tmp/graft_buckets_$tag/lineitem", 16,
        Seq("l_orderkey"))
      s.table(s"g_orders_$tag")
        .join(s.table(s"g_lineitem_$tag"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double")
            .as("total_price"))
        .orderBy(col("o_orderpriority"))
    }),

    "partitioned_scan" -> ((s, d) => {
      // hive-style partition layout: the event_type predicate becomes
      // a PartitionFilter (whole directories skipped, no data read)
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val path = s"/tmp/graft_part_$tag/events"
      Tables.writePartitioned(t(s, d, "events"), path, Seq("event_type"))
      s.read.parquet(path)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(28,6)")).cast("double")
            .as("total_value"))
        .orderBy(col("user_id"))
        .select(col("user_id"), col("n_events"), col("total_value"))
    }),

    "pipeline_e2e" -> ((s, d) => {
      // the reference's full per-table loop: two raw batches (orders
      // split at 1998) staged latest-per-key and SCD2-merged in
      // sequence into a customer-keyed dimension
      val cfg = Pipeline.TableConfig("cust_orders",
        keyCols = Seq("o_custkey"),
        attrCols = Seq("o_orderpriority", "o_totalprice"),
        recencyCols = Seq("o_orderdate", "o_orderkey"))
      val orders = t(s, d, "orders")
      val split = lit("1998-01-01").cast("timestamp")
      val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val ts2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
      val dim0 = Pipeline.emptyDim(s, orders, cfg)
      // materialize increment 1 before increment 2 consumes it: the
      // SCD2 merge reads its dim side in BOTH the classification and
      // close legs, so an unmaterialized dim1 re-runs batch 1's whole
      // staging per leg — the checkpoint is the in-memory stand-in
      // for the per-increment sink commit every real pipeline does
      // (dim_sink_e2e's shape)
      val dim1 = org.apache.spark.sql.GraftPlanReset.checkpointLeaf(
        Pipeline.runIncrement(
          orders.filter(col("o_orderdate") < split), dim0, cfg, "b1", ts1))
      val dim2 = Pipeline.runIncrement(
        orders.filter(col("o_orderdate") >= split), dim1, cfg, "b2", ts2)
      dim2.select(col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice"), ntz(col("valid_from")).as("valid_from"),
        ntz(col("valid_to")).as("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"))
    }),

    "skew_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(li, o, Seq("l_orderkey"), salts = 8,
        saltBy = struct(col("l_orderkey"), col("l_linenumber")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double")
            .as("total_price"))
        .orderBy(col("o_orderpriority"))
    }),

    "skew_join_adaptive" -> ((s, d) => {
      // hot keys (orders with >=5 line items here) get salted ×4;
      // cold keys join plain — dim amplification only where skew is.
      // Row-identical to the plain join, same oracle as skew_join.
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Skew.adaptiveSaltedJoin(li, o, Seq("l_orderkey"), salts = 4,
        saltBy = struct(col("l_orderkey"), col("l_linenumber")),
        hotThreshold = 5L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double")
            .as("total_price"))
        .orderBy(col("o_orderpriority"))
    }),

    "skew_distinct" -> ((s, d) =>
      Skew.skewedDistinctCount(t(s, d, "lineitem"), Seq("l_orderkey"),
        "l_suppkey", salts = 16)
        .orderBy(col("l_orderkey"))),

    // §2.2 relational analytics -----------------------------------
    "q1_pricing" -> ((s, d) => Analytics.q1Pricing(t(s, d, "lineitem"))),

    "q3_shipping" -> ((s, d) =>
      Analytics.q3Shipping(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"))
        .select(col("l_orderkey"), ntz(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))),

    "q5_local_volume" -> ((s, d) =>
      Analytics.q5LocalVolume(t(s, d, "region"), t(s, d, "nation"),
        t(s, d, "customer"), t(s, d, "supplier"), t(s, d, "orders"),
        t(s, d, "lineitem"))),

    "cube_agg" -> ((s, d) => Analytics.cubeAgg(t(s, d, "documents"))),

    "q10_returned_items" -> ((s, d) =>
      Analytics.q10ReturnedItems(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"), t(s, d, "nation"))),

    "q18_large_orders" -> ((s, d) =>
      Analytics.q18LargeOrders(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"))
        .withColumn("o_orderdate", ntz(col("o_orderdate")))),

    "scd2_asof" -> ((s, d) =>
      // time travel on the dimension itself: the org as it stood
      // mid-month, reconstructed from version intervals — map-only
      Scd.scd2AsOf(
        Scd.scd2FromHistory(t(s, d, "events"), Seq("user_id"), "ts",
          Seq("event_type"), Seq("event_id")),
        java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
        .select(col("user_id"), col("event_type"),
          ntz(col("valid_from")).as("valid_from"))
        .orderBy(col("user_id"))),

    "schema_evolution" -> ((s, d) => {
      // lakehouse schema drift: batch 2 adds a column; mergeSchema
      // unifies on read, older rows null-filled
      val tmp = java.nio.file.Files.createTempDirectory("graft_evo")
      val p = tmp.resolve("tbl").toString
      val s1 = s.range(0, 3).selectExpr("id", "CAST(id * 10 AS LONG) AS a")
      s1.write.parquet(p + "/b=1")
      val s2 = s.range(3, 5).selectExpr("id", "CAST(id * 10 AS LONG) AS a",
        "concat('v', id) AS c")
      s2.write.parquet(p + "/b=2")
      s.read.option("mergeSchema", "true").parquet(p)
        .select(col("id"), col("a"), col("c"))
        .orderBy(col("id"))
    }),

    "scd2_deletes" -> ((s, d) => {
      // full-snapshot CDC: users with no events in the second half of
      // the month vanish from the snapshot → their current version
      // closes. The other three quadrants (new/changed/unchanged)
      // merge as usual.
      val ev = t(s, d, "events")
      val mid = lit("2024-01-15").cast("timestamp")
      val dim = Scd.scd2FromHistory(ev.filter(col("ts") < mid),
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))
      val snap = Scd.latestPerKey(ev.filter(col("ts") >= mid),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"))
      Scd.scd2ApplySnapshot(dim, snap, Seq("user_id"), Seq("event_type"),
        batchTs)
        .select(col("user_id"), col("event_type"),
          ntz(col("valid_from")).as("valid_from"),
          ntz(col("valid_to")).as("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    "vocab_topk" -> ((s, d) =>
      TextAnalysis.vocabTopK(t(s, d, "documents"), k = 20)),

    "text_normalize" -> ((s, d) =>
      TextAnalysis.normalizeText(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    "approx_topk" -> ((s, d) => {
      // the Misra-Gries sketch in its PROVABLE-exactness regime: with
      // every true frequency above n/(capacity+1) the vocabulary must
      // fit in the counters (Σfreq = n forces <capacity+1 distinct
      // terms), no decrement ever fires, and the reported lower-bound
      // min_counts ARE the true counts — so the sketch, its partials
      // and its summary merges are oracle-checkable exactly. The
      // fixture synthesizes 30 terms with DISTINCT frequencies
      // (deterministic ranks at any scale factor / partitioning);
      // spread over 8 partitions so the merge path is exercised.
      // Full-vocabulary behavior (membership + bound) stays covered
      // by ApproxTopKSpec.
      import s.implicits._
      val corpus = (1 to 30).flatMap(i => Seq.fill(10 + i)(f"t$i%02d"))
      TextAnalysis.approxVocabTopK(
        s.createDataset(corpus).toDF("text").repartition(8),
        k = 20, capacity = 256)
    }),

    "numeric_histogram" -> ((s, d) =>
      Analytics.numericHistogram(t(s, d, "orders"), "o_totalprice")),

    "compaction" -> ((s, d) => {
      // maintenance op: fragment documents into 64 tiny files, compact
      // back shuffle-free, and prove losslessness via the aggregate
      // (the oracle computes it from the original table). The ScalaTest
      // asserts the file-count contract; here the data contract.
      val tmp = java.nio.file.Files.createTempDirectory("graft_compact")
      val frag = tmp.resolve("frag").toString
      t(s, d, "documents").repartition(64).write.mode("overwrite").parquet(frag)
      Tables.compactFiles(s, frag, tmp.resolve("opt").toString)
      s.read.parquet(tmp.resolve("opt").toString)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    }),

    "zorder_layout" -> ((s, d) => {
      // layout maintenance: rewrite orders z-ordered on (custkey,
      // totalprice) so 2-D box predicates prune files; the oracle
      // proves content preservation, LayoutSpec proves the
      // file-clustering quality
      val tmp = java.nio.file.Files.createTempDirectory("graft_zorder")
      val p = tmp.resolve("orders_z").toString
      Tables.writeZOrdered(t(s, d, "orders"), p,
        "o_custkey", "o_totalprice", nFiles = 8)
      s.read.parquet(p)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Analytics.dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_orderpriority"))
    }),

    "q2_min_cost" -> ((s, d) =>
      Analytics.q2MinCostSupplier(t(s, d, "part"), t(s, d, "supplier"),
        t(s, d, "lineitem"))),

    "q4_order_priority" -> ((s, d) =>
      Analytics.q4OrderPriority(t(s, d, "orders"), t(s, d, "lineitem"))),

    "q11_revenue_share" -> ((s, d) =>
      Analytics.q11RevenueShare(t(s, d, "supplier"), t(s, d, "lineitem"))),

    "q17_small_quantity" -> ((s, d) =>
      Analytics.q17SmallQuantity(t(s, d, "part"), t(s, d, "lineitem"))),

    "q21_late_suppliers" -> ((s, d) =>
      Analytics.q21LateSuppliers(t(s, d, "supplier"), t(s, d, "orders"),
        t(s, d, "lineitem"))),

    "q22_idle_customers" -> ((s, d) =>
      Analytics.q22IdleCustomers(t(s, d, "customer"), t(s, d, "orders"))),

    "q12_ship_priority" -> ((s, d) =>
      Analytics.q12ShipPriority(t(s, d, "orders"), t(s, d, "lineitem"))),

    "q16_supplier_cnt" -> ((s, d) =>
      Analytics.q16SupplierCnt(t(s, d, "part"), t(s, d, "supplier"),
        t(s, d, "lineitem"))),

    "q20_excess_suppliers" -> ((s, d) =>
      Analytics.q20ExcessSuppliers(t(s, d, "part"), t(s, d, "supplier"),
        t(s, d, "nation"), t(s, d, "lineitem"))),

    "q6_revenue_delta" -> ((s, d) =>
      Analytics.q6RevenueDelta(t(s, d, "lineitem"))),

    "q13_order_dist" -> ((s, d) =>
      Analytics.q13OrderDistribution(t(s, d, "customer"), t(s, d, "orders"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    "q14_promo_share" -> ((s, d) =>
      Analytics.q14PromoShare(t(s, d, "lineitem"), t(s, d, "part"))),

    "q19_disjunctive" -> ((s, d) =>
      Analytics.q19Disjunctive(t(s, d, "lineitem"), t(s, d, "part"))),

    "q7_trade_volume" -> ((s, d) =>
      Analytics.q7TradeVolume(t(s, d, "lineitem"), t(s, d, "orders"),
        t(s, d, "customer"), t(s, d, "supplier"), t(s, d, "nation"),
        "NATION_3", "NATION_7")
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))),

    "q15_top_supplier" -> ((s, d) =>
      Analytics.q15TopSupplier(t(s, d, "lineitem"), t(s, d, "supplier"))
        .orderBy(col("s_suppkey"))),

    "q8_market_share" -> ((s, d) =>
      Analytics.q8MarketShare(t(s, d, "lineitem"), t(s, d, "orders"),
        t(s, d, "customer"), t(s, d, "supplier"), t(s, d, "nation"),
        t(s, d, "region"), t(s, d, "part"), "ASIA", "NATION_2", "STANDARD")
        .orderBy(col("o_year"))),

    "q9_nation_revenue" -> ((s, d) =>
      Analytics.q9NationRevenue(t(s, d, "lineitem"), t(s, d, "orders"),
        t(s, d, "supplier"), t(s, d, "nation"), t(s, d, "part"), "%red%")
        .orderBy(col("nation"), col("o_year"))),

    "source_overlap" -> ((s, d) =>
      // exact per-pair set overlap (token-keyed equi-join) — fully
      // oracle-checkable; the HLL-sketch twin for unbounded source
      // counts keeps its error-bound coverage in TextAnalysisSpec
      TextAnalysis.sourceVocabOverlapExact(t(s, d, "documents"))
        .orderBy(col("src_a"), col("src_b"))),

    "join_blowup" -> ((s, d) => {
      // pre-flight profile of the classic accidental explosion: a
      // self-join of events on user_id (out_rows = per-user count²)
      val ev = t(s, d, "events")
      Skew.joinBlowupProfile(ev, ev, "user_id", "user_id", k = 20)
    }),

    "concurrency_profile" -> ((s, d) => {
      // deterministic span synthesis: each event opens a session of
      // 60 + (event_id % 300) seconds (same expression in the oracle),
      // then the distributed sweep line profiles peak concurrency
      val spans = t(s, d, "events").select(col("event_id"),
        col("ts").as("t0"),
        expr("timestampadd(SECOND, 60 + event_id % 300, ts)").as("t1"))
      Analytics.concurrencyProfile(spans, "event_id", "t0", "t1")
        .withColumn("hour", ntz(col("hour")))
        .orderBy(col("hour"))
    }),

    "manifest_prune" -> ((s, d) => {
      // iceberg-style file skipping without the table format: cluster
      // orders into 16 range files, build the per-file min/max
      // manifest in one distributed pass, answer a 3%-selectivity
      // price band from only the intersecting files. The oracle
      // proves the pruned read returns exactly the filtered table;
      // LayoutSpec proves files were actually skipped.
      val tmp = java.nio.file.Files.createTempDirectory("graft_manifest")
      val p = tmp.resolve("orders_clustered").toString
      t(s, d, "orders")
        .repartitionByRange(16, col("o_totalprice"))
        .sortWithinPartitions(col("o_totalprice"))
        .write.mode("overwrite").parquet(p)
      val manifest = Tables.buildManifest(s, p, "o_totalprice")
      val files = Tables.pruneFiles(manifest, lit(30000.0), lit(45000.0))
      Tables.manifestPrunedRead(s, p, files.toSeq, "o_totalprice",
          lit(30000.0), lit(45000.0))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    "fuzzy_join" -> ((s, d) => {
      // dirty registry: drop one character of each customer name at a
      // key-derived position (deterministic; same expression in the
      // oracle), then link it back to the clean registry at edit
      // distance ≤ 1 via FastSS deletion-neighborhood blocking
      val cust = t(s, d, "customer")
      val pos = (col("c_custkey") % 18).cast("int")
      val dirty = cust.select(col("c_custkey").as("dirty_id"),
        concat(col("c_name").substr(lit(1), pos),
          col("c_name").substr(pos + lit(2), length(col("c_name"))))
          .as("dirty_name"))
      Linkage.fuzzyJoinEd1(cust, "c_custkey", "c_name",
          dirty, "dirty_id", "dirty_name")
        .select(col("l_id").as("c_custkey"), col("l_name").as("c_name"),
          col("r_id").as("dirty_id"), col("r_name").as("dirty_name"),
          col("dist").cast("long").as("dist"))
        .orderBy(col("c_custkey"), col("dirty_id"))
    }),

    "fuzzy_join_ed2" -> ((s, d) => {
      // two sequential key-derived deletions (p1 on the original, p2
      // on the 17-char intermediate — same nesting in the oracle),
      // linked back at edit distance ≤ 2 via the 2-deletion
      // neighborhood. The dirty side is a deterministic 20% batch
      // (the realistic shape: incoming dirty batch ≪ master
      // registry); the full self-cross at ed ≤ 2 over SEQUENTIAL
      // zero-padded synthetic names degenerates to ~10^3 matches
      // per name — an artifact of the fixture, not the algorithm
      val cust = t(s, d, "customer")
      val p1 = (col("c_custkey") % 18).cast("int")
      val n1 = concat(col("c_name").substr(lit(1), p1),
        col("c_name").substr(p1 + lit(2), length(col("c_name"))))
      val p2 = (col("c_custkey") % 17).cast("int")
      val dirty = cust.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("dirty_id"),
          concat(n1.substr(lit(1), p2), n1.substr(p2 + lit(2), length(n1)))
            .as("dirty_name"))
      Linkage.fuzzyJoinEd(cust, "c_custkey", "c_name",
          dirty, "dirty_id", "dirty_name", maxDist = 2)
        .select(col("l_id").as("c_custkey"), col("l_name").as("c_name"),
          col("r_id").as("dirty_id"), col("r_name").as("dirty_name"),
          col("dist").cast("long").as("dist"))
        .orderBy(col("c_custkey"), col("dirty_id"))
    }),

    "moving_window" -> ((s, d) =>
      Analytics.movingWindow(t(s, d, "events"))
        .withColumn("ts", ntz(col("ts")))
        .orderBy(col("user_id"), col("event_id"))),

    "ntile_bands" -> ((s, d) =>
      Analytics.ntileBands(t(s, d, "orders"))),

    "rank_features" -> ((s, d) =>
      Analytics.rankFeatures(t(s, d, "orders"))),

    "grouping_sets" -> ((s, d) =>
      Analytics.groupingSetsAgg(t(s, d, "orders"))),

    "json_extract" -> ((s, d) =>
      Analytics.jsonExtractAgg(t(s, d, "events"))),

    "funnel_steps" -> ((s, d) =>
      Analytics.funnel(t(s, d, "events"))),

    "retention_cohorts" -> ((s, d) =>
      Analytics.retentionCohorts(t(s, d, "events"))
        .withColumn("cohort_week", ntz(col("cohort_week")))
        .withColumn("act_week", ntz(col("act_week")))),

    "unpivot_long" -> ((s, d) => {
      // reshape completeness: melt the pivoted wide table back to
      // long form — unpivot(pivot(x)) recovers the per-(user, type)
      // counts the oracle computes directly. The type list is a
      // static registry (pivot's API needs plan-time literals); the
      // union branch makes the registry DRIFT-SAFE without the old
      // eager distinct+collect job: any event type outside the
      // registry surfaces as ordinary long-form rows — identical to
      // the oracle's direct group-by — instead of silently dropping.
      // One lazy plan, no driver-side type-derivation scan (the
      // round-5 bench regression).
      val types = Seq("click", "error", "purchase", "signup", "view")
      val novel = t(s, d, "events")
        .filter(!col("event_type").isin(types: _*))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      Analytics.pivotAgg(t(s, d, "events"), types)
        .unpivot(Array(col("user_id")), types.map(col).toArray,
          "event_type", "n")
        .filter(col("n") > 0)
        .unionByName(novel)
        .orderBy(col("user_id"), col("event_type"))
    }),

    "moment_stats" -> ((s, d) =>
      Analytics.momentStats(t(s, d, "lineitem"))),

    "agg_maintain" -> ((s, d) => {
      // incremental view maintenance: fold three yearly batches into
      // the per-customer aggregate state — the final state must be
      // bit-identical to a from-scratch group-by (the oracle)
      val o = t(s, d, "orders")
      val cut1 = lit("1997-01-01").cast("timestamp")
      val cut2 = lit("1999-01-01").cast("timestamp")
      val keys = Seq("o_custkey")
      val s0 = Analytics.emptyCountSum(s, o, keys)
      val s1 = Analytics.maintainCountSum(s0,
        o.filter(col("o_orderdate") < cut1), keys, "o_totalprice")
      val s2 = Analytics.maintainCountSum(s1,
        o.filter(col("o_orderdate") >= cut1 && col("o_orderdate") < cut2),
        keys, "o_totalprice")
      val s3 = Analytics.maintainCountSum(s2,
        o.filter(col("o_orderdate") >= cut2), keys, "o_totalprice")
      Analytics.finalizeCountSum(s3).orderBy(col("o_custkey"))
    }),

    "set_reconcile" -> ((s, d) => {
      val ev = t(s, d, "events")
      val mid = lit("2024-01-16").cast("timestamp")
      Analytics.setReconcile(
        ev.filter(col("ts") < mid).select(col("user_id")),
        ev.filter(col("ts") >= mid).select(col("user_id")),
        "h1_only", "h2_only")
        .orderBy(col("cohort"), col("user_id"))
    }),

    "topk_per_group" -> ((s, d) =>
      Analytics.topKPerGroup(t(s, d, "orders"), Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))),

    "rollup_agg" -> ((s, d) =>
      Analytics.rollupAgg(t(s, d, "region"), t(s, d, "nation"),
        t(s, d, "customer"), t(s, d, "orders"))),

    "anti_semi_join" -> ((s, d) =>
      Analytics.customersWithoutOrders(t(s, d, "customer"),
        t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")))),

    "semi_join" -> ((s, d) =>
      Analytics.customersWithOrders(t(s, d, "customer"),
        t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")))),

    "windowed_events" -> ((s, d) =>
      Analytics.windowedEvents(t(s, d, "events"))
        .withColumn("win_start", ntz(col("win_start")))),

    "rate_spikes" -> ((s, d) =>
      // hourly per-type anomaly flags by integer cross-multiplication
      // (n·hours > 2·total) — no float mean, engine-exact
      Analytics.rateSpikes(t(s, d, "events"))
        .withColumn("hour", ntz(col("hour")))
        .orderBy(col("event_type"), col("hour"))),

    "dq_profile" -> ((s, d) =>
      // per-column null/distinct audit in one scan, long form
      Analytics.dqProfile(t(s, d, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
        .orderBy(col("col_name"))),

    "sessionize" -> ((s, d) =>
      Analytics.sessionize(t(s, d, "events"))
        .withColumn("session_start", ntz(col("session_start")))
        .withColumn("session_end", ntz(col("session_end")))),

    "percentiles" -> ((s, d) => Analytics.percentiles(t(s, d, "orders"))),

    "approx_percentiles" -> ((s, d) =>
      Analytics.approxPercentiles(t(s, d, "orders"))),

    "running_agg" -> ((s, d) =>
      Analytics.runningAgg(t(s, d, "orders"))
        .withColumn("o_orderdate", ntz(col("o_orderdate")))),

    "pivot_agg" -> ((s, d) =>
      Analytics.pivotAgg(t(s, d, "events"),
        Seq("click", "error", "purchase", "signup", "view"))),

    "distinct_count" -> ((s, d) =>
      Analytics.distinctCounts(t(s, d, "events"))),

    "approx_distinct" -> ((s, d) =>
      Analytics.approxDistinctCounts(t(s, d, "events"))),

    "interval_join" -> ((s, d) => {
      // SCD2 lookup: each event joined to the dimension version
      // whose [valid_from, valid_to) covers its timestamp
      val ev = t(s, d, "events")
      val facts = ev.select(col("event_id"), col("user_id"), col("ts"))
      val dim = Scd.scd2FromHistory(ev, Seq("user_id"), "ts",
        Seq("event_type"), Seq("event_id"))
      Temporal.intervalJoin(facts, "user_id", "ts", dim, "user_id")
        .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
          col("event_type"), ntz(col("valid_from")).as("valid_from"))
        .orderBy(col("event_id"))
    }),

    "asof_join" -> ((s, d) =>
      Temporal.asOfJoin(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("ts")),
        "user_id", "ts",
        t(s, d, "orders"), "o_custkey", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
          col("o_orderkey").as("last_order_key"),
          col("o_totalprice").as("last_order_total"))
        .orderBy(col("event_id"))),

    "asof_tolerance" -> ((s, d) => {
      // forward as-of with a 48 h tolerance: each view's NEXT
      // purchase by the same user, if it came within two days —
      // matches outside the window null out (left-outer semantics)
      val ev = t(s, d, "events")
      Temporal.asOfJoinDirected(
        ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts")),
        "user_id", "ts",
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("p_id")),
        "p_user", "p_ts",
        Seq("p_id"), forward = true, toleranceSeconds = 48L * 3600)
        .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
          col("p_id").as("next_purchase_id"))
        .orderBy(col("event_id"))
    }),

    "gap_fill" -> ((s, d) =>
      // time-series densification: every hour between a user's first
      // and last event, absent hours at count 0 — the resample a
      // rate model needs (a bare groupBy silently skips empty
      // buckets). Grid = per-key sequence explode (∝ span hours),
      // joined back on (key, hour); both shuffles key-bounded
      Temporal.gapFillCounts(t(s, d, "events")
        .filter(col("user_id") <= 200))
        .select(col("user_id"), ntz(col("hour")).as("hour"), col("cnt"))
        .orderBy(col("user_id"), col("hour"))),

    "locf_fill" -> ((s, d) =>
      // gap-fill with last-observation-carried-forward: hourly mean
      // value (decimal-exact sum / count), gaps carrying the latest
      // observed hour forward — the streaming-safe no-look-ahead fill
      Temporal.locfFill(t(s, d, "events")
        .filter(col("user_id") <= 200), "user_id", "ts", "value")
        .select(col("user_id"), ntz(col("hour")).as("hour"), col("v"))
        .orderBy(col("user_id"), col("hour"))),

    "dup_clusters" -> ((s, d) => {
      // the 100 TB path demonstrated end-to-end: pairs come from the
      // LSH-bucketed minhash join (linear + bucket shuffles — no
      // CartesianProduct anywhere in this plan), clustered by
      // min-label propagation. The oracle recomputes the same pairs
      // as exact shingle-set jaccard and clusters via recursive CTE.
      val docs = t(s, d, "documents")
      val pairs = Dedup.minhashLsh(docs, threshold = 0.5)
      Clustering.dupClusters(docs.select(col("doc_id")), "doc_id", pairs)
        .orderBy(col("doc_id"))
    }),

    // §2.3 dedup family -------------------------------------------
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents")).orderBy(col("keep_id"))),

    "dedup_keep_best" -> ((s, d) =>
      Dedup.exactKeepBest(t(s, d, "documents"), scoreCol = "n_chars")
        .orderBy(col("keep_id"))),

    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(t(s, d, "documents"), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // incremental ingest admission: the corpus is docs < 400, the
    // arriving batch is docs >= 400 — same LSH parameters as
    // dedup_minhash_lsh, so the exact-jaccard oracle's pair set is
    // the already-verified one restricted to (corpus×batch ∪ intra)
    "dedup_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.incrementalDedup(
        docs.filter(col("doc_id") < 400),
        docs.filter(col("doc_id") >= 400), threshold = 0.5)
        .orderBy(col("doc_id"))
    }),

    // round-8: oracle-checkable — the declarative token hash (two
    // modular char-poly residues) replaces xxh64, so DuckDB
    // recomputes fingerprints, the banded candidate condition AND
    // the hamming verify bit-for-bit (was rows-only)
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), maxHamming = 10,
        declarativeHash = true)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))),

    "segment_dedup" -> ((s, d) =>
      Dedup.segmentDupStats(t(s, d, "documents"), k = 8)
        .orderBy(col("doc_id"))),

    "ngram_jaccard" -> ((s, d) => {
      // ABSOLUTE stop-gram cap: grams in more than 500 docs carry no
      // dedup signal no matter how big the corpus is, so the cap
      // must NOT scale with it — a fractional cap keeps
      // fraction-stable grams (stop-grams, long-word interiors)
      // whose df grows ∝ n, and their Σ df² contribution grows ∝ n²
      // (measured: the 10%-of-corpus cap made the sf0.1→sf1 sweep
      // exponent 2.0; the absolute cap is the standard web-scale
      // similarity-join posture and restores ~linear scaling, with
      // candidate generation bounded by cap·|postings|).
      Dedup.ngramJaccard(t(s, d, "documents"), threshold = 0.8,
        maxDf = 500L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "budget_sample" -> ((s, d) =>
      // token-budget assembly: "30k chars of en, 10k of de, all the
      // rest" as one deterministic hash-ordered prefix per stratum;
      // the oracle runs the equivalent single-window formulation
      Mixing.tokenBudgetSample(t(s, d, "documents"), "lang", "doc_id",
        "n_chars", Map("en" -> 30000L, "de" -> 10000L))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // round-8: oracle-checkable — SemDeDup under the kmeans_assign
    // DETERMINISTIC cell model (per-label decimal-mean centroids +
    // argmax-dot assignment): cells, intra-cell cosine pairs at the
    // threshold, connected components, and the min-label collapse
    // are all declaratively recomputable in DuckDB (a composition
    // of the kmeans_assign + dedup_embedding + dup_clusters oracle
    // techniques). Lloyd's-TRAINED cells (model-dependent output by
    // construction) ride the same semanticCollapse code path and
    // stay covered by DedupSpec's planted-cluster recovery.
    "semantic_dedup" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cRows = Similarity.groupCentroids(emb, "label")
        .select(col("label").cast("int"), col("dim").cast("int"),
          col("centroid").cast("float")).collect()
      val labels = cRows.map(_.getInt(0)).distinct.sorted.toSeq
      val cents: Seq[Seq[Float]] = labels.map(l =>
        cRows.filter(_.getInt(0) == l).sortBy(_.getInt(1))
          .map(_.getFloat(2)).toSeq)
      val idx = graft.plans.IvfExpressions.topCentroids(
        col("embedding"), cents, 1)(0)
      val cells = emb.select(col("vec_id"), col("embedding"),
        element_at(typedLit(labels), idx + 1).as("cell"))
      Dedup.semanticCollapse(cells, threshold = 0.4)
        .select(col("vec_id"), col("rep_id"), col("cell"))
        .orderBy(col("vec_id"))
    }),

    "dedup_embedding" -> ((s, d) =>
      // exact cosine join at a LOW threshold (0.4): the fixture's true
      // pairs sit just above it (min 0.40001) against a background p99
      // of 0.287, so no LSH banding can reach oracle recall here — the
      // tiled 1-Bucket-Theta equi-join distributes the irreducible
      // all-pairs work with no CartesianProduct (plan asserted in
      // DedupSpec); the sub-quadratic high-threshold path is
      // Dedup.embeddingNearDupLsh (recall-tested in DedupSpec)
      // blocks sized to cover the core count with tiles
      // (b·(b+1)/2 tasks): more blocks only adds replication volume
      Dedup.embeddingNearDup(t(s, d, "embeddings"), threshold = 0.4,
        blocks = 8)
        .orderBy(col("id_a"), col("id_b"))),

    "decontaminate" -> ((s, d) => {
      // benchmark hygiene: doc_id % 10 == 0 plays the eval set, the
      // rest the training corpus; a train doc sharing any 4-word
      // shingle with the eval set is dropped.
      val docs = t(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      Decontam.decontaminate(train, bench, n = 4)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "contamination_score" -> ((s, d) => {
      // the audit variant: a full scorecard over the training corpus
      // (zero-hit docs kept) with an exact integer basis-points
      // overlap fraction — thresholdable downstream at any level.
      val docs = t(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      Decontam.contaminationScore(train, bench, n = 4)
        .orderBy(col("doc_id"))
    }),

    "chunk_docs" -> ((s, d) =>
      // RAG chunking: 240-char windows, 60-char overlap, stable
      // (doc_id, chunk_id, chunk_start) lineage; map-only plan
      TextAnalysis.chunkDocs(t(s, d, "documents"), size = 240,
        overlap = 60)
        .orderBy(col("doc_id"), col("chunk_id"))),

    "weighted_sample" -> ((s, d) =>
      // PPS systematic sampling by doc length: expected sample =
      // total_chars/stride docs, inclusion probability ∝ n_chars,
      // hash-deterministic; two-phase windows, no global sort
      Mixing.weightedSystematicSample(t(s, d, "documents"), "doc_id",
        "n_chars", stride = 5000L)
        .orderBy(col("doc_id"))),

    "decontaminate_bloom" -> ((s, d) => {
      // the same overlap through the 100 TB path: a Bloom filter
      // built over the eval shingles by a distributed aggregate,
      // attached as a scalar subquery, prefilters the corpus before
      // the exact semi-join — identical output (no false negatives),
      // same oracle as the exact path's hit counts.
      val docs = t(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      Decontam.contaminationHitsBloom(train, bench, n = 4,
        expectedBenchShingles = 100000L)
        .orderBy(col("doc_id"))
    }),

    "corpus_curation" -> ((s, d) => {
      // the whole training-data pipeline end-to-end: quality gate →
      // exact dedup → minhash near-dup clustering → one
      // representative per cluster, annotated with language and
      // token counts. Every stage is an operator verified on its own
      // above; this entry proves they compose as one plan.
      // quality gate INLINE (a map-only filter — no join of
      // qualityScore output back by id), exact dedup as a window over
      // 16-byte hashed keys (one shuffle, no keep-id rejoin), lang +
      // token annotations computed inline on the curated base (no
      // self-joins). The only joins left are the ones that carry new
      // information: the LSH pair join and the representatives join.
      val docs = t(s, d, "documents")
      val kept = docs.filter(
        TextAnalysis.qualityFilter(col("text"), minWords = 5,
          maxPunctRatio = 0.25))
      val wDedup = org.apache.spark.sql.expressions.Window
        .partitionBy(length(col("text")), xxhash64(col("text")))
        .orderBy(col("doc_id"))
      // the curated base is scanned by the minhash pair join (both
      // sides), cluster vertices and the final annotation pass —
      // persist once instead of recomputing the gate + dedup window
      val uniq = kept.withColumn("__rn", row_number().over(wDedup))
        .filter(col("__rn") === 1).drop("__rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = Dedup.minhashLsh(uniq, threshold = 0.5)
      val clusters = Clustering.dupClusters(
        uniq.select(col("doc_id")), "doc_id", pairs)
      val sizes = clusters.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      val reps = clusters.filter(col("is_representative"))
        .join(sizes, "cluster_id")
        .select(col("doc_id"), col("n_members"))
      uniq.select(col("doc_id"),
          TextAnalysis.langId(col("text")).as("lang_guess"),
          TextAnalysis.bpeTokenCount(col("text")).cast("long")
            .as("n_bpe_tokens"))
        .join(reps, "doc_id")
        .orderBy(col("doc_id"))
    }),

    // §2.4 similarity search --------------------------------------
    "ann_bruteforce" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(
        emb.filter(pmod(col("vec_id"), lit(25)) === 0), emb, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "ann_lsh" -> ((s, d) => {
      // bits auto-scale with the corpus (constant bucket occupancy):
      // a fixed plane count makes candidate pairs quadratic when
      // corpus and query batch both grow with the data — measured
      // 90 s at sf1 vs 1.5 s at sf0.1 under a pinned bits=4.
      // Round-11 oracle conversion: the corpus is the PLANTED
      // exact-regime fixture (sized from the embeddings table, so it
      // still scales with SF) — every cluster's members share one
      // bit-pattern vector, so bucket membership is deterministic
      // under ANY plane seed and the approximate result provably
      // equals exact brute-force top-k, which DuckDB recomputes
      // with integer popcount math.
      // bits auto-size inside lshTopK (one source of truth for the
      // constant-occupancy rule); its count() runs over the
      // range-derived fixture frame — no table scan
      val emb = plantedClusters(s, plantedClusterCount(s, d))
      Similarity.lshTopK(
        emb.filter(pmod(col("vec_id"), lit(25)) === 0), emb, k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    "kmeans_assign" -> ((s, d) => {
      // the assignment half of Lloyd's under a DETERMINISTIC model:
      // centroids are the per-label means (groupCentroids' decimal-
      // summed, bit-reproducible aggregate — its own oracle is
      // green), and the argmax-dot assignment runs through the same
      // codegen'd topCentroids kernel k-means training uses, so the
      // whole entry is declaratively recomputable in DuckDB
      // (round-7: was rows-only). TRAINING (init + iterations) has
      // model-dependent output by construction and stays covered by
      // the planted-cluster recovery spec (SimilaritySpec).
      val emb = t(s, d, "embeddings")
      val cRows = Similarity.groupCentroids(emb, "label")
        .select(col("label").cast("int"), col("dim").cast("int"),
          col("centroid").cast("float")).collect()
      val labels = cRows.map(_.getInt(0)).distinct.sorted.toSeq
      val cents: Seq[Seq[Float]] = labels.map(l =>
        cRows.filter(_.getInt(0) == l).sortBy(_.getInt(1))
          .map(_.getFloat(2)).toSeq)
      val idx = graft.plans.IvfExpressions.topCentroids(
        col("embedding"), cents, 1)(0)
      emb.select(col("vec_id"), col("label"),
          element_at(typedLit(labels), idx + 1).as("assigned_label"))
        .orderBy(col("vec_id"))
    }),

    "ann_ivf" -> ((s, d) => {
      // planted exact regime (see ann_lsh): identical-vector cluster
      // members share a Voronoi cell under ANY trained centroids and
      // a query's probe set contains its own cell, so IVF equals
      // exact top-k by construction — the DuckDB oracle is the plain
      // exact ranking.
      val emb = plantedClusters(s, plantedClusterCount(s, d))
      Similarity.ivfTopK(
        emb.filter(pmod(col("vec_id"), lit(25)) === 0), emb, k = 3,
        nlist = 32, nprobe = 8)
        .orderBy(col("query_id"), col("rank"))
    }),

    "ann_index" -> ((s, d) => {
      // persisted-index ANN (build/probe split): the corpus-scale
      // bucketing pass happens once at BUILD, probes join the stored
      // cid partitions with the kernel on the query side only (plan
      // asserted in AnnIndexSpec). On the planted exact-regime
      // fixture the stored-index probe equals exact top-k for the
      // same reason the in-memory IVF does (cell cohesion of
      // identical vectors), so the build/probe composition gets the
      // same DuckDB oracle.
      val dir = java.nio.file.Files.createTempDirectory("graft_annidx")
      val emb = plantedClusters(s, plantedClusterCount(s, d))
      graft.operators.AnnIndex.buildIvf(emb, s"$dir/ivf", nlist = 32,
        iters = 3)
      graft.operators.AnnIndex.ivfProbe(s, s"$dir/ivf",
        emb.filter(pmod(col("vec_id"), lit(25)) === 0), k = 3, nprobe = 8)
        .orderBy(col("query_id"), col("rank"))
    }),

    "embedding_quantize" -> ((s, d) =>
      Similarity.quantizeInt8Stats(t(s, d, "embeddings"))),

    // §2.5 text analysis ------------------------------------------
    "stratified_sample" -> ((s, d) =>
      TextAnalysis.stratifiedSample(t(s, d, "documents"), "lang",
        Map("de" -> 0.5, "en" -> 0.2), defaultRate = 0.1, idCol = "doc_id")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))),

    // §2.5b dataset assembly --------------------------------------
    "mixture_sample" -> ((s, d) =>
      Mixing.mixtureSample(t(s, d, "documents"), "lang", "doc_id",
        temperature = 0.5, maxRate = 0.8)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    "dataset_split" -> ((s, d) =>
      Mixing.datasetSplit(t(s, d, "documents"), "doc_id",
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))),

    "global_shuffle" -> ((s, d) =>
      Mixing.globalShuffle(
        t(s, d, "documents").select(col("doc_id"), col("source")),
        "doc_id", nShards = 8)
        .select(col("doc_id"), col("source"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))),

    "quantile_gate" -> ((s, d) =>
      Mixing.quantileGate(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")),
        "lang", "n_chars", q = 0.5)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("q_cutoff"))
        .orderBy(col("doc_id"))),

    "lang_id" -> ((s, d) =>
      TextAnalysis.langIdTable(t(s, d, "documents")).orderBy(col("doc_id"))),

    "tfidf_topk" -> ((s, d) =>
      TextAnalysis.tfidfTopK(t(s, d, "documents"), k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    "corpus_stats" -> ((s, d) =>
      TextAnalysis.corpusStats(t(s, d, "documents"))
        .orderBy(col("source"))),

    "group_centroids" -> ((s, d) =>
      Similarity.groupCentroids(t(s, d, "embeddings"), "label")
        .orderBy(col("label"), col("dim"))),

    "quality_score" -> ((s, d) =>
      TextAnalysis.qualityScore(t(s, d, "documents")).orderBy(col("doc_id"))),

    "token_count" -> ((s, d) =>
      TextAnalysis.tokenCounts(t(s, d, "documents")).orderBy(col("doc_id"))),

    // round-8: oracle-checkable — the fingerprint primitives are
    // declarative modular folds an external engine can recompute
    // exactly (was rows-only under xxhash64)
    "doc_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprints(t(s, d, "documents")).orderBy(col("doc_id"))),

    "repetition_stats" -> ((s, d) =>
      TextAnalysis.repetitionStats(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    "pii_redact" -> ((s, d) => {
      // the synthetic tables carry no PII, so the demo input is a
      // deterministic contact string derived from customer keys
      // (same construction in the oracle SQL) — what's under test is
      // the redaction chain, not the synthesis.
      val contact = concat(col("c_name"),
        when(pmod(col("c_custkey"), lit(2)) === 0,
          concat(lit(" user"), col("c_custkey").cast("string"),
            lit("@mail.example"))).otherwise(lit("")),
        when(pmod(col("c_custkey"), lit(3)) === 0,
          concat(lit(" tel "),
            (pmod(col("c_custkey"), lit(90)) + 10).cast("string"),
            lit("-555-123-4567"))).otherwise(lit("")),
        when(pmod(col("c_custkey"), lit(5)) === 0,
          concat(lit(" ip 10.0."),
            pmod(col("c_custkey"), lit(256)).cast("string"),
            lit(".7"))).otherwise(lit("")))
      val (ne, np, ni) = TextAnalysis.piiCounts(contact)
      t(s, d, "customer").select(col("c_custkey"),
          TextAnalysis.redactPii(contact).as("redacted"),
          ne.cast("long").as("n_emails"),
          np.cast("long").as("n_phones"),
          ni.cast("long").as("n_ips"))
        .orderBy(col("c_custkey"))
    }),

    "seq_packing" -> ((s, d) =>
      Packing.packDocuments(t(s, d, "documents"), budget = 128)
        .orderBy(col("doc_id"))),

    // §2.6 multimodal ---------------------------------------------
    // round-8: oracle-checkable — the stub dims derive from the
    // declarative char-poly residues instead of xxhash64, so DuckDB
    // recomputes the whole typed-metadata projection (was rows-only)
    "mm_schema" -> ((s, d) =>
      Multimodal.asMediaTable(t(s, d, "documents"))
        .select(col("media_id"), col("media_type"), col("meta.width"),
          col("meta.height"), col("meta.n_bytes"), col("meta.format"))
        .orderBy(col("media_id"))),

    "mm_features" -> ((s, d) => {
      // scalar projection of the feature vector: array columns crash
      // the driver's pandas-based oracle sort, and the ×255 byte sums
      // are exact integers — immune to FP summation-order noise
      val f = Multimodal.extractFeatures(
        Multimodal.asMediaTable(t(s, d, "documents")))
      f.select(col("media_id") +: (0 until 8).map(j =>
          round(col("features")(j) * 255.0, 0).cast("long").as(s"f$j")): _*)
        .orderBy(col("media_id"))
    }),

    "mm_frame_plan" -> ((s, d) =>
      Multimodal.framePlan(Multimodal.asMediaTable(t(s, d, "documents")))
        .select(col("media_id"), col("n_frames"))
        .orderBy(col("media_id"))),

    "mm_resize" -> ((s, d) =>
      Multimodal.resizeStub(
        Multimodal.asMediaTable(t(s, d, "documents")), 224, 224)
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.n_bytes").as("n_bytes"))
        .orderBy(col("media_id"))),

    "mm_dedup" -> ((s, d) =>
      Multimodal.payloadDedup(Multimodal.asMediaTable(t(s, d, "documents")))),

    "mm_decode" -> ((s, d) =>
      // REAL codec round trip (round-6): genuine PNGs rendered per
      // partition with id-derived dimensions, then the dimensions
      // decoded BACK out of the encoded bytes via javax.imageio
      // header reads — the oracle recomputes the dims arithmetically,
      // so a decode that misparses IHDR fails the compare
      Multimodal.decodeMeta(
        Multimodal.asPngMediaTable(t(s, d, "documents")))
        .orderBy(col("media_id"))),

    // §2.5c corpus curation --------------------------------------
    // The synthetic docs are single-line word bags, so the line-dedup
    // input is a deterministic multi-line "page" wrapped around each
    // document — shared nav header (even ids), per-source banner,
    // unique body, low-frequency ref line, constant footer. Identical
    // construction in the oracle SQL (pii_redact precedent): what's
    // under test is the corpus-level dedup + reassembly chain.
    "line_dedup" -> ((s, d) => {
      val page = concat_ws("\n",
        when(pmod(col("doc_id"), lit(2)) === 0,
          lit("nav home about products")),
        concat(lit("source: "), col("source")),
        col("text"),
        concat(lit("ref-"), pmod(col("doc_id"), lit(100)).cast("string")),
        lit("(c) example corpus"))
      Curation.lineDedup(
        t(s, d, "documents").select(col("doc_id"), page.as("text")),
        maxFreq = 10)
        .orderBy(col("doc_id"))
    }),

    "gopher_rules" -> ((s, d) =>
      Curation.gopherRules(t(s, d, "documents"),
        minWords = 30, maxMeanWordLen = 4.6)
        .orderBy(col("doc_id"))),

    "unigram_score" -> ((s, d) =>
      TextAnalysis.unigramSurprisal(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    "bm25_topk" -> ((s, d) =>
      TextAnalysis.bm25TopK(t(s, d, "documents"), k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    "source_cap" -> ((s, d) =>
      Curation.sourceCap(t(s, d, "documents"), cap = 10)
        .orderBy(col("source"), col("rank"))),

    "item_cooccur" -> ((s, d) =>
      Analytics.eventCooccurrence(t(s, d, "events"))
        .orderBy(col("type_a"), col("type_b"))),

    "zscore_normalize" -> ((s, d) =>
      Analytics.zscoreNormalize(t(s, d, "orders"), "o_orderpriority",
        "o_totalprice", Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    "peak_concurrency" -> ((s, d) =>
      Analytics.peakConcurrency(t(s, d, "events"))
        .orderBy(col("event_type"))),

    "event_transitions" -> ((s, d) =>
      Analytics.eventTransitions(t(s, d, "events"))
        .orderBy(col("from_type"), col("to_type"))),

    "substring_dedup" -> ((s, d) =>
      Curation.substringDedup(t(s, d, "documents"), k = 5)
        .orderBy(col("doc_id"))),

    "link_rank" -> ((s, d) =>
      Clustering.navigationRank(t(s, d, "events"), iters = 5)
        .orderBy(col("node"))),

    "classifier_score" -> ((s, d) =>
      TextAnalysis.classifierScore(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    "bpe_pair_counts" -> ((s, d) =>
      Bpe.pairCounts(t(s, d, "documents"))
        .orderBy(col("sym_a"), col("sym_b"))),

    // rows-only: iterative argmax has no single-query SQL form
    "bpe_train" -> ((s, d) =>
      Bpe.train(t(s, d, "documents"), merges = 6)
        .orderBy(col("rank"))),

    // round-8: oracle-checkable — encode faithfulness under a FIXED
    // merge table. With a table obeying training's structural
    // invariant (a pair naming a merged symbol ranks AFTER the
    // merge that formed it, and no rule's output recreates its own
    // inputs), the kernel's lowest-rank-first loop is provably
    // equal to ONE left-to-right replace pass per rank in rank
    // order — which DuckDB replays as six string replaces over a
    // bracketed token encoding. Corpus-TRAINED tables (iterative
    // argmax) stay covered by bpe_train + BpeSpec parity.
    "bpe_encode" -> ((s, d) =>
      Bpe.encode(t(s, d, "documents"),
        Seq(("t", "h"), ("th", "e"), ("a", "n"),
          ("an", "d"), ("i", "n"), ("e", "r")))
        .select(col("doc_id"), col("n_tokens"))
        .orderBy(col("doc_id"))),

    // DSIR toward a fixed four-source "target domain" — the explicit
    // IN list avoids lexicographic surprises (src10 < 'src2')
    "dsir_weight" -> ((s, d) =>
      TextAnalysis.dsirWeight(t(s, d, "documents"),
        col("source").isin("src0", "src1", "src2", "src3"))
        .orderBy(col("doc_id"))),

    // same deterministic URL synthesis on both sides (pii_redact
    // precedent): scheme/case/www/tracking-param/fragment variants
    // of a shared (source, slug) page identity — what's under test
    // is the canonicalization chain and the dup grouping.
    "url_canonical" -> ((s, d) => {
      val src = when(pmod(col("doc_id"), lit(2)) === 0,
        upper(col("source"))).otherwise(col("source"))
      val url = concat(
        when(pmod(col("doc_id"), lit(3)) === 0, lit("http://"))
          .otherwise(lit("https://")),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("WWW."))
          .otherwise(lit("")),
        src, lit(".example.com/docs/"),
        pmod(col("doc_id"), lit(50)).cast("string"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          lit("?utm_source=feed&utm_campaign=x")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("#frag"))
          .otherwise(lit("")))
      val canon = t(s, d, "documents")
        .select(col("doc_id"), Curation.canonicalUrl(url).as("url_canon"))
      canon.withColumn("n_dups",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("url_canon"))))
        .orderBy(col("doc_id"))
    }),

    "winsorize" -> ((s, d) =>
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // lineitem — total-order over every output column instead
      Analytics.winsorize(t(s, d, "lineitem"), "l_returnflag",
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice"))),

    // snapshot retention on the versioned sink: five commits of
    // growing slices of `region` (1..5 rows), expire keeping the
    // newest two — the audit plus post-expire readability is the
    // deterministic output (fixture-backed, VALUES oracle).
    "sink_expire" -> ((s, d) => {
      import s.implicits._
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_expire_$tag")
      val sink = new graft.sources.VersionedParquetSink(s"$dir/dim")
      val region = t(s, d, "region")
      (1 to 5).foreach(n => sink.overwrite(region.limit(n)))
      val audit = sink.expireSnapshots(keepLast = 2)
      audit.map { case (v, st) =>
        val n = if (st == "retained") sink.loadVersion(s, v).count() else -1L
        (v, st, n)
      }.toDF("version", "status", "n_rows").orderBy(col("version"))
    })
  )

  // ---------------------------------------------------------------
  // DuckDB oracle SQL — same aliases, same ordering, decimal-stable
  // aggregation, naive timestamps.
  // ---------------------------------------------------------------
  def oracleSql: Map[String, String] = Map(
    "ingest_metadata" ->
      """SELECT l_orderkey, l_linenumber,
         TIMESTAMP '2026-01-01 00:00:00' AS ingest_ts,
         'parquet:lineitem' AS ingest_source
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "latest_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",

    "scd2_build" ->
      """WITH h AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER w AS prev_et,
                  lag(ts) OVER w AS prev_ts
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         starts AS (
           SELECT * FROM h
           WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et),
         v AS (
           SELECT user_id, event_type, ts AS valid_from,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS valid_to
           FROM starts)
         SELECT user_id, event_type, valid_from, valid_to,
                (valid_to IS NULL) AS is_current
         FROM v ORDER BY user_id, valid_from""",

    "scd2_current" ->
      """WITH h AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER w AS prev_et,
                  lag(ts) OVER w AS prev_ts
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         starts AS (
           SELECT * FROM h
           WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et),
         v AS (
           SELECT user_id, event_type, ts AS valid_from,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS valid_to
           FROM starts)
         SELECT user_id, event_type, valid_from
         FROM v WHERE valid_to IS NULL ORDER BY user_id""",

    "scd1_upsert" ->
      """WITH latest AS (
           SELECT user_id, event_type, ts, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events),
         base AS (SELECT user_id, event_type, ts FROM (
           SELECT user_id, event_type, ts, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts < TIMESTAMP '2024-01-15') WHERE rn = 1),
         upd AS (SELECT user_id, event_type, ts FROM (
           SELECT user_id, event_type, ts, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts >= TIMESTAMP '2024-01-15') WHERE rn = 1)
         SELECT COALESCE(b.user_id, u.user_id) AS user_id,
                CASE WHEN u.user_id IS NOT NULL THEN u.event_type
                     ELSE b.event_type END AS event_type,
                CASE WHEN u.user_id IS NOT NULL THEN u.ts ELSE b.ts END
                  AS last_ts
         FROM base b FULL JOIN upd u ON b.user_id = u.user_id
         ORDER BY user_id""",

    "change_detect" ->
      """WITH cur AS (SELECT user_id, event_type FROM (
           SELECT user_id, event_type, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts < TIMESTAMP '2024-01-15') WHERE rn = 1),
         inc AS (SELECT user_id, event_type FROM (
           SELECT user_id, event_type, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1)
         SELECT i.user_id AS user_id, i.event_type AS event_type,
                CASE WHEN c.user_id IS NULL THEN 'new'
                     WHEN i.event_type IS DISTINCT FROM c.event_type
                       THEN 'changed'
                     ELSE 'unchanged' END AS change_type
         FROM inc i LEFT JOIN cur c ON i.user_id = c.user_id
         ORDER BY user_id""",

    "string_clean" ->
      """SELECT c_custkey, trim(c_name) AS c_name,
                trim(c_mktsegment) AS c_mktsegment
         FROM customer ORDER BY c_custkey""",

    "incremental_files" ->
      """SELECT DISTINCT source AS name FROM documents
         WHERE source NOT IN ('src0', 'src1') ORDER BY name""",

    "ingest_log" ->
      """SELECT DISTINCT source AS name FROM documents
         WHERE source NOT IN ('src0', 'src1') ORDER BY name""",

    "merge_stats" ->
      """WITH s1 AS (
           SELECT o_custkey, o_orderpriority, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01')
           WHERE rn = 1),
         s2 AS (
           SELECT o_custkey, o_orderpriority, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
           WHERE rn = 1)
         SELECT
           COUNT(CASE WHEN s1.o_custkey IS NULL THEN 1 END) AS n_new,
           COUNT(CASE WHEN s1.o_custkey IS NOT NULL
             AND (s1.o_orderpriority <> s2.o_orderpriority
               OR s1.o_totalprice <> s2.o_totalprice) THEN 1 END)
             AS n_changed,
           COUNT(CASE WHEN s1.o_custkey IS NOT NULL
             AND s1.o_orderpriority = s2.o_orderpriority
             AND s1.o_totalprice = s2.o_totalprice THEN 1 END)
             AS n_unchanged
         FROM s2 LEFT JOIN s1 ON s1.o_custkey = s2.o_custkey""",

    "dim_sink_versions" ->
      """SELECT o_custkey, o_orderpriority, o_totalprice,
                TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
                TRUE AS is_current
         FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01')
         WHERE rn = 1 ORDER BY o_custkey""",

    "budget_sample" ->
      """WITH sel AS (
           SELECT doc_id, lang, n_chars,
             ((doc_id % 1000003) * 2654435761) % 1000 AS m,
             ((doc_id % 999983) * 2246822519) % 1000 AS m2
           FROM documents),
         c AS (
           SELECT *, SUM(n_chars) OVER (PARTITION BY lang
               ORDER BY m, m2, doc_id ROWS UNBOUNDED PRECEDING) AS cum
           FROM sel)
         SELECT doc_id, lang, n_chars FROM c
         WHERE cum <= CASE lang WHEN 'en' THEN 30000
                                WHEN 'de' THEN 10000
                                ELSE 9223372036854775807 END
         ORDER BY doc_id""",

    "quarantine" ->
      """WITH b AS (
           SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 89 = 0 THEN NULL
                  ELSE o_orderstatus END AS o_orderstatus
           FROM orders
           UNION ALL
           SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 89 = 0 THEN NULL
                  ELSE o_orderstatus END
           FROM orders WHERE o_orderkey % 97 = 0),
         c AS (SELECT o_orderkey AS dk, count(*) AS n
               FROM b GROUP BY 1)
         SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus,
           CASE WHEN b.o_orderstatus IS NULL THEN 'null_field'
                WHEN c.n > 1 THEN 'dup_key'
                ELSE 'ok' END AS _violation
         FROM b JOIN c ON b.o_orderkey = c.dk
         ORDER BY o_orderkey, _violation""",

    "dim_changes" ->
      """WITH s1 AS (
           SELECT o_custkey, o_orderpriority, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01')
           WHERE rn = 1),
         s2 AS (
           SELECT o_custkey, o_orderpriority, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
           WHERE rn = 1),
         j AS (
           SELECT COALESCE(s1.o_custkey, s2.o_custkey) AS k,
             s1.o_custkey IS NOT NULL AS in1,
             s2.o_custkey IS NOT NULL AS in2,
             s1.o_orderpriority AS p1, s1.o_totalprice AS t1,
             s2.o_orderpriority AS p2, s2.o_totalprice AS t2
           FROM s1 FULL JOIN s2 ON s1.o_custkey = s2.o_custkey),
         changed AS (
           SELECT * FROM j WHERE in1 AND in2 AND (p1 <> p2 OR t1 <> t2))
         SELECT k AS o_custkey, p1 AS o_orderpriority,
           t1 AS o_totalprice,
           TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to,
           TRUE AS is_current, 'update_preimage' AS _change_type
         FROM changed
         UNION ALL
         SELECT k, p1, t1, TIMESTAMP '2026-01-01 00:00:00',
           TIMESTAMP '2026-01-02 00:00:00', FALSE, 'update_postimage'
         FROM changed
         UNION ALL
         SELECT k, p2, t2, TIMESTAMP '2026-01-02 00:00:00',
           CAST(NULL AS TIMESTAMP), TRUE, 'insert'
         FROM changed
         UNION ALL
         SELECT k, p2, t2, TIMESTAMP '2026-01-02 00:00:00',
           CAST(NULL AS TIMESTAMP), TRUE, 'insert'
         FROM j WHERE NOT in1
         ORDER BY o_custkey, valid_from, _change_type""",

    "sql_merge" ->
      """WITH tgt AS (
           SELECT c_custkey AS k, 'init' AS status, CAST(0 AS BIGINT) AS n
           FROM customer WHERE c_custkey <= 300),
         upd AS (
           SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
           WHERE o_custkey > 200 AND o_custkey <= 400 GROUP BY 1)
         SELECT CAST(COALESCE(t.k, u.k) AS BIGINT) AS k,
                CASE WHEN t.k IS NOT NULL AND u.k IS NOT NULL
                       THEN 'active'
                     WHEN t.k IS NULL THEN 'new'
                     ELSE t.status END AS status,
                CAST(CASE WHEN u.k IS NOT NULL THEN u.n_orders
                     ELSE t.n END AS BIGINT) AS n
         FROM tgt t FULL OUTER JOIN upd u ON t.k = u.k
         WHERE NOT (t.k IS NOT NULL AND u.k IS NOT NULL
                    AND u.n_orders > 10)
         ORDER BY k""",

    "sql_merge_catalog" ->
      """WITH tgt AS (
           SELECT c_custkey AS k, 'init' AS status, CAST(0 AS BIGINT) AS n
           FROM customer WHERE c_custkey <= 250),
         upd AS (
           SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
           WHERE o_custkey > 150 AND o_custkey <= 350 GROUP BY 1)
         SELECT CAST(COALESCE(t.k, u.k) AS BIGINT) AS k,
                CASE WHEN t.k IS NOT NULL AND u.k IS NOT NULL
                       THEN 'active'
                     WHEN t.k IS NULL THEN 'new'
                     ELSE t.status END AS status,
                CAST(CASE WHEN u.k IS NOT NULL THEN u.n_orders
                     ELSE t.n END AS BIGINT) AS n
         FROM tgt t FULL OUTER JOIN upd u ON t.k = u.k
         WHERE NOT (t.k IS NOT NULL AND u.k IS NULL AND t.k <= 20)
         ORDER BY k""",

    "sql_merge_mor" ->
      """WITH tgt AS (
           SELECT c_custkey AS k, 'init' AS status, CAST(0 AS BIGINT) AS n
           FROM customer WHERE c_custkey <= 280),
         upd AS (
           SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
           WHERE o_custkey > 180 AND o_custkey <= 380 GROUP BY 1)
         SELECT CAST(COALESCE(t.k, u.k) AS BIGINT) AS k,
                CASE WHEN t.k IS NOT NULL AND u.k IS NOT NULL
                       THEN 'active'
                     WHEN t.k IS NULL THEN 'new'
                     ELSE t.status END AS status,
                CAST(CASE WHEN u.k IS NOT NULL THEN u.n_orders
                     ELSE t.n END AS BIGINT) AS n
         FROM tgt t FULL OUTER JOIN upd u ON t.k = u.k
         WHERE NOT (t.k IS NOT NULL AND u.k IS NOT NULL
                    AND u.n_orders > 12)
         ORDER BY k""",

    "sink_time_travel" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, UPPER(c_name) AS name
         FROM customer WHERE c_custkey <= 200
         ORDER BY k""",

    "catalog_time_travel" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, UPPER(c_name) AS name
         FROM customer WHERE c_custkey <= 200
         ORDER BY k""",

    "log_table_dml" ->
      """SELECT k, status, bal FROM (
           SELECT CAST(c_custkey AS BIGINT) AS k, 'init' AS status,
                  c_acctbal AS bal
           FROM customer WHERE c_custkey <= 200
           UNION ALL
           SELECT CAST(c_custkey AS BIGINT) AS k, 'late' AS status,
                  c_acctbal AS bal
           FROM customer WHERE c_custkey > 200 AND c_custkey <= 350)
         WHERE NOT (k > 150 AND k <= 250)
         ORDER BY k""",

    "log_table_partitioned" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS seg,
                c_acctbal AS bal
         FROM customer
         WHERE c_custkey <= 400
           AND NOT (c_mktsegment = 'BUILDING' AND c_custkey <= 200)
           AND c_mktsegment <> 'MACHINERY'
         ORDER BY k""",

    "log_table_sql_dml" ->
      """SELECT k, status, bal FROM (
           SELECT CAST(c_custkey AS BIGINT) AS k,
                  CASE WHEN c_custkey > 200 THEN 'merged'
                       WHEN c_acctbal < 0 THEN 'zeroed'
                       ELSE 'init' END AS status,
                  CASE WHEN c_acctbal < 0 THEN 0.0
                       ELSE c_acctbal END AS bal
           FROM customer WHERE c_custkey <= 300
           UNION ALL
           SELECT CAST(c_custkey AS BIGINT) AS k, 'new' AS status,
                  c_acctbal AS bal
           FROM customer WHERE c_custkey > 300 AND c_custkey <= 400)
         ORDER BY k""",

    "log_table_update" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k,
                CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS bal
         FROM customer WHERE c_custkey <= 300
         ORDER BY k""",

    "log_table_bloom" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 300 AND c_custkey % 50 <> 0
         ORDER BY k""",

    "log_table_procedures" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_acctbal AS bal
         FROM customer WHERE c_custkey <= 300
         ORDER BY k""",

    "log_table_clone" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_acctbal AS bal
         FROM customer WHERE c_custkey <= 250
         ORDER BY k""",

    "log_table_rename" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS segment
         FROM customer
         WHERE c_custkey <= 300 AND c_mktsegment <> 'BUILDING'
         ORDER BY k""",

    "log_table_generated" ->
      """SELECT event_id, user_id, ts,
                CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date
         FROM events
         WHERE user_id <= 100
           AND NOT ts < TIMESTAMP '2024-01-05 00:00:00'
         ORDER BY event_id""",

    "log_table_constraints" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_acctbal AS bal
         FROM customer
         WHERE c_custkey <= 300 AND c_acctbal >= 0
         ORDER BY k""",

    "log_table_identity" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(count(*) AS BIGINT) AS n_ids,
                CAST(1 AS BIGINT) AS aligned,
                CAST(1 AS BIGINT) AS batches_ordered,
                CAST(1 AS BIGINT) AS merged_above,
                CAST(sum(CASE WHEN c_custkey <= 150 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_default,
                CAST(sum(CASE WHEN c_custkey > 150 AND c_custkey <= 250
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                CAST(sum(CASE WHEN c_custkey > 250 AND c_custkey <= 300
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
                CAST(sum(CASE WHEN c_custkey > 300 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_merged
         FROM customer WHERE c_custkey <= 400""",

    "log_table_dv" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k,
                CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS bal
         FROM customer
         WHERE c_custkey <= 300
           AND NOT (c_custkey > 100 AND c_custkey <= 150)
         ORDER BY k""",

    "log_table_time_travel" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name
         FROM customer WHERE c_custkey <= 200
         ORDER BY k""",

    "log_table_changes" ->
      """SELECT k, name, change_type, commit_version FROM (
           SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
                  'insert' AS change_type, CAST(0 AS BIGINT) AS commit_version
           FROM customer WHERE c_custkey <= 150
           UNION ALL
           SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
                  'insert' AS change_type, CAST(1 AS BIGINT) AS commit_version
           FROM customer WHERE c_custkey > 150 AND c_custkey <= 250
           UNION ALL
           SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
                  'delete' AS change_type, CAST(2 AS BIGINT) AS commit_version
           FROM customer WHERE c_custkey > 100 AND c_custkey <= 200)
         ORDER BY commit_version, change_type, k""",

    "log_table_changes_sql" ->
      """SELECT k, name, change_type, commit_version FROM (
           SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
                  'insert' AS change_type, CAST(1 AS BIGINT) AS commit_version
           FROM customer WHERE c_custkey > 150 AND c_custkey <= 250
           UNION ALL
           SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
                  'delete' AS change_type, CAST(2 AS BIGINT) AS commit_version
           FROM customer WHERE c_custkey > 100 AND c_custkey <= 200)
         ORDER BY commit_version, change_type, k""",

    "sql_merge_log" ->
      """WITH tgt AS (
           SELECT c_custkey AS k, 'init' AS status, CAST(0 AS BIGINT) AS n
           FROM customer WHERE c_custkey <= 250),
         upd AS (
           SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders
           WHERE o_custkey > 150 AND o_custkey <= 350 GROUP BY 1)
         SELECT CAST(COALESCE(t.k, u.k) AS BIGINT) AS k,
                CASE WHEN t.k IS NOT NULL AND u.k IS NOT NULL
                       THEN 'active'
                     WHEN t.k IS NULL THEN 'new'
                     ELSE t.status END AS status,
                CAST(CASE WHEN u.k IS NOT NULL THEN u.n_orders
                     ELSE t.n END AS BIGINT) AS n
         FROM tgt t FULL OUTER JOIN upd u ON t.k = u.k
         WHERE NOT (t.k IS NOT NULL AND u.k IS NOT NULL
                    AND u.n_orders > 14)
         ORDER BY k""",

    "log_table_evolution" ->
      """SELECT k, name, bal FROM (
           SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
                  CAST(NULL AS DOUBLE) AS bal
           FROM customer WHERE c_custkey <= 150
           UNION ALL
           SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
                  c_acctbal AS bal
           FROM customer WHERE c_custkey > 150 AND c_custkey <= 300)
         ORDER BY k""",

    "log_table_cluster" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name
         FROM customer WHERE c_custkey <= 400
         ORDER BY k""",

    "log_table_restore" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name
         FROM customer WHERE c_custkey <= 200
         ORDER BY k""",

    "log_table_history" ->
      """SELECT * FROM (VALUES
           (CAST(0 AS BIGINT), CAST(1000 AS BIGINT), 'append',
            CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
           (CAST(1 AS BIGINT), CAST(2000 AS BIGINT), 'append',
            CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
           (CAST(2 AS BIGINT), CAST(3000 AS BIGINT), 'delete',
            CAST(1 AS BIGINT), CAST(1 AS BIGINT)))
         AS t(version, commit_ts, op, n_added, n_removed)
         ORDER BY version""",

    "pipeline_e2e" ->
      """WITH s1 AS (
           SELECT o_custkey, o_orderpriority, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01')
           WHERE rn = 1),
         s2 AS (
           SELECT o_custkey, o_orderpriority, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
           WHERE rn = 1),
         j AS (
           SELECT COALESCE(s1.o_custkey, s2.o_custkey) AS k,
             s1.o_custkey IS NOT NULL AS in1,
             s2.o_custkey IS NOT NULL AS in2,
             s1.o_orderpriority AS p1, s1.o_totalprice AS t1,
             s2.o_orderpriority AS p2, s2.o_totalprice AS t2
           FROM s1 FULL JOIN s2 ON s1.o_custkey = s2.o_custkey)
         SELECT k AS o_custkey, o_orderpriority, o_totalprice,
                valid_from, valid_to, is_current FROM (
           SELECT k, p1 AS o_orderpriority, t1 AS o_totalprice,
             TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
           FROM j WHERE in1 AND (NOT in2 OR (p1 = p2 AND t1 = t2))
           UNION ALL
           SELECT k, p1, t1, TIMESTAMP '2026-01-01 00:00:00',
             TIMESTAMP '2026-01-02 00:00:00', FALSE
           FROM j WHERE in1 AND in2 AND (p1 <> p2 OR t1 <> t2)
           UNION ALL
           SELECT k, p2, t2, TIMESTAMP '2026-01-02 00:00:00',
             CAST(NULL AS TIMESTAMP), TRUE
           FROM j WHERE in2 AND (NOT in1 OR p1 <> p2 OR t1 <> t2))
         ORDER BY o_custkey, valid_from""",

    // identical post-merge state expected whether increments run on
    // in-memory frames (pipeline_e2e) or through the DimSink seam
    "dim_sink_e2e" ->
      """WITH s1 AS (
           SELECT o_custkey, o_orderpriority, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01')
           WHERE rn = 1),
         s2 AS (
           SELECT o_custkey, o_orderpriority, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
           WHERE rn = 1),
         j AS (
           SELECT COALESCE(s1.o_custkey, s2.o_custkey) AS k,
             s1.o_custkey IS NOT NULL AS in1,
             s2.o_custkey IS NOT NULL AS in2,
             s1.o_orderpriority AS p1, s1.o_totalprice AS t1,
             s2.o_orderpriority AS p2, s2.o_totalprice AS t2
           FROM s1 FULL JOIN s2 ON s1.o_custkey = s2.o_custkey)
         SELECT k AS o_custkey, o_orderpriority, o_totalprice,
                valid_from, valid_to, is_current FROM (
           SELECT k, p1 AS o_orderpriority, t1 AS o_totalprice,
             TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
           FROM j WHERE in1 AND (NOT in2 OR (p1 = p2 AND t1 = t2))
           UNION ALL
           SELECT k, p1, t1, TIMESTAMP '2026-01-01 00:00:00',
             TIMESTAMP '2026-01-02 00:00:00', FALSE
           FROM j WHERE in1 AND in2 AND (p1 <> p2 OR t1 <> t2)
           UNION ALL
           SELECT k, p2, t2, TIMESTAMP '2026-01-02 00:00:00',
             CAST(NULL AS TIMESTAMP), TRUE
           FROM j WHERE in2 AND (NOT in1 OR p1 <> p2 OR t1 <> t2))
         ORDER BY o_custkey, valid_from""",

    "skew_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
           AS total_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "skew_join_adaptive" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
           AS total_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "skew_distinct" ->
      """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_distinct
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",

    "bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
           AS total_price
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "partitioned_scan" ->
      """SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY user_id ORDER BY user_id""",

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
           AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
           / COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)
           / COUNT(l_discount) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(28,4))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q5_local_volume" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(28,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey
           AND c_nationkey = s_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "rollup_agg" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
           AS total_price,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",

    "anti_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey
             AND o.o_orderdate >= TIMESTAMP '2000-01-01')
         ORDER BY c_custkey""",

    "semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey
             AND o.o_orderdate >= TIMESTAMP '2000-01-01')
         ORDER BY c_custkey""",

    "windowed_events" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY win_start, event_type
         ORDER BY win_start, event_type""",

    "rate_spikes" ->
      """WITH h AS (
           SELECT event_type, date_trunc('hour', ts) AS hour,
             count(*) AS n
           FROM events GROUP BY 1, 2),
         t AS (SELECT event_type, sum(n) AS tot, count(*) AS hours
               FROM h GROUP BY 1)
         SELECT h.event_type, h.hour, h.n,
           h.n * t.hours > 2 * t.tot AS spike
         FROM h JOIN t USING (event_type)
         ORDER BY event_type, hour""",

    "dq_profile" ->
      """SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
           count(*) - count(c_custkey) AS n_nulls,
           count(DISTINCT c_custkey) AS n_distinct FROM customer
         UNION ALL
         SELECT 'c_name', count(*), count(*) - count(c_name),
           count(DISTINCT c_name) FROM customer
         UNION ALL
         SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
           count(DISTINCT c_nationkey) FROM customer
         UNION ALL
         SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
           count(DISTINCT c_acctbal) FROM customer
         ORDER BY col_name""",

    "sessionize" ->
      """WITH g AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 1800000000 THEN 1 ELSE 0 END AS new_session
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts,
                  CAST(SUM(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           FROM g)
         SELECT user_id, session_seq, COUNT(*) AS n_events,
                MIN(ts) AS session_start, MAX(ts) AS session_end
         FROM s GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",

    "cube_agg" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid
         FROM documents GROUP BY CUBE(lang, source)
         ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""",

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(28,4))) AS DOUBLE) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND l_returnflag = 'R'
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q18_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
               AS sum_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(28,4))) > 250)
         SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                sum_qty
         FROM orders
         JOIN big ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q2_min_cost" ->
      """WITH minp AS (
           SELECT l_partkey AS mp_partkey, MIN(l_extendedprice) AS min_price
           FROM lineitem GROUP BY 1),
         best AS (
           SELECT l.l_partkey, m.min_price, MIN(l.l_suppkey) AS s_suppkey
           FROM lineitem l JOIN minp m ON l.l_partkey = m.mp_partkey
             AND l.l_extendedprice = m.min_price
           GROUP BY 1, 2)
         SELECT p.p_partkey, p.p_name, b.min_price, b.s_suppkey, s.s_name
         FROM best b
         JOIN part p ON b.l_partkey = p.p_partkey
         JOIN supplier s ON b.s_suppkey = s.s_suppkey
         ORDER BY p.p_partkey""",

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey
               AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
         GROUP BY 1 ORDER BY 1""",

    "q11_revenue_share" ->
      """WITH per_supp AS (
           SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(28,4))) AS DOUBLE) AS revenue
           FROM lineitem GROUP BY 1),
         tot AS (
           SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(28,4))) AS DOUBLE) AS total_rev
           FROM lineitem)
         SELECT s.s_suppkey, s.s_name, p.revenue
         FROM per_supp p, tot, supplier s
         WHERE p.revenue > tot.total_rev * 0.002
           AND p.l_suppkey = s.s_suppkey
         ORDER BY p.revenue DESC, s.s_suppkey""",

    "q17_small_quantity" ->
      """WITH li AS (
           SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE p.p_brand = 'Brand#23'),
         lim AS (
           SELECT l_partkey AS lp_partkey,
                  SUM(l_quantity) / COUNT(*) * 0.2 AS qty_limit
           FROM li GROUP BY 1)
         SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4)))
                  AS DOUBLE) / 7.0 AS avg_yearly
         FROM li JOIN lim ON li.l_partkey = lim.lp_partkey
         WHERE li.l_quantity < lim.qty_limit""",

    "q21_late_suppliers" ->
      """WITH per_order AS (
           SELECT l.l_orderkey,
                  COUNT(DISTINCT l.l_suppkey) AS n_supp,
                  COUNT(DISTINCT CASE WHEN l.l_shipdate >
                    o.o_orderdate + INTERVAL 60 DAY
                    THEN l.l_suppkey END) AS n_late,
                  MIN(CASE WHEN l.l_shipdate >
                    o.o_orderdate + INTERVAL 60 DAY
                    THEN l.l_suppkey END) AS late_supp
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
             AND o.o_orderstatus = 'F'
           GROUP BY 1)
         SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
         FROM per_order p JOIN supplier s ON p.late_supp = s.s_suppkey
         WHERE p.n_supp > 1 AND p.n_late = 1
         GROUP BY 1, 2
         ORDER BY numwait DESC, s.s_suppkey LIMIT 10""",

    "q22_idle_customers" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
           AS total_bal
         FROM customer c
         WHERE c.c_acctbal > (
             SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4)))
               AS DOUBLE) / COUNT(*)
             FROM customer WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey)
         GROUP BY 1 ORDER BY 1""",

    "q12_ship_priority" ->
      """SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             THEN 1 END) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY 1 ORDER BY 1""",

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
           AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
           AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q20_excess_suppliers" ->
      """WITH shipped AS (
           SELECT l_partkey, l_suppkey,
                  SUM(CAST(l_quantity AS DECIMAL(28,4))) AS qty
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_name LIKE 'red %'
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1, 2),
         dominant AS (
           SELECT DISTINCT l_suppkey FROM (
             SELECT l_suppkey, qty,
                    SUM(qty) OVER (PARTITION BY l_partkey) AS total
             FROM shipped)
           WHERE qty * 2 > total)
         SELECT s_suppkey, s_name, n_name
         FROM dominant
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         ORDER BY s_suppkey""",

    "moving_window" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         COUNT(*) OVER w AS n_trailing,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
           AS sum_trailing
         FROM events
         WINDOW w AS (PARTITION BY user_id
           ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "ntile_bands" ->
      """SELECT o_orderpriority, band, COUNT(*) AS n_orders,
         MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
         FROM (SELECT o_orderpriority, o_totalprice,
                 CAST(ntile(10) OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS band
               FROM orders)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
             AS total_price,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
             AS BIGINT) AS gid
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
           (o_orderpriority), ())
         ORDER BY gid, o_orderpriority NULLS FIRST,
           o_orderstatus NULLS FIRST""",

    "json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY 1 ORDER BY 1""",

    "retention_cohorts" ->
      """WITH cohorts AS (
           SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
           FROM events GROUP BY 1),
         active AS (
           SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
           FROM events)
         SELECT c.cohort_week, a.act_week, COUNT(*) AS n_users
         FROM active a JOIN cohorts c ON a.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "funnel_steps" ->
      """WITH l1 AS (
           SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
         l2 AS (
           SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN l1 ON e.user_id = l1.user_id
           WHERE e.event_type = 'click' AND e.ts > l1.t1 GROUP BY 1),
         l3 AS (
           SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN l2 ON e.user_id = l2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > l2.t2 GROUP BY 1),
         d AS (
           SELECT l1.user_id,
                  CASE WHEN l3.user_id IS NOT NULL THEN 3
                       WHEN l2.user_id IS NOT NULL THEN 2
                       ELSE 1 END AS depth
           FROM l1
           LEFT JOIN l2 ON l1.user_id = l2.user_id
           LEFT JOIN l3 ON l1.user_id = l3.user_id)
         SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_users
         FROM d GROUP BY 1 ORDER BY 1""",

    "unpivot_long" ->
      """SELECT user_id, event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "moment_stats" ->
      """WITH s AS (
           SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6)))
               AS DOUBLE) AS sx2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice
               AS DECIMAL(38,6))) AS DOUBLE) AS sy2,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6)))
               AS DOUBLE) AS sxy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           round(sy / CAST(n AS DOUBLE), 6) AS mean_price,
           round(sqrt((CAST(n AS DOUBLE) * sy2 - sy * sy)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6)
             AS stddev_price,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sx2 - sx * sx)
               * sqrt(CAST(n AS DOUBLE) * sy2 - sy * sy)), 6)
             AS corr_qty_price
         FROM s ORDER BY l_returnflag""",

    "agg_maintain" ->
      """SELECT o_custkey, COUNT(*) AS n_rows,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
           AS total
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",

    // simhash replay: per-token 62-bit declarative hash (h1·M2+h2
    // over the two char-poly residues), ±1 votes per bit position,
    // sign → fingerprint; pair set = shares one of four 16-bit
    // chunks (the banded candidate condition — part of the operator
    // CONTRACT, same as the engine) AND hamming ≤ 10
    "dedup_simhash" ->
      """WITH tok AS (
           SELECT doc_id,
                  string_split_regex(trim(lower(text)), '\s+') AS ts
           FROM documents),
         hr AS (
           SELECT doc_id,
             list_transform(ts, t ->
               list_reduce(list_prepend(CAST(1000000007 AS BIGINT),
                 list_transform(
                   list_filter(string_split_regex(t, ''), c -> c <> ''),
                   c -> CAST(unicode(c) AS BIGINT))),
                 (x, y) -> (x * 31 + y) % 2147483647)) AS h1s,
             list_transform(ts, t ->
               list_reduce(list_prepend(CAST(998244353 AS BIGINT),
                 list_transform(
                   list_filter(string_split_regex(t, ''), c -> c <> ''),
                   c -> CAST(unicode(c) AS BIGINT))),
                 (x, y) -> (x * 31 + y) % 2147483629)) AS h2s
           FROM tok),
         h AS (
           SELECT doc_id,
             list_transform(list_zip(h1s, h2s), p ->
               ((p[1] * p[1] + p[1]) % 2147483647) * 2147483629
               + ((p[2] * p[2] + 3 * p[2]) % 2147483629)) AS hs
           FROM hr),
         votes AS (
           SELECT doc_id, b,
                  SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END)
                    AS vote
           FROM (SELECT doc_id, unnest(hs) AS th FROM h)
           CROSS JOIN generate_series(0, 61) AS g(b)
           GROUP BY doc_id, b),
         fp AS (
           SELECT doc_id,
                  CAST(SUM(CASE WHEN vote > 0
                    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
                    AS simhash
           FROM votes GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                  AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE (((a.simhash >> 0) & 65535) = ((b.simhash >> 0) & 65535)
             OR ((a.simhash >> 16) & 65535) = ((b.simhash >> 16) & 65535)
             OR ((a.simhash >> 32) & 65535) = ((b.simhash >> 32) & 65535)
             OR ((a.simhash >> 48) & 65535) = ((b.simhash >> 48) & 65535))
           AND bit_count(xor(a.simhash, b.simhash)) <= 10
         ORDER BY id_a, id_b""",

    "log_table_repartition" ->
      """SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
         FROM customer
         WHERE c_custkey <= 400
           AND NOT (c_mktsegment = 'BUILDING' AND c_custkey <= 300)
         ORDER BY k""",

    "log_table_hidden" ->
      """SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
         FROM customer
         WHERE c_custkey <= 400
           AND NOT (c_mktsegment = 'BUILDING' AND c_custkey <= 300)
         ORDER BY k""",

    "approx_topk" ->
      """SELECT CAST(rank AS INTEGER) AS rank, term,
                CAST(min_count AS BIGINT) AS min_count
         FROM (VALUES
           (1,'t30',40),(2,'t29',39),(3,'t28',38),(4,'t27',37),
           (5,'t26',36),(6,'t25',35),(7,'t24',34),(8,'t23',33),
           (9,'t22',32),(10,'t21',31),(11,'t20',30),(12,'t19',29),
           (13,'t18',28),(14,'t17',27),(15,'t16',26),(16,'t15',25),
           (17,'t14',24),(18,'t13',23),(19,'t12',22),(20,'t11',21))
           AS v(rank, term, min_count)
         ORDER BY rank""",

    "source_overlap" ->
      """WITH tok AS (
           SELECT DISTINCT src, tok FROM (
             SELECT source AS src,
                    unnest(string_split_regex(lower(text), '\s+')) AS tok
             FROM documents)
           WHERE length(tok) > 0),
         sizes AS (SELECT src, COUNT(*) AS vocab FROM tok GROUP BY src),
         inter AS (
           SELECT a.src AS sa, b.src AS sb, COUNT(*) AS c
           FROM tok a JOIN tok b ON a.tok = b.tok AND a.src < b.src
           GROUP BY 1, 2)
         SELECT s1.src AS src_a, s2.src AS src_b,
                s1.vocab AS vocab_a, s2.vocab AS vocab_b,
                s1.vocab + s2.vocab - COALESCE(i.c, 0) AS vocab_union,
                COALESCE(i.c, 0) AS vocab_inter,
                ROUND(CAST(COALESCE(i.c, 0) AS DOUBLE) /
                  CAST(s1.vocab + s2.vocab - COALESCE(i.c, 0) AS DOUBLE),
                  6) AS jaccard_est
         FROM sizes s1
         JOIN sizes s2 ON s1.src < s2.src
         LEFT JOIN inter i ON i.sa = s1.src AND i.sb = s2.src
         ORDER BY src_a, src_b""",

    "log_table_refs" ->
      """SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
         FROM customer
         WHERE c_custkey <= 450
           AND NOT (c_mktsegment = 'BUILDING' AND c_custkey <= 200)
           AND NOT (c_mktsegment = 'AUTOMOBILE' AND c_custkey > 400)
         ORDER BY k""",

    "log_table_meta_sql" ->
      """SELECT surface, item, detail, num FROM (
           VALUES
             ('files', 'live', 'files', CAST(2 AS BIGINT)),
             ('files', 'rows', 'logical',
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                WHERE c_custkey > 50 AND c_custkey <= 200)),
             ('history', '0', 'append', CAST(1000 AS BIGINT)),
             ('history', '1', 'append', CAST(2000 AS BIGINT)),
             ('history', '2', 'delete', CAST(3000 AS BIGINT)),
             ('history', '3', 'ref', CAST(4000 AS BIGINT)),
             ('partitions', 'count', 'parts', CAST(1 AS BIGINT)),
             ('refs', 'seed', 'tag', CAST(0 AS BIGINT))
         ) AS t(surface, item, detail, num)
         ORDER BY surface, item, detail""",

    "log_table_snapshots" ->
      """SELECT surface, item, detail, num FROM (
           VALUES
             ('snap', '0', 'append|p=-1|a=1|r=0', CAST(1000 AS BIGINT)),
             ('snap', '1', 'append|p=0|a=1|r=0', CAST(2000 AS BIGINT)),
             ('snap', '2', 'delete|p=1|a=1|r=1', CAST(3000 AS BIGINT)),
             ('snap', '3', 'overwrite|p=2|a=1|r=2',
               CAST(4000 AS BIGINT)),
             ('snap', '4', 'append|p=3|a=1|r=0', CAST(5000 AS BIGINT)),
             ('txn', 'app1', '5', CAST(4 AS BIGINT)),
             ('all_files', 'live', 'files', CAST(2 AS BIGINT)),
             ('all_files', 'live', 'rows',
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                WHERE c_custkey > 80 AND c_custkey <= 120)),
             ('all_files', 'retired', 'files', CAST(2 AS BIGINT)),
             ('all_files', 'retired', 'rows',
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                WHERE c_custkey <= 80)),
             ('all_files', 'retired', 'dv_rows',
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                WHERE c_custkey <= 20))
         ) AS t(surface, item, detail, num)
         ORDER BY surface, item, detail""",

    "delta_export" ->
      """SELECT c_custkey AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 120 AND c_custkey % 10 <> 0
         ORDER BY k""",

    "iceberg_export" ->
      """SELECT c_custkey AS k, c_name AS name,
              c_mktsegment AS seg
         FROM customer
         WHERE c_custkey <= 120 AND c_custkey % 10 <> 0
         ORDER BY k""",

    "iceberg_mirror" ->
      """SELECT c_custkey AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 120 AND c_custkey % 10 <> 0
         ORDER BY k""",

    "delta_convert" ->
      """SELECT c_custkey AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 150 AND c_custkey % 10 <> 0
         ORDER BY k""",

    "iceberg_bucket_interop" ->
      """SELECT c_custkey AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 180 AND c_custkey % 10 <> 0
         ORDER BY k""",

    "delta_mapping" ->
      """SELECT c_custkey AS k, c_name AS tag
         FROM customer
         WHERE c_custkey <= 150
         ORDER BY k""",

    "delta_dv_roundtrip" ->
      """SELECT c_custkey AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 140 AND c_custkey % 10 <> 0
           AND c_custkey % 7 <> 0
         ORDER BY k""",

    "iceberg_dv_roundtrip" ->
      """SELECT c_custkey AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 140 AND c_custkey % 10 <> 0
           AND c_custkey % 7 <> 0
         ORDER BY k""",

    "delta_constraints" ->
      """SELECT c_custkey AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 150
         ORDER BY k""",

    "iceberg_convert" ->
      """SELECT c_custkey AS k, c_name AS name
         FROM customer
         WHERE c_custkey <= 150 AND c_custkey % 10 <> 0
         ORDER BY k""",

    "log_table_protocol" ->
      """SELECT surface, item, detail, num FROM (
           VALUES
             ('features', 'v0', '',
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                WHERE c_custkey <= 100)),
             ('features', 'v1', 'deletionVectors',
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                WHERE c_custkey > 50 AND c_custkey <= 100)),
             ('features', 'v2', 'deletionVectors,rowTracking',
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                WHERE c_custkey > 50 AND c_custkey <= 100)),
             ('gate', 'reader', 'refused', CAST(1 AS BIGINT)),
             ('gate', 'writer', 'refused', CAST(1 AS BIGINT)),
             ('gate', 'writer', 'readable_rows',
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                WHERE c_custkey <= 20))
         ) AS t(surface, item, detail, num)
         ORDER BY surface, item, detail""",

    "log_table_analyze" ->
      """WITH t AS (
           SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nat,
                  nullif(c_mktsegment, 'BUILDING') AS seg
           FROM customer
           WHERE c_custkey <= 500 AND c_custkey % 7 <> 0)
         SELECT col, ndv, nulls, min_v, max_v, n_rows FROM (
           SELECT 'k' AS col, COUNT(DISTINCT k) AS ndv,
                  COUNT(*) - COUNT(k) AS nulls,
                  CAST(MIN(k) AS VARCHAR) AS min_v,
                  CAST(MAX(k) AS VARCHAR) AS max_v,
                  COUNT(*) AS n_rows FROM t
           UNION ALL
           SELECT 'nat', COUNT(DISTINCT nat), COUNT(*) - COUNT(nat),
                  CAST(MIN(nat) AS VARCHAR), CAST(MAX(nat) AS VARCHAR),
                  COUNT(*) FROM t
           UNION ALL
           SELECT 'seg', COUNT(DISTINCT seg), COUNT(*) - COUNT(seg),
                  MIN(seg), MAX(seg), COUNT(*) FROM t)
         ORDER BY col""",

    "log_table_rowids" ->
      """WITH base AS (
           SELECT c_custkey AS k, c_mktsegment AS seg,
                  ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS row_id
           FROM customer WHERE c_custkey <= 200)
         SELECT k, CASE WHEN k <= 50 THEN 'PRIME' ELSE seg END AS seg,
                CAST(row_id AS BIGINT) AS row_id
         FROM base WHERE k % 10 <> 0 ORDER BY k""",

    "log_table_expire" ->
      """SELECT c_custkey AS k, c_mktsegment AS seg
         FROM customer
         WHERE c_custkey <= 400 AND c_custkey % 9 <> 0
         ORDER BY k""",

    "log_table_autocompact" ->
      """SELECT s_suppkey AS k, s_name AS name, s_acctbal AS bal
         FROM supplier ORDER BY k""",

    "log_table_clusterby" ->
      """SELECT c_custkey AS k, c_acctbal AS bal
         FROM customer ORDER BY k""",

    "log_table_widen" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k,
           CAST(CAST(CAST(c_custkey % 1000 AS DECIMAL(10,2))
             AS DECIMAL(22,4)) AS DOUBLE) AS bal,
           CAST(CAST(c_acctbal AS REAL) AS DOUBLE) AS f
         FROM customer
         UNION ALL
         SELECT 6000000000, CAST(CAST(123456789.2500 AS DECIMAL(22,4))
             AS DOUBLE), 0.5
         ORDER BY k""",

    "log_table_merge_evolve" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name,
           CASE WHEN c_custkey > 200 THEN 'new'
                WHEN c_custkey > 100 THEN 'upd' END AS tier,
           CASE WHEN c_custkey > 100 THEN c_acctbal END AS bal
         FROM customer WHERE c_custkey <= 300 ORDER BY k""",

    "log_table_properties" ->
      """SELECT k AS "key", v AS "value",
           (SELECT COUNT(*) FROM nation) AS n_rows
         FROM (VALUES ('retention.days', '30'), ('tier', 'silver'))
           AS p(k, v)
         ORDER BY "key"""",

    "log_table_mv" ->
      """WITH final_state AS (
           SELECT o_custkey,
                  CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
                       ELSE o_totalprice END AS v
           FROM orders
           WHERE (o_orderkey % 3) IN (0, 1)
             AND NOT (o_totalprice < 1000)
         )
         SELECT o_custkey, COUNT(*) AS cnt,
                CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) AS total
         FROM final_state GROUP BY o_custkey ORDER BY o_custkey""",

    "log_table_mv_minmax" ->
      """SELECT o_custkey, COUNT(*) AS cnt,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                  AS DOUBLE) AS total,
                MIN(o_totalprice) AS min_price,
                MAX(o_totalprice) AS max_price
         FROM orders
         WHERE NOT (o_totalprice > 300000.0)
         GROUP BY o_custkey ORDER BY o_custkey""",

    "rank_features" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           round(percent_rank() OVER w, 9) AS prank,
           round(cume_dist() OVER w, 9) AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderpriority, o_orderkey""",

    "set_reconcile" ->
      """WITH h1 AS (SELECT user_id FROM events
                     WHERE ts < TIMESTAMP '2024-01-16'),
         h2 AS (SELECT user_id FROM events
                WHERE ts >= TIMESTAMP '2024-01-16')
         SELECT user_id, 'both' AS cohort
           FROM (SELECT user_id FROM h1 INTERSECT SELECT user_id FROM h2)
         UNION ALL
         SELECT user_id, 'h1_only' AS cohort
           FROM (SELECT user_id FROM h1 EXCEPT SELECT user_id FROM h2)
         UNION ALL
         SELECT user_id, 'h2_only' AS cohort
           FROM (SELECT user_id FROM h2 EXCEPT SELECT user_id FROM h1)
         ORDER BY cohort, user_id""",

    "asof_tolerance" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
                p.p_id AS next_purchase_id
         FROM events e
         LEFT JOIN LATERAL (
           SELECT e2.event_id AS p_id
           FROM events e2
           WHERE e2.event_type = 'purchase'
             AND e2.user_id = e.user_id
             AND e2.ts >= e.ts
             AND e2.ts <= e.ts + INTERVAL 48 HOUR
           ORDER BY e2.ts ASC, e2.event_id DESC LIMIT 1
         ) p ON TRUE
         WHERE e.event_type = 'view'
         ORDER BY e.event_id""",

    "gap_fill" ->
      """WITH hourly AS (
           SELECT user_id, date_trunc('hour', ts) AS hour,
                  count(*) AS cnt
           FROM events WHERE user_id <= 200 GROUP BY 1, 2),
         spans AS (
           SELECT user_id, min(hour) AS h0, max(hour) AS h1
           FROM hourly GROUP BY 1),
         grid AS (
           SELECT user_id,
                  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
           FROM spans)
         SELECT g.user_id, g.hour, coalesce(h.cnt, 0) AS cnt
         FROM grid g LEFT JOIN hourly h USING (user_id, hour)
         ORDER BY g.user_id, g.hour""",

    "locf_fill" ->
      """WITH hourly AS (
           SELECT user_id, date_trunc('hour', ts) AS hour,
                  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                    / count(*) AS v_obs
           FROM events WHERE user_id <= 200 GROUP BY 1, 2),
         spans AS (
           SELECT user_id, min(hour) AS h0, max(hour) AS h1
           FROM hourly GROUP BY 1),
         grid AS (
           SELECT user_id,
                  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
           FROM spans)
         SELECT g.user_id, g.hour,
                last_value(h.v_obs IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
         FROM grid g LEFT JOIN hourly h USING (user_id, hour)
         ORDER BY g.user_id, g.hour""",

    "scd2_asof" ->
      """WITH h AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER w AS prev_et,
                  lag(ts) OVER w AS prev_ts
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         starts AS (
           SELECT * FROM h
           WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et),
         v AS (
           SELECT user_id, event_type, ts AS valid_from,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS valid_to
           FROM starts)
         SELECT user_id, event_type, valid_from
         FROM v
         WHERE valid_from <= TIMESTAMP '2024-01-15'
           AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15')
         ORDER BY user_id""",

    "schema_evolution" ->
      """SELECT * FROM (VALUES
           (CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS VARCHAR)),
           (CAST(1 AS BIGINT), CAST(10 AS BIGINT), CAST(NULL AS VARCHAR)),
           (CAST(2 AS BIGINT), CAST(20 AS BIGINT), CAST(NULL AS VARCHAR)),
           (CAST(3 AS BIGINT), CAST(30 AS BIGINT), 'v3'),
           (CAST(4 AS BIGINT), CAST(40 AS BIGINT), 'v4'))
         AS t(id, a, c)
         ORDER BY id""",

    "scd2_deletes" ->
      """WITH h AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER w AS prev_et,
                  lag(ts) OVER w AS prev_ts
           FROM events WHERE ts < TIMESTAMP '2024-01-15'
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         starts AS (
           SELECT * FROM h
           WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et),
         dim AS (
           SELECT user_id, event_type, ts AS valid_from,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS valid_to,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NULL AS is_current
           FROM starts),
         snap AS (
           SELECT user_id, event_type AS s_et FROM (
             SELECT user_id, event_type,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
             FROM events WHERE ts >= TIMESTAMP '2024-01-15')
           WHERE rn = 1),
         cur AS (SELECT * FROM dim WHERE is_current),
         class AS (
           SELECT s.user_id, s.s_et,
                  CASE WHEN c.user_id IS NULL THEN 'new'
                       WHEN s.s_et IS DISTINCT FROM c.event_type
                         THEN 'changed'
                       ELSE 'unchanged' END AS change_type
           FROM snap s LEFT JOIN cur c ON s.user_id = c.user_id),
         close_keys AS (
           SELECT user_id FROM class WHERE change_type = 'changed'
           UNION
           SELECT c.user_id FROM cur c
           WHERE NOT EXISTS (SELECT 1 FROM snap s
             WHERE s.user_id = c.user_id)),
         untouched AS (
           SELECT * FROM dim d
           WHERE NOT (d.is_current AND d.user_id IN
             (SELECT user_id FROM close_keys))),
         closed AS (
           SELECT d.user_id, d.event_type, d.valid_from,
                  TIMESTAMP '2026-01-01' AS valid_to, FALSE AS is_current
           FROM dim d JOIN close_keys k ON d.user_id = k.user_id
           WHERE d.is_current),
         ins AS (
           SELECT user_id, s_et AS event_type,
                  TIMESTAMP '2026-01-01' AS valid_from,
                  CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
           FROM class WHERE change_type <> 'unchanged')
         SELECT * FROM untouched
         UNION ALL SELECT * FROM closed
         UNION ALL SELECT * FROM ins
         ORDER BY user_id, valid_from""",

    "vocab_topk" ->
      """SELECT term, COUNT(*) AS freq,
                COUNT(DISTINCT doc_id) AS df
         FROM (SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\s+'))
                   AS term
               FROM documents)
         WHERE term <> ''
         GROUP BY term ORDER BY freq DESC, term LIMIT 20""",

    "text_normalize" ->
      """SELECT doc_id,
           regexp_replace(trim(lower(nfc_normalize(text))),
             '\s+', ' ', 'g') AS norm_text
         FROM documents ORDER BY doc_id""",

    "numeric_histogram" ->
      """WITH mm AS (
           SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
           FROM orders)
         SELECT CASE WHEN o_totalprice IS NULL THEN 0
                  ELSE CAST(floor((o_totalprice - mn) / (mx - mn) * 16)
                    AS BIGINT) + 1 END AS bucket,
                COUNT(*) AS n_rows,
                MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
         FROM orders, mm
         GROUP BY 1 ORDER BY 1""",

    "compaction" ->
      """SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY lang ORDER BY lang""",

    "zorder_layout" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
           AS total_price
         FROM orders GROUP BY 1 ORDER BY 1""",

    "percentiles" ->
      """SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
         round(quantile_cont(o_totalprice, 0.99), 4) AS p99
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // round-11 exact-regime oracle: at the oracle's SF each priority
    // group holds ~3000 orders < accuracy 10000, so the GK sketch's
    // rank error (n/accuracy = 0.3) is under one rank — the sketch
    // provably returns the EXACT order statistic at rank ceil(p·n),
    // which DuckDB recomputes with a window rank. (At bench SFs the
    // query stays genuinely approximate; correctness is gated at
    // sf0.01, where exactness is guaranteed, not incidental.
    // approx_distinct has no such regime — HLL is biased at every
    // cardinality — and stays rows-only, bracketed by its exact twin.)
    "approx_percentiles" ->
      """WITH r AS (
           SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice) AS rk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders)
         SELECT o_orderpriority,
           MAX(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT)
                 THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rk = CAST(ceil(0.9 * n) AS BIGINT)
                 THEN o_totalprice END) AS p90,
           MAX(CASE WHEN rk = CAST(ceil(0.99 * n) AS BIGINT)
                 THEN o_totalprice END) AS p99
         FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "running_agg" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_total
         FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "pivot_agg" ->
      """SELECT user_id,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
         FROM events GROUP BY user_id ORDER BY user_id""",

    "distinct_count" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
         COUNT(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",

    "interval_join" ->
      """WITH h AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(event_type) OVER w AS prev_et,
                  lag(ts) OVER w AS prev_ts
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         starts AS (
           SELECT * FROM h
           WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et),
         v AS (
           SELECT user_id, event_type, ts AS valid_from,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS valid_to
           FROM starts)
         SELECT e.event_id, e.user_id, e.ts, v.event_type, v.valid_from
         FROM events e JOIN v ON e.user_id = v.user_id
           AND e.ts >= v.valid_from
           AND (v.valid_to IS NULL OR e.ts < v.valid_to)
         ORDER BY e.event_id""",

    "asof_join" ->
      """WITH ranked AS (
           SELECT e.event_id, o.o_orderkey, o.o_totalprice,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
           FROM events e JOIN orders o
             ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
         SELECT e.event_id, e.user_id, e.ts,
                r.o_orderkey AS last_order_key,
                r.o_totalprice AS last_order_total
         FROM events e LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
           USING (event_id)
         ORDER BY event_id""",

    "dup_clusters" ->
      """WITH RECURSIVE s AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 3
             THEN [concat_ws(' ', string_split_regex(trim(lower(text)), '\s+'))]
             ELSE list_transform(
               range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2]) END) AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh)) /
               (len(a.sh) + len(b.sh)
                - len(list_intersect(a.sh, b.sh)))::DOUBLE >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
         cc(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, cc.lbl FROM cc JOIN e ON e.src = cc.id)
         SELECT id AS doc_id, MIN(lbl) AS cluster_id,
                (id = MIN(lbl)) AS is_representative
         FROM cc GROUP BY id ORDER BY doc_id""",

    "dedup_minhash_lsh" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 3
             THEN [concat_ws(' ', string_split_regex(trim(lower(text)), '\s+'))]
             ELSE list_transform(
               range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2]) END) AS sh
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh)) /
             (len(a.sh) + len(b.sh)
              - len(list_intersect(a.sh, b.sh)))::DOUBLE, 6) AS jaccard
         FROM s a, s b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.sh, b.sh)) /
             (len(a.sh) + len(b.sh)
              - len(list_intersect(a.sh, b.sh)))::DOUBLE >= 0.5
         ORDER BY id_a, id_b""",

    "dedup_incremental" ->
      """WITH s AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 3
             THEN [concat_ws(' ', string_split_regex(trim(lower(text)), '\s+'))]
             ELSE list_transform(
               range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2]) END) AS sh
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh)) /
               (len(a.sh) + len(b.sh)
                - len(list_intersect(a.sh, b.sh)))::DOUBLE >= 0.5),
         batch AS (SELECT doc_id FROM documents WHERE doc_id >= 400)
         SELECT b.doc_id, min(p.id_a) AS dup_of,
           CAST(count(p.id_a) AS BIGINT) AS n_matches,
           min(p.id_a) IS NULL AS admitted
         FROM batch b LEFT JOIN pairs p ON p.id_b = b.doc_id
         GROUP BY b.doc_id ORDER BY b.doc_id""",

    "ngram_jaccard" ->
      """WITH g AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN length(lower(text)) < 8 THEN [lower(text)]
             ELSE list_transform(range(1, length(lower(text)) - 6),
               i -> substr(lower(text), i, 8)) END)) AS gram
           FROM documents),
         df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
         kept AS (SELECT g.doc_id, g.gram FROM g JOIN df USING (gram)
           WHERE df.df <= 500),
         sets AS (SELECT doc_id, list(gram) AS s FROM kept GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s)) /
             (len(a.s) + len(b.s)
              - len(list_intersect(a.s, b.s)))::DOUBLE, 6) AS jaccard
         FROM sets a, sets b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.s, b.s)) /
             (len(a.s) + len(b.s)
              - len(list_intersect(a.s, b.s)))::DOUBLE >= 0.8
         ORDER BY id_a, id_b""",

    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",

    "dedup_keep_best" ->
      """SELECT doc_id AS keep_id, CAST(n_chars AS BIGINT) AS best_score,
                n_copies
         FROM (SELECT doc_id, n_chars,
                 row_number() OVER (PARTITION BY text
                   ORDER BY n_chars DESC, doc_id DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY text) AS n_copies
               FROM documents)
         WHERE rn = 1 ORDER BY keep_id""",

    "pii_redact" ->
      """WITH c2 AS (
           SELECT c_custkey, c_name ||
             CASE WHEN c_custkey % 2 = 0
               THEN ' user' || c_custkey || '@mail.example' ELSE '' END ||
             CASE WHEN c_custkey % 3 = 0
               THEN ' tel ' || (c_custkey % 90 + 10) || '-555-123-4567'
               ELSE '' END ||
             CASE WHEN c_custkey % 5 = 0
               THEN ' ip 10.0.' || (c_custkey % 256) || '.7' ELSE '' END
             AS contact
           FROM customer)
         SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(contact,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '[EMAIL]', 'g'),
             '\d{2,3}-\d{3}-\d{3}-\d{4}', '[PHONE]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')
             AS redacted,
           CAST(len(regexp_extract_all(contact,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(contact,
             '\d{2,3}-\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(contact,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
             AS n_ips
         FROM c2 ORDER BY c_custkey""",

    "seq_packing" ->
      """WITH n AS (
           SELECT doc_id, source,
             CAST(len(string_split_regex(trim(lower(text)), '\s+'))
               AS BIGINT) AS n_tokens
           FROM documents),
         o AS (
           SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
               AS end_off
           FROM n)
         SELECT doc_id, source, n_tokens,
           CAST(end_off - n_tokens AS BIGINT) AS start_off,
           CAST(floor((end_off - n_tokens) / 128.0) AS BIGINT)
             AS seq_first,
           CAST(floor((end_off - 1) / 128.0) AS BIGINT) AS seq_last,
           CAST(floor((end_off - 1) / 128.0)
              - floor((end_off - n_tokens) / 128.0) AS BIGINT)
             AS n_splits
         FROM o ORDER BY doc_id""",

    "segment_dedup" ->
      """WITH tok AS (
           SELECT doc_id,
                  string_split_regex(trim(lower(text)), '\s+') AS w
           FROM documents),
         segs AS (
           SELECT doc_id,
                  array_to_string(list_slice(w, i*8+1, i*8+8), ' ') AS seg
           FROM tok, UNNEST(range(0,
             CAST(greatest(ceil(len(w)/8.0), 1) AS BIGINT))) t(i)),
         c AS (SELECT seg, count(*) AS n FROM segs GROUP BY seg)
         SELECT s.doc_id, count(*) AS n_segs,
           CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_segs,
           round(CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_frac
         FROM segs s JOIN c USING (seg)
         GROUP BY s.doc_id ORDER BY s.doc_id""",

    "repetition_stats" ->
      """WITH tok AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(lower(text)), '\s+')) AS g
           FROM documents),
         wc AS (SELECT doc_id, g, count(*) AS n FROM tok GROUP BY 1, 2),
         wstat AS (
           SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
             round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_word_frac
           FROM wc GROUP BY 1),
         big AS (
           SELECT doc_id, unnest(
             CASE WHEN len(w) < 2 THEN [concat_ws(' ', w)]
             ELSE list_transform(range(1, len(w)),
               i -> w[i] || ' ' || w[i+1]) END) AS g
           FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS w
                 FROM documents)),
         bc AS (SELECT doc_id, g, count(*) AS n FROM big GROUP BY 1, 2),
         bstat AS (
           SELECT doc_id,
             round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_bigram_frac
           FROM bc GROUP BY 1)
         SELECT doc_id, n_words, top_word_frac, top_bigram_frac
         FROM wstat JOIN bstat USING (doc_id) ORDER BY doc_id""",

    "decontaminate" ->
      """WITH sh AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 4
             THEN [concat_ws(' ', string_split_regex(trim(lower(text)), '\s+'))]
             ELSE list_transform(
               range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 2),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+3]) END)) AS s
           FROM documents),
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
         contaminated AS (
           SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)
           WHERE sh.doc_id % 10 <> 0)
         SELECT doc_id, source FROM documents
         WHERE doc_id % 10 <> 0
           AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         ORDER BY doc_id""",

    "contamination_score" ->
      """WITH sh AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 4
             THEN [concat_ws(' ', string_split_regex(trim(lower(text)), '\s+'))]
             ELSE list_transform(
               range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 2),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+3]) END)) AS s
           FROM documents),
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
         sc AS (
           SELECT sh.doc_id, count(*) AS n_shingles, count(b.s) AS n_hits
           FROM sh LEFT JOIN bench b ON sh.s = b.s
           WHERE sh.doc_id % 10 <> 0 GROUP BY sh.doc_id)
         SELECT doc_id, n_shingles, n_hits,
           (n_hits * 10000) // n_shingles AS contamination_bp
         FROM sc ORDER BY doc_id""",

    "chunk_docs" ->
      """WITH c AS (
           SELECT doc_id, text,
             unnest(range(0, greatest(1,
               (len(text) - 60 + 179) // 180))) AS i
           FROM documents)
         SELECT doc_id, CAST(i AS INT) AS chunk_id,
           CAST(i * 180 AS BIGINT) AS chunk_start,
           substr(text, CAST(i * 180 + 1 AS INT), 240) AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",

    "weighted_sample" ->
      """WITH s AS (
           SELECT doc_id, n_chars,
             ((doc_id % 1000003) * 2654435761) % 1000 AS m,
             ((doc_id % 999983) * 2246822519) % 1000 AS m2
           FROM documents),
         c AS (
           SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY m, m2, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM s)
         SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum_weight
         FROM c WHERE (cum - n_chars) // 5000 < cum // 5000
         ORDER BY doc_id""",

    "decontaminate_bloom" ->
      """WITH sh AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 4
             THEN [concat_ws(' ', string_split_regex(trim(lower(text)), '\s+'))]
             ELSE list_transform(
               range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 2),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+3]) END)) AS s
           FROM documents),
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0)
         SELECT sh.doc_id, count(DISTINCT sh.s) AS n_hits
         FROM sh JOIN bench USING (s)
         WHERE sh.doc_id % 10 <> 0
         GROUP BY sh.doc_id ORDER BY doc_id""",

    "dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(
           list_sum(list_transform(range(1, 65),
             i -> CAST(a.embedding[i] AS DOUBLE)
                * CAST(b.embedding[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(a.embedding[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(b.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE))))), 6) AS cosine
         FROM embeddings a, embeddings b
         WHERE a.vec_id < b.vec_id
           AND list_sum(list_transform(range(1, 65),
             i -> CAST(a.embedding[i] AS DOUBLE)
                * CAST(b.embedding[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(a.embedding[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(b.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE))))) >= 0.4
         ORDER BY id_a, id_b""",

    "ann_bruteforce" ->
      """WITH scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.embedding[i] AS DOUBLE)
                  * CAST(c.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(q.embedding[i] AS DOUBLE)
                     * CAST(q.embedding[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(c.embedding[i] AS DOUBLE)
                     * CAST(c.embedding[i] AS DOUBLE))))) AS cos
           FROM embeddings q JOIN embeddings c
             ON q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos, row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS "rank"
           FROM scored)
         SELECT query_id, "rank", neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE "rank" <= 5 ORDER BY query_id, "rank"""",

    // the planted exact-regime trio (round-11): the fixture makes
    // the approximate structure exact by construction (identical
    // cluster vectors — see plantedClusters), so the oracle is plain
    // exact cosine top-3 over the same bit-pattern corpus, computed
    // with integer popcount: dot(u_a, u_b) = bit_count(a & b).
    "ann_lsh" -> annPlantedOracle,
    "ann_ivf" -> annPlantedOracle,
    "ann_index" -> annPlantedOracle,

    "stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE ((doc_id % 1000003) * 2654435761) % 1000 <
           CASE lang WHEN 'de' THEN 500 WHEN 'en' THEN 200 ELSE 100 END
         ORDER BY doc_id""",

    "mixture_sample" ->
      """WITH stats AS (
           SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         rates AS (
           SELECT lang, least(1000, CAST(floor(800.0 *
             pow(CAST(n AS DOUBLE) / (SELECT max(n) FROM stats), -0.5))
             AS INT)) AS rmille
           FROM stats)
         SELECT d.doc_id AS doc_id, d.lang AS lang
         FROM documents d JOIN rates r ON d.lang = r.lang
         WHERE ((d.doc_id % 1000003) * 2654435761) % 1000 < r.rmille
         ORDER BY doc_id""",

    "dataset_split" ->
      """SELECT doc_id,
           CASE WHEN ((doc_id % 999983) * 2246822519) % 1000 < 900
                  THEN 'train'
                WHEN ((doc_id % 999983) * 2246822519) % 1000 < 950
                  THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",

    "global_shuffle" ->
      """WITH h AS (
           SELECT doc_id, source,
             ((doc_id % 999983) * 2654435761) % 1000003 AS hk
           FROM documents)
         SELECT doc_id, source, CAST(hk % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hk % 8
             ORDER BY hk, doc_id) - 1 AS BIGINT) AS pos
         FROM h ORDER BY shard, pos""",

    "quantile_gate" ->
      """WITH cuts AS (
           SELECT lang, percentile_cont(0.5) WITHIN GROUP
             (ORDER BY n_chars) AS q_cutoff
           FROM documents GROUP BY lang)
         SELECT d.doc_id AS doc_id, d.lang AS lang, d.n_chars AS n_chars,
                c.q_cutoff AS q_cutoff
         FROM documents d JOIN cuts c ON d.lang = c.lang
         WHERE d.n_chars >= c.q_cutoff
         ORDER BY doc_id""",

    "tfidf_topk" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
             '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf
                FROM toks GROUP BY doc_id, term),
         dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         ranked AS (
           SELECT tf.doc_id AS doc_id, tf.term AS term, tf.tf AS tf,
                  dfr.df AS df,
                  tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfr.df) AS score,
                  row_number() OVER (PARTITION BY tf.doc_id
                    ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfr.df)
                      DESC, tf.term) AS rank
           FROM tf JOIN dfr ON tf.term = dfr.term CROSS JOIN n)
         SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
                round(score, 6) AS tfidf
         FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""",

    "corpus_stats" ->
      """SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS n_chars,
           CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
             AS BIGINT) AS n_words,
           count(DISTINCT lang) AS n_langs,
           round(CAST(sum(CAST(len(text) AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 6) AS mean_chars
         FROM documents GROUP BY source ORDER BY source""",

    "group_centroids" ->
      """SELECT label, dim, count(*) AS n,
           round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,10)))
             AS DOUBLE) / count(*), 6) AS centroid
         FROM (
           SELECT label, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS dim
           FROM embeddings)
         GROUP BY label, dim ORDER BY label, dim""",

    // round-7: was rows-only — every stage of the curation pipeline
    // is individually SQL-expressible (the fragments below are the
    // already-green gopher/dedup/minhash/cluster/lang/token oracles
    // composed over the same curated base)
    "corpus_curation" ->
      """WITH RECURSIVE kept AS (
           SELECT doc_id, text FROM documents
           WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 5
             AND (CASE WHEN length(text) = 0 THEN 0.0
                  ELSE round((length(text) - length(regexp_replace(text,
                    '[!-/:-@\[-`{-~]', '', 'g')))
                    / CAST(length(text) AS DOUBLE), 6)
                  END) < 0.25),
         uniq AS (
           SELECT min(doc_id) AS doc_id, text FROM kept GROUP BY text),
         s AS (
           SELECT doc_id, list_distinct(
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 3
             THEN [concat_ws(' ', string_split_regex(trim(lower(text)), '\s+'))]
             ELSE list_transform(
               range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
               i -> string_split_regex(trim(lower(text)), '\s+')[i] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+1] || ' ' ||
                    string_split_regex(trim(lower(text)), '\s+')[i+2]) END) AS sh
           FROM uniq),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a, s b
           WHERE a.doc_id < b.doc_id
             AND len(list_intersect(a.sh, b.sh)) /
               (len(a.sh) + len(b.sh)
                - len(list_intersect(a.sh, b.sh)))::DOUBLE >= 0.5),
         e AS (SELECT id_a AS src, id_b AS dst FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
         cc(id, lbl) AS (
           SELECT doc_id, doc_id FROM uniq
           UNION
           SELECT e.dst, cc.lbl FROM cc JOIN e ON e.src = cc.id),
         cl AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id
                FROM cc GROUP BY id),
         sizes AS (SELECT cluster_id, COUNT(*) AS n_members
                   FROM cl GROUP BY cluster_id),
         reps AS (
           SELECT cl.doc_id, z.n_members
           FROM cl JOIN sizes z USING (cluster_id)
           WHERE cl.doc_id = cl.cluster_id),
         ann AS (
           SELECT doc_id,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  ELSE 'und' END AS lang_guess,
             n_bpe_tokens
           FROM (
             SELECT doc_id,
               len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t IN ('the','and','of','to','is'))) AS s_en,
               len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t IN ('der','die','und','das','ist'))) AS s_de,
               len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t IN ('le','la','et','les','est'))) AS s_fr,
               len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t IN ('el','la','que','de','es'))) AS s_es,
               len(list_filter(string_split_regex(regexp_replace(lower(text),
                   '([a-z]+|[0-9]+|[^a-z0-9 ])', '\1 ', 'g'), ' +'),
                 x -> length(x) > 0)) AS n_bpe_tokens
             FROM uniq))
         SELECT a.doc_id, a.lang_guess, a.n_bpe_tokens, r.n_members
         FROM ann a JOIN reps r USING (doc_id)
         ORDER BY a.doc_id""",

    "kmeans_assign" ->
      """WITH c AS (
           SELECT label, dim,
             CAST(round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,10)))
               AS DOUBLE) / count(*), 6) AS FLOAT) AS cent
           FROM (
             SELECT label, unnest(embedding) AS x,
                    generate_subscripts(embedding, 1) AS dim
             FROM embeddings)
           GROUP BY label, dim),
         cl AS (
           SELECT label AS clabel,
                  list(CAST(cent AS DOUBLE) ORDER BY dim) AS cv
           FROM c GROUP BY label),
         dots AS (
           SELECT e.vec_id, e.label, k.clabel,
             list_reduce(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * k.cv[i]),
               (a, b) -> a + b) AS dot
           FROM embeddings e CROSS JOIN cl k),
         ranked AS (
           SELECT vec_id, label, clabel,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY dot DESC, clabel) AS rn
           FROM dots)
         SELECT vec_id, label, clabel AS assigned_label
         FROM ranked WHERE rn = 1 ORDER BY vec_id""",

    "embedding_quantize" ->
      """WITH s AS (
           SELECT vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
           FROM embeddings),
         e AS (
           SELECT vec_id, scale,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2n,
             list_transform(embedding, x ->
               CASE WHEN scale = 0 THEN 0.0 ELSE
                 CAST(x AS DOUBLE)
                 - greatest(-127.0, least(127.0,
                     round(CAST(x AS DOUBLE) / scale, 0))) * scale
               END) AS errs,
             len(embedding) AS dims
           FROM s)
         SELECT vec_id, round(scale, 9) AS scale,
           round(l2n, 6) AS l2_norm,
           round(list_sum(list_transform(errs, er -> er * er)) / dims, 12)
             AS mse,
           round(list_max(list_transform(errs, er -> abs(er))), 9)
             AS max_abs_err
         FROM e ORDER BY vec_id""",

    "lang_id" ->
      """WITH f AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               t -> t IN ('the','and','of','to','is'))) AS s_en,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               t -> t IN ('der','die','und','das','ist'))) AS s_de,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               t -> t IN ('le','la','et','les','est'))) AS s_fr,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               t -> t IN ('el','la','que','de','es'))) AS s_es
           FROM documents)
         SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                ELSE 'und' END AS lang_guess
         FROM f ORDER BY doc_id""",

    "quality_score" ->
      """SELECT doc_id,
         length(text) AS n_chars,
         len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
         round((length(text) - length(regexp_replace(text,
             '[!-/:-@\[-`{-~]', '', 'g')))
           / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
         round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             t -> t IN ('the','and','of','to','is')))
           / CAST(len(string_split_regex(trim(lower(text)), '\s+'))
             AS DOUBLE), 6) AS stopword_ratio,
         round((CAST(length(text) AS DOUBLE)
             - (len(string_split_regex(trim(lower(text)), '\s+')) - 1))
           / CAST(len(string_split_regex(trim(lower(text)), '\s+'))
             AS DOUBLE), 6) AS mean_word_len
         FROM documents ORDER BY doc_id""",

    // bpe_encode: under the fixed rank-ordered merge table, the
    // kernel equals one left-to-right replace pass per rank (see
    // the query comment for the invariant that makes this exact).
    // Each word becomes a bracketed token string (corpus is ASCII —
    // the brackets cannot collide with content), the six merges
    // apply as string replaces, and the token count is the split
    // length; empty docs coalesce to 0.
    "bpe_encode" ->
      """SELECT doc_id, CAST(coalesce(list_sum(list_transform(
           list_filter(string_split(text, ' '), w -> w <> ''),
           w -> len(string_split(
             replace(replace(replace(replace(replace(replace(
               '⟨' || array_to_string(string_split_regex(w, ''), '⟩⟨')
                   || '⟩',
               '⟨t⟩⟨h⟩', '⟨th⟩'), '⟨th⟩⟨e⟩', '⟨the⟩'),
               '⟨a⟩⟨n⟩', '⟨an⟩'), '⟨an⟩⟨d⟩', '⟨and⟩'),
               '⟨i⟩⟨n⟩', '⟨in⟩'), '⟨e⟩⟨r⟩', '⟨er⟩'),
             '⟩⟨')))), 0) AS BIGINT) AS n_tokens
         FROM documents ORDER BY doc_id""",

    // semantic_dedup: the kmeans_assign deterministic cell model
    // (per-label decimal-mean centroids, argmax-dot assignment),
    // then intra-cell cosine pairs at the threshold
    // (dedup_embedding's arithmetic), a recursive-CTE connected
    // components (dup_clusters' technique), and the min-label
    // collapse.
    "semantic_dedup" ->
      """WITH RECURSIVE c AS (
           SELECT label, dim,
             CAST(round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,10)))
               AS DOUBLE) / count(*), 6) AS FLOAT) AS cent
           FROM (
             SELECT label, unnest(embedding) AS x,
                    generate_subscripts(embedding, 1) AS dim
             FROM embeddings)
           GROUP BY label, dim),
         cl AS (
           SELECT label AS clabel,
                  list(CAST(cent AS DOUBLE) ORDER BY dim) AS cv
           FROM c GROUP BY label),
         dots AS (
           SELECT e.vec_id, k.clabel,
             list_reduce(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * k.cv[i]),
               (a, b) -> a + b) AS dot
           FROM embeddings e CROSS JOIN cl k),
         cells AS (
           SELECT vec_id, clabel AS cell FROM (
             SELECT vec_id, clabel,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY dot DESC, clabel) AS rn
             FROM dots) WHERE rn = 1),
         pairs AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM embeddings a
           JOIN cells ca ON ca.vec_id = a.vec_id
           JOIN embeddings b ON a.vec_id < b.vec_id
           JOIN cells cb ON cb.vec_id = b.vec_id
           WHERE ca.cell = cb.cell
             AND list_sum(list_transform(range(1, 65),
               i -> CAST(a.embedding[i] AS DOUBLE)
                  * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(a.embedding[i] AS DOUBLE)
                     * CAST(a.embedding[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(b.embedding[i] AS DOUBLE)
                     * CAST(b.embedding[i] AS DOUBLE))))) >= 0.4),
         ed AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
         cc(id, lbl) AS (
           SELECT vec_id, vec_id FROM embeddings
           UNION
           SELECT ed.dst, cc.lbl FROM cc JOIN ed ON ed.src = cc.id)
         SELECT cc.id AS vec_id, MIN(cc.lbl) AS rep_id,
                any_value(cells.cell) AS cell
         FROM cc JOIN cells ON cells.vec_id = cc.id
         GROUP BY cc.id ORDER BY vec_id""",

    // doc_fingerprint: both fingerprints are modular char-polynomial
    // folds (h(tok) = fold (a·31 + codepoint) mod M per modulus;
    // rolling folds a·1000003 + h(tok), bag folds a + h(tok); the
    // two ~2^31-prime residues combine as r1·M2 + r2) — recomputed
    // here with the same arithmetic via list lambdas. list_prepend
    // supplies the fold's zero so empty token lists hash to 0.
    "doc_fingerprint" ->
      """WITH tok AS (
           SELECT doc_id,
                  string_split_regex(trim(lower(text)), '\s+') AS ts
           FROM documents),
         h AS (
           SELECT doc_id,
             list_transform(ts, t -> list_reduce(
               list_prepend(CAST(1000000007 AS BIGINT),
                 list_transform(
                   list_filter(string_split_regex(t, ''), c -> c <> ''),
                   c -> CAST(unicode(c) AS BIGINT))),
               (x, y) -> (x * 31 + y) % 2147483647)) AS h1,
             list_transform(ts, t -> list_reduce(
               list_prepend(CAST(998244353 AS BIGINT),
                 list_transform(
                   list_filter(string_split_regex(t, ''), c -> c <> ''),
                   c -> CAST(unicode(c) AS BIGINT))),
               (x, y) -> (x * 31 + y) % 2147483629)) AS h2
           FROM tok)
         SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), h1),
             (a, b) -> (a * 1000003 + b) % 2147483647) * 2147483629
           + list_reduce(list_prepend(CAST(0 AS BIGINT), h2),
             (a, b) -> (a * 1000003 + b) % 2147483629) AS rolling_fp,
           list_reduce(list_prepend(CAST(0 AS BIGINT), h1),
             (a, b) -> (a + b) % 2147483647) * 2147483629
           + list_reduce(list_prepend(CAST(0 AS BIGINT), h2),
             (a, b) -> (a + b) % 2147483629) AS bag_fp
         FROM h ORDER BY doc_id""",

    "token_count" ->
      """SELECT doc_id,
         len(string_split_regex(trim(lower(text)), '\s+'))
           AS n_whitespace_tokens,
         len(list_filter(string_split_regex(regexp_replace(lower(text),
             '([a-z]+|[0-9]+|[^a-z0-9 ])', '\1 ', 'g'), ' +'),
           x -> length(x) > 0)) AS n_bpe_tokens,
         CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_chars_div4
         FROM documents ORDER BY doc_id""",

    // mm_features: the stub decoder's ×255 feature sums are plain
    // integer byte sums per (position mod 8) lane; the corpus is
    // ASCII (asserted in MultimodalSpec), so DuckDB reconstructs them
    // from codepoints.
    "mm_features" -> {
      val lanes = (0 until 8).map(j =>
        s"""CAST(list_sum(list_transform(
           list_filter(range(1, length(text) + 1), i -> (i-1) % 8 = $j),
           i -> ord(text[i]))) AS BIGINT) AS f$j""").mkString(",\n         ")
      s"""SELECT doc_id AS media_id,
         $lanes
         FROM documents ORDER BY media_id"""
    },

    // the typed-metadata schema projection: stub dims replay the
    // declarative char-poly residues of the raw text; n_bytes is the
    // UTF-8 byte length (strlen = bytes in DuckDB)
    "mm_schema" ->
      """WITH h AS (
           SELECT doc_id, text,
             list_reduce(list_prepend(CAST(1000000007 AS BIGINT),
               list_transform(
                 list_filter(string_split_regex(text, ''), c -> c <> ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (x, y) -> (x * 31 + y) % 2147483647) AS h1,
             list_reduce(list_prepend(CAST(998244353 AS BIGINT),
               list_transform(
                 list_filter(string_split_regex(text, ''), c -> c <> ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (x, y) -> (x * 31 + y) % 2147483629) AS h2
           FROM documents)
         SELECT doc_id AS media_id, 'image/stub' AS media_type,
                CAST(h1 % 1920 + 1 AS INTEGER) AS width,
                CAST(h2 % 1080 + 1 AS INTEGER) AS height,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                'stub' AS format
         FROM h ORDER BY media_id""",

    "mm_resize" ->
      """SELECT doc_id AS media_id,
         CAST(224 AS INTEGER) AS width, CAST(224 AS INTEGER) AS height,
         CAST(CASE WHEN length(text) = 0 THEN 0
           ELSE (length(text) - 1) // greatest(1, length(text) // 196) + 1
           END AS BIGINT) AS n_bytes
         FROM documents ORDER BY media_id""",

    "mm_frame_plan" ->
      """SELECT doc_id AS media_id,
         CAST(greatest(length(text) - 1, 0) // 1024 + 1 AS INTEGER)
           AS n_frames
         FROM documents ORDER BY media_id""",

    "mm_dedup" ->
      """SELECT md5(text) AS payload_md5, MIN(doc_id) AS keep_id,
                COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keep_id""",

    "mm_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
                CAST(1 + doc_id % 13 AS INTEGER) AS width,
                CAST(1 + doc_id % 7 AS INTEGER) AS height,
                'png' AS format
         FROM documents ORDER BY media_id""",

    // fixture-backed ingest entries: the oracle is the literal
    // expected relation (the fixtures are written by the query
    // itself, not part of the parquet testdata)
    "csv_ingest" ->
      """SELECT * FROM (VALUES
           (CAST(1000 AS INTEGER), 'IT', 'Zentral'),
           (CAST(2000 AS INTEGER), 'HR', 'Verwaltung'))
         AS t(Kostenstelle, Bezeichnung, Bereich)
         ORDER BY Kostenstelle""",

    "orc_roundtrip" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
         CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
           AS sum_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "binary_ingest" ->
      """SELECT * FROM (VALUES
           ('img_a.bin', CAST(16 AS BIGINT), 'PNG'),
           ('img_b.bin', CAST(14 AS BIGINT), 'JPG'))
         AS t(name, n_bytes, head)
         ORDER BY name""",

    "jsonl_ingest" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 'hallo welt', CAST(0.5 AS DOUBLE)),
           (CAST(2 AS BIGINT), 'zweite zeile', CAST(0.9 AS DOUBLE)))
         AS t(id, text, score)
         ORDER BY id""",

    // §2.5c corpus curation — same deterministic page construction
    // as the Spark entry; unnest zipping keeps line order for the
    // ordered string_agg reassembly.
    "line_dedup" ->
      """WITH pages AS (
           SELECT doc_id, concat_ws(chr(10),
             CASE WHEN doc_id % 2 = 0 THEN 'nav home about products' END,
             'source: ' || source,
             text,
             'ref-' || CAST(doc_id % 100 AS VARCHAR),
             '(c) example corpus') AS text
           FROM documents),
         l AS (
           SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
           FROM pages),
         f AS (
           SELECT line FROM l GROUP BY line HAVING count(*) > 10)
         SELECT l.doc_id,
           count(*) AS n_lines,
           CAST(sum(CASE WHEN f.line IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           coalesce(string_agg(CASE WHEN f.line IS NULL THEN l.line END,
             chr(10) ORDER BY l.pos), '') AS text_clean
         FROM l LEFT JOIN f ON l.line = f.line
         GROUP BY l.doc_id ORDER BY l.doc_id""",

    "gopher_rules" ->
      """WITH f AS (
           SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text,
               '[!-/:-@\[-`{-~]', '', 'g')) AS n_punct,
             string_split(text, chr(10)) AS ls,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         r AS (
           SELECT doc_id, n_words,
             round(CASE WHEN n_words = 0 THEN 0.0
               ELSE (CAST(n_chars AS DOUBLE) - (n_words - 1)) / n_words
               END, 6) AS mwl,
             round(CASE WHEN n_chars = 0 THEN 0.0
               ELSE CAST(n_punct AS DOUBLE) / n_chars END, 6) AS sym,
             round(CASE WHEN len(ls) = 0 THEN 0.0
               ELSE CAST(len(list_filter(ls,
                 l -> l LIKE '-%' OR l LIKE '*%')) AS DOUBLE) / len(ls)
               END, 6) AS bullet,
             round(CASE WHEN len(ls) = 0 THEN 0.0
               ELSE CAST(len(list_filter(ls, l -> l LIKE '%...'))
                 AS DOUBLE) / len(ls) END, 6) AS ell,
             round(CASE WHEN n_words = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks,
                 w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / n_words
               END, 6) AS alpha
           FROM f)
         SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           n_words >= 30 AND n_words <= 100000 AS r_word_count,
           mwl >= 2.0 AND mwl <= 4.6 AS r_mean_word_len,
           sym <= 0.12 AS r_symbol_ratio,
           bullet <= 0.9 AS r_bullet_ratio,
           ell <= 0.3 AS r_ellipsis_ratio,
           alpha >= 0.7 AS r_alpha_ratio,
           (n_words >= 30 AND n_words <= 100000)
             AND (mwl >= 2.0 AND mwl <= 4.6)
             AND sym <= 0.12 AND bullet <= 0.9 AND ell <= 0.3
             AND alpha >= 0.7 AS pass
         FROM r ORDER BY doc_id""",

    "bm25_topk" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           FROM documents),
         tfx AS (SELECT doc_id, term, count(*) AS tf
                 FROM tok GROUP BY 1, 2),
         dfx AS (SELECT term, count(*) AS df FROM tfx GROUP BY 1),
         dlx AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
                 FROM tfx GROUP BY 1),
         st AS (SELECT (SELECT count(*) FROM documents) AS n,
                  (SELECT CAST(sum(tf) AS BIGINT) FROM tfx) AS tok_total),
         scored AS (
           SELECT tfx.doc_id, tfx.term, tfx.tf, dfx.df,
             ln((n - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * (1.2 + 1.0))
               / (tf + 1.2 * ((1.0 - 0.75)
                 + 0.75 * dl / (CAST(tok_total AS DOUBLE) / n)))
               AS score
           FROM tfx JOIN dfx USING (term) JOIN dlx USING (doc_id), st),
         ranked AS (
           SELECT doc_id, term, tf, df, score,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS BIGINT) AS rank
           FROM scored)
         SELECT doc_id, rank, term, tf, df, round(score, 6) AS bm25
         FROM ranked WHERE rank <= 3
         ORDER BY doc_id, rank""",

    "unigram_score" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           FROM documents),
         freq AS (SELECT term, count(*) AS tf FROM tok GROUP BY 1),
         tot AS (SELECT count(*) AS n FROM tok)
         SELECT doc_id, count(*) AS n_tokens,
           round(CAST(sum(CAST(round(-ln(tf / CAST(n AS DOUBLE)), 6)
               AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6)
             AS cross_entropy
         FROM tok JOIN freq USING (term), tot
         GROUP BY doc_id ORDER BY doc_id""",

    "source_cap" ->
      """SELECT source,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank,
           doc_id, n_chars
         FROM documents
         QUALIFY rank <= 10
         ORDER BY source, rank""",

    "item_cooccur" ->
      """WITH ut AS (SELECT DISTINCT user_id,
           date_trunc('hour', ts) AS hr, event_type FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_baskets
         FROM ut a JOIN ut b
           ON a.user_id = b.user_id AND a.hr = b.hr
             AND a.event_type < b.event_type
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q6_revenue_delta" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount
             AS DECIMAL(28,6))) AS DOUBLE) AS revenue_delta,
         COUNT(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",

    "q13_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist
         FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
               FROM customer c LEFT JOIN orders o
                 ON c.c_custkey = o.o_custkey
               GROUP BY c.c_custkey)
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",

    "q14_promo_share" ->
      """SELECT round(100.0 *
           (CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
              THEN l_extendedprice * (1.0 - l_discount)
              ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) /
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
              AS DECIMAL(28,6))) AS DOUBLE)), 6) AS promo_revenue_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'""",

    "q19_disjunctive" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
             AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
             AND l_quantity BETWEEN 20 AND 50)""",

    "q7_trade_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
         WHERE sn.n_name IN ('NATION_3', 'NATION_7')
           AND cn.n_name IN ('NATION_3', 'NATION_7')
           AND sn.n_name <> cn.n_name
         GROUP BY 1, 2, 3
         ORDER BY 1, 2, 3""",

    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(28,6))) AS DOUBLE) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, total_rev
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_rev = (SELECT max(total_rev) FROM rev)
         ORDER BY s_suppkey""",

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         round(
           CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_2'
               THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
             AS DECIMAL(28,6))) AS DOUBLE) /
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(28,6))) AS DOUBLE), 6) AS mkt_share,
         COUNT(*) AS n_items
         FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
         GROUP BY 1 ORDER BY 1""",

    "q9_nation_revenue" ->
      """SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "join_blowup" ->
      """WITH lc AS (SELECT user_id AS join_key, COUNT(*) AS l_rows
                     FROM events GROUP BY 1),
         rc AS (SELECT user_id AS join_key, COUNT(*) AS r_rows
                FROM events GROUP BY 1),
         prod AS (SELECT join_key, l_rows, r_rows,
                    l_rows * r_rows AS out_rows
                  FROM lc JOIN rc USING (join_key)),
         tot AS (SELECT SUM(out_rows) AS t FROM prod)
         SELECT join_key, l_rows, r_rows, CAST(out_rows AS BIGINT)
             AS out_rows,
           round(CAST(out_rows AS DOUBLE) / t, 6) AS share
         FROM prod, tot
         ORDER BY out_rows DESC, join_key
         LIMIT 20""",

    "concurrency_profile" ->
      """WITH spans AS (
           SELECT event_id, CAST(ts AS TIMESTAMP) AS t0,
             CAST(ts AS TIMESTAMP)
               + to_seconds(60 + event_id % 300) AS t1
           FROM events),
         pts AS (
           SELECT event_id, t0 AS t, 1 AS d FROM spans
           UNION ALL
           SELECT event_id, t1 AS t, -1 AS d FROM spans),
         run AS (
           SELECT date_trunc('hour', t) AS hour, t, d, event_id,
             SUM(d) OVER (ORDER BY t, d, event_id
               ROWS UNBOUNDED PRECEDING) AS r
           FROM pts),
         run2 AS (
           SELECT hour, d, r,
             first_value(r - d) OVER (PARTITION BY hour
               ORDER BY t, d, event_id) AS carry
           FROM run)
         SELECT hour,
           CAST(GREATEST(MAX(r), MAX(carry)) AS BIGINT)
             AS max_concurrency,
           CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_starts,
           CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ends
         FROM run2 GROUP BY 1 ORDER BY 1""",

    "manifest_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
         FROM orders
         WHERE o_totalprice BETWEEN 30000.0 AND 45000.0
         ORDER BY o_orderkey""",

    "fuzzy_join" ->
      """WITH dirty AS (
           SELECT c_custkey AS dirty_id,
             substr(c_name, 1, CAST(c_custkey % 18 AS INT)) ||
             substr(c_name, CAST(c_custkey % 18 AS INT) + 2)
               AS dirty_name
           FROM customer)
         SELECT c.c_custkey, c.c_name, d.dirty_id, d.dirty_name,
           CAST(levenshtein(c.c_name, d.dirty_name) AS BIGINT) AS dist
         FROM customer c CROSS JOIN dirty d
         WHERE levenshtein(c.c_name, d.dirty_name) <= 1
         ORDER BY c.c_custkey, d.dirty_id""",

    "fuzzy_join_ed2" ->
      """WITH d1 AS (
           SELECT c_custkey,
             substr(c_name, 1, CAST(c_custkey % 18 AS INT)) ||
             substr(c_name, CAST(c_custkey % 18 AS INT) + 2) AS n1
           FROM customer),
         dirty AS (
           SELECT c_custkey AS dirty_id,
             substr(n1, 1, CAST(c_custkey % 17 AS INT)) ||
             substr(n1, CAST(c_custkey % 17 AS INT) + 2) AS dirty_name
           FROM d1 WHERE c_custkey % 5 = 0)
         SELECT c.c_custkey, c.c_name, d.dirty_id, d.dirty_name,
           CAST(levenshtein(c.c_name, d.dirty_name) AS BIGINT) AS dist
         FROM customer c CROSS JOIN dirty d
         WHERE levenshtein(c.c_name, d.dirty_name) <= 2
         ORDER BY c.c_custkey, d.dirty_id""",

    "sink_expire" ->
      """SELECT * FROM (VALUES
           (CAST(0 AS BIGINT), 'expired', CAST(-1 AS BIGINT)),
           (CAST(1 AS BIGINT), 'expired', CAST(-1 AS BIGINT)),
           (CAST(2 AS BIGINT), 'expired', CAST(-1 AS BIGINT)),
           (CAST(3 AS BIGINT), 'retained', CAST(4 AS BIGINT)),
           (CAST(4 AS BIGINT), 'retained', CAST(5 AS BIGINT)))
         AS t(version, status, n_rows)
         ORDER BY version""",

    "zscore_normalize" ->
      """WITH m AS (
           SELECT o_orderpriority, count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
               AS sx,
             CAST(SUM(CAST(o_totalprice * o_totalprice
               AS DECIMAL(38,6))) AS DOUBLE) AS sx2
           FROM orders GROUP BY 1),
         mm AS (
           SELECT o_orderpriority, sx / n AS mean,
             CASE WHEN (sx2 - sx * sx / n) / n > 0
               THEN sqrt((sx2 - sx * sx / n) / n) ELSE 0.0 END AS sd
           FROM m)
         SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           round(CASE WHEN mm.sd = 0 THEN 0.0
             ELSE (o.o_totalprice - mm.mean) / mm.sd END, 6) AS zscore
         FROM orders o JOIN mm USING (o_orderpriority)
         ORDER BY o.o_orderkey""",

    "peak_concurrency" ->
      """WITH d AS (
           SELECT event_type, ts AS t, 1 AS delta FROM events
           UNION ALL
           SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS delta
           FROM events),
         c AS (
           SELECT event_type, sum(delta) OVER (PARTITION BY event_type
             ORDER BY t, delta) AS c
           FROM d)
         SELECT event_type, CAST(max(c) AS BIGINT) AS peak,
           CAST(count(*) / 2 AS BIGINT) AS n_intervals
         FROM c GROUP BY 1 ORDER BY 1""",

    "event_transitions" ->
      """WITH nxt AS (
           SELECT event_type AS from_type,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (
           SELECT from_type, to_type, count(*) AS n
           FROM nxt WHERE to_type IS NOT NULL
           GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
         FROM c ORDER BY from_type, to_type""",

    // word-5-gram duplicated-span coverage; Spark groups the 8-byte
    // gram hash, the oracle the gram text — same multiset of counts
    "substring_dedup" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
         g AS (
           SELECT doc_id,
             unnest(range(1, len(toks) - 3)) AS pos,
             unnest(list_transform(range(1, len(toks) - 3),
               i -> array_to_string(toks[i : i + 4], ' '))) AS gram
           FROM d),
         c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
         s AS (
           SELECT doc_id, pos,
             lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
           FROM g WHERE gram IN (SELECT gram FROM c)),
         cov AS (
           SELECT doc_id,
             CAST(sum(LEAST(5, COALESCE(nxt - pos, 5))) AS BIGINT)
               AS dup_tokens
           FROM s GROUP BY doc_id),
         n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
               FROM d)
         SELECT n.doc_id, n.n_tokens,
           COALESCE(cov.dup_tokens, 0) AS dup_tokens,
           round(COALESCE(cov.dup_tokens, 0)
             / CAST(n.n_tokens AS DOUBLE), 6) AS dup_ratio
         FROM n LEFT JOIN cov USING (doc_id) ORDER BY n.doc_id""",

    // five unrolled decimal-folded power iterations, d = 0.85; the
    // vertex set is the edge endpoints (matches Clustering.pageRank)
    "link_rank" ->
      """WITH seq0 AS (
           SELECT user_id, TRY_CAST(props->>'k' AS INTEGER) AS dst,
             ts, event_id
           FROM events),
         seq AS (
           SELECT user_id, dst, lag(dst) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS src
           FROM seq0 WHERE dst IS NOT NULL),
         edges AS (
           SELECT src, dst, count(*) AS cnt FROM seq
           WHERE src IS NOT NULL GROUP BY src, dst),
         outdeg AS (
           SELECT src, CAST(sum(cnt) AS DOUBLE) AS od
           FROM edges GROUP BY src),
         w AS (
           SELECT e.src, e.dst, CAST(e.cnt AS DOUBLE) / o.od AS wt
           FROM edges e JOIN outdeg o USING (src)),
         nodes AS (
           SELECT DISTINCT src AS node FROM edges
           UNION SELECT DISTINCT dst FROM edges),
         nn AS (
           SELECT node, (SELECT CAST(count(*) AS DOUBLE) FROM nodes)
             AS n FROM nodes),
         r0 AS (SELECT node, n, 1.0 / n AS rank FROM nn),
         r1 AS (SELECT nn.node, nn.n,
             0.15 / nn.n + 0.85 * COALESCE(c.contrib, 0.0) AS rank
           FROM nn LEFT JOIN (
             SELECT w.dst AS node, CAST(sum(CAST(r0.rank * w.wt
               AS DECIMAL(38,18))) AS DOUBLE) AS contrib
             FROM w JOIN r0 ON w.src = r0.node GROUP BY w.dst) c
           USING (node)),
         r2 AS (SELECT nn.node, nn.n,
             0.15 / nn.n + 0.85 * COALESCE(c.contrib, 0.0) AS rank
           FROM nn LEFT JOIN (
             SELECT w.dst AS node, CAST(sum(CAST(r1.rank * w.wt
               AS DECIMAL(38,18))) AS DOUBLE) AS contrib
             FROM w JOIN r1 ON w.src = r1.node GROUP BY w.dst) c
           USING (node)),
         r3 AS (SELECT nn.node, nn.n,
             0.15 / nn.n + 0.85 * COALESCE(c.contrib, 0.0) AS rank
           FROM nn LEFT JOIN (
             SELECT w.dst AS node, CAST(sum(CAST(r2.rank * w.wt
               AS DECIMAL(38,18))) AS DOUBLE) AS contrib
             FROM w JOIN r2 ON w.src = r2.node GROUP BY w.dst) c
           USING (node)),
         r4 AS (SELECT nn.node, nn.n,
             0.15 / nn.n + 0.85 * COALESCE(c.contrib, 0.0) AS rank
           FROM nn LEFT JOIN (
             SELECT w.dst AS node, CAST(sum(CAST(r3.rank * w.wt
               AS DECIMAL(38,18))) AS DOUBLE) AS contrib
             FROM w JOIN r3 ON w.src = r3.node GROUP BY w.dst) c
           USING (node)),
         r5 AS (SELECT nn.node, nn.n,
             0.15 / nn.n + 0.85 * COALESCE(c.contrib, 0.0) AS rank
           FROM nn LEFT JOIN (
             SELECT w.dst AS node, CAST(sum(CAST(r4.rank * w.wt
               AS DECIMAL(38,18))) AS DOUBLE) AS contrib
             FROM w JOIN r4 ON w.src = r4.node GROUP BY w.dst) c
           USING (node))
         SELECT node, round(rank, 6) AS rank FROM r5
         ORDER BY node""",

    // hashed-linear classifier: integer char-polynomial feature hash
    // per token (exact both engines), one deterministic double chain
    "classifier_score" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             list_sum(list_transform(string_split(text, ' '),
               tok -> coalesce(list_sum(list_transform(
                 range(1, length(tok) + 1),
                 i -> ascii(tok[i]) * i)), 0) % 1009)) AS hsum
           FROM documents)
         SELECT doc_id, n_tokens,
           round(1.0 / (1.0 + exp(-4.0 * (CAST(hsum AS DOUBLE)
             / (1009.0 * n_tokens) - 0.5))), 6) AS quality
         FROM f ORDER BY doc_id""",

    // char pairs via list indexing; '|' join is safe at the initial
    // (single-char) vocabulary this entry scores
    // round-12: bpe_train FLIPS from rows-only to a full oracle —
    // the iterative argmax IS DuckDB-expressible as a 6-round
    // cascading CTE: per round, adjacent-pair counts over the
    // bracketed symbol encoding (the r8 bpe_encode technique), the
    // same (n DESC, left, right) argmax, and ONE left-to-right
    // replace() to apply the merge (non-overlapping left-to-right
    // replacement = greedy BPE application, both engines)
    "bpe_train" ->
      """WITH words AS (
           SELECT w, count(*) AS freq FROM (
             SELECT unnest(string_split(text, ' ')) AS w
             FROM documents)
           WHERE w <> '' GROUP BY w),
         s0 AS (SELECT freq,
           '⟨' || array_to_string(string_split(w, ''), '⟩⟨') || '⟩' AS s
           FROM words),
         p1 AS (
           SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS n
           FROM (
             SELECT freq, unnest(list_transform(range(1, len(cs)),
               i -> {'a': cs[i], 'b': cs[i+1]})) AS pr
             FROM (SELECT freq,
                     string_split(trim(s, '⟨⟩'), '⟩⟨') AS cs
                   FROM s0)
             WHERE len(cs) >= 2)
           GROUP BY 1, 2),
         m1 AS (SELECT a, b, n FROM p1
                  ORDER BY n DESC, a, b LIMIT 1),
         s1 AS (SELECT freq, replace(s,
           '⟨' || (SELECT a FROM m1) || '⟩⟨' ||
             (SELECT b FROM m1) || '⟩',
           '⟨' || (SELECT a || b FROM m1) || '⟩') AS s
           FROM s0),
         p2 AS (
           SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS n
           FROM (
             SELECT freq, unnest(list_transform(range(1, len(cs)),
               i -> {'a': cs[i], 'b': cs[i+1]})) AS pr
             FROM (SELECT freq,
                     string_split(trim(s, '⟨⟩'), '⟩⟨') AS cs
                   FROM s1)
             WHERE len(cs) >= 2)
           GROUP BY 1, 2),
         m2 AS (SELECT a, b, n FROM p2
                  ORDER BY n DESC, a, b LIMIT 1),
         s2 AS (SELECT freq, replace(s,
           '⟨' || (SELECT a FROM m2) || '⟩⟨' ||
             (SELECT b FROM m2) || '⟩',
           '⟨' || (SELECT a || b FROM m2) || '⟩') AS s
           FROM s1),
         p3 AS (
           SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS n
           FROM (
             SELECT freq, unnest(list_transform(range(1, len(cs)),
               i -> {'a': cs[i], 'b': cs[i+1]})) AS pr
             FROM (SELECT freq,
                     string_split(trim(s, '⟨⟩'), '⟩⟨') AS cs
                   FROM s2)
             WHERE len(cs) >= 2)
           GROUP BY 1, 2),
         m3 AS (SELECT a, b, n FROM p3
                  ORDER BY n DESC, a, b LIMIT 1),
         s3 AS (SELECT freq, replace(s,
           '⟨' || (SELECT a FROM m3) || '⟩⟨' ||
             (SELECT b FROM m3) || '⟩',
           '⟨' || (SELECT a || b FROM m3) || '⟩') AS s
           FROM s2),
         p4 AS (
           SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS n
           FROM (
             SELECT freq, unnest(list_transform(range(1, len(cs)),
               i -> {'a': cs[i], 'b': cs[i+1]})) AS pr
             FROM (SELECT freq,
                     string_split(trim(s, '⟨⟩'), '⟩⟨') AS cs
                   FROM s3)
             WHERE len(cs) >= 2)
           GROUP BY 1, 2),
         m4 AS (SELECT a, b, n FROM p4
                  ORDER BY n DESC, a, b LIMIT 1),
         s4 AS (SELECT freq, replace(s,
           '⟨' || (SELECT a FROM m4) || '⟩⟨' ||
             (SELECT b FROM m4) || '⟩',
           '⟨' || (SELECT a || b FROM m4) || '⟩') AS s
           FROM s3),
         p5 AS (
           SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS n
           FROM (
             SELECT freq, unnest(list_transform(range(1, len(cs)),
               i -> {'a': cs[i], 'b': cs[i+1]})) AS pr
             FROM (SELECT freq,
                     string_split(trim(s, '⟨⟩'), '⟩⟨') AS cs
                   FROM s4)
             WHERE len(cs) >= 2)
           GROUP BY 1, 2),
         m5 AS (SELECT a, b, n FROM p5
                  ORDER BY n DESC, a, b LIMIT 1),
         s5 AS (SELECT freq, replace(s,
           '⟨' || (SELECT a FROM m5) || '⟩⟨' ||
             (SELECT b FROM m5) || '⟩',
           '⟨' || (SELECT a || b FROM m5) || '⟩') AS s
           FROM s4),
         p6 AS (
           SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS n
           FROM (
             SELECT freq, unnest(list_transform(range(1, len(cs)),
               i -> {'a': cs[i], 'b': cs[i+1]})) AS pr
             FROM (SELECT freq,
                     string_split(trim(s, '⟨⟩'), '⟩⟨') AS cs
                   FROM s5)
             WHERE len(cs) >= 2)
           GROUP BY 1, 2),
         m6 AS (SELECT a, b, n FROM p6
                  ORDER BY n DESC, a, b LIMIT 1)
         SELECT rank, "left", "right", n FROM (
           SELECT 1 AS rank, a AS "left", b AS "right", n FROM m1
           UNION ALL SELECT 2 AS rank, a AS "left", b AS "right", n FROM m2
           UNION ALL SELECT 3 AS rank, a AS "left", b AS "right", n FROM m3
           UNION ALL SELECT 4 AS rank, a AS "left", b AS "right", n FROM m4
           UNION ALL SELECT 5 AS rank, a AS "left", b AS "right", n FROM m5
           UNION ALL SELECT 6 AS rank, a AS "left", b AS "right", n FROM m6)
         ORDER BY rank""",

    "bpe_pair_counts" ->
      """WITH words AS (
           SELECT w, count(*) AS freq FROM (
             SELECT unnest(string_split(text, ' ')) AS w
             FROM documents)
           WHERE w <> '' GROUP BY w),
         chars AS (SELECT w, freq, string_split(w, '') AS cs
                   FROM words),
         pairs AS (
           SELECT unnest(list_transform(range(1, len(cs)), i ->
             cs[i] || '|' || cs[i+1])) AS pair, freq
           FROM chars WHERE len(cs) >= 2)
         SELECT split_part(pair, '|', 1) AS sym_a,
           split_part(pair, '|', 2) AS sym_b,
           CAST(sum(freq) AS BIGINT) AS n
         FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""",

    // add-one-smoothed unigram importance ratios; Spark fuses raw +
    // target counts into one aggregate, the oracle spells them out
    "dsir_weight" ->
      """WITH tok AS (
           SELECT doc_id, source,
             unnest(string_split(text, ' ')) AS term
           FROM documents),
         raw AS (SELECT term, count(*) AS rc FROM tok GROUP BY term),
         tgt AS (SELECT term, count(*) AS tc FROM tok
                 WHERE source IN ('src0','src1','src2','src3')
                 GROUP BY term),
         tot AS (SELECT
             (SELECT CAST(count(*) AS DOUBLE) FROM tok) AS r_total,
             (SELECT CAST(count(*) AS DOUBLE) FROM tok
                WHERE source IN ('src0','src1','src2','src3'))
               AS t_total,
             (SELECT CAST(count(*) AS DOUBLE) FROM raw) AS v),
         pt AS (
           SELECT t.doc_id, round(
               ln((COALESCE(g.tc, 0) + 1.0) / (tot.t_total + tot.v))
             - ln((r.rc + 1.0) / (tot.r_total + tot.v)), 6) AS lw
           FROM tok t
           JOIN raw r USING (term)
           LEFT JOIN tgt g USING (term)
           CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(CAST(sum(CAST(lw AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS log_weight
         FROM pt GROUP BY doc_id ORDER BY doc_id""",

    "url_canonical" ->
      """WITH u AS (
           SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN 'http://'
                ELSE 'https://' END)
             || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
             || (CASE WHEN doc_id % 2 = 0 THEN upper(source)
                ELSE source END)
             || '.example.com/docs/' || CAST(doc_id % 50 AS VARCHAR)
             || (CASE WHEN doc_id % 4 = 0
                THEN '?utm_source=feed&utm_campaign=x' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)
             AS url
           FROM documents),
         canon AS (
           SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         lower(regexp_extract(url,
                           '^[a-zA-Z]+://[^/?#]*', 0))
                         || substring(url, length(regexp_extract(url,
                           '^[a-zA-Z]+://[^/?#]*', 0)) + 1),
                         '#.*$', ''),
                       '(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
                     '[?&]$', ''),
                   '^http://', 'https://'),
                 '^https://www\.', 'https://'),
               '/$', '') AS url_canon
           FROM u)
         SELECT doc_id, url_canon,
           count(*) OVER (PARTITION BY url_canon) AS n_dups
         FROM canon ORDER BY doc_id""",

    "winsorize" ->
      """WITH r AS (
           SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
             cume_dist() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice) AS cd
           FROM lineitem),
         c AS (
           SELECT l_returnflag,
             min(CASE WHEN cd >= 0.05 THEN l_extendedprice END) AS lo,
             min(CASE WHEN cd >= 0.95 THEN l_extendedprice END) AS hi
           FROM r GROUP BY 1)
         SELECT r.l_orderkey, r.l_linenumber, r.l_returnflag,
           r.l_extendedprice,
           least(greatest(r.l_extendedprice, c.lo), c.hi) AS clipped
         FROM r JOIN c USING (l_returnflag)
         ORDER BY r.l_orderkey, r.l_linenumber, r.l_returnflag,
           r.l_extendedprice"""
  )
}
