package graft

import graft.sources.{GraftTableCatalog, LogTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TYPE WIDENING (`widenColumnType` / `ALTER TABLE ... ALTER COLUMN
  * ... TYPE`): a metadata-only commit re-declares a column wider and
  * existing parquet files are served through the widened read schema
  * — Spark 4's readers upcast at scan time, so zero data rewrites.
  * Covers the whole allowed matrix (probed against BOTH readers),
  * the refusal matrix (lossy / stats-unsound / dependent-object
  * cases), time travel + restore serving each version under its own
  * type, stream skip + restart pickup, CDF, pruning soundness across
  * the widen, and the native SQL surface. */
class LogWidenSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_widen").toString

  test("int→long: metadata-only widen; both file generations read " +
    "back; time travel serves the old type; restore narrows back") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val preV = t.currentVersion.get
    val preFiles = t.load(spark).inputFiles.toSet
    t.widenColumnType(spark, "k", LongType)
    // metadata-only: same data files, new schema
    assert(t.load(spark).inputFiles.toSet == preFiles)
    assert(t.schema("k").dataType == LongType)
    assert(t.commitOp(t.currentVersion.get) == "widen")
    // a value only the wide type holds
    t.append(Seq((5000000000L, "c")).toDF("k", "v"))
    assert(t.load(spark).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (5000000000L, "c")))
    // time travel: the pre-widen version keeps ITS type and rows
    val old = t.load(spark, Some(preV))
    assert(old.schema("k").dataType == IntegerType)
    assert(old.orderBy("k").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
    // restore: schema narrows back with the data (post-widen file
    // retired, so every served file is int-typed again)
    t.restore(preV)
    assert(t.schema("k").dataType == IntegerType)
    assert(t.load(spark).count() == 2)
  }

  test("the full allowed matrix reads in place under BOTH parquet " +
    "readers; narrowing and lossy pairs refuse") {
    val dir = tmp()
    val pairs: Seq[(String, DataType, Any)] = Seq(
      ("CAST(1 AS TINYINT)", ShortType, 1.toShort),
      ("CAST(2 AS TINYINT)", IntegerType, 2),
      ("CAST(3 AS TINYINT)", LongType, 3L),
      ("CAST(4 AS TINYINT)", DoubleType, 4.0),
      ("CAST(5 AS SMALLINT)", IntegerType, 5),
      ("CAST(6 AS SMALLINT)", LongType, 6L),
      ("CAST(7 AS INT)", LongType, 7L),
      ("CAST(8 AS INT)", DoubleType, 8.0),
      ("CAST(9.5 AS FLOAT)", DoubleType, 9.5),
      ("CAST(10.25 AS DECIMAL(10,2))", DecimalType(22, 4),
        new java.math.BigDecimal("10.2500")),
      ("CAST(11 AS INT)", DecimalType(12, 2),
        new java.math.BigDecimal("11.00")),
      ("CAST(12 AS BIGINT)", DecimalType(22, 2),
        new java.math.BigDecimal("12.00")))
    pairs.zipWithIndex.foreach { case ((sql, to, expect), i) =>
      val t = new LogTable(s"$dir/m$i")
      t.append(spark.range(1).selectExpr(s"$sql AS c"))
      t.widenColumnType(spark, "c", to)
      Seq(true, false).foreach { vec =>
        spark.conf.set("spark.sql.parquet.enableVectorizedReader",
          vec.toString)
        try {
          val got = t.load(spark).collect()(0).get(0)
          assert(got == expect, s"$sql → ${to.simpleString} (vec=$vec): " +
            s"got $got, want $expect")
        } finally spark.conf.set(
          "spark.sql.parquet.enableVectorizedReader", "true")
      }
    }
    // refusal matrix: narrowing, lossy, stats-unsound
    val t = new LogTable(s"$dir/r")
    t.append(spark.range(1).selectExpr(
      "CAST(id AS BIGINT) AS l", "CAST(id AS INT) AS i",
      "DATE'2024-01-02' AS dt", "CAST(id AS DECIMAL(10,4)) AS d"))
    def refused(c: String, to: DataType): Unit = {
      val e = intercept[IllegalArgumentException](
        t.widenColumnType(spark, c, to))
      assert(e.getMessage.contains("not a lossless widening"), e.getMessage)
    }
    refused("l", IntegerType)        // narrowing
    refused("l", DoubleType)         // lossy above 2^53
    refused("dt", TimestampNTZType)  // stats-unsound (days vs micros)
    refused("d", DecimalType(12, 2)) // scale shrink loses digits
    refused("d", DecimalType(10, 6)) // integer headroom shrinks
    refused("i", IntegerType)        // no-op
  }

  test("dependent-object refusals: partition / generated source / " +
    "identity / bloom-indexed columns") {
    val dir = tmp()
    val p = new LogTable(s"$dir/p")
    p.create(StructType(Seq(StructField("k", IntegerType),
      StructField("part", IntegerType))), partitionBy = Seq("part"))
    assert(intercept[IllegalArgumentException](
      p.widenColumnType(spark, "part", LongType))
      .getMessage.contains("partition"))

    val g = new LogTable(s"$dir/g")
    g.create(StructType(Seq(StructField("k", IntegerType),
      StructField("k2", IntegerType))),
      generatedAlwaysAs = Map("k2" -> "k + 1"))
    assert(intercept[IllegalArgumentException](
      g.widenColumnType(spark, "k2", LongType))
      .getMessage.contains("generated"))
    assert(intercept[IllegalArgumentException](
      g.widenColumnType(spark, "k", LongType))
      .getMessage.contains("references it"))

    val b = new LogTable(s"$dir/b")
    b.create(StructType(Seq(StructField("k", IntegerType),
      StructField("v", StringType))), bloomFilterBy = Seq("k"))
    assert(intercept[IllegalArgumentException](
      b.widenColumnType(spark, "k", LongType))
      .getMessage.contains("bloom"))
  }

  test("pruning stays sound across the widen: wide-literal filters " +
    "on narrow-file stats return exactly the right rows") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(Seq((1, "lo"), (100, "lo2")).toDF("k", "v").repartition(1))
    t.append(Seq((1000, "mid")).toDF("k", "v").repartition(1))
    t.widenColumnType(spark, "k", LongType)
    t.append(Seq((6000000000L, "hi")).toDF("k", "v").repartition(1))
    // long-ranged predicate: old int files must be skippable AND the
    // kept set exact
    assert(t.load(spark).filter(col("k") > 5000000000L)
      .as[(Long, String)].collect().toSeq == Seq((6000000000L, "hi")))
    assert(t.load(spark).filter(col("k") < 500L).count() == 2)
    assert(t.load(spark).filter(col("k") === 1000L).count() == 1)
  }

  test("native SQL surface: ALTER TABLE ... ALTER COLUMN ... TYPE " +
    "BIGINT through the catalog; INSERT after widen takes wide values") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.gwiden",
      classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwiden.warehouse", wh)
    val tn = s"t_${System.nanoTime}"
    spark.sql(s"CREATE TABLE gwiden.$tn (k INT, v STRING) USING log")
    spark.sql(s"INSERT INTO gwiden.$tn VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE gwiden.$tn ALTER COLUMN k TYPE BIGINT")
    spark.sql(s"INSERT INTO gwiden.$tn VALUES (7000000000, 'b')")
    assert(spark.sql(s"SELECT k, v FROM gwiden.$tn ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (7000000000L, "b")))
    // narrowing through SQL refuses too
    intercept[Exception](
      spark.sql(s"ALTER TABLE gwiden.$tn ALTER COLUMN k TYPE INT"))
  }

  test("a RUNNING stream crossing a widen fails CLEAN with a restart " +
    "message — not a cryptic parquet conversion error") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(Seq((1, "a")).toDF("k", "v"))
    val q = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", t.path).load()
      .writeStream.format("memory").queryName("widen_running")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    try {
      q.processAllAvailable() // consumes v0 under the int schema
      t.widenColumnType(spark, "k", LongType)
      t.append(Seq((5000000000L, "b")).toDF("k", "v"))
      val e = intercept[Exception](q.processAllAvailable())
      def chain(x: Throwable): Seq[String] =
        if (x == null) Seq.empty
        else Option(x.getMessage).toSeq ++ chain(x.getCause)
      assert(chain(e).exists(_.contains("widened")), chain(e))
    } finally q.stop()
  }

  test("streams skip the widen commit; a restart reads the widened " +
    "schema; CDF serves the history under the current schema") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.widenColumnType(spark, "k", LongType)
    t.append(Seq((9000000000L, "b")).toDF("k", "v"))
    // a stream started AFTER the widen serves the full history
    // under the wide schema (the widen commit itself is invisible)
    val q = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", t.path).load()
      .writeStream.format("memory").queryName("widen_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("widen_stream").orderBy("k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (9000000000L, "b")))
    // change feed: two inserts, no row-level change from the widen
    val ch = t.changes(spark, -1L, t.currentVersion.get)
    assert(ch.select("_change_type").as[String].collect().toSeq
      .forall(_ == "insert"))
    assert(ch.count() == 2)
  }

  test("a FRESH stream replays a history where a widen is FOLLOWED " +
    "by more schema evolution — the captured schema can read every " +
    "post-widen file, so the intermediate widen commit skips (r9 " +
    "advice: exact schema equality permanently bricked such tables)") {
    val t = new LogTable(s"${tmp()}/t")
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.widenColumnType(spark, "k", LongType)
    t.append(Seq((9000000000L, "b")).toDF("k", "v"))
    t.addColumns(Seq(StructField("w", IntegerType))) // evolves AGAIN
    t.append(Seq((7L, "c", 3)).toDF("k", "v", "w"))
    val q = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", t.path).load()
      .writeStream.format("memory").queryName("widen_evolved_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("widen_evolved_stream").count() == 3L)
    assert(spark.table("widen_evolved_stream").orderBy("k")
      .select("k").as[Long].collect().toSeq
      == Seq(1L, 7L, 9000000000L))
    // a RUNNING-stream (narrow captured schema) still fails clean —
    // the readability check is directional, not symmetric
    val t2 = new LogTable(s"${tmp()}/t")
    t2.append(Seq((1, "a")).toDF("k", "v"))
    val q2 = spark.readStream
      .format(classOf[graft.sources.LogStreamProvider].getName)
      .option("path", t2.path).load()
      .writeStream.format("memory").queryName("widen_evolved_run")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      t2.widenColumnType(spark, "k", LongType)
      t2.append(Seq((5000000000L, "b")).toDF("k", "v"))
      val e = intercept[Exception](q2.processAllAvailable())
      def chain(x: Throwable): Seq[String] =
        if (x == null) Seq.empty
        else Option(x.getMessage).toSeq ++ chain(x.getCause)
      assert(chain(e).exists(_.contains("widened")), chain(e))
    } finally q2.stop()
  }
}
