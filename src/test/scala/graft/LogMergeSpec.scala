package graft

import graft.sources.{GraftTableCatalog, LogTable, SqlMerge}
import org.apache.spark.sql.functions._

/** File-granularity MERGE INTO the transaction-log table: only files
  * containing changed rows are rewritten; inserts append; untouched
  * files carry forward by reference. */
class LogMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_logmerge").toString

  private def seeded(): LogTable = {
    val t = new LogTable(s"${tmp()}/t")
    // two single-file commits, disjoint key ranges
    t.append(Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("k", "v", "n")
      .repartition(1))
    t.append(Seq((10L, "c", 0L), (11L, "d", 0L)).toDF("k", "v", "n")
      .repartition(1))
    t
  }

  test("update/delete/insert in one merge: only the touched file is " +
    "rewritten, the untouched one carries by reference") {
    val t = seeded()
    val untouched = t.liveAdds().find(_.stats("k").max.contains(2L)).get.path
    Seq((10L, 5L), (11L, 20L), (30L, 7L)).toDF("k", "m")
      .createOrReplaceTempView("lm_src_1")
    val r = SqlMerge.mergeLog(spark,
      """MERGE INTO dim t USING lm_src_1 s ON t.k = s.k
         WHEN MATCHED AND s.m > 10 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = 'upd', n = s.m
         WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, 'new', s.m)""",
      t)
    assert(r.updated == 1L && r.deleted == 1L && r.inserted == 1L
      && r.unchanged == 2L, r)
    assert(t.load(spark).select("k", "v", "n").as[(Long, String, Long)]
      .collect().toSet == Set((1L, "a", 0L), (2L, "b", 0L),
        (10L, "upd", 5L), (30L, "new", 7L)))
    // the low-range file was never part of the rewrite
    assert(t.liveAdds().map(_.path).contains(untouched))
    assert(t.commitOp(t.currentVersion.get) == "merge")
  }

  test("insert-only merge removes nothing — pure append commit") {
    val t = seeded()
    val before = t.liveAdds().map(_.path).toSet
    Seq((50L, 1L)).toDF("k", "m").createOrReplaceTempView("lm_src_2")
    val r = SqlMerge.mergeLog(spark,
      """MERGE INTO dim t USING lm_src_2 s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, 'new', s.m)""",
      t)
    assert(r.inserted == 1L && r.updated == 0L && r.deleted == 0L)
    assert(before.subsetOf(t.liveAdds().map(_.path).toSet))
    assert(t.load(spark).count() == 5L)
  }

  test("NOT MATCHED BY SOURCE deletes touch the unmatched rows' " +
    "files too") {
    val t = seeded()
    Seq((10L, 1L)).toDF("k", "m").createOrReplaceTempView("lm_src_3")
    val r = SqlMerge.mergeLog(spark,
      """MERGE INTO dim t USING lm_src_3 s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET n = s.m
         WHEN NOT MATCHED BY SOURCE AND t.k <= 1 THEN DELETE""",
      t)
    assert(r.updated == 1L && r.deleted == 1L, r)
    assert(t.load(spark).select("k").as[Long].collect().toSet
      == Set(2L, 10L, 11L))
  }

  test("a merge commit records its change feed: pre/post images, " +
    "deletes and inserts") {
    val t = seeded()
    val before = t.currentVersion.get
    Seq((10L, 5L), (11L, 20L), (30L, 7L)).toDF("k", "m")
      .createOrReplaceTempView("lm_src_cdf")
    SqlMerge.mergeLog(spark,
      """MERGE INTO dim t USING lm_src_cdf s ON t.k = s.k
         WHEN MATCHED AND s.m > 10 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = 'upd', n = s.m
         WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, 'new', s.m)""",
      t)
    val cdf = t.changes(spark, before, t.currentVersion.get)
      .select("k", "v", "n", "_change_type")
      .as[(Long, String, Long, String)].collect().toSet
    assert(cdf == Set(
      (10L, "c", 0L, "update_preimage"),
      (10L, "upd", 5L, "update_postimage"),
      (11L, "d", 0L, "delete"),
      (30L, "new", 7L, "insert")))
  }

  test("cardinality violation aborts before any commit") {
    val t = seeded()
    val v = t.currentVersion.get
    Seq((10L, 1L), (10L, 2L)).toDF("k", "m")
      .createOrReplaceTempView("lm_src_4")
    intercept[IllegalStateException](SqlMerge.mergeLog(spark,
      """MERGE INTO dim t USING lm_src_4 s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET n = s.m""", t))
    assert(t.currentVersion.contains(v)) // nothing committed
  }

  test("MERGE INTO cat.t resolves the log table from the statement's " +
    "own name; the catalog serves the merged snapshot") {
    val wh = tmp()
    val t = new LogTable(s"$wh/dim")
    t.append(Seq((1L, "a", 0L)).toDF("k", "v", "n"))
    spark.conf.set("spark.sql.catalog.lmcat",
      classOf[GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.lmcat.warehouse", wh)
    Seq((1L, 9L), (2L, 3L)).toDF("k", "m")
      .createOrReplaceTempView("lm_src_5")
    val r = SqlMerge.mergeLog(spark,
      """MERGE INTO lmcat.dim t USING lm_src_5 s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET n = s.m
         WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, 'new', s.m)""")
    assert(r.updated == 1L && r.inserted == 1L)
    assert(spark.sql("SELECT k, v, n FROM lmcat.dim ORDER BY k")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 9L), (2L, "new", 3L)))
  }
}
