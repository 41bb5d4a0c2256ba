package graft

import graft.operators.Pipeline
import graft.operators.Pipeline.TableConfig
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val cfg = TableConfig("kunden",
    keyCols = Seq("kunde_id"), attrCols = Seq("name", "stadt"),
    recencyCols = Seq("ingest_ts"), scdType = 2,
    cleanCols = Seq("name", "stadt"))

  test("two SCD2 increments: new, changed and unchanged keys") {
    val t1 = ts("2026-01-01 00:00:00")
    val t2 = ts("2026-01-02 00:00:00")
    val b1 = Seq((1L, " Alice ", "Berlin"), (2L, "Bob", "Hamburg"))
      .toDF("kunde_id", "name", "stadt")
    val dim0 = Pipeline.emptyDim(spark, b1, cfg)
    val dim1 = Pipeline.runIncrement(b1, dim0, cfg, "b1", t1)
    // batch 2: key 1 unchanged (after trim), key 2 moves, key 3 new
    val b2 = Seq((1L, "Alice", "Berlin"), (2L, "Bob", "München"),
      (3L, "Cara", "Köln")).toDF("kunde_id", "name", "stadt")
    val dim2 = Pipeline.runIncrement(b2, dim1, cfg, "b2", t2)
      .orderBy(col("kunde_id"), col("valid_from"))
      .select("kunde_id", "name", "stadt", "valid_from", "valid_to",
        "is_current")
      .as[(Long, String, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)]
      .collect().toSeq
    assert(dim2 == Seq(
      (1L, "Alice", "Berlin", t1, None, true),
      (2L, "Bob", "Hamburg", t1, Some(t2), false),
      (2L, "Bob", "München", t2, None, true),
      (3L, "Cara", "Köln", t2, None, true)))
  }

  test("SCD1 config keeps only last-writer state") {
    val c1 = cfg.copy(scdType = 1)
    val t1 = ts("2026-01-01 00:00:00")
    val b1 = Seq((1L, "Alice", "Berlin"), (2L, "Bob", "Hamburg"))
      .toDF("kunde_id", "name", "stadt")
    val dim1 = Pipeline.runIncrement(b1,
      b1.limit(0), c1, "b1", t1)
    val b2 = Seq((2L, "Bob", "München")).toDF("kunde_id", "name", "stadt")
    val dim2 = Pipeline.runIncrement(b2, dim1, c1, "b2", t1)
      .orderBy("kunde_id")
      .as[(Long, String, String)].collect().toSeq
    assert(dim2 == Seq((1L, "Alice", "Berlin"), (2L, "Bob", "München")))
  }

  test("merge stats report the new/changed/unchanged split in one job") {
    val t1 = ts("2026-01-01 00:00:00")
    val t2 = ts("2026-01-02 00:00:00")
    val b1 = Seq((1L, "Alice", "Berlin"), (2L, "Bob", "Hamburg"))
      .toDF("kunde_id", "name", "stadt")
    val dim1 = Pipeline.runIncrement(b1,
      Pipeline.emptyDim(spark, b1, cfg), cfg, "b1", t1)
    // batch 2: key 1 unchanged, key 2 changed, keys 3+4 new
    val b2 = Seq((1L, "Alice", "Berlin"), (2L, "Bob", "München"),
      (3L, "Cara", "Köln"), (4L, "Dan", "Mainz"))
      .toDF("kunde_id", "name", "stadt")
    val result = Pipeline.runIncrementWithStats(b2, dim1, cfg, "b2", t2)
    assert(result.stats.as[(Long, Long, Long)].collect().toSeq ==
      Seq((2L, 1L, 1L))) // (n_new, n_changed, n_unchanged)
    // and the returned dim is the same merge runIncrement produces
    assert(result.dim.count() ==
      Pipeline.runIncrement(b2, dim1, cfg, "b2", t2).count())
  }

  test("runAll drives multiple table configs in one call") {
    val t1 = ts("2026-01-01 00:00:00")
    val orte = TableConfig("orte", Seq("ort_id"), Seq("plz"),
      Seq("ingest_ts"), scdType = 1)
    val batches = Map(
      "kunden" -> Seq((1L, "Alice", "Berlin"))
        .toDF("kunde_id", "name", "stadt"),
      "orte" -> Seq((10L, "10115")).toDF("ort_id", "plz"))
    val dims = Pipeline.runAll(spark, Seq(cfg, orte), batches,
      Map.empty, t1)
    assert(dims("kunden").count() == 1)
    assert(dims("orte").as[(Long, String)].collect().toSeq ==
      Seq((10L, "10115")))
  }

  test("fullSnapshot config closes versions for keys the batch omits") {
    val cfg = Pipeline.TableConfig("kunden", Seq("kunde_id"),
      Seq("stadt"), Seq("ingest_ts"), fullSnapshot = true)
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    val b1 = Seq((1L, "Berlin"), (2L, "Hamburg")).toDF("kunde_id", "stadt")
    val d1 = Pipeline.runIncrement(b1, Pipeline.emptyDim(spark, b1, cfg),
      cfg, "snap", t1)
    // snapshot 2 omits kunde 2 → its version must close at t2
    val b2 = Seq((1L, "Berlin")).toDF("kunde_id", "stadt")
    val d2 = Pipeline.runIncrement(b2, d1, cfg, "snap", t2)
      .orderBy("kunde_id").collect()
    assert(d2.length == 2)
    val k2 = d2.filter(_.getLong(0) == 2L).head
    assert(!k2.getAs[Boolean]("is_current"))
    assert(k2.getAs[java.sql.Timestamp]("valid_to") == t2)
    assert(d2.filter(_.getLong(0) == 1L).head.getAs[Boolean]("is_current"))
  }

  test("validateBatch tags null fields, dup keys and clean rows") {
    val batch = Seq(
      (1L, Some("x")), // ok
      (2L, Some("y")), (2L, Some("y")), // dup_key twice
      (3L, None), // null_field
      (4L, None), (4L, Some("z")) // null wins over dup on the null row
    ).toDF("k", "v")
    val out = Pipeline.validateBatch(batch, Seq("k"), Seq("v"))
      .orderBy("k", "_violation")
      .select("k", "_violation").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "ok"), (2L, "dup_key"), (2L, "dup_key"),
      (3L, "null_field"), (4L, "dup_key"), (4L, "null_field")))
  }
}
