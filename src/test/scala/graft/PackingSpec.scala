package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packingPlan lays docs out contiguously per stratum") {
    // stratum "a": 60 + 80 + 10 tokens, budget 100:
    //   doc 0 [0,60) → seq 0; doc 1 [60,140) → seqs 0..1 (split);
    //   doc 2 [140,150) → seq 1. stratum "b" restarts at offset 0.
    val docs = Seq(
      (0L, "a", 60), (1L, "a", 80), (2L, "a", 10), (3L, "b", 40)
    ).toDF("doc_id", "source", "n")
    val plan = Packing.packingPlan(docs, "doc_id", "source",
        col("n"), budget = 100)
      .select($"doc_id", $"start_off", $"seq_first", $"seq_last",
        $"n_splits")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(plan(0L) == ((0L, 0L, 0L, 0L)))
    assert(plan(1L) == ((60L, 0L, 1L, 1L))) // straddles the boundary
    assert(plan(2L) == ((140L, 1L, 1L, 0L)))
    assert(plan(3L) == ((0L, 0L, 0L, 0L))) // independent stratum
  }

  test("packDocuments is deterministic and covers every doc once") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val a = Packing.packDocuments(docs, budget = 128)
    val b = Packing.packDocuments(docs.repartition(7), budget = 128)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == docs.count())
  }
}
