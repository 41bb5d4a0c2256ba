package graft

import graft.operators.Decontam
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"), // bench
    (1L, "one two three four five six seven"), // clean
    (2L, "xx alpha beta gamma delta yy"), // shares a 4-shingle with 0
    (3L, "alpha beta gamma xx delta epsilon") // 3-gram overlap only
  ).toDF("doc_id", "text")

  test("contaminationHits flags exactly the docs sharing a k-shingle") {
    val bench = corpus.filter($"doc_id" === 0L)
    val train = corpus.filter($"doc_id" =!= 0L)
    val hits = Decontam.contaminationHits(train, bench, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(2L -> 1L)) // "alpha beta gamma delta" shared
    val kept = Decontam.decontaminate(train, bench, n = 4)
      .select($"doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L)))
  }

  test("bloom path returns exactly the exact path's hits") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter(pmod($"doc_id", lit(10)) === 0)
    val train = docs.filter(pmod($"doc_id", lit(10)) =!= 0)
    val exact = Decontam.contaminationHits(train, bench, n = 4)
    val bloom = Decontam.contaminationHitsBloom(train, bench, n = 4,
      expectedBenchShingles = 10000L)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty)
    assert(exact.count() > 0) // the comparison is not vacuous
  }

  test("contaminationScore scores every train doc, zero-hit docs included") {
    val bench = corpus.filter($"doc_id" === 0L)
    val train = corpus.filter($"doc_id" =!= 0L)
    val sc = Decontam.contaminationScore(train, bench, n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 4 shingles, none shared; doc 2: 3 shingles, 1 shared
    // ("alpha beta gamma delta"); doc 3: 3 shingles, none (4-gram
    // broken by "xx"). bp = floor(hits*10^4/shingles).
    assert(sc == Map(
      1L -> ((4L, 0L, 0L)),
      2L -> ((3L, 1L, 3333L)),
      3L -> ((3L, 0L, 0L))))
    // consistency with the hits path where hits exist
    val hits = Decontam.contaminationHits(train, bench, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sc.collect { case (id, (_, h, _)) if h > 0 => id -> h } == hits)
  }

  test("bloom prefilter really probes a bloom filter in the plan") {
    val bench = corpus.filter($"doc_id" === 0L)
    val train = corpus.filter($"doc_id" =!= 0L)
    val plan = Decontam.contaminationHitsBloom(train, bench, n = 4,
      expectedBenchShingles = 100L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"))
  }
}
