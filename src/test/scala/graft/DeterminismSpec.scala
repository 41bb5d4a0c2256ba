package graft

import graft.operators.{Analytics, Curation, TextAnalysis}
import org.apache.spark.sql.functions._

/** Property-style tests for the repo's core 100 TB correctness
  * claim: operator output is a pure function of the input MULTISET —
  * invariant under partitioning, row order, and parallelism. A
  * cluster repartitions constantly (AQE, speculative retries, skew
  * splits); an operator whose result depends on layout can never
  * hash-match an oracle twice. Each property runs the operator on a
  * shuffled + repartitioned copy of randomized input (fixed seeds —
  * failures reproduce) and asserts identical results.
  */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def randRows(seed: Int): List[(Long, String, Double)] = {
    val r = new scala.util.Random(seed)
    List.tabulate(1 + r.nextInt(60))(i =>
      (i.toLong, "abc".charAt(r.nextInt(3)).toString,
        math.round(r.nextDouble() * 2e6 - 1e6) / 100.0))
  }

  private def randDocs(seed: Int): List[(Long, String)] = {
    val r = new scala.util.Random(seed)
    val vocab = Seq("spark", "table", "row", "scan", "merge", "agg",
      "window")
    List.tabulate(1 + r.nextInt(30))(i =>
      (i.toLong, List.fill(1 + r.nextInt(20))(
        vocab(r.nextInt(vocab.size))).mkString(" ")))
  }

  test("zscoreNormalize is partitioning- and order-invariant") {
    for (seed <- 1 to 12) {
      val rows = randRows(seed)
      val a = rows.toDF("k", "g", "v")
      val b = new scala.util.Random(seed).shuffle(rows)
        .toDF("k", "g", "v").repartition(7)
      assert(canon(Analytics.zscoreNormalize(a, "g", "v", Seq("k"))) ==
        canon(Analytics.zscoreNormalize(b, "g", "v", Seq("k"))),
        s"seed=$seed")
    }
  }

  test("winsorize is partitioning- and order-invariant") {
    for (seed <- 1 to 12) {
      val rows = randRows(100 + seed)
      val a = rows.toDF("k", "g", "v")
      val b = new scala.util.Random(seed).shuffle(rows)
        .toDF("k", "g", "v").repartition(5)
      assert(canon(Analytics.winsorize(a, "g", "v", Seq("k"))) ==
        canon(Analytics.winsorize(b, "g", "v", Seq("k"))),
        s"seed=$seed")
    }
  }

  test("unigramSurprisal is partitioning- and order-invariant") {
    for (seed <- 1 to 8) {
      val docs = randDocs(200 + seed)
      val a = docs.toDF("doc_id", "text")
      val b = new scala.util.Random(seed).shuffle(docs)
        .toDF("doc_id", "text").repartition(6)
      assert(canon(TextAnalysis.unigramSurprisal(a)) ==
        canon(TextAnalysis.unigramSurprisal(b)), s"seed=$seed")
    }
  }

  test("bm25TopK is partitioning- and order-invariant") {
    for (seed <- 1 to 8) {
      val docs = randDocs(300 + seed)
      val a = docs.toDF("doc_id", "text")
      val b = new scala.util.Random(seed).shuffle(docs)
        .toDF("doc_id", "text").repartition(4)
      assert(canon(TextAnalysis.bm25TopK(a)) ==
        canon(TextAnalysis.bm25TopK(b)), s"seed=$seed")
    }
  }

  test("lineDedup reassembly is the identity when nothing is frequent") {
    for (seed <- 1 to 8) {
      val docs = randDocs(400 + seed)
        .map { case (i, t) => (i, t.split(" ").mkString("\n")) }
      val in = docs.toDF("doc_id", "text")
      val out = Curation.lineDedup(in, maxFreq = 100000)
        .select(col("doc_id"), col("text_clean").as("text"))
      assert(canon(out) == canon(in.select(col("doc_id"), col("text"))),
        s"seed=$seed")
    }
  }
}
