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

  test("substringDedup is partitioning- and order-invariant") {
    for (seed <- 1 to 8) {
      val rows = randDocs(300 + seed)
      val a = rows.toDF("doc_id", "text")
      val b = new scala.util.Random(seed).shuffle(rows)
        .toDF("doc_id", "text").repartition(6)
      assert(canon(Curation.substringDedup(a, k = 3)) ==
        canon(Curation.substringDedup(b, k = 3)), s"seed=$seed")
    }
  }

  test("dsirWeight is partitioning- and order-invariant") {
    for (seed <- 1 to 8) {
      val rows = randDocs(400 + seed)
      val a = rows.toDF("doc_id", "text")
      val b = new scala.util.Random(seed).shuffle(rows)
        .toDF("doc_id", "text").repartition(6)
      assert(canon(TextAnalysis.dsirWeight(a, col("doc_id") % 3 === 0)) ==
        canon(TextAnalysis.dsirWeight(b, col("doc_id") % 3 === 0)),
        s"seed=$seed")
    }
  }

  test("Bpe.train is partitioning- and order-invariant") {
    import graft.operators.Bpe
    for (seed <- 1 to 4) {
      val rows = randDocs(500 + seed)
      val a = rows.toDF("doc_id", "text")
      val b = new scala.util.Random(seed).shuffle(rows)
        .toDF("doc_id", "text").repartition(6)
      // exact integer pair counts + (count desc, pair asc) total
      // order ⇒ the merge table cannot depend on layout
      assert(canon(Bpe.train(a, merges = 5)) ==
        canon(Bpe.train(b, merges = 5)), s"seed=$seed")
    }
  }

  test("gapFillCounts and locfFill are partitioning- and " +
    "order-invariant") {
    import graft.operators.Temporal
    def randEvents(seed: Int): List[(Long, java.sql.Timestamp, Double)] = {
      val r = new scala.util.Random(seed)
      List.tabulate(20 + r.nextInt(80)) { i =>
        (r.nextLong(5), new java.sql.Timestamp(
          1700000000000L + r.nextLong(72L * 3600 * 1000)),
          math.round(r.nextDouble() * 1e4) / 100.0)
      }
    }
    for (seed <- 1 to 6) {
      val rows = randEvents(seed)
      val a = rows.toDF("user_id", "ts", "value")
      val b = new scala.util.Random(seed).shuffle(rows)
        .toDF("user_id", "ts", "value").repartition(7)
      assert(canon(Temporal.gapFillCounts(a)) ==
        canon(Temporal.gapFillCounts(b)), s"seed=$seed")
      assert(canon(Temporal.locfFill(a, "user_id", "ts", "value")) ==
        canon(Temporal.locfFill(b, "user_id", "ts", "value")),
        s"seed=$seed")
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

  private def randSpans(seed: Int): List[(Long, Long, Long)] = {
    val r = new scala.util.Random(seed)
    // spans up to ~3 h over a ~12 h range, second granularity
    List.tabulate(1 + r.nextInt(50)) { i =>
      val s = r.nextInt(12 * 3600).toLong
      (i.toLong, s, s + 1 + r.nextInt(3 * 3600))
    }
  }

  test("concurrencyProfile is partitioning- and order-invariant") {
    val base = 1700000000L
    for (seed <- 21 to 30) {
      val spans = randSpans(seed)
      def df(rows: List[(Long, Long, Long)], parts: Int) = rows
        .toDF("id", "s0", "e0")
        .select(col("id"),
          timestamp_seconds(col("s0") + base).as("s"),
          timestamp_seconds(col("e0") + base).as("e"))
        .repartition(parts)
      val a = Analytics.concurrencyProfile(df(spans, 1), "id", "s", "e")
      val b = Analytics.concurrencyProfile(
        df(new scala.util.Random(seed).shuffle(spans), 7), "id", "s", "e")
      assert(canon(a) == canon(b), s"seed=$seed")
    }
  }

  test("fuzzyJoinEd1 is partitioning- and order-invariant") {
    val vocab = Seq("alpha", "alpah", "alphas", "bravo", "brvo",
      "charlie", "charlee", "delta", "delt", "echo")
    for (seed <- 41 to 48) {
      val r = new scala.util.Random(seed)
      val left = List.tabulate(1 + r.nextInt(20))(i =>
        (i.toLong, vocab(r.nextInt(vocab.size))))
      val right = List.tabulate(1 + r.nextInt(20))(i =>
        (100L + i, vocab(r.nextInt(vocab.size))))
      val a = graft.operators.Linkage.fuzzyJoinEd1(
        left.toDF("id", "name"), "id", "name",
        right.toDF("id", "name"), "id", "name")
      val b = graft.operators.Linkage.fuzzyJoinEd1(
        r.shuffle(left).toDF("id", "name").repartition(5), "id", "name",
        r.shuffle(right).toDF("id", "name").repartition(3), "id", "name")
      assert(canon(a) == canon(b), s"seed=$seed")
    }
  }

  test("joinBlowupProfile is partitioning-invariant incl. the top-k cut") {
    for (seed <- 61 to 68) {
      val r = new scala.util.Random(seed)
      // duplicate-heavy keys so l*r products tie at the k boundary —
      // the (out_rows DESC, join_key) order must still be total
      val rows = List.tabulate(40 + r.nextInt(60))(i =>
        (r.nextInt(12).toLong, i.toLong))
      val a = graft.operators.Skew.joinBlowupProfile(
        rows.toDF("k", "p"), rows.toDF("k", "p"), "k", "k", k = 5)
      val b = graft.operators.Skew.joinBlowupProfile(
        r.shuffle(rows).toDF("k", "p").repartition(7),
        r.shuffle(rows).toDF("k", "p").repartition(3), "k", "k", k = 5)
      assert(canon(a) == canon(b), s"seed=$seed")
    }
  }
}
