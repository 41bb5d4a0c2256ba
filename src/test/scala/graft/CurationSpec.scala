package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.sources.Tables.load(spark,
    "/root/testdata/sf0.01", "documents")

  test("lineDedup removes corpus-frequent lines and reassembles in order") {
    val in = Seq(
      (1L, "header\nbody one\nfooter"),
      (2L, "header\nbody two\nfooter"),
      (3L, "header\nbody three\nfooter"),
      (4L, "solo line\nheader"),
      (5L, "header\nheader\nunique"))
      .toDF("doc_id", "text")
    // "header" appears 6 times (> 2), "footer" 3 times (> 2)
    val out = Curation.lineDedup(in, maxFreq = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 3L, 1L, "body one")))
    assert(out(1) == ((2L, 3L, 1L, "body two")))
    assert(out(2) == ((3L, 3L, 1L, "body three")))
    assert(out(3) == ((4L, 2L, 1L, "solo line")))
    // every copy of a frequent line goes, order of survivors kept
    assert(out(4) == ((5L, 3L, 1L, "unique")))
  }

  test("lineDedup keeps everything when nothing crosses the threshold") {
    val in = Seq((1L, "a\nb"), (2L, "c\nd")).toDF("doc_id", "text")
    val out = Curation.lineDedup(in, maxFreq = 5).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 2L, "a\nb")))
    assert(out(1) == ((2L, 2L, 2L, "c\nd")))
  }

  test("lineDedup counts by hash, not text: shuffle carries 16-byte keys") {
    // plan shape: the frequency branch groups on xxhash64(line) —
    // assert no aggregate groups on the raw line string
    val plan = Curation.lineDedup(docs, maxFreq = 10)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("xxhash64"))
  }

  test("gopherRules flags are attributable and pass is their conjunction") {
    val in = Seq(
      (1L, "short"), // fails word count
      (2L, Seq.fill(40)("word").mkString(" ")), // passes
      (3L, "- a\n- b\n- c\n- d"), // bullet-heavy
      (4L, Seq.fill(40)("anonymised").mkString(" ")) // long mean word len
    ).toDF("doc_id", "text")
    val out = Curation.gopherRules(in, minWords = 8, maxWords = 100,
      maxMeanWordLen = 6.0, maxBulletRatio = 0.5)
      .orderBy("doc_id").collect()
    def row(i: Int) = out(i)
    assert(!row(0).getAs[Boolean]("r_word_count"))
    assert(!row(0).getAs[Boolean]("pass"))
    assert(row(1).getAs[Boolean]("r_word_count")
      && row(1).getAs[Boolean]("pass"))
    assert(!row(2).getAs[Boolean]("r_bullet_ratio"))
    assert(!row(3).getAs[Boolean]("r_mean_word_len"))
    assert(!row(3).getAs[Boolean]("pass"))
    // pass == AND of all rule columns, row by row
    val names = Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_bullet_ratio", "r_ellipsis_ratio", "r_alpha_ratio")
    out.foreach { r =>
      assert(r.getAs[Boolean]("pass") ==
        names.forall(r.getAs[Boolean](_)))
    }
  }

  test("gopherRules is a single map-only pass (no shuffle)") {
    val plan = Curation.gopherRules(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quality gate should not shuffle:\n$plan")
  }

  test("lineDedup emits a doc even when every line is boilerplate") {
    val in = Seq(
      (1L, "x\nx"), (2L, "x\ny"), (3L, "x\nz"))
      .toDF("doc_id", "text") // "x" appears 4 times > 3
    val out = Curation.lineDedup(in, maxFreq = 3).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 0L, "")),
      "all-boilerplate doc keeps its row with empty text")
    assert(out(1) == ((2L, 2L, 1L, "y")))
    assert(out.length == 3)
  }

  test("substringDedup merges overlapping duplicate 5-gram spans") {
    val in = Seq(
      (1L, "a b c d e f g h i j"),        // shares a..f with doc 2
      (2L, "x a b c d e f y z w"),
      (3L, "p q r s t u v"),              // fully unique
      (4L, "m n o p q m n o p q"),        // self-repeating 5-gram
      (5L, "a b"))                        // shorter than k
      .toDF("doc_id", "text")
    val out = Curation.substringDedup(in, k = 5).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // doc 1: duplicate starts {1, 2} merge into tokens 1..6
    assert(out(0) == ((1L, 10L, 6L, 0.6)))
    // doc 2: starts {2, 3} cover tokens 2..7
    assert(out(1) == ((2L, 10L, 6L, 0.6)))
    assert(out(2) == ((3L, 7L, 0L, 0.0)))
    // doc 4: "m n o p q" at starts {1, 6} covers all 10 tokens
    assert(out(3) == ((4L, 10L, 10L, 1.0)))
    // shorter than k: no grams, nothing flagged
    assert(out(4) == ((5L, 2L, 0L, 0.0)))
  }

  test("substringDedup shuffles gram hashes, not gram text") {
    val plan = Curation.substringDedup(docs, k = 5)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("xxhash64"))
  }

  test("sourceCap under-full sources emit all their rows") {
    val in = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 5L)) // source b has fewer docs than cap
      .toDF("doc_id", "source", "n_chars")
    val out = Curation.sourceCap(in, cap = 2)
      .orderBy("source", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 1L, 3L, 30L), ("a", 2L, 2L, 20L),
      ("b", 1L, 4L, 5L)))
  }

  test("canonicalUrl passes schemeless strings through the same chain") {
    // no scheme → the host-lowercase step is a no-op; the rest of the
    // chain (fragment/tracking/trailing-slash) still applies
    val got = Seq("Relative/Path/?utm_source=x#f").toDF("url")
      .select(Curation.canonicalUrl(col("url"))).as[String].head()
    assert(got == "Relative/Path")
  }

  test("canonicalUrl normalizes the classic crawl-dup variants") {
    val cases = Seq(
      // scheme + www + case + tracking + fragment all collapse
      ("HTTP://WWW.News.Example.com/Docs/7?utm_source=a&utm_campaign=b#x",
        "https://news.example.com/Docs/7"),
      ("https://news.example.com/Docs/7", "https://news.example.com/Docs/7"),
      // path case is PRESERVED (only scheme://host lowercases)
      ("https://Host.example.com/CaseSensitive/Path",
        "https://host.example.com/CaseSensitive/Path"),
      // non-tracking params survive; tracking params inside a query drop
      ("https://a.example.com/p?id=3&utm_medium=mail&q=x",
        "https://a.example.com/p?id=3&q=x"),
      // trailing slash and bare fragment
      ("http://a.example.com/dir/", "https://a.example.com/dir"),
      ("https://a.example.com/p#sec", "https://a.example.com/p"))
    val got = cases.map(_._1).toDF("url")
      .select(Curation.canonicalUrl(col("url"))).as[String].collect().toSeq
    assert(got == cases.map(_._2),
      got.zip(cases).filter(p => p._1 != p._2._2).mkString("; "))
  }

  test("sourceCap keeps exactly cap docs per source, longest first") {
    val out = Curation.sourceCap(docs, cap = 10)
    val perSource = out.groupBy("source").count()
      .as[(String, Long)].collect()
    assert(perSource.forall(_._2 == 10),
      "every synthetic source has >10 docs, so each is capped at 10")
    // matches the window formulation exactly
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val ref = docs
      .select(col("source"), row_number().over(w).cast("long").as("rank"),
        col("doc_id"), col("n_chars"))
      .where(col("rank") <= 10)
    assert(out.except(ref).isEmpty && ref.except(out).isEmpty)
  }

  test("sourceCap aggregates bounded heaps — no Window or sort per source") {
    val plan = Curation.sourceCap(docs, cap = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"cap must not window-sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected the bounded-heap aggregate:\n$plan")
  }
}
