package graft

import graft.functions._
import graft.plans.FloatVectorExpressions.{floatDot, floatNorm}
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("native FloatDotProduct is bit-equal to the declarative fold") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val both = emb.select(
      dotProduct(col("embedding"), col("embedding")).as("fold"),
      floatDot(col("embedding"), col("embedding")).as("native"),
      l2Norm(col("embedding")).as("foldn"),
      floatNorm(col("embedding")).as("nativen"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-exact
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("native SrpBuckets matches the declarative hyperplane formula") {
    import graft.plans.FloatVectorExpressions.srpBuckets
    val bits = 4; val tables = 3
    // reference formulation: interpreted HOF fold per (table, plane)
    def refBucket(vec: org.apache.spark.sql.Column, table: Int) = {
      val dims = size(vec)
      (0 until bits).map { p =>
        val dot = aggregate(
          zip_with(asDoubles(vec),
            transform(sequence(lit(0), dims - 1),
              j => (pmod(xxhash64(j, lit(table * 97 + p)), lit(2000001L))
                - 1000000L) / 1000000.0),
            _ * _),
          lit(0.0), _ + _)
        when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val rows = emb.select(
      srpBuckets(col("embedding"), bits, tables).as("native"),
      array((0 until tables).map(t => refBucket(col("embedding"), t)): _*)
        .as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("fused text-hash kernels match the declarative compositions") {
    import graft.plans.TextHashExpressions._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    // declarative references: interpreted HOF shingles + xxhash64,
    // with the exact hash composition the kernels fuse
    val n = 3
    val refSig = {
      val sh = explode(array_distinct(wordShingles(col("text"), n)))
      // per-shingle base hash, then k chained family mins per doc:
      // sig(k) = min over shingles of xxhash64(xxhash64(s), k)
      docs.select(col("doc_id"), sh.as("__s"))
        .select(col("doc_id"), xxhash64(col("__s")).as("bh"))
        .groupBy(col("doc_id"))
        .agg(array((0 until 8).map(k =>
          min(xxhash64(col("bh"), lit(k)))): _*).as("ref_sig"))
    }
    val gotSig = docs.select(col("doc_id"),
      shingleMinHash(wordTokens(col("text")), n, 8).as("sig"))
    assert(gotSig.join(refSig, "doc_id")
      .filter(col("sig") =!= col("ref_sig")).count() == 0)

    val refSet = docs.select(col("doc_id"),
      sort_array(array_distinct(transform(
        wordShingles(col("text"), n), s => xxhash64(s)))).as("ref_set"))
    val gotSet = docs.select(col("doc_id"),
      shingleHashes(wordTokens(col("text")), n).as("set"))
    assert(gotSet.join(refSet, "doc_id")
      .filter(col("set") =!= col("ref_set")).count() == 0)

    val refGrams = docs.select(col("doc_id"),
      sort_array(array_distinct(transform(
        charNgrams(col("text"), 8), g => xxhash64(g)))).as("ref_g"))
    val gotGrams = docs.select(col("doc_id"),
      charNgramHashes(lower(col("text")), 8).as("g"))
    assert(gotGrams.join(refGrams, "doc_id")
      .filter(col("g") =!= col("ref_g")).count() == 0)
  }

  test("native SimHash64 matches the exploded 64-sum formulation") {
    import graft.plans.TextHashExpressions.simHash64
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val ref = {
      val toks = docs.select(col("doc_id"),
        explode(wordTokens(col("text"))).as("__t"))
        .withColumn("__h", xxhash64(col("__t")))
      val bitSums = (0 until 64).map { i =>
        sum(when(col("__h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1))
          .as(s"__b$i")
      }
      toks.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(i =>
            when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
            .reduce(_.bitwiseOR(_)).as("ref_fp"))
    }
    val got = docs.select(col("doc_id"),
      simHash64(wordTokens(col("text"))).as("fp"))
    assert(got.join(ref, "doc_id")
      .filter(col("fp") =!= col("ref_fp")).count() == 0)
  }

  test("text-hash kernels: edge cases (empty, short, unicode)") {
    import graft.plans.TextHashExpressions._
    val df = Seq("", "one", "a b", "héllo wörld çafé über",
      "日本語 テスト 文字").toDF("text")
    val both = df.select(
      shingleHashes(wordTokens(col("text")), 3).as("set"),
      sort_array(array_distinct(transform(
        wordShingles(col("text"), 3), s => xxhash64(s)))).as("ref_set"),
      charNgramHashes(lower(col("text")), 8).as("g"),
      sort_array(array_distinct(transform(
        charNgrams(col("text"), 8), g => xxhash64(g)))).as("ref_g"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("native dot handles nulls and empty arrays") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("a", "b")
    val out = df.select(floatDot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("NormalizeText canonicalizes combining sequences") {
    import spark.implicits._
    import graft.plans.TextHashExpressions.normalizeText
    val precomposed = "café"            // é as U+00E9
    val combining = "café"             // e + COMBINING ACUTE
    val df = Seq(
      (1L, combining), (2L, precomposed),
      (3L, "plain ascii"), (4L, "ﬁne")  // ﬁ ligature (NFKC-only)
    ).toDF("id", "t")
    val nfc = df.select(col("id"), normalizeText(col("t")).as("n"))
      .orderBy("id").as[(Long, String)].collect()
    // NFC: combining → precomposed; ascii untouched; ligature kept
    assert(nfc(0)._2 == precomposed)
    assert(nfc(1)._2 == precomposed)
    assert(nfc(2)._2 == "plain ascii")
    assert(nfc(3)._2 == "ﬁne")
    val nfkc = df.select(col("id"), normalizeText(col("t"), nfkc = true).as("n"))
      .orderBy("id").as[(Long, String)].collect()
    assert(nfkc(3)._2 == "fine") // NFKC folds the ligature
    // identical hash after normalization — the dedup motivation
    val hashes = df.select(
      org.apache.spark.sql.functions.xxhash64(normalizeText(col("t"))))
      .collect().map(_.getLong(0))
    assert(hashes(0) == hashes(1))
    // SQL function surface
    org.apache.spark.sql.GraftSqlFunctions.register(spark)
    df.createOrReplaceTempView("norm_in")
    val viaSql = spark.sql(
      "SELECT graft_normalize_text(t, false) FROM norm_in WHERE id = 1")
      .head.getString(0)
    assert(viaSql == precomposed)
  }
}
