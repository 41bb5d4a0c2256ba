package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample is deterministic and rate-accurate") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01",
      "documents")
    val s1 = TextAnalysis.stratifiedSample(docs, "lang",
      Map("de" -> 0.5), defaultRate = 0.1, idCol = "doc_id")
    val s2 = TextAnalysis.stratifiedSample(docs.repartition(7), "lang",
      Map("de" -> 0.5), defaultRate = 0.1, idCol = "doc_id")
    // identical selection regardless of partitioning
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty)
    assert(s2.select("doc_id").except(s1.select("doc_id")).isEmpty)
    val de = docs.filter(col("lang") === "de").count().toDouble
    val deKept = s1.filter(col("lang") === "de").count().toDouble
    assert(math.abs(deKept / de - 0.5) < 0.1, s"de rate ${deKept / de}")
  }

  test("tfidfTopK ranks rare repeated terms above common ones") {
    val docs = Seq(
      (0L, "spark spark spark common"),
      (1L, "common other words here"),
      (2L, "common entirely different things")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopK(docs, k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 0: "spark" (tf=3, df=1) far outranks "common" (df=3, idf=0)
    assert(top.head == (0L, 1L, "spark"))
    // "common" appears in every doc → idf = ln(1) = 0 → never top
    // unless nothing else is available
    val doc0 = top.filter(_._1 == 0L).map(_._3)
    assert(doc0.contains("spark") && doc0.last == "common")
  }

  test("langId picks the profile with most stopword hits") {
    val docs = Seq(
      (0L, "the cat and the dog is of to the house"),
      (1L, "der hund und die katze ist das haus"),
      (2L, "le chat et la maison les arbres est"),
      (3L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langIdTable(docs).orderBy("doc_id")
      .as[(Long, String)].collect().map(_._2).toSeq
    assert(out == Seq("en", "de", "fr", "und"))
  }

  test("tokenCounts: whitespace and BPE-ish segmentation") {
    val docs = Seq((0L, "Hello world, 42 times!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs).collect()(0)
    assert(r.getAs[Long]("n_whitespace_tokens") == 4L)
    // hello | world | , | 42 | times | ! → 6
    assert(r.getAs[Long]("n_bpe_tokens") == 6L)
    assert(r.getAs[Long]("n_chars_div4") == 6L) // 22 chars / 4 → ceil 6
  }

  test("qualityScore ratios are consistent") {
    val docs = Seq((0L, "the cat, the hat!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(docs).collect()(0)
    assert(r.getAs[Long]("n_chars") == 17L)
    assert(r.getAs[Long]("n_words") == 4L)
    // operator rounds ratios to 6 decimals
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 17) < 1e-6)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-6)
  }

  test("repetitionStats: degenerate repetition scores high") {
    val docs = Seq(
      (0L, "spam spam spam spam"),             // one word everywhere
      (1L, "alpha beta gamma delta")           // all distinct
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r(0L) == ((4L, 1.0, 1.0)))
    assert(r(1L)._2 == 0.25)          // 1/4 words
    assert(math.abs(r(1L)._3 - 0.333333) < 1e-6) // 1/3 bigrams
  }

  test("redactPii replaces emails, phones and IPs, leaves the rest") {
    val docs = Seq(
      (0L, "mail a.user+tag@sub.example.org or call 123-456-789-0123"),
      (1L, "server at 192.168.0.1 port 8080"),
      (2L, "no pii here, just 3.14 and v1.2.3-beta")
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        TextAnalysis.redactPii($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "mail [EMAIL] or call [PHONE]")
    assert(out(1L) == "server at [IP] port 8080")
    assert(out(2L) == "no pii here, just 3.14 and v1.2.3-beta")
    val (ne, np, ni) = TextAnalysis.piiCounts($"text")
    val counts = docs.select($"doc_id", ne.as("e"), np.as("p"), ni.as("i"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        r.getInt(3))).toMap
    assert(counts(0L) == ((1, 1, 0)))
    assert(counts(1L) == ((0, 0, 1)))
    assert(counts(2L) == ((0, 0, 0)))
  }

  test("fingerprints: rolling is order-sensitive, bag is not") {
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "gamma beta alpha"),
      (2L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(0L)._1 == fp(2L)._1 && fp(0L)._2 == fp(2L)._2)
    assert(fp(0L)._1 != fp(1L)._1) // order matters for rolling
    assert(fp(0L)._2 == fp(1L)._2) // bag hash ignores order
  }

  test("approxVocabTopK honors the Misra-Gries guarantees vs exact counts") {
    // skewed corpus: "hot0".."hot4" dominate a long tail
    val rows = (0 until 5000).map { i =>
      val w = if (i % 2 == 0) s"hot${i % 5}" else s"tail${i % 700}"
      (i.toLong, w)
    }
    val docs = rows.toDF("doc_id", "text").repartition(13)
    val n = rows.length.toLong
    val cap = 64
    val approx = TextAnalysis.approxVocabTopK(docs, k = 10, capacity = cap)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("min_count"))
      .toMap
    val exact = rows.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    // every true heavy hitter (freq > n/(cap+1)) must be reported
    val bound = n / (cap + 1)
    exact.filter(_._2 > bound).keys.foreach(w => assert(approx.contains(w), w))
    // every reported count is a lower bound within n/(cap+1) of truth
    approx.foreach { case (w, c) =>
      assert(c <= exact(w), s"$w over-counted")
      assert(exact(w) - c <= bound, s"$w under-counted past the bound")
    }
    // SQL surface returns the same summary shape
    org.apache.spark.sql.GraftSqlFunctions.register(spark)
    docs.createOrReplaceTempView("mg_in")
    val viaSql = spark.sql(
      s"SELECT graft_approx_topk(text, 10, $cap) FROM mg_in").head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql.length == 10)
  }

  test("chunkDocs windows re-assemble into the original text") {
    val fixture = Seq(
      (1L, "abcdefghij"), // stride 3, size 4 -> abcd defg ghij
      (2L, "abcdefghijk"), // truncated tail chunk "jk"
      (3L, "ab"), // shorter than one chunk
      (4L, "") // empty doc still yields one (empty) chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(fixture, size = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Long, String)].collect()
    assert(out.filter(_._1 == 1L).map(c => (c._3, c._4)).toSeq ==
      Seq((0L, "abcd"), (3L, "defg"), (6L, "ghij")))
    assert(out.filter(_._1 == 2L).map(_._4).toSeq ==
      Seq("abcd", "defg", "ghij", "jk"))
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq("ab"))
    assert(out.filter(_._1 == 4L).map(_._4).toSeq == Seq(""))
    // lossless: chunk 0 plus each later chunk minus its overlap
    // prefix concatenates back to the document
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val rebuilt = TextAnalysis.chunkDocs(docs, size = 240, overlap = 60)
      .groupBy(col("doc_id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("chunk_id"),
          when(col("chunk_id") === 0, col("chunk_text"))
            .otherwise(expr("substring(chunk_text, 61)")).as("piece")))),
        s => s.getField("piece"))).as("rebuilt"))
    val mismatch = docs.join(rebuilt, "doc_id")
      .filter(col("text") =!= col("rebuilt"))
    assert(mismatch.isEmpty)
  }

  test("bm25TopK ranks rare terms above common ones, saturates tf") {
    val in = Seq(
      (1L, "alpha alpha alpha common common"),
      (2L, "beta common common common common"),
      (3L, "common common gamma gamma gamma")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(in, k = 2)
      .orderBy("doc_id", "rank").collect()
    // the doc-exclusive term (df=1) must outrank "common" (df=3)
    assert(out(0).getAs[String]("term") == "alpha")
    assert(out(2).getAs[String]("term") == "beta")
    assert(out(4).getAs[String]("term") == "gamma")
    assert(Seq(1, 3, 5).forall(i => out(i).getAs[String]("term") == "common"))
    // hand-check doc 1 / alpha: N=3, df=1, tf=3, dl=5, avgdl=5
    val idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    val expected = idf * (3 * 2.2) / (3 + 1.2 * (0.25 + 0.75 * 5.0 / 5.0))
    val got = out(0).getAs[Double]("bm25")
    assert(math.abs(got - expected) < 1e-6, s"$got vs $expected")
    // tf saturation: doubling tf must NOT double the score shape-wise
    assert(out(0).getAs[Double]("bm25") <
      2.0 * out(2).getAs[Double]("bm25"))
  }

  test("unigramSurprisal: rare vocabulary scores higher, exact on a fixture") {
    val in = Seq(
      (1L, "the the the"), // most common token only
      (2L, "the the zzyzx") // one rare token
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(in).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // corpus: "the"×5, "zzyzx"×1, total 6
    val pThe = -math.log(5.0 / 6.0)
    val pZ = -math.log(1.0 / 6.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 3L), (2L, 3L)))
    assert(out(0)._3 == r6(3 * r6(pThe) / 3))
    assert(out(1)._3 == r6((2 * r6(pThe) + r6(pZ)) / 3))
    assert(out(1)._3 > out(0)._3, "rare vocabulary must score higher")
    // partitioning independence: same result from one partition
    val one = TextAnalysis.unigramSurprisal(in.coalesce(1)).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(one == out)
  }

  test("dsirWeight: hand-computed smoothed log ratios, target docs skew up") {
    val in = Seq((1L, "a a b"), (2L, "a b b")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeight(in, col("doc_id") === 1)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // raw: a×3 b×3 (R=6, V=2); target doc 1: a×2 b×1 (T=3)
    val lwA = r6(math.log(3.0 / 5.0) - math.log(4.0 / 8.0))
    val lwB = r6(math.log(2.0 / 5.0) - math.log(4.0 / 8.0))
    assert(out == Seq(
      (1L, 3L, r6(2 * lwA + lwB)),
      (2L, 3L, r6(lwA + 2 * lwB))))
    // the target doc weighs above the non-target doc
    assert(out(0)._3 > out(1)._3)
    val shuffled = TextAnalysis.dsirWeight(in.repartition(5),
      col("doc_id") === 1).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(shuffled == out)
  }

  test("classifierScore is a single map-only kernel pass (no shuffle)") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val plan = TextAnalysis.classifierScore(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"classifier scoring should not shuffle:\n$plan")
    assert(plan.toLowerCase.contains("featurehashsum"),
      "the codegen'd kernel should be in the plan")
  }

  test("classifierScore: hand-computed logit, bounds, partition invariance") {
    val in = Seq((1L, "ab cd"), (2L, "zz"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(in).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    def score(hsum: Long, n: Long): Double = {
      val s = hsum.toDouble / (1009.0 * n) - 0.5
      BigDecimal(1.0 / (1.0 + math.exp(-4.0 * s)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // "ab cd" → 293 + 299 (SqlFunctionsSpec math); "zz" → 122·1+122·2
    assert(out == Seq((1L, 2L, score(592L, 2)),
      (2L, 1L, score(366L, 1)), (3L, 1L, score(0L, 1))))
    assert(out.forall { case (_, _, q) => q > 0.0 && q < 1.0 })
    val shuffled = TextAnalysis.classifierScore(in.repartition(5))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(shuffled == out)
  }

  test("sourceVocabOverlap estimates track exact set overlap") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val est = TextAnalysis.sourceVocabOverlap(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getDouble(6))))
      .toMap
    // exact vocab sets per source (20 sources, small fixture)
    val exact = docs.select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (s, rows) =>
        s -> rows.map(_.getString(1)).toSet
      }
    val sources = exact.keys.toSeq.sorted
    val pairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield (sources(i), sources(j))
    assert(est.keySet == pairs.toSet, "every ordered pair present once")
    def close(got: Double, want: Double): Boolean =
      math.abs(got - want) <= math.max(0.05 * want, 2.0)
    pairs.foreach { case (a, b) =>
      val (va, vb, inter, jac) = est((a, b))
      val (ea, eb) = (exact(a), exact(b))
      val eInter = (ea & eb).size.toDouble
      assert(close(va.toDouble, ea.size.toDouble), s"vocab($a)")
      assert(close(vb.toDouble, eb.size.toDouble), s"vocab($b)")
      assert(close(inter.toDouble, eInter), s"inter($a,$b)")
      val eJac = eInter / (ea | eb).size.toDouble
      assert(math.abs(jac - eJac) <= 0.05, s"jaccard($a,$b) $jac vs $eJac")
    }
  }
}
