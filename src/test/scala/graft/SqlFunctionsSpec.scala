package graft

import graft.functions._
import org.apache.spark.sql.GraftSqlFunctions
import org.apache.spark.sql.functions._

class SqlFunctionsSpec extends SparkSpec {

  test("graft_* SQL functions run the native kernels") {
    GraftSqlFunctions.register(spark)
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs_v")
    val sql = spark.sql(
      """SELECT doc_id,
           graft_simhash64(split(trim(lower(text)), '\\s+')) AS fp,
           graft_minhash(split(trim(lower(text)), '\\s+'), 3, 16) AS sig,
           graft_char_ngram_hashes(lower(text), 8) AS grams
         FROM docs_v""")
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
      .select(col("doc_id"),
        graft.plans.TextHashExpressions.simHash64(wordTokens(col("text")))
          .as("fp2"),
        graft.plans.TextHashExpressions.shingleMinHash(
          wordTokens(col("text")), 3, 16).as("sig2"),
        graft.plans.TextHashExpressions.charNgramHashes(
          lower(col("text")), 8).as("grams2"))
    val joined = sql.join(df, "doc_id")
    assert(joined.filter(col("fp") =!= col("fp2") ||
      col("sig") =!= col("sig2") || col("grams") =!= col("grams2"))
      .count() == 0)
  }

  test("graft_feature_hash_sum matches the kernel and hand math from SQL") {
    GraftSqlFunctions.register(spark)
    // "ab cd": (97·1+98·2) % 1009 + (99·1+100·2) % 1009 = 293 + 299
    val got = spark.sql(
      "SELECT graft_feature_hash_sum('ab cd', 1009) AS h").head().getLong(0)
    assert(got == 592L)
    assert(spark.sql("SELECT graft_feature_hash_sum('', 1009) AS h")
      .head().getLong(0) == 0L)
  }

  test("graft_bpe_encode and graft_bpe_token_count run the kernel from SQL") {
    GraftSqlFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_bpe_encode('newest test', array('e','es','est'),
           array('s','t','x')) AS toks,
           graft_bpe_token_count('newest test', array('e','es','est'),
           array('s','t','x')) AS n""").head()
    // merges: e+s → es (rank 0), es+t → est (rank 1); 'est x' unused
    assert(row.getSeq[String](0) == Seq("n", "e", "w", "est", "t", "est"))
    assert(row.getLong(1) == 6L)
    val err = intercept[Exception](spark.sql(
      "SELECT graft_bpe_encode('x', array('a'), array())").collect())
    assert(err.getMessage.contains("differ in length"))
  }

  test("graft_zorder interleaves from SQL like the kernel") {
    GraftSqlFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_zorder(CAST(12345 AS BIGINT), CAST(54321 AS BIGINT))")
      .head.getLong(0)
    assert(got == graft.plans.ZOrder.interleave16(12345L, 54321L))
  }

  test("graft_float_dot and graft_sorted_intersect_count from SQL") {
    GraftSqlFunctions.register(spark)
    val r = spark.sql(
      """SELECT
           graft_float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                           array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
           graft_sorted_intersect_count(array(1L, 2L, 5L),
                                        array(2L, 3L, 5L)) AS c""").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 2L)
  }

  test("graft_topk_pairs aggregates exact bounded top-k from SQL") {
    GraftSqlFunctions.register(spark)
    spark.sql("""SELECT * FROM VALUES
        (1L, 10L, 0.9D), (1L, 11L, 0.7D), (1L, 12L, 0.8D),
        (2L, 20L, 0.5D), (2L, 21L, 0.6D)
        AS t(q, n, s)""").createOrReplaceTempView("scored")
    val rows = spark.sql(
      """SELECT q, graft_topk_pairs(s, n, 2) AS top
         FROM scored GROUP BY q ORDER BY q""").collect()
    val top1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top1 == Seq((10L, 0.9), (12L, 0.8)))
    val top2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top2 == Seq((21L, 0.6), (20L, 0.5)))
  }

  test("GraftExtensions is reflectively constructible and injects all functions") {
    // the spark.sql.extensions mechanism instantiates by class name
    val cls = Class.forName("graft.plans.GraftExtensions")
    val ext = cls.getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ext(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
  }

  test("graft_canonical_url matches the DataFrame chain from plain SQL") {
    GraftSqlFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_canonical_url(" +
        "'HTTP://WWW.News.Example.com/Docs/7?utm_source=a#x') AS u")
      .collect().head.getString(0)
    assert(got == "https://news.example.com/Docs/7")
    // parity with the DataFrame chain (separate builders by
    // necessity — the shim can't cross the registry boundary)
    import spark.implicits._
    val urls = Seq(
      "HTTP://WWW.News.Example.com/Docs/7?utm_source=a&utm_campaign=b#x",
      "https://Host.example.com/CaseSensitive/Path",
      "https://a.example.com/p?id=3&utm_medium=mail&q=x",
      "http://a.example.com/dir/", "Relative/Path/?utm_source=x#f")
    val df = urls.toDF("url")
    df.createOrReplaceTempView("__urls")
    val viaSql = spark.sql(
      "SELECT graft_canonical_url(url) FROM __urls")
      .as[String].collect().toSeq
    val viaDf = df.select(
      graft.operators.Curation.canonicalUrl(org.apache.spark.sql
        .functions.col("url"))).as[String].collect().toSeq
    assert(viaSql == viaDf)
  }

  test("bad arguments to graft_* functions fail analysis, not execution") {
    GraftSqlFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), 3)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_simhash64(array(1, 2))").collect()
    }
  }
}
