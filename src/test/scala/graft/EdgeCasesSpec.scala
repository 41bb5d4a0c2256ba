package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: empty frames, all-duplicate corpora,
  * single rows. At 100 TB some partition or some day's batch IS
  * empty — operators must return empty/identity results, not throw. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val oneDoc = Seq((1L, "hello world again")).toDF("doc_id", "text")

  test("dedup family on empty and single-doc corpora") {
    assert(Dedup.exact(noDocs).count() == 0)
    assert(Dedup.minhashLsh(noDocs).count() == 0)
    assert(Dedup.minhashLsh(oneDoc).count() == 0)
    assert(Dedup.simhashPairs(noDocs).count() == 0)
    assert(Dedup.simhashPairs(oneDoc).count() == 0)
    assert(Dedup.ngramJaccard(noDocs).count() == 0)
    assert(Dedup.ngramJaccard(oneDoc).count() == 0)
  }

  test("identical-corpus dedup: all pairs surface") {
    val same = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ee"),
      (3L, "aa bb cc dd ee")).toDF("doc_id", "text")
    assert(Dedup.minhashLsh(same, threshold = 0.9).count() == 3) // 3 pairs
    assert(Dedup.exact(same).count() == 1)
  }

  test("clustering with no pairs yields all singletons") {
    val ids = Seq(1L, 2L, 3L).toDF("id")
    val out = Clustering.dupClusters(ids, "id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(out.filter(col("is_representative")).count() == 3)
  }

  test("scd2 merge with an empty batch returns the dim unchanged") {
    val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val dim = Seq((1L, "x", ts1, None: Option[java.sql.Timestamp], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val empty = Seq.empty[(Long, String)].toDF("k", "attr")
    val merged = Scd.scd2Merge(dim, empty, Seq("k"), Seq("attr"),
      java.sql.Timestamp.valueOf("2026-01-02 00:00:00"))
    assert(merged.count() == 1)
    assert(merged.filter(col("is_current")).count() == 1)
  }

  test("asOfJoin with empty right side keeps left rows with null attrs") {
    val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val left = Seq((1L, ts1)).toDF("k", "ts")
    val right = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("k", "ts", "attr")
    val out = Temporal.asOfJoin(left, "k", "ts", right, "k", "ts",
      Seq("attr"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(2))
  }

  test("similarity search with empty query set") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val noQ = emb.filter(lit(false))
    assert(Similarity.bruteForceTopK(noQ, emb, 5).count() == 0)
    assert(Similarity.lshTopK(noQ, emb, 5).count() == 0)
  }

  test("text analysis on empty strings") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(TextAnalysis.qualityScore(df).count() == 2)
    assert(TextAnalysis.tokenCounts(df).count() == 2)
    assert(TextAnalysis.langIdTable(df).count() == 2)
    assert(TextAnalysis.fingerprints(df).count() == 2)
  }

  test("numericHistogram on a constant column lands in bucket 1") {
    val df = Seq.fill(5)(42.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Analytics.numericHistogram(df, "v", buckets = 16).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("bucket") == 1L)
    assert(out(0).getAs[Long]("n_rows") == 5L)
  }

  test("quantizeInt8Stats on a zero vector yields zero error") {
    val df = Seq((1L, Array.fill(8)(0.0f)), (2L, Array(1.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8Stats(df).orderBy("vec_id").collect()
    assert(out(0).getAs[Double]("scale") == 0.0)
    assert(out(0).getAs[Double]("mse") == 0.0)
    assert(out(1).getAs[Double]("scale") > 0.0)
  }

  test("chunkDocs degenerate inputs: empty corpus, overlap 0, bad args") {
    assert(TextAnalysis.chunkDocs(noDocs, size = 10, overlap = 2).count() == 0)
    // overlap=0: stride == size, no shared chars, still lossless
    val out = TextAnalysis.chunkDocs(oneDoc, size = 5, overlap = 0)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getAs[String]("chunk_text")).mkString("") ==
      "hello world again")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocs(oneDoc, size = 5, overlap = 5)
    }
  }

  test("weightedSystematicSample: empty input, stride beyond total") {
    val noW = Seq.empty[(Long, Long)].toDF("doc_id", "n_chars")
    assert(Mixing.weightedSystematicSample(noW, "doc_id", "n_chars",
      10L).count() == 0)
    // stride larger than the total weight: nothing crosses a boundary
    val tiny = Seq((1L, 3L), (2L, 4L)).toDF("doc_id", "n_chars")
    assert(Mixing.weightedSystematicSample(tiny, "doc_id", "n_chars",
      100L).count() == 0)
    // a row with weight >= stride is always selected
    val big = Seq((1L, 250L), (2L, 1L)).toDF("doc_id", "n_chars")
    val sel = Mixing.weightedSystematicSample(big, "doc_id", "n_chars",
      100L).select("doc_id").as[Long].collect()
    assert(sel.contains(1L))
  }

  test("contaminationScore with an empty benchmark scores all zeros") {
    val sc = Decontam.contaminationScore(oneDoc, noDocs, n = 2).collect()
    assert(sc.length == 1 && sc(0).getAs[Long]("n_hits") == 0L &&
      sc(0).getAs[Long]("contamination_bp") == 0L)
  }
}
