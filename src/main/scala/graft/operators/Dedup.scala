package graft.operators

import graft.functions._
import graft.plans.FloatVectorExpressions.{floatDot, floatNorm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines.
  *
  * Scale design: every variant is linear-per-document plus one
  * key-partitioned shuffle — never a cross join. Candidate
  * generation (LSH bands / simhash chunks) buckets documents so only
  * same-bucket pairs are compared; verification then computes the
  * true similarity on candidates only. This is the standard
  * MinHash-LSH construction (Broder '97; as popularised for LLM data
  * dedup) and survives 100 TB: signatures are a map-side pass,
  * bucket joins shuffle |docs|·bands rows, and skewed buckets can be
  * salted or capped.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical text. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** MinHash signatures via the native one-pass expression — a pure
    * map-side projection, no shuffle (see plans.MinHashSignature).
    * Returns (idCol, sig: array<long>). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleWords: Int, numHashes: Int): DataFrame =
    docs.select(col(idCol),
      graft.plans.FloatVectorExpressions.minhashSig(
        array_distinct(wordShingles(col(textCol), shingleWords)), numHashes)
        .as("sig"))

  /** Candidate pairs via LSH banding: hash each band of the
    * signature, bucket-join docs sharing any (band, bucket). */
  def lshCandidates(sigs: DataFrame, idCol: String,
                    bands: Int, rows: Int): DataFrame = {
    val banded = sigs.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
      .as(Seq("band", "bucket")))
    val a = banded.toDF("id_a", "band", "bucket")
    val b = banded.toDF("id_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates verified by exact
    * shingle-set Jaccard ≥ threshold. */
  def minhashLsh(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", shingleWords: Int = 3,
                 numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.8): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleWords, numHashes)
    val cands = lshCandidates(sigs, idCol, bands, numHashes / bands)
    // verify on hashed shingle sets: long-array intersection is far
    // cheaper than string-array, and jaccard is unchanged modulo
    // 64-bit hash collisions
    val shingled = docs.select(col(idCol).as("__id"),
      array_distinct(transform(
        wordShingles(col(textCol), shingleWords), s => xxhash64(s)))
        .as("__sh"))
    cands
      .join(shingled.toDF("id_a", "sh_a"), "id_a")
      .join(shingled.toDF("id_b", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash per document: per-token hash bits vote ±1,
    * weighted by token frequency; sign of each bit-sum forms the
    * fingerprint. Explode + single groupBy; bit-sums via one
    * aggregate over 64 positions. */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(wordTokens(col(textCol))).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("__h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1))
        .as(s"__b$i")
    }
    toks.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i =>
          when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Near-dup pairs by SimHash: band the 64-bit fingerprint into 4
    * 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal),
    * bucket-join, verify with bit_count(xor) ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val fp = simhash(docs, idCol, textCol)
    val chunked = fp.select(col(idCol), col("simhash"), posexplode(
      array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("chunk", "val")))
    val a = chunked.toDF("id_a", "sim_a", "chunk", "val")
    val b = chunked.toDF("id_b", "sim_b", "chunk", "val")
    a.join(b, Seq("chunk", "val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Character n-gram Jaccard similarity join — exact, count-based.
    *
    * |A∩B| is computed by self-joining the exploded (doc, gram)
    * relation on the gram and counting per pair; |A∪B| = |A|+|B|−c.
    * No arrays are carried through the shuffle and there is no
    * cross join: the cost is Σ_g df(g)², streamed through a
    * partial-aggregating groupBy. Grams are hashed to longs so the
    * join keys are 8 bytes.
    *
    * At open-web scale Σ df² is dominated by stop-grams; `maxDf`
    * drops grams appearing in more than that many docs from the
    * gram space (a documented, consistent approximation: both the
    * intersection and the sizes are computed over the filtered
    * space). `maxDf = 0` keeps everything (exact). */
  def ngramJaccard(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", n: Int = 8,
                   threshold: Double = 0.5, maxDf: Long = 0L): DataFrame = {
    val g0 = docs.select(col(idCol).as("__id"),
      explode(array_distinct(
        transform(charNgrams(col(textCol), n), g => xxhash64(g)))).as("g"))
    val g = (if (maxDf > 0) {
      val keep = g0.groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("g")
      g0.join(keep, "g")
    } else g0).select(col("__id"), col("g")) // pin column order
    val sizes = g.groupBy(col("__id")).agg(count(lit(1)).as("sz"))
    // Explicit repartition by gram: the (doc, gram) relation is tiny
    // relative to the O(Σ df²) join OUTPUT, so AQE would coalesce the
    // shuffle to one partition and serialize the expensive stage.
    // A user-specified partition count pins the parallelism.
    val gp = g.repartition(g.sparkSession.sparkContext.defaultParallelism * 4,
      col("g"))
    val inter = gp.toDF("id_a", "g")
      .join(gp.toDF("id_b", "g"), "g")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.toDF("id_a", "sz_a"), "id_a")
      .join(sizes.toDF("id_b", "sz_b"), "id_b")
      .withColumn("jaccard", col("c").cast("double") /
        (col("sz_a") + col("sz_b") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-dup: exact all-pairs with cosine ≥ threshold.
    * Norms are computed once per vector (not once per pair) — the
    * arithmetic per pair is exactly dot/(na*nb), so results are
    * bit-identical to the naive form at a third of the flops.
    * Quadratic by design: for unbounded corpora use
    * Similarity.lshTopK-style blocking instead. */
  def embeddingNearDup(emb: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       threshold: Double = 0.95): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol), floatNorm(col(vecCol)).as("nrm"))
    // spread the stream side: a broadcast-nested-loop over a single
    // small input would otherwise run in one task
    val a = e.toDF("id_a", "v_a", "n_a")
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val b = e.toDF("id_b", "v_b", "n_b")
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", floatDot(col("v_a"), col("v_b")) /
        (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }
}
