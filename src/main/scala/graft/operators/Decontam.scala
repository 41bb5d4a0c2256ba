package graft.operators

import graft.functions._
import graft.plans.BloomExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that overlap
  * an evaluation/benchmark set, the standard pre-training hygiene
  * step (a training doc sharing any k-word shingle with an eval doc
  * leaks the benchmark into the training corpus).
  *
  * Scale design: both sides reduce to hashed shingle sets (8 B per
  * shingle, map-side projection), so the overlap test is a
  * semi-join on longs — never a text join, never all-pairs. The
  * benchmark side is small by definition (eval sets are thousands
  * of docs, not billions), so its distinct shingle set broadcasts;
  * the 100 TB path additionally prefilters the corpus with a
  * Bloom filter built over the benchmark shingles and attached as a
  * scalar subquery — one map-side probe per shingle eliminates
  * ~everything before the join, and the filter's no-false-negative
  * guarantee keeps the result exactly equal to the exact path.
  */
object Decontam {

  /** Distinct hashed k-word shingles per document:
    * (idCol, shingle_h: long). A doc shorter than n words yields its
    * single whole-text shingle (matches `wordShingles`). Uses the
    * fused shingle-hash kernel: one pass over a joined token buffer,
    * bit-identical to `xxhash64(concat_ws(" ", slice(tokens, i, n)))`
    * (same seed-42 hash over the same bytes) but without
    * re-evaluating the tokenizer per shingle position. */
  def shingleHashSet(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame =
    docs.select(col(idCol), explode(
        graft.plans.TextHashExpressions.shingleHashes(
          wordTokens(col(textCol)), n))
      .as("shingle_h"))

  /** Per-doc contamination evidence: training docs sharing at least
    * one shingle with the benchmark set, with the count of distinct
    * shared shingles. (idCol, n_hits). */
  def contaminationHits(train: DataFrame, bench: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        n: Int = 13): DataFrame = {
    val benchSh = shingleHashSet(bench, idCol, textCol, n)
      .select(col("shingle_h")).distinct()
    shingleHashSet(train, idCol, textCol, n)
      .join(broadcast(benchSh), Seq("shingle_h"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Training corpus minus contaminated docs (≥ minHits shared
    * shingles). */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 13, minHits: Long = 1L): DataFrame =
    train.join(
      contaminationHits(train, bench, idCol, textCol, n)
        .filter(col("n_hits") >= minHits).select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Per-doc contamination SCORE for every training document — the
    * audit/reporting companion to [[contaminationHits]]: how many of
    * the doc's distinct shingles appear in the benchmark set, as a
    * count and an integer basis-points fraction (n_hits·10⁴ /
    * n_shingles, floor). Zero-overlap docs are kept (score 0), so the
    * output is a full corpus scorecard suitable for thresholding at
    * any level downstream, not just the binary drop decision.
    *
    * Scale design: same shape as the hits path — map-side shingle
    * hashing, broadcast benchmark set, one keyed aggregate; the left
    * join adds no shuffle beyond it. The score is exact integer
    * arithmetic (no float division), so it hash-matches any engine. */
  def contaminationScore(train: DataFrame, bench: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text",
                         n: Int = 13): DataFrame = {
    val benchSh = shingleHashSet(bench, idCol, textCol, n)
      .select(col("shingle_h")).distinct()
      .withColumn("__hit", lit(1))
    shingleHashSet(train, idCol, textCol, n)
      .join(broadcast(benchSh), Seq("shingle_h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_hits"))
      .withColumn("contamination_bp",
        floor(col("n_hits") * 10000 / col("n_shingles")).cast("long"))
  }

  /** Bloom-prefiltered contamination hits — identical output to
    * `contaminationHits` (Bloom filters have no false negatives; the
    * exact semi-join after the probe removes false positives), but
    * the corpus-side shuffle carries only probe survivors. The
    * filter is built by a distributed aggregate and attached as a
    * scalar subquery: no driver-side collect of data rows. */
  def contaminationHitsBloom(train: DataFrame, bench: DataFrame,
                             idCol: String = "doc_id",
                             textCol: String = "text",
                             n: Int = 13,
                             expectedBenchShingles: Long = 4000000L)
      : DataFrame = {
    val benchSh = shingleHashSet(bench, idCol, textCol, n)
      .select(col("shingle_h")).distinct()
    val bloom = benchSh
      .agg(BloomExpressions.bloomAgg(col("shingle_h"),
        expectedBenchShingles).as("bloom"))
    shingleHashSet(train, idCol, textCol, n)
      .filter(BloomExpressions.mightContain(bloom.scalar(),
        col("shingle_h")))
      .join(broadcast(benchSh), Seq("shingle_h"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }
}
