package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate record linkage (fuzzy join) for entity resolution —
  * matching dirty registries against a clean one without a cross
  * join.
  *
  * Scale design: candidate generation uses FastSS deletion
  * neighborhoods (Bocek et al., 2007): two strings are within edit
  * distance 1 (insert / delete / substitute) iff their 1-deletion
  * neighborhoods — the string itself plus every variant with one
  * character removed — intersect. Each side therefore explodes to
  * `len+1` short keys (hashed to 8-byte join keys), the join is a
  * plain keyed equi-join on those hashes, and the exact Levenshtein
  * check runs only on the candidate pairs. Work is linear in total
  * string length; the shuffle carries hashes + ids, never a
  * quadratic pair set. The reference has no linkage operator — this
  * covers the "match incoming dirty dimension rows to the master
  * registry" step its SCD merges assume has already happened
  * (lakehouse-poc `Load & SCD-Merge.py` keys on exact ids only).
  */
object Linkage {

  /** Every 1-deletion variant of `v`, as an array column. Pure
    * Catalyst (`transform` over a `sequence`), so it stays inside
    * whole-stage codegen — no UDF. */
  private def delOnce(v: Column): Column =
    transform(sequence(lit(1), length(v)), i =>
      concat(v.substr(lit(1), i - lit(1)), v.substr(i + lit(1), length(v))))

  /** The string itself plus every 1-deletion variant. */
  private[graft] def delNeighborhood(c: Column): Column =
    array_union(array(c), delOnce(c))

  /** The ≤k-deletion neighborhood (k ∈ {1, 2}). For k = 2 the
    * 2-deletion set is every 1-deletion of every 1-deletion —
    * O(len²) short strings, deduplicated in-plan. Soundness: a
    * shared ≤k-deletion variant bounds ed(s,t) ≤ 2k, so candidates
    * over-approximate and verification prunes; completeness: an
    * optimal ≤k-op alignment deletes at most k characters from each
    * side to reach a common string (Bocek et al. '07). */
  private[graft] def delNeighborhoodK(c: Column, k: Int): Column = {
    require(k == 1 || k == 2, s"supported neighborhood depths: 1, 2 (got $k)")
    if (k == 1) delNeighborhood(c)
    else array_distinct(concat(array(c), delOnce(c),
      flatten(transform(delOnce(c), v => delOnce(v)))))
  }

  /** Edit-distance-≤1 join of `left[lId, lName]` against
    * `right[rId, rName]`.
    *
    * Plan: explode each side's deletion neighborhood, hash every
    * variant to an 8-byte key, equi-join on the hash with a cheap
    * `|len(l) − len(r)| ≤ 1` guard, de-duplicate candidate id pairs
    * (two strings can share several variants), then verify with the
    * codegen'd `levenshtein`. Hash collisions only ever ADD
    * candidates, which verification removes — correctness never
    * depends on collision-freedom. Output carries both ids, both
    * names, and the exact distance. */
  def fuzzyJoinEd1(left: DataFrame, lId: String, lName: String,
                   right: DataFrame, rId: String, rName: String): DataFrame =
    fuzzyJoinEd(left, lId, lName, right, rId, rName, maxDist = 1)

  /** Edit-distance-≤`maxDist` join (maxDist ∈ {1, 2}) — same
    * construction with the ≤maxDist-deletion neighborhood. The
    * explode factor is ~len^maxDist/maxDist! short variants per row:
    * still linear in input count, with the verify step pruning the
    * ed ≤ 2·maxDist over-approximation the shared-variant bound
    * admits.
    *
    * Boundary: the blocking is only selective for strings LONGER
    * than 2·maxDist. Strings of length ≤ 2·maxDist share tiny/empty
    * variants (every length-≤2 string contains "" in its 2-deletion
    * set), so that sub-domain pairs up near-quadratically on a few
    * hot variant keys — which mirrors its TRUE answer set (almost
    * all short-string pairs are within distance 2) but concentrates
    * shuffle load. For registries dominated by very short codes,
    * de-duplicate values first (the distinct short-string domain is
    * alphabet-bounded) or route those keys through the Skew salting
    * levers, then re-expand. */
  def fuzzyJoinEd(left: DataFrame, lId: String, lName: String,
                  right: DataFrame, rId: String, rName: String,
                  maxDist: Int): DataFrame =
    fuzzyJoinEd(left, lId, lName, right, rId, rName, maxDist, None)

  /** [[fuzzyJoinEd]] with a SCALE-POLICY GATE (round-13): when
    * `maxCandidateBudget` is set, one cheap pre-pass estimates the
    * candidate-pair volume from the per-variant-key frequencies
    * (sum over keys of |left bucket|·|right bucket| — two partial
    * aggregations and a key join, never the exploded pair space) and
    * REFUSES past the budget with the short-string remediation
    * guidance from the boundary note above. The blocking itself is
    * linear in input rows; the gate exists for registries dominated
    * by very short codes, where a few hot variant keys pair up
    * near-quadratically. None (the default) skips the extra pass. */
  def fuzzyJoinEd(left: DataFrame, lId: String, lName: String,
                  right: DataFrame, rId: String, rName: String,
                  maxDist: Int,
                  maxCandidateBudget: Option[Long]): DataFrame = {
    // The exploded side carries ONLY (id, variant hash, length) —
    // never the name string (guide §2.3: shuffle keys and metadata,
    // not payloads; names re-attach to the ~|candidates| pair set by
    // id below). Variant hashes come from the fused kernel — the
    // same distinct hash SET as `xxhash64` over the declarative
    // `delNeighborhoodK` variants (LinkageSpec asserts equality), with
    // zero variant-string allocation. Candidates are verified
    // exactly afterwards, so the blocking change cannot alter the
    // result set.
    def side(df: DataFrame, id: String, name: String,
             p: String): DataFrame =
      df.select(col(id).as(s"${p}_id"),
        explode(graft.plans.TextHashExpressions.deletionHashes(
          col(name), maxDist)).as("__vk"),
        length(col(name)).as(s"__${p}len"))
    val l = side(left, lId, lName, "l")
    val r = side(right, rId, rName, "r")
    maxCandidateBudget.foreach { budget =>
      // decimal(38,0) sum, NOT a long sum: in the hot-key regime
      // this gate exists for, a long product/sum can WRAP negative
      // with ANSI off and sail under the budget — the overflow
      // would disarm the gate exactly when it matters
      val est: BigDecimal =
        l.groupBy("__vk").agg(count(lit(1)).as("__ln"))
          .join(r.groupBy("__vk").agg(count(lit(1)).as("__rn")), "__vk")
          .agg(sum(col("__ln").cast("decimal(38,0)") *
            col("__rn").cast("decimal(38,0)")).as("__pairs"))
          .collect().head.getAs[Any]("__pairs") match {
            case null    => BigDecimal(0)
            case n: Long => BigDecimal(n)
            case n: java.math.BigDecimal => BigDecimal(n)
            case other   => BigDecimal(other.toString)
          }
      require(est <= BigDecimal(budget),
        s"fuzzy join at edit distance $maxDist would generate ~$est " +
          s"candidate pairs (budget: $budget) — hot variant keys " +
          "from very short strings pair near-quadratically; " +
          "de-duplicate the short-string domain first (it is " +
          "alphabet-bounded), route hot keys through Skew salting, " +
          "or raise the budget explicitly")
    }
    // ids are deduplicated BEFORE names re-attach: the distinct runs
    // over two 8-byte ids instead of two ids + two strings, and the
    // id joins only touch the candidate pair set (≪ the exploded
    // variant relation)
    val cand = l.join(r, "__vk")
      .where(abs(col("__llen") - col("__rlen")) <= maxDist)
      .select(col("l_id"), col("r_id"))
      .distinct()
    // distinct on the attach sides keeps the old contract under
    // duplicate input rows (the prior formulation deduplicated
    // (id, name) TUPLES; without this a fully-duplicated input row
    // would double its pairs)
    cand
      .join(left.select(col(lId).as("l_id"), col(lName).as("l_name"))
        .distinct(), "l_id")
      .join(right.select(col(rId).as("r_id"), col(rName).as("r_name"))
        .distinct(), "r_id")
      .select(col("l_id"), col("l_name"), col("r_id"), col("r_name"))
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")))
      .where(col("dist") <= maxDist)
  }
}
