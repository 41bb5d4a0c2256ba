package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level building blocks. All pure `functions._`
  * compositions (no UDFs) so they stay inside whole-stage codegen
  * and are usable from any operator.
  */
package object functions {

  /** Elementwise double-cast of a float array column. Products of two
    * float32 values are exact in double (24+24 bit mantissas), so
    * casting before multiplying keeps dot products deterministic. */
  def asDoubles(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product of two numeric array columns.
    * Deterministic (left-to-right) — same result on any partitioning. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(asDoubles(a), asDoubles(b), _ * _), lit(0.0), _ + _)

  /** L2 norm via sequential fold. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(asDoubles(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two float-array columns. */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Lower-cased whitespace word tokens. */
  def wordTokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Sliding word n-gram shingles of a text column:
    * ["a","b","c"], n=2 → ["a b","b c"]. Built from sequence +
    * transform + slice — no UDF, no explode needed at this stage. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = wordTokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Character n-grams of a text column. */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) < n, array(t))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n)))))
  }

  /** Jaccard similarity of two array columns (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** A cheap 64-bit mix of xxhash64 with a seed salt — gives k
    * independent-ish hash families for minhash from one codegen'd
    * hash primitive. */
  def seededHash(c: Column, seed: Int): Column =
    xxhash64(c, lit(seed))

  // Declarative fingerprint family: seeded modular char-polynomial
  // residues under two coprime ~2^31 primes, combined into one
  // 62-bit value (a single 31-bit residue would birthday-collide in
  // the tens of thousands of documents; the seeds keep short tokens
  // out of the never-wrapped small-polynomial regime that
  // degenerates bit-sliced consumers). "Declarative" means an
  // EXTERNAL engine recomputes every value bit-for-bit with list
  // lambdas — what makes the fingerprint/simhash/mm oracles
  // possible. The arithmetic is specified and implemented in the
  // compiled one-pass kernels (graft.plans.TextHash.charPolyPair /
  // docFingerprint / simHashDecl); the interpreted
  // higher-order-function formulation they replaced made
  // doc_fingerprint the 3rd-slowest query at sf1 (41 s → ~3 s).

  /** Both seeded char-polynomial residues of ONE string column as a
    * `struct(h1, h2)` — the declarative replacement for an
    * engine-private string hash wherever an external engine must
    * recompute the value (multimodal stub metadata derivation). */
  def charPolyResidues(s: Column): Column = {
    val a = graft.plans.TextHashExpressions.charPolyPair(s)
    struct(element_at(a, 1).as("h1"), element_at(a, 2).as("h2"))
  }

  /** Polynomial rolling-hash fingerprint of a token array —
    * deterministic, order-sensitive (unlike a set hash): the
    * per-token char hashes fold as `acc·1000003 + h(t)` under each
    * modulus and the two residues combine into one 62-bit value. */
  def rollingFingerprint(tokens: Column): Column =
    graft.plans.TextHashExpressions.docFingerprint(tokens, rolling = true)

  /** Order-INSENSITIVE bag fingerprint of a token array: modular
    * SUM of the per-token char hashes under each modulus (addition
    * commutes, so any token order and any partitioning gives the
    * same value), combined like [[rollingFingerprint]]. */
  def bagFingerprint(tokens: Column): Column =
    graft.plans.TextHashExpressions.docFingerprint(tokens, rolling = false)
}
