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

  /** Fingerprint moduli: two coprime ~2^31 primes give a 62-bit
    * combined fingerprint — collision odds at billions of documents
    * stay negligible where a single 31-bit residue would birthday-
    * collide in the tens of thousands. Both folds stay inside ANSI
    * long arithmetic (acc < 2^31 ⇒ acc·P + h < 2^52). */
  private val FpM1 = 2147483647L // 2^31 − 1
  private val FpM2 = 2147483629L

  /** Fold seeds: large distinct primes, so the two residues leave
    * the "small polynomial" regime after ONE character — an unseeded
    * fold of a short token never wraps either modulus, leaving
    * h1 == h2 == the raw polynomial with all high bits zero, which
    * degenerates every bit-sliced consumer (a SimHash over such
    * hashes votes every high bit to 0 and the banded candidate join
    * collapses to all-pairs — measured 2.1M pairs at sf0.1). */
  private val FpSeed1 = 1000000007L
  private val FpSeed2 = 998244353L

  /** Character-polynomial hashes of one token under BOTH moduli in
    * a single character pass — `acc = (acc·31 + codepoint) mod m`
    * seeded with [[FpSeed1]]/[[FpSeed2]], folded with a two-field
    * struct state (higher-order array functions evaluate
    * interpreted, so pass count is the cost that matters).
    * Declarative rather than an engine-private hash (xxhash64), so
    * an EXTERNAL engine can recompute fingerprints bit-for-bit —
    * what makes [[rollingFingerprint]] / [[bagFingerprint]] /
    * declarative SimHash oracle-checkable. */
  private def charPolyHash2(tok: Column): Column =
    aggregate(filter(split(tok, ""), c => c =!= ""),
      struct(lit(FpSeed1).as("h1"), lit(FpSeed2).as("h2")),
      (acc, c) => struct(
        pmod(acc("h1") * lit(31L) + ascii(c), lit(FpM1)).as("h1"),
        pmod(acc("h2") * lit(31L) + ascii(c), lit(FpM2)).as("h2")))

  /** Per-token (h1, h2) hash structs — computed ONCE per token
    * (the fold lambdas below would otherwise re-derive the char
    * hash per reference). */
  private def tokenHashes(tokens: Column): Column =
    transform(tokens, t => charPolyHash2(t))

  /** Both modular char-polynomial residues of ONE string column as a
    * `struct(h1, h2)` — the declarative replacement for an
    * engine-private string hash wherever an external engine must
    * recompute the value (multimodal stub metadata derivation). */
  def charPolyResidues(s: Column): Column = charPolyHash2(s)

  // (bit-sliced consumers — declarative SimHash — use the compiled
  // one-pass kernel `TextHashExpressions.simHashDecl`, which seeds
  // AND square-mixes these same residues; see its Scaladoc for why
  // raw polynomial residues are too smooth for per-bit votes)

  /** Polynomial rolling-hash fingerprint of a token array —
    * deterministic, order-sensitive (unlike a set hash): the
    * per-token char hashes fold as `acc·1000003 + h(t)` under each
    * modulus and the two residues combine into one 62-bit value. */
  def rollingFingerprint(tokens: Column): Column = {
    val r = aggregate(tokenHashes(tokens),
      struct(lit(0L).as("h1"), lit(0L).as("h2")),
      (acc, h) => struct(
        pmod(acc("h1") * lit(1000003L) + h("h1"), lit(FpM1)).as("h1"),
        pmod(acc("h2") * lit(1000003L) + h("h2"), lit(FpM2)).as("h2")))
    r("h1") * lit(FpM2) + r("h2")
  }

  /** Order-INSENSITIVE bag fingerprint of a token array: modular
    * SUM of the per-token char hashes under each modulus (addition
    * commutes, so any token order and any partitioning gives the
    * same value), combined like [[rollingFingerprint]]. */
  def bagFingerprint(tokens: Column): Column = {
    val r = aggregate(tokenHashes(tokens),
      struct(lit(0L).as("h1"), lit(0L).as("h2")),
      (acc, h) => struct(
        pmod(acc("h1") + h("h1"), lit(FpM1)).as("h1"),
        pmod(acc("h2") + h("h2"), lit(FpM2)).as("h2")))
    r("h1") * lit(FpM2) + r("h2")
  }
}
