package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize→shingle→hash kernels.
  *
  * The declarative formulations (`transform(sequence(…), i =>
  * concat_ws(" ", slice(toks, i, n)))` + `xxhash64` per shingle, or
  * `substr` per char n-gram) run as interpreted higher-order
  * functions and allocate one string per shingle per row — the
  * dominant cost of the dedup family at any scale. These kernels
  * produce bit-identical hash values with zero per-shingle
  * allocation:
  *
  *  - word shingles: all tokens are joined with single spaces into
  *    ONE buffer per row; every n-token shingle is then a contiguous
  *    byte range of that buffer, hashed in place with XXH64 (the
  *    same primitive behind `xxhash64`, seed 42);
  *  - char n-grams: every n-codepoint gram is a contiguous byte
  *    range of the input's UTF-8 bytes — hashed in place, distinct
  *    via an open-addressed long set, no substring objects.
  *
  * Used by Dedup.minhashLsh / ngramJaccard; parity with the
  * declarative composition is asserted in PlansSpec.
  */
object TextHash {

  /** byte offsets: starts(i) = start of token i in the joined
    * buffer; token i ends at starts(i+1) - 1 (the space); the last
    * ends at buf.length. Returns (buffer, starts, ends). */
  private def joinTokens(tokens: ArrayData): (Array[Byte], Array[Int], Array[Int]) = {
    val m = tokens.numElements()
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var total = if (m > 0) m - 1 else 0 // the joining spaces
    var i = 0
    while (i < m) {
      total += tokens.getUTF8String(i).numBytes(); i += 1
    }
    val buf = new Array[Byte](total)
    var pos = 0
    i = 0
    while (i < m) {
      val u = tokens.getUTF8String(i)
      starts(i) = pos
      u.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
      pos += u.numBytes()
      ends(i) = pos
      if (i < m - 1) { buf(pos) = ' '.toByte; pos += 1 }
      i += 1
    }
    (buf, starts, ends)
  }

  /** MinHash signature over word shingles: for shingle s,
    * base = xxh64(bytes(s), 42); family k: xxh64_int(k, xxh64_long
    * (base, 42)); sig(k) = min over shingles. Bit-identical to
    * hashing the `concat_ws(" ", slice(tokens, i, n))` strings
    * (duplicates don't move a min, so no distinct pass needed). */
  def shingleMinHash(tokens: ArrayData, n: Int, numHashes: Int): ArrayData = {
    val (buf, starts, ends) = joinTokens(tokens)
    val m = tokens.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = if (m < n) 1 else m - n + 1
    var i = 0
    while (i < nShingles) {
      val from = if (m < n) 0 else starts(i)
      val to = if (m < n) buf.length else ends(i + n - 1)
      val base = XXH64.hashUnsafeBytes(buf,
        Platform.BYTE_ARRAY_OFFSET + from, to - from, 42L)
      val h1 = XXH64.hashLong(base, 42L)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashInt(k, h1)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Sorted distinct hashed word shingles — the verify-side set for
    * minhash LSH. Same byte ranges and seed as shingleMinHash. */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val (buf, starts, ends) = joinTokens(tokens)
    val m = tokens.numElements()
    val nShingles = if (m < n) 1 else m - n + 1
    val hs = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      val from = if (m < n) 0 else starts(i)
      val to = if (m < n) buf.length else ends(i + n - 1)
      hs(i) = XXH64.hashUnsafeBytes(buf,
        Platform.BYTE_ARRAY_OFFSET + from, to - from, 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** Sorted distinct hashed char n-grams of an (already lowercased)
    * string: gram i = codepoints [i, i+n), hashed as its UTF-8 byte
    * range with seed 42 — the same value `xxhash64(substr(…))`
    * yields. Strings shorter than n hash as one whole-string gram. */
  def charNgramHashes(s: UTF8String, n: Int): ArrayData = {
    val nBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // codepoint start offsets (UTF-8 continuation bytes are 10xxxxxx)
    val bounds = new Array[Int](nBytes + 1)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      if ((Platform.getByte(base, off + b) & 0xC0) != 0x80) {
        bounds(nChars) = b; nChars += 1
      }
      b += 1
    }
    bounds(nChars) = nBytes
    if (nChars < n) {
      val h = XXH64.hashUnsafeBytes(base, off, nBytes, 42L)
      return UnsafeArrayData.fromPrimitiveArray(Array(h))
    }
    val hs = new Array[Long](nChars - n + 1)
    var i = 0
    while (i <= nChars - n) {
      hs(i) = XXH64.hashUnsafeBytes(base, off + bounds(i),
        bounds(i + n) - bounds(i), 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** Sorted distinct xxh64 hashes (seed 42 — the same value
    * `xxhash64(variant)` yields) of every ≤k-deletion variant of
    * `s`: the string itself, every string with one codepoint
    * removed, and (k = 2) every string with an unordered PAIR of
    * codepoints removed. Set-identical to hashing the declarative
    * `Linkage.delNeighborhoodK` variants (asserted in LinkageSpec),
    * with zero per-variant string allocation: each variant is at
    * most three byte ranges of the input, copied into one reused
    * scratch buffer and hashed in place. The declarative
    * formulation (`transform(sequence(…))` + nested deletions +
    * `array_distinct` + `xxhash64`) materializes ~len²/2 string
    * objects per row through interpreted higher-order functions —
    * the dominant CPU cost of the fuzzy-join family. */
  def deletionHashes(s: UTF8String, k: Int): ArrayData = {
    require(k == 1 || k == 2, s"supported neighborhood depths: 1, 2 (got $k)")
    val nBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // codepoint start offsets (UTF-8 continuation bytes are 10xxxxxx)
    val bounds = new Array[Int](nBytes + 1)
    var m = 0
    var b = 0
    while (b < nBytes) {
      if ((Platform.getByte(base, off + b) & 0xC0) != 0x80) {
        bounds(m) = b; m += 1
      }
      b += 1
    }
    bounds(m) = nBytes
    val count = 1 + m + (if (k >= 2) m * (m - 1) / 2 else 0)
    val hs = new Array[Long](count)
    var w = 0
    hs(w) = XXH64.hashUnsafeBytes(base, off, nBytes, 42L); w += 1
    val scratch = new Array[Byte](nBytes)
    var i = 0
    while (i < m) {
      // one deletion at i: bytes [0, bounds(i)) ++ [bounds(i+1), end)
      val headLen = bounds(i)
      Platform.copyMemory(base, off, scratch, Platform.BYTE_ARRAY_OFFSET,
        headLen.toLong)
      val tailLen = nBytes - bounds(i + 1)
      Platform.copyMemory(base, off + bounds(i + 1), scratch,
        Platform.BYTE_ARRAY_OFFSET + headLen, tailLen.toLong)
      hs(w) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET,
        headLen + tailLen, 42L)
      w += 1
      if (k >= 2) {
        // second deletion at j > i: the head [0, bounds(i)) bytes are
        // already in place; only the middle and tail segments move
        var j = i + 1
        while (j < m) {
          val seg2 = bounds(j) - bounds(i + 1)
          Platform.copyMemory(base, off + bounds(i + 1), scratch,
            Platform.BYTE_ARRAY_OFFSET + headLen, seg2.toLong)
          val seg3 = nBytes - bounds(j + 1)
          Platform.copyMemory(base, off + bounds(j + 1), scratch,
            Platform.BYTE_ARRAY_OFFSET + headLen + seg2, seg3.toLong)
          hs(w) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET,
            headLen + seg2 + seg3, 42L)
          w += 1
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** 64-bit SimHash of a token array in one pass: each token's
    * xxh64 (seed 42) votes +1/−1 per bit position by occurrence
    * (duplicates vote again — same semantics as the exploded
    * formulation); fingerprint bit i is set when the vote sum is
    * positive. Bit-identical to explode → 64 conditional sums →
    * recombine, with no shuffle at all. */
  def simHash64(tokens: ArrayData): Long = {
    val m = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val u = tokens.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** DECLARATIVE SimHash in one compiled pass (same vote semantics
    * as [[simHash64]], different token hash): each token hashes by
    * seeded modular char-polynomial folds under two ~2^31 primes,
    * each residue passes a square mix (`x² + c·x mod m`), and the
    * mixed pair combines to a 62-bit value — four arithmetic ops an
    * external engine recomputes bit-for-bit, which is what makes
    * the simhash pair set oracle-checkable. Both steps matter for
    * bit balance: unseeded short-token folds never wrap the modulus
    * (all high bits zero → one degenerate all-equal chunk → the
    * banded candidate join collapses to ALL-PAIRS), and the raw
    * polynomial is arithmetically smooth — related vocabulary
    * tokens land on nearby residues whose shared high bits bias the
    * per-bit vote marginals ~10× (measured 2.1M / 883k / 105k
    * candidate pairs at sf0.1 for unseeded / seeded / seeded+mixed,
    * vs 83k for xxh64). Entropy lives in bits 0..61; bits 62/63
    * vote uniformly −1 and stay clear on both engines. */
  def simHashDecl(tokens: ArrayData): Long = {
    val M1 = 2147483647L
    val M2 = 2147483629L
    val m = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val s = tokens.getUTF8String(i).toString
      var h1 = 1000000007L
      var h2 = 998244353L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        h1 = (h1 * 31L + cp) % M1
        h2 = (h2 * 31L + cp) % M2
        j += Character.charCount(cp)
      }
      val h = ((h1 * h1 + h1) % M1) * M2 + ((h2 * h2 + 3L * h2) % M2)
      var b = 0
      while (b < 64) {
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Seeded modular char-polynomial residues of one string under
    * both fingerprint primes, as `[h1, h2]` — the compiled twin of
    * the declarative fold the DuckDB oracles replay with list
    * lambdas (identical arithmetic: code-point polynomial, base 31,
    * seeds 1000000007/998244353, moduli 2^31−1 / 2147483629). */
  def charPolyPair(s: UTF8String): ArrayData = {
    val M1 = 2147483647L
    val M2 = 2147483629L
    val str = s.toString
    var h1 = 1000000007L
    var h2 = 998244353L
    var j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      h1 = (h1 * 31L + cp) % M1
      h2 = (h2 * 31L + cp) % M2
      j += Character.charCount(cp)
    }
    UnsafeArrayData.fromPrimitiveArray(Array(h1, h2))
  }

  /** Document fingerprint over a token array in ONE compiled pass —
    * per-token seeded char-poly residues folded under each modulus
    * (`acc·1000003 + h mod m` when `rolling`, commutative `acc + h
    * mod m` otherwise) and combined as `a1·M2 + a2`. Same numbers as
    * the declarative higher-order-function formulation (which the
    * oracles still state), ~13× faster: interpreted array lambdas
    * made doc_fingerprint the 3rd-slowest query at sf1 (41 s). */
  def docFingerprint(tokens: ArrayData, rolling: Boolean): Long = {
    val M1 = 2147483647L
    val M2 = 2147483629L
    var a1 = 0L
    var a2 = 0L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i).toString
      var h1 = 1000000007L
      var h2 = 998244353L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        h1 = (h1 * 31L + cp) % M1
        h2 = (h2 * 31L + cp) % M2
        j += Character.charCount(cp)
      }
      if (rolling) {
        a1 = (a1 * 1000003L + h1) % M1
        a2 = (a2 * 1000003L + h2) % M2
      } else {
        a1 = (a1 + h1) % M1
        a2 = (a2 + h2) % M2
      }
      i += 1
    }
    a1 * M2 + a2
  }

  /** See PpjoinPairs. */
  def ppjoinPairs(xs: ArrayData, t: Double): ArrayData = {
    val n = xs.numElements()
    val ids = new Array[Long](n)
    val szs = new Array[Int](n)
    val poss = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = xs.getStruct(i, 3)
      ids(i) = r.getLong(0); szs(i) = r.getInt(1); poss(i) = r.getInt(2)
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.catalyst.InternalRow]()
    val frac = t / (1.0 + t)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val sa = szs(i); val sb = szs(j)
        if (sa * t <= sb && sb * t <= sa &&
          1 + math.min(sa - poss(i), sb - poss(j)) >=
            math.ceil(frac * (sa + sb)) &&
          ids(i) != ids(j)) {
          val a = math.min(ids(i), ids(j)); val b = math.max(ids(i), ids(j))
          out.add(new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](a, b)))
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](out.size())))
  }

  private def sortedDistinct(hs: Array[Long]): Array[Long] = {
    if (hs.length <= 1) return hs
    java.util.Arrays.sort(hs)
    var w = 1
    var i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** Unicode normalization (NFC, or NFKC when `nfkc`) of one UTF-8
    * string. Dedup/fingerprint pipelines must canonicalize before
    * hashing — visually identical strings (é as U+00E9 vs e+U+0301)
    * otherwise hash apart. Fast path: already-normalized input
    * (virtually all real text, and anything pure-ASCII) is returned
    * as-is, zero-copy — the quick-check makes the common case a scan,
    * not an allocation. */
  def normalizeText(u: UTF8String, nfkc: Boolean): UTF8String = {
    val form = if (nfkc) java.text.Normalizer.Form.NFKC
               else java.text.Normalizer.Form.NFC
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, form)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }

  /** Position-weighted char-polynomial feature hash of a
    * space-tokenized string, one pass, no token objects: per token
    * h = Σ codepoint(cᵢ)·i (i 1-based), and the return value is
    * Σ_tokens (h mod modulus). The per-token hash is the oracle-
    * portable feature-hashing primitive — SQL engines reproduce it
    * as `list_sum(list_transform(range(1, length(tok)+1), i ->
    * ascii(tok[i]) * i)) % modulus`, so a hashed-linear-model score
    * built on it verifies cross-engine. Integer arithmetic
    * throughout: the aggregate over tokens is exact and
    * order-independent. */
  def featureHashSum(text: UTF8String, modulus: Int): Long = {
    val s = text.toString
    var total = 0L
    var h = 0L
    var pos = 1L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') { total += h % modulus; h = 0L; pos = 1L }
      else { h += cp.toLong * pos; pos += 1L }
      i += Character.charCount(cp)
    }
    total + h % modulus
  }
}

private[plans] trait LongArrayResult { self: Expression =>
  def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** MinHash signature straight from a token array — see
  * TextHash.shingleMinHash. */
case class ShingleMinHash(child: Expression, n: Int, numHashes: Int)
  extends UnaryExpression with LongArrayResult {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_minhash expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleMinHash(input.asInstanceOf[ArrayData], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHash.shingleMinHash($c, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** Sorted distinct hashed word shingles from a token array — see
  * TextHash.shingleHashes. */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with LongArrayResult {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Sorted distinct hashed char n-grams of a string — see
  * TextHash.charNgramHashes. */
case class CharNgramHashes(child: Expression, n: Int)
  extends UnaryExpression with LongArrayResult {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.charNgramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.charNgramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** Sorted distinct hashed ≤k-deletion variants of a string — see
  * TextHash.deletionHashes. */
case class DeletionHashes(child: Expression, k: Int)
  extends UnaryExpression with LongArrayResult {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deletion_hashes expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.deletionHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.deletionHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): DeletionHashes =
    copy(child = newChild)
}

/** One-pass 64-bit SimHash of a token array — see TextHash.simHash64. */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Seeded char-poly residue pair of a string — see
  * TextHash.charPolyPair. */
case class CharPolyPair(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_poly_pair expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.charPolyPair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.charPolyPair($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : CharPolyPair = copy(child = newChild)
}

/** One-pass document fingerprint of a token array — see
  * TextHash.docFingerprint. */
case class DocFingerprint(child: Expression, rolling: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.docFingerprint(input.asInstanceOf[ArrayData], rolling)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHash.docFingerprint($c, $rolling)")

  override protected def withNewChildInternal(newChild: Expression)
      : DocFingerprint = copy(child = newChild)
}

/** Declarative-hash SimHash of a token array — see
  * TextHash.simHashDecl. */
case class SimHashDecl(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_decl expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.simHashDecl(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.simHashDecl($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashDecl = copy(child = newChild)
}

/** Filtered candidate-pair generation for PPJoin-style similarity
  * joins: input is one gram's postings list as array<struct<__id:
  * long, sz:int, pos:int>> (document id, gram-set size, 1-based
  * prefix position); output is every unordered pair passing the
  * length filter (t·sz_a ≤ sz_b ≤ sz_a/t) and positional filter
  * (1 + min(sz_a−pos_a, sz_b−pos_b) ≥ ceil(t/(1+t)·(sz_a+sz_b))),
  * as array<struct<id_a, id_b>> with id_a < id_b. One compiled
  * quadratic pass per bucket — the declarative explode+filter HOF
  * formulation runs the same pair space through interpreted lambdas.
  */
/** Unicode normalization as a codegen'd scalar — see
  * TextHash.normalizeText. */
case class NormalizeText(child: Expression, nfkc: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.normalizeText(input.asInstanceOf[UTF8String], nfkc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.normalizeText($c, $nfkc)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Per-token char-polynomial feature-hash sum — see
  * TextHash.featureHashSum. */
case class FeatureHashSum(child: Expression, modulus: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_hash_sum expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.featureHashSum(input.asInstanceOf[UTF8String], modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHash.featureHashSum($c, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashSum =
    copy(child = newChild)
}

case class PpjoinPairs(child: Expression, threshold: Double)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 3 &&
      s(0).dataType == LongType && s(1).dataType == IntegerType &&
      s(2).dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ppjoin_pairs expects array<struct<long,int,int>>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.ppjoinPairs(input.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.ppjoinPairs($c, $threshold)")

  override protected def withNewChildInternal(newChild: Expression): PpjoinPairs =
    copy(child = newChild)
}

object TextHashExpressions {
  /** MinHash signature (numHashes longs) over word shingles of a
    * token array. */
  def shingleMinHash(tokens: Column, n: Int, numHashes: Int): Column =
    GraftColumnShim.column(ShingleMinHash(
      GraftColumnShim.expression(tokens), n, numHashes))

  /** Sorted distinct hashed word shingles of a token array. */
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftColumnShim.column(ShingleHashes(
      GraftColumnShim.expression(tokens), n))

  /** Sorted distinct hashed char n-grams of a string column. */
  def charNgramHashes(text: Column, n: Int): Column =
    GraftColumnShim.column(CharNgramHashes(
      GraftColumnShim.expression(text), n))

  /** Sorted distinct xxh64 hashes of the ≤k-deletion neighborhood
    * of a string column. */
  def deletionHashes(text: Column, k: Int): Column =
    GraftColumnShim.column(DeletionHashes(
      GraftColumnShim.expression(text), k))

  /** One-pass 64-bit SimHash of a token-array column. */
  def simHash64(tokens: Column): Column =
    GraftColumnShim.column(SimHash64(GraftColumnShim.expression(tokens)))

  /** One-pass declarative-hash SimHash of a token-array column —
    * the oracle-checkable variant. */
  def simHashDecl(tokens: Column): Column =
    GraftColumnShim.column(SimHashDecl(GraftColumnShim.expression(tokens)))

  /** Seeded char-poly residue pair `[h1, h2]` of a string column. */
  def charPolyPair(s: Column): Column =
    GraftColumnShim.column(CharPolyPair(GraftColumnShim.expression(s)))

  /** One-pass rolling (order-sensitive) or bag (order-insensitive)
    * document fingerprint of a token-array column. */
  def docFingerprint(tokens: Column, rolling: Boolean): Column =
    GraftColumnShim.column(DocFingerprint(
      GraftColumnShim.expression(tokens), rolling))

  /** Length+position-filtered candidate pairs from one postings
    * bucket (array<struct<id,sz,pos>>) — see PpjoinPairs. */
  def ppjoinPairs(postings: Column, threshold: Double): Column =
    GraftColumnShim.column(PpjoinPairs(
      GraftColumnShim.expression(postings), threshold))

  /** Unicode NFC/NFKC normalization of a string column. */
  def normalizeText(text: Column, nfkc: Boolean = false): Column =
    GraftColumnShim.column(NormalizeText(
      GraftColumnShim.expression(text), nfkc))

  /** Per-token char-polynomial feature-hash sum of a string column. */
  def featureHashSum(text: Column, modulus: Int): Column =
    GraftColumnShim.column(FeatureHashSum(
      GraftColumnShim.expression(text), modulus))
}
