package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg's `bucket[N]` partition transform, per the PUBLIC table
  * spec's Appendix B: `(murmur3_x86_32(bytes(v), seed = 0) &
  * Int.MaxValue) % N`, where the hashed bytes are the spec's type
  * encodings — int/long/date/timestamp hash their value as an
  * 8-byte LITTLE-ENDIAN long (int widens first, so `bucket(34)` ==
  * `bucket(34L)` across type promotion, the spec's stated reason),
  * strings hash their UTF-8 bytes, binary hashes raw.
  *
  * This is NOT Spark's `hash()` (Murmur3 seed 42 over Spark's
  * 4-byte int encoding) — the incompatibility is exactly why the
  * Iceberg interop refused `bucket` layouts until round 15. The
  * murmur3 here is the standard x86_32 variant (public algorithm;
  * also published as Iceberg's reference test vectors, pinned in
  * IcebergBucketSpec), implemented directly because Spark's
  * `Murmur3_x86_32.hashUnsafeBytes` diverges from the standard on
  * non-4-byte-aligned tails. */
object IcebergBucketHash {

  /** Standard Murmur3 x86_32, seed 0, over the whole array. */
  def murmur3(bytes: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0 // seed
    val n4 = bytes.length & ~3
    var i = 0
    while (i < n4) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 4
    }
    // tail (standard murmur3: bytes fold into ONE k, little-endian)
    var k = 0
    (bytes.length & 3) match {
      case 3 =>
        k ^= (bytes(n4 + 2) & 0xff) << 16
        k ^= (bytes(n4 + 1) & 0xff) << 8
        k ^= bytes(n4) & 0xff
      case 2 =>
        k ^= (bytes(n4 + 1) & 0xff) << 8
        k ^= bytes(n4) & 0xff
      case 1 =>
        k ^= bytes(n4) & 0xff
      case _ => ()
    }
    if ((bytes.length & 3) != 0) {
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
    }
    // finalization mix
    h ^= bytes.length
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** The spec's long encoding: 8 bytes little-endian. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xffL).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  def bucketLong(v: Long, n: Int): Int =
    ((hashLong(v) & Int.MaxValue) % n)

  def bucketBytes(bytes: Array[Byte], n: Int): Int =
    ((murmur3(bytes) & Int.MaxValue) % n)

  def bucketString(s: UTF8String, n: Int): Int =
    bucketBytes(s.getBytes, n)
}

/** `graft_iceberg_bucket(c, n)` — the Catalyst expression (codegen'd
  * via the static kernel). Registered in [[GraftFunctions]] so the
  * hidden-partitioning machinery can persist it as a generated
  * column's SQL and recompute it at every write. */
case class IcebergBucket(child: Expression, numBuckets: Int)
  extends UnaryExpression {

  require(numBuckets > 0, s"bucket count must be > 0, got $numBuckets")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | StringType | BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_iceberg_bucket does not support ${other.simpleString} " +
          "— Iceberg's bucket transform is defined for " +
          "int/long/date/timestamp/string/binary here")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case ByteType => IcebergBucketHash.bucketLong(
      v.asInstanceOf[Byte].toLong, numBuckets)
    case ShortType => IcebergBucketHash.bucketLong(
      v.asInstanceOf[Short].toLong, numBuckets)
    case IntegerType | DateType => IcebergBucketHash.bucketLong(
      v.asInstanceOf[Int].toLong, numBuckets)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergBucketHash.bucketLong(v.asInstanceOf[Long], numBuckets)
    case StringType => IcebergBucketHash.bucketString(
      v.asInstanceOf[UTF8String], numBuckets)
    case BinaryType => IcebergBucketHash.bucketBytes(
      v.asInstanceOf[Array[Byte]], numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = "graft.plans.IcebergBucketHash"
    child.dataType match {
      case ByteType | ShortType | IntegerType | DateType |
           LongType | TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c =>
          s"$kernel.bucketLong((long) $c, $numBuckets)")
      case StringType =>
        defineCodeGen(ctx, ev, c =>
          s"$kernel.bucketString($c, $numBuckets)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c =>
          s"$kernel.bucketBytes($c, $numBuckets)")
      case other => throw new IllegalStateException(
        s"unreachable: type ${other.simpleString} passed checkInput")
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): IcebergBucket = copy(child = newChild)
}
