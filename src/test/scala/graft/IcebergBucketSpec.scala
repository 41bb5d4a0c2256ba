package graft

import graft.plans.IcebergBucketHash
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Hash conformance of the iceberg_bucket kernel against the PUBLIC
  * Iceberg table spec's Appendix B reference values — the whole
  * point of the transform is that a FOREIGN reader recomputing
  * `bucket[N]` prunes to exactly the files graft wrote, so the hash
  * must match the spec bit-for-bit, not "a" murmur3. Pure JVM. */
class IcebergBucketSpec extends AnyFunSuite {

  test("spec Appendix B reference hashes") {
    // int 34 and long 34 hash identically (int widens to the 8-byte
    // little-endian long encoding — the spec's stated rule)
    assert(IcebergBucketHash.hashLong(34L) == 2017239379)
    // date 2017-11-16 = 17486 days from epoch
    assert(IcebergBucketHash.hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(IcebergBucketHash.hashLong(1510871468000000L) == -2047944441)
    // string "iceberg" hashes its UTF-8 bytes
    assert(IcebergBucketHash.bucketString(
      UTF8String.fromString("iceberg"), Int.MaxValue) ==
      1210000089 % Int.MaxValue)
    assert(IcebergBucketHash.murmur3(
      "iceberg".getBytes("UTF-8")) == 1210000089)
    // binary 0x00010203 hashes raw
    assert(IcebergBucketHash.murmur3(
      Array[Byte](0, 1, 2, 3)) == -188683207)
  }

  test("bucket = (hash & Int.MaxValue) % N, stable across int/long") {
    assert(IcebergBucketHash.bucketLong(34L, 16) ==
      ((2017239379 & Int.MaxValue) % 16))
    // negative hash values still land in [0, N)
    val b = IcebergBucketHash.bucketLong(17486L, 7)
    assert(b >= 0 && b < 7)
    assert(b == ((-653330422 & Int.MaxValue) % 7))
  }

  test("tail handling matches standard murmur3 (1/2/3-byte tails)") {
    // cross-check a few lengths against precomputed standard
    // murmur3_x86_32(seed 0) — the divergence risk is exactly the
    // non-4-byte tail (Spark's hashUnsafeBytes differs there)
    assert(IcebergBucketHash.murmur3(Array.empty[Byte]) == 0)
    // "a", "ab", "abc", "abcd" under standard murmur3 seed 0
    assert(IcebergBucketHash.murmur3("a".getBytes) == 1009084850)
    assert(IcebergBucketHash.murmur3("ab".getBytes) == -1681926305)
    assert(IcebergBucketHash.murmur3("abc".getBytes) == -1277324294)
    assert(IcebergBucketHash.murmur3("abcd".getBytes) == 1139631978)
  }
}
