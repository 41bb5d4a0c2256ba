package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID

import graft.sources.DeltaDv
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level conformance of the clean-room Delta deletion-vector
  * codec (Z85 / portable roaring bitmaps / DV file frames) against
  * the PUBLIC specs: ZeroMQ RFC 32's reference vector, the roaring
  * format's container layouts (including a hand-crafted run
  * container this writer never emits but foreign writers do), and
  * the length/CRC frame layout. Pure JVM — no Spark session. */
class DeltaDvSpec extends AnyFunSuite {

  test("Z85 matches the RFC 32 reference vector and round-trips " +
    "arbitrary (padded) lengths") {
    // ZeroMQ RFC 32's published test case
    val helloWorld =
      Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
        .map(_.toByte)
    assert(DeltaDv.z85Encode(helloWorld) == "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld", 8).toSeq ==
      helloWorld.toSeq)
    // non-multiple-of-4 lengths pad on encode, trim on decode
    for (n <- 0 to 17) {
      val bytes = Array.tabulate(n)(i => ((i * 37 + 11) % 251).toByte)
      val enc = DeltaDv.z85Encode(bytes)
      assert(enc.length % 5 == 0)
      assert(DeltaDv.z85Decode(enc, n).toSeq == bytes.toSeq, s"n=$n")
    }
    // uuids are exactly 20 chars and round-trip
    val u = UUID.fromString("01234567-89ab-cdef-0123-456789abcdef")
    val enc = DeltaDv.encodeUuid(u)
    assert(enc.length == 20)
    assert(DeltaDv.decodeUuid(enc) == u)
  }

  test("portable bitmap round-trips: array containers, a bitset " +
    "container (>4096 values), and values across 32-bit keys") {
    val cases = Seq[Array[Long]](
      Array.empty[Long],
      Array(0L),
      Array(1L, 5L, 65535L, 65536L, 131071L),          // two containers
      (0L until 5000L).toArray,                        // bitset container
      Array(7L, (1L << 32) + 3L, (1L << 32) + 70000L,  // two keys
        (5L << 32) + 123L),
      Array(3L, 3L, 3L, 9L)                            // dedup
    )
    cases.foreach { c =>
      val ser = DeltaDv.serialize(c)
      val magic = ByteBuffer.wrap(ser)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      assert(magic == DeltaDv.PortableMagic)
      assert(DeltaDv.deserialize(ser).toSeq == c.sorted.distinct.toSeq,
        s"case ${c.take(5).toSeq}…")
    }
  }

  test("the reader understands RUN containers (cookie 12347) a " +
    "foreign writer emits, offset header present and absent") {
    // hand-craft: one bitmap (key 0) holding one run container with
    // runs [10..13] and [100..100]; n=1 < 4 → NO offset header
    def runBitmap32(): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + 1 + 4 + 2 + 4 * 2)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(((1 - 1) << 16) | 12347) // cookie: n-1 in high bits
      b.put(1.toByte)                   // run bitset: container 0 is a run
      b.putShort(0)                     // key
      b.putShort((5 - 1).toShort)       // cardinality-1 (4+1 values)
      b.putShort(2)                     // number of runs
      b.putShort(10); b.putShort(3)     // [10, 10+3]
      b.putShort(100); b.putShort(0)    // [100, 100]
      b.array()
    }
    val inner = runBitmap32()
    val whole = ByteBuffer.allocate(4 + 8 + 4 + inner.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    whole.putInt(DeltaDv.PortableMagic)
    whole.putLong(1L)
    whole.putInt(0) // key 0
    whole.put(inner)
    assert(DeltaDv.deserialize(whole.array()).toSeq ==
      Seq(10L, 11L, 12L, 13L, 100L))

    // and with >= 4 containers the offset header IS present: mix a
    // run container among arrays
    val b2 = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    b2.putInt(((4 - 1) << 16) | 12347)
    b2.put(2.toByte) // container 1 is a run
    // descriptive headers: keys 0..3
    b2.putShort(0); b2.putShort(0)        // key 0: array [42]
    b2.putShort(1); b2.putShort(1)        // key 1: run, 2 values
    b2.putShort(2); b2.putShort(0)        // key 2: array [7]
    b2.putShort(3); b2.putShort(0)        // key 3: array [9]
    val offBase = 4 + 1 + 4 * 4 + 4 * 4
    b2.putInt(offBase)                    // offsets from cookie start
    b2.putInt(offBase + 2)
    b2.putInt(offBase + 2 + 2 + 4)
    b2.putInt(offBase + 2 + 2 + 4 + 2)
    b2.putShort(42)                       // key0 array
    b2.putShort(1); b2.putShort(200); b2.putShort(1) // key1 run [200,201]
    b2.putShort(7)                        // key2 array
    b2.putShort(9)                        // key3 array
    val inner2 = java.util.Arrays.copyOf(b2.array(), b2.position())
    val whole2 = ByteBuffer.allocate(4 + 8 + 4 + inner2.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    whole2.putInt(DeltaDv.PortableMagic)
    whole2.putLong(1L)
    whole2.putInt(0)
    whole2.put(inner2)
    assert(DeltaDv.deserialize(whole2.array()).toSeq ==
      Seq(42L, 65736L, 65737L, 131079L, 196617L))
  }

  test("DV files frame each bitmap as length/data/CRC after the " +
    "version byte; readBitmap verifies both and the inline form " +
    "skips the file entirely") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dv").toFile
    val bm1 = DeltaDv.serialize(Array(1L, 2L, 3L))
    val bm2 = DeltaDv.serialize((0L until 9000L).toArray)
    val u = UUID.randomUUID()
    val f = new java.io.File(dir, s"deletion_vector_$u.bin")
    val offsets = DeltaDv.writeDvFile(f, Seq(bm1, bm2))
    assert(offsets == Seq(1, 1 + 4 + bm1.length + 4))
    // spec layout: version byte 1 first
    val raw = java.nio.file.Files.readAllBytes(f.toPath)
    assert(raw(0) == 1.toByte)
    val d1 = DeltaDv.Descriptor("u", DeltaDv.encodeUuid(u),
      Some(offsets.head), bm1.length, 3L)
    val d2 = DeltaDv.Descriptor("u", DeltaDv.encodeUuid(u),
      Some(offsets(1)), bm2.length, 9000L)
    assert(DeltaDv.positions(dir.getPath, d1).toSeq ==
      Seq(1L, 2L, 3L))
    assert(DeltaDv.positions(dir.getPath, d2).length == 9000)
    // absolute-path form reads the same frame
    val dp = d2.copy(storageType = "p",
      pathOrInlineDv = f.getAbsolutePath)
    assert(DeltaDv.positions("/nonexistent", dp).length == 9000)
    // a flipped byte fails the CRC
    raw(offsets.head + 4 + 2) = (raw(offsets.head + 4 + 2) ^ 0x40).toByte
    java.nio.file.Files.write(f.toPath, raw)
    val e = intercept[IllegalArgumentException](
      DeltaDv.positions(dir.getPath, d1))
    assert(e.getMessage.contains("CRC"), e.getMessage)
    // inline: Z85 of the serialized bitmap, no file involved
    val di = DeltaDv.Descriptor("i", DeltaDv.z85Encode(bm1), None,
      bm1.length, 3L)
    assert(DeltaDv.positions("/nonexistent", di).toSeq ==
      Seq(1L, 2L, 3L))
    // descriptor JSON round-trips through the parser
    val back = DeltaDv.parseDescriptor(di.json)
    assert(back == di)
    val backU = DeltaDv.parseDescriptor(d1.json)
    assert(backU == d1)
  }

  test("dvFilePath resolves the spec name with and without a " +
    "random prefix directory") {
    val u = UUID.randomUUID()
    val plain = DeltaDv.dvFilePath("/t", DeltaDv.encodeUuid(u))
    assert(plain.getPath == s"/t/deletion_vector_$u.bin")
    val prefixed = DeltaDv.dvFilePath("/t", "ab" + DeltaDv.encodeUuid(u))
    assert(prefixed.getPath == s"/t/ab/deletion_vector_$u.bin")
  }
}
