package graft.sources

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID

import org.json4s._

/** Clean-room codec for Delta Lake's PUBLIC deletion-vector
  * encoding (delta-io PROTOCOL.md, "Deletion Vectors" + "Deletion
  * Vector Format"), the pieces:
  *
  *  - **Z85** (ZeroMQ RFC 32 base-85): descriptor `pathOrInlineDv`
  *    carries either a Z85-encoded 16-byte UUID (file storage) or
  *    the Z85-encoded serialized bitmap itself (inline storage).
  *    Z85 encodes 4-byte groups as 5 chars; inputs whose length is
  *    not a multiple of 4 zero-pad for encoding and trim by the
  *    descriptor's `sizeInBytes` on decode (Delta's own rule).
  *  - **RoaringBitmapArray, "portable" serialization**: a 4-byte
  *    little-endian magic (1681511377) followed by the STANDARD
  *    64-bit roaring portable format (RoaringFormatSpec): an
  *    8-byte LE bitmap count, then per non-empty 32-bit bitmap in
  *    ascending key order a 4-byte LE key (the value's high 32
  *    bits) and the standard 32-bit roaring serialization. This
  *    writer emits array/bitset containers only (cookie 12346); the
  *    reader additionally understands run containers (cookie 12347)
  *    because foreign writers emit them.
  *  - **DV file layout**: a 1-byte format version (1), then each
  *    vector as `<4-byte BIG-endian length><bitmap bytes><4-byte
  *    BIG-endian CRC-32 of the bitmap bytes>`; the descriptor's
  *    `offset` points at the length word and `sizeInBytes` is the
  *    bitmap byte count. File storage names the blob
  *    `deletion_vector_<uuid>.bin` under the table root (an
  *    optional random prefix directory rides in `pathOrInlineDv`
  *    before the 20-char Z85 uuid).
  *
  * No Delta implementation exists in this offline environment, so
  * conformance is structural (the spec's byte layouts, asserted in
  * DeltaDvSpec) plus export→convert round-trips through this
  * library's own reader — the same proxy standard as the rest of
  * the Delta interop surface. Everything here is static and
  * executor-safe: the export builds vectors where the pair files
  * live, the convert decodes them where the manifest lives. */
object DeltaDv {

  // ----------------------------------------------------------- Z85

  private val Z85Alphabet: Array[Char] =
    ("0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toCharArray
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode, zero-padding to a 4-byte multiple (the pad bytes
    * are trimmed on decode by the caller's expected length). */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte](4 - bytes.length % 4)
    val sb = new java.lang.StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var div = 85L * 85L * 85L * 85L
      while (div >= 1L) {
        sb.append(Z85Alphabet(((v / div) % 85L).toInt))
        div /= 85L
      }
      i += 4
    }
    sb.toString
  }

  /** Z85-decode to `expectedLen` bytes (trims encoding pad). */
  def z85Decode(s: String, expectedLen: Int): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 payload length ${s.length} is not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Decode(c) else -1
        require(d >= 0, s"invalid Z85 character '${s.charAt(i + j)}'")
        v = v * 85L + d
        j += 1
      }
      var k = 3
      val base = i / 5 * 4
      while (k >= 0) { out(base + k) = (v & 0xffL).toByte; v >>= 8; k -= 1 }
      i += 5
    }
    require(expectedLen <= out.length,
      s"Z85 payload holds ${out.length} bytes, need $expectedLen")
    if (expectedLen == out.length) out else out.take(expectedLen)
  }

  def encodeUuid(u: UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits)
    b.putLong(u.getLeastSignificantBits)
    z85Encode(b.array())
  }

  def decodeUuid(s: String): UUID = {
    val b = ByteBuffer.wrap(z85Decode(s, 16))
    new UUID(b.getLong, b.getLong)
  }

  // ------------------------------- RoaringBitmapArray (portable)

  /** The spec's magic number for the portable format. */
  val PortableMagic: Int = 1681511377

  private val NoRunCookie = 12346
  private val RunCookie = 12347
  private val NoOffsetThreshold = 4
  private val ArrayMaxCardinality = 4096

  /** Serialize sorted-distinct 64-bit positions as the portable
    * RoaringBitmapArray form. Positions must be non-negative; this
    * writer sorts/dedups defensively (pair files can hold an
    * already-vectored file's union). */
  def serialize(positions0: Array[Long]): Array[Byte] = {
    val positions = positions0.sorted.distinct
    require(positions.isEmpty || positions.head >= 0,
      "deletion-vector positions must be non-negative")
    // group by high-32 key, then per 32-bit bitmap by high-16
    // container key — both in ascending order by construction
    val byKey = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    positions.foreach { p =>
      byKey.getOrElseUpdate((p >>> 32).toInt,
        scala.collection.mutable.ArrayBuffer.empty[Int]) +=
        (p & 0xffffffffL).toInt
    }
    val bitmaps = byKey.toSeq.map { case (k, lows) =>
      k -> serialize32(lows.toArray)
    }
    val size = 4 + 8 + bitmaps.map(b => 4 + b._2.length).sum
    val out = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(PortableMagic)
    out.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (k, b) => out.putInt(k); out.put(b) }
    out.array()
  }

  /** One 32-bit roaring bitmap, standard portable serialization,
    * array + bitset containers (no runs — legal, just less compact). */
  private def serialize32(lows: Array[Int]): Array[Byte] = {
    val byContainer = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    lows.foreach { v =>
      byContainer.getOrElseUpdate(v >>> 16,
        scala.collection.mutable.ArrayBuffer.empty[Int]) += (v & 0xffff)
    }
    val containers = byContainer.toSeq
    val n = containers.size
    val bodies = containers.map { case (_, vals) =>
      if (vals.length <= ArrayMaxCardinality) {
        val b = ByteBuffer.allocate(vals.length * 2)
          .order(ByteOrder.LITTLE_ENDIAN)
        vals.foreach(v => b.putShort(v.toShort))
        b.array()
      } else {
        val words = new Array[Long](1024)
        vals.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(b.putLong)
        b.array()
      }
    }
    // cookie, count, descriptive header, offset header, containers
    val headerLen = 4 + 4 + 4 * n + 4 * n
    val out = ByteBuffer
      .allocate(headerLen + bodies.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(NoRunCookie)
    out.putInt(n)
    containers.foreach { case (key, vals) =>
      out.putShort(key.toShort)
      out.putShort((vals.length - 1).toShort)
    }
    var off = headerLen
    bodies.foreach { b => out.putInt(off); off += b.length }
    bodies.foreach(out.put)
    out.array()
  }

  /** Deserialize a portable RoaringBitmapArray to sorted positions.
    * Reads everything the spec allows: array, bitset AND run
    * containers, both cookie forms, with or without offset headers. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = in.getInt
    require(magic == PortableMagic,
      s"unknown deletion-vector bitmap magic $magic — this reader " +
        s"understands the portable format ($PortableMagic) only")
    val nBitmaps = in.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"implausible bitmap count $nBitmaps")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var b = 0L
    while (b < nBitmaps) {
      val key = in.getInt.toLong & 0xffffffffL
      deserialize32(in, v => out += ((key << 32) | (v.toLong & 0xffffffffL)))
      b += 1
    }
    out.toArray
  }

  /** One standard 32-bit roaring bitmap read from the buffer's
    * current position (advances it), emitting each value. */
  private def deserialize32(in: ByteBuffer, emit: Int => Unit): Unit = {
    val start = in.position()
    val cookie = in.getInt
    val (n, runBits): (Int, Array[Byte]) =
      if ((cookie & 0xffff) == RunCookie) {
        val n0 = (cookie >>> 16) + 1
        val bits = new Array[Byte]((n0 + 7) / 8)
        in.get(bits)
        (n0, bits)
      } else {
        require(cookie == NoRunCookie,
          s"unknown roaring cookie $cookie")
        (in.getInt, null)
      }
    def isRun(i: Int): Boolean =
      runBits != null && (runBits(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = in.getShort.toInt & 0xffff
      cards(i) = (in.getShort.toInt & 0xffff) + 1
      i += 1
    }
    val hasOffsets = runBits == null || n >= NoOffsetThreshold
    val offsets: Array[Int] =
      if (!hasOffsets) null
      else { val o = new Array[Int](n); var j = 0
        while (j < n) { o(j) = in.getInt; j += 1 }; o }
    i = 0
    while (i < n) {
      if (offsets != null) in.position(start + offsets(i))
      val hi = keys(i) << 16
      if (isRun(i)) {
        val nRuns = in.getShort.toInt & 0xffff
        var r = 0
        while (r < nRuns) {
          val s = in.getShort.toInt & 0xffff
          val len = in.getShort.toInt & 0xffff
          var v = s
          while (v <= s + len) { emit(hi | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > ArrayMaxCardinality) {
        var w = 0
        while (w < 1024) {
          var word = in.getLong
          val base = hi | (w << 6)
          while (word != 0L) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            emit(base | t)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var c = 0
        while (c < cards(i)) { emit(hi | (in.getShort.toInt & 0xffff)); c += 1 }
      }
      i += 1
    }
  }

  // ---------------------------------------------- DV file layout

  /** Inline-vs-file threshold: vectors whose serialized bitmap is
    * at most this many bytes ride inline in the descriptor (Z85 in
    * the log JSON) instead of a sidecar blob. Small — log lines
    * should stay scannable. */
  val InlineMaxBytes: Int = 512

  /** One add action's `deletionVector` descriptor. */
  final case class Descriptor(storageType: String,
                              pathOrInlineDv: String,
                              offset: Option[Int],
                              sizeInBytes: Int,
                              cardinality: Long) {
    def json: JObject = JObject(List(
      "storageType" -> JString(storageType),
      "pathOrInlineDv" -> JString(pathOrInlineDv)) ++
      offset.map(o => "offset" -> (JInt(o): JValue)).toList ++ List(
      "sizeInBytes" -> JInt(sizeInBytes),
      "cardinality" -> JLong(cardinality)))
  }

  def parseDescriptor(j: JValue): Descriptor = {
    def str(k: String) = (j \ k) match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(
        s"deletionVector.$k is not a string: $other")
    }
    def int(k: String): Option[Int] = (j \ k) match {
      case JInt(i) => Some(i.toInt); case JLong(l) => Some(l.toInt)
      case _       => None
    }
    Descriptor(str("storageType"), str("pathOrInlineDv"),
      int("offset"), int("sizeInBytes").getOrElse(
        throw new IllegalArgumentException(
          "deletionVector.sizeInBytes missing")),
      int("cardinality").map(_.toLong).getOrElse(
        (j \ "cardinality") match {
          case JLong(l) => l; case JInt(i) => i.toLong
          case _ => throw new IllegalArgumentException(
            "deletionVector.cardinality missing")
        }))
  }

  /** Streaming writer of one spec DV file: the version byte up
    * front, then each appended bitmap as a length/data/CRC frame —
    * `append` returns the frame's `offset` for its descriptor. The
    * export packs a whole shuffle partition's vectors through one
    * writer, so blob count tracks task count, not file count. */
  final class DvFileWriter(target: File) {
    private val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(target)))
    out.writeByte(1) // format version
    private var pos = 1
    def append(bitmap: Array[Byte]): Int = {
      val off = pos
      val crc = new java.util.zip.CRC32()
      crc.update(bitmap)
      out.writeInt(bitmap.length)
      out.write(bitmap)
      out.writeInt(crc.getValue.toInt)
      pos += 4 + bitmap.length + 4
      off
    }
    def close(): Unit = out.close()
  }

  /** Append-write several serialized bitmaps as ONE spec DV file
    * (version byte + length/data/CRC frames), returning each
    * bitmap's `offset`. The caller owns the file name. */
  def writeDvFile(target: File, bitmaps: Seq[Array[Byte]]): Seq[Int] = {
    val w = new DvFileWriter(target)
    try bitmaps.map(w.append) finally w.close()
  }

  /** The spec path of a file-stored DV: `pathOrInlineDv` is
    * `<optional prefix><20-char Z85 uuid>`, resolving to
    * `<root>/[<prefix>/]deletion_vector_<uuid>.bin`. */
  def dvFilePath(tableRoot: String, pathOrInlineDv: String): File = {
    require(pathOrInlineDv.length >= 20,
      s"pathOrInlineDv '$pathOrInlineDv' is shorter than a Z85 uuid")
    val prefix = pathOrInlineDv.dropRight(20)
    val uuid = decodeUuid(pathOrInlineDv.takeRight(20))
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) new File(tableRoot, name)
    else new File(new File(tableRoot, prefix), name)
  }

  /** Read one DV's bitmap bytes per its descriptor: inline Z85, or
    * the length/data/CRC frame at `offset` in the named file ("u"
    * relative-uuid form and "p" absolute-path form). Verifies the
    * frame length against `sizeInBytes` and the CRC-32. */
  def readBitmap(tableRoot: String, d: Descriptor): Array[Byte] =
    d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv, d.sizeInBytes)
      case "u" | "p" =>
        val f =
          if (d.storageType == "p") new File(d.pathOrInlineDv)
          else dvFilePath(tableRoot, d.pathOrInlineDv)
        require(f.isFile, s"deletion-vector file $f does not exist")
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val off = d.offset.getOrElse(1)
          raf.seek(off.toLong)
          val len = raf.readInt()
          require(len == d.sizeInBytes,
            s"deletion-vector frame at $f:$off declares $len bytes, " +
              s"descriptor says ${d.sizeInBytes}")
          val data = new Array[Byte](len)
          raf.readFully(data)
          val crc = raf.readInt()
          val actual = new java.util.zip.CRC32()
          actual.update(data)
          require(crc == actual.getValue.toInt,
            s"deletion-vector frame at $f:$off fails its CRC-32")
          data
        } finally raf.close()
      case other => throw new IllegalArgumentException(
        s"unknown deletionVector.storageType '$other' — this reader " +
          "understands u (relative file), i (inline), p (absolute)")
    }

  /** Decode a descriptor to its sorted deleted positions. */
  def positions(tableRoot: String, d: Descriptor): Array[Long] = {
    val pos = deserialize(readBitmap(tableRoot, d))
    require(pos.length.toLong == d.cardinality,
      s"deletion vector decodes to ${pos.length} positions, " +
        s"descriptor declares cardinality ${d.cardinality}")
    pos
  }
}
