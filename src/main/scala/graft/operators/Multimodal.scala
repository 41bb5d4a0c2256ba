package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride along
  * as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched per partition.
  *
  * The actual codec step is STUBBED (no image/audio libs in this
  * environment): `decodeStub` produces deterministic fake features
  * from the bytes. Everything around it — the schema contract, the
  * per-partition batching, the partition sizing story — is real: at
  * 100 TB the binary column dominates row size, so these tables want
  * small `files.maxPartitionBytes`, the metadata struct split into
  * its own (pruned) columns, and feature extraction as a map-only
  * pass with no shuffle.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
      StructField("format", StringType, nullable = true))), nullable = false)))

  /** Wrap the documents table into the multimodal shape: text bytes
    * play the role of an encoded payload (deterministic stand-in for
    * real image/audio bytes). */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // stub dimensions derive from the DECLARATIVE char-polynomial
    // residues (round-8, was xxhash64) — deterministic pseudo-random
    // dims an external engine recomputes bit-for-bit, which is what
    // makes the schema surface oracle-checkable
    val h = graft.functions.charPolyResidues(col(textCol))
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("image/stub").as("media_type"),
      struct(
        (h("h1") % 1920L + 1).cast("int").as("width"),
        (h("h2") % 1080L + 1).cast("int").as("height"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit("stub").as("format")).as("meta"))
  }

  /** STUB decode: in production this would call into an image/audio
    * codec over each payload batch (the mapInPandas/mapPartitions
    * slot). Here it derives a deterministic 8-dim "feature vector"
    * from the payload bytes so the plumbing is end-to-end testable. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val acc = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xFF) / 255.0
      i += 1
    }
    acc
  }

  /** Typed rows for the codec slot: the `Dataset.mapPartitions`
    * carrier classes. Typed (not `.rdd`) matters for the PLAN: the
    * object map sits between Deserialize/Serialize nodes inside one
    * query, so the parquet scan upstream stays columnar + codegen'd
    * and downstream operators fuse back into Tungsten — an `.rdd`
    * round-trip severs the query into two plans joined by an
    * RDDScanExec barrier that also drops pushdown/pruning through. */
  private[operators] case class FeatureIn(media_id: Long, payload: Array[Byte],
                               width: Option[Int], height: Option[Int])
  private[operators] case class FeatureOut(media_id: Long, width: Option[Int],
                                height: Option[Int], features: Seq[Double])
  private[operators] case class MediaMeta(width: Option[Int], height: Option[Int],
                               n_bytes: Long, format: Option[String])
  private[operators] case class MediaRow(media_id: Long, payload: Array[Byte],
                              media_type: String, meta: MediaMeta)

  /** Batched per-partition feature extraction over the payload
    * column — map-only, no shuffle; the Scala analogue of a
    * mapInPandas batch UDF, as a TYPED Dataset.mapPartitions so the
    * surrounding plan never leaves Tungsten. Output: (media_id,
    * width, height, features array<double>). */
  def extractFeatures(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    media.select(col("media_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[FeatureIn](Encoders.product[FeatureIn])
      .mapPartitions { rows =>
        // batch loop: one iterator pass, codec state could be reused
        // across the partition here (the expensive part in production).
        rows.map { m =>
          val feats = if (m.payload == null) Seq.empty[Double]
          else decodeStub(m.payload).toSeq
          FeatureOut(m.media_id, m.width, m.height, feats)
        }
      }(Encoders.product[FeatureOut])
      .toDF()
  }

  /** REAL image header decode via the JDK's own codec registry
    * (javax.imageio — no external libs): width/height/format read
    * from the actual encoded bytes. Header-only — the reader parses
    * IHDR/SOF markers without decoding pixel data, so per-payload
    * cost is O(header), not O(pixels) — exactly what a 100 TB
    * metadata-backfill pass wants. Returns None for payloads no
    * registered codec recognizes (the stub lanes stay usable). */
  def decodeImageMeta(payload: Array[Byte]): Option[(Int, Int, String)] = {
    if (payload == null || payload.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0),
            r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } catch { case _: java.io.IOException => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  private[operators] case class DecodeIn(media_id: Long, payload: Array[Byte])
  private[operators] case class DecodeOut(media_id: Long, width: Option[Int],
                                          height: Option[Int],
                                          format: Option[String])

  /** Batched per-partition REAL header decode — the codec slot with
    * an actual codec in it (same Tungsten-preserving typed
    * mapPartitions shape as [[extractFeatures]]; the ImageIO reader
    * instances are per-partition state, the production pattern for
    * stateful codecs). Output: (media_id, width, height, format),
    * nulls where no codec matches. */
  def decodeMeta(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    media.select(col("media_id"), col("payload"))
      .as[DecodeIn](Encoders.product[DecodeIn])
      .mapPartitions { rows =>
        rows.map { m =>
          decodeImageMeta(m.payload) match {
            case Some((w, h, f)) => DecodeOut(m.media_id, Some(w), Some(h),
              Some(f))
            case None => DecodeOut(m.media_id, None, None, None)
          }
        }
      }(Encoders.product[DecodeOut])
      .toDF()
  }

  /** Deterministic REAL-PNG rendering (BufferedImage → ImageIO):
    * genuine codec bytes from a seed, for fixtures and the driver
    * entry — pixel values are a pure function of (seed, x, y), so
    * the byte stream is reproducible across executors. Headless-safe
    * (no GUI classes). */
  def renderPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        // splitmix-ish pixel hash: deterministic, codec-independent
        var z = seed + x * 2654435761L + y * 40503L
        z = (z ^ (z >>> 16)) * 0x45d9f3bL
        img.setRGB(x, y, ((z ^ (z >>> 13)) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Documents table → REAL encoded-PNG media table: dimensions are
    * a pure arithmetic function of the id (oracle-expressible), the
    * payload is a genuine PNG of those dimensions rendered per
    * partition. The decode entry reads the dimensions BACK out of
    * the bytes — a real codec round trip. */
  def asPngMediaTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.Encoders
    docs.select(col(idCol).cast("long").as("media_id"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 1 + (id % 13).toInt
          val h = 1 + (id % 7).toInt
          val png = renderPng(w, h, id)
          MediaRow(id, png, "image/png",
            MediaMeta(None, None, png.length.toLong, Some("png")))
        }
      }(Encoders.product[MediaRow])
      .toDF()
  }

  /** STUB resize: production would decode, scale to (targetW,
    * targetH) and re-encode per batch. The stub keeps every
    * (len/targetBytes)-th byte — deterministic, size-reducing, and
    * exercising the real contract: payload transformed in place,
    * meta rewritten to the target dimensions, map-only typed
    * mapPartitions (same Tungsten-preserving shape as
    * [[extractFeatures]]). */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val targetBytes = math.max(1, targetW * targetH / 256)
    media.select(col("media_id"), col("payload"), col("media_type"),
        col("meta"))
      .as[MediaRow](Encoders.product[MediaRow])
      .mapPartitions { rows =>
        rows.map { m =>
          val resized = if (m.payload == null || m.payload.isEmpty) m.payload
          else {
            val step = math.max(1, m.payload.length / targetBytes)
            m.payload.indices.by(step).map(m.payload).toArray
          }
          MediaRow(m.media_id, resized, m.media_type,
            MediaMeta(Some(targetW), Some(targetH),
              if (resized == null) 0L else resized.length.toLong,
              m.meta.format))
        }
      }(Encoders.product[MediaRow])
      .toDF()
  }

  /** Deterministic frame-sampling plan for video-ish payloads: which
    * byte offsets ("frames") to decode, every `stride` bytes — the
    * shape of frame-sample without a video lib. Pure column ops. */
  def framePlan(media: DataFrame, stride: Int = 1024): DataFrame =
    media.select(col("media_id"),
      sequence(lit(0L), greatest(col("meta.n_bytes") - 1, lit(0L)),
        lit(stride.toLong)).as("frame_offsets"))
      .withColumn("n_frames", size(col("frame_offsets")))

  /** Exact payload-level dedup: group by content digest, keep the
    * min id. The digest is computed map-side so the shuffle carries
    * (16-byte hash, id) — the binary payloads themselves NEVER move,
    * which is the whole game when the payload column is 99% of row
    * size at 100 TB. Collision risk at md5 width is negligible for
    * dedup; swap in sha2 for adversarial settings. */
  def payloadDedup(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), md5(col("payload")).as("payload_md5"))
      .groupBy(col("payload_md5"))
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))
}
