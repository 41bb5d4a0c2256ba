package graft

import graft.operators.Multimodal
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"), (1L, "a"), (2L, "multimodal payload bytes here")
  ).toDF("doc_id", "text")

  test("asMediaTable produces the canonical schema") {
    val media = Multimodal.asMediaTable(docs)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "media_type", "meta"))
    assert(media.schema("payload").dataType == BinaryType)
    val meta = media.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("width", "height", "n_bytes", "format"))
    val r = media.orderBy("media_id").collect()(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
  }

  test("extractFeatures is deterministic and shaped") {
    val media = Multimodal.asMediaTable(docs)
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.length == 3)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.getSeq[Double](3) == b.getSeq[Double](3))
    }
    // feature fold matches the stub applied directly
    val expected = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f1(0).getSeq[Double](3) == expected.toSeq)
  }

  test("resizeStub shrinks payloads and rewrites meta to the target") {
    val media = Multimodal.asMediaTable(docs)
    val out = Multimodal.resizeStub(media, 224, 224)
      .orderBy("media_id").collect()
    assert(out.forall(_.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Int]("width") == 224))
    out.foreach { r =>
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      val payload = r.getAs[Array[Byte]]("payload")
      assert(meta.getAs[Long]("n_bytes") == payload.length.toLong)
      assert(payload.length <= math.max(1, 224 * 224 / 256))
    }
    // deterministic
    val again = Multimodal.resizeStub(media, 224, 224)
      .orderBy("media_id").collect()
    out.zip(again).foreach { case (a, b) =>
      assert(a.getAs[Array[Byte]]("payload").toSeq ==
        b.getAs[Array[Byte]]("payload").toSeq)
    }
  }

  test("codec slot stays in one plan: no RDD scan barrier") {
    // typed Dataset.mapPartitions keeps the codec step inside the
    // query (Deserialize -> MapPartitions -> Serialize), so the scan
    // stays columnar/codegen and there is no RDDScanExec severing the
    // plan — the .rdd round-trip this replaced produced 'Scan
    // ExistingRDD' with pushdown/pruning lost above it
    val media = Multimodal.asMediaTable(docs)
    for (df <- Seq(Multimodal.extractFeatures(media),
        Multimodal.resizeStub(media, 64, 64))) {
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Scan ExistingRDD"), phys.take(600))
      assert(phys.contains("MapPartitions"), phys.take(600))
    }
  }

  test("decodeImageMeta reads real PNG and JPEG headers") {
    val png = Multimodal.renderPng(17, 5, seed = 42L)
    assert(Multimodal.decodeImageMeta(png).contains((17, 5, "png")))
    // JPEG through the JDK's own writer: dims survive the round trip
    val img = new java.awt.image.BufferedImage(9, 11,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val jpg = Multimodal.decodeImageMeta(baos.toByteArray)
    assert(jpg.map(m => (m._1, m._2)).contains((9, 11)))
    assert(jpg.exists(m => m._3 == "jpeg" || m._3 == "jpg"))
    // undecodable payloads land in the null lane, never throw
    assert(Multimodal.decodeImageMeta("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImageMeta(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImageMeta(null).isEmpty)
  }

  test("decodeMeta round-trips rendered PNG dimensions distributedly") {
    val media = Multimodal.asPngMediaTable(
      (0L until 30L).toDF("doc_id"))
    val out = Multimodal.decodeMeta(media).orderBy("media_id").collect()
    assert(out.length == 30)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 1 + (id % 13).toInt, s"width of $id")
      assert(r.getInt(2) == 1 + (id % 7).toInt, s"height of $id")
      assert(r.getString(3) == "png")
    }
    // renders are deterministic: same seed → same bytes
    assert(java.util.Arrays.equals(Multimodal.renderPng(4, 3, 7L),
      Multimodal.renderPng(4, 3, 7L)))
  }

  test("decodeMeta stays in one plan (typed mapPartitions, no RDD " +
    "barrier), mixed stub payloads null out") {
    val media = Multimodal.asMediaTable(docs) // text bytes: not images
    val out = Multimodal.decodeMeta(media).orderBy("media_id").collect()
    assert(out.forall(r => r.isNullAt(1) && r.isNullAt(3)))
    val phys = Multimodal.decodeMeta(media)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Scan ExistingRDD"), phys.take(600))
  }

  test("framePlan samples offsets by stride") {
    val out = Multimodal.framePlan(Multimodal.asMediaTable(docs), stride = 8)
      .orderBy("media_id").collect()
    // "hello world" = 11 bytes → offsets 0, 8 → 2 frames
    assert(out(0).getAs[Int]("n_frames") == 2)
    assert(out(1).getAs[Int]("n_frames") == 1)
  }
}
