package graft.ops

import graft.SparkTestBase
import graft.ops.MediaPipeline._

/** Typed multimodal plumbing: encoder round-trip, deterministic stub
  * features, and the explicit batch shape of the decode stage.
  */
class MediaPipelineSpec extends SparkTestBase {

  private def rec(id: Long, bytes: Array[Byte]) =
    MediaRecord(id, MediaMeta("image", bytes.length.toLong), bytes)

  test("stub decoder is deterministic and dimension-stable") {
    val r = rec(1, Array.tabulate(32)(_.toByte))
    val a = StubDecoder.decodeBatch(Seq(r)).head
    val b = StubDecoder.decodeBatch(Seq(r)).head
    assert(a.features.toSeq == b.features.toSeq)
    assert(a.features.length == StubDecoder.Dim)
    // stride-8 bucket 0 averages bytes 0,8,16,24 => (0+8+16+24)/4 = 12
    assert(a.features(0) == 12.0)
  }

  test("empty payload yields zero features, not NaN") {
    val f = StubDecoder.decodeBatch(Seq(rec(1, Array.empty))).head
    assert(f.features.forall(_ == 0.0))
  }

  test("extract preserves every record across batch boundaries") {
    import spark.implicits._
    val media = spark.createDataset(
      (1L to 203L).map(i => rec(i, Array.fill(8)(i.toByte))))
    val out = extract(media, StubDecoder, batchSize = 16).collect()
    assert(out.map(_.docId).sorted.toSeq == (1L to 203L))
    assert(out.forall(_.kind == "image"))
  }

  // --- JvmImageDecoder: real javax.imageio decode ------------------------

  /** Deterministic synthesized PNG: pixel (x,y) = RGB(x%256, y%256,
    * (x+y)%256). ImageIO PNG encode/decode is lossless, so the decoded
    * stats are exactly computable.
    */
  private def png(w: Int, h: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, ((x % 256) << 16) | ((y % 256) << 8) | ((x + y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("JvmImageDecoder decodes a synthesized PNG to exact pixel stats") {
    val (w, h) = (16, 9)
    val f = JvmImageDecoder.decodeBatch(Seq(rec(7, png(w, h)))).head
    assert(f.docId == 7 && f.kind == "image")
    assert(f.features.length == JvmImageDecoder.Dim)
    assert(f.features(0) == w.toDouble && f.features(1) == h.toDouble)
    assert(f.features(2) == (w * h).toDouble)
    // meanR = mean of x over the grid = (w-1)/2; meanG = (h-1)/2
    assert(f.features(3) == (w - 1) / 2.0)
    assert(f.features(4) == (h - 1) / 2.0)
    // meanB = mean of (x+y) = (w-1)/2 + (h-1)/2 (all values < 256 here)
    assert(f.features(5) == (w - 1) / 2.0 + (h - 1) / 2.0)
    // luma of pixel = (299x + 587y + 114(x+y))/1000, integer-truncated —
    // recompute exactly
    val lumas = for (y <- 0 until h; x <- 0 until w)
      yield ((299 * x + 587 * y + 114 * (x + y)) / 1000).toDouble
    val ml = lumas.sum / lumas.size
    assert(f.features(6) == ml)
    assert(math.abs(f.features(7) -
      math.sqrt(lumas.map(l => l * l).sum / lumas.size - ml * ml)) < 1e-9)
  }

  test("JvmImageDecoder drops undecodable payloads instead of failing") {
    val batch = Seq(rec(1, "not an image".getBytes), rec(2, png(4, 4)),
      rec(3, Array.empty[Byte]))
    val out = JvmImageDecoder.decodeBatch(batch)
    assert(out.map(_.docId) == Seq(2L))
  }

  test("JvmImageDecoder runs distributed through the extract stage") {
    import spark.implicits._
    val media = spark.createDataset(
      (1L to 40L).map(i => rec(i, png(4 + (i % 4).toInt, 4)))).repartition(3)
    val out = extract(media, JvmImageDecoder, batchSize = 8).collect()
    assert(out.map(_.docId).sorted.toSeq == (1L to 40L))
    assert(out.forall(f => f.features(0) >= 4.0 && f.features(0) <= 7.0))
  }

  test("JvmImageResizer: exact nearest-neighbor picks, chainable, drops bad rows") {
    // 4×4 → 2×2 nearest-neighbor with srcX = x·srcW div dstW picks source
    // pixels (0,0), (2,0), (0,2), (2,2); PNG is lossless so the resized
    // payload decodes to EXACTLY those pixels
    val out = JvmImageResizer.resizeBatch(Seq(rec(9, png(4, 4))), 2, 2)
    assert(out.map(_.docId) == Seq(9L))
    assert(out.head.meta.nBytes == out.head.payload.length.toLong)
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.head.payload))
    assert(im.getWidth == 2 && im.getHeight == 2)
    def rgb(x: Int, y: Int) = ((x % 256) << 16) | ((y % 256) << 8) |
      ((x + y) % 256)
    assert((im.getRGB(0, 0) & 0xffffff) == rgb(0, 0))
    assert((im.getRGB(1, 0) & 0xffffff) == rgb(2, 0))
    assert((im.getRGB(0, 1) & 0xffffff) == rgb(0, 2))
    assert((im.getRGB(1, 1) & 0xffffff) == rgb(2, 2))
    // record → record: the resized output feeds the decoder unchanged
    val f = JvmImageDecoder.decodeBatch(out).head
    assert(f.features(0) == 2.0 && f.features(1) == 2.0)
    // undecodable payloads are dropped, same contract as the decoder
    assert(JvmImageResizer.resizeBatch(
      Seq(rec(1, "junk".getBytes), rec(2, png(4, 4))), 2, 2)
      .map(_.docId) == Seq(2L))
  }

  test("JvmImageResizer runs distributed with bounded batches") {
    import spark.implicits._
    val media = spark.createDataset(
      (1L to 30L).map(i => rec(i, png(8, 8)))).repartition(3)
    val out = JvmImageResizer.resize(media, 4, 4, batchSize = 7).collect()
    assert(out.map(_.docId).sorted.toSeq == (1L to 30L))
    assert(out.forall { r =>
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      im.getWidth == 4 && im.getHeight == 4
    })
  }

  test("decoder sees bounded batches regardless of partition size") {
    import spark.implicits._
    // The spy records each record's batch size IN the output features —
    // task closures are serialized even in local mode, so a captured
    // mutable collection would observe nothing.
    val spy = new MediaDecoder {
      def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
        batch.map(r =>
          MediaFeatures(r.docId, r.meta.kind, Array(batch.size.toDouble)))
    }
    val media = spark.createDataset(
      (1L to 100L).map(i => rec(i, Array(i.toByte)))).repartition(2)
    val out = extract(media, spy, batchSize = 8).collect()
    val sizes = out.map(_.features.head)
    assert(sizes.forall(_ <= 8.0))
    assert(out.map(_.docId).sorted.toSeq == (1L to 100L))
  }
}
