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
