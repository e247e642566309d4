package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star extensions, SURVEY §2.9):
  * image/audio/video payloads as opaque `BinaryType` columns with typed
  * metadata, plus decode / feature-extract / frame-sample plumbing.
  *
  * The driver testdata has no binary table, so the media table is derived
  * deterministically from `documents` (payload = the UTF-8 bytes of the
  * text; kind = doc_id mod 3). The corpus is pure ASCII, so the DuckDB
  * oracle mirrors every byte operation on VARCHAR while Spark runs on
  * real BINARY — identical bytes, identical md5s.
  *
  * The [[MediaPipeline]] companion keeps the Spark-side plumbing real
  * (typed Dataset, explicit batch shape via mapPartitions, pluggable
  * decoder) with two decoders: [[MediaPipeline.StubDecoder]], a
  * deterministic byte-stat stand-in the DuckDB oracle can mirror (q42),
  * and [[MediaPipeline.JvmImageDecoder]], a REAL `javax.imageio` image
  * decoder (PNG/BMP/GIF are pure-JVM) producing width/height/channel-mean/
  * luma-stddev features. JPEG/PCM/video codecs would slot behind the same
  * [[MediaPipeline.MediaDecoder]] batch interface.
  *
  * Scale: everything here is a single scan with per-row expressions; the
  * only shuffle is the final small groupBy on (kind[, frame]). Payloads
  * never shuffle.
  */
object Multimodal extends QueryModule {

  private val Kinds = "array('image', 'audio', 'video')"
  private val FrameLen = 64
  private val FrameStride = 128
  private val NFrames = 4

  // --- q32: media metadata + content fingerprints -------------------------
  private def q32(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr(s"element_at($Kinds, CAST(doc_id % 3 AS INT) + 1)").as("kind"),
        expr("CAST(text AS BINARY)").as("payload"))
      .select(
        col("doc_id"), col("kind"),
        expr("CAST(octet_length(payload) AS BIGINT)").as("n_bytes"),
        expr(Dialect.sparkHash60("payload")).as("fp"),
        expr(Dialect.sparkHash60("substring(payload, 1, 32)")).as("thumb"))

  private val q32Sql =
    s"""SELECT doc_id,
       |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |  CAST(length(text) AS BIGINT) AS n_bytes,
       |  ${Dialect.duckHash60("text")} AS fp,
       |  ${Dialect.duckHash60("substring(text, 1, 32)")} AS thumb
       |FROM documents""".stripMargin

  // --- q33: frame sampling (fan-out to fixed-offset windows) --------------
  // Four 64-byte "frames" at stride 128 per payload — the video
  // frame-sample shape: explode to (doc, frame) rows, fingerprint each
  // frame, aggregate distinct frame content per (kind, frame index).
  // Frames past the payload end are empty slices on both engines and are
  // filtered out by length.
  private def q33(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr(s"element_at($Kinds, CAST(doc_id % 3 AS INT) + 1)").as("kind"),
        expr("CAST(text AS BINARY)").as("payload"))
      .select(col("doc_id"), col("kind"),
        explode(expr(
          s"""transform(sequence(0, ${NFrames - 1}), f -> named_struct(
             |  'frame', f,
             |  'fbytes', substring(payload, 1 + f * $FrameStride, $FrameLen)))"""
            .stripMargin)).as("e"))
      .select(col("kind"), col("e.frame").as("frame"),
        expr("e.fbytes").as("fbytes"))
      .filter(expr("octet_length(fbytes) > 0"))
      .groupBy("kind", "frame")
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct(expr(Dialect.sparkHash60("fbytes"))).as("n_distinct"),
        min(expr(Dialect.sparkHash60("fbytes"))).as("min_fp"))

  private val q33Sql = {
    val fp = Dialect.duckHash60("fbytes")
    s"""WITH frames AS (
       |  SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |    f AS frame,
       |    substring(text, 1 + f * $FrameStride, $FrameLen) AS fbytes
       |  FROM documents, unnest(generate_series(0, ${NFrames - 1})) AS t(f)
       |)
       |SELECT kind, CAST(frame AS INT) AS frame,
       |  COUNT(*) AS n_frames,
       |  COUNT(DISTINCT $fp) AS n_distinct,
       |  MIN($fp) AS min_fp
       |FROM frames WHERE length(fbytes) > 0
       |GROUP BY kind, frame""".stripMargin
  }

  // --- q42: typed feature-extraction pipeline under the oracle gate -------
  // Runs the REAL typed path — Dataset[MediaRecord] → mapPartitions
  // batch decode ([[MediaPipeline.extract]] with the deterministic stub)
  // — and emits per-doc features. The stub's feature j is the mean of
  // payload bytes at stride-8 offsets starting at j; on the ASCII corpus
  // DuckDB reproduces it with ascii()/generate_series arithmetic
  // (integer sum, one double division, round 6 — bit parity).
  private def q42(s: SparkSession, dir: String): DataFrame = {
    val media = MediaPipeline.mediaFrom(s, dir)
    val feats = MediaPipeline.extract(media, MediaPipeline.StubDecoder)
    feats.toDF()
      .select(
        col("docId").as("doc_id"),
        col("kind"),
        round(expr("features[0]"), 6).as("f0"),
        round(expr("features[7]"), 6).as("f7"))
  }

  private val q42Sql = {
    def f(j: Int) =
      s"""CASE WHEN length(text) > $j THEN round(
         |  CAST(list_sum(list_transform(generate_series(${j + 1}, length(text), 8),
         |    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))) AS DOUBLE)
         |  / len(generate_series(${j + 1}, length(text), 8)), 6)
         |ELSE 0.0 END""".stripMargin
    s"""SELECT doc_id,
       |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       |  ${f(0)} AS f0,
       |  ${f(7)} AS f7
       |FROM documents""".stripMargin
  }

  // --- q146: perceptual-hash duplicate-image detection ---------------------
  // The image-side mirror of exact text dedup: an aHash-style 64-bit
  // fingerprint over the decoded sample grid — 64 samples at a
  // length-proportional stride (the "resize to 8×8" step of a real
  // aHash), each bit = sample above the grid mean — then hash-equality
  // grouping finds duplicate payloads regardless of doc ids. On the
  // battery's stub-decoded payloads (UTF-8 bytes of text, corpus is
  // ASCII) the oracle replays every byte; a real deployment swaps
  // [[MediaPipeline.JvmImageDecoder]]'s luma grid behind the same
  // expression and the pipeline shape is unchanged.
  //
  // Integer-exact: bit = 64·sample > Σsamples (no division), the hash is
  // a 64-char bitstring — one scan, per-row expressions, one hash-keyed
  // aggregate of the duplicate groups. At 100 TB the grouping shuffles
  // only (hash, doc_id) pairs, never payloads; near-dup (Hamming ≤ k)
  // extends by banding the bitstring into 4 substrings and bucket-joining
  // (q27's SimHash machinery, already in the battery).
  private def q146(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents")
      .filter(length(col("text")) >= 64)
      .withColumn("stride", expr("(length(text) - 1) div 63"))
      .withColumn("samples", expr(
        "transform(sequence(0, 63), j -> " +
          "CAST(ascii(substring(text, j * stride + 1, 1)) AS BIGINT))"))
      .withColumn("total", expr(
        "aggregate(samples, 0L, (a, x) -> a + x)"))
      .withColumn("phash", expr(
        """concat_ws('', transform(samples,
          |  x -> CASE WHEN x * 64 > total THEN '1' ELSE '0' END))"""
          .stripMargin))
      .groupBy("phash")
      .agg(
        count(lit(1)).as("n_images"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_images") >= 2)
  }

  private val q146Sql =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_aggregate(list_transform(range(0, 64),
      |      j -> CAST(ascii(substr(text, CAST(j AS INT)
      |        * CAST(((length(text) - 1) // 63) AS INT) + 1, 1))
      |        AS BIGINT)), 'sum') AS total,
      |    list_transform(range(0, 64),
      |      j -> CAST(ascii(substr(text, CAST(j AS INT)
      |        * CAST(((length(text) - 1) // 63) AS INT) + 1, 1))
      |        AS BIGINT)) AS samples
      |  FROM documents WHERE length(text) >= 64
      |), b AS (
      |  SELECT doc_id,
      |    array_to_string(list_transform(samples,
      |      x -> CASE WHEN x * 64 > total THEN '1' ELSE '0' END), '')
      |      AS phash
      |  FROM h
      |)
      |SELECT phash, COUNT(*) AS n_images,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM b GROUP BY phash HAVING COUNT(*) >= 2""".stripMargin

  // --- q167: dominant-color histogram ---------------------------------------
  // The palette-summarization step of an image-curation pass: 16 "RGB
  // triplets" sampled from each payload's first 48 CHARACTERS (ascii()
  // is codepoint-based in both engines, so a multibyte character is one
  // sample, not several bytes), every channel quantized to 2 bits
  // (codepoint div 64, clamped to 3 — a codepoint > 255, e.g. CJK text,
  // would otherwise push the channel past 2 bits and the code outside
  // the palette), triplet code = r·16 + g·4 + b (one of 64 palette
  // cells); a payload's dominant color = the modal code, ties to the
  // smallest code. The per-image mode runs
  // RELATIONALLY — explode the 16 codes, count per (doc, code), take
  // rank 1 under (count desc, code asc) — so it is the same plan at 16
  // samples or 16k, no driver-side array walk; the final histogram per
  // (kind, dominant color) is a tiny aggregate. On the stub-decoded
  // payloads the oracle replays every byte; a real deployment swaps the
  // decoder's pixel grid behind the same per-row sampling expression.
  private def q167(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("cnt").desc, col("code").asc)
    Tables.load(s, dir, "documents")
      .filter(length(col("text")) >= 48)
      .select(col("doc_id"),
        expr(s"element_at($Kinds, CAST(doc_id % 3 AS INT) + 1)").as("kind"),
        explode(expr(
          """transform(sequence(0, 15), t ->
            |  least(ascii(substring(text, t * 3 + 1, 1)) div 64, 3) * 16
            |  + least(ascii(substring(text, t * 3 + 2, 1)) div 64, 3) * 4
            |  + least(ascii(substring(text, t * 3 + 3, 1)) div 64, 3))"""
            .stripMargin)).as("code"))
      .groupBy("doc_id", "kind", "code")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("kind"), col("code").cast("long").as("dom_color"))
      .agg(count(lit(1)).as("n_images"))
  }

  private val q167Sql =
    """WITH s AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    unnest(list_transform(range(0, 16), t ->
      |      least(ascii(substr(text, CAST(t AS INT) * 3 + 1, 1)) // 64, 3) * 16
      |      + least(ascii(substr(text, CAST(t AS INT) * 3 + 2, 1)) // 64, 3) * 4
      |      + least(ascii(substr(text, CAST(t AS INT) * 3 + 3, 1)) // 64, 3)))
      |      AS code
      |  FROM documents WHERE length(text) >= 48
      |), c AS (
      |  SELECT doc_id, kind, code, COUNT(*) AS cnt
      |  FROM s GROUP BY 1, 2, 3
      |), dom AS (
      |  SELECT doc_id, kind, code,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY cnt DESC, code ASC) AS rn
      |  FROM c
      |)
      |SELECT kind, CAST(code AS BIGINT) AS dom_color,
      |  COUNT(*) AS n_images
      |FROM dom WHERE rn = 1 GROUP BY 1, 2""".stripMargin

  // --- q251: shot-boundary detection over frame samples --------------------
  // The temporal-segmentation step of a video-curation pipeline: q33's
  // frame-sample shape widened to 16 frames per payload, each frame
  // reduced to an integer "luma" (byte-codepoint sum — the same
  // deterministic stand-in the StubDecoder uses for channel means; a
  // real luma plugs in behind the identical per-frame scalar), and a
  // shot boundary declared wherever consecutive frames differ by more
  // than τ. Per kind: payload count, frame/boundary totals, shots
  // (= 1 + boundaries per payload), the max shot count, and mean
  // frames-per-shot in exact milli. This is the cut-detection
  // arithmetic of shot segmentation (threshold-on-frame-difference,
  // the classic baseline) with the decode stage stubbed per the module
  // contract.
  //
  // Scale shape: one scan, explode ×16, per-PAYLOAD lag window (local
  // sort within hash partitions — payload grain, never global), then a
  // |kinds|-row aggregate. Payload bytes never shuffle — only
  // (doc, frame, luma) integers do.
  private val SbFrames = 16
  private val SbStride = 16
  private val SbLen = 16
  private val SbTau = 40

  private def q251(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr(s"element_at($Kinds, CAST(doc_id % 3 AS INT) + 1)")
          .as("kind"),
        explode(expr(
          s"""transform(sequence(0, ${SbFrames - 1}), f -> named_struct(
             |  'frame', f,
             |  'fb', substring(text, 1 + f * $SbStride, $SbLen)))"""
            .stripMargin)).as("e"))
      .select(col("doc_id"), col("kind"), col("e.frame").as("frame"),
        col("e.fb").as("fb"))
      .filter(length(col("fb")) > 0)
      .withColumn("luma", expr(
        s"""aggregate(transform(sequence(1, $SbLen),
           |  i -> ascii(substring(fb, i, 1))),
           |  0L, (a, x) -> a + x)""".stripMargin))
    val w = Window.partitionBy("doc_id").orderBy("frame")
    val perDoc = frames
      .withColumn("prev", lag(col("luma"), 1).over(w))
      .groupBy("doc_id", "kind")
      .agg(count(lit(1)).as("nf"),
        sum(when(abs(col("luma") - col("prev")) > SbTau, 1L)
          .otherwise(0L)).as("nb"))
    perDoc.groupBy("kind").agg(
      count(lit(1)).as("n_media"),
      sum(col("nf")).as("n_frames"),
      sum(col("nb")).as("n_boundaries"),
      sum(col("nb") + 1L).as("n_shots"),
      max(col("nb") + 1L).as("max_shots"))
      .withColumn("avg_shot_frames_milli",
        expr("(1000 * n_frames) DIV n_shots"))
  }

  private val q251Sql =
    s"""WITH frames AS (
       |  SELECT doc_id,
       |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]
       |      AS kind,
       |    f AS frame,
       |    substring(text, 1 + f * $SbStride, $SbLen) AS fb
       |  FROM documents,
       |    unnest(generate_series(0, ${SbFrames - 1})) AS t(f)
       |), lf AS (
       |  SELECT doc_id, kind, frame,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, $SbLen),
       |        i -> CAST(ascii(substr(fb, i, 1)) AS BIGINT))),
       |      (a, x) -> a + x) AS luma
       |  FROM frames WHERE length(fb) > 0
       |), d AS (
       |  SELECT doc_id, kind, luma,
       |    LAG(luma) OVER (PARTITION BY doc_id ORDER BY frame) AS prev
       |  FROM lf
       |), pd AS (
       |  SELECT doc_id, kind, COUNT(*) AS nf,
       |    SUM(CASE WHEN abs(luma - prev) > $SbTau THEN 1 ELSE 0 END)
       |      AS nb
       |  FROM d GROUP BY 1, 2
       |)
       |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_media,
       |  CAST(SUM(nf) AS BIGINT) AS n_frames,
       |  CAST(SUM(nb) AS BIGINT) AS n_boundaries,
       |  CAST(SUM(nb + 1) AS BIGINT) AS n_shots,
       |  CAST(MAX(nb + 1) AS BIGINT) AS max_shots,
       |  CAST((1000 * SUM(nf)) // SUM(nb + 1) AS BIGINT)
       |    AS avg_shot_frames_milli
       |FROM pd GROUP BY kind""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q251_shot_boundaries" -> q251 _,
    "q32_media_meta" -> q32 _,
    "q33_frame_sample" -> q33 _,
    "q42_media_features" -> q42 _,
    "q146_image_phash" -> q146 _,
    "q167_color_histogram" -> q167 _)

  val oracleSql: Map[String, String] = Map(
    "q251_shot_boundaries" -> q251Sql,
    "q32_media_meta" -> q32Sql,
    "q33_frame_sample" -> q33Sql,
    "q42_media_features" -> q42Sql,
    "q146_image_phash" -> q146Sql,
    "q167_color_histogram" -> q167Sql)
}

/** Typed multimodal pipeline: the Spark-side plumbing (schemas, encoders,
  * batch shape, partition flow) for feature extraction over opaque binary
  * payloads, with the native decode step behind a pluggable interface.
  */
object MediaPipeline {

  final case class MediaMeta(kind: String, nBytes: Long)
  final case class MediaRecord(docId: Long, meta: MediaMeta,
      payload: Array[Byte])
  final case class MediaFeatures(docId: Long, kind: String,
      features: Array[Double])

  /** Batch decoder contract: one call per micro-batch of records (the
    * batch shape lets a real implementation amortize native-lib setup,
    * exactly like an Arrow-batched pandas UDF would).
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
  }

  /** Deterministic stand-in for a real image/audio decoder: features are
    * strided byte averages (8 buckets). Pure JVM, no native deps, stable
    * across runs — the tests pin its output.
    */
  object StubDecoder extends MediaDecoder {
    val Dim = 8
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val n = r.payload.length
        val feats = Array.tabulate(Dim) { j =>
          var sum = 0L
          var cnt = 0
          var i = j
          while (i < n) { sum += (r.payload(i) & 0xff); cnt += 1; i += Dim }
          if (cnt == 0) 0.0 else sum.toDouble / cnt
        }
        MediaFeatures(r.docId, r.meta.kind, feats)
      }
  }

  /** Real image decoder over `javax.imageio` (pure JVM — PNG/BMP/GIF ship
    * with the JDK, no native libs). Feature layout (Dim = 8):
    * [width, height, nPixels, meanR, meanG, meanB, meanLuma, stddevLuma]
    * with luma = the Rec.601 integer-weighted (299R+587G+114B)/1000.
    * Payloads ImageIO cannot decode (wrong magic, truncated) are DROPPED
    * from the batch — the decoder contract allows shorter output, and a
    * 100 TB corpus always carries undecodable rows; failing the task on
    * one bad payload is the wrong behavior at scale.
    */
  object JvmImageDecoder extends MediaDecoder {
    val Dim = 8
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.flatMap { r =>
        // in-memory decode only: ImageIO's default disk cache would write
        // executor tmp files per payload
        // NonFatal, not just IOException: ImageIO plugin readers throw
        // RuntimeExceptions (IllegalArgument, ArrayIndexOutOfBounds,
        // NegativeArraySize) on malformed-but-recognized payloads, and the
        // drop-undecodable-rows contract must hold for those too — one
        // corrupt payload must never fail the task.
        val img =
          try Option(javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.payload))))
          catch { case scala.util.control.NonFatal(_) => None }
        img.map { im =>
          val (w, h) = (im.getWidth, im.getHeight)
          var (sr, sg, sb, sl, sll) = (0L, 0L, 0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = im.getRGB(x, y)
              val (cr, cg, cb) =
                ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
              val l = (299 * cr + 587 * cg + 114 * cb) / 1000
              sr += cr; sg += cg; sb += cb; sl += l; sll += l.toLong * l
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val (ml, mll) = (sl.toDouble / n, sll.toDouble / n)
          MediaFeatures(r.docId, r.meta.kind, Array(
            w.toDouble, h.toDouble, n.toDouble, sr.toDouble / n,
            sg.toDouble / n, sb.toDouble / n, ml,
            math.sqrt(math.max(0.0, mll - ml * ml))))
        }
      }
  }

  /** Deterministic nearest-neighbor image resize, record → record: the
    * payload is decoded (ImageIO, in-memory), sampled at integer grid
    * positions (srcX = x·srcW div dstW — explicit arithmetic, no AWT
    * filtering, so the output is bit-stable across JVMs), and re-encoded
    * as PNG (lossless, so the sampled pixels round-trip exactly).
    * Undecodable payloads are DROPPED — the same 100 TB contract as
    * [[JvmImageDecoder]]: one corrupt row never fails the task.
    */
  object JvmImageResizer {
    def resizeBatch(batch: Seq[MediaRecord], dstW: Int, dstH: Int)
        : Seq[MediaRecord] =
      batch.flatMap { r =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.payload))))
          catch { case scala.util.control.NonFatal(_) => None }
        img.map { im =>
          val (sw, sh) = (im.getWidth, im.getHeight)
          val out = new java.awt.image.BufferedImage(
            dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // Long products: x·sw overflows Int for multi-megapixel sources
          // or large upscale targets, and a negative index would throw out
          // of the drop-undecodable guard and kill the task on one row
          var y = 0
          while (y < dstH) {
            val sy = (y.toLong * sh / dstH).toInt
            var x = 0
            while (x < dstW) {
              out.setRGB(x, y, im.getRGB((x.toLong * sw / dstW).toInt, sy))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          // write returns false when no PNG ImageWriter is registered —
          // an environment defect, not row corruption: fail loudly rather
          // than emit a zero-byte payload (the drop contract is only for
          // undecodable INPUT rows)
          require(javax.imageio.ImageIO.write(out, "png", bos),
            "JvmImageResizer: no PNG ImageWriter registered in this JVM")
          val bytes = bos.toByteArray
          MediaRecord(r.docId,
            MediaMeta(r.meta.kind, bytes.length.toLong), bytes)
        }
      }

    /** Distributed resize with the same bounded-batch partition flow as
      * [[extract]]: payloads stream through one batch at a time.
      */
    def resize(media: Dataset[MediaRecord], dstW: Int, dstH: Int,
        batchSize: Int = 64): Dataset[MediaRecord] = {
      import media.sparkSession.implicits._
      media.mapPartitions(_.grouped(batchSize).flatMap(b =>
        resizeBatch(b, dstW, dstH)))
    }
  }

  /** documents → typed media records (payload = UTF-8 bytes). */
  def mediaFrom(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("element_at(array('image','audio','video')," +
          " CAST(doc_id % 3 AS INT) + 1)").as("kind"),
        expr("CAST(text AS BINARY)").as("payload"))
      .select(col("doc_id").as("docId"),
        struct(col("kind"), expr("CAST(octet_length(payload) AS BIGINT)")
          .as("nBytes")).as("meta"),
        col("payload"))
      .as[MediaRecord]
  }

  /** Feature extraction with explicit batch shape: each partition's
    * iterator is re-chunked into `batchSize` groups so the decoder sees
    * bounded batches regardless of partition size — payload bytes stream
    * through one batch at a time and never accumulate per task.
    */
  def extract(media: Dataset[MediaRecord], decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(b =>
      decoder.decodeBatch(b)))
  }
}
