package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns for training-data pipelines: image/audio/video travel
 * as opaque `BINARY` columns with a typed metadata struct, processed
 * batch-at-a-time inside `mapPartitions` so the decode library (when one
 * exists) amortizes per-partition init — the Spark-native shape for
 * non-columnar payloads.
 *
 * Image decode/resize is REAL for PNG/JPEG (and any other format the JDK's
 * `javax.imageio` registry carries — public JDK surface, headless-safe).
 * Payloads ImageIO cannot read (audio, the gate's text-bytes stand-ins)
 * fall back to the clearly-marked deterministic stub (`FakeCodec`) so the
 * pipeline shape stays total and testable. Frame sampling is REAL for
 * animated GIF (`GifCodec`: multi-frame ImageIO read + delta-frame
 * compositing — the one motion format a stock JDK can demux); other video
 * containers (mp4/webm) still fall back to the stub, as the JDK ships no
 * demuxer for them. The call sites (mapPartitions batch loop) never
 * change — swap the codec object for a JNI/ffmpeg binding to widen
 * format coverage.
 */
object Multimodal {

  /** Real image codec over `javax.imageio` (PNG/JPEG/BMP/GIF in any stock
    * JDK). All methods return None when no registered reader understands
    * the bytes — callers fall back to `FakeCodec`. */
  object ImageIoCodec {
    // in-memory streams only: the default disk-backed ImageInputStream
    // cache adds a temp file per decode on the bulk path
    javax.imageio.ImageIO.setUseCache(false)

    /** NonFatal, not just IOException: imageio readers throw unchecked
      * exceptions (AIOOBE, CMMException, …) on truncated/crafted payloads
      * whose headers parse but bodies are corrupt — one such blob must not
      * kill a 10M-image job; it falls back like any undecodable payload. */
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null || bytes.isEmpty) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }

    def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
      decode(bytes).map(i => (i.getWidth, i.getHeight))

    /** Decode → scale to (w, h) → re-encode PNG. */
    def resizePng(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decode(bytes).map { img =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }

    /** 8-bin luminance histogram over decoded pixels, row-count normalized
      * — a real (if trivial) visual feature standing where an embedding
      * model's forward pass would run. */
    def features(bytes: Array[Byte]): Option[Array[Float]] =
      decode(bytes).map(featuresOf)

    /** Histogram from an already-decoded image (the bulk path decodes ONCE
      * per row and derives dims + features from the same BufferedImage). */
    def featuresOf(img: java.awt.image.BufferedImage): Array[Float] = {
      val h = new Array[Float](8)
      val (w, ht) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < ht) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          h(lum / 32) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(1f, (w * ht).toFloat)
      h.map(_ / n)
    }
  }

  /** Real animated-GIF frame extraction — pure JVM (`javax.imageio`'s GIF
    * reader demuxes the only motion format the stock JDK understands).
    * GIF frames may be DELTAS (a sub-rectangle at an offset over the
    * previous canvas), so each stored frame is composited onto a
    * logical-screen canvas at its ImageDescriptor offset and snapshotted;
    * restore-to-background/previous disposal is approximated by
    * draw-over (the common case for screen-capture/meme GIFs; a frame
    * SAMPLER tolerates the rare artifact). */
  object GifCodec {
    /** GIF87a/89a magic. */
    def isGif(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > 6 &&
        bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'

    /** All frames as fully-composed RGB snapshots, or None when the
      * payload isn't a decodable GIF. */
    def frames(bytes: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] = {
      if (!isGif(bytes)) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        // iis closes on EVERY exit — including a throw from reader
        // acquisition — or a long-running executor leaks one stream
        // per malformed payload
        try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          var canvas: java.awt.image.BufferedImage = null
          val out = Vector.newBuilder[java.awt.image.BufferedImage]
          var i = 0
          while (i < n) {
            val frame = reader.read(i)
            val (x, y) = frameOffset(reader, i)
            if (canvas == null) {
              val (cw, ch) = logicalScreen(reader)
                .getOrElse((x + frame.getWidth, y + frame.getHeight))
              canvas = new java.awt.image.BufferedImage(
                math.max(cw, x + frame.getWidth), math.max(ch, y + frame.getHeight),
                java.awt.image.BufferedImage.TYPE_INT_RGB)
            }
            val g = canvas.createGraphics()
            g.drawImage(frame, x, y, null); g.dispose()
            val snap = new java.awt.image.BufferedImage(
              canvas.getWidth, canvas.getHeight,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = snap.createGraphics()
            g2.drawImage(canvas, 0, 0, null); g2.dispose()
            out += snap
            i += 1
          }
          Some(out.result())
        } finally reader.dispose()
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Sampled frames re-encoded as PNG, keyed by SOURCE frame index. */
    def sampleFramesPng(bytes: Array[Byte], everyN: Int): Option[Seq[(Int, Array[Byte])]] =
      frames(bytes).map(_.zipWithIndex.collect {
        case (f, i) if i % math.max(1, everyN) == 0 =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(f, "png", bos)
          i -> bos.toByteArray
      })

    private def frameOffset(reader: javax.imageio.ImageReader, i: Int): (Int, Int) =
      try {
        val tree = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[org.w3c.dom.Element]
        val ds = tree.getElementsByTagName("ImageDescriptor")
        if (ds.getLength == 0) (0, 0)
        else {
          val e = ds.item(0).asInstanceOf[org.w3c.dom.Element]
          (e.getAttribute("imageLeftPosition").toInt,
            e.getAttribute("imageTopPosition").toInt)
        }
      } catch { case scala.util.control.NonFatal(_) => (0, 0) }

    private def logicalScreen(reader: javax.imageio.ImageReader): Option[(Int, Int)] =
      try {
        val tree = reader.getStreamMetadata
          .getAsTree("javax_imageio_gif_stream_1.0").asInstanceOf[org.w3c.dom.Element]
        val ds = tree.getElementsByTagName("LogicalScreenDescriptor")
        if (ds.getLength == 0) None
        else {
          val e = ds.item(0).asInstanceOf[org.w3c.dom.Element]
          Some((e.getAttribute("logicalScreenWidth").toInt,
            e.getAttribute("logicalScreenHeight").toInt))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Standard multimodal record schema: content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /**
   * STUB decode kernel — deterministic fake standing in for a real codec.
   * "Decodes" width/height/duration from the byte content so tests have
   * stable expectations. Replace with a real binding at deployment; the
   * call sites (mapPartitions batch loop) do not change.
   */
  object FakeCodec {
    def imageDims(bytes: Array[Byte]): (Int, Int) = {
      if (bytes == null || bytes.isEmpty) (0, 0)
      else ((math.abs(bytes.head.toInt) % 64) + 1, (math.abs(bytes.last.toInt) % 64) + 1)
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (bytes == null) Array.emptyByteArray
      else bytes.take(math.max(1, math.min(bytes.length, w * h)))
    def frameSample(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      if (bytes == null || bytes.isEmpty) Nil
      else bytes.grouped(math.max(1, everyN)).map(_.toArray).toSeq
    /** 8-dim feature vector from byte histogram — stands in for an
      * embedding model forward pass. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Float](8)
      if (bytes != null) bytes.foreach(b => h((b & 0xFF) % 8) += 1f)
      val n = math.max(1f, if (bytes == null) 1f else bytes.length.toFloat)
      h.map(_ / n)
    }
  }

  /** Content size + sha1 — pure Column ops, no decode needed; the cheap
    * first-pass stats any 100 TB media crawl runs. */
  def contentStats(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("content_len", when(col(contentCol).isNull, 0L)
        .otherwise(length(col(contentCol)).cast("long")))
      .withColumn("content_sha1", sha1(coalesce(col(contentCol), lit(Array.emptyByteArray))))

  /**
   * Ingest a directory/glob of raw media files into the standard media
   * schema via Spark's `binaryFile` source — the missing first step of
   * the media pipeline (crawl dir → DataFrame). Distributed file reads
   * (each executor reads its own split of files), no driver
   * materialization; `media_id` = xxhash64(path) so re-ingesting is
   * idempotent and ids are stable across runs and partitionings. The
   * modality/mime guess comes from the extension (a content-sniffing
   * decode pass — `decodeImages` — refines it later); `path` rides along
   * for lineage. `pathGlobFilter` pushes the extension filter into file
   * LISTING, not a post-scan filter.
   */
  def readMedia(spark: org.apache.spark.sql.SparkSession, path: String,
      globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val df = globFilter.fold(reader)(g => reader.option("pathGlobFilter", g)).load(path)
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val mime = when(ext.isin("png"), "image/png")
      .when(ext.isin("jpg", "jpeg"), "image/jpeg")
      .when(ext.isin("gif"), "image/gif")
      .when(ext.isin("bmp"), "image/bmp")
      .when(ext.isin("wav"), "audio/wav")
      .when(ext.isin("mp3"), "audio/mpeg")
      .when(ext.isin("flac"), "audio/flac")
      .when(ext.isin("mp4"), "video/mp4")
      .when(ext.isin("webm"), "video/webm")
      .otherwise("application/octet-stream")
    val modality = when(mime.startsWith("image/"),
        when(ext === "gif", "video").otherwise("image")) // animated GIF = frames
      .when(mime.startsWith("audio/"), "audio")
      .when(mime.startsWith("video/"), "video")
      .otherwise("binary")
    df.select(
      xxhash64(col("path")).as("media_id"),
      modality.as("modality"),
      col("content"),
      struct(mime.as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"),
      col("path"))
  }

  /**
   * Decode pass via mapPartitions: per-partition "codec init" happens once,
   * rows stream through in a batch loop. Output adds (width, height,
   * feature ARRAY<FLOAT>). Row-encoder based to stay schema-dynamic.
   */
  def decodeImages(df: DataFrame,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      // per-partition codec init would go here (amortized, like a Pandas
      // UDF's batch-level model load)
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        // real decode first (PNG/JPEG/...) — ONCE per row, dims + features
        // from the same BufferedImage; non-image payloads fall back to the
        // deterministic stub so the pass stays total
        val (w, h, feat) = ImageIoCodec.decode(bytes) match {
          case Some(img) =>
            (img.getWidth, img.getHeight, ImageIoCodec.featuresOf(img))
          case None =>
            val (fw, fh) = FakeCodec.imageDims(bytes)
            (fw, fh, FakeCodec.features(bytes))
        }
        org.apache.spark.sql.Row(r.getLong(idIdx), w, h, feat.toSeq)
      }
    }(enc)
  }

  /** Resize pass — binary in, binary out, same mapPartitions shape. */
  def resizeImages(df: DataFrame, w: Int, h: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        val resized = ImageIoCodec.resizePng(bytes, w, h)
          .getOrElse(FakeCodec.resize(bytes, w, h))
        org.apache.spark.sql.Row(r.getLong(idIdx), resized)
      }
    }(enc)
  }

  /** Frame sampling for video: one row per sampled frame (flatMap shape —
    * the row-multiplying pattern a frame extractor needs). Animated GIF
    * payloads decode for REAL (`GifCodec`: every `everyN`-th composed
    * frame, re-encoded PNG, `frame_idx` = SOURCE frame index); payloads
    * no JDK demuxer understands fall back to the deterministic stub
    * (chunking, `frame_idx` = chunk ordinal) so the pass stays total. */
  def sampleFrames(df: DataFrame, everyN: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        val sampled = GifCodec.sampleFramesPng(bytes, everyN).getOrElse(
          FakeCodec.frameSample(bytes, everyN).zipWithIndex.map(_.swap))
        sampled.map { case (i, f) =>
          org.apache.spark.sql.Row(r.getLong(idIdx), i, f)
        }
      }
    }(enc)
  }
}
