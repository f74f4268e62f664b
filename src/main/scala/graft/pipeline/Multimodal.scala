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
 * The container has no image/audio codecs, so the decode kernels are
 * STUBBED with a clearly-marked deterministic fake (`FakeCodec`): the
 * Spark-side plumbing — schema, partitioning, batch iteration, output
 * shape — is real and tested; swap `FakeCodec` for a JNI/opencv binding in
 * production.
 */
object Multimodal {

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
        val (w, h) = FakeCodec.imageDims(bytes)
        org.apache.spark.sql.Row(r.getLong(idIdx), w, h, FakeCodec.features(bytes).toSeq)
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
        org.apache.spark.sql.Row(r.getLong(idIdx), FakeCodec.resize(bytes, w, h))
      }
    }(enc)
  }

  /** Frame sampling for video: one row per sampled frame (flatMap shape —
    * the row-multiplying pattern a frame extractor needs). */
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
        FakeCodec.frameSample(bytes, everyN).zipWithIndex.map { case (f, i) =>
          org.apache.spark.sql.Row(r.getLong(idIdx), i, f)
        }
      }
    }(enc)
  }
}
