package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side mechanics are real — schemas, partition-preserving
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator per
  * partition, amortized per-batch setup), deterministic output shapes.
  * The actual media decoding is STUBBED (no image/audio libraries in this
  * environment): each stub derives a deterministic fake from the bytes so
  * pipelines are testable end-to-end; swap [[decodeStub]] for a libjpeg/
  * ffmpeg call in production.
  */
object Multimodal {

  /** Typed metadata carried with every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("byte_len", LongType),
    StructField("checksum", StringType)))

  /** Wrap a source column as a binary payload + metadata struct. In real
    * ingestion the payload is the raw media file; here any column can be
    * lifted (e.g. text bytes) to exercise the pipeline.
    */
  def attachBinary(df: DataFrame, srcCol: String, modality: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(modality).as("modality"),
        octet_length(col(srcCol).cast(BinaryType)).cast(LongType).as("byte_len"),
        md5(col(srcCol).cast(BinaryType)).as("checksum")))

  /** Decoded-image record produced by [[decodeImages]]. */
  case class DecodedImage(id: Long, width: Int, height: Int,
      features: Array[Float])

  /** ======== STUB ========
    * Stand-in for a real image decode: derives (width, height, features)
    * deterministically from the payload bytes. A production build replaces
    * the body with e.g. ImageIO/libjpeg decode + model feature extraction;
    * the signature, batching, and schema stay identical.
    */
  private def decodeStub(id: Long, bytes: Array[Byte], featureDim: Int): DecodedImage = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 16 + (math.abs(h) % 1024)
    val height = 16 + (math.abs(h >> 10) % 1024)
    val features = Array.tabulate(featureDim) { i =>
      if (bytes.isEmpty) 0f
      else (bytes(i % bytes.length).toInt & 0xFF) / 255f
    }
    DecodedImage(id, width, height, features)
  }

  /** Decode a binary image column into (id, width, height, features).
    * `mapPartitions` keeps per-partition decoder state (a real decoder/
    * model is loaded once per partition, not per row) — the exact shape a
    * `mapInPandas` batch UDF has in PySpark.
    */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String,
      featureDim: Int = 8): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("__id"), col(payloadCol))
      // null / uncastable ids cannot decode into the primitive field —
      // drop the dirty rows instead of failing the job
      .where(col("__id").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here (decoder/model handle)
        it.map { case (id, bytes) =>
          decodeStub(id, if (bytes == null) Array.emptyByteArray else bytes,
            featureDim)
        }
      }
  }

  /** ======== STUB ======== deterministic "resize": clamps the stub
    * dimensions — placeholder for a real resample kernel.
    */
  def resize(images: Dataset[DecodedImage], maxSide: Int): Dataset[DecodedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.map { im =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(im.width, im.height))
      im.copy(width = math.max(1, (im.width * scale).toInt),
        height = math.max(1, (im.height * scale).toInt))
    }
  }

  /** Deterministic frame sampling for a "video" payload: n evenly spaced
    * byte offsets (real impl: ffmpeg keyframe extraction at the same
    * offsets). Returns (id, frame_idx, frame_byte).
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"frame count must be positive, got $n")
    df.select(col(idCol), col(payloadCol),
        octet_length(col(payloadCol)).as("__len"))
      .where(col("__len") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset",
        (col("frame_idx").cast(LongType) * col("__len") / n).cast(IntegerType))
      .withColumn("frame_byte",
        conv(hex(col(payloadCol).substr(col("frame_offset") + 1, lit(1))), 16, 10)
          .cast(IntegerType))
      .select(col(idCol), col("frame_idx"), col("frame_offset"), col("frame_byte"))
  }
}
