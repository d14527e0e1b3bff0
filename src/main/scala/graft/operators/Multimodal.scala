package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side mechanics are real — schemas, partition-preserving
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator per
  * partition, amortized per-batch setup), deterministic output shapes.
  * Three image formats decode NATIVELY: 24bpp uncompressed BMP
  * (bespoke header+stride parser, [[parseBmp]]), PNG and baseline
  * JPEG (javax.imageio — both readers ship in the JDK, [[parsePng]] /
  * [[parseJpeg]], each behind a header sniff that bounds the decode
  * allocation first). Only formats whose codecs genuinely are not in
  * the JDK remain STUBBED — video, compressed audio (MP3/AAC; PCM WAV
  * decodes natively via [[parseWav]]), and exotic JPEG variants the
  * JDK codec rejects (CMYK, arithmetic-coded, lossless SOF3):
  * [[decodeStub]] derives a deterministic fake from the bytes so
  * pipelines are testable end-to-end; swap it for an ffmpeg call in
  * production.
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
    * Stand-in for decoding formats with no JDK codec (video frames,
    * MP3/AAC audio, CMYK/arithmetic/lossless JPEG variants — BMP, PNG,
    * baseline JPEG, and PCM WAV all decode for REAL above): derives
    * (width, height, features) deterministically from the payload
    * bytes. A production build replaces the body with an ffmpeg-class
    * decode + model feature extraction; the signature, batching, and
    * schema stay identical.
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
    *
    * Payloads that parse as a real self-describing format — 24bpp BMP
    * ([[parseBmp]]), PNG ([[parsePng]]) or baseline JPEG
    * ([[parseJpeg]]) — decode NATIVELY: header dimensions, features
    * from the leading pixel values; only opaque formats fall back to
    * [[decodeStub]].
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
        it.map { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          parseBmp(bytes) match {
            case Some(info) =>
              // pixel offset comes from the parsed header — ONE parser
              val features = Array.tabulate(featureDim) { i =>
                // leading pixel bytes of the first row, normalized
                val x = i % (info.width * 3)
                (bytes(info.pixelOffset + x).toInt & 0xFF) / 255f
              }
              DecodedImage(id, info.width, info.height, features)
            case None => parsePng(bytes) match {
              case Some(p) =>
                // features from the leading decoded pixels (normalized
                // red channel, row-major) — the PNG analog of the BMP
                // leading-pixel features
                val im = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
                val features = Array.tabulate(featureDim) { i =>
                  val px = i % (p.width * p.height)
                  ((im.getRGB(px % p.width, px / p.width) >> 16) & 0xFF) / 255f
                }
                DecodedImage(id, p.width, p.height, features)
              case None => parseJpeg(bytes).orElse(
                parseGif(bytes).map(g =>
                  JpegInfo(g.width, g.height, g.pixelSum))) match {
                case Some(j) =>
                  val im = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(bytes))
                  val features = Array.tabulate(featureDim) { i =>
                    val px = i % (j.width * j.height)
                    ((im.getRGB(px % j.width, px / j.width) >> 16)
                      & 0xFF) / 255f
                  }
                  DecodedImage(id, j.width, j.height, features)
                case None =>
                  decodeStub(id, bytes, featureDim)
              }
            }
          }
        }
      }
  }

  // ---------- real BMP codec (24bpp BI_RGB, BITMAPINFOHEADER) ----------

  /** BMP pixel rows pad to 4-byte boundaries. */
  private[graft] def bmpRowStride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** Header + pixel facts of a parsed BMP. `pixelSum` is the unsigned sum
    * over the PIXEL bytes only — row padding excluded, so a decoder that
    * misreads the stride or sums padding is caught by the oracle.
    */
  case class BmpInfo(width: Int, height: Int, bpp: Int, topDown: Boolean,
      pixelSum: Long, pixelOffset: Int)

  /** Build a valid 24bpp uncompressed BMP: BITMAPFILEHEADER +
    * BITMAPINFOHEADER (54 bytes), `height < 0` encodes top-down row
    * order, every pixel channel is `fill`, and row padding is 0xAB —
    * deliberately non-zero so a parser that sums padding bytes fails
    * loudly against the arithmetic oracle. Fixture-generator role (the
    * analog of EnergyFixtures): real ingested BMPs decode through
    * [[parseBmp]] the same way.
    */
  private[graft] def encodeBmp(w: Int, h: Int, fill: Int,
      topDown: Boolean): Array[Byte] = {
    require(w > 0 && h > 0, s"BMP dims must be positive, got ${w}x$h")
    val stride = bmpRowStride(w)
    val size = 54 + stride.toLong * h
    require(size <= Int.MaxValue, s"BMP too large: $size bytes")
    val b = java.nio.ByteBuffer.allocate(size.toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(size.toInt)
    b.putInt(0)          // reserved
    b.putInt(54)         // pixel array offset
    b.putInt(40)         // BITMAPINFOHEADER size
    b.putInt(w)
    b.putInt(if (topDown) -h else h)
    b.putShort(1)        // planes
    b.putShort(24)       // bpp
    b.putInt(0)          // BI_RGB (uncompressed)
    b.putInt(stride * h) // image size
    b.putInt(2835); b.putInt(2835) // 72 DPI
    b.putInt(0); b.putInt(0)       // palette fields
    val fb = (fill & 0xFF).toByte
    var r = 0
    while (r < h) {
      var x = 0
      while (x < w * 3) { b.put(fb); x += 1 }
      var p = w * 3
      while (p < stride) { b.put(0xAB.toByte); p += 1 }
      r += 1
    }
    b.array()
  }

  /** Parse a 24bpp uncompressed BMP header + pixel array. Returns None
    * (not an exception) for anything that is not such a BMP — truncated
    * buffers, wrong magic, compressed/paletted variants — so callers can
    * route opaque payloads to a fallback decoder. Handles bottom-up
    * (positive height) and top-down (negative height) row order; the
    * pixel sum skips row padding.
    */
  private[graft] def parseBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes == null || bytes.length < 54 ||
      bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val offset = b.getInt(10)
    val hdrSize = b.getInt(14)
    val w = b.getInt(18)
    val rawH = b.getInt(22)
    val planes = b.getShort(26)
    val bpp = b.getShort(28)
    val compression = b.getInt(30)
    if (hdrSize < 40 || w <= 0 || rawH == 0 || rawH == Int.MinValue ||
      planes != 1 || bpp != 24 || compression != 0) return None
    // w*3+3 must not overflow Int: an adversarial width would wrap the
    // stride negative, slip past the Long bounds check below, and crash
    // the task on a read past the buffer instead of routing to the stub
    if (w > (Int.MaxValue - 3) / 3) return None
    val h = math.abs(rawH)
    val stride = bmpRowStride(w)
    if (offset < 54 ||
      offset.toLong + stride.toLong * h > bytes.length) return None
    var sum = 0L
    var r = 0
    while (r < h) {
      val rowStart = offset + r * stride
      var x = 0
      while (x < w * 3) { sum += bytes(rowStart + x) & 0xFF; x += 1 }
      r += 1
    }
    Some(BmpInfo(w, h, bpp, rawH < 0, sum, offset))
  }

  /** Catalyst expression over [[encodeBmp]]:
    * `(width int, height int, fill int, top_down boolean) → binary`.
    */
  case class BmpEncodeExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 4, "bmp_encode takes (w, h, fill, topDown)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.take(3).forall(_.dataType == IntegerType) &&
        children(3).dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, int, boolean)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_bmp_encode"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) null
      else encodeBmp(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
        vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Boolean])
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BmpEncodeExpr =
      copy(children = newChildren)
  }

  /** Catalyst expression over [[parseBmp]]: `binary →
    * struct<width int, height int, bpp int, top_down boolean,
    * pixel_sum bigint>`, null for payloads that are not a 24bpp
    * uncompressed BMP (route those to the stub fallback).
    */
  case class BmpDecodeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bpp", IntegerType),
      StructField("top_down", BooleanType),
      StructField("pixel_sum", LongType)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_bmp_decode"
    override def nullSafeEval(bytes: Any): Any =
      parseBmp(bytes.asInstanceOf[Array[Byte]]) match {
        case Some(i) => InternalRow(i.width, i.height, i.bpp, i.topDown,
          i.pixelSum)
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): BmpDecodeExpr = copy(child = newChild)
  }

  /** Column wrapper: build a 24bpp BMP payload. */
  def bmpEncode(w: Column, h: Column, fill: Column, topDown: Column): Column =
    SparkShim.toColumn(BmpEncodeExpr(Seq(w, h, fill, topDown)
      .map(SparkShim.toExpression)))

  /** Column wrapper: parse a 24bpp BMP payload (null if not one). */
  def bmpDecode(payload: Column): Column =
    SparkShim.toColumn(BmpDecodeExpr(SparkShim.toExpression(payload)))

  // ---------- real PNG codec (javax.imageio — in the JDK) ----------

  /** Decoded facts of a parsed PNG. `pixelSum` is the sum of all RGB
    * channel values — PNG is lossless, so it is exact arithmetic over
    * the encoded pixels (reaching it requires a REAL zlib inflate +
    * filter reconstruction; no header shortcut can produce it).
    */
  case class PngInfo(width: Int, height: Int, pixelSum: Long)

  /** Build a grayscale-gradient RGB PNG: pixel (x, y) has all three
    * channels at `(fill + x + y) mod 256`. The gradient (not a solid
    * fill) means the pixel sum depends on every pixel position — a
    * decoder that guessed from the dimensions alone fails the oracle.
    */
  private[graft] def encodePng(w: Int, h: Int, fill: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"PNG dims must be positive, got ${w}x$h")
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (fill + x + y) & 0xFF
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG payload (magic-sniffed, then a full javax.imageio
    * decode). Returns None for anything that is not a parseable PNG so
    * callers route opaque payloads to the fallback decoder.
    */
  /** Largest accepted decoded size (pixels). ImageIO allocates the full
    * frame from the UNTRUSTED IHDR dimensions before any pixel data is
    * validated — an adversarial 60000×60000 header would OOM the
    * executor (fatal, not catchable) off a few hundred payload bytes.
    * 2^24 pixels ≈ a 4096×4096 frame ≈ 64 MB of ARGB — plenty for a
    * feature-extract pipeline; larger frames route to the stub.
    */
  private val MaxPngPixels = 1L << 24

  /** Guarded PNG → BufferedImage: magic + IHDR sniff and the
    * [[MaxPngPixels]] allocation bound BEFORE ImageIO sees the bytes
    * (shared by [[parsePng]] and [[resizePngNn]] so the two paths can
    * never diverge on what counts as a decodable PNG).
    */
  private def decodePngImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.length < 33 ||
      (bytes(0) & 0xFF) != 0x89 || bytes(1) != 'P'.toByte ||
      bytes(2) != 'N'.toByte || bytes(3) != 'G'.toByte) return None
    // IHDR is mandatory-first (offset 16: width, 20: height, big-endian)
    // — bound the decode allocation BEFORE handing bytes to ImageIO
    if (bytes(12) != 'I'.toByte || bytes(13) != 'H'.toByte ||
      bytes(14) != 'D'.toByte || bytes(15) != 'R'.toByte) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val w = bb.getInt(16)
    val h = bb.getInt(20)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPngPixels) return None
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private[graft] def parsePng(bytes: Array[Byte]): Option[PngInfo] =
    decodePngImage(bytes).map { im =>
      var sum = 0L
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          val rgb = im.getRGB(x, y)
          sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
          x += 1
        }
        y += 1
      }
      PngInfo(im.getWidth, im.getHeight, sum)
    }

  /** Nearest-neighbor resize of a decoded PNG to `w2`×`h2`: target pixel
    * (x, y) samples source pixel (⌊x·w/w2⌋, ⌊y·h/h2⌋) — the standard NN
    * convention (exact integer index arithmetic, no filtering, no
    * float rounding), so the resized pixel sum is re-derivable
    * arithmetically by an oracle that never decodes a byte. Returns the
    * resized facts; None for anything [[decodePngImage]] rejects.
    */
  private[graft] def resizePngNn(bytes: Array[Byte], w2: Int,
      h2: Int): Option[PngInfo] = {
    if (w2 <= 0 || h2 <= 0 || w2.toLong * h2 > MaxPngPixels) return None
    decodePngImage(bytes).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      var sum = 0L
      var y = 0
      while (y < h2) {
        val sy = (y.toLong * h / h2).toInt
        var x = 0
        while (x < w2) {
          val sx = (x.toLong * w / w2).toInt
          val rgb = im.getRGB(sx, sy)
          sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
          x += 1
        }
        y += 1
      }
      PngInfo(w2, h2, sum)
    }
  }

  /** Catalyst expression over [[encodePng]]:
    * `(width int, height int, fill int) → binary`.
    */
  case class PngEncodeExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 3, "png_encode takes (w, h, fill)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, int)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_png_encode"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) null
      else encodePng(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
        vs(2).asInstanceOf[Int])
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): PngEncodeExpr =
      copy(children = newChildren)
  }

  /** Catalyst expression over [[parsePng]]: `binary →
    * struct<width int, height int, pixel_sum bigint>`, null for
    * payloads that are not a parseable PNG.
    */
  case class PngDecodeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_png_decode"
    override def nullSafeEval(bytes: Any): Any =
      parsePng(bytes.asInstanceOf[Array[Byte]]) match {
        case Some(i) => InternalRow(i.width, i.height, i.pixelSum)
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): PngDecodeExpr = copy(child = newChild)
  }

  /** Catalyst expression over [[resizePngNn]]:
    * `(payload binary, w2 int, h2 int) → struct(width, height,
    * pixel_sum)` — a REAL decode + per-target-pixel NN sample, null for
    * non-PNG payloads or unallocatable target dims.
    */
  case class PngResizeExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 3, "png_resize takes (payload, w2, h2)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.head.dataType == BinaryType &&
        children.tail.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int)")
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_png_resize"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) return null
      resizePngNn(vs(0).asInstanceOf[Array[Byte]],
        vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Int]) match {
        case Some(i) => InternalRow(i.width, i.height, i.pixelSum)
        case None => null
      }
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): PngResizeExpr = copy(children = cs)
  }

  /** Perceptual difference hash (dHash) of a PNG payload — the image
    * near-dup fingerprint: decode, NN-resample to a 9×8 grayscale grid
    * (gray = ⌊(r+g+b)/3⌋, the same exact-integer NN convention as
    * [[resizePngNn]]), and set bit (x, y) iff gray(x+1, y) >
    * gray(x, y). Robust to rescaling and mild recompression; pair
    * hashes by Hamming distance (the [[graft.functions.GraftFunctions]]
    * hamming path / d4's SimHash machinery) for dedup. The 64 bits
    * return as two unsigned 32-bit halves in longs (hi = bits 0–31
    * MSB-first) so no engine ever sign-wraps a shift.
    */
  private[graft] def pngDhash(bytes: Array[Byte]): Option[(Long, Long, Int)] =
    decodePngImage(bytes).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      def gray(sx: Int, sy: Int): Int = {
        val rgb = im.getRGB(sx, sy)
        (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
      }
      val g = Array.tabulate(8, 9) { (y, x) =>
        gray((x.toLong * w / 9).toInt, (y.toLong * h / 8).toInt)
      }
      var hi = 0L
      var lo = 0L
      var n = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (g(y)(x + 1) > g(y)(x)) {
            n += 1
            val k = y * 8 + x
            if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
          }
          x += 1
        }
        y += 1
      }
      (hi, lo, n)
    }

  /** Catalyst expression over [[pngDhash]]:
    * `binary → struct(dhash_hi long, dhash_lo long, n_set int)` — a
    * real decode + 9×8 NN gradient walk, null for non-PNG payloads.
    */
  case class PngDhashExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = StructType(Seq(
      StructField("dhash_hi", LongType),
      StructField("dhash_lo", LongType),
      StructField("n_set", IntegerType)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_png_dhash"
    override def nullSafeEval(bytes: Any): Any =
      pngDhash(bytes.asInstanceOf[Array[Byte]]) match {
        case Some((hi, lo, n)) => InternalRow(hi, lo, n)
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): PngDhashExpr = copy(child = newChild)
  }

  /** Column wrapper: perceptual dHash of a PNG payload. */
  def pngDhashCol(payload: Column): Column =
    SparkShim.toColumn(PngDhashExpr(SparkShim.toExpression(payload)))

  /** Column wrapper: build a gradient RGB PNG payload. */
  def pngEncode(w: Column, h: Column, fill: Column): Column =
    SparkShim.toColumn(PngEncodeExpr(Seq(w, h, fill)
      .map(SparkShim.toExpression)))

  /** Column wrapper: decode a PNG payload (null if not one). */
  def pngDecode(payload: Column): Column =
    SparkShim.toColumn(PngDecodeExpr(SparkShim.toExpression(payload)))

  /** Column wrapper: nearest-neighbor resize of a PNG payload. */
  def pngResize(payload: Column, w2: Column, h2: Column): Column =
    SparkShim.toColumn(PngResizeExpr(Seq(payload, w2, h2)
      .map(SparkShim.toExpression)))

  // ---------- real JPEG codec (baseline JFIF via the JDK's ImageIO) ----

  /** Decoded facts of a parsed JPEG — same shape as [[PngInfo]]. */
  case class JpegInfo(width: Int, height: Int, pixelSum: Long)

  /** Build a BLOCK-SOLID grayscale-valued RGB JPEG: the 8×8 DCT block
    * with row-major index b is a solid value `(fill + 41·b) mod 256`
    * in all three channels, written by the JDK's JPEG encoder at
    * quality 1.0. A solid block's spectrum is DC-only, and gray pixels
    * pin chroma at 128 (so 4:2:0 subsampling is exact) — the codec
    * round-trip is BIT-EXACT (measured: 0 mismatches over all 256
    * values), which is what makes a LOSSY format arithmetically
    * oracle-able: the decoded pixel sum is Σ_b 192·v_b, re-derivable
    * by an engine that never decodes a byte. Dims must be multiples of
    * 8 so no partial edge block breaks the DC-only argument.
    */
  private[graft] def encodeJpeg(w: Int, h: Int, fill: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"JPEG fixture dims must be positive multiples of 8, got ${w}x$h")
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val wb = w / 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val b = (y / 8) * wb + (x / 8)
        val v = ((fill + 41 * b) % 256 + 256) % 256
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(im, null, null), p)
    wr.dispose()
    ios.close()
    bos.toByteArray
  }

  /** SOF frame-header walk: (width, height) of a JPEG payload from its
    * SOF0/1/2 marker — the JPEG analog of the PNG IHDR sniff, so the
    * decode allocation is bounded BEFORE ImageIO touches untrusted
    * bytes. None for anything that is not a JPEG with a frame header
    * ahead of the scan (SOF3+ lossless/arithmetic variants are left to
    * the decode attempt, which rejects them).
    */
  private[graft] def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var p = 2
    while (p + 3 < bytes.length) {
      if ((bytes(p) & 0xFF) != 0xFF) return None
      val m = bytes(p + 1) & 0xFF
      if (m == 0xFF) { p += 1 }                                // fill byte
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) { p += 2 } // standalone
      else {
        val len = ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
        if (len < 2 || p + 2 + len > bytes.length) return None
        if ((m == 0xC0 || m == 0xC1 || m == 0xC2) && len >= 7 &&
          p + 8 < bytes.length) {
          val h = ((bytes(p + 5) & 0xFF) << 8) | (bytes(p + 6) & 0xFF)
          val w = ((bytes(p + 7) & 0xFF) << 8) | (bytes(p + 8) & 0xFF)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        if (m == 0xDA) return None             // a scan before any SOF
        p += 2 + len
      }
    }
    None
  }

  /** Guarded JPEG → BufferedImage: [[jpegDims]] sniff + the
    * [[MaxPngPixels]] allocation bound (shared with the PNG path)
    * before the full javax.imageio decode. None for non-JPEG payloads
    * and for variants the JDK codec rejects (CMYK, arithmetic-coded,
    * lossless SOF3).
    */
  private def decodeJpegImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    jpegDims(bytes).flatMap { case (w, h) =>
      if (w.toLong * h > MaxPngPixels) None
      else try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  private[graft] def parseJpeg(bytes: Array[Byte]): Option[JpegInfo] =
    decodeJpegImage(bytes).map { im =>
      var sum = 0L
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          val rgb = im.getRGB(x, y)
          sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
          x += 1
        }
        y += 1
      }
      JpegInfo(im.getWidth, im.getHeight, sum)
    }

  /** Catalyst expression over [[encodeJpeg]]:
    * `(width int, height int, fill int) → binary`.
    */
  case class JpegEncodeExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 3, "jpeg_encode takes (w, h, fill)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, int)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_jpeg_encode"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) null
      else encodeJpeg(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
        vs(2).asInstanceOf[Int])
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): JpegEncodeExpr =
      copy(children = newChildren)
  }

  /** Catalyst expression over [[parseJpeg]]: `binary →
    * struct<width int, height int, pixel_sum bigint>`, null for
    * payloads that are not a decodable JPEG.
    */
  case class JpegDecodeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_jpeg_decode"
    override def nullSafeEval(bytes: Any): Any =
      parseJpeg(bytes.asInstanceOf[Array[Byte]]) match {
        case Some(i) => InternalRow(i.width, i.height, i.pixelSum)
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): JpegDecodeExpr = copy(child = newChild)
  }

  /** Column wrapper: build a block-solid gradient JPEG payload. */
  def jpegEncode(w: Column, h: Column, fill: Column): Column =
    SparkShim.toColumn(JpegEncodeExpr(Seq(w, h, fill)
      .map(SparkShim.toExpression)))

  /** Column wrapper: decode a JPEG payload (null if not one). */
  def jpegDecode(payload: Column): Column =
    SparkShim.toColumn(JpegDecodeExpr(SparkShim.toExpression(payload)))

  // ---------- real GIF codec (palette/LZW via the JDK's ImageIO) ----

  /** Decoded facts of a parsed GIF — same shape as [[PngInfo]]. */
  case class GifInfo(width: Int, height: Int, pixelSum: Long)

  /** Build a gray-gradient GIF: pixel (x, y) = (fill + x + y) mod 256
    * in all three channels — the PNG fixture's exact gradient. A gray
    * ramp has at most 256 distinct colors, so the GIF palette holds it
    * without quantization and the LZW round-trip is LOSSLESS: the
    * decoded pixel sum is the same Σ 3·((fill+x+y) mod 256) arithmetic
    * the PNG oracle computes — while producing it here requires a real
    * palette + LZW decode.
    */
  private[graft] def encodeGif(w: Int, h: Int, fill: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"GIF dims must be positive, got ${w}x$h")
    // an EXPLICIT 256-gray IndexColorModel: the JDK's GIF writer keeps
    // an indexed image's palette verbatim, but QUANTIZES a direct-color
    // (TYPE_INT_RGB) input through its built-in halftone cube — which
    // would break the lossless contract the oracle depends on
    val grays = Array.tabulate[Byte](256)(i => i.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256,
      grays, grays, grays)
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = im.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, (fill + x + y) & 0xFF)
        x += 1
      }
      y += 1
    }
    // write NON-interlaced explicitly: the JDK writer defaults to the
    // interlaced row order, and its own reader scrambles tiny
    // interlaced images on the round-trip (rows land shifted — a
    // measured JDK quirk, not a spec behavior this codec can rely on)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val p = wr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(im, null, null), p)
    wr.dispose()
    ios.close()
    bos.toByteArray
  }

  /** GIF logical-screen-descriptor sniff: (width, height) from the
    * GIF87a/GIF89a header — little-endian u16 at offsets 6/8 — so the
    * decode allocation is bounded BEFORE ImageIO touches untrusted
    * bytes (the IHDR/SOF discipline).
    */
  private[graft] def gifDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 13 ||
      bytes(0) != 'G'.toByte || bytes(1) != 'I'.toByte ||
      bytes(2) != 'F'.toByte || bytes(3) != '8'.toByte ||
      (bytes(4) != '7'.toByte && bytes(4) != '9'.toByte) ||
      bytes(5) != 'a'.toByte) return None
    val w = (bytes(6) & 0xFF) | ((bytes(7) & 0xFF) << 8)
    val h = (bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** Guarded GIF → BufferedImage: [[gifDims]] sniff + the
    * [[MaxPngPixels]] allocation bound before the full decode. */
  private def decodeGifImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    gifDims(bytes).flatMap { case (w, h) =>
      if (w.toLong * h > MaxPngPixels) None
      else try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  private[graft] def parseGif(bytes: Array[Byte]): Option[GifInfo] =
    decodeGifImage(bytes).map { im =>
      var sum = 0L
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          val rgb = im.getRGB(x, y)
          sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
          x += 1
        }
        y += 1
      }
      GifInfo(im.getWidth, im.getHeight, sum)
    }

  /** Catalyst expression over [[encodeGif]]:
    * `(width int, height int, fill int) → binary`. */
  case class GifEncodeExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 3, "gif_encode takes (w, h, fill)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, int)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_gif_encode"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) null
      else encodeGif(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
        vs(2).asInstanceOf[Int])
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): GifEncodeExpr =
      copy(children = newChildren)
  }

  /** Catalyst expression over [[parseGif]]: `binary →
    * struct<width int, height int, pixel_sum bigint>`, null for
    * payloads that are not a decodable GIF. */
  case class GifDecodeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_gif_decode"
    override def nullSafeEval(bytes: Any): Any =
      parseGif(bytes.asInstanceOf[Array[Byte]]) match {
        case Some(i) => InternalRow(i.width, i.height, i.pixelSum)
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): GifDecodeExpr = copy(child = newChild)
  }

  /** Column wrapper: build a gray-gradient GIF payload. */
  def gifEncode(w: Column, h: Column, fill: Column): Column =
    SparkShim.toColumn(GifEncodeExpr(Seq(w, h, fill)
      .map(SparkShim.toExpression)))

  /** Column wrapper: decode a GIF payload (null if not one). */
  def gifDecode(payload: Column): Column =
    SparkShim.toColumn(GifDecodeExpr(SparkShim.toExpression(payload)))

  // ---------- ANIMATED GIF: real multi-frame decode ----------

  /** Build an ANIMATED gray GIF: frame f's pixel (x, y) =
    * (fill + 7·f + x + y) mod 256 — every frame a full-size indexed
    * image through [[encodeGif]]'s palette discipline (explicit gray
    * ICM, non-interlaced), appended with `writeToSequence`. The
    * round-trip is lossless per frame, so per-frame pixel sums are
    * plain arithmetic for the oracle while producing them here takes a
    * real multi-image LZW decode — the frame-extraction plumbing that
    * was previously only exercised by the video STUB (mm3).
    */
  private[graft] def encodeGifAnim(w: Int, h: Int, fill: Int,
      frames: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"GIF dims must be positive, got ${w}x$h")
    require(frames >= 1 && frames <= 64,
      s"frames must be in [1, 64], got $frames")
    val grays = Array.tabulate[Byte](256)(i => i.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256,
      grays, grays, grays)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val p = wr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = im.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, (fill + 7 * f + x + y) & 0xFF)
          x += 1
        }
        y += 1
      }
      wr.writeToSequence(new javax.imageio.IIOImage(im, null, null), p)
      f += 1
    }
    wr.endWriteSequence()
    wr.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Decode every frame of a GIF: per-frame (frame_idx, width, height,
    * pixel_sum), raw frame rasters (no disposal compositing — each
    * written frame is full-size here). None for non-GIF payloads;
    * frames stop at `maxFrames` (loud cap, the frame analog of the
    * pixel bound).
    */
  private[graft] def parseGifFrames(bytes: Array[Byte],
      maxFrames: Int = 256): Option[Seq[GifInfo]] =
    gifDims(bytes).flatMap { case (w, h) =>
      if (w.toLong * h > MaxPngPixels) None
      else try {
        val rd = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        rd.setInput(iis)
        val n = math.min(rd.getNumImages(true), maxFrames)
        val out = (0 until n).map { i =>
          val im = rd.read(i)
          var sum = 0L
          var y = 0
          while (y < im.getHeight) {
            var x = 0
            while (x < im.getWidth) {
              val rgb = im.getRGB(x, y)
              sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          GifInfo(im.getWidth, im.getHeight, sum)
        }
        rd.dispose()
        iis.close()
        if (out.isEmpty) None else Some(out)
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Catalyst expression over [[encodeGifAnim]]:
    * `(width int, height int, fill int, frames int) → binary`. */
  case class GifAnimEncodeExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 4, "gif_anim_encode takes (w, h, fill, n)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, int, int)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_gif_anim_encode"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) null
      else encodeGifAnim(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
        vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Int])
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): GifAnimEncodeExpr =
      copy(children = newChildren)
  }

  /** Catalyst expression over [[parseGifFrames]]: `binary →
    * array<struct<frame_idx int, width int, height int,
    * pixel_sum bigint>>`, null for non-GIF payloads. */
  case class GifFramesExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType))), containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_gif_frames"
    override def nullSafeEval(bytes: Any): Any =
      parseGifFrames(bytes.asInstanceOf[Array[Byte]]) match {
        case Some(fs) => new org.apache.spark.sql.catalyst.util
          .GenericArrayData(fs.zipWithIndex.map { case (g, i) =>
            InternalRow(i, g.width, g.height, g.pixelSum)
          }.toArray[Any])
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): GifFramesExpr = copy(child = newChild)
  }

  /** Column wrapper: build an animated gray-gradient GIF payload. */
  def gifAnimEncode(w: Column, h: Column, fill: Column,
      frames: Column): Column =
    SparkShim.toColumn(GifAnimEncodeExpr(Seq(w, h, fill, frames)
      .map(SparkShim.toExpression)))

  /** Column wrapper: decode every frame of a GIF payload. */
  def gifFrames(payload: Column): Column =
    SparkShim.toColumn(GifFramesExpr(SparkShim.toExpression(payload)))

  // ---------- real WAV codec (RIFF/WAVE, 16-bit PCM) ----------

  /** Decoded facts of a parsed PCM WAV. `sampleSum` is the sum of every
    * signed 16-bit sample across channels — the audio analog of the
    * image pixel sums: exact arithmetic over the payload a header-only
    * shortcut cannot produce.
    */
  case class WavInfo(channels: Int, sampleRate: Int, bits: Int,
      nFrames: Long, sampleSum: Long)

  /** Build a valid RIFF/WAVE file, 16-bit PCM: sample k (frame-major,
    * channel-minor) = ((seed + k) mod 65536) − 32768 — a wrapping ramp,
    * so the sum depends on every sample position. Fixture-generator
    * role; real ingested WAVs decode through [[parseWav]] the same way.
    */
  private[graft] def encodeWav(channels: Int, sampleRate: Int,
      frames: Int, seed: Int): Array[Byte] = {
    require(channels > 0 && channels <= 16 && frames > 0 && sampleRate > 0,
      s"bad WAV params: channels=$channels rate=$sampleRate frames=$frames")
    val n = channels.toLong * frames
    require(n * 2 <= Int.MaxValue - 44, s"WAV too large: $n samples")
    val dataSize = (n * 2).toInt
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1)                         // PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * channels * 2)   // byte rate
    b.putShort((channels * 2).toShort)    // block align
    b.putShort(16)                        // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0L
    while (k < n) {
      val v = ((seed + k) % 65536 - 32768).toShort
      b.putShort(v)
      k += 1
    }
    b.array()
  }

  /** Parse a RIFF/WAVE 16-bit PCM payload: walk the chunk list (any
    * order, unknown chunks skipped), read `fmt `, then sum the signed
    * little-endian samples of `data`. Returns None — not an exception —
    * for anything else (wrong magic, non-PCM, truncated or adversarial
    * chunk sizes), so callers route opaque payloads to the fallback.
    */
  /** Located/validated chunk facts of a 16-bit PCM WAV: `dataAt` is the
    * byte offset of the first sample, `nSamples` the (channel-
    * interleaved) sample count.
    */
  private case class WavChunks(channels: Int, rate: Int, bits: Int,
      dataAt: Int, nSamples: Int)

  /** The RIFF chunk walk shared by [[parseWav]] and [[wavFrameStats]]:
    * locate `fmt ` + `data` (any order, unknown chunks skipped) and
    * validate 16-bit PCM framing. Returns None — not an exception —
    * for anything else (wrong magic, non-PCM, truncated or adversarial
    * chunk sizes), so callers route opaque payloads to the fallback.
    */
  private def wavChunks(bytes: Array[Byte]): Option[WavChunks] = {
    if (bytes == null || bytes.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int): String =
      new String(bytes, at, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var channels = 0
    var rate = 0
    var bits = 0
    var fmtOk = false
    var dataAt = -1
    var dataLen = 0
    // every read is bounds-checked against the REAL buffer, not the
    // declared RIFF size — adversarial chunk lengths route to None
    while (pos + 8 <= bytes.length && (dataAt < 0 || !fmtOk)) {
      val id = tag(pos)
      val len = b.getInt(pos + 4)
      // Long arithmetic: an adversarial length near Int.MaxValue would
      // wrap the Int bound check negative and slip past it
      if (len < 0 || pos.toLong + 8 + len > bytes.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val audioFormat = b.getShort(pos + 8)
        channels = b.getShort(pos + 10)
        rate = b.getInt(pos + 12)
        bits = b.getShort(pos + 22)
        if (audioFormat != 1 || channels <= 0 || rate <= 0 || bits != 16)
          return None
        fmtOk = true
      } else if (id == "data") {
        dataAt = pos + 8
        dataLen = len
      }
      pos += 8 + len + (len & 1) // RIFF chunks pad to even offsets
    }
    if (!fmtOk || dataAt < 0 || dataLen % 2 != 0) return None
    val n = dataLen / 2
    if (n % channels != 0) return None
    Some(WavChunks(channels, rate, bits, dataAt, n))
  }

  private[graft] def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    wavChunks(bytes).map { c =>
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var sum = 0L
      var i = 0
      while (i < c.nSamples) { sum += b.getShort(c.dataAt + i * 2); i += 1 }
      WavInfo(c.channels, c.rate, c.bits, c.nSamples.toLong / c.channels,
        sum)
    }
  }

  /** Per-frame exact features of a 16-bit PCM WAV: the payload's flat
    * (channel-interleaved) sample stream splits into full frames of
    * `frameLen` samples every `hop` samples; each frame reports
    *   energy      = Σ s²            (exact, ≤ 2³⁰ per sample ⇒ Long),
    *   peak        = max |s|         (32768 for the −32768 sample),
    *   zero_cross  = sign changes between CONSECUTIVE samples inside
    *                 the frame, zero counted as non-negative.
    * Trailing samples that do not fill a frame are dropped (only full
    * frames are comparable across payload lengths). All three are
    * integer arithmetic over the decoded samples — a header-only
    * shortcut cannot produce them, and an external engine re-derives
    * them bit-exactly. None for anything that is not 16-bit PCM WAV.
    */
  private[graft] def wavFrameStats(bytes: Array[Byte], frameLen: Int,
      hop: Int): Option[Array[(Int, Long, Int, Int)]] = {
    wavChunks(bytes).map { c =>
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val nFrames =
        if (c.nSamples < frameLen) 0 else (c.nSamples - frameLen) / hop + 1
      val out = new Array[(Int, Long, Int, Int)](nFrames)
      var f = 0
      while (f < nFrames) {
        val start = f * hop
        var energy = 0L
        var peak = 0
        var zc = 0
        var i = 0
        var prevNeg = false
        while (i < frameLen) {
          val s = b.getShort(c.dataAt + (start + i) * 2).toInt
          energy += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          val neg = s < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          i += 1
        }
        out(f) = (f, energy, peak, zc)
        f += 1
      }
      out
    }
  }

  /** Catalyst expression over [[encodeWav]]:
    * `(channels int, sample_rate int, frames int, seed int) → binary`.
    */
  case class WavEncodeExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 4,
      "wav_encode takes (channels, sampleRate, frames, seed)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, int, int)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_wav_encode"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) null
      else encodeWav(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
        vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Int])
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): WavEncodeExpr =
      copy(children = newChildren)
  }

  /** Catalyst expression over [[parseWav]]: `binary →
    * struct<channels int, sample_rate int, bits int, n_frames bigint,
    * sample_sum bigint>`, null for payloads that are not 16-bit PCM
    * WAV (route those to the stub fallback).
    */
  case class WavDecodeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = StructType(Seq(
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_frames", LongType),
      StructField("sample_sum", LongType)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_wav_decode"
    override def nullSafeEval(bytes: Any): Any =
      parseWav(bytes.asInstanceOf[Array[Byte]]) match {
        case Some(w) => InternalRow(w.channels, w.sampleRate, w.bits,
          w.nFrames, w.sampleSum)
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): WavDecodeExpr = copy(child = newChild)
  }

  /** Catalyst expression over [[wavFrameStats]]: `binary →
    * array<struct<frame_idx int, energy bigint, peak int,
    * zero_cross int>>`, null for payloads that are not 16-bit PCM WAV.
    * `frameLen`/`hop` are operator parameters (plan literals), not
    * per-row columns — one framing grid per query, as a feature
    * pipeline wants.
    */
  case class WavFramesExpr(child: Expression, frameLen: Int, hop: Int)
      extends UnaryExpression with CodegenFallback {
    require(frameLen >= 2 && frameLen <= (1 << 20),
      s"frameLen must be in [2, 2^20], got $frameLen")
    require(hop >= 1 && hop <= frameLen,
      s"hop must be in [1, frameLen], got $hop")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false),
      StructField("zero_cross", IntegerType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_wav_frames"
    override def nullSafeEval(bytes: Any): Any =
      wavFrameStats(bytes.asInstanceOf[Array[Byte]], frameLen, hop) match {
        case Some(frames) =>
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            frames.map { case (f, e, p, z) =>
              InternalRow(f, e, p, z): Any
            })
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): WavFramesExpr = copy(child = newChild)
  }

  /** Column wrapper: per-frame exact audio features of a PCM WAV. */
  def wavFrames(payload: Column, frameLen: Int, hop: Int): Column =
    SparkShim.toColumn(WavFramesExpr(SparkShim.toExpression(payload),
      frameLen, hop))

  /** Column wrapper: build a 16-bit PCM WAV payload. */
  def wavEncode(channels: Column, sampleRate: Column, frames: Column,
      seed: Column): Column =
    SparkShim.toColumn(WavEncodeExpr(Seq(channels, sampleRate, frames,
      seed).map(SparkShim.toExpression)))

  /** Column wrapper: parse a 16-bit PCM WAV payload (null if not one). */
  def wavDecode(payload: Column): Column =
    SparkShim.toColumn(WavDecodeExpr(SparkShim.toExpression(payload)))

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

  // ---- QOI (Quite OK Image) codec: a full from-scratch implementation
  // of the public one-page spec (qoiformat.org) — header, all six chunk
  // ops (RGB/RGBA/INDEX/DIFF/LUMA/RUN, wraparound byte diffs, the
  // r·3+g·5+b·7+a·11 mod 64 running index), strict end marker. The
  // decoder is STREAMING: 64-entry index + previous pixel + running sum,
  // O(1) memory whatever the frame size — no pixel buffer is ever
  // allocated, so unlike the ImageIO path there is no header-driven
  // allocation to bound (dims are still sanity-capped).

  case class QoiInfo(width: Int, height: Int, channels: Int,
      pixelSum: Long)

  @inline private def qoiPack(r: Int, g: Int, b: Int, a: Int): Int =
    (r << 24) | (g << 16) | (b << 8) | a

  @inline private def qoiHash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  /** Encode the shared grayscale-gradient fixture ((fill + x + y) mod
    * 256 on all three channels) as RGB QOI. The gradient drives DIFF
    * (+1 steps), LUMA/RGB (row wraps), INDEX (revisited colors) and RUN
    * (1-wide frames) — a decoder that shortcuts any op fails the oracle.
    */
  private[graft] def encodeQoi(w: Int, h: Int, fill: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"QOI dims must be positive, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream(14 + w * h + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be(i: Int): Unit = { out.write((i >>> 24) & 0xFF)
      out.write((i >>> 16) & 0xFF); out.write((i >>> 8) & 0xFF)
      out.write(i & 0xFF) }
    be(w); be(h); out.write(3); out.write(0)
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0
    var prev = qoiPack(0, 0, 0, 255)
    var run = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (fill + x + y) & 0xFF
        val cur = qoiPack(v, v, v, 255)
        if (cur == prev) {
          run += 1
          if (run == 62) { out.write(0xC0 | (run - 1)); run = 0 }
        } else {
          if (run > 0) { out.write(0xC0 | (run - 1)); run = 0 }
          val idx = qoiHash(v, v, v, 255)
          if (index(idx) == cur) out.write(idx)
          else {
            index(idx) = cur
            // wraparound signed byte diffs, exactly as the spec reads
            val dr = ((v - pr + 128) & 0xFF) - 128
            val dg = ((v - pg + 128) & 0xFF) - 128
            val db = ((v - pb + 128) & 0xFF) - 128
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
              db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else if (dg >= -32 && dg <= 31 && (dr - dg) >= -8 &&
              (dr - dg) <= 7 && (db - dg) >= -8 && (db - dg) <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((dr - dg + 8) << 4) | (db - dg + 8))
            } else {
              out.write(0xFE); out.write(v); out.write(v); out.write(v)
            }
          }
          prev = cur; pr = v; pg = v; pb = v
        }
        x += 1
      }
      y += 1
    }
    if (run > 0) out.write(0xC0 | (run - 1))
    var i = 0
    while (i < 7) { out.write(0); i += 1 }
    out.write(1)
    out.toByteArray
  }

  /** Streaming QOI decode → (width, height, channels, Σ(r+g+b)).
    * None for anything that is not a spec-complete QOI payload: bad
    * magic, bad dims/channels/colorspace, a chunk stream that ends
    * early, overruns the pixel count, or is missing the end marker.
    */
  private[graft] def parseQoi(bytes: Array[Byte]): Option[QoiInfo] = {
    if (bytes == null || bytes.length < 23 ||
      bytes(0) != 'q'.toByte || bytes(1) != 'o'.toByte ||
      bytes(2) != 'i'.toByte || bytes(3) != 'f'.toByte) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val w = bb.getInt(4); val h = bb.getInt(8)
    val channels = bytes(12).toInt; val colorspace = bytes(13).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPngPixels ||
      (channels != 3 && channels != 4) ||
      (colorspace != 0 && colorspace != 1)) return None
    val total = w.toLong * h
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var produced = 0L; var sum = 0L
    var pos = 14
    val dataEnd = bytes.length - 8
    while (produced < total) {
      if (pos >= dataEnd) return None // chunk stream ended early
      val b1 = bytes(pos) & 0xFF; pos += 1
      if (b1 == 0xFE) {
        if (pos + 3 > dataEnd) return None
        r = bytes(pos) & 0xFF; g = bytes(pos + 1) & 0xFF
        b = bytes(pos + 2) & 0xFF; pos += 3
      } else if (b1 == 0xFF) {
        if (pos + 4 > dataEnd) return None
        r = bytes(pos) & 0xFF; g = bytes(pos + 1) & 0xFF
        b = bytes(pos + 2) & 0xFF; a = bytes(pos + 3) & 0xFF; pos += 4
      } else (b1 >>> 6) match {
        case 0 =>
          val px = index(b1)
          r = (px >>> 24) & 0xFF; g = (px >>> 16) & 0xFF
          b = (px >>> 8) & 0xFF; a = px & 0xFF
        case 1 =>
          r = (r + ((b1 >>> 4) & 3) - 2) & 0xFF
          g = (g + ((b1 >>> 2) & 3) - 2) & 0xFF
          b = (b + (b1 & 3) - 2) & 0xFF
        case 2 =>
          if (pos + 1 > dataEnd) return None
          val vg = (b1 & 0x3F) - 32
          val b2 = bytes(pos) & 0xFF; pos += 1
          r = (r + vg + ((b2 >>> 4) & 0xF) - 8) & 0xFF
          g = (g + vg) & 0xFF
          b = (b + vg + (b2 & 0xF) - 8) & 0xFF
        case _ =>
          val run = (b1 & 0x3F) + 1
          if (run > 62 || produced + run > total) return None
          sum += run.toLong * (r + g + b)
          produced += run
      }
      if ((b1 >>> 6) != 3 || b1 == 0xFE || b1 == 0xFF) {
        // every non-run chunk yields exactly one pixel and refreshes
        // the running index (a no-op for INDEX chunks, per the spec)
        index(qoiHash(r, g, b, a)) = qoiPack(r, g, b, a)
        sum += (r + g + b).toLong
        produced += 1
      }
    }
    // strict end marker: seven 0x00 then 0x01, and nothing else pending
    if (pos != dataEnd) return None
    var i = 0
    while (i < 7) { if (bytes(dataEnd + i) != 0) return None; i += 1 }
    if (bytes(dataEnd + 7) != 1) return None
    Some(QoiInfo(w, h, channels, sum))
  }

  /** Catalyst expression: `(w int, h int, fill int) → binary` QOI. */
  case class QoiEncodeExpr(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.length == 3, "qoi_encode takes (w, h, fill)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType == IntegerType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int, int)")
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_qoi_encode"
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) null
      else encodeQoi(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
        vs(2).asInstanceOf[Int])
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): QoiEncodeExpr =
      copy(children = newChildren)
  }

  /** Catalyst expression over [[parseQoi]]: `binary → struct<width,
    * height, channels int, pixel_sum bigint>`, null for non-QOI. */
  case class QoiDecodeExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary")
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("pixel_sum", LongType)))
    override def nullable: Boolean = true
    override def prettyName: String = "graft_qoi_decode"
    override def nullSafeEval(bytes: Any): Any =
      parseQoi(bytes.asInstanceOf[Array[Byte]]) match {
        case Some(i) => InternalRow(i.width, i.height, i.channels,
          i.pixelSum)
        case None => null
      }
    override protected def withNewChildInternal(
        newChild: Expression): QoiDecodeExpr = copy(child = newChild)
  }

  /** `(w, h, fill) → binary` QOI column. */
  def qoiEncode(w: Column, h: Column, fill: Column): Column =
    SparkShim.toColumn(QoiEncodeExpr(Seq(w, h, fill)
      .map(SparkShim.toExpression)))

  /** `binary → struct(width, height, channels, pixel_sum)` column. */
  def qoiDecode(payload: Column): Column =
    SparkShim.toColumn(QoiDecodeExpr(SparkShim.toExpression(payload)))
}
