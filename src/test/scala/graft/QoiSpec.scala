package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** QOI codec (mm7 family): spec-vector encodes, streaming-decode
  * robustness, and chunk-op coverage. */
class QoiSpec extends SparkTestBase {
  import spark.implicits._

  private def rt(w: Int, h: Int, fill: Int): Multimodal.QoiInfo =
    Multimodal.parseQoi(Multimodal.encodeQoi(w, h, fill)).get

  private def gradientSum(w: Int, h: Int, fill: Int): Long =
    (for { y <- 0 until h; x <- 0 until w }
      yield 3L * ((fill + x + y) & 0xFF)).sum

  test("round trip matches the arithmetic gradient sum on many shapes") {
    for ((w, h, f) <- Seq((1, 1, 0), (1, 1, 7), (13, 7, 250), (64, 1, 0),
      (1, 64, 200), (40, 33, 128), (256, 2, 0))) {
      val i = rt(w, h, f)
      assert((i.width, i.height, i.channels) === (w, h, 3))
      assert(i.pixelSum === gradientSum(w, h, f),
        s"pixel sum mismatch at ${w}x$h fill=$f")
    }
  }

  test("hand-derived spec vector: 2x1 fill=10 is LUMA then DIFF") {
    val bytes = Multimodal.encodeQoi(2, 1, 10)
    // 14-byte header, then:
    //   (10,10,10) from (0,0,0): dg=10 -> LUMA 0x80|42=0xAA, 0x88
    //   (11,11,11): +1/+1/+1    -> DIFF 0x40|0x33|0x0C... = 0x7F
    val body = bytes.slice(14, bytes.length - 8).map(_ & 0xFF).toSeq
    assert(body === Seq(0xAA, 0x88, 0x7F))
    assert(Multimodal.parseQoi(bytes).get.pixelSum === 3 * 10 + 3 * 11)
  }

  test("a 1-wide column emits runs where the gradient repeats nothing " +
    "and a wide solid stretch compresses to RUN chunks") {
    // every anti-diagonal value is distinct down a 1-wide column
    // (v = fill+y), but a SOLID frame is almost all RUN: its payload
    // is tiny and decodes to the exact solid sum
    val grad = Multimodal.encodeQoi(1, 100, 0)
    assert(Multimodal.parseQoi(grad).get.pixelSum ===
      (0 until 100).map(y => 3L * (y & 0xFF)).sum)
    // solid frame: encode via the fixture's wrap (fill fixed, 1 row,
    // x varies -> NOT solid; instead decode a hand-built solid):
    // header + LUMA(first pixel 10) + RUN(61) + RUN(38) + end
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('q', 'o', 'i', 'f'))
    out.write(Array[Byte](0, 0, 0, 100)) // w=100
    out.write(Array[Byte](0, 0, 0, 1))   // h=1
    out.write(3); out.write(0)
    out.write(0xAA); out.write(0x88)     // (10,10,10) via LUMA
    out.write(0xC0 | 61)                 // run 62
    out.write(0xC0 | 36)                 // run 37 -> 1+62+37 = 100
    (1 to 7).foreach(_ => out.write(0)); out.write(1)
    val solid = Multimodal.parseQoi(out.toByteArray)
    assert(solid.get.pixelSum === 100L * 30)
    assert(solid.get.width === 100)
  }

  test("streaming decoder rejects malformed payloads with None, " +
    "never throws") {
    val good = Multimodal.encodeQoi(5, 4, 100)
    assert(Multimodal.parseQoi(good).isDefined)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'x'.toByte
    assert(Multimodal.parseQoi(badMagic).isEmpty)
    // truncated chunk stream
    assert(Multimodal.parseQoi(
      good.take(good.length - 12) ++ good.takeRight(8)).isEmpty)
    // corrupted end marker
    val badEnd = good.clone(); badEnd(badEnd.length - 1) = 0
    assert(Multimodal.parseQoi(badEnd).isEmpty)
    // run overrunning the pixel count
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('q', 'o', 'i', 'f'))
    out.write(Array[Byte](0, 0, 0, 2)); out.write(Array[Byte](0, 0, 0, 1))
    out.write(3); out.write(0)
    out.write(0xC0 | 61) // run 62 into a 2-pixel frame
    (1 to 7).foreach(_ => out.write(0)); out.write(1)
    assert(Multimodal.parseQoi(out.toByteArray).isEmpty)
    // absurd header dims are bounded before any work
    val bigDims = good.clone()
    bigDims(4) = 0x7F.toByte // width top byte -> ~2^31
    assert(Multimodal.parseQoi(bigDims).isEmpty)
    // not QOI at all
    assert(Multimodal.parseQoi(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseQoi(null).isEmpty)
  }

  test("RGBA chunks and the index op decode correctly") {
    // hand-build: px1 RGBA(1,2,3,4); px2 RGB(200,0,0);
    // px3 INDEX back to px1 (hash(1,2,3,4) = 3+10+21+44 = 78 % 64 = 14)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('q', 'o', 'i', 'f'))
    out.write(Array[Byte](0, 0, 0, 3)); out.write(Array[Byte](0, 0, 0, 1))
    out.write(4); out.write(0)
    out.write(0xFF); out.write(1); out.write(2); out.write(3); out.write(4)
    out.write(0xFE); out.write(200); out.write(0); out.write(0)
    out.write((1 * 3 + 2 * 5 + 3 * 7 + 4 * 11) % 64) // QOI_OP_INDEX
    (1 to 7).foreach(_ => out.write(0)); out.write(1)
    val i = Multimodal.parseQoi(out.toByteArray).get
    assert(i.channels === 4)
    assert(i.pixelSum === (1 + 2 + 3) + 200 + (1 + 2 + 3))
  }

  test("SQL surface: graft_qoi_encode/decode round-trip in spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_qoi_decode(graft_qoi_encode(3, 2, 5)) AS img""")
      .select("img.width", "img.height", "img.channels", "img.pixel_sum")
      .as[(Int, Int, Int, Long)].head()
    assert(r === ((3, 2, 3, gradientSum(3, 2, 5))))
  }
}
