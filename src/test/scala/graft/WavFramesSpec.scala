package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Per-frame audio features over decoded PCM: framing grid, exact
  * energy / peak / zero-crossing integers, and the not-a-WAV fallback.
  */
class WavFramesSpec extends SparkTestBase {
  import spark.implicits._

  /** Straight-line reference over the encode ramp. */
  private def refFrames(channels: Int, frames: Int, seed: Int,
      frameLen: Int, hop: Int): Seq[(Int, Long, Int, Int)] = {
    val n = channels * frames
    val samples = (0 until n).map(k => ((seed + k) % 65536) - 32768)
    val nF = if (n < frameLen) 0 else (n - frameLen) / hop + 1
    (0 until nF).map { f =>
      val w = samples.slice(f * hop, f * hop + frameLen)
      val zc = w.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      (f, w.map(s => s.toLong * s).sum, w.map(math.abs).max, zc)
    }
  }

  private def frames(payload: Array[Byte], frameLen: Int, hop: Int) =
    Seq(Tuple1(payload)).toDF("payload")
      .select(explode(Multimodal.wavFrames(col("payload"), frameLen, hop))
        .as("fr"))
      .select("fr.frame_idx", "fr.energy", "fr.peak", "fr.zero_cross")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSeq

  test("frames match the straight-line reference across shapes") {
    for ((ch, fr, seed) <- Seq((1, 40, 7), (2, 33, 65500), (1, 16, 32760),
        (3, 21, 123))) {
      val got = frames(Multimodal.encodeWav(ch, 8000, fr, seed), 16, 8)
      assert(got === refFrames(ch, fr, seed, 16, 8),
        s"channels=$ch frames=$fr seed=$seed")
    }
  }

  test("seed near the wrap exercises the sign boundary inside a frame") {
    // seed 32760: samples 32760..32767 then wrap to -32768 — exactly one
    // sign change (positive ramp -> negative wrap) inside the stream
    val got = frames(Multimodal.encodeWav(1, 8000, 16, 32760 + 32768), 16, 16)
    assert(got.size === 1)
    assert(got.head._4 === 1, "one zero crossing at the 16-bit wrap")
    assert(got.head._3 === 32768, "peak |s| reaches the -32768 sample")
  }

  test("payload shorter than a frame yields an empty array, not null") {
    val out = Seq(Tuple1(Multimodal.encodeWav(1, 8000, 4, 1)))
      .toDF("payload")
      .select(Multimodal.wavFrames(col("payload"), 16, 8).as("fr"))
      .collect().head
    assert(!out.isNullAt(0) &&
      out.getAs[scala.collection.Seq[Any]]("fr").isEmpty)
  }

  test("hop < frameLen overlaps; trailing partial frame is dropped") {
    // 20 samples, frame 16 hop 2: starts 0,2,4 fit (4+16=20); start 6 not
    val got = frames(Multimodal.encodeWav(1, 8000, 20, 0), 16, 2)
    assert(got.map(_._1) === Seq(0, 1, 2))
  }

  test("non-WAV payloads route to null") {
    val out = Seq(Tuple1("not audio".getBytes("UTF-8"))).toDF("payload")
      .select(Multimodal.wavFrames(col("payload"), 16, 8).as("fr"))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("frame parameters are validated") {
    intercept[IllegalArgumentException] {
      Multimodal.wavFrames(col("payload"), 1, 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.wavFrames(col("payload"), 16, 17)
    }
  }
}
