package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class PixelsSpec extends AnyFunSuite {

  // deterministic 16x16 test image with smooth gradients + a block
  private def testImage(seed: Int): Pixels.Decoded = {
    val argb = Array.tabulate(256) { i =>
      val x = i % 16; val y = i / 16
      val r = (x * 16 + seed) & 0xff
      val g = (y * 16) & 0xff
      val b = if (x >= 4 && x < 12 && y >= 4 && y < 12) 200 else 30
      0xff000000 | (r << 16) | (g << 8) | b
    }
    Pixels.Decoded(16, 16, argb)
  }

  test("PNG round-trip is lossless: PSNR = infinity, identical pixels") {
    val img = testImage(0)
    val back = Pixels.decode(Pixels.encodePng(img)).get
    assert(back.w == 16 && back.h == 16)
    assert(back.argb.sameElements(img.argb))
    assert(Pixels.psnrDb(img, back).isPosInfinity)
  }

  test("JPEG round-trip is lossy but meets the north-rule allclose bar (PSNR >= 40 dB)") {
    // smooth near-gray gradient — the regime where the >=40 dB invariant is
    // meaningful (sharp saturated edges lose more to chroma subsampling,
    // which the monotonicity test below covers)
    val smooth = Pixels.Decoded(16, 16, Array.tabulate(256) { i =>
      val v = 100 + (i % 16) * 3
      0xff000000 | (v << 16) | ((v + 2) << 8) | (v - 2)
    })
    val back = Pixels.decode(Pixels.encodeJpeg(smooth, quality = 0.95f)).get
    val psnr = Pixels.psnrDb(smooth, back)
    assert(psnr.isPosInfinity || psnr >= 40.0, s"psnr=$psnr")
  }

  test("undecodable payloads return None (webp magic, junk, null, truncated)") {
    assert(Pixels.decode("RIFF0000WEBPjunkjunk".getBytes).isEmpty)
    assert(Pixels.decode(Array[Byte](0x4d, 0x5a, 1, 2, 3)).isEmpty)
    assert(Pixels.decode(null).isEmpty)
    assert(Pixels.decode(Array[Byte](0x42)).isEmpty)
  }

  test("area resize preserves means; aHash is stable under lossless round-trip and local under noise") {
    val img = testImage(0)
    val small = Pixels.resize(img, 4, 4)
    assert(small.w == 4 && small.h == 4)
    val h1 = Pixels.aHash64(img)
    assert(Pixels.aHash64(Pixels.decode(Pixels.encodePng(img)).get) == h1)
    // lossy re-encode: small hamming distance
    val hJpeg = Pixels.aHash64(Pixels.decode(Pixels.encodeJpeg(img, 0.9f)).get)
    assert(java.lang.Long.bitCount(h1 ^ hJpeg) <= 6)
    // a different image: large hamming distance
    val other = testImage(0)
    val inverted = Pixels.Decoded(16, 16, other.argb.map(p => 0xff000000 | (~p & 0xffffff)))
    assert(java.lang.Long.bitCount(h1 ^ Pixels.aHash64(inverted)) >= 20)
  }

  test("psnr requires equal dimensions and measures degradation monotonically") {
    val img = testImage(0)
    intercept[IllegalArgumentException](Pixels.psnrDb(img, Pixels.resize(img, 8, 8)))
    val q95 = Pixels.psnrDb(img, Pixels.decode(Pixels.encodeJpeg(img, 0.95f)).get)
    val q30 = Pixels.psnrDb(img, Pixels.decode(Pixels.encodeJpeg(img, 0.30f)).get)
    assert(q30 < q95, s"q30=$q30 q95=$q95")
  }
}
