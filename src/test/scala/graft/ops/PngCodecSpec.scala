package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The compressed-image third of the real-decode plumbing:
  * [[Multimodal.PngCodec]] must genuinely INFLATE and defilter the PNG
  * pixel stream via ImageIO — not recompute the closed form the m01
  * oracle uses. These tests prove that by feeding it pixel bytes and
  * container layouts the closed form knows nothing about. */
class PngCodecSpec extends AnyFunSuite {
  import Multimodal.PngCodec

  test("synthesized payloads keep the exact requested length and decode " +
       "to the closed-form dims and pixel sum") {
    for (len <- Seq(280, 281, 283, 397, 1024, 5000)) {
      val payload = PngCodec.synthesize(len)
      assert(payload.length === len)
      val Some((w, h, px)) = PngCodec.decode(payload)
      assert(w === 4L + len % 6, s"len=$len")
      assert(h === 4L + len % 4, s"len=$len")
      // brute-force reconstruction of the scanline pattern, independent
      // of the oracle's telescoped row-sum form
      val brute = h * (0L until 3 * w).map(_ % 16).sum
      assert(px === brute, s"len=$len")
      // and the oracle's closed form agrees with the brute sum
      val m = (3 * w).toInt; val r = m % 16
      assert(px === h * (m / 16 * 120L + r.toLong * (r - 1) / 2), s"len=$len")
    }
  }

  test("an ImageIO-encoded PNG (compressor-chosen deflate, arbitrary " +
       "pixels) decodes to the true pixel sum — the reader inflates real " +
       "deflate data, not our stored blocks only") {
    val img = new java.awt.image.BufferedImage(
      5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var expected = 0L
    for (y <- 0 until 3; x <- 0 until 5) {
      val (rr, gg, bb) = (x * 40 + y, 255 - x * 30, (x * y * 7) % 256)
      img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
      expected += rr + gg + bb
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, px)) = PngCodec.decode(bos.toByteArray)
    assert(w === 5L && h === 3L)
    assert(px === expected)
  }

  test("a tampered IDAT byte breaks the decode (the reader checksums " +
       "and inflates real bytes)") {
    val payload = PngCodec.synthesize(400)
    val Some((_, _, px0)) = PngCodec.decode(payload)
    // flip one pixel byte inside the stored deflate block: 8 (sig) + 25
    // (IHDR) + 8 (IDAT len+type) + 7 (zlib+stored hdr) + 1 (filter byte)
    // is the first pixel byte of row 0
    val tampered = payload.clone()
    tampered(8 + 25 + 8 + 7 + 1) = 9
    PngCodec.decode(tampered) match {
      case Some((_, _, px1)) => assert(px1 !== px0) // reader ignored the CRC
      case None              => succeed             // reader enforced the CRC
    }
  }

  test("non-PNG payloads and truncated streams are rejected") {
    assert(PngCodec.decode("plain text, no PNG signature".getBytes("UTF-8")).isEmpty)
    assert(PngCodec.decode(Array[Byte](0x89.toByte, 'P', 'N')).isEmpty)
    val trunc = PngCodec.synthesize(300).take(40)
    assert(PngCodec.decode(trunc).isEmpty)
  }

  test("eligibility mirrors the oracle predicate and never overlaps " +
       "BMP or WAV") {
    assert(PngCodec.eligible(2L, 280))
    assert(!PngCodec.eligible(0L, 500))  // BMP residue class
    assert(!PngCodec.eligible(1L, 500))  // WAV residue class
    assert(!PngCodec.eligible(2L, 279))  // too small to hold the container
    for (id <- 0L to 12L; len <- Seq(64, 200, 280, 500)) {
      val picks = Seq(
        Multimodal.BmpCodec.eligible(id, len),
        Multimodal.WavCodec.eligible(id, len),
        PngCodec.eligible(id, len)).count(identity)
      assert(picks <= 1, s"id=$id len=$len")
    }
  }
}
