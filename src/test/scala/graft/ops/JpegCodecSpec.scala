package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The lossy-image quarter of the real-decode plumbing:
  * [[Multimodal.JpegCodec]] must genuinely Huffman-decode, dequantize,
  * and IDCT the JPEG scan via ImageIO — not recompute the closed form
  * the m01 oracle uses. Lossy format, byte-exact oracle: the synthesized
  * block is uniform, so its DCT is DC-only and the all-ones quant table
  * makes the decode bit-exact (see the JpegCodec docstring). */
class JpegCodecSpec extends AnyFunSuite {
  import Multimodal.JpegCodec

  test("synthesized payloads keep the exact requested length and decode " +
       "to the closed-form dims and pixel sum") {
    for (len <- Seq(200, 201, 203, 255, 256, 257, 397, 1024, 5000)) {
      val payload = JpegCodec.synthesize(len)
      assert(payload.length === len, s"len=$len")
      val Some((w, h, px)) = JpegCodec.decode(payload)
      assert(w === 3L + len % 6, s"len=$len")
      assert(h === 3L + len % 4, s"len=$len")
      // DC-exactness: every decoded sample is the uniform gray value
      assert(px === w * h * (len % 256), s"len=$len")
    }
  }

  test("an ImageIO-encoded JPEG (its own tables and entropy stream, " +
       "multi-block, color) decodes through the same reader — the " +
       "decode path is a real JPEG pipeline, not our one-block layout " +
       "only") {
    val img = new java.awt.image.BufferedImage(
      24, 17, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 24) {
      val g = (x * 10 + y * 3) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val Some((w, h, px)) = JpegCodec.decode(bos.toByteArray)
    assert(w === 24L && h === 17L)
    // lossy content — assert plausibility, not equality: the mean must
    // land near the true mean (the reader really decoded pixel data)
    val trueSum = (for (y <- 0 until 17; x <- 0 until 24)
      yield 3L * ((x * 10 + y * 3) % 256)).sum
    assert(math.abs(px - trueSum) < trueSum / 5,
      s"decoded sum $px too far from true $trueSum")
  }

  test("a tampered entropy byte changes or breaks the decode (the " +
       "reader consumes real entropy-coded data)") {
    val payload = JpegCodec.synthesize(400)
    val Some((_, _, px0)) = JpegCodec.decode(payload)
    // the entropy data sits between SOS payload and EOI: flip the byte
    // 3 before EOI (inside the scan for every synthesized layout)
    val tampered = payload.clone()
    val i = payload.length - 3
    tampered(i) = (tampered(i) ^ 0x55).toByte
    JpegCodec.decode(tampered) match {
      case Some((_, _, px1)) => assert(px1 !== px0)
      case None              => succeed
    }
  }

  test("non-JPEG payloads and truncated streams are rejected") {
    assert(JpegCodec.decode("plain text, no JPEG signature".getBytes("UTF-8")).isEmpty)
    assert(JpegCodec.decode(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    val trunc = JpegCodec.synthesize(300).take(40)
    assert(JpegCodec.decode(trunc).isEmpty)
  }

  test("eligibility mirrors the oracle predicate and never overlaps " +
       "BMP, WAV, or PNG") {
    assert(JpegCodec.eligible(5L, 200))
    assert(!JpegCodec.eligible(2L, 500))  // PNG residue class
    assert(!JpegCodec.eligible(0L, 500))  // BMP residue class
    assert(!JpegCodec.eligible(1L, 500))  // WAV residue class
    assert(!JpegCodec.eligible(5L, 199))  // too small for the container
    for (id <- 0L to 12L; len <- Seq(64, 200, 280, 500)) {
      val picks = Seq(
        Multimodal.BmpCodec.eligible(id, len),
        Multimodal.WavCodec.eligible(id, len),
        Multimodal.PngCodec.eligible(id, len),
        JpegCodec.eligible(id, len)).count(identity)
      assert(picks <= 1, s"id=$id len=$len")
    }
  }
}
