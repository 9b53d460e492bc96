package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The webp corner of the container plumbing: [[Multimodal.WebpCodec]]
  * must genuinely WALK the RIFF container and bit-unpack the VP8L
  * header — dims are REAL decode; pixels are the DECLARED boundary
  * (px_sum 0; the VP8L entropy stream is out of scope by contract,
  * see the WebpCodec docstring). */
class WebpCodecSpec extends AnyFunSuite {
  import Multimodal.WebpCodec

  test("synthesized payloads keep the exact requested length and decode " +
       "to the closed-form dims; px_sum is 0 by the declared boundary") {
    for (len <- Seq(64, 65, 99, 128, 255, 1024, 5000)) {
      val p = WebpCodec.synthesize(len)
      assert(p.length === len, s"len=$len")
      val Some((w, h, px)) = WebpCodec.decode(p)
      assert(w === 5L + len % 9, s"len=$len")
      assert(h === 4L + len % 7, s"len=$len")
      assert(px === 0L, s"len=$len")
    }
  }

  test("the decoder WALKS chunks: a foreign chunk before VP8L is " +
       "skipped (even-padded advance), not fatal") {
    val out = new Array[Byte](12 + 8 + 6 + 8 + 6)
    def put4(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte
      out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    put4(0, "RIFF"); le32(4, out.length - 8); put4(8, "WEBP")
    put4(12, "XTRA"); le32(16, 5) // odd size: the walk must pad to 6
    put4(26, "VP8L"); le32(30, 5)
    out(34) = 0x2F
    le32(35, (17 - 1) | ((9 - 1) << 14)) // width 17, height 9
    val Some((w, h, _)) = WebpCodec.decode(out)
    assert(w === 17L && h === 9L)
  }

  test("header bits are genuinely unpacked: flipping the low width bit " +
       "changes the decoded width, corrupting the signature rejects") {
    val p = WebpCodec.synthesize(200)
    val Some((w0, _, _)) = WebpCodec.decode(p)
    val t = p.clone()
    t(21) = (t(21) ^ 0x01).toByte // LSB of width-1 in the VP8L header
    val Some((w1, _, _)) = WebpCodec.decode(t)
    assert(w1 !== w0)
    val sig = p.clone()
    sig(20) = 0x00 // not the 0x2F VP8L signature
    assert(WebpCodec.decode(sig).isEmpty)
  }

  test("non-webp payloads are rejected (including other RIFF containers)") {
    assert(WebpCodec.decode("plain text, no container".getBytes("UTF-8")).isEmpty)
    // a RIFF that is a WAV, not a WEBP
    assert(WebpCodec.decode(Multimodal.WavCodec.synthesize(200)).isEmpty)
    assert(WebpCodec.decode(WebpCodec.synthesize(100).take(20)).isEmpty)
  }

  test("eligibility mirrors the oracle predicate (doc_id % 12 = 11, " +
       "L >= 64) and never overlaps the other codecs") {
    assert(WebpCodec.eligible(11L, 64))
    assert(WebpCodec.eligible(23L, 64))
    assert(!WebpCodec.eligible(11L, 63)) // too small for the container
    assert(!WebpCodec.eligible(5L, 500)) // the JPEG quarter
    for (id <- 0L to 24L; len <- Seq(64, 200, 280, 448, 500)) {
      val picks = Seq(
        Multimodal.BmpCodec.eligible(id, len),
        Multimodal.WavCodec.eligible(id, len),
        Multimodal.AviCodec.eligible(id, len),
        Multimodal.PngCodec.eligible(id, len),
        Multimodal.JpegCodec.eligible(id, len),
        WebpCodec.eligible(id, len)).count(identity)
      assert(picks <= 1, s"id=$id len=$len")
    }
  }
}
