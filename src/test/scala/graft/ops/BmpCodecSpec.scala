package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The real-decode half of the multimodal plumbing (VERDICT r7 item 5):
  * [[Multimodal.BmpCodec]] must genuinely PARSE the payload — header
  * fields little-endian, stride-aware padded pixel walk — not recompute
  * the closed form the oracle uses. These tests prove that by feeding it
  * bytes the closed form knows nothing about. */
class BmpCodecSpec extends AnyFunSuite {
  import Multimodal.{BmpCodec, DecodeStub, MediaRow}

  test("a hand-built 2x2 BMP decodes to its header dims and pixel sum") {
    // 2x2, 24bpp: rowSize = 8 (6 pixel bytes + 2 padding). Pixel bytes
    // chosen arbitrarily; padding set to 0x7F — a decoder that sums the
    // raw area instead of walking 3*w per row returns 510 + 254, not 510.
    val w = 2; val h = 2; val rs = 8
    val buf = new Array[Byte](54 + rs * h)
    buf(0) = 'B'; buf(1) = 'M'
    def put(off: Int, v: Int): Unit = {
      buf(off) = v.toByte; buf(off + 1) = (v >> 8).toByte
      buf(off + 2) = (v >> 16).toByte; buf(off + 3) = (v >> 24).toByte
    }
    put(2, buf.length); put(10, 54); put(14, 40); put(18, w); put(22, h)
    buf(26) = 1; buf(28) = 24
    val px = Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    var i = 0
    for (r <- 0 until h; j <- 0 until rs)
      buf(54 + r * rs + j) =
        if (j < 3 * w) { val v = px(i); i += 1; v.toByte }
        else 0x7F.toByte
    val Some((dw, dh, sum)) = BmpCodec.decode(buf)
    assert(dw === 2L && dh === 2L)
    assert(sum === px.sum.toLong) // padding bytes NOT summed
  }

  test("a tampered header width changes the decode (parser reads bytes)") {
    val payload = BmpCodec.synthesize(300)
    val Some((w0, h0, s0)) = BmpCodec.decode(payload)
    assert((w0.toInt, h0.toInt) === BmpCodec.dims(300))
    // shrink the declared width by 1: the parser must follow the header,
    // walking a different stride and pixel count
    val tampered = payload.clone()
    tampered(18) = (w0 - 1).toByte
    val Some((w1, _, s1)) = BmpCodec.decode(tampered)
    assert(w1 === w0 - 1)
    assert(s1 !== s0)
  }

  test("synthesized payloads keep the exact requested length and decode " +
       "to the closed-form pixel sum") {
    for (len <- Seq(200, 201, 257, 350, 577)) {
      val payload = BmpCodec.synthesize(len)
      assert(payload.length === len)
      val (w, h) = BmpCodec.dims(len)
      val Some((dw, dh, sum)) = BmpCodec.decode(payload)
      assert((dw.toInt, dh.toInt) === ((w, h)))
      // per-row pixel byte j is j%16: sum = h * ((3w/16)*120 + rem*(rem-1)/2)
      val lr = 3 * w; val rem = lr % 16
      assert(sum === h.toLong * (lr / 16 * 120 + rem * (rem - 1) / 2))
    }
  }

  test("non-BMP payloads fall back to the stub (px_sum 0)") {
    val text = "BMx this is text, not a bitmap header ".padTo(100, 'x')
    assert(BmpCodec.decode(text.getBytes("UTF-8")).isEmpty)
    val meta = Multimodal.decodeRow(
      MediaRow(7L, text.getBytes("UTF-8"), text.length.toLong))
    assert(meta === DecodeStub.decode(
      MediaRow(7L, text.getBytes("UTF-8"), text.length.toLong)))
    assert(meta.px_sum === 0L)
  }

  test("eligibility mirrors the oracle predicate") {
    assert(BmpCodec.eligible(0L, 200))
    assert(!BmpCodec.eligible(1L, 500))   // doc_id % 3 != 0
    assert(!BmpCodec.eligible(3L, 199))   // too small to hold a BMP
  }
}
