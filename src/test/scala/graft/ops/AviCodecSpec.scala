package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal.AviCodec

/** Pins [[Multimodal.AviCodec]]'s synthesis↔decode contract (VERDICT
  * r13 item 5): the synthesized container genuinely round-trips through
  * the RIFF demux, the strided frame decode matches an independent
  * replay of the pixel law, the sampling SCHEDULE is what px_sum
  * proves (tampering a sampled frame changes it; tampering a skipped
  * frame does not), and malformed containers are rejected rather than
  * mis-decoded. */
class AviCodecSpec extends AnyFunSuite {

  private val lens = Seq(448, 449, 450, 451, 452, 453, 454, 455, 460,
    467, 480, 500, 512, 555, 577)

  test("synthesis round-trips through the parse at every length law " +
       "residue: dims, frame count, frame offsets") {
    for (len <- lens) {
      val p = AviCodec.synthesize(len)
      assert(p.length === len, s"len=$len: payload length")
      val Some((w, h, frames)) = AviCodec.parse(p)
      assert((w, h) === AviCodec.dims(len), s"len=$len dims")
      assert(frames.length === AviCodec.frameCount(len), s"len=$len n")
      // frame chunks tile the movi list contiguously from 224
      val fb = Multimodal.BmpCodec.rowSize(w) * h
      frames.zipWithIndex.foreach { case (off, i) =>
        assert(off === 224 + i * (8 + fb) + 8, s"len=$len frame $i")
      }
    }
  }

  test("stride-2 sample matches an independent replay of the pixel " +
       "law; stride 1 covers every frame; padding is excluded") {
    for (len <- lens) {
      val p = AviCodec.synthesize(len)
      val (w, h) = AviCodec.dims(len)
      val n = AviCodec.frameCount(len)
      val perFrame = (f: Int) =>
        (0 until 3 * w * h).map(j => ((f + j) % 16).toLong).sum
      val Some((n2, k2, idx2, px2)) = AviCodec.sampleFrames(p, 2)
      val sampled = 0 until n by 2
      assert(n2 === n.toLong && k2 === sampled.size.toLong)
      assert(idx2 === sampled.map(_.toLong).sum)
      assert(px2 === sampled.map(perFrame).sum, s"len=$len stride 2")
      val Some((_, k1, _, px1)) = AviCodec.sampleFrames(p, 1)
      assert(k1 === n.toLong)
      assert(px1 === (0 until n).map(perFrame).sum, s"len=$len stride 1")
      // a decoder that read the 0xFF row padding would overshoot
      val rs = Multimodal.BmpCodec.rowSize(w)
      if (rs > 3 * w) {
        val naive = sampled.map { f =>
          perFrame(f) + (rs - 3 * w).toLong * h * 0xFF
        }.sum
        assert(px2 < naive, s"len=$len: padding must be skipped")
      }
    }
  }

  test("px_sum proves the SCHEDULE: tampering a sampled frame's pixel " +
       "changes it, tampering a skipped frame's pixel does not") {
    val len = 500
    val p = AviCodec.synthesize(len)
    val (w, h) = AviCodec.dims(len)
    val fb = Multimodal.BmpCodec.rowSize(w) * h
    val Some((_, _, _, base)) = AviCodec.sampleFrames(p, 2)
    val hitSampled = p.clone()
    hitSampled(224 + 8) = (hitSampled(224 + 8) + 1).toByte // frame 0, j=0
    val Some((_, _, _, tampered)) = AviCodec.sampleFrames(hitSampled, 2)
    assert(tampered !== base)
    assert(AviCodec.frameCount(len) >= 2)
    val hitSkipped = p.clone()
    hitSkipped(224 + (8 + fb) + 8) =
      (hitSkipped(224 + (8 + fb) + 8) + 1).toByte // frame 1, j=0
    val Some((_, _, _, same)) = AviCodec.sampleFrames(hitSkipped, 2)
    assert(same === base)
  }

  test("motion energy matches a brute per-pixel |diff| replay of " +
       "adjacent frames") {
    for (len <- lens) {
      val p = AviCodec.synthesize(len)
      val (w, h) = AviCodec.dims(len)
      val n = AviCodec.frameCount(len)
      val pix = (f: Int) => (0 until 3 * w * h).map(j => (f + j) % 16)
      val brute = (0 until n - 1).map { f =>
        pix(f).zip(pix(f + 1)).map { case (x, y) => math.abs(x - y).toLong }.sum
      }.sum
      val Some((n2, w2, h2, pairs, motion)) = AviCodec.motionEnergy(p)
      assert(n2 === n.toLong && w2 === w.toLong && h2 === h.toLong)
      assert(pairs === (n - 1).toLong)
      assert(motion === brute, s"len=$len")
      // and the oracle's closed form agrees: P + 14*W(f) per pair
      val P = 3 * w * h
      val closed = (0 until n - 1).map { f =>
        val wf = if (15 - f < P) (P - 1 - (15 - f)) / 16 + 1 else 0
        (P + 14 * wf).toLong
      }.sum
      assert(motion === closed, s"len=$len closed form")
    }
  }

  test("malformed containers are rejected, never mis-decoded") {
    // other modalities' payloads
    assert(AviCodec.parse(Multimodal.WavCodec.synthesize(200)).isEmpty)
    assert(AviCodec.parse(Multimodal.WebpCodec.synthesize(100)).isEmpty)
    assert(AviCodec.parse(Multimodal.BmpCodec.synthesize(300)).isEmpty)
    assert(AviCodec.parse("not even RIFF at all, just some text padd"
      .getBytes("UTF-8")).isEmpty)
    // truncation below the fixed header region
    assert(AviCodec.parse(AviCodec.synthesize(500).take(200)).isEmpty)
    // frame-count header lying about the movi content
    val lie = AviCodec.synthesize(500).clone()
    lie(32 + 16) = (lie(32 + 16) + 1).toByte // dwTotalFrames += 1
    assert(AviCodec.parse(lie).isEmpty)
    // a non-video stream type
    val aud = AviCodec.synthesize(500).clone()
    aud(108 + 3) = 'a'.toByte // 'vids' -> 'vida'
    assert(AviCodec.parse(aud).isEmpty)
  }

  test("eligibility mirrors the oracle predicate (doc_id % 6 = 4, " +
       "L >= 448) and splits the old WAV class cleanly") {
    assert(AviCodec.eligible(4L, 448))
    assert(AviCodec.eligible(10L, 500))
    assert(!AviCodec.eligible(4L, 447))  // too small for the container
    assert(!AviCodec.eligible(1L, 500))  // the WAV half of % 3 = 1
    assert(!AviCodec.eligible(0L, 500))  // BMP class
    // worst-case synthesis actually fits the minimum
    for (len <- 448 to 470)
      assert(AviCodec.synthesize(len).length === len)
  }
}
