package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The audio half of the real-decode plumbing: [[Multimodal.WavCodec]]
  * must genuinely WALK RIFF chunks and decode signed little-endian PCM16
  * samples — not recompute the closed form the m11 oracle uses. These
  * tests prove that by feeding it chunk layouts and sample bytes the
  * closed form knows nothing about. */
class WavCodecSpec extends AnyFunSuite {
  import Multimodal.WavCodec

  private def put32(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = v.toByte; a(off + 1) = (v >> 8).toByte
    a(off + 2) = (v >> 16).toByte; a(off + 3) = (v >> 24).toByte
  }
  private def put16(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = v.toByte; a(off + 1) = (v >> 8).toByte
  }
  private def tag(a: Array[Byte], off: Int, s: String): Unit =
    s.indices.foreach(i => a(off + i) = s.charAt(i).toByte)

  test("a hand-built WAV with an EXTRA chunk before data decodes by " +
       "walking chunks, summing |signed LE samples|") {
    // RIFF | fmt (16) | LIST junk chunk (5 bytes, odd → even-padded) |
    // data with 3 samples: 1000, -2000, -32768. A parser that assumed
    // data at offset 36 (or unsigned/big-endian samples) fails this.
    val junk = 5
    val len = 12 + 24 + 8 + junk + 1 + 8 + 6
    val buf = new Array[Byte](len)
    tag(buf, 0, "RIFF"); put32(buf, 4, len - 8); tag(buf, 8, "WAVE")
    tag(buf, 12, "fmt "); put32(buf, 16, 16)
    put16(buf, 20, 1); put16(buf, 22, 2); put32(buf, 24, 44100)
    put32(buf, 28, 44100 * 4); put16(buf, 32, 4); put16(buf, 34, 16)
    tag(buf, 36, "LIST"); put32(buf, 40, junk)
    val dataOff = 36 + 8 + junk + 1 // odd junk chunk is even-padded
    tag(buf, dataOff, "data"); put32(buf, dataOff + 4, 6)
    put16(buf, dataOff + 8, 1000)
    put16(buf, dataOff + 10, -2000 & 0xFFFF)
    put16(buf, dataOff + 12, -32768 & 0xFFFF)
    val Some((rate, ch, n, amp)) = WavCodec.decode(buf)
    assert(rate === 44100L && ch === 2L && n === 3L)
    assert(amp === 1000L + 2000L + 32768L)
  }

  test("a tampered data-chunk size changes the decode (parser reads bytes)") {
    val payload = WavCodec.synthesize(300)
    val Some((_, _, n0, s0)) = WavCodec.decode(payload)
    val tampered = payload.clone()
    put32(tampered, 40, (n0.toInt - 2) * 2) // declare 2 fewer samples
    val Some((_, _, n1, s1)) = WavCodec.decode(tampered)
    assert(n1 === n0 - 2)
    assert(s1 !== s0)
  }

  test("synthesized payloads keep the exact requested length and decode " +
       "to the closed-form amplitude sum") {
    for (len <- Seq(64, 65, 244, 445, 1001, 4489)) {
      val payload = WavCodec.synthesize(len)
      assert(payload.length === len)
      val Some((rate, ch, n, amp)) = WavCodec.decode(payload)
      assert(rate === 8000L + len % 4000)
      assert(ch === 1L + len % 2)
      assert(n === (len - 44) / 2)
      // brute-force reconstruction of the sample pattern, independent of
      // the oracle's telescoped form
      val brute = (0L until n).map(j => math.abs((j % 200) - 100)).sum
      assert(amp === brute)
      // and the oracle's closed form agrees with the brute sum
      val rem = n % 200
      val partial =
        if (rem <= 100) 100 * rem - rem * (rem - 1) / 2
        else 5050 + (rem - 101) * (rem - 100) / 2
      assert(amp === (n / 200) * 10000 + partial)
    }
  }

  test("property: synthesize∘decode round-trips the closed form for " +
       "generated lengths across the parity/period boundaries") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val generated = Gen.listOfN(200, Gen.choose(64, 6000))
      .apply(Gen.Parameters.default, Seed(11L)).get
    val cases = generated ++
      Seq(64, 65, 443, 444, 4043, 4044) // 200-sample period + parity edges
    cases.foreach { len =>
      val p = WavCodec.synthesize(len)
      assert(p.length === len)
      val Some((rate, ch, n, amp)) = WavCodec.decode(p)
      assert(rate === 8000L + len % 4000, s"len=$len")
      assert(ch === 1L + len % 2, s"len=$len")
      assert(n === (len - 44) / 2, s"len=$len")
      val rem = n % 200
      val partial =
        if (rem <= 100) 100 * rem - rem * (rem - 1) / 2
        else 5050 + (rem - 101) * (rem - 100) / 2
      assert(amp === (n / 200) * 10000 + partial, s"len=$len")
    }
  }

  test("energy stats decode real samples: silence threshold, Σ s², peak") {
    // hand-built WAV with samples the closed form knows nothing about:
    // 1000, -2000, -32768, 9, -9, 10 → silent(|s|<10) = 2, peak = 32768
    val samples = Seq(1000, -2000, -32768, 9, -9, 10)
    val len = 44 + 2 * samples.length
    val buf = new Array[Byte](len)
    tag(buf, 0, "RIFF"); put32(buf, 4, len - 8); tag(buf, 8, "WAVE")
    tag(buf, 12, "fmt "); put32(buf, 16, 16)
    put16(buf, 20, 1); put16(buf, 22, 1); put32(buf, 24, 16000)
    put32(buf, 28, 16000 * 2); put16(buf, 32, 2); put16(buf, 34, 16)
    tag(buf, 36, "data"); put32(buf, 40, 2 * samples.length)
    samples.zipWithIndex.foreach { case (s, j) => put16(buf, 44 + 2 * j, s & 0xFFFF) }
    val Some((rate, ch, n, silent, sq, peak)) = WavCodec.energy(buf, 10)
    assert(rate === 16000L && ch === 1L && n === samples.length.toLong)
    assert(silent === samples.count(s => math.abs(s) < 10).toLong)
    assert(sq === samples.map(s => s.toLong * s).sum)
    assert(peak === 32768L)
  }

  test("property: energy on synthesized payloads ≡ brute per-sample AND " +
       "the oracle's telescoped closed forms") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sqPyramid(x: Long): Long = x * (x + 1) * (2 * x + 1) / 6
    val generated = Gen.listOfN(150, Gen.choose(64, 6000))
      .apply(Gen.Parameters.default, Seed(13L)).get
    (generated ++ Seq(64, 226, 244, 245, 262, 263, 444, 644)).foreach { len =>
      val p = WavCodec.synthesize(len)
      val Some((_, _, n, silent, sq, peak)) = WavCodec.energy(p, 10)
      val pat = (0L until n).map(j => (j % 200) - 100)
      assert(silent === pat.count(s => math.abs(s) < 10).toLong, s"len=$len")
      assert(sq === pat.map(s => s * s).sum, s"len=$len")
      assert(peak === (if (n > 0) 100L else 0L), s"len=$len")
      // the m13 oracle's closed forms
      val (f, r) = (n / 200, n % 200)
      assert(silent === f * 19 + math.max(0L, math.min(r, 110) - 91), s"len=$len")
      val rem =
        if (r <= 100) 338350L - sqPyramid(100 - r)
        else 338350L + sqPyramid(r - 101)
      assert(sq === f * 666700L + rem, s"len=$len")
    }
  }

  test("m14 decimation: k=1 is the identity of the full decode, k=4 " +
       "keeps whole frames (all channels), and a brute strided recompute " +
       "agrees on synthesized payloads of both channel widths") {
    // even lengths → mono, odd → stereo (channels = 1 + L%2)
    Seq(64, 101, 226, 245, 444, 1001, 2000).foreach { len =>
      val p = WavCodec.synthesize(len)
      val Some((rate, c, n, amp)) =
        WavCodec.decode(p).map(d => (d._1, d._2, d._3, d._4))
      // k=1 keeps everything: identity with the full decode
      val Some((_, _, _, kept1, sum1)) = WavCodec.decimate(p, 1)
      assert(kept1 === n && sum1 === amp, s"len=$len k=1")
      // k=4: brute strided recompute from the synthesis law
      val Some((r4, c4, n4, kept4, sum4)) = WavCodec.decimate(p, 4)
      assert(r4 === rate && c4 === c && n4 === n)
      val pat = (0L until n).map(j => ((j % 200) - 100, (j / c) % 4 == 0))
      assert(kept4 === pat.count(_._2).toLong, s"len=$len kept")
      assert(sum4 === pat.collect { case (s, true) => math.abs(s) }.sum,
        s"len=$len amp")
      // whole frames: the kept count is channels × ceil(frames/4) when
      // the final frame is complete
      if (n % c == 0) {
        val frames = n / c
        assert(kept4 === c * ((frames + 3) / 4), s"len=$len frame count")
      }
    }
  }

  test("non-WAV and non-PCM16 payloads are rejected") {
    assert(WavCodec.decode("RIFFxxxxWAVE but then garbage".getBytes("UTF-8")).isEmpty)
    assert(WavCodec.decode("plain text, no RIFF header here at all ok"
      .getBytes("UTF-8")).isEmpty)
    val f32 = WavCodec.synthesize(200).clone()
    put16(f32, 20, 3) // IEEE-float format code
    assert(WavCodec.decode(f32).isEmpty)
    val trunc = WavCodec.synthesize(200).take(40)
    assert(WavCodec.decode(trunc).isEmpty)
  }

  test("eligibility mirrors the oracle predicate and never overlaps " +
       "BMP or AVI") {
    assert(WavCodec.eligible(1L, 64))
    assert(!WavCodec.eligible(0L, 500))  // doc_id % 3 != 1 (BMP class)
    assert(!WavCodec.eligible(4L, 500))  // the AVI half of % 3 = 1 (r14)
    assert(!WavCodec.eligible(1L, 63))   // too small to hold a WAV
    for (id <- 0L to 12L; len <- Seq(64, 200, 448, 500)) {
      assert(!(WavCodec.eligible(id, len) && Multimodal.BmpCodec.eligible(id, len)))
      assert(!(WavCodec.eligible(id, len) && Multimodal.AviCodec.eligible(id, len)))
    }
  }

  test("mediaTable payload length always equals the raw text byte length") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      val bad = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
        .join(graft.Tables.documents(spark, "/root/testdata/sf0.001"), Seq("doc_id"))
        .filter(length(col("media")) =!= octet_length(col("text")))
        .count()
      assert(bad === 0L)
    } finally spark.stop()
  }
}
