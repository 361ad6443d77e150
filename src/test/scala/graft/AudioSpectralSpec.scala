package graft

import graft.operators.{Audio, Multimodal}

/** FFT correctness (vs a naive DFT, Parseval, impulse/constant
  * signals) and the spectral-feature contract over real WAV bytes. */
class AudioSpectralSpec extends SparkSpec {
  import spark.implicits._

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; i <- 0 until n) {
      val a = -2.0 * math.Pi * k * i / n
      re(k) += x(i) * math.cos(a)
      im(k) += x(i) * math.sin(a)
    }
    (re, im)
  }

  test("fft matches a naive DFT on deterministic pseudo-random input") {
    val x = Array.tabulate(64)(i => ((i * 2654435761L) % 1000).toDouble - 500)
    val re = x.clone(); val im = new Array[Double](64)
    Audio.fft(re, im)
    val (er, ei) = naiveDft(x)
    for (k <- 0 until 64) {
      assert(math.abs(re(k) - er(k)) < 1e-6, s"re bin $k")
      assert(math.abs(im(k) - ei(k)) < 1e-6, s"im bin $k")
    }
  }

  test("fft: impulse is flat, constant is DC-only, Parseval holds") {
    val imp = new Array[Double](32); imp(0) = 1.0
    val m1 = Audio.magnitudes(imp)
    assert(m1.forall(v => math.abs(v - 1.0) < 1e-9))

    val const = Array.fill(32)(3.0)
    val m2 = Audio.magnitudes(const)
    assert(math.abs(m2(0) - 96.0) < 1e-9 &&
      m2.drop(1).forall(v => math.abs(v) < 1e-9))

    val x = Array.tabulate(128)(i => math.sin(0.37 * i) + 0.2 * i)
    val re = x.clone(); val im = new Array[Double](128)
    Audio.fft(re, im)
    val t = x.map(v => v * v).sum
    val f = (0 until 128).map(k => re(k) * re(k) + im(k) * im(k)).sum / 128
    assert(math.abs(t - f) / t < 1e-12, "Parseval")
  }

  test("spectralFeatures: bin-centered tone lands on its exact bin") {
    val media = Seq(5, 31, 97).map { k =>
      val n = 512 // two windows
      val payload = new Array[Byte](2 * n)
      for (i <- 0 until n) {
        val v = math.round(9000.0 *
          math.sin(2.0 * math.Pi * k * (i % 256) / 256.0)).toInt
        payload(2 * i) = v.toByte
        payload(2 * i + 1) = (v >> 8).toByte
      }
      Multimodal.MediaRecord(k.toLong, "audio",
        Multimodal.wavBytes(1, 8000, payload),
        Multimodal.MediaMeta(1, 8000, "pcm_s16le", 1))
    }.toDS()
    val got = Audio.spectralFeatures(media, 256).collect()
      .map(r => r.doc_id -> ((r.dominant_bin, r.dominant_band, r.n_windows)))
      .toMap
    assert(got(5L) == ((5, 0, 2L)))
    assert(got(31L) == ((31, 0, 2L)))
    assert(got(97L) == ((97, 3, 2L)))
  }

  test("spectralFeatures: sub-window and non-PCM records drop") {
    val short = Multimodal.MediaRecord(1L, "audio",
      Multimodal.wavBytes(1, 8000, new Array[Byte](100)), // 50 samples < 256
      Multimodal.MediaMeta(1, 8000, "pcm_s16le", 1))
    val junk = Multimodal.MediaRecord(2L, "audio",
      Array[Byte](1, 2, 3, 4), Multimodal.MediaMeta(0, 0, "?", 0))
    val got = Audio.spectralFeatures(Seq(short, junk).toDS(), 256).collect()
    assert(got.isEmpty)
  }

  test("linearToUlaw inverts ulawToLinear on every companded byte") {
    // round-trip identity over the full 8-bit code space pins the
    // encoder to the decoder (and both to the G.711 tables)
    for (b <- 0 until 256) {
      val lin = Multimodal.ulawToLinear(b)
      val back = Multimodal.linearToUlaw(lin)
      // 0x7f and 0xff both decode to 0 (±0 codes); encoding 0 picks 0xff
      if (b == 0x7f) assert(back == 0xff)
      else assert(back == b, f"byte 0x$b%02x -> $lin -> 0x$back%02x")
    }
  }

  test("spectralSignature: PCM and its mu-law re-encode agree per " +
      "window; bytes differ; trailing partial window dropped") {
    // 2 windows of bin-centered tones (bins 11 then 40) + 100 trailing
    // samples that must not produce a third window
    val n = 2 * 256 + 100
    val pcm = Array.tabulate(n) { i =>
      val k = if (i < 256) 11 else 40
      math.round(12000.0 * math.sin(2.0 * math.Pi * k * (i % 256) / 256.0)).toShort
    }
    val pcmBytes = new Array[Byte](2 * n)
    val muBytes = new Array[Byte](n)
    for (i <- 0 until n) {
      pcmBytes(2 * i) = pcm(i).toByte
      pcmBytes(2 * i + 1) = (pcm(i) >> 8).toByte
      muBytes(i) = Multimodal.linearToUlaw(pcm(i).toInt).toByte
    }
    val media = Seq(
      Multimodal.MediaRecord(0L, "audio", Multimodal.wavBytes(1, 8000, pcmBytes),
        Multimodal.MediaMeta(1, 8000, "pcm_s16le", 1)),
      Multimodal.MediaRecord(1L, "audio",
        Multimodal.wavBytesFmt(7, 8, 1, 8000, muBytes),
        Multimodal.MediaMeta(1, 8000, "g711_ulaw", 1))).toDS()
    val sig = Audio.spectralSignature(media, 256).collect()
      .map(s => (s.doc_id, s.window_idx) -> s.dominant_bin).toMap
    assert(sig.size == 4, s"expected 2 windows x 2 clips, got $sig")
    assert(sig((0L, 0)) == 11 && sig((0L, 1)) == 40)
    // the lossy companded re-encode yields the SAME temporal signature
    assert(sig((1L, 0)) == 11 && sig((1L, 1)) == 40)
    // while sharing no bytes with the original
    assert(!pcmBytes.sameElements(muBytes))
  }
}
