package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** PCM sample decode: RIFF walk → integer-PCM check → LE int16 read →
  * integer-exact reductions. PCM needs no codec, so this tier is
  * fully real — conformance is cross-checked against
  * javax.sound.sampled, the JDK's independent WAV reader. */
class AudioFeaturesSpec extends AnyFunSuite {

  private def pcmBytes(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      out(2 * i) = samples(i).toByte
      out(2 * i + 1) = (samples(i) >> 8).toByte
    }
    out
  }

  test("parsePcmSamples round-trips signed 16-bit samples exactly") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = Multimodal.wavBytes(1, 8000, pcmBytes(samples))
    val got = Multimodal.parsePcmSamples(wav)
    assert(got.isDefined)
    val (ch, rate, s) = got.get
    assert(ch == 1 && rate == 8000)
    assert(s.sameElements(samples))
  }

  test("javax.sound.sampled reads our WAV to the same samples (conformance)") {
    val samples = Array.tabulate(64)(i => ((i * 1021) % 65536 - 32768).toShort)
    val wav = Multimodal.wavBytes(2, 16000, pcmBytes(samples))
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getChannels == 2 && fmt.getSampleRate == 16000f)
    assert(fmt.getSampleSizeInBits == 16)
    val raw = in.readAllBytes()
    val ours = Multimodal.parsePcmSamples(wav).get._3
    assert(raw.length == ours.length * 2)
    for (i <- ours.indices) {
      val jdk = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
      assert(jdk == ours(i), s"sample $i")
    }
  }

  test("non-PCM / malformed inputs degrade to None") {
    assert(Multimodal.parsePcmSamples("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.parsePcmSamples(Array.emptyByteArray).isEmpty)
    // an MP4 is not a WAV
    val mp4 = Multimodal.mp4Bytes(600, 1200, "payload".getBytes)
    assert(Multimodal.parsePcmSamples(mp4).isEmpty)
    // flip the fmt code to 3 (IEEE float): must refuse, not mis-read
    val wav = Multimodal.wavBytes(1, 8000, pcmBytes(Array[Short](1, 2, 3)))
    // fmt chunk sits after the JUNK chunk: find it and patch the code
    val at = (0 until wav.length - 4)
      .find(i => new String(wav, i, 4, "US-ASCII") == "fmt ").get
    val bad = wav.clone(); bad(at + 8) = 3
    assert(Multimodal.parsePcmSamples(bad).isEmpty, "non-integer-PCM rejected")
  }

  test("audioFeatures: integer-exact reductions incl. zero crossings") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val samples = Array[Short](5, -3, -2, 7, 0, -1)
    // |s| sum = 18; peak 7; sumsq 25+9+4+49+0+1 = 88
    // sign flips: 5→-3 (1), -2→7 (1), 0→-1 (1) = 3
    val wav = Multimodal.wavBytes(1, 8000, pcmBytes(samples))
    val media = Seq(Multimodal.MediaRecord(7L, "audio", wav,
      Multimodal.MediaMeta(1, 8000, "pcm_s16le", 1))).toDS()
    val f = Multimodal.audioFeatures(media).collect().head
    assert(f.doc_id == 7L && f.n_samples == 6L)
    assert(f.sum_abs == 18L && f.peak == 7 && f.sum_sq == 88L)
    assert(f.zero_crossings == 3L, s"zc ${f.zero_crossings}")
  }

  test("G.711 mu-law expansion matches javax.sound.sampled for all 256 bytes") {
    import javax.sound.sampled._
    val payload = Array.tabulate(256)(i => i.toByte)
    val wav = Multimodal.wavBytesFmt(7, 8, 1, 8000, payload)
    val ours = Multimodal.parseAudioSamples(wav).get
    assert(ours._3 == "g711_ulaw" && ours._4.length == 256)
    // JDK reference: ULAW stream converted to 16-bit linear PCM
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(payload),
      new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false),
      256)
    val pcm = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2,
        8000f, false), src)
    val buf = pcm.readAllBytes()
    for (i <- 0 until 256) {
      val ref = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort
      assert(ours._4(i) == ref, s"ulaw byte $i: ours ${ours._4(i)} vs JDK $ref")
    }
  }

  test("G.711 A-law expansion matches javax.sound.sampled for all 256 bytes") {
    import javax.sound.sampled._
    val payload = Array.tabulate(256)(i => i.toByte)
    val wav = Multimodal.wavBytesFmt(6, 8, 1, 8000, payload)
    val ours = Multimodal.parseAudioSamples(wav).get
    assert(ours._3 == "g711_alaw" && ours._4.length == 256)
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(payload),
      new AudioFormat(AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false),
      256)
    val pcm = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2,
        8000f, false), src)
    val buf = pcm.readAllBytes()
    for (i <- 0 until 256) {
      val ref = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort
      assert(ours._4(i) == ref, s"alaw byte $i: ours ${ours._4(i)} vs JDK $ref")
    }
  }

  test("audioFeaturesEx surfaces the codec; unsupported fmt still drops") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val good = Multimodal.MediaRecord(1L, "audio",
      Multimodal.wavBytesFmt(7, 8, 1, 8000, Array.tabulate(10)(_.toByte)),
      Multimodal.MediaMeta(1, 8000, "g711_ulaw", 1))
    val float = Multimodal.MediaRecord(2L, "audio",
      Multimodal.wavBytesFmt(3, 32, 1, 8000, new Array[Byte](40)), // IEEE float
      Multimodal.MediaMeta(1, 8000, "f32", 1))
    val got = Multimodal.audioFeaturesEx(Seq(good, float).toDS()).collect()
    assert(got.length == 1 && got.head.codec == "g711_ulaw")
  }
}
