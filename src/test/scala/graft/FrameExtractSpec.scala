package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real MP4 frame extraction: the writer's stsd/stts/stsc/stsz/stco
  * sample table is demuxed back by box arithmetic and the sliced
  * frame bytes round-trip through the REAL image decoders. */
class FrameExtractSpec extends AnyFunSuite {

  private def grayBlocks(w: Int, h: Int, seed: Int): Array[Byte] = {
    val bpr = w / 8
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((seed + ((y / 8) * bpr + x / 8) * 11) % 256).toByte
    }
  }

  test("MJPEG-in-MP4: extracted frames decode to their exact pixels") {
    val (w, h) = (16, 16)
    val pixels = (0 until 3).map(f => grayBlocks(w, h, f * 37 + 5))
    val frames = pixels.map(px => Multimodal.jpegEncode(w, h, 1, px))
    val mp4 = Multimodal.mp4VideoBytes(frames)
    val samples = Multimodal.parseMp4Samples(mp4)
    assert(samples.isDefined && samples.get.length == 3)
    samples.get.zipWithIndex.foreach { case ((off, sz), i) =>
      assert(sz == frames(i).length, s"frame $i size")
      val bytes = java.util.Arrays.copyOfRange(mp4, off.toInt, off.toInt + sz)
      assert(bytes.sameElements(frames(i)), s"frame $i bytes slice exactly")
      val dec = Multimodal.jpegDecodePixels(bytes)
      assert(dec.isDefined, s"frame $i decodes")
      assert(dec.get._4.sameElements(pixels(i)), s"frame $i pixels exact")
    }
  }

  test("PNG frames round-trip through q102's decoder too") {
    val (w, h) = (11, 7)
    val px = Array.tabulate(w * h)(i => (i * 13 % 256).toByte)
    val frames = Seq(Multimodal.pngEncode(w, h, 1, px))
    val mp4 = Multimodal.mp4VideoBytes(frames)
    val Some(Seq((off, sz))) = Multimodal.parseMp4Samples(mp4): @unchecked
    val bytes = java.util.Arrays.copyOfRange(mp4, off.toInt, off.toInt + sz)
    val dec = Multimodal.pngDecodePixels(bytes)
    assert(dec.isDefined && dec.get._4.sameElements(px))
  }

  test("the container is still a valid q27-grade MP4 (mvhd duration parses)") {
    val frames = Seq(Multimodal.jpegEncode(8, 8, 1, Array.fill(64)(9.toByte)))
    val mp4 = Multimodal.mp4VideoBytes(frames, timescale = 600, frameDur = 30)
    assert(Multimodal.parseMp4(mp4).contains(30 * 1000L / 600))
  }

  test("general stsc mapping: multi-sample chunks resolve correct offsets") {
    // hand-build a sample table: 2 chunks, stsc says 2-then-1 samples
    def be4(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(t: String, c: Array[Byte]) = be4(c.length + 8) ++ t.getBytes("US-ASCII") ++ c
    def full(t: String, c: Array[Byte]) = box(t, be4(0) ++ c)
    val payload = Array.tabulate(60)(_.toByte)
    val stsz = full("stsz", be4(0) ++ be4(3) ++ be4(10) ++ be4(20) ++ be4(30))
    val stsc = full("stsc", be4(2) ++
      be4(1) ++ be4(2) ++ be4(1) ++ // chunk 1: 2 samples
      be4(2) ++ be4(1) ++ be4(1))   // chunk 2+: 1 sample
    // compute sizes: moov = stbl(stsz+stsc+stco); offsets into mdat
    def moovWith(stco: Array[Byte]) =
      box("moov", box("trak", box("mdia", box("minf", box("stbl", stsz ++ stsc ++ stco)))))
    val stco0 = full("stco", be4(2) ++ be4(0) ++ be4(0))
    val base = moovWith(stco0).length + 8
    val stco = full("stco", be4(2) ++ be4(base) ++ be4(base + 30))
    val mp4 = moovWith(stco) ++ box("mdat", payload)
    val got = Multimodal.parseMp4Samples(mp4)
    assert(got.contains(Seq((base.toLong, 10), (base + 10L, 20), (base + 30L, 30))))
  }

  test("hostile inputs degrade to None") {
    assert(Multimodal.parseMp4Samples("not an mp4".getBytes).isEmpty)
    assert(Multimodal.parseMp4Samples(Array.emptyByteArray).isEmpty)
    val frames = Seq(Multimodal.jpegEncode(8, 8, 1, Array.fill(64)(7.toByte)))
    val mp4 = Multimodal.mp4VideoBytes(frames)
    // truncate mid-mdat: declared sample extends past the buffer
    assert(Multimodal.parseMp4Samples(mp4.take(mp4.length - 10)).isEmpty)
  }

  test("frameExtract: Spark path emits real frame bytes per video row") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val (w, h) = (16, 8)
    val mk = (id: Long) => {
      val px = (0 until 2).map(f => grayBlocks(w, h, (id * 31 + f * 37).toInt & 0xff))
      val frames = px.map(p => Multimodal.jpegEncode(w, h, 1, p))
      (Multimodal.MediaRecord(id, "video", Multimodal.mp4VideoBytes(frames),
        Multimodal.MediaMeta(w, h, "mjpeg", 2)), px)
    }
    val (recs, wantPx) = (1L to 4L).map(mk).unzip
    val got = Multimodal.frameExtract(recs.toDS()).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    for ((id, frames) <- got; (f, i) <- frames.zipWithIndex) {
      val dec = Multimodal.jpegDecodePixels(f.data)
      assert(dec.isDefined, s"doc $id frame $i decodes")
      assert(dec.get._4.sameElements(wantPx(id.toInt - 1)(i)), s"doc $id frame $i pixels")
    }
  }
}
