package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Qoi

/** Conformance pins for the QOI codec — hand-assembled byte vectors
  * written out from the public spec text (each op's bit layout
  * computed by hand below), plus adversarial round-trips: encoder
  * output is checked byte-for-byte, decoder output pixel-for-pixel,
  * and the two must invert each other on runs spanning the 62 cap,
  * index collisions, alpha transitions, and the final-op-is-a-run
  * edge. */
class QoiSpec extends AnyFunSuite {

  private def px(vals: (Int, Int, Int, Int)*): Array[Byte] =
    vals.flatMap { case (r, g, b, a) =>
      Seq(r.toByte, g.toByte, b.toByte, a.toByte) }.toArray

  private val header2x2: Array[Byte] = Array[Byte](
    'q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 2, 4, 0)
  private val endMarker: Array[Byte] =
    Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  test("hand-assembled vector: RGB literal + run + DIFF") {
    // p0 (10,20,30,255): dg=20 out of LUMA range → QOI_OP_RGB
    // p1,p2 repeat p0 → QOI_OP_RUN with run=2, stored as 0xc0|(2-1)
    // p3 (11,21,31,255): per-channel delta +1 → QOI_OP_DIFF
    //   0x40 | (1+2)<<4 | (1+2)<<2 | (1+2) = 0x7f
    val img = px((10, 20, 30, 255), (10, 20, 30, 255),
      (10, 20, 30, 255), (11, 21, 31, 255))
    val want = header2x2 ++
      Array[Byte](0xfe.toByte, 10, 20, 30, 0xc1.toByte, 0x7f) ++ endMarker
    val got = Qoi.encode(2, 2, img)
    assert(got.toSeq == want.toSeq)
    val back = Qoi.decode(got)
    assert(back.w == 2 && back.h == 2 && back.rgba.toSeq == img.toSeq)
  }

  test("hand-assembled vector: INDEX hit and RGBA literal") {
    // p0 (10,20,30,255) → RGB, lands in index slot
    //   (10·3+20·5+30·7+255·11) % 64 = 3145 % 64 = 9
    // p1 (5,5,5,255): dg=-15 ok but dr-dg=10 > 7 → RGB
    // p2 (10,20,30,255): in the index → QOI_OP_INDEX 0x00|9 = 0x09
    // p3 (10,20,30,128): alpha changed → QOI_OP_RGBA
    val img = px((10, 20, 30, 255), (5, 5, 5, 255),
      (10, 20, 30, 255), (10, 20, 30, 128))
    val want = header2x2 ++ Array[Byte](
      0xfe.toByte, 10, 20, 30,
      0xfe.toByte, 5, 5, 5,
      0x09,
      0xff.toByte, 10, 20, 30, 128.toByte) ++ endMarker
    val got = Qoi.encode(2, 2, img)
    assert(got.toSeq == want.toSeq)
    assert(Qoi.decode(got).rgba.toSeq == img.toSeq)
  }

  test("LUMA op layout: dg=7, dr-dg=0, db-dg=0") {
    // p0 (100,100,100,255): dg=100 → RGB. p1 (107,107,107,255):
    // dg=7, dr-dg=0, db-dg=0 → LUMA: 0x80|(7+32)=0xa7, (0+8)<<4|(0+8)=0x88
    val img = px((100, 100, 100, 255), (107, 107, 107, 255),
      (107, 107, 107, 255), (107, 107, 107, 255))
    val want = header2x2 ++ Array[Byte](
      0xfe.toByte, 100, 100, 100, 0xa7.toByte, 0x88.toByte,
      0xc1.toByte) ++ endMarker
    assert(Qoi.encode(2, 2, img).toSeq == want.toSeq)
  }

  test("runs split at the 62 cap and a final-op run decodes") {
    // 130 identical pixels after the first: 62 + 62 + 6
    val img = Array.fill(131)((77, 33, 11, 255)).flatMap {
      case (r, g, b, a) => Seq(r.toByte, g.toByte, b.toByte, a.toByte) }
    val enc = Qoi.encode(131, 1, img)
    val ops = enc.slice(14, enc.length - 8)
    assert(ops.toSeq == Seq[Byte](0xfe.toByte, 77, 33, 11,
      0xfd.toByte, 0xfd.toByte, 0xc5.toByte)) // run62, run62, run6
    assert(Qoi.decode(enc).rgba.toSeq == img.toSeq)
  }

  test("adversarial round-trips: biased random images invert exactly") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 40) {
      val w = rnd.nextInt(24) + 1; val h = rnd.nextInt(24) + 1
      val img = new Array[Byte](w * h * 4)
      var r = 0; var g = 0; var b = 0; var a = 255
      for (i <- 0 until w * h) {
        rnd.nextInt(5) match {
          case 0 => // hold (run pressure)
          case 1 => r = (r + rnd.nextInt(4) - 2) & 0xff // DIFF pressure
                    g = (g + rnd.nextInt(4) - 2) & 0xff
                    b = (b + rnd.nextInt(4) - 2) & 0xff
          case 2 => val dg = rnd.nextInt(64) - 32 // LUMA pressure
                    g = (g + dg) & 0xff
                    r = (r + dg + rnd.nextInt(16) - 8) & 0xff
                    b = (b + dg + rnd.nextInt(16) - 8) & 0xff
          case 3 => r = rnd.nextInt(256); g = rnd.nextInt(256)
                    b = rnd.nextInt(256) // RGB + index collisions
          case _ => a = rnd.nextInt(256) // RGBA pressure
        }
        img(i * 4) = r.toByte; img(i * 4 + 1) = g.toByte
        img(i * 4 + 2) = b.toByte; img(i * 4 + 3) = a.toByte
      }
      val back = Qoi.decode(Qoi.encode(w, h, img))
      assert(back.w == w && back.h == h, s"dims, trial $trial")
      assert(back.rgba.toSeq == img.toSeq, s"pixels, trial $trial")
    }
  }

  test("decoder rejects malformed input") {
    intercept[IllegalArgumentException](Qoi.decode(Array[Byte](1, 2, 3)))
    val ok = Qoi.encode(2, 1, px((1, 2, 3, 255), (9, 9, 9, 255)))
    val badMagic = ok.clone(); badMagic(0) = 'x'
    intercept[IllegalArgumentException](Qoi.decode(badMagic))
    val truncated = ok.take(ok.length - 9) // into the op stream
    intercept[IllegalArgumentException](Qoi.decode(truncated))
    val badEnd = ok.clone(); badEnd(badEnd.length - 1) = 0
    intercept[IllegalArgumentException](Qoi.decode(badEnd))
  }

  test("truncated operand bytes fail loudly, not with a bounds throw") {
    // RGB op byte present but its 3 operand bytes cut off: the stream
    // then holds header + 0xfe + the 8-byte end marker — without the
    // operand-length guard the decoder consumed marker bytes as pixel
    // data (r12 advice). Must be the documented IllegalArgumentException.
    val h1x1 = Array[Byte]('q', 'o', 'i', 'f', 0, 0, 0, 1, 0, 0, 0, 1, 4, 0)
    val rgbCut = h1x1 ++ Array[Byte](0xfe.toByte) ++ endMarker
    intercept[IllegalArgumentException](Qoi.decode(rgbCut))
    val rgbaCut = h1x1 ++ Array[Byte](0xff.toByte, 1, 2) ++ endMarker
    intercept[IllegalArgumentException](Qoi.decode(rgbaCut))
    val lumaCut = h1x1 ++ Array[Byte](0xa7.toByte) ++ endMarker
    intercept[IllegalArgumentException](Qoi.decode(lumaCut))
  }

  test("foreign-encoder stream: RUN pixels enter the seen-colors index") {
    // A spec-conformant encoder may RUN the initial (0,0,0,255) pixel
    // and later reference it via OP_INDEX — the reference decoder
    // indexes every pixel, so slot hash(0,0,0,255)= (255·11)%64 = 53
    // holds it. This repo's encoder never emits this shape (it indexes
    // at literal time), so the vector is hand-assembled.
    val h3x1 = Array[Byte]('q', 'o', 'i', 'f', 0, 0, 0, 3, 0, 0, 0, 1, 4, 0)
    val stream = h3x1 ++ Array[Byte](
      0xc0.toByte,       // RUN 1: initial (0,0,0,255)
      0xfe.toByte, 9, 9, 9, // RGB (9,9,9,255)
      (0x00 | 53).toByte // INDEX slot 53 → must be (0,0,0,255)
    ) ++ endMarker
    val img = Qoi.decode(stream)
    assert(img.rgba.toSeq == px((0, 0, 0, 255), (9, 9, 9, 255),
      (0, 0, 0, 255)).toSeq)
  }
}
