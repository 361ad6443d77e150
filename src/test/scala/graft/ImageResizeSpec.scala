package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageResize

/** [[graft.operators.ImageResize]] conformance: identity, the exact
  * 2×-downscale 4-neighbor-average law, border-clamp upscale against
  * an independently written naive reference, and value-range bounds
  * on arbitrary shapes. */
class ImageResizeSpec extends AnyFunSuite {

  /** Independent naive reference: per-output-pixel recomputation with
    * the same pinned conventions, written scalar-first (no shared
    * code with the operator's loop structure). */
  private def reference(src: Array[Int], wIn: Int, hIn: Int, ch: Int,
      wOut: Int, hOut: Int): Array[Int] = {
    def at(x: Int, y: Int, c: Int): Int = {
      val xc = math.min(wIn - 1, math.max(0, x))
      val yc = math.min(hIn - 1, math.max(0, y))
      src((yc * wIn + xc) * ch + c)
    }
    (0 until hOut).flatMap { yo =>
      (0 until wOut).flatMap { xo =>
        (0 until ch).map { c =>
          val sx = (xo + 0.5) * wIn / wOut - 0.5
          val sy = (yo + 0.5) * hIn / hOut - 0.5
          val x0 = math.floor(sx).toInt; val fx = sx - x0
          val y0 = math.floor(sy).toInt; val fy = sy - y0
          val v =
            (1 - fy) * ((1 - fx) * at(x0, y0, c) + fx * at(x0 + 1, y0, c)) +
              fy * ((1 - fx) * at(x0, y0 + 1, c) + fx * at(x0 + 1, y0 + 1, c))
          math.floor(v + 0.5).toInt
        }
      }
    }.toArray
  }

  private def img(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int)
      : Array[Int] =
    (0 until h).flatMap(y => (0 until w).flatMap(x =>
      (0 until ch).map(c => f(x, y, c)))).toArray

  test("identity resize returns the input verbatim") {
    val src = img(7, 5, 3)((x, y, c) => (x * 31 + y * 17 + c * 5) % 256)
    assert(ImageResize.bilinear(src, 7, 5, 3, 7, 5).toSeq == src.toSeq)
  }

  test("2x downscale of a linear field is the exact closed form " +
      "(4-neighbor average + half-up rounding)") {
    // p(x,y,c) = 3x + 2y + off_c  →  out(xo,yo,c) = 6xo + 4yo + off + 3
    val off = Array(11, 28, 45)
    val src = img(32, 32, 3)((x, y, c) => 3 * x + 2 * y + off(c))
    val out = ImageResize.bilinear(src, 32, 32, 3, 16, 16)
    for (yo <- 0 until 16; xo <- 0 until 16; c <- 0 until 3)
      assert(out((yo * 16 + xo) * 3 + c) == 6 * xo + 4 * yo + off(c) + 3,
        s"at ($xo,$yo,$c)")
  }

  test("matches the independent reference on ragged shapes " +
      "(downscale, upscale with border clamp, 1-pixel edges)") {
    val shapes = Seq((37, 29, 16, 16), (5, 9, 11, 4), (3, 3, 7, 7),
      (1, 6, 4, 4), (8, 1, 3, 5), (16, 16, 16, 16))
    for ((wi, hi, wo, ho) <- shapes; ch <- Seq(1, 3)) {
      val src = img(wi, hi, ch)((x, y, c) =>
        (x * x * 7 + y * 13 + c * 91 + (x + 1) * (y + 1)) % 256)
      assert(ImageResize.bilinear(src, wi, hi, ch, wo, ho).toSeq ==
        reference(src, wi, hi, ch, wo, ho).toSeq, s"($wi,$hi)->($wo,$ho) ch=$ch")
    }
  }

  test("outputs stay within the global [min, max] of the source") {
    val src = img(13, 11, 1)((x, y, _) => 40 + (x * y * 3) % 170)
    val out = ImageResize.bilinear(src, 13, 11, 1, 29, 31)
    assert(out.forall(v => v >= src.min && v <= src.max + 1))
    // +1 possible only through rounding; with integer inputs the
    // interpolant is within [min,max] and half-up adds at most 1 at
    // v = max - 0.5; tighten: never above max after rounding when the
    // interpolant itself is bounded by max
    assert(out.max <= src.max)
  }
}
