package graft.operators

/** Bilinear image resampling — the tensorization-side preprocessing
  * op every vision/multimodal training pipeline runs between decode
  * and patch embedding (resize-to-canonical, e.g. 224×224 or a ViT
  * grid). Sits downstream of the decode tier (PNG/JPEG/GIF/BMP/WebP/
  * TIFF/QOI codecs in this package): decode → resize → patchify all
  * run inside ONE narrow mapPartitions pass, so pixel buffers never
  * shuffle and the stage is embarrassingly parallel at any corpus
  * size.
  *
  * Conventions (pinned so independent reimplementations agree):
  *  - half-pixel centers: source coordinate of output pixel xo is
  *    (xo + 0.5)·(wIn/wOut) − 0.5 — the OpenCV/PIL-default alignment
  *    that keeps the image centroid fixed and downscales 2× to exact
  *    4-neighbor averages;
  *  - border clamp (replicate) for samples past the edge;
  *  - channels interleaved, values 0–255, output rounded half-UP
  *    (floor(v + 0.5)) — v ≥ 0 so this is plain nearest-with-ties-up.
  */
object ImageResize {

  /** Resize `src` (interleaved, length wIn·hIn·ch) to wOut×hOut. */
  def bilinear(src: Array[Int], wIn: Int, hIn: Int, ch: Int,
      wOut: Int, hOut: Int): Array[Int] = {
    require(wIn > 0 && hIn > 0 && wOut > 0 && hOut > 0 && ch > 0)
    require(src.length == wIn * hIn * ch,
      s"src length ${src.length} != $wIn*$hIn*$ch")
    val out = new Array[Int](wOut * hOut * ch)
    val xScale = wIn.toDouble / wOut
    val yScale = hIn.toDouble / hOut
    var yo = 0
    while (yo < hOut) {
      val sy = (yo + 0.5) * yScale - 0.5
      val y0f = math.floor(sy)
      val fy = sy - y0f
      val y0 = clamp(y0f.toInt, hIn)
      val y1 = clamp(y0f.toInt + 1, hIn)
      var xo = 0
      while (xo < wOut) {
        val sx = (xo + 0.5) * xScale - 0.5
        val x0f = math.floor(sx)
        val fx = sx - x0f
        val x0 = clamp(x0f.toInt, wIn)
        val x1 = clamp(x0f.toInt + 1, wIn)
        var c = 0
        while (c < ch) {
          val v00 = src((y0 * wIn + x0) * ch + c)
          val v10 = src((y0 * wIn + x1) * ch + c)
          val v01 = src((y1 * wIn + x0) * ch + c)
          val v11 = src((y1 * wIn + x1) * ch + c)
          val top = (1.0 - fx) * v00 + fx * v10
          val bot = (1.0 - fx) * v01 + fx * v11
          val v = (1.0 - fy) * top + fy * bot
          out((yo * wOut + xo) * ch + c) = math.floor(v + 0.5).toInt
          c += 1
        }
        xo += 1
      }
      yo += 1
    }
    out
  }

  private def clamp(i: Int, n: Int): Int =
    if (i < 0) 0 else if (i >= n) n - 1 else i
}
