package graft

import graft.operators.{Bmp, Gif, Multimodal}

/** Perceptual dHash tier (q127): decode → luma → 9×8 box means →
  * difference hash, and the re-encode invariance that justifies it. */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def gradient(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i % w) * 255 / (w - 1))

  test("dHash64: monotone horizontal gradient sets every bit; flat image none") {
    // strictly increasing left→right means every right cell mean is
    // larger → all 64 bits set
    val inc = Multimodal.dHash64(18, 16, gradient(18, 16)).get
    assert(inc == -1L, f"expected all bits, got $inc%016x")
    val flat = Multimodal.dHash64(18, 16, Array.fill(18 * 16)(128)).get
    assert(flat == 0L)
    // sub-grid images quarantine rather than hash garbage
    assert(Multimodal.dHash64(8, 8, Array.fill(64)(0)).isEmpty)
    assert(Multimodal.dHash64(9, 7, Array.fill(63)(0)).isEmpty)
  }

  test("dHash64 is scale-invariant for block upscales (box means identical)") {
    val base = Array.tabulate(18 * 16)(i =>
      ((i * 37 + (i % 18) * (i % 18) * 5) % 256))
    val up = new Array[Int](36 * 32)
    for (r <- 0 until 32; c <- 0 until 36)
      up(r * 36 + c) = base((r / 2) * 18 + (c / 2))
    assert(Multimodal.dHash64(18, 16, base) == Multimodal.dHash64(36, 32, up))
  }

  test("re-encodes of one pixel buffer (PNG/BMP/GIF) hash identically; " +
      "distinct groups differ") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.encodePerceptualFixture(docs)
    val hashes = Multimodal.perceptualHash(media).collect()
      .map(p => p.doc_id -> p.dhash).toMap
    assert(hashes.size == docs.count(), "every container must decode")
    // within-group: all three containers agree exactly
    hashes.keys.groupBy(_ / 3).foreach { case (g, ids) =>
      val hs = ids.map(hashes).toSet
      assert(hs.size == 1, s"group $g variants disagree: $hs")
    }
    // across groups: the overwhelming majority of groups are distinct
    // (the fixture formula varies per group; rare genuine collisions
    // inside the hamming gate are allowed and oracle-replayed)
    val perGroup = hashes.groupBy(_._1 / 3).values.map(_.head._2).toSeq
    assert(perGroup.distinct.size >= perGroup.size * 9 / 10,
      "group hashes collapse — fixture formula degenerate")
  }

  test("pHashDct64: flat image hashes 0; column-only structure sets only u=0 bits") {
    // flat: every AC coefficient is 0, median 0, no bit strictly above
    assert(Multimodal.pHashDct64(18, 16, Array.fill(18 * 16)(128)).get == 0L)
    // an image varying only by COLUMN has zero row-frequency content:
    // the integer cosine table is antisymmetric around pi/2, so every
    // u != 0 coefficient cancels EXACTLY and only bits u*8+v-1 with
    // u=0 (indices 0..6) can be set — pins the 2D DCT structure
    val colOnly = Array.tabulate(18 * 16)(i => (i % 18) * 255 / 17)
    val h = Multimodal.pHashDct64(18, 16, colOnly).get
    assert(h != 0L && (h & ~0x7FL) == 0L, f"unexpected bits: $h%016x")
    // sub-8x8 quarantine
    assert(Multimodal.pHashDct64(7, 8, Array.fill(56)(0)).isEmpty)
    assert(Multimodal.pHashDct64(8, 7, Array.fill(56)(0)).isEmpty)
  }

  test("pHashDct64 is scale-invariant for aligned block upscales") {
    // 16x16 -> 32x32 nearest-neighbor doubling: cell boundaries are
    // exact multiples, so every 8x8 box mean (and hence the DCT) is
    // identical — the smooth-rescale robustness dHash trades away
    val base = Array.tabulate(16 * 16)(i =>
      ((i * 37 + (i % 16) * (i % 16) * 5) % 256))
    val up = new Array[Int](32 * 32)
    for (r <- 0 until 32; c <- 0 until 32)
      up(r * 32 + c) = base((r / 2) * 16 + (c / 2))
    assert(Multimodal.pHashDct64(16, 16, base) == Multimodal.pHashDct64(32, 32, up))
    // hash stays in the low 63 bits (DC excluded, no sign issues)
    assert(Multimodal.pHashDct64(16, 16, base).get >= 0L)
  }

  test("DCT re-encodes of one pixel buffer hash identically across containers") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val hashes = Multimodal.perceptualHashDct(
        Multimodal.encodePerceptualFixture(docs)).collect()
      .map(p => p.doc_id -> p.phash).toMap
    assert(hashes.size == docs.count())
    hashes.keys.groupBy(_ / 3).foreach { case (g, ids) =>
      assert(ids.map(hashes).toSet.size == 1, s"group $g variants disagree")
    }
  }

  test("video fixture: aligned frames of the two resolutions hash " +
      "identically; distinct frames and groups differ") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.encodeVideoPerceptualFixture(docs)
    // raw containers are byte-disjoint between the variants (the
    // whole point: the byte tier can never pair them)
    val sizes = media.collect().map(m => m.doc_id -> m.data.length).toMap
    sizes.keys.groupBy(_ / 2).foreach { case (g, ids) =>
      if (ids.size == 2)
        assert(ids.map(sizes).toSeq.distinct.size == 2,
          s"group $g variants should differ in size (64 vs 128 px)")
    }
    val hashes = Multimodal.videoFrameHashes(media).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f.phash).toMap
    // every frame of every video demuxes, decodes and hashes:
    // (g%3)+1 frames per video
    val expected = sizes.keys.toSeq.map(id => (id / 2 % 3) + 1).sum
    assert(hashes.size == expected, s"${hashes.size} != $expected frames")
    // within a group, aligned frames agree exactly across resolutions
    hashes.keys.groupBy { case (id, fi) => (id / 2, fi) }.foreach {
      case ((g, fi), keys) =>
        assert(keys.map(hashes).toSet.size == 1,
          s"group $g frame $fi disagrees across resolutions")
    }
    // frames of one video are distinct for the overwhelming majority
    // of videos (temporal signal): groups where (g+1) carries a large
    // power-of-2 factor coarsen the mod-256 matrix to few values and
    // can coincidentally hash two frames equal — rare, deterministic,
    // oracle-replayed, and harmless to pair mass (frames never
    // self-pair within a video) — same tolerance the image fixture's
    // cross-group assertion uses
    val multi = hashes.keys.groupBy(_._1).filter(_._2.size > 1)
    val distinctFrames = multi.count { case (_, keys) =>
      keys.map(hashes).toSet.size == keys.size }
    assert(distinctFrames * 20 >= multi.size * 19,
      s"only $distinctFrames of ${multi.size} multi-frame videos have " +
        "distinct frame hashes — fixture temporal signal degenerate")
  }

  test("grayPixels: gray PNG passthrough, BMP/GIF luma agree on equal channels") {
    val w = 9; val h = 8
    val px = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)
    val png = Multimodal.pngEncode(w, h, 1, px)
    val rgb = px.flatMap(v => Array(v, v, v))
    val bmp = Bmp.bmpBytes(w, h, rgb)
    val palette = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
    val gif = Gif.gifBytes(w, h, palette, px)
    val Some((pw, ph, pg)) = Multimodal.grayPixels(png)
    val Some((bw, bh, bg)) = Multimodal.grayPixels(bmp)
    val Some((gw, gh2, gg)) = Multimodal.grayPixels(gif)
    assert((pw, ph) == (w, h) && (bw, bh) == (w, h) && (gw, gh2) == (w, h))
    assert(pg.toSeq == px.map(_ & 0xff).toSeq)
    assert(bg.toSeq == pg.toSeq && gg.toSeq == pg.toSeq)
  }
}
