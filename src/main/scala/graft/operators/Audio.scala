package graft.operators

import org.apache.spark.sql.Dataset

/** Frequency-domain audio features over decoded PCM — the signal tier
  * an audio-corpus curation pipeline filters on (tone/noise/speech
  * band balance, dominant frequency) once [[Multimodal.parsePcmSamples]]
  * has turned container bytes back into samples.
  *
  * The transform is a real radix-2 Cooley–Tukey FFT implemented here
  * (no JNI, no library): iterative, in-place, O(N log N), allocated
  * once per window size per partition. Windows are non-overlapping
  * frames of [[SpectralFeatures.windowSize]] samples; magnitudes sum
  * across a record's windows before the argmax, so short records are
  * not noisier than long ones.
  *
  * Scale shape: one narrow `mapPartitions` pass — audio bytes never
  * shuffle, each record costs O(samples · log window) CPU with O(window)
  * memory, and only the fixed-width feature rows leave the operator.
  * Parallelism is per-record, so any shard layout works at 100 TB.
  */
object Audio {

  final case class SpectralRow(doc_id: Long, sample_rate: Int,
      n_samples: Long, n_windows: Long, dominant_bin: Int,
      dominant_band: Int)

  /** In-place radix-2 FFT (decimation in time). `re`/`im` length must
    * be a power of two. Standard textbook form (Cooley–Tukey 1965):
    * bit-reversal permutation, then log2(n) butterfly passes. */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(base + k) = ar + tr; im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr; im(base + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum (first n/2 bins) of a real frame. */
  private[graft] def magnitudes(frame: Array[Double]): Array[Double] = {
    val n = frame.length
    val re = java.util.Arrays.copyOf(frame, n)
    val im = new Array[Double](n)
    fft(re, im)
    val out = new Array[Double](n / 2)
    var k = 0
    while (k < n / 2) {
      out(k) = math.sqrt(re(k) * re(k) + im(k) * im(k))
      k += 1
    }
    out
  }

  final case class SpectralWindow(doc_id: Long, window_idx: Int,
      dominant_bin: Int)

  /** TEMPORAL spectral signature: one row per non-overlapping window
    * carrying its dominant non-DC FFT bin (ties to the LOWEST bin —
    * deterministic regardless of fold order). The audio analog of a
    * video's per-frame hash sequence (q133): clip-level near-dup
    * compares ALIGNED windows, so the signature must keep temporal
    * position, which [[spectralFeatures]]' whole-record magnitude sum
    * throws away. Decodes ALL integer sample tiers
    * ([[Multimodal.parseAudioSamples]]: 16-bit PCM + G.711 μ/A-law),
    * because the near-dup case is precisely a companded telephony
    * re-encode of a PCM original: samples differ (lossy companding)
    * but each window's dominant bin survives — quantization noise
    * spreads across the spectrum orders of magnitude below a tone
    * peak. Narrow mapPartitions; audio bytes never shuffle; ~16 bytes
    * leave per window. */
  def spectralSignature(media: Dataset[Multimodal.MediaRecord],
      windowSize: Int = 256): Dataset[SpectralWindow] = {
    require(windowSize >= 8 && (windowSize & (windowSize - 1)) == 0,
      s"windowSize must be a power of 2 >= 8, got $windowSize")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        Multimodal.parseAudioSamples(r.data).toSeq.flatMap {
          case (_, _, _, s) =>
            val nWin = s.length / windowSize
            (0 until nWin).iterator.map { w =>
              val frame = new Array[Double](windowSize)
              var i = 0
              while (i < windowSize) {
                frame(i) = s(w * windowSize + i).toDouble
                i += 1
              }
              val mag = magnitudes(frame)
              var best = 1
              var k = 2
              while (k < mag.length) {
                if (mag(k) > mag(best)) best = k
                k += 1
              }
              SpectralWindow(r.doc_id, w, best)
            }
        }
      }
    }
  }

  /** Per-record spectral features: frame into `windowSize`-sample
    * windows (trailing partial window dropped — it would bias the
    * spectrum), FFT each, sum magnitudes across windows, report the
    * dominant non-DC bin and its band (4 equal bands over n/2 bins).
    * Records that don't decode as PCM, or are shorter than one
    * window, drop (quarantine semantics, like [[Multimodal.audioFeatures]]). */
  def spectralFeatures(media: Dataset[Multimodal.MediaRecord],
      windowSize: Int = 256): Dataset[SpectralRow] = {
    require(windowSize >= 8 && (windowSize & (windowSize - 1)) == 0,
      s"windowSize must be a power of 2 >= 8, got $windowSize")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        Multimodal.parsePcmSamples(r.data).flatMap { case (_, rate, s) =>
          val nWin = s.length / windowSize
          if (nWin == 0) None
          else {
            val acc = new Array[Double](windowSize / 2)
            val frame = new Array[Double](windowSize)
            var w = 0
            while (w < nWin) {
              var i = 0
              while (i < windowSize) {
                frame(i) = s(w * windowSize + i).toDouble
                i += 1
              }
              val mag = magnitudes(frame)
              var k = 0
              while (k < acc.length) { acc(k) += mag(k); k += 1 }
              w += 1
            }
            // argmax over non-DC bins; ties break to the LOWEST bin so
            // the result is deterministic regardless of fold order
            var best = 1
            var k = 2
            while (k < acc.length) {
              if (acc(k) > acc(best)) best = k
              k += 1
            }
            val band = best * 4 / acc.length
            Some(SpectralRow(r.doc_id, rate, s.length.toLong, nWin.toLong,
              best, band))
          }
        }
      }
    }
  }

  /** AUDIO NEAR-DUP over spectral signatures — the Shazam-shaped
    * pipeline as the library operator: block candidate pairs on runs
    * of `keyLen` CONSECUTIVE dominant-peak bins at the same window
    * position, verify each candidate by exact aligned-window peak
    * agreement, and vote (`n_match / min(windows) ≥ voteNum/voteDen`,
    * default 70%).
    *
    * THE DEFAULT KEY IS CALIBRATED FOR CORPUS SCALE: `keyLen = 3`
    * (triplet keys, ≈120× more selective than consecutive pairs on a
    * 120-bin peak alphabet). With pair keys the key space is fixed,
    * so bucket occupancy grows linearly with the corpus and the
    * within-bucket self-join quadratically — measured 37× pair work
    * at 100× rows versus 11.9× with triplets on the same fixture
    * (the q67/q134 calibration lesson). True twins share EVERY
    * window, so any key length catches them; longer keys only shed
    * coincidental collisions. `keyLen` may rise further for bigger
    * corpora; [[nearDupFixed]] is the pinned fixed-resolution escape
    * hatch for A/B controls and is lint-limited to exactly one
    * registry use.
    *
    * Input: `(doc_id, window_idx, dominant_bin)` rows (the
    * [[spectralSignature]] output, persisted by the caller if reused).
    * Output: `(a, b, n_match, nw_a, nw_b, is_dup)`, a < b.
    * Scale shape: the key build is one partition-local window over
    * doc_id; the candidate join shuffles only ~16-byte key rows on
    * (w, peak run); verify joins are key-equi on (doc, window). */
  def nearDup(sigs: org.apache.spark.sql.DataFrame, keyLen: Int = 3,
      voteNum: Int = 7, voteDen: Int = 10)
      : org.apache.spark.sql.DataFrame = {
    require(keyLen >= 3,
      s"nearDup keyLen must be >= 3 (calibrated blocking); use " +
        s"nearDupFixed for the pinned fixed-resolution control, got $keyLen")
    nearDupImpl(sigs, keyLen, voteNum, voteDen)
  }

  /** Fixed-resolution control (`keyLen = 2` pair keys): the blocking
    * shape whose candidate volume grows quadratically with corpus
    * size. Exists so a pinned control query can measure the
    * calibration differential; any new use in query code trips the
    * registry lint (the `lshBucketFixed` precedent). */
  def nearDupFixed(sigs: org.apache.spark.sql.DataFrame,
      keyLen: Int = 2, voteNum: Int = 7, voteDen: Int = 10)
      : org.apache.spark.sql.DataFrame = {
    require(keyLen >= 1, s"keyLen must be >= 1, got $keyLen")
    nearDupImpl(sigs, keyLen, voteNum, voteDen)
  }

  private def nearDupImpl(sigs: org.apache.spark.sql.DataFrame,
      keyLen: Int, voteNum: Int, voteDen: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(voteNum >= 1 && voteDen >= voteNum,
      s"vote threshold must be a fraction <= 1: $voteNum/$voteDen")
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("w")
    val withRun = (2 to keyLen).foldLeft(
      sigs.select(col("doc_id"), col("window_idx").as("w"),
        col("dominant_bin").as("b1"))) { (df, j) =>
      df.withColumn(s"b$j", lead(col("b1"), j - 1).over(wspec))
    }
    val keyCols = (1 to keyLen).map(j => s"b$j")
    val keys = withRun.where(col(s"b$keyLen").isNotNull)
    val cand = keys.as("x")
      .join(keys.as("y"), Seq("w") ++ keyCols)
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sa = sigs.select(col("doc_id").as("a"),
      col("window_idx").as("wi"), col("dominant_bin").as("ba"))
    val sb = sigs.select(col("doc_id").as("b"),
      col("window_idx").as("wi"), col("dominant_bin").as("bb"))
    val matched = cand.join(sa, Seq("a")).join(sb, Seq("b", "wi"))
      .where(col("ba") === col("bb"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_match"))
    val nw = sigs.groupBy("doc_id").agg(count(lit(1)).as("nw"))
    matched
      .join(nw.select(col("doc_id").as("a"), col("nw").as("nw_a")),
        Seq("a"))
      .join(nw.select(col("doc_id").as("b"), col("nw").as("nw_b")),
        Seq("b"))
      .select(col("a"), col("b"), col("n_match"), col("nw_a"),
        col("nw_b"),
        (col("n_match") * voteDen >=
          least(col("nw_a"), col("nw_b")) * voteNum).as("is_dup"))
      .orderBy("a", "b")
  }
}
