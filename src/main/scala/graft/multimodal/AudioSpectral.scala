package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frequency-domain audio features on the JDK alone: an in-place
  * radix-2 Cooley–Tukey FFT (1965; public literature) over Hann-windowed
  * PCM frames, pooled into the spectral statistics an audio curation
  * pipeline gates on — dominant frequency (tone/beep detection),
  * spectral centroid ("brightness"), 85% rolloff (bandwidth), and
  * spectral flatness (geometric/arithmetic mean ratio: ~1 for noise,
  * → 0 for pure tones — THE noise-vs-music discriminator).
  *
  * Deterministic by construction: fixed frame/hop, float inputs widened
  * to double before the transform, no randomness — byte-identical
  * inputs give bit-identical features on any JVM (spec-pinned against
  * synthesized sine/noise fixtures with known physics).
  *
  * Scale shape: [[spectralFeatures]] is a `Dataset.map` — pure map-side
  * per-file work with zero shuffles (the [[Multimodal.extractFeatures]]
  * contract); a 100 TB audio corpus FFTs inside its file splits, and
  * only the tiny feature rows move. */
object AudioSpectral {

  /** Per-file spectral features; `ok=false` rows carry zeros (payload
    * not PCM-decodable — same fallback discipline as the decoders). */
  case class SpectralRow(id: Long, ok: Boolean, sampleRate: Int,
                         dominantHz: Double, centroidHz: Double,
                         rolloff85Hz: Double, flatness: Double)

  /** In-place iterative radix-2 FFT on interleaved (re, im); n must be a
    * power of two. Standard bit-reversal + butterfly form. */
  private[multimodal] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"fft size must be a power of 2, got $n")
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
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr = re(blk + k + len / 2) * cr - im(blk + k + len / 2) * ci
          val vi = re(blk + k + len / 2) * ci + im(blk + k + len / 2) * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Mean power spectrum (n/2 bins) over Hann-windowed frames of
    * channel-0 samples; hop = frame/2. Frames shorter than `fftSize`
    * zero-pad; silent/empty input yields an all-zero spectrum. */
  private[multimodal] def meanPowerSpectrum(samples: Array[Float], channels: Int,
                                            fftSize: Int): Array[Double] = {
    val mono = {
      val out = new Array[Double](samples.length / channels)
      var i = 0
      while (i < out.length) { out(i) = samples(i * channels); i += 1 }
      out
    }
    val hop = fftSize / 2
    val spec = new Array[Double](fftSize / 2)
    val nFrames = math.max(1, (mono.length + hop - 1) / hop - 1)
    var f = 0
    while (f < nFrames) {
      val re = new Array[Double](fftSize)
      val im = new Array[Double](fftSize)
      var k = 0
      while (k < fftSize) {
        val idx = f * hop + k
        if (idx < mono.length) {
          val w = 0.5 * (1.0 - math.cos(2.0 * math.Pi * k / (fftSize - 1)))
          re(k) = mono(idx) * w
        }
        k += 1
      }
      fft(re, im)
      var b = 0
      while (b < spec.length) {
        spec(b) += re(b) * re(b) + im(b) * im(b)
        b += 1
      }
      f += 1
    }
    var b = 0
    while (b < spec.length) { spec(b) /= nFrames; b += 1 }
    spec
  }

  /** Features from one PCM payload; None when not decodable. */
  def features(bytes: Array[Byte], fftSize: Int = 1024): Option[(Int, Double, Double, Double, Double)] = {
    val decoded =
      try WavFeatureDecoder.decodePcm(bytes)
      catch { case scala.util.control.NonFatal(_) => null }
    if (decoded == null || decoded._1.isEmpty) None
    else {
      val (samples, channels, rate) = decoded
      val spec = meanPowerSpectrum(samples, channels, fftSize)
      val hzPerBin = rate.toDouble / fftSize
      // skip the DC bin for all statistics
      var total = 0.0
      var weighted = 0.0
      var maxB = 1
      var logSum = 0.0
      var nPos = 0
      var b = 1
      while (b < spec.length) {
        total += spec(b)
        weighted += spec(b) * b * hzPerBin
        if (spec(b) > spec(maxB)) maxB = b
        if (spec(b) > 0) { logSum += math.log(spec(b)); nPos += 1 }
        b += 1
      }
      if (total <= 0) Some((rate, 0.0, 0.0, 0.0, 0.0))
      else {
        val centroid = weighted / total
        var cum = 0.0
        var roll = 1
        while (roll < spec.length && cum < 0.85 * total) {
          cum += spec(roll); roll += 1
        }
        // flatness over positive bins: exp(mean log) / mean
        val flat =
          if (nPos == 0) 0.0
          else math.exp(logSum / nPos) / (total / (spec.length - 1))
        Some((rate, maxB * hzPerBin, centroid, (roll - 1) * hzPerBin,
          math.min(1.0, flat)))
      }
    }
  }

  /** Map-side spectral features over (id, content) audio rows. */
  def spectralFeatures(records: Dataset[MediaRecord],
                       fftSize: Int = 1024): Dataset[SpectralRow] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.map { r =>
      features(r.content, fftSize) match {
        case Some((rate, dom, cen, rol, fl)) =>
          SpectralRow(r.id, ok = true, rate, dom, cen, rol, fl)
        case None => SpectralRow(r.id, ok = false, 0, 0.0, 0.0, 0.0, 0.0)
      }
    }
  }

  // ---- MFCC (Davis & Mermelstein 1980; HTK mel scale) ------------------

  /** Per-file mel-frequency cepstral coefficients; `ok=false` rows carry
    * an empty vector (same fallback discipline as [[SpectralRow]]). */
  case class MfccRow(id: Long, ok: Boolean, sampleRate: Int,
                     mfcc: Seq[Double])

  /** Triangular mel filterbank over the power-spectrum bins [0, n/2):
    * `nFilters` overlapping triangles with centers equally spaced on the
    * HTK mel scale (m = 2595·log10(1 + f/700)) from 0 Hz to Nyquist —
    * the standard construction. Returned as (filter × bin) weights. */
  private[multimodal] def melFilterbank(nFilters: Int, fftSize: Int,
                                        rate: Int): Array[Array[Double]] = {
    def hzToMel(hz: Double) = 2595.0 * math.log10(1.0 + hz / 700.0)
    def melToHz(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    val hi = hzToMel(rate / 2.0)
    // nFilters + 2 edge frequencies in Hz, then in (fractional) bins
    val edges = Array.tabulate(nFilters + 2)(i =>
      melToHz(hi * i / (nFilters + 1)) * fftSize / rate)
    Array.tabulate(nFilters) { f =>
      val (lo, c, up) = (edges(f), edges(f + 1), edges(f + 2))
      Array.tabulate(fftSize / 2) { b =>
        if (b <= lo || b >= up) 0.0
        else if (b <= c) (b - lo) / (c - lo)
        else (up - b) / (up - c)
      }
    }
  }

  /** MFCCs from one PCM payload: mean power spectrum → mel filterbank
    * energies → natural log (floored at 1e-12: a silent band must not
    * produce −∞) → DCT-II → first `nCoeffs` coefficients. None when the
    * payload is not PCM-decodable. */
  def mfcc(bytes: Array[Byte], nCoeffs: Int = 13, nFilters: Int = 26,
           fftSize: Int = 1024): Option[(Int, Array[Double])] = {
    require(nCoeffs >= 1 && nCoeffs <= nFilters,
      s"need 1 <= nCoeffs <= nFilters, got $nCoeffs/$nFilters")
    val decoded =
      try WavFeatureDecoder.decodePcm(bytes)
      catch { case scala.util.control.NonFatal(_) => null }
    if (decoded == null || decoded._1.isEmpty) None
    else {
      val (samples, channels, rate) = decoded
      val spec = meanPowerSpectrum(samples, channels, fftSize)
      val bank = melFilterbank(nFilters, fftSize, rate)
      val logE = bank.map { w =>
        var e = 0.0
        var b = 0
        while (b < spec.length) { e += w(b) * spec(b); b += 1 }
        math.log(math.max(e, 1e-12))
      }
      // DCT-II: c_k = Σ_m logE(m)·cos(π·k·(m + 0.5)/M)
      val out = Array.tabulate(nCoeffs) { k =>
        var s = 0.0
        var m = 0
        while (m < nFilters) {
          s += logE(m) * math.cos(math.Pi * k * (m + 0.5) / nFilters)
          m += 1
        }
        s
      }
      Some((rate, out))
    }
  }

  /** Map-side MFCC vectors over (id, content) audio rows — the audio
    * embedding column a 100 TB curation/clustering pipeline feeds to the
    * ANN/dedup machinery; zero shuffles, only the 13-double rows move. */
  def mfccFeatures(records: Dataset[MediaRecord], nCoeffs: Int = 13,
                   nFilters: Int = 26, fftSize: Int = 1024): Dataset[MfccRow] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.map { r =>
      mfcc(r.content, nCoeffs, nFilters, fftSize) match {
        case Some((rate, cs)) => MfccRow(r.id, ok = true, rate, cs.toSeq)
        case None => MfccRow(r.id, ok = false, 0, Nil)
      }
    }
  }
}
