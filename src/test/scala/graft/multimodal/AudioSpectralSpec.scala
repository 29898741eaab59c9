package graft.multimodal

import graft.SparkSpec

/** Spectral features against known physics: the FFT agrees with a naive
  * DFT, a pure sine concentrates at its own frequency with near-zero
  * flatness, deterministic noise spreads with high flatness, and the
  * Dataset path is map-side per-file work. */
class AudioSpectralSpec extends SparkSpec {

  /** 16-bit mono PCM WAV through the JDK's own encoder. */
  private def pcmWav(sampleRate: Int, samples: Array[Double]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = math.max(-32768, math.min(32767, math.round(s * 32767).toInt))
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def sine(rate: Int, hz: Double, seconds: Double): Array[Double] =
    Array.tabulate((rate * seconds).toInt)(i =>
      0.8 * math.sin(2.0 * math.Pi * hz * i / rate))

  /** Deterministic LCG noise in [-0.8, 0.8]. */
  private def noise(n: Int): Array[Double] = {
    var s = 42L
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 1.6
    }
  }

  test("fft equals a naive DFT on deterministic input") {
    val n = 64
    val re = Array.tabulate(n)(i => math.sin(0.37 * i) + 0.1 * i % 3)
    val im = new Array[Double](n)
    val (reF, imF) = (re.clone(), im.clone())
    AudioSpectral.fft(reF, imF)
    (0 until n).foreach { k =>
      var dr = 0.0; var di = 0.0
      (0 until n).foreach { t =>
        val a = -2.0 * math.Pi * k * t / n
        dr += re(t) * math.cos(a); di += re(t) * math.sin(a)
      }
      assert(math.abs(reF(k) - dr) < 1e-9, s"re[$k]")
      assert(math.abs(imF(k) - di) < 1e-9, s"im[$k]")
    }
  }

  test("a pure 1 kHz sine: dominant/centroid/rolloff at 1 kHz, near-zero flatness") {
    val rate = 16000
    val Some((r, dom, cen, roll, flat)) =
      AudioSpectral.features(pcmWav(rate, sine(rate, 1000.0, 0.5)))
    val binHz = rate / 1024.0
    assert(r == rate)
    assert(math.abs(dom - 1000.0) <= binHz, s"dominant $dom")
    assert(math.abs(cen - 1000.0) <= 60.0, s"centroid $cen")
    assert(math.abs(roll - 1000.0) <= 2 * binHz, s"rolloff $roll")
    assert(flat < 0.05, s"flatness $flat")
  }

  test("deterministic noise: spread spectrum, high flatness, mid centroid") {
    val rate = 16000
    val Some((_, _, cen, roll, flat)) =
      AudioSpectral.features(pcmWav(rate, noise(8000)))
    val Some((_, _, _, _, sineFlat)) =
      AudioSpectral.features(pcmWav(rate, sine(rate, 1000.0, 0.5)))
    assert(flat > 10 * sineFlat, s"noise flat=$flat sine flat=$sineFlat")
    // flat spectrum: centroid near Nyquist/2, rolloff near 0.85·Nyquist
    assert(cen > 3000 && cen < 5000, s"centroid $cen")
    assert(roll > 5500 && roll < 7500, s"rolloff $roll")
  }

  test("Dataset path: per-file rows, non-audio payloads fall to ok=false") {
    val s = spark
    import s.implicits._
    val rate = 16000
    val wav = pcmWav(rate, sine(rate, 2000.0, 0.25))
    val recs = Seq(
      MediaRecord(1L, Multimodal.parseMeta(wav), wav),
      MediaRecord(2L, Multimodal.parseMeta(Array[Byte](1, 2, 3)), Array[Byte](1, 2, 3)))
      .toDS()
    val rows = AudioSpectral.spectralFeatures(recs).collect()
      .map(r => r.id -> r).toMap
    assert(rows(1L).ok && math.abs(rows(1L).dominantHz - 2000.0) <= rate / 1024.0)
    assert(!rows(2L).ok)
  }

  test("mel filterbank: triangles partition [0, Nyquist], centers ascend the mel scale") {
    val bank = AudioSpectral.melFilterbank(26, 1024, 16000)
    assert(bank.length == 26 && bank.head.length == 512)
    bank.foreach(w => assert(w.forall(x => x >= 0.0 && x <= 1.0)))
    // every filter has mass, and peak bins strictly ascend (mel spacing)
    val peaks = bank.map(w => w.indexOf(w.max))
    assert(bank.forall(_.sum > 0.0))
    assert(peaks.zip(peaks.tail).forall { case (a, b) => a < b }, peaks.toSeq)
    // mel warping: filters WIDEN with frequency (log-ish scale)
    val widths = bank.map(_.count(_ > 0.0))
    assert(widths.last > 3 * widths.head, s"${widths.head} → ${widths.last}")
  }

  test("mfcc equals an independent replay of filterbank + DCT-II") {
    val rate = 16000
    val wav = pcmWav(rate, sine(rate, 1000.0, 0.5))
    val Some((gotRate, got)) = AudioSpectral.mfcc(wav, nCoeffs = 13)
    assert(gotRate == rate && got.length == 13)
    // replay from the same power spectrum with independently-written sums
    val (samples, channels, _) = WavFeatureDecoder.decodePcm(wav)
    val spec = AudioSpectral.meanPowerSpectrum(samples, channels, 1024)
    val bank = AudioSpectral.melFilterbank(26, 1024, rate)
    val logE = bank.map(w =>
      math.log(math.max(w.zip(spec).map { case (a, b) => a * b }.sum, 1e-12)))
    (0 until 13).foreach { k =>
      val want = logE.zipWithIndex.map { case (e, m) =>
        e * math.cos(math.Pi * k * (m + 0.5) / 26) }.sum
      assert(math.abs(got(k) - want) < 1e-9, s"c$k: ${got(k)} vs $want")
    }
  }

  test("mfcc separates a tone from noise; Dataset path falls back on junk") {
    val s = spark
    import s.implicits._
    val rate = 16000
    val tone = pcmWav(rate, sine(rate, 1000.0, 0.5))
    val hiss = pcmWav(rate, noise(8000))
    val recs = Seq(
      MediaRecord(1L, Multimodal.parseMeta(tone), tone),
      MediaRecord(2L, Multimodal.parseMeta(hiss), hiss),
      MediaRecord(3L, Multimodal.parseMeta(Array[Byte](9)), Array[Byte](9))).toDS()
    val rows = AudioSpectral.mfccFeatures(recs).collect().map(r => r.id -> r).toMap
    assert(rows(1L).ok && rows(2L).ok && !rows(3L).ok && rows(3L).mfcc.isEmpty)
    // a pure tone's log-mel spectrum swings hard (one hot band), noise's
    // is comparatively flat: higher-order cepstral energy separates them
    def acEnergy(cs: Seq[Double]): Double = cs.drop(1).map(c => c * c).sum
    assert(acEnergy(rows(1L).mfcc) > 4 * acEnergy(rows(2L).mfcc),
      s"tone ${acEnergy(rows(1L).mfcc)} vs noise ${acEnergy(rows(2L).mfcc)}")
  }
}
