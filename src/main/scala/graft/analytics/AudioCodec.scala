package graft.analytics

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** The real AUDIO codec behind the m-series stub seam — the audio twin of
  * [[ImageCodec]], built on the JDK's `javax.sound.sampled` (WAV/PCM
  * decode is JDK-native; no external codec library exists in this
  * container, but none is needed for the RIFF/PCM container a data
  * pipeline's audio normalization stage standardizes on anyway).
  *
  * `Multimodal.scala`'s m07 (VAD segmentation) and m12 (periodicity)
  * QueryDefs keep their md5 frame-energy stand-ins for the DuckDB oracle;
  * this object computes the SAME shapes from real samples: per-frame RMS
  * energy (the VAD signal), and energy autocorrelation over lag windows
  * (the tempo/periodicity signal). All integer/fixed-point arithmetic so
  * results are bit-stable across JVMs. `AudioCodecSpec` drives real WAV
  * bytes through the per-frame explode dataflow and checks the physics:
  * silence gaps segment where they were synthesized, and the
  * autocorrelation argmax recovers the synthesized period.
  */
object AudioCodec {

  /** WAV bytes → signed 16-bit mono samples. Stereo is downmixed by
    * integer average; 8-bit input is centered and scaled. */
  def decodePcm16(bytes: Array[Byte]): Array[Int] = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        fmt.getSampleRate, 16, fmt.getChannels, 2 * fmt.getChannels,
        fmt.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      val raw = pcm.readAllBytes()
      val ch = fmt.getChannels
      val n = raw.length / (2 * ch)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        var acc = 0
        var c = 0
        while (c < ch) {
          val off = (i * ch + c) * 2
          acc += ((raw(off) & 0xff) | (raw(off + 1) << 8)).toShort.toInt
          c += 1
        }
        out(i) = acc / ch
        i += 1
      }
      out
    } finally in.close()
  }

  /** Per-frame RMS energy over fixed-size frames (m07's real signal):
    * frame f covers samples [f·size, (f+1)·size); energy = isqrt of the
    * mean of squares — an exact integer, 0..32767. */
  def frameEnergies(samples: Array[Int], frameSize: Int): Array[Long] = {
    require(frameSize > 0)
    val n = samples.length / frameSize
    val out = new Array[Long](n)
    var f = 0
    while (f < n) {
      var acc = 0L
      var i = f * frameSize
      val end = i + frameSize
      while (i < end) { acc += samples(i).toLong * samples(i); i += 1 }
      out(f) = isqrt(acc / frameSize)
      f += 1
    }
    out
  }

  private def isqrt(v: Long): Long = {
    if (v <= 0) return 0
    var r = math.sqrt(v.toDouble).toLong
    while (r * r > v) r -= 1
    while ((r + 1) * (r + 1) <= v) r += 1
    r
  }

  /** Active segments from the frame-energy track (m07's real VAD):
    * frames with energy > threshold are voice/active; consecutive active
    * frames merge into (startFrame, endFrameExclusive) islands. */
  def activeSegments(energies: Array[Long], threshold: Long): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var start = -1
    var f = 0
    while (f < energies.length) {
      val active = energies(f) > threshold
      if (active && start < 0) start = f
      if (!active && start >= 0) { out += ((start, f)); start = -1 }
      f += 1
    }
    if (start >= 0) out += ((start, energies.length))
    out.result()
  }

  /** Energy-autocorrelation periodicity (m12's real signal): for each
    * lag in [minLag, maxLag], the length-normalized sum of
    * energy(f)·energy(f+lag); returns the SMALLEST lag whose score is
    * within 1% of the peak — a multiple of the true period scores within
    * a fraction of a percent of the fundamental (fewer product terms but
    * a shorter normalization window), so a strict argmax flips to 2x/3x
    * the period on boundary arithmetic; the fundamental-preference band
    * resolves that the way the m12 QueryDef's exact-tie rule does. 0
    * when no lag fits the track. */
  def dominantLag(energies: Array[Long], minLag: Int, maxLag: Int): Int = {
    val scores = new Array[Long](maxLag + 1)
    var bestScore = -1L
    var lag = minLag
    while (lag <= maxLag) {
      val n = energies.length - lag
      if (n > 0) {
        var acc = 0L
        var f = 0
        while (f < n) { acc += energies(f) * energies(f + lag); f += 1 }
        scores(lag) = acc / n
        if (scores(lag) > bestScore) bestScore = scores(lag)
      }
      lag += 1
    }
    if (bestScore <= 0) return 0
    var l = minLag
    while (l <= maxLag) {
      if (energies.length - l > 0 && scores(l) * 100L >= bestScore * 99L) return l
      l += 1
    }
    0
  }

  /** m11's landmark constellation from REAL frame energies: at frame i
    * the landmark is a 16-bit hash of the quantized energy CONTOUR over
    * an 8-frame window — each energy ilog2-bucketed (stable under
    * sub-bucket sample noise, keyed to envelope shape rather than fine
    * amplitude), the window FNV-folded and avalanched into the full
    * 16-bit space. The (frame_idx, hash) pairs feed m11's offset-vote
    * alignment: matching hashes across two clips vote for their
    * frame-index difference; a true overlap concentrates votes on one
    * offset while chance collisions scatter.
    *
    * Window length is a recall/precision dial: overlapping windows mean
    * one accidental L-frame envelope agreement yields L-7 votes at the
    * SAME offset, so the 3-vote threshold is really a 10-frame (~0.3 s
    * at 256/8000) agreement requirement — at 8 ilog2 buckets that is
    * ~8⁻¹⁰ per alignment, far under noise even for million-clip corpora
    * (the measured failure mode of a 4-frame window over a synthetic
    * 5-level envelope: chance 6-frame agreements chained 3 same-offset
    * votes and flagged every fresh clip at a 60-clip corpus). */
  def landmarks(energies: Array[Long], window: Int = 8): Array[(Int, Int)] = {
    def bucket(v: Long): Int = {
      var b = 0
      var x = v + 1
      while (x > 1 && b < 15) { x >>= 1; b += 1 }
      b
    }
    val n = math.max(energies.length - window + 1, 0)
    val out = new Array[(Int, Int)](n)
    var i = 0
    while (i < n) {
      var h = 0x811C9DC5
      var k = 0
      while (k < window) { h = (h ^ bucket(energies(i + k))) * 0x01000193; k += 1 }
      h ^= h >>> 15; h *= 0x2C1B3C6D; h ^= h >>> 12
      out(i) = (i, h & 0xFFFF)
      i += 1
    }
    out
  }

  /** Deterministic WAV synthesis for fixtures/specs: 16-bit mono PCM at
    * `rate` Hz from a sample function (index → [-32768, 32767]). */
  def encodeWav(nSamples: Int, rate: Float, sample: Int => Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = math.max(-32768, math.min(32767, sample(i)))
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
