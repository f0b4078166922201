package graft.analytics

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** The REAL codec behind the m-series stub seam, built entirely on the
  * JDK's `javax.imageio` (no new dependency — the container ships no
  * external image libs, but PNG/BMP/GIF decode is JDK-native).
  *
  * `Multimodal.scala`'s QueryDefs keep their deterministic md5 stand-ins
  * so the DuckDB oracle can replay them byte-for-byte; THIS is the
  * decode/feature path a production deployment swaps in at the documented
  * seam (the `fakeDecode*` call sites): decode → grayscale → area-average
  * resize → 32×32 DCT-II → 8×8 low-frequency pHash — the standard
  * perceptual hash (same banding/64-bit-fingerprint shape the m05
  * dataflow already consumes). Everything is pure `Array[Byte] → value`
  * — exactly the signature a codec UDF needs: decode cost is per-row CPU
  * inside a partition-parallel map, no shuffle implications, and the
  * 64-bit hash output feeds the existing band-join near-dup plumbing
  * unchanged (`ImageCodecSpec` drives PNG bytes through it end-to-end).
  */
object ImageCodec {

  /** PNG/GIF/BMP bytes → (width, height, row-major grayscale 0..255).
    * Luma = integer BT.601 ((299 R + 587 G + 114 B) / 1000) — exact
    * integer arithmetic so the hash is bit-stable across JVMs. */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    (w, h, gray)
  }

  /** Area-average resize (box filter) to tw×th — the real version of
    * m03's byte-decimation stub. Iterates TARGET cells and averages each
    * cell's source rectangle (integer accumulation, floor division):
    * downscale boxes tile the source exactly, and upscale degenerates to
    * nearest-neighbor replication — every target cell always averages at
    * least one real pixel. (The earlier source-pixel-scatter form left
    * unmapped cells BLACK when tw>w or th>h, so the pHash of a sub-32px
    * thumbnail hashed a zero-interleaved lattice and landed ~16 Hamming
    * bits from its original — past any near-dup gate.) */
  def resizeGray(gray: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
    require(w > 0 && h > 0 && tw > 0 && th > 0)
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th
      val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw
        val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var sum = 0L
        var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(y * w + x); cnt += 1; x += 1 }
          y += 1
        }
        out(ty * tw + tx) = (sum / cnt).toInt
        tx += 1
      }
      ty += 1
    }
    out
  }

  private val N = 32 // DCT input side
  private val K = 8 //  low-frequency block side

  // DCT-II basis, precomputed once: cos((2x+1) u π / 2N)
  private val cosTab: Array[Array[Double]] = Array.tabulate(N, N) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / (2.0 * N))
  }

  /** The perceptual hash: decode → 32×32 area resize → 2-D DCT-II → keep
    * the 8×8 lowest-frequency block, drop the DC term, one bit per
    * coefficient (above/below the median of the remaining 63) → 64-bit
    * fingerprint with bit 63 always 0. Near-duplicate images (resize,
    * mild noise, re-encode) keep small Hamming distance; unrelated
    * images land ~32 apart. */
  def phash64(bytes: Array[Byte]): Long = {
    val (w, h, gray) = decodeGray(bytes)
    val small = resizeGray(gray, w, h, N, N)
    // row-column separable DCT-II
    val rows = Array.ofDim[Double](N, N)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < N) {
        var acc = 0.0
        var x = 0
        while (x < N) { acc += small(y * N + x) * cosTab(u)(x); x += 1 }
        rows(y)(u) = acc
        u += 1
      }
      y += 1
    }
    val coef = Array.ofDim[Double](K, K)
    var v = 0
    while (v < K) {
      var u = 0
      while (u < K) {
        var acc = 0.0
        var yy = 0
        while (yy < N) { acc += rows(yy)(u) * cosTab(v)(yy); yy += 1 }
        coef(v)(u) = acc
        u += 1
      }
      v += 1
    }
    val flat = (for { vv <- 0 until K; uu <- 0 until K
      if !(vv == 0 && uu == 0) } yield coef(vv)(uu)).toArray
    val median = flat.sorted.apply(flat.length / 2)
    var hash = 0L
    var bit = 0
    for { vv <- 0 until K; uu <- 0 until K; if !(vv == 0 && uu == 0) } {
      if (coef(vv)(uu) > median) hash |= 1L << bit
      bit += 1
    }
    hash
  }

  /** m04's extractor, real: 16-bin grayscale histogram + integer mean —
    * the per-image feature vector a batched decode UDF emits. */
  def grayFeatures(bytes: Array[Byte]): (Array[Long], Long) = {
    val (_, _, gray) = decodeGray(bytes)
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < gray.length) {
      hist(gray(i) >> 4) += 1
      sum += gray(i)
      i += 1
    }
    (hist, if (gray.length == 0) 0L else sum / gray.length)
  }

  /** Deterministic tiny-PNG encoder for fixtures/specs: render a w×h
    * grayscale image from a pixel function and PNG-encode it with the
    * JDK writer. */
  def encodePng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = pixel(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
