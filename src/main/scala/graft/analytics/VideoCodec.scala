package graft.analytics

import java.io.ByteArrayOutputStream

/** The VIDEO member of the real-codec seam ([[ImageCodec]] images,
  * [[AudioCodec]] WAV audio): MJPEG-in-AVI, parsed and written entirely
  * from bytes — RIFF is a flat little-endian chunk format and the JDK's
  * `javax.imageio` decodes each MJPEG frame (a baseline JPEG), so the
  * container needs no external library. This makes the m02/m08
  * frame-sample/keyframe dataflows runnable on REAL video bytes: an
  * MJPEG AVI (the format IP cameras and capture cards emit) round-trips
  * through `encodeAviMjpeg`/`parseAvi`, and a frame is decoded ONLY when
  * the dataflow actually samples it — the m02 stride semantics, where
  * per-doc work is `ceil(n_frames / stride)` decodes, not `n_frames`.
  *
  * `Multimodal.scala`'s QueryDefs keep their deterministic md5 stand-ins
  * for the DuckDB oracle; this is the decode path a deployment swaps in
  * at the documented seam, like the image/audio codecs
  * (`VideoCodecSpec` drives real AVIs end-to-end: parse → stride-sample
  * → per-frame pHash → scene-cut keyframes).
  */
object VideoCodec {

  /** Parsed container: frame cadence + dimensions + the raw JPEG payload
    * of every '00dc' video chunk, in stream order. Payloads stay
    * UNDECODED — decode cost is paid per sampled frame, not per parse. */
  final case class Avi(
      usPerFrame: Long,
      width: Int,
      height: Int,
      frames: Vector[Array[Byte]])

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse an AVI: walk the RIFF chunk tree, read `avih` for cadence and
    * dimensions, collect every `00dc`/`00db` movi payload. Tolerates the
    * chunk layouts real muxers emit (padding to even sizes, optional
    * idx1, nested LISTs in any order). */
  def parseAvi(bytes: Array[Byte]): Avi = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "AVI ", "not a RIFF/AVI payload")
    var usPerFrame = 0L
    var width = 0
    var height = 0
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(bytes, off)
        val size = u32(bytes, off + 4).toInt
        val body = off + 8
        // The size field is attacker-controlled bytes: a value ≥ 2^31 goes
        // negative through .toInt (off would stop advancing — infinite
        // loop), and an oversized one would surface as a raw copyOfRange
        // error. Fail fast with a diagnosis instead.
        require(size >= 0 && body.toLong + size <= end,
          s"truncated/corrupt AVI: chunk '$id' at offset $off declares " +
            s"size ${u32(bytes, off + 4)} but only ${end - body} bytes remain")
        id match {
          case "LIST" => walk(body + 4, body + size) // skip the list type
          case "avih" =>
            usPerFrame = u32(bytes, body)
            width = u32(bytes, body + 32).toInt
            height = u32(bytes, body + 36).toInt
          case "00dc" | "00db" =>
            frames += java.util.Arrays.copyOfRange(bytes, body, body + size)
          case _ => () // strh/strf/idx1/JUNK: nothing the dataflow needs
        }
        off = body + size + (size & 1) // chunks pad to even
      }
    }
    walk(12, bytes.length)
    Avi(usPerFrame, width, height, frames.result())
  }

  /** m02's stride sampling on the real container: parse once, DECODE only
    * every `stride`-th frame to grayscale. Work = ceil(n/stride) JPEG
    * decodes. Returns (frame_index, gray pixels) with the container's
    * dimensions. */
  def sampleFrames(bytes: Array[Byte], stride: Int): Vector[(Int, Array[Int])] = {
    require(stride > 0)
    val avi = parseAvi(bytes)
    avi.frames.zipWithIndex.collect { case (jpeg, i) if i % stride == 0 =>
      (i, ImageCodec.decodeGray(jpeg)._3)
    }
  }

  /** m08's keyframe selection on real bytes: per-frame 64-bit pHash, a
    * frame is a scene cut when its hash jumps ≥ `minJump` Hamming bits
    * from the previous frame (frame 0 always keys). Per-doc work is one
    * decode + DCT per frame — bounded by the clip's own frame count. */
  def keyframes(bytes: Array[Byte], minJump: Int = 12): Vector[Int] = {
    val hashes = parseAvi(bytes).frames.map(ImageCodec.phash64)
    hashes.zipWithIndex.collect { case (h, i)
      if i == 0 || java.lang.Long.bitCount(h ^ hashes(i - 1)) >= minJump => i
    }
  }

  // ---------- fixture encoder ----------

  private def le32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def cc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cc(out, id); le32(out, body.length); out.write(body)
    if ((body.length & 1) == 1) out.write(0)
    out.toByteArray
  }
  private def list(typ: String, bodies: Array[Byte]*): Array[Byte] = {
    val inner = bodies.foldLeft(Array.emptyByteArray)(_ ++ _)
    val out = new ByteArrayOutputStream()
    cc(out, "LIST"); le32(out, inner.length + 4L); cc(out, typ); out.write(inner)
    out.toByteArray
  }

  /** Grayscale frames → JPEG bytes via the JDK writer. */
  def encodeJpeg(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = pixel(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Deterministic minimal MJPEG AVI for fixtures/specs: standard
    * hdrl(avih + strl(strh/strf)) + movi('00dc' per frame) + idx1, the
    * layout `parseAvi` (and any real demuxer) reads back. */
  def encodeAviMjpeg(w: Int, h: Int, fps: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    val usPerFrame = 1000000L / fps
    val maxFrame = if (jpegFrames.isEmpty) 0 else jpegFrames.map(_.length).max
    val avih = {
      val out = new ByteArrayOutputStream()
      le32(out, usPerFrame); le32(out, maxFrame.toLong * fps); le32(out, 0)
      le32(out, 0x10 /* AVIF_HASINDEX */); le32(out, jpegFrames.size)
      le32(out, 0); le32(out, 1); le32(out, maxFrame)
      le32(out, w); le32(out, h)
      (0 until 4).foreach(_ => le32(out, 0))
      out.toByteArray
    }
    val strh = {
      val out = new ByteArrayOutputStream()
      cc(out, "vids"); cc(out, "MJPG"); le32(out, 0); le32(out, 0)
      le32(out, 0); le32(out, 1); le32(out, fps); le32(out, 0)
      le32(out, jpegFrames.size); le32(out, maxFrame); le32(out, ~0L & 0xffffffffL)
      le32(out, 0); le32(out, 0); le32(out, ((h & 0xffffL) << 16) | (w & 0xffffL))
      out.toByteArray
    }
    val strf = {
      val out = new ByteArrayOutputStream()
      le32(out, 40); le32(out, w); le32(out, h); le32(out, (24L << 16) | 1L)
      cc(out, "MJPG"); le32(out, w.toLong * h * 3); le32(out, 0); le32(out, 0)
      le32(out, 0); le32(out, 0)
      out.toByteArray
    }
    val movi = jpegFrames.map(f => chunk("00dc", f))
    val idx1 = {
      val out = new ByteArrayOutputStream()
      var off = 4L // offsets are relative to the 'movi' fourcc
      jpegFrames.foreach { f =>
        cc(out, "00dc"); le32(out, 0x10 /* keyframe */); le32(out, off)
        le32(out, f.length)
        off += 8 + f.length + (f.length & 1)
      }
      out.toByteArray
    }
    val riffBody =
      list("hdrl", chunk("avih", avih),
        list("strl", chunk("strh", strh), chunk("strf", strf))) ++
      list("movi", movi: _*) ++
      chunk("idx1", idx1)
    val out = new ByteArrayOutputStream()
    cc(out, "RIFF"); le32(out, riffBody.length + 4L); cc(out, "AVI ")
    out.write(riffBody)
    out.toByteArray
  }
}
