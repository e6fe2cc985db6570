package graft.operators

import java.awt.image.BufferedImage

/** REAL pure-JVM [[Multimodal.FrameDecoder]] for the YUV4MPEG2
  * (`.y4m`) stream format — the SPI's bundled deployment example.
  * `ffmpeg -i clip.mp4 -f yuv4mpeg clip.y4m` turns any compressed
  * container into this format, so the MP4 path has a working recipe
  * with zero native dependencies: transcode at ingest, decode here.
  * (For in-container H.264 decode, adapt a JNI binding behind this
  * same trait — see README "Video decoding SPI".)
  *
  * Format (mjpegtools y4m spec): one ASCII stream header
  * `YUV4MPEG2 W<w> H<h> F<n>:<d> ... [C<space>]\n`, then per frame a
  * `FRAME[ params]\n` marker followed by raw planar YUV. Supported
  * colorspaces: C420 and variants (C420jpeg/C420paldv/C420mpeg2 —
  * chroma-siting differences are sub-pixel and ignored, stated),
  * C422, C444, Cmono; absent C defaults to 4:2:0 per the spec.
  *
  * Conversion is the standard BT.601 limited-range integer path
  * (R = (298(Y−16) + 409(V−128) + 128) >> 8, etc.) — deterministic
  * integer math, no floats, so frame hashes are bit-stable across
  * JVMs. Declines (Nil) anything without the magic, with an unknown
  * colorspace, or with implausible dimensions; never throws on
  * truncated payloads (frames decoded so far are returned) — the
  * SPI's never-throw contract.
  */
final class Y4mFrameDecoder extends Multimodal.FrameDecoder {

  /** Dimension sanity bound: a hostile/corrupt header must not drive
    * a multi-GB allocation inside an executor task. 16384² ≈ 268 M px
    * is beyond any real y4m use. */
  private val MaxDim = 16384

  override def decode(bytes: Array[Byte]): Seq[BufferedImage] = {
    val magic = "YUV4MPEG2 "
    if (bytes.length < magic.length ||
      !magic.zipWithIndex.forall { case (c, i) => bytes(i) == c.toByte })
      return Nil
    val headerEnd = bytes.indexOf('\n'.toByte)
    if (headerEnd < 0) return Nil
    val header = new String(bytes, 0, headerEnd,
      java.nio.charset.StandardCharsets.US_ASCII)
    var w = -1; var h = -1; var cs = "420"
    header.split(' ').drop(1).foreach { tag =>
      if (tag.nonEmpty) tag.charAt(0) match {
        case 'W' => w = tag.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = tag.drop(1).toIntOption.getOrElse(-1)
        case 'C' => cs = tag.drop(1)
        case _ => () // F (rate), I (interlace), A (aspect), X — unused
      }
    }
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return Nil
    // chroma plane dims per colorspace; None = unsupported → decline
    val chroma: Option[(Int, Int)] =
      if (cs.startsWith("420")) Some(((w + 1) / 2, (h + 1) / 2))
      else if (cs.startsWith("422")) Some(((w + 1) / 2, h))
      else if (cs.startsWith("444") && cs != "444alpha") Some((w, h))
      else if (cs == "mono") Some((0, 0))
      else None
    if (chroma.isEmpty) return Nil
    val (cw, ch) = chroma.get
    val ySize = w * h
    val cSize = cw * ch
    val frames = Vector.newBuilder[BufferedImage]
    var pos = headerEnd + 1
    val frameMagic = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var ok = true
    while (ok && pos < bytes.length) {
      // FRAME marker + optional params up to '\n'
      if (pos + frameMagic.length > bytes.length ||
        !frameMagic.indices.forall(i => bytes(pos + i) == frameMagic(i))) {
        ok = false
      } else {
        var nl = pos + frameMagic.length
        while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
        val dataStart = nl + 1
        // bound check in Long: dataStart near 2 GiB plus a large frame
        // overflows Int, slipping past the truncation guard straight
        // into an AIOOBE inside toRgb (never-throw contract)
        if (nl >= bytes.length ||
          dataStart.toLong + ySize.toLong + 2L * cSize > bytes.length)
          ok = false // truncated: keep frames decoded so far
        else {
          frames += toRgb(bytes, dataStart, w, h, cw, ch)
          pos = dataStart + ySize + 2 * cSize
        }
      }
    }
    frames.result()
  }

  private def toRgb(b: Array[Byte], off: Int, w: Int, h: Int,
      cw: Int, ch: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val uOff = off + w * h
    val vOff = uOff + cw * ch
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var y = 0
    while (y < h) {
      val cy = if (ch == 0) 0 else y * ch / h
      var x = 0
      while (x < w) {
        val yy = b(off + y * w + x) & 0xff
        val (u, v) =
          if (cw == 0) (128, 128) // mono
          else {
            val cx = x * cw / w
            (b(uOff + cy * cw + cx) & 0xff, b(vOff + cy * cw + cx) & 0xff)
          }
        val c = yy - 16; val d = u - 128; val e = v - 128
        val r = clamp((298 * c + 409 * e + 128) >> 8)
        val g = clamp((298 * c - 100 * d - 208 * e + 128) >> 8)
        val bl = clamp((298 * c + 516 * d + 128) >> 8)
        img.setRGB(x, y, (r << 16) | (g << 8) | bl)
        x += 1
      }
      y += 1
    }
    img
  }
}
