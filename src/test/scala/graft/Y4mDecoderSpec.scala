package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import graft.operators.{Multimodal, Y4mFrameDecoder}

/** The bundled REAL FrameDecoder SPI example: YUV4MPEG2. Payloads are
  * built byte-for-byte against the y4m spec (header, FRAME markers,
  * raw planes) — exactly what `ffmpeg -f yuv4mpeg` emits — and
  * decoded pixel values are checked against the BT.601 limited-range
  * integer conversion by hand. The end-to-end case goes through
  * [[Multimodal.extractFrames]] with NO explicit decoders, proving
  * ServiceLoader discovery via
  * META-INF/services/graft.operators.Multimodal$FrameDecoder. */
class Y4mDecoderSpec extends SparkSpec {
  import spark.implicits._

  /** One y4m stream: header + frames of (Y, U, V) plane fills. */
  private def y4m(w: Int, h: Int, cs: String,
      frames: Seq[(Int, Int, Int)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C$cs\n".getBytes(US_ASCII))
    val (cw, ch) =
      if (cs.startsWith("420")) ((w + 1) / 2, (h + 1) / 2)
      else if (cs.startsWith("422")) ((w + 1) / 2, h)
      else if (cs == "mono") (0, 0)
      else (w, h)
    frames.foreach { case (yv, uv, vv) =>
      out.write("FRAME\n".getBytes(US_ASCII))
      (1 to w * h).foreach(_ => out.write(yv))
      (1 to 2 * cw * ch).foreach(i => out.write(if (i <= cw * ch) uv else vv))
    }
    out.toByteArray
  }

  private val dec = new Y4mFrameDecoder

  test("decodes C420 frames with exact BT.601 limited-range values") {
    // Y=81 U=90 V=240 is the canonical BT.601 red
    val frames = dec.decode(y4m(4, 4, "420",
      Seq((235, 128, 128), (16, 128, 128), (81, 90, 240))))
    assert(frames.size === 3)
    assert(frames.forall(f => f.getWidth == 4 && f.getHeight == 4))
    assert((frames(0).getRGB(0, 0) & 0xffffff) === 0xffffff, "white")
    assert((frames(1).getRGB(3, 3) & 0xffffff) === 0x000000, "black")
    assert((frames(2).getRGB(1, 2) & 0xffffff) === 0xff0000, "red")
  }

  test("C422, C444 and mono plane layouts all decode") {
    Seq("422", "444", "mono").foreach { cs =>
      val fs = dec.decode(y4m(6, 4, cs, Seq((128, 128, 128))))
      assert(fs.size === 1, cs)
      // Y=128 gray: (298*112+128)>>8 = 130
      assert((fs.head.getRGB(2, 1) & 0xffffff) === 0x828282, cs)
    }
  }

  test("declines non-y4m, unknown colorspace, and absurd dims; truncation keeps whole frames") {
    assert(dec.decode("not a video".getBytes(US_ASCII)).isEmpty)
    assert(dec.decode(y4m(4, 4, "411", Seq((128, 128, 128)))).isEmpty,
      "unsupported colorspace must decline, not guess")
    assert(dec.decode(
      "YUV4MPEG2 W99999 H4 C420\nFRAME\n".getBytes(US_ASCII)).isEmpty)
    val two = y4m(4, 4, "420", Seq((235, 128, 128), (16, 128, 128)))
    val cut = java.util.Arrays.copyOfRange(two, 0, two.length - 5)
    val fs = dec.decode(cut)
    assert(fs.size === 1, "truncated second frame dropped, first kept")
  }

  test("extractFrames picks up y4m through ServiceLoader with no explicit decoder") {
    val clip = y4m(8, 8, "420", Seq((235, 128, 128), (16, 128, 128)))
    val media = Seq(
      Multimodal.MediaRow(1L, "video", clip, 8, 8, 0, "y4m"),
      Multimodal.MediaRow(2L, "video", "junk-payload".getBytes(US_ASCII),
        0, 0, 0, "bin")).toDS()
    val rows = Multimodal.extractFrames(media).collect()
    val decoded = rows.filter(_.media_id == 1L)
    assert(decoded.length === 2 && decoded.forall(_.decoded),
      "both y4m frames must decode via the ServiceLoader-registered decoder")
    assert(decoded.forall(r => r.width == 8 && r.height == 8))
    val marker = rows.filter(_.media_id == 2L)
    assert(marker.length === 1 && !marker.head.decoded &&
      marker.head.frame_idx === -1, "undecodable payload keeps its audit row")
  }
}
