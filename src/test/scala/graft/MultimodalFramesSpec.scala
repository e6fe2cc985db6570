package graft

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO}

import graft.operators.Multimodal

/** Real video-frame extraction (pure-JDK codecs): animated GIF frames
  * composite and hash frame-by-frame; MJPEG streams split on SOI/EOI
  * into member JPEGs; sampling keeps every Nth frame; payloads no
  * codec opens emit an auditable marker row. Frame hashes ride the
  * SAME pHash core as still images, so a planted shared frame across
  * two clips surfaces through the frame near-dup band join.
  */
class MultimodalFramesSpec extends SparkSpec {
  import spark.implicits._

  // 256-level grayscale palette → indexed frames → GIF encodes them
  // LOSSLESSLY (no quantizer involved), so frame pHashes are exactly
  // reproducible from the PNG-encoded originals
  private val grayPalette: IndexColorModel = {
    val g = (0 until 256).map(_.toByte).toArray
    new IndexColorModel(8, 256, g, g, g)
  }

  /** A deterministic structured frame: checkerboard of period `p`
    * with a diagonal gradient (distinct per (p, phase) — flat frames
    * would all hash to the degenerate all-zero pHash). */
  private def frame(w: Int, h: Int, p: Int, phase: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val check = if (((x / p) + (y / p) + phase) % 2 == 0) 64 else 192
      raster.setSample(x, y, 0, (check + (x + y) % 32) & 0xff)
    }
    img
  }

  // NOTE: hashing expected frames goes through pHashOfImage on the
  // in-memory original, NOT a PNG round-trip — ImageIO writes an
  // indexed-gray image as a GRAYSCALE png, and getRGB on the re-read
  // TYPE_BYTE_GRAY applies a gray→sRGB color conversion that shifts
  // pixel values by up to ~70 (measured), which is a property of the
  // PNG encode choice, not of the frame path under test.

  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  private def jpeg(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val rgb = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    val g = rgb.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
    ImageIO.write(rgb, "jpg", baos)
    baos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("animated GIF: every frame decodes, composites, and hashes like its still-image original") {
    val originals = Seq(frame(64, 48, 8, 0), frame(64, 48, 8, 1), frame(64, 48, 16, 0))
    val gif = animatedGif(originals)

    val media = Seq((10L, gif)).toDF("id", "bytes")
    val rows = Multimodal.extractFrames(
      Multimodal.fromBinary(media, "id", "bytes", "video")).collect()
      .sortBy(_.frame_idx)
    assert(rows.length === 3, s"expected 3 frames, got ${rows.toSeq}")
    assert(rows.forall(_.decoded))
    assert(rows.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    assert(rows.forall(r => r.width === 64 && r.height === 48))
    // lossless indexed GIF ⇒ frame pHash == pHash of the original pixels
    val expected = originals.map(Multimodal.pHashOfImage)
    assert(rows.map(_.phash.get).toSeq === expected,
      "frame pHash diverged from the still-image pHash of the same pixels")
    // and the three frames are mutually distinguishable
    assert(expected.distinct.length === 3)
  }

  test("frame sampling keeps every Nth frame") {
    val gif = animatedGif((0 until 5).map(i => frame(32, 32, 4, i % 2)))
    val media = Seq((1L, gif)).toDF("id", "bytes")
    val idx = Multimodal.extractFrames(
      Multimodal.fromBinary(media, "id", "bytes", "video"), everyNFrames = 2)
      .collect().map(_.frame_idx).sorted.toSeq
    assert(idx === Seq(0, 2, 4))
  }

  /** Mid-frequency stripe frames for the lossy-codec test: 16-px bands
    * survive JPEG (whole 8×8 JPEG blocks are flat) AND land in the
    * strong low bins of the hash's pooled DCT, so the sign bits are
    * decisive. Both extremes fail here — a pixel checkerboard loses
    * its quantized high frequencies, and a featureless gradient makes
    * most AC coefficients ~0 so their signs are noise. */
  private def stripeFrame(w: Int, h: Int, horizontal: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val band = (if (horizontal) y else x) / 16
      raster.setSample(x, y, 0, if (band % 2 == 0) 64 else 192)
    }
    img
  }

  test("MJPEG: SOI/EOI splitting recovers each member JPEG as a frame") {
    val f0 = stripeFrame(48, 48, horizontal = true)
    val f1 = stripeFrame(48, 48, horizontal = false)
    val mjpeg = jpeg(f0) ++ jpeg(f1)
    val media = Seq((2L, mjpeg)).toDF("id", "bytes")
    val rows = Multimodal.extractFrames(
      Multimodal.fromBinary(media, "id", "bytes", "video")).collect()
      .sortBy(_.frame_idx)
    assert(rows.length === 2)
    assert(rows.forall(r => r.decoded && r.width === 48 && r.height === 48))
    // JPEG is lossy: the frame hash must sit in a small Hamming ball of
    // the original's hash, and the two frames must not collide. The
    // checkerboard is a worst case for JPEG's high-frequency
    // quantization, so the ball is wider than the near-dup radius 3 —
    // what matters is original-vs-decoded ≪ unrelated (~32 bits).
    val orig = Seq(f0, f1).map(Multimodal.pHashOfImage)
    rows.zip(orig).foreach { case (r, o) =>
      assert(hamming(r.phash.get, o) <= 10,
        s"lossy frame drifted ${hamming(r.phash.get, o)} bits from original")
    }
    assert(hamming(rows(0).phash.get, rows(1).phash.get) > 10)
  }

  /** Wrap a JPEG so it carries an EXIF-style APP1 segment whose
    * payload embeds a COMPLETE nested JPEG (the thumbnail every
    * camera writes): SOI, then FFE1 + length + "Exif\0\0" + thumbnail
    * bytes, then the rest of the original stream. A raw SOI/EOI byte
    * scan cuts the frame at the thumbnail's EOI inside the segment;
    * the marker-walking splitter must skip the payload by length. */
  private def withExifThumbnail(full: Array[Byte], thumb: Array[Byte]): Array[Byte] = {
    val header = Array[Byte]('E', 'x', 'i', 'f', 0, 0)
    val len = 2 + header.length + thumb.length // length field counts itself
    require(len <= 0xffff, "thumbnail too large for one APP1 segment")
    val out = new ByteArrayOutputStream()
    out.write(full, 0, 2) // SOI
    out.write(0xff); out.write(0xe1)
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(header)
    out.write(thumb)
    out.write(full, 2, full.length - 2)
    out.toByteArray
  }

  test("a JPEG with an embedded EXIF thumbnail decodes as ONE frame (marker walk, not byte scan)") {
    val big = stripeFrame(48, 48, horizontal = true)
    val photo = withExifThumbnail(jpeg(big), jpeg(stripeFrame(16, 16, horizontal = false)))
    // splitter: exactly one segment spanning the whole payload
    val segs = Multimodal.mjpegFrameBytes(photo)
    assert(segs.length === 1,
      s"thumbnail EOI split the frame: got ${segs.length} segments")
    assert(segs.head.length === photo.length, "segment does not span the full photo")
    // end-to-end: one decoded frame at the FULL image's size and hash
    val media = Seq((9L, photo)).toDF("id", "bytes")
    val rows = Multimodal.extractFrames(
      Multimodal.fromBinary(media, "id", "bytes", "video")).collect()
    assert(rows.length === 1)
    assert(rows.head.decoded && rows.head.width === 48 && rows.head.height === 48)
    assert(hamming(rows.head.phash.get, Multimodal.pHashOfImage(big)) <= 10)
  }

  test("an MJPEG whose members carry thumbnails still splits into its true frames") {
    val f0 = stripeFrame(48, 48, horizontal = true)
    val f1 = stripeFrame(48, 48, horizontal = false)
    val thumb = jpeg(stripeFrame(16, 16, horizontal = true))
    val mjpeg = withExifThumbnail(jpeg(f0), thumb) ++ withExifThumbnail(jpeg(f1), thumb)
    val segs = Multimodal.mjpegFrameBytes(mjpeg)
    assert(segs.length === 2, s"expected 2 member frames, got ${segs.length}")
    val media = Seq((10L, mjpeg)).toDF("id", "bytes")
    val rows = Multimodal.extractFrames(
      Multimodal.fromBinary(media, "id", "bytes", "video")).collect()
      .sortBy(_.frame_idx)
    assert(rows.length === 2)
    assert(rows.forall(r => r.decoded && r.width === 48 && r.height === 48))
  }

  test("a plugged-in FrameDecoder carries a no-JDK-codec container end-to-end through pHash and near-dups") {
    // two fake "MP4 clips": clip 20 has 2 frames (H,V), clip 21 has
    // 2 frames (V,H) -- each clip shares its frames with the other,
    // so the cross-clip near-dup join must surface pairs; junk stays
    // an auditable marker row even WITH the plugin installed
    val clipA = Array[Byte]('F', 'A', 'K', '0', 2, 0)
    val clipB = Array[Byte]('F', 'A', 'K', '0', 2, 1)
    val junk = Array.tabulate[Byte](64)(i => (i * 53).toByte)
    val media = Seq((20L, clipA), (21L, clipB), (22L, junk))
      .toDF("id", "bytes")
    val frames = Multimodal.extractFrames(
      Multimodal.fromBinary(media, "id", "bytes", "video"),
      decoders = Seq(new FakeMp4Decoder))
    val rows = frames.collect()
    assert(rows.count(r => r.media_id == 20L && r.decoded) === 2)
    assert(rows.count(r => r.media_id == 21L && r.decoded) === 2)
    val marker = rows.filter(_.media_id == 22L)
    assert(marker.length === 1 && !marker.head.decoded &&
      marker.head.frame_idx === -1,
      "junk must stay an undecoded marker row even with a plugin")
    // frames from the SPI path hash with the SAME core as stills
    val expectH = Multimodal.pHashOfImage(stripeFrame(48, 48, horizontal = true))
    assert(rows.filter(_.decoded).map(_.phash.get).contains(expectH))
    // and ride the standard cross-clip near-dup band join
    val dups = Multimodal.frameNearDups(frames, maxHamming = 0).collect()
    assert(dups.length === 2,
      s"expected the 2 shared frames as cross-clip pairs, got ${dups.toSeq}")
    assert(dups.forall(r => r.getLong(0) == 20L && r.getLong(2) == 21L))
  }

  test("undecodable payload emits one marker row, never a fake hash") {
    val junk = Array.tabulate[Byte](256)(i => (i * 37).toByte)
    val media = Seq((3L, junk)).toDF("id", "bytes")
    val rows = Multimodal.extractFrames(
      Multimodal.fromBinary(media, "id", "bytes", "video")).collect()
    assert(rows.length === 1)
    assert(!rows.head.decoded && rows.head.phash.isEmpty && rows.head.frame_idx === -1)
  }

  test("a planted shared frame across two clips surfaces in frameNearDups; distinct frames do not") {
    val shared = frame(64, 48, 8, 0)
    val gifA = animatedGif(Seq(shared, frame(64, 48, 16, 1)))
    val gifB = animatedGif(Seq(frame(64, 48, 32, 0), shared))
    val media = Seq((100L, gifA), (200L, gifB)).toDF("id", "bytes")
    val frames = Multimodal.extractFrames(
      Multimodal.fromBinary(media, "id", "bytes", "video"))
    val pairs = Multimodal.frameNearDups(frames, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(pairs.toSeq === Seq((100L, 0, 200L, 1)),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
  }
}

/** Fake SPI decoder for payloads starting with "FAK0": "frames" are
  * deterministic stripe images selected by the 5th byte — stands in
  * for an MP4 codec a deployment would plug in. Top-level and
  * reference-free so the instance serializes into task closures (the
  * FrameDecoder contract). The stripes match the spec's stripeFrame
  * pixel-for-pixel in luma, so pHashes are directly comparable. */
private class FakeMp4Decoder extends Multimodal.FrameDecoder {
  private def stripe(horizontal: Boolean): BufferedImage = {
    val img = new BufferedImage(48, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 48) {
      val band = (if (horizontal) y else x) / 16
      val v = if (band % 2 == 0) 64 else 192
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }
  override def decode(bytes: Array[Byte]): Seq[BufferedImage] =
    if (bytes.length < 6 || new String(bytes.take(4), "ISO-8859-1") != "FAK0") Nil
    else (0 until bytes(4).toInt).map(i => stripe((bytes(5) + i) % 2 == 0))
}
