package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs as partition-batched typed
  * `mapPartitions` (the Scala analog of `mapInPandas` — one iterator
  * per partition, so per-batch setup like model/codec init happens
  * once per partition, not per row).
  *
  * Image rows decode for REAL via `javax.imageio` (PNG/JPEG/GIF/BMP
  * ship with the JDK — no external codec needed): pixel dimensions and
  * a 16-bin luminance histogram. Audio rows decode for real via
  * `javax.sound.sampled` (WAV/AIFF/AU): sample rate, frame count, and
  * an amplitude histogram. Video frames decode for real where a pure-
  * JDK codec exists — animated GIF (composited frames) and MJPEG
  * (SOI/EOI-split JPEGs) via [[extractFrames]]. Only bytes NO JDK
  * reader recognizes fall back to `stubDecode`, a deterministic byte
  * histogram, so the pipeline never fails on malformed payloads;
  * `decoded` records which path ran. The
  * Spark-side plumbing — schema, encoders, partitioning, batch shape,
  * null handling — is identical for every path.
  */
object Multimodal {

  /** Typed media row: the binary payload + metadata columns. */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, format: String)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      histogram: Array[Double], aspect_ratio: Double,
      width: Int, height: Int, decoded: Boolean,
      sample_rate: Int = 0, n_frames: Long = 0L)

  /** Fallback decode: deterministic 16-bin byte histogram
    * (L1-normalized) — runs when no real codec applies, keeping the
    * batch shape and schema identical to the decoded path. */
  def stubDecode(bytes: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    if (bytes != null && bytes.nonEmpty) {
      bytes.foreach(b => bins((b & 0xff) >> 4) += 1.0)
      val n = bytes.length.toDouble
      (0 until 16).foreach(i => bins(i) /= n)
    }
    bins
  }

  final case class DecodedImage(width: Int, height: Int, histogram: Array[Double])

  /** Real image decode via the JDK's ImageIO: pixel dims + L1-normalized
    * 16-bin luminance histogram (integer BT.601 luma — deterministic
    * across platforms). Returns None for unrecognizable bytes. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val bins = new Array[Double](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            bins(lum >> 4) += 1.0
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        (0 until 16).foreach(i => bins(i) /= n)
        Some(DecodedImage(w, h, bins))
      }
    } catch { case _: Exception => None }

  final case class DecodedAudio(
      sampleRate: Int, nFrames: Long, channels: Int, histogram: Array[Double])

  /** Real audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU
    * ship with the JDK): sample rate, frame count, and an L1-normalized
    * 16-bin absolute-amplitude histogram. Non-PCM-16 input is converted
    * through AudioSystem first. Returns None for unrecognizable bytes. */
  def decodeAudio(bytes: Array[Byte]): Option[DecodedAudio] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val src = in.getFormat
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(fmt, in)
      val data = pcm.readAllBytes()
      pcm.close()
      val bins = new Array[Double](16)
      val nSamples = data.length / 2
      var i = 0
      while (i < nSamples) {
        val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
        val mag = math.min(math.abs(s.toInt), 32767)
        bins(mag >> 11) += 1.0 // 32768 / 16 = 2048 = 1 << 11
        i += 1
      }
      if (nSamples > 0) (0 until 16).foreach(j => bins(j) /= nSamples.toDouble)
      Some(DecodedAudio(src.getSampleRate.toInt,
        nSamples.toLong / math.max(src.getChannels, 1), src.getChannels, bins))
    } catch { case _: Exception => None }

  /** Partition-batched feature extraction. One pass per partition;
    * decoder state (codec handle, model session) initializes once per
    * partition at the top of the iterator lambda. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (codec handle, model session)
      rows.map { r =>
        val nBytes = if (r.bytes == null) 0L else r.bytes.length.toLong
        val img = if (r.kind == "image") decodeImage(r.bytes) else None
        val aud = if (r.kind == "audio") decodeAudio(r.bytes) else None
        (img, aud) match {
          case (Some(d), _) =>
            MediaFeatures(r.media_id, r.kind, nBytes, d.histogram,
              aspect_ratio = if (d.height != 0) d.width.toDouble / d.height else 0.0,
              width = d.width, height = d.height, decoded = true)
          case (_, Some(a)) =>
            MediaFeatures(r.media_id, r.kind, nBytes, a.histogram,
              aspect_ratio = 0.0, width = 0, height = 0, decoded = true,
              sample_rate = a.sampleRate, n_frames = a.nFrames)
          case _ =>
            MediaFeatures(r.media_id, r.kind, nBytes, stubDecode(r.bytes),
              aspect_ratio = if (r.height != 0) r.width.toDouble / r.height else 0.0,
              width = r.width, height = r.height, decoded = false)
        }
      }
    }
  }

  /** 64-bit perceptual hash (pHash): decode → 32×32 average-pooled
    * luma grid → 2-D DCT → sign-of-median over the top-left 8×8
    * low-frequency block (DC excluded) → 64 bits. Perceptually-close
    * images (recompression, mild edits, small overlays) land within a
    * small Hamming ball; unrelated images are ~32 bits apart. Returns
    * None when no codec recognizes the bytes — a stub hash would
    * poison dedup with false matches, so undecodable media is
    * explicitly UNHASHED rather than silently bucketed. */
  def pHash64(bytes: Array[Byte]): Option[Long] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None else Some(pHashOfImage(img))
    } catch { case _: Exception => None }

  /** [[pHash64]]'s hash core over an already-decoded image — shared by
    * the single-image path and the per-frame video path, so a frame's
    * hash is definitionally comparable with a still image's. */
  def pHashOfImage(img: java.awt.image.BufferedImage): Long = {
        val n = 32
        val w = img.getWidth; val h = img.getHeight
        def luma(x: Int, y: Int): Int = {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        }
        // average-pool the full image into an n×n luma grid (integer
        // BT.601 luma, same weights as decodeImage)
        val grid = Array.ofDim[Double](n, n)
        val cnt = Array.ofDim[Long](n, n)
        var y = 0
        while (y < h) {
          val gy = y * n / h
          var x = 0
          while (x < w) {
            grid(gy)(x * n / w) += luma(x, y); cnt(gy)(x * n / w) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) {
            if (cnt(i)(j) > 0) grid(i)(j) /= cnt(i)(j)
            // images smaller than n in a dimension leave pooled cells
            // empty; fill by nearest-neighbor UPSAMPLING — a shared
            // all-zero comb would bias unrelated small images toward
            // each other (false near-dup pairs)
            else grid(i)(j) = luma(j * w / n, i * h / n).toDouble
            j += 1
          }
          i += 1
        }
        // 2-D DCT-II, keep the 8×8 low-frequency corner
        val k = 8
        val dct = Array.ofDim[Double](k, k)
        var u = 0
        while (u < k) {
          var v = 0
          while (v < k) {
            var s = 0.0
            var yy = 0
            while (yy < n) {
              var xx = 0
              while (xx < n) {
                s += grid(yy)(xx) *
                  math.cos((2 * yy + 1) * u * math.Pi / (2 * n)) *
                  math.cos((2 * xx + 1) * v * math.Pi / (2 * n))
                xx += 1
              }
              yy += 1
            }
            dct(u)(v) = s
            v += 1
          }
          u += 1
        }
        // median of the 64 coefficients EXCLUDING the DC term (it only
        // encodes global brightness), then sign bits
        val coefs = for { a <- 0 until k; b <- 0 until k if a != 0 || b != 0 }
          yield dct(a)(b)
        val sorted = coefs.sorted
        val median = sorted(sorted.length / 2)
        var bits = 0L
        var idx = 0
        for (a <- 0 until k; b <- 0 until k) {
          if ((a != 0 || b != 0) && dct(a)(b) > median) bits |= (1L << idx)
          idx += 1
        }
        bits
  }

  /** Image near-dup pairs by pHash Hamming ball: hash per partition
    * (one decode pass), band equi-join on 4×16-bit pHash slices (the
    * q99/q180 topology — pigeonhole guarantees hamming ≤ 3 pairs
    * collide; wider balls raise bands), popcount verify, canonical
    * (a < b) distinct pairs. Shuffles (media_id, 8-byte hash), never
    * pixels. Undecodable rows drop out before the join. */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media.mapPartitions { rows =>
      rows.flatMap(r => pHash64(r.bytes).map(hsh => (r.media_id, hsh)))
    }.toDF("media_id", "phash")
    val bands = hashes.select($"media_id", $"phash",
      graft.streaming.NearDupStream.packedBands($"phash").as("band"))
    val a = bands.select($"band", $"media_id".as("a"), $"phash".as("ha"))
    val b = bands.select($"band", $"media_id".as("b"), $"phash".as("hb"))
    a.join(b, Seq("band"))
      .filter($"a" < $"b")
      .select($"a", $"b",
        bit_count($"ha".bitwiseXOR($"hb")).cast("long").as("hamming"))
      .filter($"hamming" <= maxHamming)
      .distinct()
      .orderBy($"a", $"b")
  }

  /** REAL pixel resize: decode → deterministic nearest-neighbor
    * downsample → re-encode PNG. Nearest-neighbor by integer source
    * index (`sx = x·w div tw`), NOT an interpolating AWT scaler,
    * because bilinear/bicubic kernels have platform-varying rounding —
    * this output is byte-reproducible anywhere, which a training
    * pipeline needs for cache keys and dedup over derived images
    * (PNG encodes losslessly, so identical pixels ⇒ identical file).
    * Aspect ratio is preserved via the [[resizePlan]] rule (scale to
    * fit maxDim, never upscale). Runs in a partition-batched
    * mapPartitions like every decoder here; rows whose bytes don't
    * decode pass through as None. */
  final case class Resized(png: Array[Byte], width: Int, height: Int)

  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[Resized] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val tw = math.max(1, (w * scale).toInt)
        val th = math.max(1, (h * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < th) {
          val sy = (y.toLong * h / th).toInt
          var x = 0
          while (x < tw) {
            val sx = (x.toLong * w / tw).toInt
            out.setRGB(x, y, img.getRGB(sx, sy) & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        // dims ride along — decoding the fresh PNG again just to read
        // them back would double per-row CPU in the hot path
        Some(Resized(bos.toByteArray, tw, th))
      }
    } catch { case _: Exception => None }

  final case class ResizedRow(media_id: Long, resized: Array[Byte],
      target_width: Int, target_height: Int, decoded: Boolean)

  /** Distributed form of [[resizeImage]] over a media table. */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        resizeImage(r.bytes, maxDim) match {
          case Some(rz) =>
            ResizedRow(r.media_id, rz.png, rz.width, rz.height, decoded = true)
          case None => ResizedRow(r.media_id, Array.emptyByteArray, 0, 0, decoded = false)
        }
      }
    }
  }

  /** Metadata-only transforms stay declarative (no decode): */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(maxDim) / col("width"), lit(maxDim) / col("height"), lit(1.0))
    media
      .withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for video rows: one output row per sampled
    * frame index (explode of a sequence — no decode involved). For
    * payloads a JDK codec can open (animated GIF, MJPEG), the REAL
    * decode path is [[extractFrames]]; this plan remains for metadata-
    * only sampling of containers with no JDK codec. */
  def frameSamplePlan(media: DataFrame, everyNFrames: Int, frameCountCol: String): DataFrame =
    media.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)), lit(everyNFrames))))

  // ---- real frame extraction (pure-JDK codecs) -----------------------

  /** One decoded, sampled frame: its pixel dims and perceptual hash
    * (comparable with still-image pHashes — same core). `phash = None`
    * with `decoded = false` marks a payload no JDK codec opened. */
  final case class FrameRow(media_id: Long, frame_idx: Int,
      width: Int, height: Int, phash: Option[Long], decoded: Boolean)

  /** Decode a multi-frame payload into COMPOSITED frames with pure-JDK
    * codecs: animated GIF via ImageIO's multi-image reader (frames are
    * stored as dirty rects — each is drawn onto the logical-screen
    * canvas at its descriptor offset, so the emitted frames are what a
    * viewer shows; the rare restore-to-previous disposal is
    * approximated by draw-over), MJPEG via [[mjpegFrameBytes]]'s
    * marker-segment walk (EXIF/JFIF thumbnails — complete JPEGs
    * inside APP1 payloads — are skipped by segment length, never
    * mistaken for frame boundaries), and any single-image format as
    * its one frame. If no split segment decodes, the payload is
    * retried whole as a single image (belt-and-braces for JPEG
    * variants the splitter misjudges). Empty for true no-codec
    * containers — those stay on the [[stubDecode]]/[[frameSamplePlan]]
    * metadata path. */
  def decodeFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.length < 4) return Nil
    val isGif = bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'
    val isJpeg = (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
    try {
      if (isGif) gifFrames(bytes)
      else if (isJpeg) {
        val split = mjpegFrameBytes(bytes).flatMap { seg =>
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(seg)))
        }
        if (split.nonEmpty) split
        else Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))).toSeq
      }
      else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).toSeq
    } catch { case _: Exception => Nil }
  }

  private def gifFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    import java.awt.image.BufferedImage
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Nil
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, false) // keep metadata: frame offsets
      val n = reader.getNumImages(true)
      if (n <= 0) return Nil
      val first = reader.read(0)
      // canvas = logical screen (falls back to frame 0's size)
      var cw = first.getWidth
      var ch = first.getHeight
      try {
        val sm = reader.getStreamMetadata
        if (sm != null) {
          val root = sm.getAsTree("javax_imageio_gif_stream_1.0")
            .asInstanceOf[org.w3c.dom.Element]
          val lsd = root.getElementsByTagName("LogicalScreenDescriptor")
          if (lsd.getLength > 0) {
            val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
            cw = math.max(cw, e.getAttribute("logicalScreenWidth").toInt)
            ch = math.max(ch, e.getAttribute("logicalScreenHeight").toInt)
          }
        }
      } catch { case _: Exception => () } // offsets then default to 0,0
      val canvas = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
      val g = canvas.createGraphics()
      try {
        (0 until n).map { i =>
          val frame = if (i == 0) first else reader.read(i)
          var x = 0
          var y = 0
          try {
            val im = reader.getImageMetadata(i)
              .getAsTree("javax_imageio_gif_image_1.0")
              .asInstanceOf[org.w3c.dom.Element]
            val desc = im.getElementsByTagName("ImageDescriptor")
            if (desc.getLength > 0) {
              val e = desc.item(0).asInstanceOf[org.w3c.dom.Element]
              x = e.getAttribute("imageLeftPosition").toInt
              y = e.getAttribute("imageTopPosition").toInt
            }
          } catch { case _: Exception => () }
          g.drawImage(frame, x, y, null)
          val copy = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
          val cg = copy.createGraphics()
          try cg.drawImage(canvas, 0, 0, null) finally cg.dispose()
          copy
        }
      } finally g.dispose()
    } catch { case _: Exception => Nil }
    finally { reader.dispose(); iis.close() }
  }

  /** Split an MJPEG byte stream into its member JPEGs by WALKING the
    * marker-segment structure, not by scanning raw SOI/EOI byte
    * pairs: an ordinary camera JPEG embeds an EXIF/JFIF thumbnail —
    * a complete JPEG with its own EOI — inside a length-prefixed APP1
    * segment, so a raw byte scan cuts the frame at the thumbnail's
    * EOI and every resulting segment fails to decode. Here APPn/COM/
    * DQT/… payloads are skipped by their 2-byte length fields; only
    * inside entropy-coded data (after an SOS header, where 0xFF is
    * always escaped or a restart marker) does a byte scan for the
    * frame's true EOI run. A single plain JPEG yields one segment; a
    * malformed region resyncs to the next SOI (best-effort, matching
    * the decoder's tolerance). */
  private[graft] def mjpegFrameBytes(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    def u(i: Int): Int = bytes(i) & 0xff
    var i = 0
    while (i + 1 < bytes.length) {
      if (u(i) == 0xff && u(i + 1) == 0xd8) {
        val start = i
        var j = i + 2
        var inScan = false
        var end = -1
        var malformed = false
        while (!malformed && end < 0 && j + 1 < bytes.length) {
          if (!inScan) {
            if (u(j) != 0xff) malformed = true
            else {
              var k = j // skip 0xFF fill bytes before the marker code
              while (k + 1 < bytes.length && u(k + 1) == 0xff) k += 1
              if (k + 1 >= bytes.length) malformed = true
              else u(k + 1) match {
                case 0xd9 => end = k + 2 // EOI — the frame's own
                case 0xd8 => malformed = true // nested SOI at segment level
                case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
                  j = k + 2 // standalone marker, no length field
                case m =>
                  if (k + 3 >= bytes.length) malformed = true
                  else {
                    val len = (u(k + 2) << 8) | u(k + 3)
                    if (len < 2) malformed = true
                    else {
                      j = k + 2 + len // skip the payload wholesale
                      if (m == 0xda) inScan = true // SOS: entropy data next
                    }
                  }
              }
            }
          } else {
            // entropy-coded data: 0xFF is stuffed (FF 00) or a restart
            // marker; anything else ends the scan
            if (u(j) == 0xff) {
              val m = u(j + 1)
              if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) j += 2
              else if (m == 0xd9) end = j + 2
              else inScan = false // DNL / another SOS header follows
            } else j += 1
          }
        }
        if (end > 0) { out += java.util.Arrays.copyOfRange(bytes, start, end); i = end }
        else i = start + 2 // malformed or truncated: resync past this SOI
      } else i += 1
    }
    out.result()
  }

  /** Pluggable frame-decoder SPI: the seam for containers no JDK
    * codec opens (MP4/H.264, …). A deployment implements this against
    * its codec of choice (JNI FFmpeg binding, a hardware decoder) and
    * either passes instances to [[extractFrames]] or registers the
    * implementation under
    * `META-INF/services/graft.operators.Multimodal$FrameDecoder` for
    * `ServiceLoader` discovery — operator code never changes. Must be
    * Serializable: instances ship inside task closures; keep heavy
    * native state lazy/transient and initialize it on first decode
    * (once per executor, the partition-batched contract). */
  trait FrameDecoder extends Serializable {
    /** Frames for a payload this decoder understands, in display
      * order; Nil to decline and pass the payload on. Must never
      * throw for unrecognized bytes. */
    def decode(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage]
  }

  /** ServiceLoader-discovered [[FrameDecoder]]s (executor-side call —
    * each task's classloader sees the deployment's jars). */
  private def serviceDecoders(): Seq[FrameDecoder] = {
    import scala.jdk.CollectionConverters._
    try java.util.ServiceLoader
      .load(classOf[FrameDecoder], Thread.currentThread().getContextClassLoader)
      .asScala.toSeq
    catch { case _: Throwable => Nil }
  }

  /** REAL frame extraction over a media table: decode each payload's
    * frames (GIF/MJPEG/single-image, pure JDK), keep every
    * `everyNFrames`-th one, and hash it with the image pHash core —
    * the output feeds the same near-dup machinery as still images.
    * Payloads the built-in codecs decline go to `decoders` (explicit
    * [[FrameDecoder]] plugins, then ServiceLoader-registered ones) in
    * order — the MP4 seam. Partition-batched like every decoder here;
    * a payload NO decoder opens emits one undecoded marker row
    * (frame_idx = -1) so coverage is auditable downstream. Scale
    * shape: pixels never shuffle — each task decodes its partition's
    * payloads and emits (id, idx, dims, 8-byte hash) rows only. */
  def extractFrames(media: Dataset[MediaRow], everyNFrames: Int = 1,
      decoders: Seq[FrameDecoder] = Nil): Dataset[FrameRow] = {
    require(everyNFrames >= 1, "extractFrames: everyNFrames must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: plugin list built once per task
      val plugins = decoders ++ serviceDecoders()
      rows.flatMap { r =>
        val builtIn = decodeFrames(r.bytes)
        val frames =
          if (builtIn.nonEmpty) builtIn
          else plugins.iterator.map(d =>
            try d.decode(r.bytes) catch { case _: Exception => Nil })
            .find(_.nonEmpty).getOrElse(Nil)
        if (frames.isEmpty)
          Iterator.single(FrameRow(r.media_id, -1, 0, 0, None, decoded = false))
        else frames.iterator.zipWithIndex.collect {
          case (img, i) if i % everyNFrames == 0 =>
            FrameRow(r.media_id, i, img.getWidth, img.getHeight,
              Some(pHashOfImage(img)), decoded = true)
        }
      }
    }
  }

  /** Cross-media near-dup FRAME pairs (shared/stolen footage, repeated
    * intros): the [[imageNearDups]] band topology over per-frame
    * hashes. Same-media pairs are excluded (adjacent frames of one
    * clip are trivially close); `a_media < b_media` canonicalizes.
    * Shuffles (media_id, frame_idx, hash) — never pixels. */
  def frameNearDups(frames: Dataset[FrameRow], maxHamming: Int = 3): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val hashed = frames.filter(_.decoded).map(f => (f.media_id, f.frame_idx, f.phash.get))
      .toDF("media_id", "frame_idx", "phash")
    val bands = hashed.select($"media_id", $"frame_idx", $"phash",
      graft.streaming.NearDupStream.packedBands($"phash").as("band"))
    val a = bands.select($"band", $"media_id".as("a_media"),
      $"frame_idx".as("a_frame"), $"phash".as("ha"))
    val b = bands.select($"band", $"media_id".as("b_media"),
      $"frame_idx".as("b_frame"), $"phash".as("hb"))
    a.join(b, Seq("band"))
      .filter($"a_media" < $"b_media")
      .select($"a_media", $"a_frame", $"b_media", $"b_frame",
        bit_count($"ha".bitwiseXOR($"hb")).cast("long").as("hamming"))
      .filter($"hamming" <= maxHamming)
      .distinct()
      .orderBy($"a_media", $"a_frame", $"b_media", $"b_frame")
  }

  /** Build a media table from any binary + metadata source. Images and
    * docs share the pipeline — kind drives the decoder choice. */
  def fromBinary(df: DataFrame, idCol: String, bytesCol: String, kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(bytesCol).cast("binary").as("bytes"),
      lit(0).as("width"), lit(0).as("height"),
      lit(0).as("sample_rate"), lit("raw").as("format"))
      .as[MediaRow]
  }
}
