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
  * an amplitude histogram. Bytes no JDK reader recognizes — and media
  * kinds without a JDK codec (video) — fall back to `stubDecode`, a
  * deterministic byte histogram, so the pipeline never fails on
  * malformed payloads; `decoded` records which path ran. The
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
      if (img == null) None
      else {
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
        Some(bits)
      }
    } catch { case _: Exception => None }

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
    * frame index (explode of a sequence — no decode involved). */
  def frameSamplePlan(media: DataFrame, everyNFrames: Int, frameCountCol: String): DataFrame =
    media.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)), lit(everyNFrames))))

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
