package graft

import graft.operators.{Multimodal, Skew}

class MultimodalSkewSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("multimodal: binary column → partition-batched stub features") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "")).toDF("id", "payload")
    val media = Multimodal.fromBinary(df, "id", "payload", "image")
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats.length == 2)
    assert(feats(0).n_bytes == 11L)
    assert(math.abs(feats(0).histogram.sum - 1.0) < 1e-9) // L1-normalized
    assert(feats(1).n_bytes == 0L && feats(1).histogram.sum == 0.0)
    // determinism: same bytes → same features
    val again = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats(0).histogram.toSeq == again(0).histogram.toSeq)
  }

  test("multimodal: real PNG bytes decode to pixel dims + luminance histogram") {
    import spark.implicits._
    // a real 4x2 PNG: left half pure black, right half pure white
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val df = Seq((1L, png), (2L, "not an image".getBytes)).toDF("id", "payload")
    val feats = Multimodal.extractFeatures(
      Multimodal.fromBinary(df, "id", "payload", "image"))
      .orderBy("media_id").collect()
    val d = feats(0)
    assert(d.decoded && d.width == 4 && d.height == 2 && d.aspect_ratio == 2.0)
    assert(d.histogram(0) == 0.5 && d.histogram(15) == 0.5) // half black, half white
    assert(d.histogram.sum == 1.0)
    // unrecognizable bytes fall back to the stub path, never fail
    assert(!feats(1).decoded && feats(1).width == 0)
    assert(math.abs(feats(1).histogram.sum - 1.0) < 1e-9)
  }

  test("multimodal: real WAV bytes decode to sample rate, frames, amplitude histogram") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // a real 8kHz mono PCM-16 WAV: 800 frames of a loud square wave
    val sampleRate = 8000
    val nFrames = 800
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s: Short = if (i % 16 < 8) 20000 else -20000
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate, 16, 1, 2, sampleRate, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val df = Seq((1L, wav), (2L, "not audio".getBytes)).toDF("id", "payload")
    val feats = Multimodal.extractFeatures(Multimodal.fromBinary(df, "id", "payload", "audio"))
      .orderBy("media_id").collect()
    assert(feats(0).decoded)
    assert(feats(0).sample_rate == sampleRate)
    assert(feats(0).n_frames == nFrames.toLong)
    // |20000| >> 11 = bin 9 holds every sample
    assert(math.abs(feats(0).histogram(9) - 1.0) < 1e-9)
    assert(!feats(1).decoded && feats(1).sample_rate == 0)
  }

  /** Deterministic gradient test image; `perturb` overwrites a small
    * corner block (a mild edit a near-dup detector must absorb).
    * Shared by the pHash tests — both must see the SAME pixels. */
  private def png(seed: Int, perturb: Int, size: Int = 64): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      val v = ((x * 2 + y * 3 + seed * 37) % 256 + 256) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    if (perturb > 0)
      for (y <- 0 until perturb; x <- 0 until perturb)
        img.setRGB(x, y, 0xff0000)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("multimodal: pHash is stable, tolerant to small edits, far for unrelated images") {
    val base = Multimodal.pHash64(png(1, 0)).get
    val same = Multimodal.pHash64(png(1, 0)).get
    val edited = Multimodal.pHash64(png(1, 4)).get
    val other = Multimodal.pHash64(png(9, 0)).get
    assert(base == same, "pHash must be deterministic")
    val editDist = java.lang.Long.bitCount(base ^ edited)
    val otherDist = java.lang.Long.bitCount(base ^ other)
    assert(editDist <= 3, s"small edit moved $editDist bits")
    assert(otherDist > 10, s"unrelated image only $otherDist bits away")
    assert(Multimodal.pHash64("junk".getBytes).isEmpty,
      "undecodable bytes must stay unhashed, not stub-bucketed")
  }

  test("multimodal: a 16px thumbnail hashes near its original, not other small images") {
    // 16x16 leaves 3/4 of the 32x32 pooled grid unsampled — the
    // nearest-neighbor fill must keep a TRUE thumbnail (4x4-block
    // average of the original) close to the original, while two
    // unrelated small images stay far apart (no shared zero-comb)
    def thumb16(bytes: Array[Byte]): Array[Byte] = {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        var r = 0; var g = 0; var b = 0
        for (dy <- 0 until 4; dx <- 0 until 4) {
          val rgb = src.getRGB(x * 4 + dx, y * 4 + dy)
          r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
        }
        img.setRGB(x, y, ((r / 16) << 16) | ((g / 16) << 8) | (b / 16))
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val big1 = png(1, 0); val big9 = png(9, 0)
    val thumbDist = java.lang.Long.bitCount(
      Multimodal.pHash64(thumb16(big1)).get ^ Multimodal.pHash64(big1).get)
    val unrelatedDist = java.lang.Long.bitCount(
      Multimodal.pHash64(thumb16(big1)).get ^ Multimodal.pHash64(thumb16(big9)).get)
    assert(thumbDist < unrelatedDist,
      s"thumbnail-vs-original ($thumbDist bits) must beat unrelated smalls ($unrelatedDist bits)")
    assert(unrelatedDist > 10, s"zero-comb bias: unrelated smalls only $unrelatedDist bits apart")
  }

  test("multimodal: imageNearDups pairs the edited copy, not the unrelated image") {
    import spark.implicits._
    val df = Seq(
      (1L, png(1, 0)), (2L, png(1, 4)), (3L, png(9, 0)),
      (4L, "not an image".getBytes)).toDF("id", "payload")
    val pairs = Multimodal.imageNearDups(
      Multimodal.fromBinary(df, "id", "payload", "image"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"got $pairs")
  }

  test("multimodal: real pixel resize — dims right, byte-deterministic, content preserved") {
    val big = png(3, 0, size = 64)
    val out1 = Multimodal.resizeImage(big, maxDim = 16).get
    val out2 = Multimodal.resizeImage(big, maxDim = 16).get
    assert(java.util.Arrays.equals(out1.png, out2.png),
      "resize must be byte-reproducible (cache-key / dedup contract)")
    assert(out1.width == 16 && out1.height == 16)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out1.png))
    assert(img.getWidth == 16 && img.getHeight == 16)
    // nearest-neighbor keeps exact source pixels: corner (0,0) survives
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(big))
    assert((img.getRGB(0, 0) & 0xffffff) === (src.getRGB(0, 0) & 0xffffff))
    // no upscale: a small image passes through at its own size
    val small = png(4, 0, size = 8)
    val kept = Multimodal.resizeImage(small, 16).get
    assert(kept.width == 8 && kept.height == 8)
    assert(Multimodal.resizeImage("junk".getBytes, 16).isEmpty)
  }

  test("multimodal: distributed resizeImages keeps undecodable rows with decoded=false") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png(5, 0, 64), 64, 64, 0, "png"),
      Multimodal.MediaRow(2L, "image", "garbage".getBytes, 0, 0, 0, "png"))
      .toDS()
    val out = Multimodal.resizeImages(rows, maxDim = 16)
      .collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).target_width == 16 && out(0).target_height == 16)
    assert(!out(1).decoded && out(1).resized.isEmpty)
  }

  test("multimodal: resize plan computes bounded target dims declaratively") {
    import spark.implicits._
    val df = Seq((1920, 1080), (640, 480)).toDF("width", "height")
    val out = Multimodal.resizePlan(df, 512).orderBy(desc("width")).collect()
    assert(out(0).getAs[Int]("target_width") == 512)
    assert(out(0).getAs[Int]("target_height") == 288)
    assert(out(1).getAs[Int]("target_width") == 512)
  }

  test("multimodal: frame sampling explodes every-Nth frame indices") {
    import spark.implicits._
    val df = Seq((1L, 10)).toDF("id", "n_frames")
    val frames = Multimodal.frameSamplePlan(df, 4, "n_frames")
      .select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(frames == Seq(0, 4, 8))
  }

  test("salted join equals plain join (skew mitigation preserves semantics)") {
    import spark.implicits._
    // heavy skew: one hot key
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i))
      .toDF("k", "v")
    val small = Seq(("HOT", 1), ("cold10", 2), ("cold20", 3)).toDF("k", "w")
    val plain = big.join(small, "k").agg(sum($"v" * $"w")).head.getLong(0)
    val salted = Skew.saltedJoin(big, small, "k", 8).agg(sum($"v" * $"w")).head.getLong(0)
    assert(plain == salted)
  }

  test("salted two-phase sum equals direct sum") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("k" + (i % 3), i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedSum(df, "k", "v", 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(direct == salted)
  }
}
