package graft.operators

import graft.SparkSpec

/** Pins the REAL image path: PNG bytes from javax.imageio must decode back
  * to the exact pixels and dimensions they were encoded from — the gate
  * oracle checks dimensions only (pixel buffers aren't SQL-expressible),
  * so the lossless-pixel pin lives here. */
class MultimodalSpec extends SparkSpec {

  test("ImageIO disk-backed stream cache is off and encoded bytes are pinned") {
    // Touching any Multimodal codec forces the module init, which sets
    // ImageIO.setUseCache(false) JVM-wide — without it every codec pass
    // creates/writes/deletes one temp FILE per media row (the JDK default).
    val png7 = Multimodal.pngFor(7L)
    assert(!javax.imageio.ImageIO.getUseCache,
      "ImageIO disk cache must be disabled after Multimodal init")
    // The cache is a transport detail: encoded BYTES must be identical to
    // the disk-cache-era bytes (gate oracle hashes depend on them). Pinned
    // digests were computed under BOTH cache modes and matched exactly.
    def md5(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    assert(md5(png7) == "97e7f50e05a6fea877b17c884bf298f9")
    assert(md5(Multimodal.wavFor(7L)) == "3e4e8162891ac0625b94669a1825986f")
    assert(md5(Multimodal.gifFor(7L)) == "f6d6c623f3b231538d201b863e0df023")
    assert(md5(Multimodal.pngFor(42L)) == "a8b3ef6907e5dea4dc71959870f3c5b8")
    assert(md5(Multimodal.wavFor(42L)) == "945fb3be84e780c0aa5972102974b003")
    assert(md5(Multimodal.gifFor(42L)) == "91652200b93c5bf8224c97e63d5792eb")
    assert(md5(Multimodal.pngFor(1001L)) == "9b05f4a01c51c9e0906667bcad297efd")
    assert(md5(Multimodal.wavFor(1001L)) == "966354ba8f0663c12fb68d1563435912")
    assert(md5(Multimodal.gifFor(1001L)) == "2b97b1319088eb8d0f6cca942b8f1ff0")
  }

  test("pngFor round-trips dimensions and pixels losslessly") {
    for (id <- Seq(0L, 3L, 63L, 129L, 4998L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngFor(id)))
      assert(img.getWidth == (id % 64 + 1).toInt)
      assert(img.getHeight == (id % 48 + 1).toInt)
      assert(img.getRaster.getNumBands == 3)
      // PNG is lossless: every pixel must equal the encoded function
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((img.getRGB(x, y) & 0xFFFFFF) ==
          ((id + x * 31L + y * 17L) % 0xFFFFFF).toInt,
          s"pixel ($x,$y) of image $id corrupted")
    }
  }

  test("extractFeatures decodes real PNGs distributed; byte-level features for audio/video") {
    import spark.implicits._
    val media = Multimodal.mediaWithRealImages(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    val images = feats.filter(_.kind == "image")
    assert(images.nonEmpty)
    images.foreach { f =>
      assert(f.width.contains(f.id % 64 + 1), s"id ${f.id} width ${f.width}")
      assert(f.height.contains(f.id % 48 + 1))
      assert(f.channels.contains(3L))
      assert(f.n_bytes.isEmpty && f.digest.isEmpty)
    }
    feats.filterNot(_.kind == "image").foreach { f =>
      assert(f.digest.exists(_.length == 32) && f.n_bytes.exists(_ > 0))
      assert(f.width.isEmpty && f.height.isEmpty && f.channels.isEmpty)
    }
  }

  test("wavFor round-trips format and every PCM sample losslessly") {
    for (id <- Seq(1L, 4L, 7L, 397L, 4999L)) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.wavFor(id)))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1)
      assert(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
      val bytes = ais.readAllBytes()
      val n = (id % 400 + 50).toInt
      assert(bytes.length == n * 2, s"frame count of clip $id")
      // WAV PCM is lossless: every sample must equal the synthesis formula
      for (i <- 0 until n) {
        val s = (((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)).toShort).toLong
        assert(s == (id * 131L + i * 31L) % 2001L - 1000L,
          s"sample $i of clip $id corrupted")
      }
    }
  }

  test("gifFor round-trips frame count, dims, per-frame delays, and every pixel") {
    for (id <- Seq(2L, 5L, 8L, 255L, 4997L)) {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(Multimodal.gifFor(id)))
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      assert(n == (id % 8 + 2).toInt, s"frame count of gif $id")
      for (f <- 0 until n) {
        val img = reader.read(f)
        assert(img.getWidth == (id % 32 + 1).toInt)
        assert(img.getHeight == (id % 24 + 1).toInt)
        val v = ((id + f * 31L) % 256L).toInt
        // indexed gray palette → zero quantization: every pixel exact
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          assert((img.getRGB(x, y) & 0xFFFFFF) == (v << 16 | v << 8 | v),
            s"pixel ($x,$y) of frame $f, gif $id corrupted")
        val root = reader.getImageMetadata(f)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = root.getElementsByTagName("GraphicControlExtension")
        assert(gce.getLength == 1, s"missing GCE on frame $f of gif $id")
        assert(gce.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          .getAttribute("delayTime").toLong == id % 10 + 1,
          s"delay of frame $f, gif $id")
      }
      iis.close()
    }
  }

  test("extractVideoFeatures demuxes real GIFs distributed") {
    val media = Multimodal.mediaWithRealVideo(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    val feats = Multimodal.extractVideoFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val n = f.id % 8 + 2
      assert(f.n_frames == n)
      assert(f.width == f.id % 32 + 1 && f.height == f.id % 24 + 1)
      assert(f.sum_delay_cs == n * (f.id % 10 + 1))
      val expPix = (0L until n).map(fr =>
        f.width * f.height * ((f.id + fr * 31L) % 256L)).sum
      assert(f.pix_sum == expPix, s"pixel sum of video ${f.id}")
    }
  }

  test("resizeHalf is a real nearest-neighbor downscale (dims + subsampled pixels)") {
    val id = 129L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.pngFor(id)))
    val out = Multimodal.resizeHalf(img)
    assert(out.getWidth == (img.getWidth + 1) / 2)
    assert(out.getHeight == (img.getHeight + 1) / 2)
    // nearest-neighbor: every output pixel is SOME source pixel (no
    // interpolation blending) — check membership per output row
    for (y <- 0 until out.getHeight; x <- 0 until out.getWidth) {
      val px = out.getRGB(x, y) & 0xFFFFFF
      val srcCandidates = for {
        sy <- 0 until img.getHeight
        sx <- 0 until img.getWidth
      } yield img.getRGB(sx, sy) & 0xFFFFFF
      assert(srcCandidates.contains(px), s"resized pixel ($x,$y) not from source")
    }
  }

  test("bench decode-over-stored-bytes row == gate encode+demux row") {
    // the r9 bench split: q_multimodal_video (benchOnly) demuxes a
    // PERSISTED binary column; same bytes, same demux → identical output
    val sf = "/root/testdata/sf0.001"
    val gate = graft.queries.MultimodalQueries
      .queries("q_multimodal_video")(spark, sf).collect().toSeq
    val stored = graft.queries.MultimodalQueries
      .benchOnly("q_multimodal_video")(spark, sf).collect().toSeq
    assert(gate.nonEmpty && stored == gate)
    // the encode row produces real container bytes for every video doc
    val enc = graft.queries.MultimodalQueries
      .benchOnly("q_multimodal_video_encode")(spark, sf)
    assert(enc.count() == gate.size)
  }

  test("extractAudioFeatures decodes real WAVs distributed") {
    val media = Multimodal.mediaWithRealAudio(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    val feats = Multimodal.extractAudioFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.sample_rate == 8000L && f.channels == 1L)
      assert(f.n_frames == f.id % 400 + 50)
      assert(f.peak <= 1000L && f.sum_abs > 0L)
    }
  }
}
