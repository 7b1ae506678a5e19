package graft.operators

import graft.SparkSpec

/** Pins the REAL image path: PNG bytes from javax.imageio must decode back
  * to the exact pixels and dimensions they were encoded from — the gate
  * oracle checks dimensions only (pixel buffers aren't SQL-expressible),
  * so the lossless-pixel pin lives here. */
class MultimodalSpec extends SparkSpec {

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

  test("extractFeatures decodes real PNGs distributed, stubs audio/video") {
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
