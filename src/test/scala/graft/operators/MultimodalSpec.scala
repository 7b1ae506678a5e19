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
}
