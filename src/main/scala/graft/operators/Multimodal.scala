package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample as distributed operators.
  *
  * IMAGE decode is REAL: [[pngFor]] synthesizes deterministic PNG bytes
  * with `javax.imageio` (pure JDK, offline-safe) and [[extractFeatures]]
  * decodes them back per partition — width/height/channels in the output
  * come from the actual decoder, so the oracle match proves the encode →
  * binary column → decode round-trip through the distributed plumbing.
  * AUDIO decode is REAL too: [[wavFor]] synthesizes deterministic 16-bit
  * PCM WAV bytes and [[extractAudioFeatures]] decodes them back with
  * `javax.sound.sampled` (pure JDK, offline-safe) — sample rate, channel
  * count, frame count, and sample statistics all come from the decoded
  * stream, while the oracle predicts them from the id-derived synthesis
  * formula. Video demux codecs are NOT in this container — the video
  * `*Stub`s below remain clearly-marked deterministic fakes. What is REAL
  * and load-bearing for 100 TB either way is the Spark plumbing:
  *   - schema: (id, kind, media: binary, meta: struct) — media bytes stay
  *     opaque and columnar; parquet stores them contiguously and scans can
  *     prune to metadata-only without touching bytes (column pruning).
  *   - [[extractFeatures]]: the mapPartitions batch shape — ONE decoder
  *     init per partition (the expensive part with real codecs), then a
  *     streaming iterator over rows, never materializing a partition in
  *     memory.
  *   - byte-level ops (substring/length/md5 on binary) are Catalyst
  *     built-ins — codegen'd, no serialization boundary.
  */
object Multimodal {

  /** Typed media row (the Dataset[T] surface for partition-wise operators). */
  case class MediaRow(id: Long, kind: String, media: Array[Byte])
  /** Extracted features. Image rows carry REAL decoded dimensions/channels
    * (n_bytes/digest null — PNG container size is encoder-dependent and
    * not oracle-predictable); audio/video rows carry byte count + digest
    * with null image fields. */
  case class MediaFeatures(id: Long, kind: String, n_bytes: Option[Long],
                           width: Option[Long], height: Option[Long],
                           channels: Option[Long], digest: Option[String])

  /** Deterministic fake media table derived from `documents`: bytes are the
    * UTF-8 text (a stand-in for encoded image/audio/video), kind cycles by
    * id, metadata derives from the byte length. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("media"))
      .withColumn("meta", decodeStub(col("media"), col("kind")))

  /** STUB decode: metadata a real codec would parse from the container
    * header, faked deterministically from byte length. Replace the body
    * with a real decoder; the schema contract is the real part. */
  def decodeStub(media: Column, kind: Column): Column = struct(
    (octet_length(media) % 640 + 1).cast("long").as("width"),
    (octet_length(media) % 480 + 1).cast("long").as("height"),
    (octet_length(media) % 32 + 1).cast("long").as("frames"),
    lit(16000L).as("sample_rate"))

  /** STUB resize: a real implementation re-encodes pixels; the fake keeps a
    * deterministic prefix. Binary substring is a codegen'd builtin. */
  def resizeStub(media: Column, maxBytes: Int): Column =
    call_function("substring", media, lit(1), lit(maxBytes))

  /** Frame sampling: n evenly-spaced fixed-size byte windows (with a real
    * demuxer these are keyframes). Pure Catalyst: transform + substring. */
  def frameSample(media: Column, n: Int, frameBytes: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => substring_index_binary(media, i, n, frameBytes))

  private def substring_index_binary(media: Column, i: Column, n: Int,
                                     frameBytes: Int): Column = {
    val stride = greatest((octet_length(media) / n).cast("long"), lit(1L))
    // SQL-level substring handles (binary, col, col)
    call_function("substring", media, (i * stride + 1).cast("int"), lit(frameBytes))
  }

  /** Deterministic tiny RGB image for doc `id` as REAL PNG bytes
    * (javax.imageio, pure JDK): width = id%64+1, height = id%48+1, pixel
    * (x,y) a linear function of (id, x, y). Dimensions are pure functions
    * of the id, so the DuckDB oracle predicts what only a real decode of
    * the bytes can report back. */
  def pngFor(id: Long): Array[Byte] = {
    val w = (id % 64 + 1).toInt
    val h = (id % 48 + 1).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id + x * 31L + y * 17L) % 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Media table with REAL encoded images: image rows carry PNG bytes
    * ([[pngFor]]), audio/video rows keep the UTF-8 stand-in. Encoding runs
    * partition-wise (the same batch shape as decode — one encoder context
    * per partition, rows streamed through). */
  def mediaWithRealImages(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val kind = Seq("image", "audio", "video")((id % 3).toInt)
          val bytes =
            if (kind == "image") pngFor(id) else text.getBytes("UTF-8")
          MediaRow(id, kind, bytes)
        }
      }
  }

  /** Decoded-audio features: every field reproducible from the decoded
    * PCM stream alone. peak/sum_abs are exact integers, so the oracle
    * match is bit-exact (no float rounding convention in play). */
  case class AudioFeatures(id: Long, sample_rate: Long, channels: Long,
                           n_frames: Long, peak: Long, sum_abs: Long)

  /** Deterministic mono 8 kHz 16-bit PCM clip for doc `id` as REAL WAV
    * bytes (javax.sound.sampled, pure JDK): n = id%400+50 frames, sample
    * i = (id·131 + i·31) mod 2001 − 1000. Frame count and sample values
    * are pure functions of the id, so the DuckDB oracle predicts what only
    * a real decode of the container bytes can report back. */
  def wavFor(id: Long): Array[Byte] = {
    val n = (id % 400 + 50).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((id * 131L + i * 31L) % 2001L - 1000L).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Audio rows of the media table with REAL WAV bytes, encoded
    * partition-wise (same batch shape as images). */
  def mediaWithRealAudio(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 1) // the 'audio' slot of the kind cycle
      .mapPartitions(_.map(id => MediaRow(id, "audio", wavFor(id))))
  }

  /** Partition-wise REAL audio decode: `javax.sound.sampled` parses the
    * WAV container per row (decoder init amortized per partition), and the
    * features are computed from the DECODED sample stream — rate/channels
    * from the parsed format header, frame count and sample stats from the
    * PCM payload. Exact-integer stats keep the oracle comparison
    * float-free. */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected decoded format for id ${r.id}: $fmt")
        val bytes = ais.readAllBytes()
        val nf = bytes.length / 2
        var peak = 0L; var sumAbs = 0L; var i = 0
        while (i < nf) {
          val s = (((bytes(2 * i + 1).toInt << 8) |
            (bytes(2 * i) & 0xFF)).toShort).toLong
          val a = math.abs(s)
          if (a > peak) peak = a
          sumAbs += a
          i += 1
        }
        AudioFeatures(r.id, fmt.getSampleRate.toLong,
          fmt.getChannels.toLong, nf.toLong, peak, sumAbs)
      }
    }
  }

  /** Partition-wise batch feature extraction — the real 100 TB shape:
    * decoder state is created once per partition, rows stream through it,
    * never materializing a partition in memory. Image rows run a REAL
    * javax.imageio PNG decode (width/height/channels from the decoder);
    * audio/video rows remain the digest stub pending real codecs. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: the expensive codec/model load with real
      // libraries — amortized across the whole partition
      val digestPool = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        if (r.kind == "image") {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))
          require(img != null, s"undecodable image bytes for id ${r.id}")
          MediaFeatures(r.id, r.kind, None,
            Some(img.getWidth.toLong), Some(img.getHeight.toLong),
            Some(img.getRaster.getNumBands.toLong), None)
        } else {
          digestPool.reset()
          val d = digestPool.digest(r.media).map("%02x".format(_)).mkString
          MediaFeatures(r.id, r.kind, Some(r.media.length.toLong),
            None, None, None, Some(d))
        }
      }
    }
  }
}
