package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample as distributed operators.
  *
  * The actual codecs (JPEG/PNG decode, audio resample, video demux) are NOT
  * in this container — every `*Stub` below is a clearly-marked deterministic
  * fake. What is REAL and load-bearing for 100 TB is the Spark plumbing:
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
  /** Extracted features: STUB content — real pipelines put embeddings here. */
  case class MediaFeatures(id: Long, kind: String, n_bytes: Long, digest: String)

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

  /** Partition-wise batch feature extraction — the real 100 TB shape:
    * decoder state is created once per partition, rows stream through it.
    * STUB: "features" are byte count + md5; a real extractor returns
    * embeddings from a model loaded in the per-partition init. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: with a real codec this is the expensive
      // library/model load — amortized across the whole partition
      val digestPool = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digestPool.reset()
        val d = digestPool.digest(r.media).map("%02x".format(_)).mkString
        MediaFeatures(r.id, r.kind, r.media.length.toLong, d)
      }
    }
  }
}
