package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column pipeline queries: binary media + typed metadata,
  * decode(stub) → resize(stub) → frame-sample → partition-wise feature
  * extraction. Media bytes are deterministic (UTF-8 of `documents.text`), so
  * byte lengths, prefixes, and digests oracle-check in DuckDB.
  */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // Schema + stub-decode metadata + resize prefix digest: all Catalyst
    // builtins over binary (octet_length/substring), codegen'd.
    "q_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
      media.select(
        $"id", $"kind",
        octet_length($"media").cast("long").as("n_bytes"),
        $"meta.width".as("width"), $"meta.height".as("height"),
        md5(Multimodal.resizeStub($"media", 64)).as("prefix_md5"))
        .orderBy($"id")
    }),

    // Frame sampling: n byte windows per video; count + first-frame digest.
    "q_multimodal_frames" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
        .filter($"kind" === "video")
      media.select(
        $"id",
        size(Multimodal.frameSample($"media", 4, 16)).cast("long").as("n_frames"),
        md5(element_at(Multimodal.frameSample($"media", 4, 16), 1)).as("f0_md5"))
        .orderBy($"id")
    }),

    // mapPartitions feature extraction (per-partition decoder init).
    // Image rows: REAL javax.imageio PNG encode → binary column → decode;
    // the decoded width/height/channels match the oracle's id-derived
    // prediction only if actual bytes round-tripped through an actual
    // decoder. Audio/video rows: digest equals DuckDB's md5 of the text,
    // proving bytes survive the typed Dataset round-trip intact.
    "q_multimodal_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaWithRealImages(Tables.load(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select($"id", $"kind", $"n_bytes", $"width", $"height",
          $"channels", $"digest")
        .orderBy($"id")
    }),

    // REAL WAV audio round-trip: synthesize deterministic PCM → encode to
    // WAV container bytes (javax.sound.sampled) → binary column → decode
    // per partition → report format fields + exact-integer sample stats.
    // The oracle re-derives every field from the synthesis formula alone,
    // so a hash match proves actual container bytes flowed through an
    // actual decoder on the executors.
    "q_multimodal_audio" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaWithRealAudio(Tables.load(s, dir, "documents"))
      Multimodal.extractAudioFeatures(media).toDF()
        .select($"id", $"sample_rate", $"channels", $"n_frames",
          $"peak", $"sum_abs")
        .orderBy($"id")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """WITH m AS (SELECT doc_id AS id,
           ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
           encode(text) AS media, text FROM documents)
         SELECT id, kind, octet_length(media)::BIGINT AS n_bytes,
           (octet_length(media) % 640 + 1)::BIGINT AS width,
           (octet_length(media) % 480 + 1)::BIGINT AS height,
           md5(left(text, 64)) AS prefix_md5
         FROM m ORDER BY id""",
    "q_multimodal_frames" ->
      """WITH m AS (SELECT doc_id AS id, text, octet_length(encode(text)) AS len
           FROM documents WHERE ['image','audio','video'][(doc_id % 3 + 1)::INT] = 'video')
         SELECT id, 4::BIGINT AS n_frames,
           md5(substring(text, 1, 16)) AS f0_md5
         FROM m ORDER BY id""",
    // image rows: dimensions/channels the oracle derives from the id must
    // equal what the real PNG decode reports; container size and a pixel
    // digest are encoder-dependent → null (not oracle-predictable)
    "q_multimodal_features" ->
      """WITH m AS (SELECT doc_id AS id,
           ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind, text
         FROM documents)
         SELECT id, kind,
           CASE WHEN kind = 'image' THEN NULL
                ELSE octet_length(encode(text))::BIGINT END AS n_bytes,
           CASE WHEN kind = 'image' THEN (id % 64 + 1)::BIGINT END AS width,
           CASE WHEN kind = 'image' THEN (id % 48 + 1)::BIGINT END AS height,
           CASE WHEN kind = 'image' THEN 3::BIGINT END AS channels,
           CASE WHEN kind = 'image' THEN NULL ELSE md5(text) END AS digest
         FROM m ORDER BY id""",
    // every field predicted from the id-derived synthesis formula; the
    // Spark side may only produce them by decoding the WAV bytes
    "q_multimodal_audio" ->
      """WITH a AS (SELECT doc_id AS id, (doc_id % 400 + 50) AS n
           FROM documents WHERE doc_id % 3 = 1),
         s AS (SELECT id, n, unnest(range(0, n)) AS i FROM a),
         v AS (SELECT id, n, ((id * 131 + i * 31) % 2001 - 1000) AS smp FROM s)
         SELECT id, 8000::BIGINT AS sample_rate, 1::BIGINT AS channels,
           n::BIGINT AS n_frames, max(abs(smp))::BIGINT AS peak,
           sum(abs(smp))::BIGINT AS sum_abs
         FROM v GROUP BY id, n ORDER BY id"""
  )
}
