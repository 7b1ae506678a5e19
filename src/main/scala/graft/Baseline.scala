package graft

/** The committed per-query performance baseline (seconds, sf0.1,
  * local[32], min-of-3-interleaved, noop sink) — the comparison basis of
  * the 2× acceptance gate in BASELINE.json.
  *
  * Consolidated in r14 (VERDICT r13 ask #7) from the r13 builder
  * quiet-box artifact (BENCH_LOCAL_r13.json, calib 0.289 vs anchor
  * 0.248): one number per query, mechanically evaluable — `Bench` emits
  * `vs_baseline` ratios against this map in every artifact. BASELINE.md
  * carries the same numbers as a human-readable table with per-query
  * provenance (which round introduced the query, definition changes).
  *
  * Amendment protocol: when a query's DEFINITION changes (not its
  * implementation speed), re-anchor its row here in the same commit and
  * note it in BASELINE.md — the gate must compare like with like
  * (precedent: q_multimodal_features, re-anchored r13 after gaining WAV
  * + GIF decode in r7/r8).
  */
object Baseline {
  val committed: Map[String, Double] = Map(
    "q_agg_pricing" -> 0.457,
    "q_agg_unwindowed" -> 0.359,
    "q_join_revenue_by_nation" -> 0.597,
    "q_join_profit_by_nation" -> 1.224,
    "q_filter_project" -> 0.234,
    "q_window_tumble" -> 0.376,
    "q_window_hop" -> 0.463,
    "q_window_session" -> 0.762,
    "q_interval_join" -> 1.687,
    "q_topk" -> 0.626,
    "q_scalar_math" -> 0.735,
    "q_json_ops" -> 0.913,
    "q_text_stats" -> 0.683,
    "q_text_fingerprint" -> 0.364,
    "q_pipeline_quality_dedup" -> 0.695,
    "q_dedup_exact" -> 0.384,
    "q_dedup_hot_ngrams" -> 0.543,
    "q_minhash_signatures" -> 0.620,
    "q_dedup_minhash_lsh" -> 1.013,
    "q_dedup_clusters" -> 3.593,
    "q_dedup_incremental" -> 0.989,
    "q_curation_token_budget" -> 0.388,
    "q_curation_token_budget_approx" -> 1.015,
    "q_curation_shard_scalable" -> 0.517,
    "q_curation_topk_group_scalable" -> 0.554,
    "q_curation_dsir_scalable" -> 1.874,
    "q_dedup_simhash_banded" -> 1.095,
    "q_dedup_minhash_lsh_fast" -> 0.977,
    "q_dedup_simhash" -> 0.376,
    "q_lsh_signatures" -> 0.210,
    "q_ann_bruteforce" -> 0.453,
    "q_ann_lsh_bucketed" -> 0.476,
    "q_ann_ivf" -> 0.606,
    "q_ann_ivf_train" -> 1.338,
    "q_ann_pq_train" -> 2.330,
    "q_ann_pq" -> 1.481,
    "q_ann_ivfpq" -> 1.579,
    "q_curation_dsir" -> 2.020,
    "q_join_asof_bucketed" -> 1.387,
    "q_quality_perplexity" -> 1.737,
    "q_quality_nb_score" -> 1.242,
    "q_corpus_rollup" -> 0.324,
    "q_cdc_apply" -> 2.725,
    "q_events_funnel" -> 0.813,
    "q_events_retention" -> 0.687,
    "q_dedup_span_removal" -> 1.726,
    "q_dedup_paragraph" -> 0.626,
    "q_embed_quantize" -> 0.583,
    "q_multimodal_features" -> 1.227,
    "q_multimodal_video" -> 1.299,
    "q_multimodal_video_encode" -> 2.281,
    "q_sql_agg_having" -> 0.313,
    "q_sql_interval_join" -> 2.338,
    "s_stream_filter" -> 0.265,
    "s_stream_agg" -> 1.217,
    "s_stream_window" -> 2.036,
    "s_stream_join" -> 7.391)

  /** Committed per-query sf1 anchors (seconds, /tmp/graft_sf1 synthetic
    * 10× tier, local[32], min-of-3-interleaved, noop sink) — r14 VERDICT
    * ask #3: the sf1 tier's 10×-vs-sf0.1 ratios become mechanical the
    * same way `committed` makes the 2× gate mechanical at sf0.1.
    * Numbers = BENCH_SF1_r15.json (quiet, contended=false on all three
    * calibration dimensions). Same amendment protocol as `committed`. */
  val committedSf1: Map[String, Double] = Map(
    "q_ann_ivf_train" -> 1.685,
    "q_ann_ivfpq" -> 2.028,
    "q_ann_pq" -> 1.784,
    "q_ann_pq_train" -> 2.928,
    "q_cdc_apply" -> 21.807,
    "q_curation_dsir" -> 4.127,
    "q_curation_dsir_scalable" -> 4.775,
    "q_dedup_clusters" -> 15.956,
    "q_dedup_incremental" -> 3.098,
    "q_dedup_minhash_lsh_fast" -> 12.931,
    "q_dedup_simhash_banded" -> 6.540,
    "q_dedup_span_removal" -> 5.212,
    "q_interval_join" -> 15.382,
    "q_join_asof_bucketed" -> 2.436,
    "q_join_profit_by_nation" -> 3.580,
    "q_json_ops" -> 7.276,
    "q_multimodal_features" -> 8.210,
    "q_multimodal_video" -> 3.579,
    "q_multimodal_video_encode" -> 24.079,
    "q_quality_nb_score" -> 2.739,
    "q_quality_perplexity" -> 4.310,
    "q_sql_interval_join" -> 22.026,
    "q_sql_join_cross" -> 4.113)
}
