package graft

/** Shuffle-parallelism invariance for the round-6 oracled operators:
  * the same query must produce byte-identical ordered results whether
  * the shuffle runs over 3 partitions or 17. Catches per-partition
  * nondeterminism (partial-aggregation order, window tie handling,
  * band fanout) that the single-configuration oracle gate cannot see.
  * The older two-phase operators have the same property pinned in
  * their own suites (e.g. packChunks in CurateSpec). */
class ParallelismSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val queries = Seq(
    "q92_scd2", "q93_interval_join", "q94_fuzzy_join",
    "q95_rolling_window", "q96_cdc_apply", "q97_grouping_sets",
    "q98_overlap_join", "q99_skew_profile", "q100_burst_dedup",
    "q102_split_report", "q103_split_leakage", "q104_triangles",
    "q105_pagerank", "q106_expectations", "q107_bigram_logprob",
    "q108_assoc_rules", "q109_audio_resample_exact",
    "q110_image_stats_exact", "q111_profile_drift",
    // round-7 DetLn rewrites: the engine-invariant log must also be
    // partition-count-invariant (micro-nat sums are exact integers)
    "q58_tfidf", "q64_unigram_logprob", "q78_dsir_weights",
    "q80_weighted_sample", "q84_bm25",
    // round-7 widening: DetMix-ordered and sketch-based operators
    "q112_epoch_shuffle", "q113_length_batching",
    "q114_sequence_assembly", "q115_srp_codes", "q116_hll_distinct",
    "q117_cms_frequency", "q118_mixture_schedule",
    // round-9 portable-hash sketch family: signature/sketch merges are
    // associative, so banded pairs and KMV/lang-ID outputs must not
    // move with partition count
    "q22_minhash_pairs", "q24_simhash_pairs", "q30_lang_id",
    "q67_kmv_distinct", "q68_incr_neardup", "q47_neardup_lsh",
    "q27_ann_lsh", "q119_adpcm_roundtrip", "q120_repeat_spans",
    "q121_repeat_span_removal", "q122_hashed_classifier",
    // round-10: the HTML extractor is a narrow map — partition-count
    // invariance is near-structural, pinned anyway; the link graph
    // adds real shuffles (in-degree, id-resolution joins)
    "q123_boilerplate", "q124_link_graph", "q125_pii_scan",
    "q126_token_entropy",
    // round-11: image dHash is a narrow decode map; the near-dup pair
    // join shuffles on 16-bit band values; URL curation is narrow until
    // the per-domain cap window
    "q127_image_dhash", "q128_image_neardup",
    "q129_url_canonicalize", "q130_domain_caps",
    "q131_markup_metadata", "q132_crawl_pipeline", "q133_image_clusters",
    "q134_audio_fingerprint", "q135_audio_neardup",
    // round-11 video family: the demux+hash pass is a narrow map; the
    // temporal near-dup adds band and verify shuffles
    "q136_video_frames", "q137_video_fingerprint", "q138_video_neardup",
    // round-11 session 3: robots is a broadcast join + one aggregate;
    // the quantile sketch's hash_sample merge is associative by
    // construction (k smallest of the union); the shard manifest's
    // checksum is an order-independent sum
    "q139_robots_policy", "q140_quantiles_exact", "q141_quantile_sketch",
    "q142_compression_ratio", "q143_shard_manifest",
    "q144_domain_scorecard", "q145_release_manifest",
    "q146_forget_impact", "q147_sample_examples", "q148_anchor_text",
    "q149_anchor_terms", "q150_crawl_admission",
    "q151_domain_quantiles", "q152_frontier_report",
    // round-11 late landings + round-12: the WARC family is a narrow
    // parse (one task per blob) feeding one aggregate; the redirect
    // resolver iterates bounded self-joins; NB margins are exact
    // micro-nat integer sums, so training must not move with partition
    // count either
    "q153_warc_records", "q154_warc_fetch", "q155_wet_roundtrip",
    "q156_secrets_scan", "q157_manifest_diff", "q158_redirect_chains",
    "q159_warc_encodings", "q160_nb_quality", "q161_nb_eval",
    "q162_crawl_corpus", "q163_crawl_shards", "q164_nb_calibration",
    "q165_crawl_dedup", "q166_crawl_release", "q167_crawl_languages",
    "q168_release_scorecard",
    // round-12 session 3: the reference LM's micro-nat sums are exact
    // integers; the tercile window and the token-layout cumulative sum
    // are total-ordered by (score|mix, doc_id), so neither may move
    // with partition count
    "q169_ref_perplexity", "q170_ccnet_buckets", "q171_token_layout",
    "q172_sequence_index", "q173_lang_perplexity",
    "q174_ccnet_lang_buckets", "q175_routed_perplexity",
    // round-13: the ANN gates are integer-exact by construction, so
    // partition count must not move a single bit — trainExact's whole
    // claim is order-independence of its Long partial sums. q82 is
    // pinned here because q83/q184 read the memoized BPE model (one
    // training per session), so only the fresh-training q82 entry can
    // surface a training-path partition sensitivity; same reasoning
    // puts q185 (fresh unigram training) next to the memo-reading q186
    "q82_bpe_merges",
    "q176_ivf_assign", "q177_pq_codes", "q178_semdedup_exact",
    "q179_ivf_train", "q180_pq_adc_topk", "q181_ivf_forget",
    "q182_ivf_drift", "q183_ivf_recall", "q184_tokenizer_scorecard",
    "q185_unigram_vocab", "q186_unigram_tokens", "q187_label_prop",
    "q188_ivf_retrain_diff", "q189_modularity",
    // round-14: semantic decontamination rides the memoized assignment
    // + a broadcast; the SFT family is aggregates and an anti-join;
    // the resize twin is a narrow decode map
    "q190_semantic_decontam", "q191_contamination_verdict",
    "q192_resize_exact", "q193_conversation_threads",
    "q194_preference_pairs", "q195_prompt_decontam",
    "q196_sft_release_card", "q197_response_dedup",
    "q198_thread_packing", "q199_semantic_recall",
    // round-15: token-budget packing is the q198 core over token weights
    "q200_token_packing", "q201_sequence_manifest",
    "q202_loss_mask_layout", "q203_packing_churn",
    "q204_delivery_card",
    // round-16: incremental packing freezes prev slots, repacks the rest;
    // BPE packing swaps the token table under the same chain
    "q205_append_packing", "q206_bpe_token_packing",
    "q207_append_churn", "q208_budget_sweep", "q209_mixture_execute")

  private def run(name: String, partitions: Int): Seq[String] = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  queries.foreach { name =>
    test(s"$name is invariant under shuffle parallelism (3 vs 17)") {
      val narrow = run(name, 3)
      val wide = run(name, 17)
      assert(narrow == wide,
        s"$name diverged between 3 and 17 shuffle partitions")
    }
  }
}
