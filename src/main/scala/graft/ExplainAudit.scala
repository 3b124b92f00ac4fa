package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the named queries (or a
  * default set of plan-shape-interesting ones) so broadcast/pushdown/
  * exchange-reuse can be audited. Not part of the driver contract.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q2_region_revenue", "q3_topk_orders",
        "dd2_minhash_lsh", "ss1_topk_bruteforce", "ss3_lsh_bucket",
        "cd8_geocode_join", "ev3_session", "ev7_band_join",
        "q17_percentiles", "tx6_curation",
        "dd7_embedding_dedup", "tx8_contamination", "tx12_top_terms",
        "tx13_packing", "tx14_kmv_distinct", "ev8_transitions",
        "ev9_variant", "q18_pivot", "q21_unpivot",
        "tx15_contamination_bloom", "tx16_weighted_sample",
        "tx17_mix_budget", "tx18_char_entropy", "tx19_column_profile",
        "q22_grouping_sets", "q23_zorder", "q24_approx_percentile",
        "dd10_incremental", "dd11_span_dedup", "tx20_tfidf",
        "tx21_lm_score", "tx22_pmi", "q27_histogram", "ss9_kmeans",
        "dd12_containment", "ss12_pq_adc", "ev15_gap_fill",
        "ev16_range_window", "q30_salted_join", "q31_correlated_subquery",
        "tx26_lm_bigram", "dd13_minhash_estimate", "tx25_sql_surface",
        "mm5_decode_pq",
        "dd15_simhash_pairs", "ss15_recall", "tx34_bm25_retrieval",
        "tx35_decontaminate", "tx36_bpe_pairs", "tx38_source_overlap",
        "tx39_bpe_tokenize", "dd16_simhash_wide", "cd14_geocode_fuzzy",
        "dd17_keep_best", "tx40_source_cap", "tx41_token_budget",
        "tx42_snapshot_diff", "ss16_knn_graph", "ss17_knn_multiprobe",
        "dq3_quarantine", "gr8_modularity",
        "mm14_video_neardup", "mm15_decode_wire", "tx48_unicode_norm",
        "mm16_frame_containment", "tx49_norm_neardup", "dq8_media_health",
        "mm17_audio_containment", "mm18_binary_cdc", "q35_orc_roundtrip",
        "mm19_jpeg_meta", "mm20_crossmodal_dedup", "mm21_frame_index",
        "mm22_segment_index", "mm23_chunk_index",
        "tx50_decontaminate_evasive", "ss22_ivf_delete",
        "gr12_scc", "gr13_scc_collapse", "mm28_index_delete",
        "mm29_mp3_meta", "ss24_sq8_topk", "ss25_binary_hamming",
        "tx52_script_mix", "sp8_polygon_stats", "dq14_kanonymity",
        "st19_stream_fullouter", "tx13_packing", "dd11_span_dedup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC") // NTZ ts cast precondition (Tables.normalizeEventTs)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
