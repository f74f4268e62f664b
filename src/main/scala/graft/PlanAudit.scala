package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the
  * plan-shape feedback loop (pushdown, broadcast, codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark: SparkSession = Graft.localSession("plan-audit")
    val show = Seq("q01_filter_range", "q07_agg_groupby", "q09_join_inner",
      "q13_join_multi3", "q15_topk", "q16_offset", "q25_dedup_exact",
      "q44_neardup_lsh", "q46_delete_preview", "q47_batch_update",
      "q48_sql_cte", "q49_filter_sugar", "q50_rolling_fp",
      "q33_ann_ivf", // IVF probe over the clustered layout: PartitionFilters
      "q57_bulk_ingest", // post-ingest aggregate over the managed table
      "q61_sessionize", // lag + cumulative-sum session ids (window chain)
      "q64_fk_autojoin", // declared-FK join (broadcast expected)
      "q75_hash_split", // sampling = pure scan predicate (no shuffle)
      "q76_chunking", // chunking = narrow generate chain (no shuffle)
      "q77_repetition", // per-row sorted-run mode: projection only, no shuffle
      "q78_pii_redact", // regex counts + redaction: projection only, no shuffle
      "q79_contamination", // ONE shuffle keyed on the shingle, no doc-pair join
      "q80_packing", // window partitioned by source (parallel, no global sort)
      "q82_unigram_lm", // token-keyed joins + BroadcastNestedLoop on the 1-row scalar
      "q83_tfidf", // tf/df aggs + broadcast N + bounded top-k window
      "q95_audio_wav", // codec mapPartitions: narrow, no shuffle before sort
      "q96_graph_ann", // shard-local beam: one window merge, graph never shuffles
      "q98_mp4_probe", // container probe: narrow projection pass
      "q106_image_probe", // header sniff: narrow projection, no decode, no shuffle
      "q107_image_neardup_blocked", // block-key buckets: shuffle keyed on 32-bit combos
      "q109_image_search", // hamming top-k: XOR+popcount scan → TakeOrderedAndProject
      "q117_bm25_search", // filtered tf explode, broadcast df/scalars, TakeOrdered
      "q118_line_dedup", // keeper partial-agg + line-keyed join (no window over corpus)
      "q120_vocab_topk", // one token shuffle → TakeOrdered over the vocab
      "q121_hash_embed", // two map-combined aggs, HOF assembly, no UDF
      "q122_temperature_mix", // codegen CASE scan (rates pre-derived)
      "q125_winnow", // winnowing: narrow HOF chain → explode → per-doc agg
      "q127_token_budget", // per-stratum window, no global sort
      "q133_snapshot_diff", // ONE full-outer PK shuffle join, codegen classify
      "q134_bigram_lm", // no-shuffle bigram explode; token-keyed count joins
      "q135_zorder_layout", // two bucket-keyed aggs; interleave stays codegen
      "q137_bpe_tokens", // BPE kernel scan: projection only, no shuffle
      "q138_entity_match", // block-keyed self-join; JW kernel inside codegen
      "q139_mv_rewrite", // MUST scan the summary, not the base (rule engaged)
      "q140_salted_join", // salt-replicated build side; no broadcast of probe
      "q164_kmv_distinct", // ONE ObjectHashAggregate, no distinct-key shuffle
      "q172_weighted_sample", // TopKPerKeyExec two-stage, no window sort
      "q173_hard_negatives", // broadcast anchors; TopKPerKeyExec ranking
      "q175_association", // broadcast part dim; basket-keyed pair join
      "q176_pagerank", // per-iteration dst-keyed agg; integer div codegen
      "q204_holt_forecast", // one groupBy + ordered codegen fold, no driver loop
      "q206_hll_distinct", // string-space rank projection + register agg
      "q207_triples", // broadcast pair-floor semi-joins before the 3rd expansion
      "q209_hybrid_search", // two bounded rankings union → tiny agg → TakeOrdered
      "q210_winsorize", // broadcast cuts back onto the scan; no per-group sort
      "q212_readability", // three regexp counts: projection only, no shuffle
      "q221_cross_source_dup", // band buckets → |sources|²-bounded rollup
      "q223_blocklist", // kernel pass: projection only, no shuffle
      "q183_ks_test", // bucketed prefix sums: every Window partitioned by __b
      "q233_mann_whitney", // distinct-value ranks; no unpartitioned window
      "q235_kruskal_wallis", // same rank identity; no unpartitioned window
      "q236_mw_binned", // bin ids bound the distinct relation at nBins
      "q241_sketch_quantiles", // GK partial/final agg IS the sketch merge
      "q242_join_size", // two narrow sketch scans, no join executed
      "q243_dp_release", // count agg + codegen noise projection
      "q245_kcore", // per-round degree agg + anti-joins, lineage cut
      "q247_log_templates", // regexp projection -> count -> TakeOrdered
      "q248_cuped", // one unit agg; readout on a 2-row relation
      "q261_adamic_adar", // wedge join keyed on z; anti-join; TakeOrdered
      "q264_phrase_search", // broadcast query tokens; (doc,start) vote agg
      "q265_decision_stump", // distinct-value prefix sums; scalar broadcast
      "q296_gains_table", // prefix-sum tiling; ≤nTiles bounded cumulation
      "q297_best_threshold", // prefix-sum confusion counts; TakeOrdered(1) picks
      "q298_interval_coverage", // key-partitioned sweep windows only
      "q299_state_runs", // key-partitioned rn − rn′ segmentation
      "q302_attribution", // ONE user-partitioned RANGE window pass
      "q304_stl_decompose", // key-partitioned RANGE trend window + (k,s) agg
      "q308_concentration", // distinct-value prefix sums; scalar broadcasts
      "q310_stl_anomalies", // STL chain + broadcast med/mad back onto rows
      "q311_attribution_weighted", // per-bucket RANGE frames, one window pass
      "q312_heaps_fit", // token shuffle + ≤nBuckets bounded spine window
      "q313_user_entropy", // user-partitioned window + user rollup
      "q315_assortativity", // degree agg + node-keyed joins; no node×node
      "q316_centroid_drift", // (group, dim) aggs + dim-keyed join
      "q318_simpson", // one (group,type) count agg + group rollup
      "q319_effective_dim", // dim-keyed micro-moment agg + one rollup row
      "q320_dispersion", // per-key exact moment agg, one divide
      "q337_link_predict", // wedge join keyed on z; anti-join; TakeOrdered
      "q340_permutation_test", // rows×64 ONE map-combined agg, 64-row collect
      "q343_competing_risks", // windows only over the bounded time relation
      "q345_good_turing", // shingle shuffle → vocab agg → ≤maxR spine
      "q346_rake", // doc-partitioned phrase windows; TakeOrdered top-k
      "q348_burrows_delta", // token agg; everything after on sources×topM
      "q349_es_sample", // key scan → TakeOrderedAndProject, no full sort
      "q354_shapley", // one user agg; the lattice is a 2^k-row collect
      "q356_kripp_alpha", // unit-keyed self-join bounded by values/unit
      "q359_rich_club", // k spine folded into ONE conditional-sum agg
      "q362_qini", // pooled distinct-value tiling; bounded tile window
      "q363_ratio_metric", // one map-combined moment aggregation
      "q364_graph_churn", // ONE lineitem⋈part pass; halves tagged, not re-derived
      "q368_perm_sweep", // rows×64 ONE map-combined agg keyed (g,b); groups×64 collect
      "q370_keyness", // token aggs → full-outer type join; bounded TakeOrdered
      "q371_distinct_ngrams", // per-n explode + two-level distinct agg; no doc joins
      "q373_betweenness", // level-sync BFS frontier joins; composition keyed (v),(s,t)
      "q374_delong_auc", // distinct-score prefix sums; two broadcast lookups; ONE agg
      "q375_breslow_day", // one cell agg; strata-sized rollup ×2 passes
      "q376_textrank", // zip_with pair pass (no self-join); integer PR kernel
      "q377_closeness", // min-relax frontier joins; node-sized output agg
      "q378_theil", // ONE map-combined groupBy; groups-sized rollup
      "q379_cka_int8", // ONE n·(2d)² cell agg; (2d)²-bounded collect
      "q380_cox", // subjects once; per-step agg over |event times| relation
      "q381_moran", // broadcast attribute lookup onto edges; two sums
      "q382_hill_tail", // per-value counts + prefix sums; no global sort
      "q383_binseg", // one prefix pass; ≤3 bounded argmax collects
      "q384_spectral_gap", // edge-partitioned matvec; n-sized vector state
      "q385_gmm", // per-distinct-value relation; iters map-combined aggs
      "q386_calibration_slope", // distinct-score relation; 4 Newton aggs
      "q387_huber_mean", // order stats via prefix sums; 3 IRLS aggs
      "q388_ktruss", // wedge join per round; per-round lineage cuts
      "q389_yuen_t", // two per-arm prefix passes; ONE bounded agg each
      "q390_partial_corr", // ten moments, ONE map-combined agg
      "q391_entropy_rate", // distributed pair count; k²-bounded matrix
      "q392_seasonal_mk", // per-season bounded pair join + exact rollup
      "q393_cox_stratified", // stratum-partitioned windows; bounded aggs
      "q394_embedding_top2", // ONE n·d² cell agg; d²-bounded collect
      "q395_nominal_assoc", // ONE r×c cell agg; driver effect sizes
      "q396_c_index", // per-time suffix sums; ONE pair-arithmetic agg
      "q397_betweenness_pivots", // pivot-filtered s-keyed legs; ≤180-node collect
      "q398_cvm_test", // pooled-CDF ladder → ONE 1-row agg; totals are probe LITERALS (no crossJoin)
      "q399_fisher_exact", // ONE 2×2 probe agg; weight chain on a 1-row relation
      "q400_naive_bayes", // token-keyed count shuffles; |C|-bounded maps; broadcast class table
      "q401_anderson_darling", // q398's ladder, tail-weighted terms, same literal totals
      "q402_classifier_metrics", // |C|²-bounded pinned confusion; margin aggs on local rows
      "q403_dtw", // two maxN-probed collect_lists; whole DP = ONE nested codegen fold
      "q404_mst", // Borůvka rounds: min-edge aggs + CC merges, per-round lineage cuts
      "q405_dtw_banded") // padded constant-width band rows; same fold shape as q403
    show.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
