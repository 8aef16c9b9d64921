"""Physical-plan invariants that matter at 100 TB but are invisible to
small-SF correctness tests: pushdown, pruning, join strategy, shuffle
counts, top-K short-circuit. A regression here usually means a silent
plan pathology (lost pushdown, accidental cartesian) rather than a wrong
answer."""

from __future__ import annotations

import pytest

from crypto_streaming_lakehouse_spark.plans.audit import audit
from crypto_streaming_lakehouse_spark.registry import REGISTRY

from .conftest import SF_DIR


def _audit(spark, name):
    return audit(REGISTRY[name].fn(spark, SF_DIR))


# The brute-force ANN baselines intentionally broadcast the tiny query set
# against a single corpus scan — that plan IS a BroadcastNestedLoopJoin
# (tiny side broadcast, one pass over the corpus), and the n² dedup
# baseline is an inequality self-join by definition. Everything else must
# be cartesian-free.
_NLJ_BY_DESIGN = {"q_ann_cosine_topk", "q_ann_lsh_topk", "q_dedup_embedding_cosine"}

# Queries that attach a 1-row aggregate (corpus size, avgdl, node count,
# collected stop-gram array) via an explicit broadcast cross join — a
# scalar broadcast, not a pair explosion.
_NLJ_BY_DESIGN |= {
    "q_tfidf",
    "q_pmi_collocations",
    "q_bm25",
    "q_pagerank",
    "q_dedup_ngram_jaccard",
    "q_dedup_containment",  # same collected stop-gram array broadcast
    "q_kmeans",  # K-row centroid set broadcast against one corpus scan
    "q_dq_expectations",  # 1-row scan-agg × 1-row RI-agg scalar cross join
    "q_triangle_count",  # 1-row node/edge/wedge/triangle aggs cross-joined
    "q_vocab_coverage",  # 1-row corpus-total agg broadcast onto top-K rows
    "q_histogram",  # 1-row min/max extent agg broadcast onto the scan
    "q_doc_cross_entropy",  # 1-row corpus-token-total broadcast onto docs
    "q_dedup_semantic",  # K-row centroid set broadcast (k-means assign step)
    "q_graph_assortativity",  # 1-row node-count agg cross-joined onto moments
    "q_bigram_cross_entropy",  # 1-row corpus-token-total broadcast
    "q_benford_digits",  # 1-row digit-total broadcast onto 9 groups
    "q_lang_mixture_temperature",  # 1-row weight-normalizer broadcast
    "q_conversion_latency",  # 1-row clicker-count agg cross-joined in
    "q_hll_sketch_union",  # 1-row exact-distinct agg broadcast onto the verdict
    "q_ccnet_buckets",  # 1-row LM-total + 1-row tercile aggs broadcast onto docs
    "q_mutual_information",  # 1-row total + entropy aggs cross-joined in
    "q_dsir_weights",  # 1-row token-total agg broadcast onto the bucket table
    "q_nearest_centroid",  # 1-row folded centroid set broadcast (kmeans shape)
    "q_ks_test",  # 1-row sample-size + point-count aggs cross-joined in
    "q_pq_encode",  # 1-row folded codebook broadcast (kmeans assign shape)
    "q_rrf_fusion",  # 1-row query-vector broadcast onto the corpus scan
    "q_ann_recall_eval",  # composes the ANN NLJ baselines + 1-row truth-count
    "q_chi_square",  # 1-row total + marginal-count aggs cross-joined in
    "q_kcore_decompose",  # 1-row K-threshold + per-round count aggs
    "q_psi_drift",  # 1-row global min/max range broadcast onto the scan
    "q_silhouette",  # 1-row folded centroid set broadcast (kmeans shape)
    "q_basket_lift",  # 1-row order-count agg broadcast onto the pair table
    "q_kaplan_meier",  # 1-row corpus-end-timestamp agg broadcast onto users
    "q_quantile_normalize",  # 1-row corpus-count agg broadcast onto ranks
    "q_anova_oneway",  # 1-row grand-mean/k/n agg cross-joined onto k groups
    "q_benjamini_hochberg",  # 1-row grand-mean + m agg cross-joined in
    "q_jensen_shannon",  # 1-row token-total agg broadcast onto the vocab
    "q_kendall_tau_topk",  # K×K inequality pair join on the CONSTANT-K set
    "q_revenue_deciles",  # 1-row quantile-threshold agg broadcast onto rev
    "q_rfm_segments",  # 1-row corpus-end + tercile-threshold broadcasts
    "q_brown_forsythe",  # 1-row grand-mean agg cross-joined onto k groups
    "q_markov_entropy_rate",  # 1-row transition-total broadcast onto states
    "q_modularity_brand",  # 1-row edge-count agg broadcast onto communities
    "q_pca_power_iteration",  # 1-row λ/norm/count aggs broadcast onto dims
    "q_irls_logistic",  # 1-row standardizer + 1-row beta broadcasts per scan
    "q_naive_bayes",  # languages-sized model + 1-row vocab/prior broadcasts
    "q_knn_classifier",  # bounded query-set broadcast (q_ann_cosine_topk plan)
    "q_target_encoding",  # 1-row global-prior broadcast onto the encoder table
    "q_cv_folds",  # 1-row global-rate broadcast onto 5 fold rows
    "q_logistic_calibration",  # 1-row standardizer/beta broadcasts per scan
    "q_decision_stump",  # 9-row candidate-threshold + 1-row total broadcasts
    "q_ann_ivf_trained_topk",  # 1-row folded trained-centroid broadcast
    "q_ann_recall_trained",  # composes the ANN NLJ plans + 1-row truth-count
    "q_ann_pq_adc_topk",  # 1-row folded codebook broadcast + tiny query-LUT side
    "q_ann_pq_rerank",  # stage 1 is q_ann_pq_adc_topk's plan
    "q_ann_pq_recall",  # composes the PQ plans + brute-force truth + 1-row count
    "q_ann_ivfpq_topk",  # 1-row codebook broadcast; candidate join itself is equi
    # round-12 PQ knobs: same designed shape as q_ann_pq_rerank (the ADC
    # stage streams the code scan past a broadcast query-LUT side; the
    # R-scaled variants add a 1-row corpus-count broadcast to the filter)
    "q_ann_pq_rerank_rscaled",
    "q_ann_pq8_rerank",
    "q_ann_pq8_rerank_rscaled",
    "q_ann_pq_knobs_recall",  # composes all four + brute-force truth
    # round-12b retrieval-mining family: both ride the ANN brute-force
    # shape — a bounded query-set broadcast streamed past the corpus
    # scan (q_ann_cosine_topk's designed plan); MMR's greedy stages
    # then operate on CAND-bounded per-query tables.
    "q_hard_negative_mining",  # 10-row query broadcast × corpus scan
    "q_mmr_rerank",  # 10-row query broadcast × corpus scan + bounded stages
    # round-13 additions:
    "q_mmr_rerank_wide",  # same designed plan as q_mmr_rerank (CAND=100)
    "q_hard_negative_mining_ivfpq",  # 1-row codebook broadcast (PQ encode)
    # + broadcast query-LUT side; the cell-candidate join itself is equi
    "q_hard_negative_mining_adc8",  # code scan × broadcast query-LUT side
    # (q_ann_pq8_rerank's designed ADC shape) + 1-row corpus-count
    # broadcast folded into the R-scaled rank filter
    "q_hard_negative_band_recall",  # composes the three miners + 1-row
    # n_exact/n_mined/n_recovered count aggs cross-joined into one row
    "q_bpe_merge_round2",  # 1-row top-merge broadcast onto the
    # re-segmentation scan (the kmeans-assign scalar-broadcast shape)
    "q_bpe_learn3",  # three chained 1-row top-merge broadcasts (same shape)
    "q_retrieval_rank_metrics",  # composes the ANN NLJ baselines (truth +
    # three method plans) — the eval itself joins k×queries-row lists
    "q_contrastive_batches",  # composes the brute-force truth + the adc8
    # miner (both designed broadcast shapes); assembly itself is equi-only
    "q_bpe_compression",  # same chained 1-row top-merge broadcasts as
    # q_bpe_learn3, plus 1-row stream-length aggs cross-joined in
    "q_ivf_cell_occupancy",  # folded centroid-set broadcasts (kmeans
    # shape) + a 1-row corpus-count broadcast for the share column
    "q_pq_distortion",  # 1-row folded codebook broadcast per K (the
    # q_pq_encode shape); output is 2xPQ_SUBS rows
    "q_ann_ivfpq_trained_topk",  # folded trained-centroid + codebook
    # broadcasts (the q_ann_ivfpq_topk designed shape, trained cells)
    "q_ann_ivfpq_trained_recall",  # composes both IVF-PQ plans +
    # brute-force truth + 1-row count aggs
    "q_hard_negative_mining_ivfpq_trained",  # trained-centroid + codebook
    # broadcasts (the q_ann_ivfpq_trained_topk designed shape) + band tail
    # round-14 additions:
    "q_ivfpq_upsert_distortion",  # 1-row folded codebook broadcast +
    # 1-row cutoff broadcast onto one corpus scan (q_pq_distortion shape)
    "q_opq_rotation_distortion",  # 1-row folded codebook broadcast per
    # variant (the q_pq_distortion designed shape, one scan per layout)
    "q_ivfpq_assignment_churn",  # two folded trained-centroid broadcasts
    # (kmeans-assign shape) + a 1-row cutoff broadcast; the vec_id join
    # between the two assignments is equi
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_accidental_cartesian(spark, name):
    if name in _NLJ_BY_DESIGN:
        pytest.skip("broadcast-tiny-side NLJ is the designed plan")
    assert _audit(spark, name).nested_loop_joins == 0


def test_filter_pushdown_reaches_scan(spark):
    a = _audit(spark, "q_filter_eq")
    assert a.pushed_filter_on("event_type")
    assert a.exchanges == 0  # pure scan+filter+project: no shuffle at all


def test_column_pruning(spark):
    a = _audit(spark, "q_filter_eq")
    (scan,) = a.scans
    assert set(scan.read_columns) == {"event_id", "event_type", "value"}


def test_documents_scan_pruned(spark):
    a = _audit(spark, "q_text_stats")
    scan = a.scan_of("documents")
    assert scan is not None
    # quality stats need only the id and the text, not n_chars/lang/etc.
    assert set(scan.read_columns) == {"doc_id", "text"}


def test_ohlcv_single_shuffle(spark):
    # The gold-bars DERIVATION is one hash-aggregate shuffle on (symbol,
    # window) with map-side partial agg, plus the memo's one symbol-layout
    # repartition. The registry query itself reads the memoized gold
    # table (LogicalRDD scan — zero exchanges), mirroring the reference's
    # materialized gold layer, so audit the derivation directly.
    from crypto_streaming_lakehouse_spark.operators.bars import ohlcv_bars
    from crypto_streaming_lakehouse_spark.sources.tables import events_as_trades

    a = audit(ohlcv_bars(events_as_trades(spark, SF_DIR)))
    assert a.exchanges == 1
    assert _audit(spark, "q_ohlcv_bars").exchanges == 0


def test_zscore_fused_shuffles(spark):
    # bars agg + one symbol-window shuffle. The unfused 3-self-join plan
    # had 4 aggregations and 3 joins; fusion keeps it at two exchanges.
    assert _audit(spark, "q_zscore_anomaly").exchanges <= 2


def test_topk_uses_take_ordered(spark):
    a = _audit(spark, "q_topk_recent")
    assert a.top_k  # TakeOrderedAndProject, not a global sort


def test_small_dim_join_broadcasts(spark):
    a = _audit(spark, "q_join_inner")
    assert a.broadcast_hash_joins >= 1
    assert a.sort_merge_joins == 0


def test_minhash_bounded_shuffles(spark):
    # posting-list explode + signature groupBy + band join + verify joins;
    # everything keyed, no cartesian, bounded exchange count.
    a = _audit(spark, "q_dedup_minhash_lsh")
    assert a.nested_loop_joins == 0
    assert a.exchanges <= 4


def test_ann_brute_force_broadcasts_queries(spark):
    # the tiny query side must be the broadcast side: one corpus scan,
    # no shuffle of the big side.
    a = _audit(spark, "q_ann_cosine_topk")
    assert a.broadcast_exchanges >= 1


def test_asof_join_no_pair_explosion(spark):
    # union+window as-of: keyed exchanges only (union shuffle + right-side
    # pre-agg), NO nested-loop range join.
    a = _audit(spark, "q_asof_join")
    assert a.nested_loop_joins == 0
    assert a.exchanges <= 2


def test_pricing_summary_single_shuffle(spark):
    # TPC-H Q1 shape: scan → partial agg → one exchange → final agg
    assert _audit(spark, "q_pricing_summary").exchanges == 1


def test_top_revenue_plan(spark):
    # TPC-H Q3 shape: both dims broadcast at small SF, top-K short-circuit
    a = _audit(spark, "q_top_revenue_orders")
    assert a.broadcast_hash_joins >= 2
    assert a.top_k


def test_salted_join_stays_equi(spark):
    # salting must not degrade the join to nested-loop
    a = _audit(spark, "q_join_salted_skew")
    assert a.nested_loop_joins == 0
    assert a.broadcast_hash_joins + a.sort_merge_joins + a.shuffled_hash_joins >= 1


def test_range_join_stays_equi(spark):
    # the user_id equality must carry the join; the time range is a
    # post-join filter, never a nested-loop range join
    a = _audit(spark, "q_range_join")
    assert a.nested_loop_joins == 0
    assert a.broadcast_hash_joins + a.sort_merge_joins + a.shuffled_hash_joins >= 1


def test_decontaminate_gram_equi_join(spark):
    # inverted-index decontamination: gram equi-join + df-cap anti-join,
    # no cartesian anywhere
    a = _audit(spark, "q_decontaminate")
    assert a.nested_loop_joins == 0


def test_session_ids_single_user_shuffle(spark):
    # lag window + running-sum window + final agg all share the user_id
    # partitioning: one exchange total
    a = _audit(spark, "q_session_ids_batch")
    assert a.exchanges <= 2


def test_exists_subquery_decorrelated(spark):
    # EXISTS and the scalar count subquery must decorrelate into joins
    # (no per-row probes, no nested loop)
    a = _audit(spark, "q_exists_subquery")
    assert a.nested_loop_joins == 0


def test_truncate_and_scrub_no_shuffle(spark):
    # pure projections: fused into the scan, zero exchanges
    assert _audit(spark, "q_doc_truncate").exchanges == 0
    assert _audit(spark, "q_pii_scrub").exchanges == 0
    assert _audit(spark, "q_hash_split").exchanges == 0
    assert _audit(spark, "q_repetition_ratio").exchanges == 0


def test_stratified_sample_no_shuffle(spark):
    # hash-bucket sampling is a pure scan+filter+project
    assert _audit(spark, "q_stratified_sample").exchanges == 0


def test_tpch_q5_all_dims_broadcast(spark):
    # 6-table chain at small SF: lineitem is the only big input; every
    # dimension (region-filtered) must broadcast, never SMJ the fact table
    a = _audit(spark, "q_local_supplier_volume")
    assert a.broadcast_hash_joins >= 4
    assert a.nested_loop_joins == 0


def test_bm25_small_sides_broadcast(spark):
    # df table and (avgdl, N) scalar broadcast; the only real shuffles are
    # the tf aggregation and the doc-length rejoin
    a = _audit(spark, "q_bm25")
    assert a.broadcast_exchanges >= 1
    assert a.sort_merge_joins <= 1


def test_pmi_unigram_joins_broadcast(spark):
    # the vocab-sized unigram count table must broadcast onto the pair table
    a = _audit(spark, "q_pmi_collocations")
    assert a.broadcast_exchanges >= 2


def test_profile_single_pass(spark):
    # multi-distinct profiling: Spark plans via expand, still one scan
    a = _audit(spark, "q_profile_stats")
    assert len(a.scans) == 1


def test_ratio_to_report_single_shuffle(spark):
    # unbounded window sum: one exchange on the partition key
    assert _audit(spark, "q_ratio_to_report").exchanges == 1


def test_kmeans_assignment_broadcasts_centroids(spark):
    # the K-row centroid side must broadcast; vectors never shuffle for
    # assignment (the update agg is the only real exchange per round)
    a = _audit(spark, "q_kmeans")
    assert a.broadcast_exchanges >= 1


def test_bucketed_range_join_stays_equi(spark):
    # The keyless ±60s join must plan as a bucket EQUI-join (SMJ/SHJ on
    # the manufactured bucket key), never a nested-loop over the
    # inequality — that cartesian shape is exactly what the bucket
    # expansion exists to avoid.
    a = _audit(spark, "q_range_join_bucketed")
    assert a.nested_loop_joins == 0
    assert a.sort_merge_joins + a.shuffled_hash_joins + a.broadcast_hash_joins == 1


def test_weighted_sample_is_top_k(spark):
    # Exp-race sampling must short-circuit as TakeOrderedAndProject (a
    # per-partition k-heap + merge), never a global sort of the corpus.
    a = _audit(spark, "q_weighted_sample")
    assert a.top_k
    assert a.exchanges <= 1  # the TakeOrdered merge is the only movement


def test_triangle_wedge_joins_are_equi(spark):
    # Degree-ordered wedge enumeration: the apex self-join and the
    # closing-edge probe are EQUI joins. The co-purchase self-join and
    # degree attachment are equi too, but sit behind lineage cuts
    # (localCheckpoint materialization), so the explained plan shows only
    # the two downstream joins; the only NLJ-shaped nodes are the 1-row
    # summary cross joins.
    a = _audit(spark, "q_triangle_count")
    assert (
        a.sort_merge_joins + a.shuffled_hash_joins + a.broadcast_hash_joins
        >= 2
    )


def test_countmin_counters_broadcast(spark):
    # The sketch is depth×width cells regardless of corpus size — the
    # probe join must broadcast it, never shuffle the token stream.
    a = _audit(spark, "q_countmin_freq")
    assert a.broadcast_exchanges >= 1
    assert a.nested_loop_joins == 0


def test_kendall_topk_short_circuits(spark):
    # The top-K selection must plan as TakeOrderedAndProject (distributed
    # partial top-k), never a single-task global sort of the parts
    # aggregate; the K x K pair join is the designed bounded NLJ.
    a = _audit(spark, "q_kendall_tau_topk")
    assert a.top_k


def test_var_es_tail_join_broadcasts(spark):
    # The symbol-count-sized VaR table must broadcast back onto returns;
    # a shuffle of the returns table for a symbols-sized dimension would
    # be the wrong plan at any scale.
    a = _audit(spark, "q_var_es")
    assert a.broadcast_exchanges >= 1
    assert a.nested_loop_joins == 0


def test_capm_market_series_broadcasts(spark):
    # The per-minute market return is a time-dimension table: broadcast
    # onto returns, never a shuffle of the fact side.
    a = _audit(spark, "q_capm_beta")
    assert a.broadcast_exchanges >= 1
    assert a.nested_loop_joins == 0


def test_attribution_single_user_window(spark):
    # Last-touch attribution is ONE user-keyed window + one aggregate —
    # never a purchases x history self-join (no joins at all).
    a = _audit(spark, "q_attribution_last_touch")
    assert a.nested_loop_joins == 0
    assert (
        a.sort_merge_joins + a.shuffled_hash_joins + a.broadcast_hash_joins
        == 0
    )
