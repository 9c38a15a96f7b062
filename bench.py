"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q_...": sec, ...}, "sf": <scale factor>}

Each query is timed end-to-end (plan + execute) and materialized through the
noop sink so the full computation runs without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather_api_automate_etl_spark.queries import REGISTRY, _load_extensions
from weather_api_automate_etl_spark.session import get_spark

BENCH_QUERIES = [
    "q_pricing_summary",     # scan + filter + 8-agg hash aggregate (fact table)
    "q_top_revenue",         # 3-way join + agg + global top-k
    "q_join_fct_dim",        # surrogate-key star join, broadcast dim
    "q_groupby_minmax_count",
    "q_quality_filter",      # pushed-down predicate scan
    "q_date_parts",          # scalar-expression projection
    "q_topk_similarity",     # vector scan + TakeOrdered
    "q_minhash_signature",   # map-only shingle/minhash pipeline
    "q_dedup_exact",         # hash-partitioned window dedup
    "q_text_tokens",         # tokenize + aggregate
    "q_event_windows",       # event-time tumbling windows
    "q_window_rank",         # analytic window functions
    "q_session_windows",     # sessionization (two-pass window)
    "q_asof_join",           # union-merge as-of join (one shuffle)
    "q_funnel",              # sessionized funnel (stacked windows + rollup)
    "q_hopping_windows",     # sliding-window expand + combinable agg
    # shuffling heavyweights — the dedup family's real cost lives here,
    # not in the map-only signature stage
    "q_minhash_pairs",       # LSH band/bucket equi-join candidate pairs
    "q_dedup_clusters",      # iterative min-label connected components
    "q_snapshot_diff",       # full-outer hash-compare CDC
    "q_knn_join",            # bucket-blocked many-probe ANN + window top-k
    "q_scd2",                # type-2 SCD merge (current-slice full outer)
    "q_bm25",                # lexical retrieval (map-only tf + broadcast stats)
    "q_pagerank",            # iterative graph dataflow (2 rounds)
    # round-4 additions: every remaining shuffle-heavy family tracked
    "q_ngram_jaccard",       # inverted-index gram join (size table NOT broadcast)
    "q_simhash_pairs",       # pigeonhole slice equi-join (37k output rows at sf0.1)
    "q_salted_agg",          # skew-salted two-phase aggregate
    "q_centroid_assign",     # broadcast centroids + WindowGroupLimit top-1
    "q_streaming_stateful",  # applyInPandasWithState drain (real stream run)
    "q_pii_redact",          # 4-pattern regex scan (codegen regexp throughput)
    "q_decontaminate",       # gram explode + distinct + broadcast bench join
    "q_kmeans",              # iterative Lloyd loop (broadcast assign + mean update)
    "q_unigram_logprob",     # explode + token-keyed freq join + per-doc reduce
    # round-5 additions: the corpus-prep heavyweights
    "q_dup_span_removal",    # span-hash shuffle + cover join + position rebuild
    "q_tfidf_top_terms",     # explode + term-keyed df join + per-doc top-k
    "q_semdedup_survivors",  # LSH buckets + in-bucket cosine pairs + anti-join
    "q_train_shuffle",       # hash permutation + per-shard row_number
    "q_corpus_pipeline",     # the composed gate→redact→clean→dedup→shard DAG
    # round-5 third wave: the stat/ML heavyweights
    "q_embedding_covariance",  # Arrow-gemm Gram partials + elementwise merge
    "q_bigram_logprob",      # zip_with bigrams + two vocab-keyed count joins
    "q_basket_pairs",        # order-keyed self-join + part-keyed marginals
    "q_cms_frequency",       # fixed-size sketch build + broadcast probe
    "q_label_propagation",   # checkpointed fixed-round community loop
    "q_cusum_changepoint",   # per-type ordered running sum + argmax window
    # round-6 additions
    "q_merge_upsert",        # anti-join upsert vs the full-refresh baseline
    "q_ann_recall",          # exact scatter + probed scan + semi-join recall
    "q_e2e_weather_pipeline",  # the WHOLE reference DAG incl. parquet writes
    "q_profile_table",       # one-scan N-column profile (count_distinct expand)
    "q_zorder_layout",       # codegen bit-interleave + 64-group rollup
    "q_hard_negatives",      # LSH-blocked cross-label pair join + top-k
    "q_fellegi_sunter",      # blocked probabilistic linkage scoring
    # round-7 additions
    "q_profile_table_approx",  # same profile, portable md5-HLL registers —
                               # no Expand (pair with q_profile_table)
    "q_bloom_prune",           # literal-bitmap codegen prefilter + exact semi join
    "q_ledger_merge",          # atomic manifest swap: partition-granular merge
    "q_ledger_skip",           # manifest zone-map pruning + stats-pruned scan
    "q_streaming_ledger_sink", # exactly-once streaming merge (txn watermark)
    "q_ledger_delete",         # takedown sweep: bloom locate + rewrite hits only
    "q_ledger_cdf",            # manifest-diff-scoped change data feed
    "q_psi_drift",             # fixed-bin PSI drift gate (two count aggs + grid)
    "q_ks_drift",              # exact two-sample KS over distinct-value ECDFs
    "q_seasonal_decompose",    # centered-MA trend + phase-mean weekly seasonal
    # round-8 additions
    "q_ledger_skip_files",     # file-granular zone-map pruning inside a partition
    "q_mv_incremental",        # manifest-diff-scoped MV refresh (replaceWhere swap)
    "q_ledger_delete_dv",      # deletion-vector takedown + compact materialize
    "q_streaming_mv",          # streaming upsert + incremental MV per batch
    "q_ledger_zorder",         # OPTIMIZE ZORDER: 2-D file clustering + skip
    "q_ann_pq",                # product-quantization codes + ADC table scan
    "q_ledger_evolve",         # additive schema evolution, read-time NULLs
    "q_js_drift",              # bounded symmetric JS divergence drift gate
    "q_bpe_encode",            # learned-merge substitution chain, per-doc stats
    # round-8 second wave
    "q_ledger_concurrent",     # two real writer threads, OCC rebase commit
    "q_ledger_restore",        # merge+delete then metadata-only rollback
    "q_ann_ivfpq",             # IVF probe routing over PQ codes (ADC scan)
    "q_cdc_apply",             # APPLY CHANGES keep-latest with delete ops
    "q_perplexity_buckets",    # unigram-LM scoring + global tercile cut
    "q_streaming_cdc_apply",   # 3-shipment CDC drain: collapse+guard+merge+delete
    "q_ann_ivfadc",            # residual PQ, per-cell ADC tables
    "q_mann_whitney",          # rank-sum over the distinct-value domain
    "q_ledger_clone",          # zero-copy shallow clone + COW divergence
    "q_ledger_constraint",     # CHECK-constraint gate + ADD CONSTRAINT scan
    "q_streaming_left_join",   # 3-drain outer join: watermark-gated null pads
    "q_ledger_history",        # DESCRIBE HISTORY: manifest-only audit log
    "q_merge_when",            # 3-clause conditional MERGE, one CASE pass
    "q_kfold",                 # content-hash fold assignment + balance
    "q_k_anonymity",           # quasi-identifier class-size audit
    "q_bpe_fertility",         # per-lang tokenizer cost-model stats
    # round-8 third wave (waves 16-17)
    "q_bucketed_join",         # bucketed-table SMJ: zero-Exchange join path
    "q_bfs_distance",          # frontier BFS, 3 hops over the order-part graph
    "q_spearman_corr",         # two rank windows + centered moment aggregate
    "q_holt_linear",           # per-series collect + JVM aggregate fold
    "q_l_diversity",           # distinct-sensitive-per-class audit
    "q_dp_counts",             # DP Laplace release (hash-PRNG, scalar math)
    "q_dsir_weights",          # token explode + dim-row broadcast weight join
    "q_image_dhash",           # PPM encode->decode->dHash + dup grouping
    "q_bootstrap_ci",          # 32x Poisson-weight explode + replicate aggs
    "q_mutual_info",           # contingency aggregate + entropy reductions
    "q_sssp",                  # 3-round Bellman-Ford min-combine
    "q_geo_join",              # 9x cell replication + haversine confirm
    "q_containment",           # inverted-index join, asymmetric measure
    "q_target_encode",         # (cat x fold) grid agg + broadcast encode
    "q_audio_features",        # WAV decode -> windowed RMS/ZCR features
    "q_ledger_repartition",    # partition-spec change: atomic full rewrite
    "q_readability",           # codegen regex syllable/sentence fold
    "q_path_ngrams",           # stacked-lead trigrams + global top-k
    "q_item_cf",               # basket-keyed CF pairs + per-item top-k
    "q_calibration_ece",       # global ntile bins + windowed ECE
    "q_mmr_rerank",            # shortlist + k greedy argmax rounds
    "q_stupid_backoff",        # held-out LM scoring, backoff left joins
    "q_als_factors",           # 4 half-round join+agg ALS solves
    "q_kaplan_meier",          # reverse-cum risk sets + log-space cumprod
    "q_benford",               # codegen digit extraction + group chi-sq
    "q_org_hierarchy",         # pointer-doubling log-round flattening
    "q_skyline_2d",            # single running-min window Pareto frontier
    "q_dynamic_partition_pruning",  # runtime DPP star join (incl. fact write)
    "q_csv_error_routing",     # PERMISSIVE corrupt-record split (incl. write)
    "q_link_prediction",       # shared-neighbor inverted-index pair join
    "q_hits",                  # 2-round normalized bipartite power iteration
    "q_wilcoxon",              # paired signed-rank windows + tie correction
    "q_weighted_quantile",     # pooled-value cumulative-weight inverse CDF
    "q_kneser_ney",            # continuation-count smoothed bigram table
    "q_clustering_coeff",      # degree-oriented wedge join + degree ratio
    "q_logrank",               # pooled-time risk-set windows, scalar test
    "q_t_closeness",           # positive-excess TVD over sparse cells
    "q_ridge_normal_eq",       # exact-decimal Gram + Cramer 3x3 solve
    "q_mann_kendall",          # calendar-bounded pairwise sign join
    "q_attribution_linear",    # user-keyed bounded range join + 1/n split
    "q_theil_sen",             # pairwise slopes + exact window medians
    "q_rrf_fusion",            # two TakeOrdered shortlists + rank fusion
    "q_ndcg",                  # top-k cut + graded-gain log-division
    "q_orc_roundtrip",         # ORC write + pushdown read + rollup
    "q_mrr",                   # broadcast query set, WindowGroupLimit cut
    "q_anova_oneway",          # integer sufficient stats + ordered fold
    "q_holt_winters",          # per-series seasonal-ring fold
    "q_textrank",              # vocab-sized graph + 2-round pagerank
    "q_paired_t",              # single group-keyed integer aggregate
    "q_decision_stump",        # distinct-value windows + argmax pick
    "q_backtest_naive",        # two lag windows, integer MAE rollup
    "q_impute_median",         # group-median window + keyed fill join
    "q_bh_fdr",                # m-row rank window + step-up cut
    "q_streaks",               # distinct-day islands, no self-join
    "q_control_chart",         # integer stats + keyed limits join
    "q_rare_collapse",         # category-keyed verdict join
    "q_drift_sweep_fdr",       # 6-feature chi2 fold + WH z + BH cut
    "q_srm_check",             # distinct-unit grain + closed-form z
    "q_lag_features",          # one window pass per series
    "q_quality_suite",         # six scan-rate rules, 1-row unions
    "q_trimmed_mean",          # rank window + exact kept-mass sums
    "q_minmax_scale",          # group range join + bounded rescale
    "q_ordinal_encode",        # vocab-sized rank window + keyed join
    # round-9 additions
    "q_multimodal_decode_interlaced",  # Adam7 7-pass de-interlace decode
    "q_compression_ratio",     # zlib deflate scan + decile histogram
    "q_roc_auc",               # distinct-score rank-identity AUC
    "q_pr_sweep",              # single-row 9-threshold conditional agg
    "q_interval_coalesce",     # running-max-end interval islands
    "q_cross_corr",            # daily collapse + 15-lag tiny self-join
    "q_jl_project",            # zero-shuffle +-1 projection fold
    "q_brier_decomposition",   # fixed-width bins + 10-row window sums
    "q_caliper_match",         # union-merge score matching, date blocks
    "q_kruskal_wallis",        # distinct-value k-group rank test
    "q_attribution_decay",     # user-keyed decay-weighted credit join
    "q_lsh_recall",            # truth-vs-candidates full-outer audit
    "q_reshard_stability",     # 4x map-side md5 shard assignments
    "q_embedding_drift",       # posexplode partials + 64-row windows
    "q_conformal",             # group order-stat windows + coverage join
    "q_good_turing",           # shingle counts -> freq-of-freqs + tiny join
    "q_test_functional_dep",   # determinant-keyed FD violation aggregate
    "q_test_monotonic",        # per-key lag window violation filter
    "q_cuped",                 # unit-keyed pairs + 1-row moment reduce
    "q_median_ci",             # group rank window + order-stat picks
    "q_mcnemar",               # 1-scan paired contingency cells
    "q_cohens_kappa",          # 1-scan agreement cells + kappa
    "q_youden_cutoff",         # distinct-score cutoff argmax
    "q_gains_table",           # global ntile + 10-row window sums
    "q_rolling_actives",       # grain dedupe + bounded x7 contribute
    "q_new_vs_returning",      # first-day join on the grain key
    "q_daily_percentiles",     # day rank windows, order-stat picks
    "q_stickiness",            # two rolling-active grains + day join
    "q_cohort_ltv",            # customer min join + months-sized rollup
    "q_time_to_convert",       # first-ts aggregate + delay-domain ranks
    "q_mde",                   # 1-scan conditional moments + closed form
    "q_dup_rate_by_source",    # hash-group + join-back + source rollup
    "q_heaps_law",             # first-bucket mins + 10-row OLS fit
]


def main() -> None:
    _load_extensions()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path once on a trivial action so query timings
    # measure the engine, not first-call initialization.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Best-of-3 per query: the first run pays one-time codegen/planning
    # (~1.9 s at sf0.1); the second is the steady-state engine cost, which
    # is what a resident service (or the 1000-executor run this code
    # targets) actually pays per query.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        best = float("inf")
        # 3 runs: measured host-load variance between whole-bench invocations
        # is ~±40%; the extra warm run tightens the recorded best materially.
        # Run 1 (recorded separately as cold) pays one-time planning/codegen.
        for i in range(3):
            start = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.monotonic() - start
            if i == 0:
                cold[name] = round(elapsed, 3)
            best = min(best, elapsed)
        timings[name] = round(best, 3)

    payload = {
        "metric": "headline query wall time, noop-materialized",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cold_queries": cold,
        "cold_total": round(sum(cold.values()), 3),
        "sf": sf,
    }
    # Sidecar with the COMPLETE warm/cold maps: the driver records bench
    # stdout with a truncated tail once the set grows past ~50 queries
    # (BENCH_r06/r07/r08 "parsed": null), so round-over-round comparisons
    # had to be reconstructed by hand. The sidecar is committed each round
    # as the authoritative record.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
        "w",
    ) as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    # Full payload first for the human log, then a COMPACT summary as the
    # LAST stdout line: the driver captures only a bounded stdout tail and
    # json-parses the final line, so it must fit (r08 verdict item 5). The
    # compact line keeps the driver's expected keys and carries the 25
    # slowest warm queries — the ones a regression gate would read —
    # bounded to ~1.2 KB regardless of suite growth.
    print(json.dumps(payload))
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:25]
    )
    compact = {
        "metric": "headline query wall time, noop-materialized (25 slowest shown; full map in BENCH_FULL.json)",
        "value": payload["value"],
        "unit": "sec",
        "queries": slowest,
        "cold_total": payload["cold_total"],
        "n": len(timings),
        "sf": sf,
    }
    sys.stdout.flush()
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
