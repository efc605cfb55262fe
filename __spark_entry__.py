"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``kafka_go_streamer_spark``; this module only
adapts it to the driver contract.

Ordering matters: the driver verifies the FIRST 50 entries of
``queries()`` in insertion order, so we put queries that have never had
a driver verdict (plus anything new this round) ahead of the names
already proven green in earlier rounds. The proven set is read from the
``CORRECTNESS_r*.json`` files the driver leaves in the repo root (every
row with rows+schema+hash all matching), seeded with the frozen
round-1/2 union below in case those files are ever absent.  A handful
of never-run queries whose core machinery is already driver-proven
through a sibling query are demoted to the back of the unverified block
(``DEMOTED``) so the window holds the riskiest 50.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from kafka_go_streamer_spark.plans import ORACLES, QUERIES

# Frozen union of CORRECTNESS_r01 + CORRECTNESS_r02 green rows (55 names,
# all pass/hash-match).  These are regression-safe to rotate out of the
# driver's 50-query window; tests/test_oracle_parity.py still runs every
# registered query locally each round.
_VERIFIED_R1_R2 = frozenset({
    "agg_conditional_pivot", "agg_count_distinct", "agg_cube",
    "agg_grouping_sets", "agg_histogram_prices", "agg_orders_by_priority",
    "agg_pricing_summary", "agg_rollup", "agg_stats",
    "agg_time_rollup_hierarchy", "ann_ivf_cells", "date_functions",
    "dedup_connected_components", "dedup_exact_assignment",
    "dedup_exact_hash", "dedup_minhash_lsh", "dedup_minhash_lsh_strict",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_winnowing_pairs", "embedding_label_centroids",
    "filter_contains", "filter_regex", "join_anti_customers_without_orders",
    "join_asof_last_purchase", "join_outer_nation_order_counts",
    "join_range_quantity_bands", "join_revenue_by_nation",
    "join_semi_customers_with_orders", "join_top_orders",
    "json_extraction", "math_functions", "multimodal_audio_meta",
    "multimodal_binary_stats", "multimodal_byte_histogram",
    "multimodal_decode_meta", "multimodal_frame_sample",
    "multimodal_resize", "project_key_value", "route_documents",
    "route_documents_counts",
    # route_events_by_type deliberately NOT seeded: its only driver row is
    # an r1 missing-fixture error (CORRECTNESS_r01), so it must sort into
    # the unverified-first window until a green verdict lands.
    "route_split_merge_roundtrip", "sample_stratified_hash",
    "set_ops_customer_cohorts", "sort_global_topk", "string_functions",
    "window_distribution_ranks", "window_lag_lead_order_gap",
    "window_moving_avg", "window_range_frame_1h",
    "window_rank_dense_ntile", "window_running_sum",
    "window_topk_parts_per_brand",
})


def _driver_verified() -> frozenset[str]:
    """All names with a fully-green driver verdict in any recorded
    round, so the 50-query window auto-rotates to whatever has not
    been proven yet."""
    seen = set(_VERIFIED_R1_R2)
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                seen.add(name)
    return frozenset(seen)


DRIVER_VERIFIED = _driver_verified()

# Never-driver-run queries whose core machinery already has a green
# driver row via a sibling, demoted to the back of the unverified block
# when the block exceeds 50:
#   text_winnowing_fingerprints  -> winnowing proven by dedup_winnowing_pairs
#   kmeans_assign_nearest_centroid -> assignment hop inside kmeans_lloyd_refine
#   join_enrich_events_broadcast -> broadcast-join family proven x7
#   text_chunking                -> pure string/sequence fns (string_functions green)
DEMOTED = (
    "text_winnowing_fingerprints",
    "kmeans_assign_nearest_centroid",
    "join_enrich_events_broadcast",
    "text_chunking",
    # round-9 demotions: 55 new queries compete for 35 window slots
    # (15 are staleness refronts), so the low-risk newcomers whose
    # machinery is already driver-proven through a sibling yield their
    # slot to the iterative/novel spill (k-core, label propagation,
    # PSI, Theil-Sen, TOST, deseasonalized anomaly). Each demoted name
    # is locally green at BOTH SFs with a pure-Python property test.
    "events_power_analysis",        # one groupBy agg + closed formula
    "retrieval_precision_recall_at_k",  # ndcg_eval's exact machinery
    "text_ttr_lexical_diversity",   # good-turing's vocab collapse
    "text_burstiness",              # same explode+count family
    "quality_encoding_check",       # in-row arithmetic (text_quality)
    "stats_anova_oneway",           # two-stage agg (welch/chi2 shape)
)

# Queries whose CODE changed since their newest green driver verdict:
# forced to the front of the window so the verdict can't go stale.
# No longer hand-curated: tests/test_rotation_staleness.py derives the
# must-refront set mechanically (ast fingerprint of each query's
# decorator+body at its green round's record commit vs now) and FAILS
# if any stale name is missing from this tuple.  Round-10 set (the 15
# r9 refronts all landed green in CORRECTNESS_r09 with code unchanged
# since, so they rotate back out):
#   events_markov_entropy_rate: p > 0 guard before ln(p) on both
#     engines (ADVICE r9 — rounded-to-zero transition probability)
#   events_cohort_half_life: retention ratio > 0 guard before the log
#     on both engines (ADVICE r9 — rounded-to-zero retention ratio)
ROTATE_FRONT = (
    # r16 code-touched queries (tests/test_rotation_staleness.py; the
    # r15 refronts all landed green in CORRECTNESS_r15 with code
    # unchanged since, so they rotate out).
    # Mechanical (span changed since newest green round):
    #   pipeline_dedup_order_sensitivity — corpus-scaled broadcast
    #     hints on kept_a/kept_b removed (VERDICT r15 task 1)
    #   embedding_effective_dimensionality — zero-denominator guards
    #     on participation_ratio/top1_var_share, both engines
    #   multimodal_audio_meta / multimodal_resize — oracles now
    #     interpolate the shared synthesis SQL builders
    #   storage_zorder_skipping_audit — module shared with the new
    #     layout-chooser constants
    "pipeline_dedup_order_sensitivity",
    "embedding_effective_dimensionality",
    "multimodal_audio_meta",
    "multimodal_resize",
    "storage_zorder_skipping_audit",
    # Helper-drift refronts the span fingerprint cannot see:
    #   blob-synthesis arithmetic extracted to one helper
    #   (multimodal.image_params_for + *_sql builders) consumed by
    #   every synthesis site and the decode-family oracles:
    "multimodal_decode_meta",
    "multimodal_binary_stats",
    "multimodal_format_mix",
    "multimodal_aspect_ratio_buckets",
    "multimodal_decode_quarantine",
    "multimodal_phash_hamming_hist",
    "multimodal_phash_bands",
    "multimodal_dedup_blobs",
    #   fold_packed now yields per-group frames (ADVICE r15 memory
    #   fix) — same values, new Arrow batch shape:
    "pack_sequences_greedy",
    "pack_fill_rate_stats",
    "pack_cap_sweep",
    "pack_shard_span_sensitivity",
    "pipeline_pretraining_full",
    #   fidelity.py module guard rewritten -O-proof (width grid):
    "dedup_minhash_width_curve",
    #   operators/ivf_store.py drifted since this query's only green
    #   round (r7: in-plan probe added d088e6b, serve-side dedup,
    #   this round's pool param) — the shared-helper blind spot
    #   VERDICT r16 task 4 calls out:
    "ann_ivf_store_probe",
    # r16 OPTIMIZATION-touched spans (plans rewritten for performance,
    # outputs proven identical vs the DuckDB oracle; re-front so the
    # next driver window re-verifies each rewritten plan):
    "text_decontaminate",
    "ann_nprobe_recall_curve",
    "ann_recall_at_k_grid",
    "dedup_substring_spans",
    "dedup_lsh_recall_eval",
    "sketch_kll_error_curve",
    "ann_nlist_tradeoff",
    "dedup_shingle_selectivity",
    "ann_ivf_operating_surface",
    "events_lateness_trigger_matrix",
    "ann_recall_cost_frontier",
    "sketch_cms_error_profile",
    "sketch_quantile_bands",
    "sketch_kll_quantiles",
    "graph_kcore_decomposition",
    #   second r16 wave (session 2): Expand/self-join/extra-scan cuts
    #   in the lateness audits + HITS, the BM25 corpus-aggregate
    #   removal, and the one-pass nested-span packing fold:
    "events_hits_hubs",
    "events_lateness_watermark_grid",
    "events_watermark_dedup_audit",
    "retrieval_hybrid_rrf",
    "text_bm25_topk",
    #   third r16 wave (session 3): single-consumption CC output in the
    #   drop-bias rollup (window total over the source aggregate
    #   replaces the broadcast-scalar bind), and the weak-link audit's
    #   shared pinned pair frame + isolated-free contraction:
    "dedup_drop_bias_by_source",
    "dedup_weak_link_audit",
    #   ...and the histogram's label-frame aggregate form (no corpus
    #   window, no countDistinct Expand, no isolated union):
    "dedup_component_size_histogram",
)


def _ordered_names() -> list[str]:
    names = list(QUERIES)
    front = [n for n in ROTATE_FRONT if n in names]
    rest = [n for n in names if n not in front]
    unverified = [
        n for n in rest if n not in DRIVER_VERIFIED and n not in DEMOTED
    ]
    demoted = [n for n in DEMOTED if n in rest and n not in DRIVER_VERIFIED]
    verified = [n for n in rest if n in DRIVER_VERIFIED]
    return front + unverified + demoted + verified


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the content-based router
    (the reference's core operator) over the documents table."""
    return QUERIES["route_documents"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query correctness window covers the queries with no
    prior driver verdict first (see module docstring)."""
    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; queries absent here get the weaker rows-only check."""
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
