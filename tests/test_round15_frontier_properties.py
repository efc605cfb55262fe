"""Pure-Python property oracles for the round-15 frontier wave
(plans/frontier.py), run at sf0.001: each query's numbers are
recomputed from the raw parquet with pandas/numpy (no Spark, no SQL)
or pinned by cross-query identities the constructions guarantee."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans.frontier import (
    ALPHA_GRID,
    COMPACT_TARGET_BYTES,
    N_SINK_WRITERS,
    ROW_STORE_OVERHEAD,
    SINK_EPOCH_SPAN,
    SPAN_GRID,
    _ivf_surface_pairs,
)

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_compaction_economics_recomputed(spark):
    d = _docs()
    size = d["text"].str.encode("utf-8").str.len() + ROW_STORE_OVERHEAD
    files = size.groupby(
        [d["doc_id"] // SINK_EPOCH_SPAN, d["doc_id"] % N_SINK_WRITERS]
    ).sum()
    total = int(files.sum())
    rows = {
        r["target_bytes"]: r
        for r in QUERIES["storage_compaction_economics"](spark, SF).collect()
    }
    assert set(rows) == set(COMPACT_TARGET_BYTES)
    for t in COMPACT_TARGET_BYTES:
        r = rows[t]
        assert r["n_files_before"] == len(files)
        assert r["total_bytes"] == total
        assert r["n_files_after"] == -(-total // t)
        assert r["n_small_before"] == int((files < t).sum())
        assert float(r["scan_amplification"]) == round(
            len(files) / -(-total // t), 2
        )
    # a bigger target always compacts at least as hard
    after = [rows[t]["n_files_after"] for t in sorted(COMPACT_TARGET_BYTES)]
    assert after == sorted(after, reverse=True)


def test_temperature_sweep_recomputed(spark):
    from kafka_go_streamer_spark.plans.training_ops import MIX_TOTAL

    d = _docs()
    mass = d.groupby("source")["n_chars"].sum()
    rows = {
        float(r["alpha"]): r
        for r in QUERIES["sample_temperature_sweep"](spark, SF).collect()
    }
    assert set(rows) == set(ALPHA_GRID)
    for a in ALPHA_GRID:
        w = np.round(np.power(mass.to_numpy(dtype=float), a), 6)
        tw = w.sum()
        raw = np.floor(MIX_TOTAL * w / tw)
        quota = np.maximum(1, raw).astype(int)
        r = rows[a]
        assert r["n_sources"] == len(mass)
        assert r["sum_quota"] == int(quota.sum())
        assert r["max_quota"] == int(quota.max())
        assert r["n_at_floor"] == int((raw < 1).sum())
        assert float(r["top_share"]) == round(w.max() / tw, 6)
    # less flattening -> the biggest source owns a larger share
    shares = [float(rows[a]["top_share"]) for a in sorted(ALPHA_GRID)]
    assert shares == sorted(shares)


def test_norm_profile_recomputed(spark):
    e = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    rows = {
        r["label"]: r
        for r in QUERIES["embedding_norm_profile_by_label"](
            spark, SF
        ).collect()
    }
    for label, g in e.groupby("label"):
        vecs = np.stack(
            g["embedding"].map(lambda v: np.asarray(v, dtype=np.float64))
        )
        nrm = np.round(np.sqrt((vecs * vecs).sum(axis=1)), 6)
        r = rows[label]
        assert r["n_vecs"] == len(g)
        assert r["dims"] == vecs.shape[1]
        assert float(r["mean_norm"]) == round(float(nrm.mean()), 6)
        assert float(r["min_norm"]) == round(float(nrm.min()), 6)
        assert float(r["max_norm"]) == round(float(nrm.max()), 6)
        assert (
            float(r["min_norm"])
            <= float(r["p50_norm"])
            <= float(r["max_norm"])
        )


def test_ivf_surface_monotone_and_anchored(spark):
    rows = {
        (r["nlist"], r["nprobe"]): r
        for r in QUERIES["ann_ivf_operating_surface"](spark, SF).collect()
    }
    assert set(rows) == set(_ivf_surface_pairs())
    nlists = sorted({nl for nl, _ in rows})
    for nl in nlists:
        probes = sorted(p for n, p in rows if n == nl)
        rec = [float(rows[(nl, p)]["mean_recall_at_10"]) for p in probes]
        scan = [float(rows[(nl, p)]["mean_scan_share"]) for p in probes]
        # probing more cells can only help recall and costs more scan
        assert rec == sorted(rec)
        assert scan == sorted(scan)
        # exhaustive anchor: nprobe == nlist scans everything and the
        # re-rank is exactly the ground-truth cut (nlist=8 has no
        # anchor — NPROBE_SWEEP tops out at 4)
        if (nl, nl) in rows:
            full = rows[(nl, nl)]
            assert float(full["mean_recall_at_10"]) == 1.0
            assert float(full["mean_scan_share"]) == 1.0


def test_ivf_surface_nprobe1_column_equals_nlist_tradeoff(spark):
    """The surface's nprobe=1 column must reproduce
    ``ann_nlist_tradeoff`` exactly — same panel, same centroids, same
    single-probe rule, independently constructed."""
    surface = {
        r["nlist"]: r
        for r in QUERIES["ann_ivf_operating_surface"](spark, SF).collect()
        if r["nprobe"] == 1
    }
    trade = {
        r["nlist"]: r
        for r in QUERIES["ann_nlist_tradeoff"](spark, SF).collect()
    }
    assert set(surface) == set(trade)
    for nl, t in trade.items():
        s = surface[nl]
        assert s["n_queries"] == t["n_queries"]
        assert float(s["mean_recall_at_10"]) == float(
            t["mean_recall_at_10"]
        )
        assert float(s["mean_scan_share"]) == float(t["mean_scan_share"])


def _pure_fold(tokens: list[int], cap: int) -> list[int]:
    """Sequence sizes of the greedy fold over one shard's doc order."""
    seqs, fill = [], 0
    for i, t in enumerate(tokens):
        if i > 0 and fill + t > cap:
            seqs.append(fill)
            fill = 0
        fill += t
    seqs.append(fill)
    return seqs


def test_span_sensitivity_recomputed(spark):
    from kafka_go_streamer_spark.functions.text import TOKEN_RE
    from kafka_go_streamer_spark.plans.training_ops import PACK_CAP
    import re

    d = _docs().sort_values("doc_id")
    tok = re.compile(TOKEN_RE)
    d["n_tokens"] = d["text"].map(lambda s: len(tok.findall(s)))
    rows = {
        r["shard_span"]: r
        for r in QUERIES["pack_shard_span_sensitivity"](spark, SF).collect()
    }
    assert set(rows) == set(SPAN_GRID)
    for span in SPAN_GRID:
        shard = d["doc_id"] // span
        seqs: list[int] = []
        n_groups = 0
        for _, g in d.groupby([d["source"], shard]):
            n_groups += 1
            seqs.extend(_pure_fold(list(g["n_tokens"]), PACK_CAP))
        r = rows[span]
        assert r["n_groups"] == n_groups
        assert r["n_sequences"] == len(seqs)
        assert r["real_tokens"] == sum(seqs)
        pad = sum(PACK_CAP - s for s in seqs if s <= PACK_CAP)
        assert r["pad_tokens"] == pad
        assert float(r["pad_share"]) == round(
            pad / (len(seqs) * PACK_CAP), 6
        )
    # identical docs at every span: total real tokens cannot move
    toks = {rows[s]["real_tokens"] for s in SPAN_GRID}
    assert len(toks) == 1
    # coarser shards mean fewer boundary-stranded sequences
    nseq = [rows[s]["n_sequences"] for s in sorted(SPAN_GRID)]
    assert nseq == sorted(nseq, reverse=True)
