"""Round-8 operators verified against straight-line pure-Python
references (no Spark, no SQL) — independent of both engines, so a
shared Spark/DuckDB misunderstanding cannot cancel out in the oracle
parity check: MMR greedy selection, the KS statistic, Gini, and the
histogram-quantile error bound."""

from __future__ import annotations

import math

import duckdb
import pytest

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans.similarity import (
    MMR_K,
    MMR_LAMBDA,
    MMR_PANEL,
)
from kafka_go_streamer_spark.plans.sketches import QB_BINS, QB_QUANTILES

SF = "/root/testdata/sf0.001"


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    )


def test_mmr_matches_python_greedy(spark):
    con = duckdb.connect()
    vecs = dict(
        con.execute(
            f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
        ).fetchall()
    )
    con.close()
    qv = vecs[0]
    rel = {
        vid: round(_cos(v, qv), 6) for vid, v in vecs.items() if vid != 0
    }
    panel = sorted(rel, key=lambda vid: (-rel[vid], vid))[:MMR_PANEL]
    picks = []
    selected = []
    remaining = dict.fromkeys(panel, 0.0)  # vec_id -> max sim to selected
    first = min(panel, key=lambda vid: (-rel[vid], vid))
    picks.append((1, first, rel[first], round(rel[first], 6)))
    selected.append(first)
    del remaining[first]
    for vid in remaining:
        remaining[vid] = round(_cos(vecs[vid], vecs[first]), 6)
    for rk in range(2, MMR_K + 1):
        score = {
            vid: MMR_LAMBDA * rel[vid] - (1 - MMR_LAMBDA) * ms
            for vid, ms in remaining.items()
        }
        sel = min(score, key=lambda vid: (-score[vid], vid))
        picks.append((rk, sel, rel[sel], round(score[sel], 6)))
        del remaining[sel]
        for vid in remaining:
            remaining[vid] = max(
                remaining[vid], round(_cos(vecs[vid], vecs[sel]), 6)
            )
    got = sorted(
        (r["rk"], r["vec_id"], r["rel"], r["mmr_score"])
        for r in QUERIES["retrieval_mmr_rerank"](spark, SF).collect()
    )
    assert [(rk, vid) for rk, vid, _, _ in got] == [
        (rk, vid) for rk, vid, _, _ in picks
    ]
    for (_, _, ga, gb), (_, _, wa, wb) in zip(got, picks):
        assert abs(ga - wa) < 1e-5 and abs(gb - wb) < 1e-5
    # diversity really bit: the selected set is not simply the top-3
    top3 = [vid for vid in panel[:MMR_K]]
    assert {vid for _, vid, _, _ in got} != set(top3) or MMR_LAMBDA == 1.0


def test_ks_drift_matches_python_ecdf(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, value FROM '{SF}/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchall()
    con.close()
    a = sorted(v for u, v in rows if u % 2 == 0)
    b = sorted(v for u, v in rows if u % 2 == 1)
    values = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in values
    )
    row = QUERIES["stats_ks_drift"](spark, SF).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["ks_d"] - d) <= 1e-5
    crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert abs(row["crit_95"] - crit) <= 1e-5


def test_gini_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    con.close()
    by_type: dict[str, list] = {}
    for et, v in rows:
        by_type.setdefault(et, []).append(v)
    got = {
        r["event_type"]: r
        for r in QUERIES["stats_gini_concentration"](spark, SF).collect()
    }
    assert set(got) == set(by_type)
    for et, vals in by_type.items():
        xs = sorted(vals)
        n = len(xs)
        g = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (
            n * sum(xs)
        ) - (n + 1.0) / n
        assert got[et]["n_events"] == n
        assert abs(got[et]["gini"] - g) <= 1e-5, et
        assert -1e-9 <= got[et]["gini"] <= 1.0  # Gini range (non-neg values)


def test_quantile_bands_error_bounded_by_band_mass(spark):
    """The histogram estimate can be off by at most one band's width
    (the estimate and the true quantile live in the same band)."""
    rows = QUERIES["sketch_quantile_bands"](spark, SF).collect()
    assert {round(r["q"], 2) for r in rows} == {
        round(q, 2) for q in QB_QUANTILES
    }
    con = duckdb.connect()
    lo, hi = con.execute(
        f"SELECT min(l_extendedprice), max(l_extendedprice) "
        f"FROM '{SF}/lineitem.parquet'"
    ).fetchone()
    con.close()
    band = (hi - lo) / QB_BINS
    for r in rows:
        assert r["abs_err"] <= band + 1e-6, r
        assert lo - 1e-9 <= r["est"] <= hi + 1e-9


def test_rfm_tiles_partition_users(spark):
    """Quintile grid sanity: tiles are 1..5 and segment populations sum
    to the purchasing-user count."""
    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    con.close()
    rows = QUERIES["events_rfm_segments"](spark, SF).collect()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 1 <= r["r_tile"] <= 5
        assert 1 <= r["f_tile"] <= 5
        assert 1 <= r["m_tile"] <= 5
