"""Pure-Python references for the round-9 fourth wave: Markov-chain
entropy rate, join-key skew triage, and the per-dimension embedding
variance profile."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from kafka_go_streamer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


# ------------------------------------------------------------ entropy rate
def test_entropy_rate_matches_python_chain(spark, duck):
    rows = duck.execute(
        "SELECT user_id, event_type FROM events"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    trans = Counter()
    prev: dict[int, str] = {}
    for u, et in rows:
        if u in prev:
            trans[(prev[u], et)] += 1
        prev[u] = et
    out_tot: dict[str, int] = defaultdict(int)
    for (a, _), n in trans.items():
        out_tot[a] += n
    p = {
        (a, b): round(n / out_tot[a], 6) for (a, b), n in trans.items()
    }
    states = sorted(out_tot)
    nn = len(states)
    pi = {s: 1.0 / nn for s in states}
    for _ in range(3):  # MARKOV_ITERS power steps, renormalized
        nxt: dict[str, float] = defaultdict(float)
        for (a, b), pr in p.items():
            nxt[b] += pi[a] * pr
        tot = sum(nxt.values())
        pi = {s: round(nxt.get(s, 0.0) / tot, 6) for s in states}
    hr = -sum(
        pi[a] * pr * math.log(pr) for (a, _), pr in p.items()
    )
    r = QUERIES["events_markov_entropy_rate"](spark, SF).toPandas()
    assert len(r) == 1
    row = r.iloc[0]
    assert row["n_states"] == nn
    assert row["entropy_rate"] == pytest.approx(hr, abs=2e-3)
    assert row["max_entropy"] == pytest.approx(math.log(nn), abs=1e-4)
    assert row["predictability"] == pytest.approx(
        1.0 - hr / math.log(nn), abs=2e-3
    )
    assert 0.0 < row["entropy_rate"] <= row["max_entropy"]


# ----------------------------------------------------------- key skew
def test_key_skew_matches_python_counter(spark, duck):
    rows = duck.execute(
        "SELECT user_id, count(*) FROM events GROUP BY 1"
    ).fetchall()
    counts = {u: c for u, c in rows}
    n_rows = sum(counts.values())
    mean = n_rows / len(counts)
    top = sum(
        c
        for _, c in sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:10]
    )
    r = QUERIES["quality_join_key_skew"](spark, SF).toPandas().iloc[0]
    assert r["n_rows"] == n_rows and r["n_keys"] == len(counts)
    assert r["max_per_key"] == max(counts.values())
    assert r["skew_factor"] == pytest.approx(
        max(counts.values()) / mean, abs=2e-4
    )
    assert r["top10_share"] == pytest.approx(top / n_rows, abs=1e-6)
    assert r["skew_factor"] >= 1.0


# ------------------------------------------------------- dim variance
def test_dim_variance_matches_numpy(spark, duck):
    import numpy as np

    mat = np.array(
        [
            r[0]
            for r in duck.execute(
                "SELECT embedding FROM embeddings"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    var = np.round(mat.var(axis=0, ddof=1), 6)
    tv = var.sum()
    order = sorted(range(len(var)), key=lambda i: (-var[i], i))[:10]
    out = QUERIES["embedding_dim_variance"](spark, SF).toPandas()
    assert list(out["dim"]) == [i + 1 for i in order]
    for k, i in enumerate(order):
        r = out.iloc[k]
        assert r["variance"] == pytest.approx(var[i], abs=2e-6)
        assert r["share"] == pytest.approx(var[i] / tv, abs=2e-6)
        assert r["rank"] == k + 1
    # anisotropy sanity: shares are a valid sub-distribution
    assert 0.0 < out["share"].sum() <= 1.0 + 1e-9
