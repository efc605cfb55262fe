"""Pure-Python references for the round-9 second closing wave:
Wald-Wolfowitz runs counting, the Lo-MacKinlay variance ratio, word
burstiness (Fano factors with implicit zeros), per-user behavioral
entropy, and the A/B sizing formula."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb
import pytest

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans.timeseries import VR_K

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def _hourly(duck) -> dict[str, list[float]]:
    rows = duck.execute(
        "SELECT event_type, floor(epoch(ts)/3600)::BIGINT,"
        " round(avg(value), 6) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict[str, list[float]] = defaultdict(list)
    for et, _, x in rows:
        series[et].append(float(x))
    return series


# ------------------------------------------------------------ runs test
def test_runs_test_matches_python_counting(spark, duck):
    got = {
        r["event_type"]: r
        for r in QUERIES["stats_runs_test"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    series = _hourly(duck)
    assert set(got) == set(series)
    for et, xs in series.items():
        mu = round(sum(xs) / len(xs), 6)
        signs = [1 if x > mu else 0 for x in xs]
        runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        n, n1 = len(signs), sum(signs)
        n0 = n - n1
        e = 1.0 + 2.0 * n1 * n0 / n
        v = (
            2.0 * n1 * n0 * (2.0 * n1 * n0 - n) / (n * n * (n - 1.0))
        )
        r = got[et]
        assert r["n_hours"] == n and r["n_above"] == n1
        assert r["n_below"] == n0 and r["n_runs"] == runs, et
        assert r["z_stat"] == pytest.approx(
            (runs - e) / math.sqrt(v), abs=2e-4
        ), et


# -------------------------------------------------------- variance ratio
def test_variance_ratio_matches_python_diffs(spark, duck):
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_variance_ratio"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    series = _hourly(duck)
    for et, xs in series.items():
        d1 = [b - a for a, b in zip(xs, xs[1:])]
        dk = [xs[i] - xs[i - VR_K] for i in range(VR_K, len(xs))]

        def var(v):
            m = sum(v) / len(v)
            return round(
                sum((x - m) ** 2 for x in v) / (len(v) - 1), 6
            )

        vr = var(dk) / (VR_K * var(d1))
        se = math.sqrt(
            2.0 * (2 * VR_K - 1) * (VR_K - 1) / (3.0 * VR_K * len(d1))
        )
        r = got[et]
        assert r["n_diffs"] == len(d1), et
        assert r["variance_ratio"] == pytest.approx(vr, abs=2e-4), et
        assert r["z_stat"] == pytest.approx(
            (vr - 1.0) / se, abs=2e-3
        ), et


# ------------------------------------------------------------ burstiness
def test_burstiness_matches_python_fano(spark, duck):
    rows = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    per_word: dict[str, Counter] = defaultdict(Counter)
    n_docs = len(rows)
    for doc_id, text in rows:
        for w in re.split(r"\s+", text.lower().strip()):
            per_word[w][doc_id] += 1
    stats = {}
    for w, c in per_word.items():
        total = sum(c.values())
        ss = sum(v * v for v in c.values())
        mean = total / n_docs
        var = (ss - total * total / n_docs) / (n_docs - 1)
        stats[w] = (total, len(c), var / mean)
    top = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[:15]
    out = QUERIES["text_burstiness"](spark, SF).toPandas()
    assert list(out["word"]) == [w for w, _ in top]
    for r in out.to_dict("records"):
        total, present, fano = stats[r["word"]]
        assert r["total"] == total and r["docs_present"] == present
        assert r["fano"] == pytest.approx(fano, abs=2e-4), r["word"]
        assert r["fano"] > 0


# ---------------------------------------------------------- user entropy
def test_user_entropy_matches_python_histogram(spark, duck):
    rows = duck.execute(
        "SELECT user_id, event_type, count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    per_user: dict[int, dict[str, int]] = defaultdict(dict)
    for u, et, c in rows:
        per_user[u][et] = c
    buckets: dict[float, list[int]] = defaultdict(list)
    for u, cnts in per_user.items():
        n = sum(cnts.values())
        h = round(
            -sum((c / n) * math.log(c / n) for c in cnts.values()), 6
        )
        buckets[round(h, 1)].append(n)
    out = {
        r["entropy_bucket"]: r
        for r in QUERIES["events_user_entropy"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    assert set(out) == set(buckets)
    for b, ns in buckets.items():
        assert out[b]["n_users"] == len(ns), b
        assert out[b]["avg_events"] == pytest.approx(
            sum(ns) / len(ns), abs=5e-3
        ), b
    # sanity: entropy is bounded by ln(#event types)
    assert all(0.0 <= b <= round(math.log(5), 1) for b in buckets)


# ---------------------------------------------------------- power sizing
def test_power_analysis_matches_formula(spark, duck):
    rows = duck.execute(
        "SELECT event_type, count(*), round(stddev_samp(value), 6),"
        " round(abs(avg(value)) * 0.05, 6) FROM events GROUP BY 1"
    ).fetchall()
    out = {
        r["event_type"]: r
        for r in QUERIES["events_power_analysis"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    assert set(out) == {r[0] for r in rows}
    for et, n_obs, sd, mde in rows:
        n_req = math.ceil(
            2.0 * (1.959964 + 0.841621) ** 2 * sd * sd / (mde * mde)
        )
        r = out[et]
        assert r["n_obs"] == n_obs and r["sd"] == pytest.approx(sd)
        assert r["mde"] == pytest.approx(mde)
        assert r["n_required"] == n_req, et
        assert bool(r["feasible_now"]) == (n_obs >= 2 * n_req), et
