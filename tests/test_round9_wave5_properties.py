"""Pure-Python references for the round-9 fifth wave: Granger-style
lag screening via explicit two-regressor least squares, cohort
retention half-life, and distinct-n diversity."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import duckdb
import pytest

from kafka_go_streamer_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


# --------------------------------------------------------- Granger screen
def test_granger_screen_matches_numpy_lstsq(spark, duck):
    """r2_gain per (target, driver) must match explicit numpy least
    squares of the restricted and full lag models."""
    import numpy as np

    rows = duck.execute(
        "SELECT event_type, floor(epoch(ts)/3600)::BIGINT,"
        " round(avg(value), 6) FROM events GROUP BY 1, 2"
    ).fetchall()
    series: dict[str, dict[int, float]] = defaultdict(dict)
    for et, h, x in rows:
        series[et][int(h)] = float(x)
    got = {
        (r["target"], r["driver"]): r
        for r in QUERIES["ts_granger_lag_screen"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    types = sorted(series)
    assert set(got) == {
        (b, a) for b in types for a in types if a != b
    }
    for (tgt, drv), r in got.items():
        y, x1, x2 = [], [], []
        for h, v in sorted(series[tgt].items()):
            if h - 1 in series[tgt] and h - 1 in series[drv]:
                y.append(v)
                x1.append(series[tgt][h - 1])
                x2.append(series[drv][h - 1])
        y = np.array(y)
        n = len(y)
        assert r["n"] == n, (tgt, drv)
        Xr = np.column_stack([np.ones(n), x1])
        Xf = np.column_stack([np.ones(n), x1, x2])
        rss_r = float(
            ((y - Xr @ np.linalg.lstsq(Xr, y, rcond=None)[0]) ** 2).sum()
        )
        rss_f = float(
            ((y - Xf @ np.linalg.lstsq(Xf, y, rcond=None)[0]) ** 2).sum()
        )
        syy = float(((y - y.mean()) ** 2).sum())
        assert r["r2_gain"] == pytest.approx(
            (rss_r - rss_f) / syy, abs=2e-5
        ), (tgt, drv)
        assert r["f_stat"] == pytest.approx(
            (rss_r - rss_f) * (n - 3) / rss_f, rel=1e-3, abs=5e-3
        ), (tgt, drv)
        assert r["r2_gain"] >= -1e-9  # adding a regressor never hurts


# ------------------------------------------------------ cohort half-life
def test_cohort_half_life_matches_python_fit(spark):
    ret = QUERIES["events_retention_weekly"](spark, SF).toPandas()
    by_cohort: dict = defaultdict(dict)
    for r in ret.to_dict("records"):
        by_cohort[r["cohort_week"]][r["week_offset"]] = r["n_active"]
    out = {
        r["cohort_week"]: r
        for r in QUERIES["events_cohort_half_life"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    expected = {}
    for cw, offs in by_cohort.items():
        base = offs.get(0)
        pts = [
            (float(k), math.log(round(v / base, 6)))
            for k, v in offs.items()
            if k >= 1
        ]
        if base and len(pts) >= 2:
            n = len(pts)
            sx = sum(k for k, _ in pts)
            sy = sum(v for _, v in pts)
            sxy = sum(k * v for k, v in pts)
            sxx = sum(k * k for k, _ in pts)
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            expected[cw] = (base, n, slope)
    assert set(out) == set(expected)
    for cw, (base, n, slope) in expected.items():
        r = out[cw]
        assert r["cohort_size"] == base and r["n_weeks"] == n
        assert r["decay_slope"] == pytest.approx(slope, abs=2e-4)
        if slope < 0:
            assert r["half_life_weeks"] == pytest.approx(
                -math.log(2) / slope, abs=0.02
            )
            assert r["half_life_weeks"] > 0


# ----------------------------------------------------------- distinct-n
def test_distinct_n_matches_python_sets(spark, duck):
    rows = duck.execute("SELECT lang, text FROM documents").fetchall()
    uni: dict[str, list] = defaultdict(list)
    big: dict[str, list] = defaultdict(list)
    for lang, text in rows:
        ws = re.split(r"\s+", text.lower().strip())
        uni[lang].extend(ws)
        big[lang].extend(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    got = {
        r["lang"]: r
        for r in QUERIES["text_distinct_n"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    assert set(got) == set(uni)
    for lang in uni:
        r = got[lang]
        assert r["n_tokens"] == len(uni[lang])
        assert r["n_bigrams"] == len(big[lang])
        assert r["distinct_1"] == pytest.approx(
            len(set(uni[lang])) / len(uni[lang]), abs=1e-6
        )
        assert r["distinct_2"] == pytest.approx(
            len(set(big[lang])) / len(big[lang]), abs=1e-6
        )
        # diversity ordering sanity: bigrams are more distinct
        assert r["distinct_2"] > r["distinct_1"]
