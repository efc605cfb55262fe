"""The sketch queries verified against straight-line pure-Python
reference implementations (no Spark, no SQL) — independent of both
engines, so a shared Spark/DuckDB misunderstanding of the sketch math
can't cancel out the way it could in the oracle parity check alone."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans.sketches import (
    BLOOM_ACCTBAL,
    BLOOM_K,
    BLOOM_M,
    CMS_D,
    CMS_W,
    HLL_M,
    HLL_NUMERATOR,
    HLL_W,
)

SF = "/root/testdata/sf0.001"


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def events():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def _hll_reference(user_ids) -> tuple[int, float, int]:
    """(filled_registers, corrected_estimate, exact) from pure Python."""
    regs: dict[int, int] = {}
    for uid in user_ids:
        h = int(_md5_hex(str(uid))[:15], 16)
        idx, w = h % HLL_M, h >> 6
        rho = (HLL_W + 1) - w.bit_length() if w else HLL_W + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    int_sum = sum(1 << (55 - r) for r in regs.values())
    int_sum += (HLL_M - len(regs)) * (1 << 55)
    raw = HLL_NUMERATOR / int_sum
    if raw <= 2.5 * HLL_M and len(regs) < HLL_M:
        est = HLL_M * math.log(float(HLL_M) / (HLL_M - len(regs)))
    else:
        est = raw
    return len(regs), est, len(set(user_ids))


def test_hll_matches_python_reference(spark, events):
    got = {
        r["event_type"]: r
        for r in QUERIES["sketch_hll_distinct"](spark, SF).collect()
    }
    by_type: dict[str, list] = {}
    for uid, et in events:
        by_type.setdefault(et, []).append(uid)
    by_type["__all__"] = [uid for uid, _ in events]
    assert set(got) == set(by_type)
    for et, uids in by_type.items():
        filled, est, exact = _hll_reference(uids)
        assert got[et]["filled_registers"] == filled, et
        assert got[et]["exact_distinct"] == exact, et
        assert abs(got[et]["hll_distinct"] - est) <= 0.1 + 1e-9, et


def test_cms_estimates_match_python_and_never_undercount(spark, events):
    truth = Counter(uid for uid, _ in events)
    grid: dict[tuple[int, int], int] = {}
    for uid in truth.elements():
        hx = _md5_hex(str(uid))
        for d in range(CMS_D):
            b = int(hx[8 * d : 8 * d + 8], 16) % CMS_W
            grid[(d, b)] = grid.get((d, b), 0) + 1

    def est(uid) -> int:
        hx = _md5_hex(str(uid))
        return min(
            grid[(d, int(hx[8 * d : 8 * d + 8], 16) % CMS_W)]
            for d in range(CMS_D)
        )

    rows = QUERIES["sketch_countmin_heavy_users"](spark, SF).collect()
    assert len(rows) == 10
    want_top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["user_id"], r["true_count"]) for r in rows] == want_top
    for r in rows:
        assert r["cms_estimate"] == est(r["user_id"])
        assert r["cms_estimate"] >= r["true_count"]  # one-sided error


def test_bloom_has_no_false_negatives_and_python_fp_set(spark):
    con = duckdb.connect()
    custs = con.execute(
        f"SELECT c_custkey, c_acctbal FROM '{SF}/customer.parquet'"
    ).fetchall()
    con.close()
    members = {k for k, bal in custs if bal > BLOOM_ACCTBAL}

    def positions(key: int) -> list[int]:
        hx = _md5_hex(str(key))
        return [
            int(hx[8 * k : 8 * k + 8], 16) % BLOOM_M for k in range(BLOOM_K)
        ]

    bits = {p for m in members for p in positions(m)}
    positive = {
        k for k, _ in custs if all(p in bits for p in positions(k))
    }
    assert members <= positive  # the Bloom guarantee

    row = QUERIES["sketch_bloom_filter_probe"](spark, SF).collect()[0]
    assert row["n_probed"] == len(custs)
    assert row["true_members"] == len(members)
    assert row["bloom_positive"] == len(positive)
    assert row["false_positives"] == len(positive - members)
    assert row["bits_set"] == len(bits)


def test_kcenter_matches_python_greedy():
    """The unrolled k-center query must replicate the classic greedy
    (Gonzalez) selection computed in plain Python over the same
    fixture — same centers, same selection distances."""
    import math

    from kafka_go_streamer_spark.plans import QUERIES
    from kafka_go_streamer_spark.session import get_spark

    con = duckdb.connect()
    vecs = {
        vid: v
        for vid, v in con.execute(
            f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
        ).fetchall()
    }
    con.close()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    dist = {
        vid: round(1 - cos(v, vecs[0]), 6) for vid, v in vecs.items()
    }
    picks = [(1, 0, 0.0)]
    for rk in (2, 3):
        sel = min(dist, key=lambda vid: (-dist[vid], vid))
        picks.append((rk, sel, dist[sel]))
        if rk < 3:
            for vid, v in vecs.items():
                dist[vid] = min(
                    dist[vid], round(1 - cos(v, vecs[sel]), 6)
                )

    spark = get_spark()
    got = sorted(
        (r["rk"], r["vec_id"], r["sel_dist"])
        for r in QUERIES["sample_kcenter_coreset"](spark, SF).collect()
    )
    assert [(rk, vid) for rk, vid, _ in got] == [
        (rk, vid) for rk, vid, _ in picks
    ]
    for (_, _, a), (_, _, b) in zip(got, picks):
        assert abs(a - b) < 1e-5
    # selection distances are non-increasing (the coverage-radius curve)
    assert got[1][2] >= got[2][2]
