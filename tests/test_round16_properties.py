"""Pure-Python property oracles for the round-16 queries
(storage_layout_chooser, stats_cardinality_estimate_audit,
quality_constraint_conformance) at sf0.001."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow.parquet as pq

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans.pipeline_econ import (
    LAYOUT_FILES,
    LAYOUT_N_PROBES,
    LAYOUT_W_POINT,
    LAYOUT_W_RECT,
    LAYOUT_W_SUM,
    LAYOUT_W_TIME,
    Z_GRID_BITS,
)

SF = "/root/testdata/sf0.001"


def _md5long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _recompute() -> pd.DataFrame:
    g = 1 << Z_GRID_BITS
    e = pq.read_table(f"{SF}/events.parquet").to_pandas()
    us = e["ts"].astype("int64")  # timestamp[us] -> micros
    uid = e["user_id"].astype("int64")
    lo, hi, ulo, uhi = us.min(), us.max(), uid.min(), uid.max()
    tb = (us - lo) * g // (hi - lo + 1)
    ub = (uid - ulo) * g // (uhi - ulo + 1)
    tb64 = (us - lo) * LAYOUT_FILES // (hi - lo + 1)
    z = (
        (tb % 2) + 2 * (ub % 2) + 4 * ((tb // 2) % 2)
        + 8 * ((ub // 2) % 2) + 16 * ((tb // 4) % 2)
        + 32 * ((ub // 4) % 2)
    )
    ubkt = uid.map(lambda u: _md5long(str(u)) % LAYOUT_FILES)

    tprobes, uprobes, rprobes = [], [], []
    for i in range(1, LAYOUT_N_PROBES + 1):
        a = _md5long(f"{i}lt") % (g - 1)
        tprobes.append((lo + (hi - lo + 1) * a // g,
                        lo + (hi - lo + 1) * (a + 2) // g - 1))
        k = _md5long(f"{i}lu") % LAYOUT_FILES
        p_u = ulo + (uhi - ulo + 1) * k // LAYOUT_FILES
        uprobes.append((p_u, _md5long(str(p_u)) % LAYOUT_FILES))
        za = _md5long(f"{i}za") % (g - 1)
        zb = _md5long(f"{i}zb") % (g - 1)
        rprobes.append((
            lo + (hi - lo + 1) * za // g,
            lo + (hi - lo + 1) * (za + 2) // g - 1,
            ulo + (uhi - ulo + 1) * zb // g,
            ulo + (uhi - ulo + 1) * (zb + 2) // g - 1,
        ))

    n = len(e)
    rows = []
    for layout, fid in (
        ("time_sorted", tb64), ("zorder", z), ("user_bucket", ubkt)
    ):
        fr = pd.DataFrame(
            {"file_id": fid, "us": us.values, "uid": uid.values}
        )
        zm = fr.groupby("file_id").agg(
            f_tmin=("us", "min"), f_tmax=("us", "max"),
            f_umin=("uid", "min"), f_umax=("uid", "max"),
            cnt=("us", "size"),
        )
        num_t = sum(
            int(zm.loc[(zm.f_tmin <= thi) & (zm.f_tmax >= tlo), "cnt"].sum())
            for tlo, thi in tprobes
        )
        if layout == "user_bucket":
            num_p = sum(
                int(zm.loc[zm.index == b, "cnt"].sum())
                for _, b in uprobes
            )
        else:
            num_p = sum(
                int(zm.loc[(zm.f_umin <= u) & (zm.f_umax >= u), "cnt"].sum())
                for u, _ in uprobes
            )
        num_r = sum(
            int(zm.loc[
                (zm.f_tmin <= thi) & (zm.f_tmax >= tlo)
                & (zm.f_umin <= puhi) & (zm.f_umax >= pulo), "cnt"
            ].sum())
            for tlo, thi, pulo, puhi in rprobes
        )
        rows.append({
            "layout": layout, "num_t": num_t, "num_p": num_p,
            "num_r": num_r,
            "wnum": LAYOUT_W_TIME * num_t + LAYOUT_W_POINT * num_p
            + LAYOUT_W_RECT * num_r,
            "n": n,
        })
    return pd.DataFrame(rows)


def test_layout_chooser_recomputed(spark):
    """The engine's per-shape scan shares, weighted total and ranking
    must equal an end-to-end pure-pandas replay of the zone-map /
    bucket arithmetic."""
    ref = _recompute().set_index("layout")
    got = {
        r["layout"]: r
        for r in QUERIES["storage_layout_chooser"](spark, SF).collect()
    }
    assert set(got) == set(ref.index)
    denom = LAYOUT_N_PROBES * ref["n"].iloc[0]
    for layout, rr in ref.iterrows():
        g_ = got[layout]
        assert abs(g_["scan_share_time_range"] - rr.num_t / denom) < 2e-6
        assert abs(g_["scan_share_user_point"] - rr.num_p / denom) < 2e-6
        assert abs(g_["scan_share_rect"] - rr.num_r / denom) < 2e-6
        assert abs(
            g_["weighted_scan_share"]
            - rr.wnum / (LAYOUT_W_SUM * denom)
        ) < 2e-6
    order = ref.sort_values(["wnum"]).index.tolist()
    got_order = [
        l for l, _ in sorted(
            got.items(), key=lambda kv: kv[1]["cost_rank"]
        )
    ]
    assert got_order == order


def test_layout_chooser_chosen_dominates(spark):
    """cost_rank 1 must carry the strictly smallest weighted scan
    share on the audited workload (dominance is the chooser's whole
    claim). Structural invariants that hold on ANY data: a hash
    bucketing cannot prune a time range (share exactly 1.0), and the
    2-D interleave beats the 1-D time sort on rectangles (its files
    bound both dims; a time-sorted file's user span is unbounded).
    Per-shape specialists are NOT asserted — at 4k rows the zipf user
    head makes bucket weights noisy enough that zone maps can beat
    bucket identity on point lookups."""
    rows = {
        r["layout"]: r
        for r in QUERIES["storage_layout_chooser"](spark, SF).collect()
    }
    chosen = next(r for r in rows.values() if r["cost_rank"] == 1)
    for r in rows.values():
        if r["layout"] != chosen["layout"]:
            assert chosen["weighted_scan_share"] < r["weighted_scan_share"]
    assert rows["user_bucket"]["scan_share_time_range"] == 1.0
    assert (
        rows["zorder"]["scan_share_rect"]
        < rows["time_sorted"]["scan_share_rect"]
    )
    ranks = sorted(r["cost_rank"] for r in rows.values())
    assert ranks == [1, 2, 3]


def test_cardinality_audit_recomputed(spark):
    """Every estimate/actual/q-error must match a pure-pandas replay of
    the independence and System-R formulas; q_error >= 1 by
    construction."""
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    l = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    cutoff = pd.Timestamp("1995-06-17")
    n_o, n_l = len(o), len(l)
    c_prio = int((o.o_orderpriority == "1-URGENT").sum())
    c_stat = int((o.o_orderstatus == "F").sum())
    c_both = int(
        ((o.o_orderpriority == "1-URGENT") & (o.o_orderstatus == "F")).sum()
    )
    c_rf = int((l.l_returnflag == "R").sum())
    c_ls = int((l.l_linestatus == "F").sum())
    c_rfls = int(((l.l_returnflag == "R") & (l.l_linestatus == "F")).sum())
    c_ship = int((l.l_shipdate <= cutoff).sum())
    c_rship = int(
        ((l.l_returnflag == "R") & (l.l_shipdate <= cutoff)).sum()
    )
    ndv = max(o.o_orderkey.nunique(), l.l_orderkey.nunique())
    urgent = set(o.loc[o.o_orderpriority == "1-URGENT", "o_orderkey"])
    act_join = int(l.l_orderkey.isin(urgent).sum())
    expect = {
        "orders_priority_and_status": (c_prio * c_stat / n_o, c_both),
        "lineitem_flag_and_status": (c_rf * c_ls / n_l, c_rfls),
        "lineitem_flag_and_shipdate": (c_rf * c_ship / n_l, c_rship),
        "join_urgent_orders_lineitem": (c_prio * n_l / ndv, act_join),
    }
    got = {
        r["est_case"]: r
        for r in QUERIES["stats_cardinality_estimate_audit"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(expect)
    for name, (est, act) in expect.items():
        g = got[name]
        assert abs(g["est_rows"] - est) < 0.01
        assert g["actual_rows"] == act
        qe = max(est, act) / min(est, act)
        assert abs(g["q_error"] - qe) < 1e-3
        assert g["q_error"] >= 1.0


def test_constraint_conformance_recomputed(spark):
    """Each contract's (checked, violations) must equal a pandas
    replay; keys/domains conform on the fixtures while the temporal
    and arithmetic contracts genuinely fail (the mixed signal the
    audit exists to surface)."""
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    l = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    j = l.merge(
        o[["o_orderkey", "o_orderdate", "o_totalprice"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    per_order = j.assign(
        chg=j.l_extendedprice * (1 - j.l_discount) * (1 + j.l_tax)
    ).groupby("o_orderkey").agg(
        tp=("o_totalprice", "first"), s=("chg", "sum")
    )
    expect = {
        "fk_lineitem_orderkey": (
            len(l), int((~l.l_orderkey.isin(set(o.o_orderkey))).sum())
        ),
        "fk_orders_custkey": (
            len(o), int((~o.o_custkey.isin(set(c.c_custkey))).sum())
        ),
        "domain_quantity_1_50": (
            len(l), int(((l.l_quantity < 1) | (l.l_quantity > 50)).sum())
        ),
        "order_placed_before_ship": (
            len(j), int((j.l_shipdate < j.o_orderdate).sum())
        ),
        "totalprice_equals_line_sum": (
            len(per_order),
            # the contract compares the CENT-ROUNDED gap (engine-stable
            # boundary): violation iff round(|tp - s|, 2) > 0.01
            int(((per_order.tp - per_order.s).abs().round(2) > 0.01).sum()),
        ),
    }
    got = {
        r["constraint_name"]: r
        for r in QUERIES["quality_constraint_conformance"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(expect)
    for name, (n, v) in expect.items():
        assert got[name]["n_checked"] == n, name
        assert got[name]["n_violations"] == v, name
        assert abs(got[name]["violation_share"] - v / n) < 2e-6
    assert got["fk_lineitem_orderkey"]["n_violations"] == 0
    assert got["domain_quantity_1_50"]["n_violations"] == 0
    assert got["order_placed_before_ship"]["n_violations"] > 0
    assert got["totalprice_equals_line_sum"]["violation_share"] == 1.0


def test_deletion_propagation_recomputed(spark):
    """Cascade counts, touched-partition sets and amplification must
    match a pandas replay; structural invariants: amplification >= 1
    wherever something is deleted, and the COW rewrite volume always
    bounds the MOR tombstone volume."""
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    l = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    e = pq.read_table(f"{SF}/events.parquet").to_pandas()
    del_c = c[c.c_custkey % 101 == 0]
    del_o = o[o.o_custkey % 101 == 0]
    del_l = l[l.l_orderkey.isin(set(del_o.o_orderkey))]
    del_e = e[e.user_id % 17 == 0]
    om = o.o_orderdate.dt.to_period("M")
    lm = l.l_shipdate.dt.to_period("M")
    ed = e.ts.dt.floor("D")
    expect = {
        "customer": (len(c), len(del_c),
                     del_c.c_nationkey.nunique(),
                     int(c.c_nationkey.isin(set(del_c.c_nationkey)).sum())),
        "orders": (len(o), len(del_o),
                   del_o.o_orderdate.dt.to_period("M").nunique(),
                   int(om.isin(set(del_o.o_orderdate.dt.to_period("M"))).sum())),
        "lineitem": (len(l), len(del_l),
                     del_l.l_shipdate.dt.to_period("M").nunique(),
                     int(lm.isin(set(del_l.l_shipdate.dt.to_period("M"))).sum())),
        "events": (len(e), len(del_e),
                   del_e.ts.dt.floor("D").nunique(),
                   int(ed.isin(set(del_e.ts.dt.floor("D"))).sum())),
    }
    got = {
        r["tbl"]: r
        for r in QUERIES["privacy_deletion_propagation"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(expect)
    for tbl, (n, d, p, rt) in expect.items():
        g = got[tbl]
        assert g["n_rows"] == n, tbl
        assert g["n_delete"] == d, tbl
        assert g["parts_touched"] == p, tbl
        assert g["rows_in_touched_parts"] == rt, tbl
        if d > 0:
            assert g["rewrite_amplification"] >= 1.0
            assert g["rows_in_touched_parts"] >= g["n_delete"]


def test_join_sample_estimators_recomputed(spark):
    """Sampled counts and scale-ups must match a pandas replay of the
    md5 sampling designs; the correlated design's surviving sample is
    structurally larger than the independent one at every rate (p vs
    p^2 survival)."""
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    l = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    act = int(l.l_orderkey.isin(set(o.o_orderkey)).sum())
    md5l = _md5long
    got = {
        (r["estimator"], r["inv_rate"]): r
        for r in QUERIES["stats_join_sample_estimators"](
            spark, SF
        ).collect()
    }
    for m in (16, 64, 256):
        o_ind = set(
            o.loc[
                o.o_orderkey.map(lambda k: md5l(f"{k}or") % m == 0),
                "o_orderkey",
            ]
        )
        l_ind = l[
            l.apply(
                lambda r: md5l(f"{r.l_orderkey}-{r.l_linenumber}") % m
                == 0,
                axis=1,
            )
        ]
        n_ind = int(l_ind.l_orderkey.isin(o_ind).sum())
        o_cor = set(
            o.loc[
                o.o_orderkey.map(lambda k: md5l(str(k)) % m == 0),
                "o_orderkey",
            ]
        )
        l_cor = l[l.l_orderkey.map(lambda k: md5l(str(k)) % m == 0)]
        n_cor = int(l_cor.l_orderkey.isin(o_cor).sum())
        gi = got[("independent_rows", m)]
        gc = got[("correlated_keys", m)]
        assert gi["n_sampled"] == n_ind and gi["est_rows"] == n_ind * m * m
        assert gc["n_sampled"] == n_cor and gc["est_rows"] == n_cor * m
        assert gi["actual_rows"] == act and gc["actual_rows"] == act
        assert gc["n_sampled"] >= gi["n_sampled"]
        for g in (gi, gc):
            if g["n_sampled"] > 0:
                assert g["q_error"] >= 1.0
