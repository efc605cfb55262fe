"""Pure-Python references for the round-9 closing stats wave —
independent of both Spark and DuckDB, so a shared engine
misunderstanding cannot cancel out in the oracle parity check:
Spearman rho (tie-averaged ranks), Kendall tau-b (pair counting),
Jarque-Bera moments, Brown-Forsythe ANOVA-on-deviations, the TOST
decision algebra, the Kaplan-Meier product limit, the hourly ACF
recurrence, DAU/WAU containment, path-trigram counting, and
per-label centroid drift."""

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


def _tie_avg_ranks(xs: list[float]) -> list[float]:
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and xs[order[j]] == xs[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1 .. j
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


# ------------------------------------------------------------- Spearman
def test_spearman_matches_python_ranks(spark, duck):
    """rho per event type must match a from-scratch tie-averaged-rank
    correlation over (value, fractional-epoch) pairs."""
    rows = duck.execute(
        "SELECT event_type, value, epoch(ts) FROM events"
    ).fetchall()
    by_type: dict[str, list[tuple[float, float]]] = defaultdict(list)
    for et, v, t in rows:
        by_type[et].append((float(v), float(t)))
    got = {
        r["event_type"]: (r["n"], r["spearman_rho"])
        for r in QUERIES["stats_spearman_corr"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    assert set(got) == set(by_type)
    for et, pairs in by_type.items():
        rv = _tie_avg_ranks([p[0] for p in pairs])
        rt = _tie_avg_ranks([p[1] for p in pairs])
        n = len(pairs)
        mean = (n + 1) / 2.0
        sxy = sum((a - mean) * (b - mean) for a, b in zip(rv, rt))
        sxx = sum((a - mean) ** 2 for a in rv)
        syy = sum((b - mean) ** 2 for b in rt)
        rho = sxy / math.sqrt(sxx * syy)
        assert got[et][0] == n
        assert got[et][1] == pytest.approx(rho, abs=1e-5), et


# ----------------------------------------------------------- Kendall tau
def test_kendall_tau_matches_pair_counting(spark, duck):
    """concordant/discordant counts and tau-b per type must match an
    O(n^2) Python pair count over the rounded daily means."""
    rows = duck.execute(
        """
        SELECT event_type, CAST(ts AS DATE) AS day,
               round(avg(value), 6) AS x
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    by_type: dict[str, list[float]] = defaultdict(list)
    for et, _, x in rows:  # rows are day-ordered per type
        by_type[et].append(float(x))
    got = {
        r["event_type"]: r
        for r in QUERIES["stats_kendall_tau_daily"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    assert set(got) == set(by_type)
    for et, xs in by_type.items():
        conc = disc = tx = 0
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                if xs[j] > xs[i]:
                    conc += 1
                elif xs[j] < xs[i]:
                    disc += 1
                else:
                    tx += 1
        n = len(xs)
        n0 = n * (n - 1) / 2.0
        tau = (conc - disc) / math.sqrt((n0 - tx) * n0)
        r = got[et]
        assert (r["n_days"], r["concordant"], r["discordant"]) == (
            n,
            conc,
            disc,
        ), et
        assert r["kendall_tau"] == pytest.approx(tau, abs=1e-5), et


# ---------------------------------------------------------- Jarque-Bera
def test_jarque_bera_matches_python_moments(spark, duck):
    """skewness / excess kurtosis / JB per type must match the same
    rounding pipeline computed in straight-line Python."""
    rows = duck.execute(
        "SELECT event_type, value::DOUBLE FROM events"
    ).fetchall()
    by_type: dict[str, list[float]] = defaultdict(list)
    for et, v in rows:
        by_type[et].append(v)
    got = {
        r["event_type"]: r
        for r in QUERIES["stats_jarque_bera"](spark, SF)
        .toPandas()
        .to_dict("records")
    }
    for et, vs in by_type.items():
        n = len(vs)
        raw_mu = sum(vs) / n
        mu = round(raw_mu, 6)
        # stddev_samp uses the UNROUNDED mean; only its result is rounded
        sd = round(
            math.sqrt(sum((v - raw_mu) ** 2 for v in vs) / (n - 1)), 6
        )
        zs = [round((v - mu) / sd, 6) for v in vs]
        skew = round(sum(z**3 for z in zs) / n, 6)
        kurt = round(sum(z**4 for z in zs) / n - 3.0, 6)
        jb = n / 6.0 * (skew**2 + kurt**2 / 4.0)
        r = got[et]
        assert r["n"] == n
        assert r["skewness"] == pytest.approx(skew, abs=2e-5), et
        assert r["ex_kurtosis"] == pytest.approx(kurt, abs=2e-4), et
        assert r["jb_stat"] == pytest.approx(jb, rel=1e-3), et


# -------------------------------------------------------- Brown-Forsythe
def test_brown_forsythe_matches_python(spark, duck):
    """The BF statistic must equal a Python one-way ANOVA over
    |x - group median| with interpolated medians."""
    rows = duck.execute(
        "SELECT event_type, value::DOUBLE FROM events"
    ).fetchall()
    by_type: dict[str, list[float]] = defaultdict(list)
    for et, v in rows:
        by_type[et].append(v)

    def median(vs: list[float]) -> float:
        s = sorted(vs)
        n = len(s)
        return (
            s[n // 2]
            if n % 2
            else (s[n // 2 - 1] + s[n // 2]) / 2.0
        )

    groups = []
    for et, vs in by_type.items():
        m = median(vs)
        groups.append([round(abs(v - m), 6) for v in vs])
    k = len(groups)
    nn = sum(len(g) for g in groups)
    grand = sum(sum(g) for g in groups) / nn
    ssb = sum(
        len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups
    )
    ssw = sum(
        sum((z - sum(g) / len(g)) ** 2 for z in g) for g in groups
    )
    bf = (ssb / (k - 1)) / (ssw / (nn - k))
    r = (
        QUERIES["stats_levene_bf"](spark, SF)
        .toPandas()
        .to_dict("records")[0]
    )
    assert (r["k_groups"], r["n_total"]) == (k, nn)
    assert r["bf_stat"] == pytest.approx(bf, rel=1e-3)


# ----------------------------------------------------------------- TOST
def test_tost_decision_algebra(spark, duck):
    """The reported statistics must satisfy the TOST identities
    (t_lower/t_upper derived from mean_diff, margin, se) and match a
    Python recompute of the cohort sufficient statistics."""
    from kafka_go_streamer_spark.plans.timeseries import (
        TOST_MARGIN_FRAC,
        TOST_Z,
    )

    rows = duck.execute(
        """
        SELECT user_id % 2 AS grp, value::DOUBLE
        FROM events WHERE event_type = 'purchase'
        """
    ).fetchall()
    a = [v for g, v in rows if g == 0]
    b = [v for g, v in rows if g == 1]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    diff = mb - ma
    margin = TOST_MARGIN_FRAC * (na * ma + nb * mb) / (na + nb)
    se = math.sqrt(va / na + vb / nb)
    r = (
        QUERIES["stats_tost_equivalence"](spark, SF)
        .toPandas()
        .to_dict("records")[0]
    )
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["mean_diff"] == pytest.approx(diff, abs=1e-5)
    assert r["margin"] == pytest.approx(margin, abs=1e-5)
    assert r["se"] == pytest.approx(se, abs=1e-5)
    assert r["t_lower"] == pytest.approx((diff + margin) / se, abs=1e-3)
    assert r["t_upper"] == pytest.approx((margin - diff) / se, abs=1e-3)
    assert bool(r["equivalent"]) == (
        r["t_lower"] > TOST_Z and r["t_upper"] > TOST_Z
    )


# ---------------------------------------------------------- Kaplan-Meier
def test_kaplan_meier_matches_python_product_limit(spark, duck):
    """The survival column must equal a from-scratch product-limit
    estimator, and the curve must be non-increasing with a correctly
    shrinking risk set."""
    from kafka_go_streamer_spark.plans.timeseries import KM_CENSOR_S

    rows = duck.execute(
        """
        SELECT user_id, min(epoch(ts)), max(epoch(ts))
        FROM events GROUP BY 1
        """
    ).fetchall()
    horizon = max(r[2] for r in rows)
    labs = [
        (
            int((last - first) // 86400),
            0 if horizon - last < KM_CENSOR_S else 1,
        )
        for _, first, last in rows
    ]
    d: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for dur, churned in labs:
        d[dur][0] += churned
        d[dur][1] += 1 - churned
    n_users = len(labs)
    pdf = (
        QUERIES["events_kaplan_meier"](spark, SF)
        .toPandas()
        .sort_values("duration_days")
        .reset_index(drop=True)
    )
    assert pdf["duration_days"].tolist() == sorted(d)
    at_risk = n_users
    surv = 1.0
    prev_s = 1.0 + 1e-12
    for _, row in pdf.iterrows():
        ev, cen = d[row["duration_days"]]
        assert (row["n_events"], row["n_censored"]) == (ev, cen)
        assert row["n_risk"] == at_risk
        surv *= max(1.0 - ev / at_risk, 1e-12)
        assert row["survival"] == pytest.approx(surv, abs=1e-5)
        assert row["survival"] <= prev_s
        prev_s = row["survival"]
        at_risk -= ev + cen
    assert at_risk == 0


# ------------------------------------------------------------------ ACF
def test_acf_matches_python_recurrence(spark, duck):
    """Per-type ACF at every lag must match a Python recompute over
    the rounded hourly means, and |acf| must stay <= 1 + eps (the
    missing-hour pair skip can nudge it past 1 only by float dust)."""
    rows = duck.execute(
        """
        SELECT event_type, floor(epoch(ts) / 3600)::BIGINT,
               round(avg(value), 6)
        FROM events GROUP BY 1, 2
        """
    ).fetchall()
    series: dict[str, dict[int, float]] = defaultdict(dict)
    for et, h, x in rows:
        series[et][h] = float(x)
    pdf = QUERIES["ts_autocorrelation_acf"](spark, SF).toPandas()
    for r in pdf.to_dict("records"):
        et, lag = r["event_type"], r["lag"]
        s = series[et]
        mu = round(sum(s.values()) / len(s), 6)
        denom = sum((x - mu) ** 2 for x in s.values())
        pairs = [
            (s[h], s[h + lag]) for h in s if h + lag in s
        ]
        num = sum((a - mu) * (b - mu) for a, b in pairs)
        assert r["n_pairs"] == len(pairs), (et, lag)
        assert r["acf"] == pytest.approx(num / denom, abs=1e-5)
        assert abs(r["acf"]) <= 1.0 + 1e-6


# ------------------------------------------------------------ stickiness
def test_dau_wau_containment_and_python_recount(spark, duck):
    """DAU <= WAU on every day (a day's users are a subset of the
    trailing week's), stickiness == dau/wau, and both counts match a
    Python distinct-user-day recount."""
    rows = duck.execute(
        """
        SELECT DISTINCT user_id, floor(epoch(ts) / 86400)::BIGINT
        FROM events
        """
    ).fetchall()
    by_day: dict[int, set] = defaultdict(set)
    for u, day in rows:
        by_day[day].add(u)
    pdf = QUERIES["events_dau_wau_stickiness"](spark, SF).toPandas()
    assert sorted(pdf["day"]) == sorted(by_day)
    for r in pdf.to_dict("records"):
        day = r["day"]
        dau = len(by_day[day])
        wau = len(
            set().union(
                *(by_day.get(d, set()) for d in range(day - 6, day + 1))
            )
        )
        assert (r["dau"], r["wau"]) == (dau, wau)
        assert r["dau"] <= r["wau"]
        assert r["stickiness"] == pytest.approx(dau / wau, abs=1e-5)


# --------------------------------------------------------- path trigrams
def test_path_trigrams_match_python_counter(spark, duck):
    """Every reported path's count must equal a Python trigram count
    over per-user (ts, event_id)-ordered sequences, and share must be
    n / total trigrams."""
    rows = duck.execute(
        """
        SELECT user_id, event_type
        FROM events ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    seqs: dict[int, list[str]] = defaultdict(list)
    for u, et in rows:
        seqs[u].append(et)
    counts: Counter = Counter()
    for s in seqs.values():
        for i in range(len(s) - 2):
            counts[" > ".join(s[i : i + 3])] += 1
    total = sum(counts.values())
    pdf = QUERIES["events_path_trigrams"](spark, SF).toPandas()
    want = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[: len(pdf)]
    assert [(r["path"], r["n"]) for r in pdf.to_dict("records")] == want
    for r in pdf.to_dict("records"):
        assert r["share"] == pytest.approx(r["n"] / total, abs=1e-5)


# -------------------------------------------------------- centroid drift
def test_centroid_drift_matches_python(spark, duck):
    """Per-label half-centroid L2/cosine must match a from-scratch
    Python recompute over the vec_id-parity halves."""
    rows = duck.execute(
        "SELECT label, vec_id, embedding FROM embeddings"
    ).fetchall()
    halves: dict[tuple, list] = defaultdict(list)
    for label, vid, emb in rows:
        halves[(label, vid % 2)].append([float(v) for v in emb])
    pdf = QUERIES["embedding_centroid_drift"](spark, SF).toPandas()
    for r in pdf.to_dict("records"):
        a = halves[(r["label"], 0)]
        b = halves[(r["label"], 1)]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        dim = len(a[0])
        ca = [
            round(sum(v[i] for v in a) / len(a), 6) for i in range(dim)
        ]
        cb = [
            round(sum(v[i] for v in b) / len(b), 6) for i in range(dim)
        ]
        l2 = math.sqrt(sum((x - y) ** 2 for x, y in zip(ca, cb)))
        cos = sum(x * y for x, y in zip(ca, cb)) / (
            math.sqrt(sum(x * x for x in ca))
            * math.sqrt(sum(y * y for y in cb))
        )
        assert r["centroid_l2"] == pytest.approx(l2, abs=1e-5)
        assert r["centroid_cos"] == pytest.approx(cos, abs=1e-5)
        assert abs(r["centroid_cos"]) <= 1.0 + 1e-9
