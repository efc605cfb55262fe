"""Pure-Python references for the round-11 curation wave — independent
of both Spark and DuckDB, so a shared engine misunderstanding cannot
cancel out in the oracle parity check: DoReMi mirror-descent weight
algebra (simplex, monotone in excess loss), fertility/bytes-per-token
ratios, 13-gram contamination sets, sqrt-temperature epoch planning,
bucketed n-gram novelty, keep-first token retention, linear MMD^2 from
hand-built means, and mixture KL/perplexity."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import duckdb
import pytest

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans import curation as C

SF = "/root/testdata/sf0.001"

TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="module")
def docs(duck):
    return duck.execute(
        "SELECT doc_id, text, lang, source, n_chars FROM documents"
    ).fetchall()


def _words(text: str) -> list[str]:
    t = text.strip().lower()
    return re.split(r"\s+", t) if t else [""]


def _tokens(text: str) -> int:
    return len(TOKEN_RE.findall(text))


def _grams(text: str, n: int) -> list[str]:
    ws = _words(text)
    return [
        hashlib.md5(" ".join(ws[i : i + n]).encode()).hexdigest()
        for i in range(len(ws) - n + 1)
    ]


# ------------------------------------------------------ DoReMi reweight
def test_doremi_reweight_matches_python_reference(spark, docs):
    per: dict[str, list[float]] = defaultdict(list)
    for _, text, _, source, n_chars in docs:
        per[source].append(
            math.log(1.0 + n_chars / max(_tokens(text), 1))
        )
    all_l = [v for vs in per.values() for v in vs]
    ref = round(sum(all_l) / len(all_l), 6)
    loss = {s: round(sum(v) / len(v), 6) for s, v in per.items()}
    excess = {s: round(max(loss[s] - ref, 0.0), 6) for s in per}
    raw = {s: math.exp(C.DOREMI_ETA * excess[s]) for s in per}
    z = sum(raw.values())
    got = {
        r["source"]: r
        for r in QUERIES["sample_doremi_reweight"](spark, SF).collect()
    }
    assert set(got) == set(per)
    wsum = 0.0
    for s in per:
        r = got[s]
        assert r["n_docs"] == len(per[s]), s
        assert r["loss_proxy"] == pytest.approx(loss[s], abs=2e-6), s
        assert r["excess_loss"] == pytest.approx(excess[s], abs=2e-6), s
        assert r["weight"] == pytest.approx(raw[s] / z, abs=2e-6), s
        wsum += r["weight"]
    # simplex + monotonicity: weights sum to 1, ordered like excess
    assert wsum == pytest.approx(1.0, abs=1e-4)
    order_e = sorted(per, key=lambda s: excess[s])
    order_w = sorted(per, key=lambda s: got[s]["weight"])
    assert [excess[s] for s in order_e] == pytest.approx(
        [excess[s] for s in order_w]
    )


# ------------------------------------------------------------ fertility
def test_tokenizer_fertility_matches_python_reference(spark, docs):
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for _, text, lang, _, _ in docs:
        a = agg[lang]
        a[0] += 1
        a[1] += len(text.encode("utf-8"))
        a[2] += len(_words(text))
        a[3] += _tokens(text)
    got = {
        r["lang"]: r
        for r in QUERIES["text_tokenizer_fertility"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for lang, (nd, nb, nw, nt) in agg.items():
        r = got[lang]
        assert (
            r["n_docs"],
            r["n_bytes"],
            r["n_words"],
            r["n_tokens"],
        ) == (nd, nb, nw, nt), lang
        assert r["fertility"] == pytest.approx(nt / nw, abs=2e-6), lang
        assert r["bytes_per_token"] == pytest.approx(
            nb / nt, abs=2e-6
        ), lang


# -------------------------------------------------- 13-gram contamination
def test_contamination_ngrams_matches_python_reference(spark, docs):
    bench: set[str] = set()
    for doc_id, text, _, _, _ in docs:
        if doc_id % C.BENCH_MOD == 0:
            bench.update(_grams(text, C.CONTAM_N))
    per: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for doc_id, text, _, source, _ in docs:
        if doc_id % C.BENCH_MOD == 0:
            continue
        shared = len(set(_grams(text, C.CONTAM_N)) & bench)
        a = per[source]
        a[0] += 1
        a[1] += 1 if shared else 0
        a[2] += shared
    got = {
        r["source"]: r
        for r in QUERIES["text_contamination_ngrams"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    for s, (nt, nc, ns) in per.items():
        r = got[s]
        assert r["n_train_docs"] == nt, s
        assert r["n_contaminated"] == nc, s
        assert r["n_shared_grams"] == ns, s
        assert r["contamination_rate"] == pytest.approx(
            nc / nt, abs=2e-6
        ), s


# ------------------------------------------------------- budget planner
def test_token_budget_epochs_matches_python_reference(spark, docs):
    toks: dict[str, int] = defaultdict(int)
    for _, text, _, source, _ in docs:
        toks[source] += _tokens(text)
    total = sum(toks.values())
    z = sum(math.sqrt(t) for t in toks.values())
    got = {
        r["source"]: r
        for r in QUERIES["sample_token_budget_epochs"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(toks)
    for s, t in toks.items():
        r = got[s]
        share = math.sqrt(t) / z
        epochs = C.BUDGET_FRAC * total * share / t
        assert r["tokens"] == t, s
        assert r["target_share"] == pytest.approx(share, abs=2e-6), s
        assert r["epochs_needed"] == pytest.approx(epochs, abs=2e-6), s
        assert r["capped_epochs"] == pytest.approx(
            min(epochs, C.MAX_EPOCHS), abs=2e-6
        ), s
        assert r["upsampled"] == (1 if round(epochs, 6) > 1.0 else 0), s


# -------------------------------------------------------- novelty decay
def test_ngram_novelty_matches_python_reference(spark, docs):
    mx = max(d[0] for d in docs)
    per_bucket: dict[int, set[str]] = defaultdict(set)
    for doc_id, text, _, _, _ in docs:
        b = (doc_id * C.NOVELTY_BUCKETS) // (mx + 1)
        per_bucket[b].update(_grams(text, C.NOVELTY_N))
    first: dict[str, int] = {}
    for b in sorted(per_bucket):
        for g in per_bucket[b]:
            first.setdefault(g, b)
    got = {
        r["bucket"]: r
        for r in QUERIES["text_ngram_novelty_decay"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per_bucket)
    for b, grams in per_bucket.items():
        new = sum(1 for g in grams if first[g] == b)
        r = got[b]
        assert r["n_grams_seen"] == len(grams), b
        assert r["n_new_grams"] == new, b
        assert r["novelty_rate"] == pytest.approx(
            new / len(grams), abs=2e-6
        ), b
    # novelty in the first bucket is 1.0 by construction
    assert got[min(per_bucket)]["novelty_rate"] == pytest.approx(1.0)


# ------------------------------------------------------ token retention
def test_dedup_token_retention_matches_python_reference(spark, docs):
    keeper: dict[str, int] = {}
    for doc_id, text, _, _, _ in sorted(docs):
        keeper.setdefault(hashlib.md5(text.encode()).hexdigest(), doc_id)
    kept_ids = set(keeper.values())
    per: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for doc_id, text, _, source, _ in docs:
        t = _tokens(text)
        a = per[source]
        a[0] += 1
        a[2] += t
        if doc_id in kept_ids:
            a[1] += 1
            a[3] += t
    got = {
        r["source"]: r
        for r in QUERIES["dedup_token_retention"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for s, (dt, dk, tt, tk) in per.items():
        r = got[s]
        assert (
            r["docs_total"],
            r["docs_kept"],
            r["tokens_total"],
            r["tokens_kept"],
        ) == (dt, dk, tt, tk), s
        assert r["token_retention"] == pytest.approx(tk / tt, abs=2e-6), s


# ------------------------------------------------------------ label MMD
def test_embedding_label_mmd_matches_python_reference(spark, duck):
    rows = duck.execute(
        "SELECT label, embedding FROM embeddings"
    ).fetchall()
    by_label: dict[int, list[list[float]]] = defaultdict(list)
    for label, emb in rows:
        by_label[label].append([float(v) for v in emb])
    mu = {
        lab: [
            round(sum(v[i] for v in vs) / len(vs), 6)
            for i in range(len(vs[0]))
        ]
        for lab, vs in by_label.items()
    }
    got = {
        (r["label_a"], r["label_b"]): r["mmd_sq"]
        for r in QUERIES["embedding_label_mmd"](spark, SF).collect()
    }
    labels = sorted(mu)
    expect_pairs = {
        (a, b) for i, a in enumerate(labels) for b in labels[i + 1 :]
    }
    assert set(got) == expect_pairs
    for a, b in expect_pairs:
        want = sum((x - y) ** 2 for x, y in zip(mu[a], mu[b]))
        assert got[(a, b)] == pytest.approx(want, abs=2e-5), (a, b)
        assert got[(a, b)] >= 0.0


# ------------------------------------------------------------ mixture KL
def test_mixture_kl_matches_python_reference(spark, docs):
    toks: dict[str, int] = defaultdict(int)
    for _, text, _, source, _ in docs:
        toks[source] += _tokens(text)
    total = sum(toks.values())
    z = sum(t**C.KL_TAU for t in toks.values())
    kl = 0.0
    ent = 0.0
    for t in toks.values():
        p = round(t / total, 6)
        q = round(t**C.KL_TAU / z, 6)
        if p > 0 and q > 0:
            kl += p * math.log(p / q)
        if p > 0:
            ent += p * math.log(p)
    r = QUERIES["sample_mixture_kl_to_target"](spark, SF).collect()[0]
    assert r["n_sources"] == len(toks)
    assert r["kl_nats"] == pytest.approx(kl, abs=2e-6)
    assert r["realized_perplexity"] == pytest.approx(
        math.exp(-ent), abs=2e-5
    )
    assert r["kl_nats"] >= 0.0
