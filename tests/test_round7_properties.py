"""Property-based tests for the round-7 operators (hypothesis):
independent pure-Python references, not the DuckDB twins — guarding
semantics the fixture corpora can't cover exhaustively."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kafka_go_streamer_spark.operators.zorder import (
    ZORDER_BITS,
    morton_interleave,
)


def _py_morton(a: int, b: int, bits: int = ZORDER_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=20,
    )
)
def test_morton_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    got = [
        r[0]
        for r in df.select(
            morton_interleave(F.col("a"), F.col("b"))
        ).collect()
    ]
    want = [_py_morton(a, b) for a, b in pairs]
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=2,
        max_size=20,
        unique=True,
    )
)
def test_morton_preserves_locality_order_on_diagonal(spark, pairs):
    """Monotone sanity: along the diagonal a == b, the Morton code is
    strictly increasing with the coordinate (the curve never jumps
    backward on the diagonal)."""
    diag = sorted({a for a, _ in pairs})
    df = spark.createDataFrame([(v, v) for v in diag], "a long, b long")
    got = [
        r[0]
        for r in df.select(
            morton_interleave(F.col("a"), F.col("b"))
        ).collect()
    ]
    assert got == sorted(got)
    assert len(set(got)) == len(diag)


def _py_dup_spans(docs: dict[int, list[str]], k: int):
    """Pure-Python duplicated-span reference: per doc, (n_spans,
    n_dup_spans) where a span is duplicated iff its k-gram occurs in
    >= 2 distinct docs."""
    gram_docs: dict[tuple, set] = {}
    spans: dict[int, list[tuple]] = {}
    for did, ws in docs.items():
        gs = [tuple(ws[i : i + k]) for i in range(len(ws) - k + 1)]
        spans[did] = gs
        for g in gs:
            gram_docs.setdefault(g, set()).add(did)
    return {
        did: (
            len(gs),
            sum(1 for g in gs if len(gram_docs[g]) >= 2),
        )
        for did, gs in spans.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=20).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=8,
    )
)
def test_substring_spans_matches_python_reference(spark, tmp_path_factory, texts):
    """The registered query's span accounting must agree with the
    brute-force reference on arbitrary tiny corpora — including docs
    shorter than the span width (0 spans), fully repeated docs, and
    cross-doc shared runs."""
    import pandas as pd

    from kafka_go_streamer_spark.plans import QUERIES
    from kafka_go_streamer_spark.plans.dedup import SPAN_WORDS

    tmp = tmp_path_factory.mktemp("spanprop")
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in QUERIES["dedup_substring_spans"](spark, str(tmp)).collect()
    }
    docs = {
        i: [w for w in t.lower().strip().split() if w] or [""]
        for i, t in enumerate(texts)
    }
    # mirror the words() semantics: split('\s+') of lower(trim(text));
    # empty text yields [''] (one empty token), matching Spark's split
    want = _py_dup_spans(docs, SPAN_WORDS)
    assert got == {k: v for k, v in want.items()}
