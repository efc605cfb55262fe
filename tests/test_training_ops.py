"""Boundary-condition tests for the wave-3 training-pipeline operators.

The oracle-parity suite proves engine agreement on the fixtures; these
pin the SEMANTICS on adversarial inputs the fixtures don't contain:
exact-capacity packing boundaries, oversized documents, and the PII
redaction patterns firing (and not over-firing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_go_streamer_spark.plans.training_ops import (
    EMAIL_RE,
    PACK_CAP,
    PHONE_RE,
)


def _pack_rows(spark, rows):
    """Run the packer's real applyInPandas fold (training_ops.pack_group)
    on synthetic (doc_id, source, n_tokens) rows, through the real
    (source, shard) group key."""
    from kafka_go_streamer_spark.plans.training_ops import (
        PACK_SCHEMA,
        pack_group,
        with_pack_shard,
    )

    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens int")
    out = (
        with_pack_shard(df)
        .groupBy("source", "shard")
        .applyInPandas(pack_group, PACK_SCHEMA)
    )
    return {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in out.collect()}


def test_pack_exact_capacity_boundary(spark):
    """A doc landing exactly on the capacity stays in the open sequence;
    one token more rolls over."""
    half = PACK_CAP // 2
    got = _pack_rows(
        spark,
        [
            (1, "s", half),
            (2, "s", PACK_CAP - half),  # fills to exactly PACK_CAP -> stays
            (3, "s", 1),                # would exceed -> new sequence
        ],
    )
    assert got[1] == (0, 0)
    assert got[2] == (0, half)
    assert got[3] == (1, 0)


def test_pack_oversized_doc_gets_own_sequence(spark):
    """A document larger than the capacity occupies its own sequence and
    does not stall the fold."""
    got = _pack_rows(
        spark,
        [
            (1, "s", 10),
            (2, "s", PACK_CAP + 50),  # oversize: new sequence, alone
            (3, "s", 10),             # next sequence after the oversize
        ],
    )
    assert got[1] == (0, 0)
    assert got[2] == (1, 0)
    assert got[3] == (2, 0)


def test_pack_sources_independent(spark):
    """Sequence ids restart per source — groups never share state."""
    got = _pack_rows(spark, [(1, "a", PACK_CAP), (2, "b", PACK_CAP)])
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)


def test_pack_shards_independent(spark):
    """Docs on opposite sides of a shard boundary never share a
    sequence: the fold restarts at each PACK_SHARD_SPAN doc_id chunk,
    which is what hard-bounds the per-task group at scale."""
    from kafka_go_streamer_spark.plans.training_ops import PACK_SHARD_SPAN

    lo, hi = PACK_SHARD_SPAN - 1, PACK_SHARD_SPAN
    got = _pack_rows(spark, [(lo, "s", 1), (hi, "s", 1)])
    # both fit in one 256-token sequence, but the shard boundary splits
    # them: each opens its own shard-local sequence 0
    assert got[lo] == (0, 0)
    assert got[hi] == (0, 0)


def test_pii_patterns_fire_and_bound(spark):
    df = spark.createDataFrame(
        [
            ("write to bob_1@mail.example.org today", 1, 0),
            ("call +1-555-0199 or +1-555-0200", 0, 2),
            ("no pii here, just an @ sign and 555 alone", 0, 0),
            ("a@b.c minimal address", 1, 0),
        ],
        "text string, want_emails int, want_phones int",
    )
    got = df.select(
        F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
        "want_emails",
        "want_phones",
    ).collect()
    for r in got:
        assert r["n_emails"] == r["want_emails"], r
        assert r["n_phones"] == r["want_phones"], r


def test_pii_redaction_removes_matches(spark):
    df = spark.createDataFrame(
        [("mail x_9@example.com and dial +1-555-1234 now",)], "text string"
    )
    red = df.select(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("r")
    ).collect()[0]["r"]
    assert red == "mail <EMAIL> and dial <PHONE> now"
    assert "@" not in red and "555" not in red


# ---------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st

import pandas as pd

from kafka_go_streamer_spark.plans.training_ops import PACK_CAP, pack_group


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=PACK_CAP + 40), max_size=60)
)
def test_pack_group_invariants(tokens):
    """The greedy fold's invariants on arbitrary token streams:
    every sequence's fill stays within PACK_CAP unless a single
    oversized doc owns it; seq ids are dense and non-decreasing in
    doc order; offsets are exact running fills."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(tokens)),
            "source": ["s"] * len(tokens),
            "shard": [0] * len(tokens),  # one shard: ids 0..59 < SPAN
            "n_tokens": tokens,
        }
    )
    out = pack_group(pdf.copy())
    assert list(out["doc_id"]) == list(range(len(tokens)))  # order kept
    fills: dict[int, int] = {}
    prev_seq = 0
    for r in out.itertuples(index=False):
        assert r.seq_id >= prev_seq
        assert r.seq_id <= prev_seq + 1  # dense: no skipped sequences
        prev_seq = r.seq_id
        assert r.seq_offset == fills.get(r.seq_id, 0)  # exact running fill
        fills[r.seq_id] = r.seq_offset + r.n_tokens
    for seq_id, fill in fills.items():
        members = out[out.seq_id == seq_id]
        # a sequence over capacity can only be a single oversized doc
        assert fill <= PACK_CAP or (
            len(members) == 1 and members.n_tokens.iloc[0] > PACK_CAP
        )
    # greedy tightness: a doc at offset 0 of a non-first sequence would
    # have overflowed the previous one
    for r in out.itertuples(index=False):
        if r.seq_id > 0 and r.seq_offset == 0:
            assert fills[r.seq_id - 1] + r.n_tokens > PACK_CAP


def test_curriculum_quantile_agrees_with_ntile_off_boundaries(spark, sf_dir):
    """The sort-free quantile-threshold curriculum must assign the same
    phase as the ntile form for every document except where boundary
    ties make the two definitions legitimately diverge: a doc whose
    quality EQUALS a source threshold (the >= rule promotes it up while
    ntile splits by rank), or a quality value that ntile itself splits
    across two phases."""
    import numpy as np

    from kafka_go_streamer_spark.plans import QUERIES
    from kafka_go_streamer_spark.plans.training_ops import (
        _CURR_Q_HIGH,
        _CURR_Q_LOW,
    )

    nt = {
        r["doc_id"]: (r["source"], r["quality"], r["phase"])
        for r in QUERIES["sample_curriculum_phases"](spark, sf_dir).collect()
    }
    qt = {
        r["doc_id"]: r["phase"]
        for r in QUERIES["sample_curriculum_phases_quantile"](
            spark, sf_dir
        ).collect()
    }
    assert nt.keys() == qt.keys()
    assert set(qt.values()) <= {1, 2, 3}

    # independent thresholds per source (numpy linear interpolation,
    # same p*(n-1) rule both engines use), rounded like the queries
    by_source: dict[str, list[float]] = {}
    for src, quality, _ in nt.values():
        by_source.setdefault(src, []).append(quality)
    th = {
        src: (
            round(np.percentile(vals, _CURR_Q_HIGH * 100) + 5e-9, 6),
            round(np.percentile(vals, _CURR_Q_LOW * 100) + 5e-9, 6),
        )
        for src, vals in by_source.items()
    }
    # quality values ntile splits across >1 phase (rank-tie mass)
    split: dict[tuple[str, float], set[int]] = {}
    for src, quality, phase in nt.values():
        split.setdefault((src, quality), set()).add(phase)

    mismatches = 0
    for doc_id, (src, quality, nphase) in nt.items():
        if qt[doc_id] == nphase:
            continue
        mismatches += 1
        t_high, t_low = th[src]
        on_boundary = quality in (t_high, t_low)
        tie_split = len(split[(src, quality)]) > 1
        assert on_boundary or tie_split, (
            f"doc {doc_id} (src={src}, q={quality}): ntile={nphase} "
            f"quantile={qt[doc_id]} but not a boundary/tie case "
            f"(th={th[src]})"
        )
    # the two forms must agree on the bulk of the corpus
    assert mismatches <= max(3, len(nt) // 20)
