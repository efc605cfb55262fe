"""Synthesize a larger scale factor from the read-only driver fixtures
by key-shifted replication, for scale-up benching only.

``python scripts/make_scale_fixture.py [src_dir] [dst_dir] [factor]``
(defaults: /root/testdata/sf0.1 -> /tmp/sf1, factor 10).

Each copy ``i`` shifts every key column by ``i * KSHIFT`` so joins stay
internally consistent (each copy joins within itself — the same
behavior a hash-partitioned 10x corpus would show), while the fixed
dimension tables (region, nation — whose cardinality does not scale in
a star schema) pass through unchanged. Document text gets a per-copy
suffix token so the dedup family still does real work (pure
replication would either collapse under exact dedup or saturate every
LSH bucket with 10 identical members — neither resembles a larger
corpus); the suffix keeps cross-copy pairs NEAR-duplicates, which is
the harder, realistic load. n_chars is recomputed to stay consistent
with the text.

Timestamps round-trip through DuckDB as timestamp[us] (no tz), the
same physical type as the driver fixtures (see FIXTURES.md), so
NTZ-sensitive plans behave identically.

This script writes ONLY outside /root/testdata; the driver fixtures
are never touched.
"""

from __future__ import annotations

import os
import sys

import duckdb

#: Key shift per copy — far above any sf0.1 key (max observed: orders
#: o_orderkey ~600k). Keys stay well under 2^53 for factor <= 1000.
KSHIFT = 10_000_000

#: Key columns to shift per table; absent tables copy unchanged.
SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def replicate(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src_pq = f"{src}/{t}.parquet"
        dst_pq = f"{dst}/{t}.parquet"
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src_pq}'"
            ).fetchall()
        ]
        shifts = SHIFTS.get(t)
        if not shifts:
            con.execute(
                f"COPY (SELECT * FROM '{src_pq}') TO '{dst_pq}' (FORMAT PARQUET)"
            )
            continue
        parts = []
        for i in range(factor):
            sel = []
            for c in cols:
                if c in shifts:
                    sel.append(f"{c} + {i * KSHIFT} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    sel.append(f"text || ' rep{i}' AS text")
                elif t == "documents" and c == "n_chars" and i > 0:
                    sel.append(f"length(text || ' rep{i}') AS n_chars")
                elif t == "embeddings" and c == "embedding" and i > 0:
                    # mirror the text suffix on the vector side: nudge
                    # the first component per copy so cross-copy vectors
                    # are NEAR- rather than exact duplicates — byte-
                    # identical replicas would pile every copy into the
                    # same LSH bucket / IVF cell and make similarity
                    # scale-up timings unrepresentative
                    sel.append(
                        "list_prepend((embedding[1] + "
                        f"{i} * 0.001)::FLOAT, embedding[2:]) AS embedding"
                    )
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{src_pq}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst_pq}' (FORMAT PARQUET)"
        )
    for t in TABLES:
        n_src = con.execute(
            f"SELECT count(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        want = n_src if t in ("region", "nation") else n_src * factor
        assert n_dst == want, (t, n_src, n_dst)
        print(f"{t}: {n_src} -> {n_dst}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    replicate(src, dst, factor)
