"""Z-order clustered writes: Morton-code math, value preservation, and
the data-skipping payoff — per-file min-max spans must be tight on BOTH
interleaved columns, where a single-column sort is tight on one only.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from kafka_go_streamer_spark.operators.compaction import dataset_files
from kafka_go_streamer_spark.operators.zorder import morton_interleave, zorder_write
from kafka_go_streamer_spark.sources.tables import load_table


def test_morton_interleave_known_values(spark):
    from pyspark.sql import functions as F

    rows = spark.range(1).select(
        morton_interleave(F.lit(0b101).cast("long"), F.lit(0b011).cast("long"))
    )
    # a=0b101 contributes bits at odd positions, b=0b011 at even:
    # z = 0b100111 = 39
    assert rows.collect()[0][0] == 0b100111


def _file_spans(path: str, col_a: str, col_b: str):
    """Per-file normalized (a, b) value spans from parquet footers."""
    spans = []
    glo = {c: [float("inf"), float("-inf")] for c in (col_a, col_b)}
    per_file = []
    for f in dataset_files(path):
        md = pq.read_metadata(f)
        mins = {col_a: float("inf"), col_b: float("inf")}
        maxs = {col_a: float("-inf"), col_b: float("-inf")}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in mins and c.statistics is not None:
                    mins[name] = min(mins[name], c.statistics.min)
                    maxs[name] = max(maxs[name], c.statistics.max)
        per_file.append((mins, maxs))
        for c in (col_a, col_b):
            glo[c][0] = min(glo[c][0], mins[c])
            glo[c][1] = max(glo[c][1], maxs[c])
    for mins, maxs in per_file:
        spans.append(
            tuple(
                (maxs[c] - mins[c]) / max(glo[c][1] - glo[c][0], 1e-12)
                for c in (col_a, col_b)
            )
        )
    return spans


def test_zorder_tightens_both_columns(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    zorder_write(orders, zpath, "o_custkey", "o_totalprice", n_files=16)
    orders.repartition(16).write.parquet(rpath)  # round-robin baseline

    z_spans = _file_spans(zpath, "o_custkey", "o_totalprice")
    r_spans = _file_spans(rpath, "o_custkey", "o_totalprice")
    z_avg_a = sum(s[0] for s in z_spans) / len(z_spans)
    z_avg_b = sum(s[1] for s in z_spans) / len(z_spans)
    r_avg_a = sum(s[0] for s in r_spans) / len(r_spans)
    r_avg_b = sum(s[1] for s in r_spans) / len(r_spans)

    # round-robin files each cover ~the full domain of both columns;
    # z-ordered files must cover well under half of BOTH domains
    assert r_avg_a > 0.9 and r_avg_b > 0.9
    assert z_avg_a < 0.5, z_spans
    assert z_avg_b < 0.5, z_spans

    # every row preserved
    assert (
        spark.read.parquet(zpath).count()
        == orders.count()
        == spark.read.parquet(rpath).count()
    )
