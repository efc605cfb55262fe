"""As-of join: for each left row, attach the most recent right row with
``right.time <= left.time`` (optionally within a tolerance), per key.

Spark has no native as-of join. The scalable construction here is the
union + window trick, NOT a per-group pandas merge:

  1. tag left/right rows and union them into one frame;
  2. one window per key ordered by (time, side) carries the last seen
     right value forward (``last(..., ignorenulls=True)``);
  3. keep left rows, now annotated with their as-of match.

Cost: a single shuffle on the key (the window), no pairwise work, no
skew beyond what the key distribution already has — this survives
100x data where ``applyInPandas`` + ``pd.merge_asof`` per group dies on
the biggest key. (The pandas form is still available as
``asof_join_pandas`` for comparison/testing.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join of ``left`` to ``right`` on time column ``on``
    per key column ``by``.

    Right rows sort before left rows at identical timestamps, so an
    exact tie matches (<= semantics, like ``pd.merge_asof``).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        by, on, *[F.col(c) for c in value_cols]
    ).withColumn("_side", F.lit(0))

    # align schemas: left gets null right-value columns, right gets null
    # left-only columns
    left_only = [c for c in left.columns if c not in (on, by)]
    for c in value_cols:
        lt = lt.withColumn(f"_r_{c}", F.lit(None))
    for c in left_only:
        rt = rt.withColumn(c, F.lit(None))
    rt = rt.select(
        by,
        on,
        *[F.col(c) for c in left_only],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        "_side",
    )
    lt = lt.select(by, on, *left_only, *[f"_r_{c}" for c in value_cols], "_side")

    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct per right row so value and matched_time always come
    # from the same matched row — a matched row whose value column is NULL
    # must yield NULL (pd.merge_asof / DuckDB ASOF semantics), not a value
    # resurrected from an older right row.
    match_struct = F.last(
        F.when(
            F.col("_side") == 0,
            F.struct(
                F.col(on).alias("_mt"),
                *[F.col(f"_r_{c}").alias(c) for c in value_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    carried = unioned.select(
        by,
        on,
        *left_only,
        "_side",
        match_struct.alias("_m"),
    ).withColumns(
        {
            **{f"_c_{c}": F.col("_m")[c] for c in value_cols},
            "_match_time": F.col("_m")["_mt"],
        }
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # Tolerance is counted in whole-second boundaries via cast-to-
        # long truncation, matching DuckDB date_diff('second') for
        # NON-NEGATIVE epochs (both truncate toward zero there).
        # Precondition: timestamps >= 1970-01-01 — for sub-second
        # pre-epoch values Spark's truncation rounds toward zero while
        # DuckDB counts boundary crossings, shifting the verdict by one
        # second.
        within = (
            F.col(on).cast("long") - F.col("_match_time").cast("long")
            <= tolerance_seconds
        )
        out = out.select(
            by,
            on,
            *left_only,
            *[
                F.when(within, F.col(f"_c_{c}")).alias(c + "_asof")
                for c in value_cols
            ],
            F.when(within, F.col("_match_time")).alias("matched_time"),
        )
    else:
        out = out.select(
            by,
            on,
            *left_only,
            *[F.col(f"_c_{c}").alias(c + "_asof") for c in value_cols],
            F.col("_match_time").alias("matched_time"),
        )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
) -> DataFrame:
    """Reference implementation via ``applyInPandas`` + ``pd.merge_asof``
    per key group. Correct, but the whole group must fit in one task —
    use :func:`asof_join` in production."""
    import pandas as pd

    value_cols = [c for c in right.columns if c not in (on, by)]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"`{f.name}_asof` {f.dataType.simpleString()}"
            for f in right.schema.fields
            if f.name in value_cols
        ]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on)
        rpdf = rpdf.sort_values(on)[[on] + value_cols].rename(
            columns={c: f"{c}_asof" for c in value_cols}
        )
        return pd.merge_asof(lpdf, rpdf, on=on, direction="backward")

    return left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(
        merge, out_schema
    )
