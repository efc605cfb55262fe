"""Local replica of the driver's correctness gate: run a registered
query through Spark AND its DuckDB oracle, compare row count, sorted
column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from kafka_go_streamer_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used for the type-strict comparison.

    The driver's value hash is dtype-sensitive (0 vs 0.0 breaks it), so
    the replica must be too: an un-cast DuckDB HUGEINT sum lands in
    pandas as float64 while Spark returns int64 — values equal, hash
    red. Classes are deliberately coarse (int widths unify; the driver
    compares post-Arrow pandas frames where width differences do not
    survive) but int/float/bool/datetime/date/str never cross-match.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if s.dtype == object:
        import datetime as _dt

        non_null = s.dropna()
        if len(non_null) and all(
            isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
            for v in non_null
        ):
            return "date"
        if len(non_null) and all(isinstance(v, _dt.datetime) for v in non_null):
            return "datetime"
        if len(non_null) and all(isinstance(v, bool) for v in non_null):
            return "bool"
        if len(non_null) and all(
            isinstance(v, int) and not isinstance(v, bool) for v in non_null
        ):
            return "int"
        if len(non_null) and all(isinstance(v, float) for v in non_null):
            return "float"
        return "str"
    return str(s.dtype)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float)
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            # unify int32/int64/uint and bool representations
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    # Type-strict gate BEFORE value normalization: the driver's hash is
    # dtype-sensitive, so the replica must refuse int-vs-float (etc.)
    # even when every value compares equal (0 == 0.0). Skipped for
    # empty frames, where object-column classes are unknowable (an
    # empty Arrow date column lands as a bare object column).
    for c in sc if len(spark_pdf) and len(duck_pdf) else []:
        # An all-null column's class is unknowable from its values (a
        # DuckDB all-NULL object column vs a Spark all-NaN float64 both
        # mean "no values"), so the strict gate skips it — mirroring the
        # all-null skip in test_every_oracle_integer_columns_cast.
        if spark_pdf[c].isna().all() or duck_pdf[c].isna().all():
            continue
        ka, kb = _dtype_class(spark_pdf[c]), _dtype_class(duck_pdf[c])
        if ka != kb:
            problems.append(f"col {c!r} dtype class: spark={ka} duck={kb}")
    if problems:
        return problems
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            same = (
                (x == y)
                or (x is None and y is None)
                or (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and (
                        (math.isnan(x) and math.isnan(y))
                        or x == y
                    )
                )
                or (pd.isna(x) and pd.isna(y))
            )
            if not same:
                problems.append(
                    f"col {c!r} row {i}: spark={x!r} ({type(x).__name__}) "
                    f"duck={y!r} ({type(y).__name__})"
                )
                break
    return problems
