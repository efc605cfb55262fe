"""Utilities for driver-looped iterative operators (connected
components, Lloyd refinement): materialization barriers that are safe
to apply EVERY round.

Why plain ``localCheckpoint`` is not: since Spark 3.4,
``LogicalRDD.fromDataset`` carries the ORIGIN plan's statistics onto
the checkpointed leaf. In an iterative loop each round's plan joins
several previous-round leaves, so the size-in-bytes estimate is a
PRODUCT of carried-forward estimates — it compounds exponentially
across rounds. By round ~6 of a 5-join-per-round loop the estimate is
a million-bit BigInteger and Catalyst's stats visitor burns whole
seconds of driver CPU per plan (observed: the connected-components
property suite hung inside ``Dataset.localCheckpoint`` doing Toom-Cook
BigInteger multiplication in ``SizeInBytesOnlyStatsPlanVisitor``).

``pinned`` materializes through ``localCheckpoint`` and then re-wraps
the checkpointed RDD as a fresh RDD-backed DataFrame, dropping the
carried statistics (leaf reverts to the session default size). The
data stays exactly where the checkpoint put it — same JVM blocks, same
partitioning, nothing moves through Python — only the stats lineage is
cut. Estimation quality is irrelevant inside these loops: every join
is an equi-join between same-keyed small frames, and the loop's plan
shape does not depend on size estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pinned(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and return a stats-fresh DataFrame
    over the materialized blocks (see module docstring)."""
    ck = df.localCheckpoint(eager=True)
    return _stats_fresh(ck)


def pinned_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """Like :func:`pinned`, but ONE job: a lazy localCheckpoint is
    materialized by the ``count()`` action itself, so loops that need
    the round's row count anyway (convergence checks) don't pay a
    separate materialization job per round on top of the count job."""
    ck = df.localCheckpoint(eager=False)
    n = ck.count()
    return _stats_fresh(ck), n


def _stats_fresh(ck: DataFrame) -> DataFrame:
    try:
        jdf = ck._jdf
        spark = ck.sparkSession
        fresh = spark._jsparkSession.createDataFrame(
            jdf.javaRDD(), jdf.schema()
        )
        return DataFrame(fresh, spark)
    except Exception:  # pragma: no cover - e.g. Spark Connect
        # fall back to the plain checkpoint; correctness is unaffected
        return ck
