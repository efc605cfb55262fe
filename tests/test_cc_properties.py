"""Property-based connected-components test (hypothesis): for arbitrary
small graphs, the Spark iterative min-label fixpoint must agree with an
independent pure-Python union-find. Guards the semantics the planted
cases can't cover exhaustively: chains (slow-converging diameters),
stars, self-loops, duplicate edges, and isolated nodes."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_go_streamer_spark.operators.dedup import connected_components


def _union_find(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {i: i for i in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member id
    comp_min: dict[int, int] = {}
    for i in n_nodes:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    return {i: comp_min[find(i)] for i in n_nodes}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # hypothesis sweep of Spark CC vs union-find
@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=0,
        max_size=40,
    )
)
def test_cc_matches_union_find(spark, edge_list):
    nodes = list(range(25))
    nodes_df = spark.createDataFrame([(i,) for i in nodes], "id int")
    if edge_list:
        edges_df = spark.createDataFrame(edge_list, "id_a int, id_b int")
    else:
        edges_df = spark.createDataFrame([], "id_a int, id_b int")
    got = {
        r["id"]: r["comp"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    want = _union_find(nodes, edge_list)
    assert got == want


@pytest.mark.slow  # 25 contraction rounds on a 60-node path
def test_cc_long_chain_converges(spark):
    """A 60-node path is the adversarial diameter case for label
    propagation; max_iter=25 with path compression must close it."""
    n = 60
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id int")
    edges_df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a int, id_b int"
    )
    got = {
        r["id"]: r["comp"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got == {i: 0 for i in range(n)}


@pytest.mark.slow  # one contraction run on a mixed graph
def test_cc_exclude_isolated_equals_filtered_full(spark):
    """``include_isolated=False`` must return exactly the full CC
    output restricted to nodes that appear in a NON-self-loop edge —
    i.e. every component of size >= 2 and nothing else (the weak-link
    audit's contract: it skips the corpus nodes scan + anti-join
    because its aggregates filter singletons out anyway). A node whose
    only edge is a self-loop is isolated (ADVICE r16): it must appear
    in the full output with comp = id and NOT appear in the
    size->=2-only output — the old behavior emitted it as a size-1
    group, breaking the contract the histogram query relies on."""
    nodes = list(range(12))
    edges = [(1, 2), (2, 3), (5, 6), (9, 9)]  # chain, pair, self-loop
    nodes_df = spark.createDataFrame([(i,) for i in nodes], "id int")
    edges_df = spark.createDataFrame(edges, "id_a int, id_b int")
    full = {
        r["id"]: r["comp"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    # full output unaffected by the self-loop drop: 9 is isolated
    assert full == {i: i for i in nodes} | {2: 1, 3: 1, 6: 5}
    touched = {a for e in edges if e[0] != e[1] for a in e}
    got = {
        r["id"]: r["comp"]
        for r in connected_components(
            nodes_df, edges_df, include_isolated=False
        ).collect()
    }
    assert got == {i: c for i, c in full.items() if i in touched}
    assert 9 not in got  # self-loop-only node: no size-1 group emitted
