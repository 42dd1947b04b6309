"""Property-based check: connected_components vs a brute-force union-find
over random edge lists — the operator underpinning corpus_dedup's canon
assignment and leakage_safe_split's component bucketing."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pathwaydataframework_spark.operators.graphs import connected_components

edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=24,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id
    comp = {}
    for v in list(parent):
        comp.setdefault(find(v), []).append(v)
    out = {}
    for root, members in comp.items():
        label = min(members)
        for v in members:
            out[v] = label
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy)
def test_connected_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vertex"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find(edges)
