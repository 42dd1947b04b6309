"""Property-based checks for the r6 crawl front-end operators: random
structured inputs vs brute-force Python models of the same semantics.

Low max_examples (each example is a Spark job); the generators are built
to hit the interesting structure densely — tiny alphabets force key
collisions, URL parts are drawn from a grammar that covers every
normalization rule.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

from pathwaydataframework_spark.operators import dedup, sampling

# -- bloom_dedup (exact mode) == plain anti-join, whatever the keys ----------

keys_strategy = st.lists(
    st.sampled_from([f"k{i}" for i in range(12)]), min_size=0, max_size=20
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(seen=keys_strategy, new=keys_strategy)
def test_bloom_dedup_exact_equals_antijoin(spark, seen, new):
    # tiny filter (64 bits for up to 12 distinct keys) forces false
    # positives constantly; exact_confirm must erase them every time
    seen_df = spark.createDataFrame([(k,) for k in seen], "key string")
    new_df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(new)], "id long, key string"
    )
    got = sorted(
        r["id"]
        for r in dedup.bloom_dedup(
            new_df, seen_df, "key", m_bits=64, k=3, exact_confirm=True
        ).collect()
    )
    seen_set = set(seen)
    want = sorted(i for i, k in enumerate(new) if k not in seen_set)
    assert got == want


# -- per_key_topk == python sort-and-slice, under dense key collisions -------

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),  # 3 keys → dense groups
        st.integers(min_value=0, max_value=5),  # ties guaranteed
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_per_key_topk_matches_model(spark, rows):
    df = spark.createDataFrame(
        [(i, k, s) for i, (k, s) in enumerate(rows)],
        "id long, key string, score long",
    )
    got = {
        (r["key"], r["id"], r["rank"])
        for r in sampling.per_key_topk(
            df, "key", "score", k=2, tie_col="id"
        ).collect()
    }
    want = set()
    for key in {k for k, _ in rows}:
        members = sorted(
            ((i, s) for i, (k, s) in enumerate(rows) if k == key),
            key=lambda m: (-m[1], m[0]),
        )[:2]
        want.update((key, i, rank + 1) for rank, (i, _) in enumerate(members))
    assert got == want


# -- token_budget_sample == python running-total model ------------------------

tok_strategy = st.lists(
    st.tuples(
        st.sampled_from(["x", "y", None]),  # NULL group must be a real group
        st.integers(min_value=1, max_value=9),
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=tok_strategy, budget=st.integers(min_value=0, max_value=40))
def test_token_budget_matches_model(spark, rows, budget):
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "id long, grp string, tok long",
    )
    got = {
        (r["id"], r["cum_tokens"])
        for r in sampling.token_budget_sample(
            df, "id", "tok", budget=budget, by="grp", seed=7
        ).collect()
    }
    want = set()
    for grp in {g for g, _ in rows}:
        members = sorted(
            ((i, t) for i, (g, t) in enumerate(rows) if g == grp),
            key=lambda m: (hashlib.md5(f"{m[0]}:7".encode()).hexdigest(), m[0]),
        )
        cum = 0
        for i, t in members:
            cum += t
            if cum > budget:
                break
            want.add((i, cum))
    assert got == want


# -- robots_allowed wildcard matching == python regex model ------------------

_rule_path = st.builds(
    lambda segs, anchor: "/" + "".join(segs) + ("$" if anchor else ""),
    st.lists(st.sampled_from(["a", "b", "p", "/", "*"]), min_size=0, max_size=5),
    st.booleans(),
)
_url_path = st.builds(
    lambda segs: "/" + "".join(segs),
    st.lists(st.sampled_from(["a", "b", "p", "/"]), min_size=0, max_size=6),
)


def _rfc_match(path: str, rule: str) -> bool:
    """Independent RFC 9309 matcher: '*' = any run, trailing '$' = end
    anchor, everything else literal (including a mid-pattern '$')."""
    import re

    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    rx = "^" + ".*".join(re.escape(p) for p in body.split("*"))
    if anchored:
        rx += "$"
    return re.search(rx, path) is not None


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rules=st.lists(st.tuples(st.booleans(), _rule_path), min_size=0, max_size=6),
    paths=st.lists(_url_path, min_size=1, max_size=12),
)
def test_robots_wildcard_matching_matches_model(spark, rules, paths):
    from pathwaydataframework_spark.operators import text

    rules_df = spark.createDataFrame(
        [("h.test", "*", allow, p) for allow, p in rules],
        "host string, agent string, allow boolean, path string",
    )
    urls = spark.createDataFrame(
        [(i, f"https://h.test{p}") for i, p in enumerate(paths)],
        "id long, url string",
    )
    got = {
        r["id"]: r["allowed"]
        for r in text.robots_allowed(urls, rules_df).collect()
    }

    def model(path):
        matched = [(len(p), allow) for allow, p in rules if _rfc_match(path, p)]
        if not matched:
            return True
        return max(matched)[1]  # longest pattern; allow wins length ties

    want = {i: model(p) for i, p in enumerate(paths)}
    assert got == want
