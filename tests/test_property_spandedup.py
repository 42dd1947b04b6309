"""Property-based checks for exact-substring span dedup: random corpora
over a tiny alphabet (forcing heavy k-gram collisions) vs a brute-force
Python model of the same semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pathwaydataframework_spark.operators import dedup

# tiny alphabet + short docs → dense k-gram collisions incl. in-doc repeats
docs_strategy = st.lists(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)

K = 3


def _model(texts: list[str], k: int) -> list[tuple[str, int]]:
    """Brute-force reference: first occurrence of each k-gram (scanning
    docs in id order, positions ascending) survives; every later
    occurrence marks its k-token span for removal; a token is cut when any
    removal span covers it."""
    occs: dict[tuple, list[tuple[int, int]]] = {}
    toks_by_doc = [t.strip().split() if t.strip() else [""] for t in texts]
    for d, toks in enumerate(toks_by_doc):
        for i in range(len(toks) - k + 1):
            occs.setdefault(tuple(toks[i : i + k]), []).append((d, i))
    removal: dict[int, set[int]] = {d: set() for d in range(len(texts))}
    for gram, positions in occs.items():
        if len(positions) < 2:
            continue
        for d, i in sorted(positions)[1:]:
            removal[d].update(range(i, i + k))
    out = []
    for d, toks in enumerate(toks_by_doc):
        kept = [t for i, t in enumerate(toks) if i not in removal[d]]
        out.append((" ".join(kept), len(toks) - len(kept)))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_span_dedup_matches_bruteforce_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in dedup.remove_duplicate_spans(df, "doc_id", "text", k=K).collect()
    }
    expect = _model(texts, K)
    for d, (clean, nrem) in enumerate(expect):
        assert got[d] == (clean, nrem), (d, texts[d], got[d], (clean, nrem))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_span_dedup_invariants(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dedup.remove_duplicate_spans(df, "doc_id", "text", k=K).collect()
    # every doc survives with a row; removal counts bounded by doc length;
    # kept tokens are a subsequence of the original tokens.  (NOT asserted:
    # idempotence — cutting a span can join its neighbors into a NEW
    # duplicated gram, so a second pass may legitimately remove more.)
    assert len(out) == len(texts)
    for r in out:
        toks = texts[r["doc_id"]].split() or [""]
        assert 0 <= r["n_removed_tokens"] <= len(toks)
        kept = r["clean_text"].split()
        it = iter(toks)
        assert all(any(t == x for x in it) for t in kept), (toks, kept)
