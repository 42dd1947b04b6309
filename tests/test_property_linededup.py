"""Property-based checks for global line-level dedup: random multi-line
corpora over a tiny line alphabet (forcing heavy cross-doc collisions) vs
a brute-force Python model of the same keep-first semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pathwaydataframework_spark.operators import dedup

# few distinct line values → dense duplication across and within docs;
# includes blank-ish lines to exercise the structural-line rule
line_strategy = st.sampled_from(["alpha one", "beta two", "gamma", "", "  "])
docs_strategy = st.lists(
    st.lists(line_strategy, min_size=0, max_size=6).map("\n".join),
    min_size=1,
    max_size=5,
)


def _model(texts: list[str]) -> list[tuple[str, int]]:
    """Brute-force reference: scanning docs in id order and lines in
    position order, the first occurrence of each non-blank line survives
    everywhere; blank/whitespace lines always survive."""
    seen: set[str] = set()
    out = []
    for text in texts:
        lines = text.split("\n")
        kept = []
        for line in lines:
            if line.strip() == "":
                kept.append(line)
            elif line not in seen:
                seen.add(line)
                kept.append(line)
        out.append(("\n".join(kept), len(lines) - len(kept)))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_line_dedup_matches_bruteforce_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_lines"])
        for r in dedup.dedup_lines_global(df, "doc_id", "text").collect()
    }
    want = {i: m for i, m in enumerate(_model(texts))}
    assert got == want
