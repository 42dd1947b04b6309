"""Text-analysis operators for training-data pipelines.

Addendum surface (north star): language-ID (stopword/n-gram heuristic),
quality scoring (length/punctuation/stopword ratios), token counting
(whitespace + BPE-ish regex), document fingerprinting.

All operators are pure DataFrame transforms over JVM built-ins — no Python
UDFs — so they stream through whole-stage codegen at 100 TB.  Reference
analogues live in the LLM xpack (reference xpacks/llm/splitters.py:34,
parsers.py) as row-wise Python UDFs; ours are vectorized by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Tiny per-language stopword lists for the heuristic language ID.  Chosen to
# be disjoint where possible; the operator is a deterministic scoring rule,
# not a trained model.
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "por", "para"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (reference TokenCountSplitter analogue).

    >>> import pyspark.sql.functions as F
    >>> t = spark.createDataFrame([("the quick fox",), ("",)], "body string")
    >>> [r[0] for r in t.select(token_count(F.col("body"))).collect()]
    [3, 0]
    """
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: word-piece regex split (letters / digits /
    punctuation runs), the standard cheap proxy for tokenizer counts."""
    return F.size(
        F.filter(
            F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda t: F.length(t) > 0,
        )
    ).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.round(
        F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
            F.length(stripped) / F.length(text)
        ),
        6,
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    toks = tokens(F.lower(text))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.round(F.when(n == 0, F.lit(0.0)).otherwise(hits / n), 6)


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    return F.round(
        F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
            F.aggregate(toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t))
            / F.size(toks)
        ),
        6,
    )


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0, 1]:

    - length component: saturating at 200 tokens
    - punctuation sanity: penalize >20% punctuation
    - stopword presence (en): reward natural-language-looking text

    The exact formula is arbitrary but deterministic and documented — the
    point is the *shape* of a Gopher/C4-style quality filter as a pure
    column expression.
    """
    tc = token_count(text).cast("double")
    length_comp = F.least(tc / F.lit(200.0), F.lit(1.0))
    punct = punct_ratio(text)
    punct_comp = F.when(punct > 0.2, F.lit(0.0)).otherwise(1 - punct / 0.2 * 0.5)
    sw_comp = F.least(stopword_ratio(text, "en") * 5, F.lit(1.0))
    return F.round(0.5 * length_comp + 0.25 * punct_comp + 0.25 * sw_comp, 6)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax over per-language stopword hit counts;
     'und' (undetermined) when nothing matches.

    Deterministic tie-break: language order en < de < es < fr (alphabetical
    on equal scores, 'en' preferred first as the most common)."""
    toks = tokens(F.lower(text))
    scores = []
    for code in ("en", "de", "es", "fr"):
        sw = F.array(*[F.lit(w) for w in _STOPWORDS[code]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("score"),
                F.lit({"en": 3, "de": 2, "es": 1, "fr": 0}[code]).alias("prio"),
                F.lit(code).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace-collapsed).  md5 (not xxhash) so external
    engines can reproduce it byte-for-byte."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the standard per-document stats columns."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "token_count": token_count(t),
            "char_count": char_count(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio_en": stopword_ratio(t, "en"),
            "mean_word_length": mean_word_length(t),
            "quality_score": quality_score(t),
            "fingerprint": fingerprint(t),
        }
    )


# -- PII scrubbing ----------------------------------------------------------

# Conservative patterns chosen to behave identically under Java regex
# (Spark) and RE2 (DuckDB/the oracle): no backrefs, no lookaround.
_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def scrub_pii(text: Column) -> Column:
    """Redact emails, phone-number-like digit runs, and IPv4 literals.

    A deterministic regexp_replace chain — pure codegen, no UDF, and the
    patterns are dialect-portable so the scrub is SQL-oracle-checkable.

    >>> import pyspark.sql.functions as F
    >>> t = spark.createDataFrame([("mail a@b.co or 192.168.0.1",)], "body string")
    >>> t.select(scrub_pii(F.col("body")).alias("s")).first()["s"]
    'mail <EMAIL> or <IP>'
    """
    out = text
    for pattern, token in _PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


# -- vocabulary -------------------------------------------------------------


def vocabulary(
    df: DataFrame, text_col: str = "text", *, min_count: int = 1, k: int | None = None
) -> DataFrame:
    """Corpus vocabulary: (term, count, rank) by descending frequency.

    One explode + one groupBy (map-side partial agg collapses each
    partition's counts before the single shuffle).  With ``k`` the top-k
    is taken with orderBy+limit (TakeOrdered — per-partition heaps, no
    global sort) and only the k survivors see the rank window; without
    ``k`` the rank is a global total order (fine for test corpora, not
    for a billion-term vocab — pass k at scale).  Ties rank
    alphabetically so output is deterministic and oracle-checkable.
    """
    counts = (
        df.select(F.explode(tokens(F.lower(F.trim(F.col(text_col))))).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= F.lit(min_count))
    )
    if k is not None:
        counts = counts.orderBy(F.col("count").desc(), F.col("term").asc()).limit(k)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("count").desc(), F.col("term").asc())
    return counts.withColumn("rank", F.row_number().over(w).cast("long"))
