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
from pyspark.sql import Column, DataFrame, Window as W

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
    # Sum of whitespace-token lengths == length of the text with all
    # whitespace removed, so no higher-order F.aggregate is needed.  (An
    # F.aggregate lambda referencing the F.split subtree hits the
    # CollapseProject HOF-inlining cliff — the split re-evaluates per
    # element; see winnowing_fingerprints below.)
    toks = tokens(text)
    total = F.length(F.regexp_replace(F.trim(text), r"\s+", "")).cast("double")
    return F.round(
        F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(total / F.size(toks)),
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


# -- Gopher-style repetition & quality filters ------------------------------
#
# Rule shapes from the public Gopher paper (Rae et al. 2021, appendix A):
# duplicate-line fractions, top/duplicated n-gram character fractions, and
# the document-level quality heuristics (word count bounds, mean word
# length, bullet/ellipsis line fractions, alphabetic-word fraction).
# Thresholds are the published ones; every metric is deterministic and
# oracle-checkable.


def _lines(text: Column) -> Column:
    """Non-empty trimmed lines."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def duplicate_line_metrics(text: Column) -> Column:
    """struct(dup_line_frac, dup_line_char_frac) — fraction of lines (and of
    line characters) lost when repeated lines collapse to one occurrence.

    Pure array expressions: no shuffle, no UDF — each doc computes its own
    metrics inside whole-stage codegen, so this costs one scan at any scale.
    """
    ls = _lines(text)
    ds = F.array_distinct(ls)
    n = F.size(ls)
    chars = F.aggregate(ls, F.lit(0).cast("double"), lambda a, l: a + F.length(l))
    dchars = F.aggregate(ds, F.lit(0).cast("double"), lambda a, l: a + F.length(l))
    return F.struct(
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise((n - F.size(ds)) / n), 6
        ).alias("dup_line_frac"),
        F.round(
            F.when(chars == 0, F.lit(0.0)).otherwise((chars - dchars) / chars), 6
        ).alias("dup_line_char_frac"),
    )


def repetition_metrics(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document n-gram repetition metrics, Gopher appendix-A shapes:

    - ``top{n}_char_frac``: characters of the single most frequent word
      n-gram (count x gram length) over total characters.  Tie-break:
      highest count, then longest gram, then lexicographically greatest —
      fully deterministic.
    - ``dup{n}_char_frac``: characters covered by all n-grams occurring
      more than once (count x length summed; overlaps NOT discounted, the
      standard approximation) over total characters.

    Plan: ALL n-gram streams come out of ONE corpus scan — per n the
    shifted-slice fold builds its gram array, each array is tagged with its
    n as struct(n, gram), and one explode over the flattened concatenation
    emits every (n, gram) occurrence (a per-n union would re-scan the
    corpus once per n).  Then a single groupBy on (doc_id, n, gram) with
    map-side partial aggregation, then a (doc_id, n) rollup pivoted to
    columns.  All exchanges key on doc_id so per-key state is one
    document's grams — no skew beyond document length.
    """
    from pathwaydataframework_spark.operators.dedup import _ensure_parallelism

    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).cast("double").alias("__chars"),
    )
    ns = sorted(set(top_ns) | set(dup_ns))
    tagged_arrays = []
    for n in ns:
        # _word_shingles distinct-ifies; counts need multiplicity, so build
        # the shifted-slice fold without the final array_distinct
        toks = F.split(F.trim(F.col("__t")), r"\s+")
        num = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
        parts = [F.slice(toks, k, num) for k in range(1, n + 1)]
        acc = parts[0]
        for p in parts[1:]:
            acc = F.zip_with(acc, p, lambda a, b: F.concat_ws(" ", a, b))
        # NB: the tag must come from a closure factory — a `lambda g, n=n`
        # two-parameter lambda is treated by pyspark as (element, index)
        # and n would silently receive the array position
        def _tag(n_val):
            return lambda g: F.struct(
                F.lit(n_val).alias("n"), g.alias("gram")
            )

        tagged_arrays.append(F.transform(acc, _tag(n)))
    grams = base.select(
        "doc_id",
        "__chars",
        F.explode(F.flatten(F.array(*tagged_arrays))).alias("__ng"),
    ).select("doc_id", "__chars", F.col("__ng.n").alias("n"), F.col("__ng.gram").alias("gram"))
    counted = grams.groupBy("doc_id", "__chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_n = counted.groupBy("doc_id", "__chars", "n").agg(
        F.max(
            F.struct(
                F.col("cnt"), F.length("gram").alias("glen"), F.col("gram")
            )
        ).alias("top"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.length("gram")).otherwise(0)
        ).alias("dupchars"),
    )
    metrics = per_n.select(
        "doc_id",
        "n",
        F.round(
            F.when(F.col("__chars") == 0, F.lit(0.0)).otherwise(
                F.col("top.cnt") * F.col("top.glen") / F.col("__chars")
            ),
            6,
        ).alias("topfrac"),
        F.round(
            F.when(F.col("__chars") == 0, F.lit(0.0)).otherwise(
                F.col("dupchars") / F.col("__chars")
            ),
            6,
        ).alias("dupfrac"),
    )
    pivoted = (
        metrics.groupBy("doc_id")
        .pivot("n", [str(n) for n in ns])
        .agg(F.first("topfrac").alias("top"), F.first("dupfrac").alias("dup"))
    )
    cols = [F.col("doc_id")]
    for n in top_ns:
        cols.append(F.coalesce(f"{n}_top", F.lit(0.0)).alias(f"top{n}_char_frac"))
    for n in dup_ns:
        cols.append(F.coalesce(f"{n}_dup", F.lit(0.0)).alias(f"dup{n}_char_frac"))
    out = pivoted.select(*cols)
    # docs with no n-grams at any n never reach the pivot — restore them
    # with all-zero metrics via a broadcast-able anti pattern: left join
    # from the id universe (ids only, no text shuffle)
    ids = base.select("doc_id")
    zero = [c for c in out.columns if c != "doc_id"]
    return ids.join(out, on="doc_id", how="left").select(
        "doc_id", *[F.coalesce(c, F.lit(0.0)).alias(c) for c in zero]
    )


#: Published Gopher quality-rule thresholds (appendix A.1).
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_ellipsis_line_frac": 0.3,
    "max_bullet_line_frac": 0.9,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "max_symbol_word_ratio": 0.1,
}


def gopher_quality_flags(text: Column) -> Column:
    """struct of the Gopher document-quality signals + a ``passes`` flag.

    Pure column expressions (one codegen stage, no shuffle).  Signals:
    word count, mean word length, ellipsis/bullet line fractions,
    alphabetic-word fraction, distinct-stopword hits, symbol/word ratio.
    """
    toks = tokens(F.trim(text))
    wc = token_count(text)
    mwl = mean_word_length(text)
    ls = _lines(text)
    nl = F.size(ls)
    ell = F.size(F.filter(ls, lambda l: l.endswith("...") | l.endswith("…")))
    bul = F.size(
        F.filter(
            ls,
            lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"),
        )
    )
    ell_frac = F.round(F.when(nl == 0, F.lit(0.0)).otherwise(ell / nl), 6)
    bul_frac = F.round(F.when(nl == 0, F.lit(0.0)).otherwise(bul / nl), 6)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.round(F.when(wc == 0, F.lit(0.0)).otherwise(alpha / wc), 6)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    sw_hits = F.size(
        F.array_intersect(F.transform(toks, lambda t: F.lower(t)), sw)
    )
    symbols = F.length(F.regexp_replace(text, r"[^#…]", "")) + F.lit(3) * F.size(
        F.filter(ls, lambda l: l.contains("..."))
    )
    sym_ratio = F.round(
        F.when(wc == 0, F.lit(0.0)).otherwise(symbols / wc), 6
    )
    t = GOPHER_THRESHOLDS
    passes = (
        (wc >= t["min_words"])
        & (wc <= t["max_words"])
        & (mwl >= t["min_mean_word_len"])
        & (mwl <= t["max_mean_word_len"])
        & (ell_frac <= t["max_ellipsis_line_frac"])
        & (bul_frac <= t["max_bullet_line_frac"])
        & (alpha_frac >= t["min_alpha_word_frac"])
        & (sw_hits >= t["min_stopword_hits"])
        & (sym_ratio <= t["max_symbol_word_ratio"])
    )
    return F.struct(
        wc.alias("word_count"),
        mwl.alias("mean_word_len"),
        ell_frac.alias("ellipsis_line_frac"),
        bul_frac.alias("bullet_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        sw_hits.cast("long").alias("stopword_hits"),
        sym_ratio.alias("symbol_word_ratio"),
        passes.alias("passes"),
    )


def unigram_logprob(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability — the cheap LM-proxy
    quality score (CCNet-style, fit on the corpus itself).

    p(w) = count(w) / total_tokens over the corpus (lowercased).  Unseen
    is impossible by construction (the model IS the corpus); ties and
    rounding are deterministic.

    Plan: one vocabulary aggregation (explode -> groupBy term, map-side
    partials), total as a driver scalar, then a broadcast join of the
    (term, logp) table onto the exploded tokens and a mean per doc_id.
    At 100 TB the vocab table may exceed broadcast size — pass it through
    a shuffle join by dropping the broadcast hint; the plan is otherwise
    unchanged.
    """
    from pathwaydataframework_spark.operators.dedup import _ensure_parallelism

    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokens(F.lower(F.trim(F.col(text_col)))), lambda t: F.length(t) > 0
        ).alias("__toks"),
    )
    # explode_outer keeps token-less docs in the stream as a NULL-term row,
    # so the output row universe matches the input WITHOUT a restore join
    # (a doc_id-keyed left join would be a corpus-scale SortMergeJoin)
    words = base.select("doc_id", F.explode_outer("__toks").alias("term"))
    vocab = (
        words.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = vocab.localCheckpoint(eager=True)
    # corpus token total folded into the job as a broadcast 1-row frame —
    # no extra driver-side collect job; the agg subtree reads the tiny
    # checkpointed vocab.  coalesce(·, 1) covers the empty corpus.
    total_df = vocab.agg(
        F.coalesce(F.sum("cnt"), F.lit(1)).cast("double").alias("__total")
    )
    logp = vocab.crossJoin(F.broadcast(total_df)).select(
        "term", F.log(F.col("cnt") / F.col("__total")).alias("logp")
    )
    # mean as an exact decimal sum of round-6 logps: partial-aggregation
    # order cannot flip the 6th decimal vs a serial oracle.  NULL-term rows
    # contribute nothing to sum/count; their doc yields a NULL mean.
    return (
        words.join(F.broadcast(logp), on="term", how="left")
        .withColumn("__lp", F.round("logp", 6).cast("decimal(18,9)"))
        .groupBy("doc_id")
        .agg(
            F.when(
                F.count("__lp") > 0,
                F.round(F.sum("__lp").cast("double") / F.count("__lp"), 6),
            ).alias("mean_logp")
        )
    )


# -- C4-style cleaning ------------------------------------------------------


def c4_clean_lines(text: Column) -> Column:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2, public rules): keep
    only lines that end in terminal punctuation, contain at least 5 words,
    and do not mention 'javascript' (case-insensitive).  Returns the kept
    lines re-joined with newlines.  Pure array expressions — no shuffle."""
    kept = F.filter(
        _lines(text),
        lambda l: (
            l.rlike(r'[.!?"”]$')
            & (F.size(F.split(l, r"\s+")) >= 5)
            & ~F.lower(l).contains("javascript")
        ),
    )
    return F.array_join(kept, "\n")


def c4_filter(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4 document filter: line cleaning + page-level rules.

    A page is kept when its cleaned text has >= 3 sentences (terminal-
    punctuation count), and the ORIGINAL text contains neither 'lorem
    ipsum' (case-insensitive) nor a curly brace.  Emits
    (id, clean_text, n_sentences, kept) — filter ``kept`` for the clean
    corpus; keeping the flag makes drops auditable.

    One projection, zero exchanges: every rule is a codegen-able column
    expression, so the filter streams through a 100 TB scan at I/O speed.
    """
    t = F.col(text_col)
    clean = c4_clean_lines(t)
    # a sentence ends at [.!?] (optionally inside a closing quote) or a
    # bare closing quote, followed by whitespace OR end — $ alone misses
    # quote-terminated lines mid-document (clean joins lines with \n)
    n_sent = F.regexp_count(
        clean, F.lit(r'[.!?]["”]?(\s|$)|["”](\s|$)')
    ).cast("long")
    lower = F.lower(t)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_sent.alias("n_sentences"),
        (
            (n_sent >= 3)
            & ~lower.contains("lorem ipsum")
            & ~t.contains("{")
        ).alias("kept"),
    )


# -- tokenization to ids ----------------------------------------------------


def tokenize_to_ids(
    df: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = 0,
) -> DataFrame:
    """Map each document to its ordered token-id array against ``vocab``
    (a (term, rank) frame from :func:`vocabulary`) — the text → ids step
    that feeds sequence packing.  Unknown terms get ``unk_id``.

    Plan: posexplode keeps each token's position, the vocab joins as a
    broadcast (a real tokenizer vocab is ~100k rows), and one groupBy on
    the doc id re-assembles the ordered array via sort_array over
    (pos, id) structs — the only exchange is doc-keyed, so per-task state
    is one document's tokens.

    ``id_col`` must be unique: the groupBy-terminal assembly emits one
    row per DISTINCT id, so duplicate input ids collapse (pre-r14 the
    ids-join emitted one output row per duplicate) — pinned in
    tests/test_addendum.py.
    """
    from pathwaydataframework_spark.operators.dedup import _ensure_parallelism

    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.trim(F.col(text_col)))).alias("__toks"),
    )
    # r14: posexplode_outer keeps one row per doc even for empty/NULL
    # token arrays, so assembly needs no join back to the id list (that
    # join was a second scan of the input plus a doc-keyed shuffle just
    # to resurrect empty docs).  Empty-marker rows (term '' or NULL) map
    # to a NULL tid — NOT unk_id, which is reserved for real unknown
    # terms — and drop inside the aggregation.
    occ = base.select(
        "doc_id", F.posexplode_outer("__toks").alias("pos", "term")
    )
    v = vocab.select(F.col("term"), F.col("rank").alias("__tid"))
    mapped = occ.join(F.broadcast(v), on="term", how="left").select(
        "doc_id",
        "pos",
        F.when(
            F.length("term") > 0,
            F.coalesce(F.col("__tid"), F.lit(unk_id)),
        ).cast("long").alias("tid"),
    )
    assembled = mapped.groupBy("doc_id").agg(
        F.transform(
            F.filter(
                F.sort_array(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"].isNotNull(),
            ),
            lambda s: s["tid"],
        ).alias("token_ids")
    )
    filled = F.coalesce(F.col("token_ids"), F.array().cast("array<long>"))
    return assembled.select(
        "doc_id",
        filled.alias("token_ids"),
        F.size(filled).cast("long").alias("n_tokens"),
    )


#: Published Gopher repetition thresholds (Rae et al. 2021 appendix A.1.1).
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
    "dup5_char_frac": 0.15,
    "dup6_char_frac": 0.14,
    "dup7_char_frac": 0.13,
    "dup8_char_frac": 0.12,
    "dup9_char_frac": 0.11,
    "dup10_char_frac": 0.10,
}


def gopher_repetition_filter(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The full Gopher repetition gate: every published threshold over the
    line and n-gram metrics, one ``passes_repetition`` verdict per doc.

    Composes :func:`duplicate_line_metrics` (in-row array expressions)
    with :func:`repetition_metrics` (single-scan gram streams); the line
    metrics ride along on the id-restore join, so the whole gate adds no
    exchange beyond the metric computation itself.
    """
    t = GOPHER_REPETITION_THRESHOLDS
    rep = repetition_metrics(
        df, id_col=id_col, text_col=text_col,
        top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10),
    )
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        duplicate_line_metrics(F.col(text_col)).alias("__lm"),
    ).select(
        "doc_id",
        F.col("__lm.dup_line_frac").alias("dup_line_frac"),
        F.col("__lm.dup_line_char_frac").alias("dup_line_char_frac"),
    )
    joined = rep.join(lines, on="doc_id")
    passes = F.lit(True)
    for col, thr in t.items():
        passes = passes & (F.col(col) <= F.lit(thr))
    return joined.withColumn("passes_repetition", passes)


# -- URL / domain filtering -------------------------------------------------


def url_host(url: Column) -> Column:
    """Registrable host of a URL, lowercased (C4 filters pages by domain
    blocklist).  Spark's built-in parse_url runs JVM-side; bare
    'example.com/x' inputs (no scheme) are handled by prefixing '//'."""
    fixed = F.when(url.contains("://"), url).otherwise(F.concat(F.lit("http://"), url))
    # try_parse_url: a malformed URL yields NULL instead of aborting the
    # job with INVALID_URL (web-crawl url columns routinely contain garbage)
    return F.lower(F.try_parse_url(fixed, F.lit("HOST")))


def filter_blocked_domains(
    df: DataFrame,
    *,
    url_col: str = "url",
    blocklist: list[str],
    keep_subdomains_blocked: bool = True,
) -> DataFrame:
    """Drop rows whose URL host is on (or under, with
    ``keep_subdomains_blocked``) a blocked domain — the C4 page-level
    domain rule.  The blocklist is a literal array (real blocklists are
    ~100k entries: swap the array_contains for a broadcast anti-join on a
    blocklist frame, same semantics); evaluation is one scan-side
    predicate, zero exchanges."""
    host = url_host(F.col(url_col))
    arr = F.array(*[F.lit(d.lower()) for d in blocklist])
    blocked = F.array_contains(arr, host)
    if keep_subdomains_blocked:
        sub = F.exists(arr, lambda d: host.endswith(F.concat(F.lit("."), d)))
        blocked = blocked | sub
    # NULL/unparseable hosts cannot be on the blocklist — keep them
    # (coalesce, else the NULL predicate silently deletes those rows)
    return df.filter(~F.coalesce(blocked, F.lit(False)))


# Tracking query parameters stripped by URL canonicalization.  The utm_*
# family matches by prefix; the rest are exact keys (click ids and
# mail-campaign ids that carry no content signal).  Mirrors the parameter
# sets crawl pipelines drop before URL-level dedup.  Bare 'ref' is NOT in
# the set: on many sites it selects content ('?ref=main' branch/tab
# pickers), so stripping it would merge distinct pages before content
# hashing — callers that know their corpus can pass it via extra_keys.
_TRACKING_PARAM_KEYS = (
    "gclid", "fbclid", "msclkid", "dclid", "yclid", "igshid",
    "mc_cid", "mc_eid", "_ga", "ref_src",
)

# Two-label public suffixes for the eTLD+1 heuristic.  A full public-suffix
# list is ~9k entries and updates monthly; at scale you'd broadcast-join a
# suffix frame loaded from the published list — the label arithmetic below
# is identical, only the membership probe changes.
_MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.nz", "co.za", "com.sg", "com.hk", "com.tw",
)


def _is_tracking_param(
    param: Column, extra_keys: tuple[str, ...] = ()
) -> Column:
    """True for a single 'key=value' query token whose key is tracking."""
    key = F.lower(F.substring_index(param, "=", 1))
    exact = F.array(
        *[F.lit(k) for k in (*_TRACKING_PARAM_KEYS, *(k.lower() for k in extra_keys))]
    )
    return key.startswith("utm_") | F.array_contains(exact, key)


def strip_tracking_params(
    url: Column, *, extra_keys: tuple[str, ...] = ()
) -> Column:
    """Drop tracking query parameters (utm_*, click ids, …) from a URL,
    preserving the order of surviving parameters and the fragment, and
    dropping the '?' entirely when nothing survives.  ``extra_keys`` adds
    corpus-specific exact keys (e.g. ``("ref",)`` for sites where ref is
    known to be pure campaign tracking) to :data:`_TRACKING_PARAM_KEYS`.

    Pure column expressions (regexp split/filter/join) — evaluates inside
    whole-stage codegen, zero exchanges.  The URL-level dedup step of a
    crawl pipeline runs this before hashing, else utm-variants of one page
    count as distinct documents.
    """
    # Fragment first: it may contain '?', so peel it before query parsing.
    frag = F.regexp_extract(url, "#.*", 0)  # '' when absent, never NULL
    nofrag = F.regexp_replace(url, "#.*", "")
    base = F.substring_index(nofrag, "?", 1)
    query = F.when(
        nofrag.contains("?"), F.regexp_extract(nofrag, r"\?(.*)", 1)
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~_is_tracking_param(p, extra_keys),
    )
    rebuilt = F.array_join(kept, "&")
    return F.concat(
        base,
        F.when(rebuilt == "", F.lit("")).otherwise(F.concat(F.lit("?"), rebuilt)),
        frag,
    )


def normalize_url(
    url: Column, *, strip_www: bool = True,
    tracking_extra_keys: tuple[str, ...] = (),
) -> Column:
    """Canonical URL form for crawl-scale URL dedup and frontier keys:

    - scheme and host lowercased (path/query case is significant, kept)
    - missing scheme defaults to http://
    - userinfo ('user:pass@') removed
    - default port stripped (:80 for http, :443 for https; others kept)
    - leading 'www.' stripped (``strip_www=False`` to keep)
    - empty path becomes '/'
    - fragment removed
    - tracking query parameters removed (see :func:`strip_tracking_params`)

    All regexp/string column expressions — codegen-friendly, no UDFs, no
    exchanges; safe as a scan-side projection over a 100 TB url column.
    Reference pipelines do this row-wise in Python UDF parsers
    (xpacks/llm/parsers.py); here Catalyst vectorizes it.
    """
    u = F.trim(url)
    # scheme presence must be ANCHORED, not contains('://'): a scheme-less
    # URL whose query VALUE embeds a URL ('a.com?to=http://b.com') would
    # otherwise skip the default-scheme prefix and parse as garbage.
    # Protocol-relative '//cdn.example.com/x' (routine in crawled hrefs)
    # gets only the scheme, so it collapses with its absolute form.
    has_scheme = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://", 0) != ""
    u = (
        F.when(has_scheme, u)
        .when(u.startswith("//"), F.concat(F.lit("http:"), u))
        .otherwise(F.concat(F.lit("http://"), u))
    )
    u = F.regexp_replace(u, "#.*", "")  # fragment never survives
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    host_port = F.lower(F.regexp_replace(authority, "^[^@]*@", ""))
    host_port = (
        F.when(scheme == "https", F.regexp_replace(host_port, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(host_port, ":80$", ""))
        .otherwise(host_port)
    )
    if strip_www:
        # all leading www. labels, not just one: keeps the function
        # idempotent (normalize∘normalize = normalize), which a dedup key
        # must be — 'www.www.x.com' collapses with 'x.com' in one pass
        host_port = F.regexp_replace(host_port, r"^(www\.)+", "")
    path_query = (
        F.when(rest == "", F.lit("/"))
        .when(rest.startswith("?"), F.concat(F.lit("/"), rest))
        .otherwise(rest)
    )
    return strip_tracking_params(
        F.concat(scheme, F.lit("://"), host_port, path_query),
        extra_keys=tracking_extra_keys,
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of a hostname ('a.b.news.co.uk' → 'news.co.uk') — the key
    crawl pipelines group by for per-site quotas, domain-level quality
    priors, and the C4 domain rule.  Uses the embedded two-label suffix
    set (:data:`_MULTIPART_SUFFIXES`); single- or two-label hosts pass
    through unchanged.  Label arithmetic over split() — no UDFs.
    """
    h = F.lower(F.trim(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    # try_element_at: NULL (not ANSI error) when the array is shorter —
    # concat_ws then skips it, and the n-guarded CASE never exposes it.
    last2 = F.concat_ws(".", F.try_element_at(labels, F.lit(-2)), last1)
    last3 = F.concat_ws(
        ".",
        F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        last1,
    )
    multi = F.array(*[F.lit(s) for s in _MULTIPART_SUFFIXES])
    return (
        F.when(n <= 2, h)
        .when(F.array_contains(multi, last2), last3)
        .otherwise(last2)
    )


def canonicalize_urls(
    df: DataFrame, *, url_col: str = "url", strip_www: bool = True
) -> DataFrame:
    """Attach ``norm_url``, ``host`` and ``reg_domain`` columns — the
    standard first projection of a crawl-processing job, from which URL
    dedup (groupBy norm_url), per-site quotas (groupBy reg_domain) and
    domain filters all hang.  One scan-side projection, zero exchanges.
    """
    # chained withColumn on purpose: host/reg_domain reference the
    # norm_url COLUMN, not the normalize_url expression — the normalizer's
    # tree inlines its input ~20×, so re-expanding it under host (and
    # again 5× under reg_domain) multiplies the plan size; referencing the
    # alias keeps separate Projects that CollapseProject won't re-inline
    # (multiply-referenced non-cheap expressions stay put)
    return (
        df.withColumn("norm_url", normalize_url(F.col(url_col), strip_www=strip_www))
        .withColumn(
            "host",
            F.regexp_extract(F.col("norm_url"), "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1),
        )
        .withColumn("reg_domain", registrable_domain(F.col("host")))
    )


def dedup_by_url(
    df: DataFrame,
    *,
    url_col: str = "url",
    prefer_col: str | None = None,
    tie_col: str = "doc_id",
    strip_www: bool = True,
) -> DataFrame:
    """URL-level dedup: one row per canonical URL — the first dedup stage
    of a crawl pipeline (utm-variants, http/https and www/apex forms of a
    page collapse BEFORE content hashing ever runs, which at crawl scale
    removes the bulk of trivial duplicates for the price of a projection
    plus one groupBy-shaped exchange).

    Keeps, per ``norm_url``, the row with the highest ``prefer_col``
    (e.g. a quality score or fetch timestamp), tie-broken on ``tie_col``;
    with no ``prefer_col``, the smallest ``tie_col`` wins.  Implemented
    as :func:`canonicalize_urls` +
    :func:`~pathwaydataframework_spark.operators.sampling.per_key_topk`
    with k=1, so the only exchange is the rank window's — and the hot-key
    story (one URL duplicated millions of times) is the measured
    WindowGroupLimit path, not a straggler.

    Rows whose URL is NULL (missing fetch metadata) cannot be
    canonicalized: they pass through UNCHANGED rather than being deduped
    against each other as one giant NULL group.
    """
    from pathwaydataframework_spark.operators.sampling import per_key_topk

    canon = canonicalize_urls(df, url_col=url_col, strip_www=strip_www)
    with_url = canon.filter(F.col("norm_url").isNotNull())
    null_url = canon.filter(F.col("norm_url").isNull())
    order_col = prefer_col if prefer_col is not None else tie_col
    kept = per_key_topk(
        with_url,
        "norm_url",
        order_col,
        k=1,
        descending=prefer_col is not None,
        tie_col=tie_col,
    ).drop("rank")
    return kept.unionByName(null_url)


def _robots_grouped(
    df: DataFrame, host_col: str, text_col: str, directives: tuple[str, ...]
):
    """Shared robots.txt line machinery: posexplode lines, strip comments,
    regexp-extract (directive, value), keep only ``directives``, and tag
    each row with its RFC 9309 group number (a group = a RUN of
    consecutive User-agent lines plus the rule lines that follow; the
    run is numbered with a lag+running-sum window per host in line
    order — host-keyed, KB-sized, no skew concern).  Returns (tagged
    frame, is_ua predicate)."""
    # CRLF files need no special-casing: after the \n split, the Java
    # regexes treat the leftover \r as a line terminator ('.' excludes
    # \r and '$' anchors before it), so directives and values extract
    # clean — pinned by test_parse_robots_crlf.
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    ).withColumn("line", F.trim(F.regexp_replace("line", "#.*", "")))
    parsed = lines.select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias("directive"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1)).alias("value"),
    )
    # Run detection looks only at GROUP lines (user-agent/allow/disallow),
    # so a blank line, comment, or other directive (Crawl-delay, …)
    # between two User-agent lines doesn't break the run — the lenient
    # RFC 9309 reading every major parser takes.  `directives` may
    # include extra rows (robots_directives tags crawl-delay lines with
    # the group they sit inside) without affecting the grouping:
    # prev-group-line is a last(ignorenulls) over the group lines only,
    # not a plain lag over whatever happens to be in the frame.
    rel = parsed.filter(F.col("directive").isin(*directives))
    order_w = W.partitionBy("host").orderBy("line_no")
    run_w = order_w.rowsBetween(W.unboundedPreceding, 0)
    is_ua = F.col("directive") == "user-agent"
    is_groupline = F.col("directive").isin("user-agent", "allow", "disallow")
    prev_groupline_is_ua = F.last(
        F.when(is_groupline, is_ua), ignorenulls=True
    ).over(order_w.rowsBetween(W.unboundedPreceding, -1))
    starts_run = is_ua & ~F.coalesce(prev_groupline_is_ua, F.lit(False))
    tagged = rel.withColumn("__group", F.sum(starts_run.cast("int")).over(run_w))
    return tagged, is_ua


def _robots_agents(tagged: DataFrame, is_ua) -> DataFrame:
    """(host, __group, agent) — every agent of every User-agent run."""
    return (
        tagged.filter(is_ua)
        .select("host", "__group", F.lower(F.col("value")).alias("agent"))
        .dropDuplicates(["host", "__group", "agent"])
    )


def parse_robots(
    df: DataFrame, *, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt → one row per (host, agent, allow, path) rule — the
    crawl-politeness table a frontier joins against before fetching.

    RFC 9309 group semantics: a group is a RUN of consecutive
    ``User-agent`` lines followed by its rule lines, and the rules belong
    to EVERY agent in the run (``User-agent: a\\nUser-agent: b\\n
    Disallow: /`` disallows for both a and b); blank lines, comments and
    unknown directives (Crawl-delay, Sitemap, …) neither split the run
    nor end the group; a ``User-agent`` line after rule lines starts a
    new group; rules before any ``User-agent`` line are ignored.

    Parsing is pure column ops: posexplode the lines, regexp-extract the
    directive, number agent-line runs with a lag+running-sum window per
    host in line order (the per-host window partitions on the host key —
    no skew concern, robots files are a few KB), then join each group's
    rules to all of its agents.  Handles case-insensitive directive
    names and multiple agent groups.  Empty Disallow ("allow
    everything", per the original spec) is kept as an allow-all rule
    with path ''; a matched group with NO rule lines at all gets the
    same sentinel (RFC 9309: empty group = everything allowed), so a
    bot with its own empty group never falls through to ``*``.

    Crawl-delay and Sitemap lines don't participate in rule matching —
    :func:`robots_directives` surfaces them.
    """
    tagged, is_ua = _robots_grouped(
        df, host_col, text_col, ("user-agent", "allow", "disallow")
    )
    agents = _robots_agents(tagged, is_ua)
    rules = tagged.filter(~is_ua).select(
        "host",
        "__group",
        # per the original spec, an empty Disallow means allow-everything
        ((F.col("directive") == "allow") | (F.col("value") == "")).alias("allow"),
        F.col("value").alias("path"),
    )
    # agents LEFT join rules: a matched group with zero rule lines means
    # "everything allowed for that agent" (RFC 9309 §2.2.1) — emit the
    # allow-all sentinel (allow=true, path='') instead of dropping the
    # group, so robots_allowed won't silently fall back to '*'.  Rules in
    # __group 0 (before any User-agent line) still drop out: no agents row.
    return agents.join(rules, on=["host", "__group"], how="left").select(
        "host",
        "agent",
        F.coalesce("allow", F.lit(True)).alias("allow"),
        F.coalesce("path", F.lit("")).alias("path"),
    )


def robots_directives(
    df: DataFrame, *, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """The two robots.txt directives a real crawler needs that
    :func:`parse_robots` deliberately excludes from rule matching —
    ``Crawl-delay`` (per-host politeness pacing) and ``Sitemap``
    (robots-declared sitemap discovery, the hop that grows a frontier) —
    as one typed frame: (host, agent, directive, value).

    Scoping follows how crawlers actually read them: ``Crawl-delay``
    belongs to its RFC 9309 agent group (same consecutive-User-agent run
    semantics as :func:`parse_robots` — a run's delay applies to every
    agent in the run; a delay before any User-agent line is ignored),
    while ``Sitemap`` is file-global per the sitemaps.org protocol, so
    its rows carry a NULL agent.  Values are kept as strings (a delay is
    typically a number but non-numeric values appear in the wild — cast
    downstream with ``try_cast``); feed sitemap values into
    :func:`~pathwaydataframework_spark.operators.parsers.sitemap_locs`
    fetch results → :func:`canonicalize_urls` to close the discovery
    loop.  Same plan shape as :func:`parse_robots`: per-host KB-scale
    windows, one agents join — nothing corpus-sized.
    """
    # one line-parse pass serves both directives: sitemap rows ride the
    # same tagged frame (grouping ignores them — _robots_grouped's run
    # detection looks only at user-agent/allow/disallow), instead of
    # re-splitting every robots_txt a second time
    tagged, is_ua = _robots_grouped(
        df,
        host_col,
        text_col,
        ("user-agent", "allow", "disallow", "crawl-delay", "sitemap"),
    )
    agents = _robots_agents(tagged, is_ua)
    delays = (
        tagged.filter(F.col("directive") == "crawl-delay")
        .join(agents, on=["host", "__group"])
        .select(
            "host",
            "agent",
            F.lit("crawl-delay").alias("directive"),
            F.col("value"),
        )
    )
    # Sitemap is file-global (may appear before any User-agent line, so
    # its __group — possibly 0 — is deliberately ignored), agent NULL
    sitemaps = tagged.filter(F.col("directive") == "sitemap").select(
        "host",
        F.lit(None).cast("string").alias("agent"),
        F.lit("sitemap").alias("directive"),
        F.col("value"),
    )
    return delays.unionByName(sitemaps)


def schedule_fetches(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    *,
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    default_delay: float = 1.0,
    seed: int = 0,
    start_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-host politeness pacing — the step AFTER the robots gate: give
    every frontier URL a deterministic per-host queue position
    (``fetch_seq``, 0-based, md5(url:seed) order — reproducible across
    runs and cluster sizes) and the earliest fetch time it respects the
    host's ``Crawl-delay`` (``fetch_offset_s = fetch_seq * delay``
    seconds from the host's first fetch).

    ``delays`` is a (host, crawl_delay) frame — typically
    :func:`robots_directives` output filtered to crawl-delay rows; the
    value may still be a string, because the operator ``try_cast``\\ s it
    internally (a wild ``Crawl-delay: fast`` nulls out and paces at
    ``default_delay`` — the contract is self-contained, not dependent
    on every caller remembering to cast).  It is collapsed to ONE row
    per host before the join (the MAX — the most conservative
    politeness — since robots_directives emits one row per (host,
    agent); filter to your agent's rows first for agent-specific
    pacing), so a multi-agent host can never fan the frontier out.
    Hosts without a declared delay (or a non-numeric one) pace at
    ``default_delay``.

    Scale shape: politeness is inherently a PER-HOST serialization, but
    numbering the queue needs no global sort and no per-host
    single-partition window — positions come from the same 256-shard
    monotone layout as :func:`~pathwaydataframework_spark.operators.
    sampling.deterministic_shuffle` (`_sharded_running_total` with
    count weight, grouped by host), so a 10⁸-URL hot host spreads over
    all shards.  Rows with a NULL url are excluded (cannot be
    deterministically queued), like every sampling predicate; NULL
    hosts form a real group.

    ``start_counts`` (a (host, n_scheduled) frame — see
    :func:`host_fetch_counts`) shifts each host's queue start: URLs
    number from the host's prior total instead of 0, which is how
    :func:`schedule_fetches_incremental` keeps pacing continuous
    across micro-batches.
    """
    from pathwaydataframework_spark.operators.sampling import (
        _sharded_running_total,
    )

    if delays is not None:
        # try_cast, not cast: a non-numeric Crawl-delay ("fast") must
        # null out and fall back to default_delay, never error (and
        # under ANSI mode a plain cast would throw mid-stage)
        d = delays.groupBy(host_col).agg(
            F.max(F.col(delay_col).try_cast("double")).alias("__delay")
        )
        frontier = frontier.join(d, on=host_col, how="left")
    else:
        frontier = frontier.withColumn("__delay", F.lit(None).cast("double"))
    delay = F.coalesce(F.col("__delay"), F.lit(float(default_delay)))
    out = _sharded_running_total(
        frontier,
        url_col,
        seed=seed,
        weight=F.lit(1).cast("long"),
        grp=[host_col],
    )
    base = F.lit(0).cast("long")
    if start_counts is not None:
        prev = start_counts.select(
            F.col(host_col), F.col("n_scheduled").alias("__prev")
        )
        out = out.join(prev, on=host_col, how="left")
        base = F.coalesce(F.col("__prev"), F.lit(0)).cast("long")
    return (
        out.withColumn("fetch_seq", (F.col("__total") - 1 + base).cast("long"))
        .withColumn(
            "fetch_offset_s", (F.col("fetch_seq") * delay).cast("double")
        )
        .drop("__total", "__delay", "__prev")
    )


def host_fetch_counts(spark, *, host_col: str = "host") -> DataFrame:
    """Empty persisted-state frame for :func:`schedule_fetches_incremental`:
    (host, n_scheduled) — how far each host's politeness queue has
    advanced across micro-batches (the same persistable-state pattern as
    the Bloom bitmap and the BPE word table)."""
    return spark.createDataFrame([], f"{host_col} string, n_scheduled long")


def schedule_fetches_incremental(
    batch: DataFrame,
    counts: DataFrame,
    delays: DataFrame | None = None,
    *,
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    default_delay: float = 1.0,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of :func:`schedule_fetches` against a persisted
    per-host counter table: returns ``(scheduled batch, updated
    counts)``.  A host's queue position carries ACROSS batches —
    batch 2's first URL for a host that already scheduled 5 gets
    ``fetch_seq`` 5, so politeness pacing holds over the whole stream,
    not per batch.  Inside ``foreachBatch``, persist or
    ``localCheckpoint`` the returned counts and feed them to the next
    batch (the Bloom-index fold-forward, counter-shaped).

    Within the batch, ordering is the same deterministic md5(url:seed)
    queue as the batch operator; the counts table is one row per host
    (broadcastable by AQE), and the fold is one groupBy over the BATCH
    plus a union-sum — history is never rescanned.  NULL-host rows pace
    within their batch but don't carry a queue position across batches
    (the counter join is an equi-join); a crawler has no host to be
    polite to there anyway.
    """
    scheduled = schedule_fetches(
        batch,
        delays,
        url_col=url_col,
        host_col=host_col,
        delay_col=delay_col,
        default_delay=default_delay,
        seed=seed,
        start_counts=counts,
    )
    delta = batch.filter(F.col(url_col).isNotNull()).groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_scheduled")
    )
    updated = (
        counts.unionByName(delta)
        .groupBy(host_col)
        .agg(F.sum("n_scheduled").cast("long").alias("n_scheduled"))
    )
    return scheduled, updated


def fetch_waves(
    scheduled: DataFrame,
    window_s: float,
    *,
    host_col: str = "host",
    offset_col: str = "fetch_offset_s",
) -> DataFrame:
    """Turn :func:`schedule_fetches` offsets into dispatch WAVES — the
    batch a crawler actually fires: ``wave = floor(fetch_offset_s /
    window_s)`` (the numeric tumbling window of the politeness timeline,
    same bucketing as ``windowby(tumbling)`` over the offset column) and
    ``wave_size``, how many of the host's URLs land in that wave, so the
    dispatcher can size its connection pool per tick.

    Scale shape: one window count partitioned by (host, wave) — no join,
    no global sort.  The partitioning is SAFE under hot hosts by
    construction: a host pacing at delay ``d`` puts at most
    ``ceil(window_s / d)`` URLs in any wave, so groups are bounded by
    the politeness contract itself (a 10⁸-URL host spreads over 10⁸·d /
    window_s waves).  Rows with a NULL offset (never produced by
    schedule_fetches) keep a NULL wave.

    Streaming note: ``wave`` is offset-derived and therefore stable per
    row no matter how the stream is batched (offsets from
    :func:`schedule_fetches_incremental` already carry across batches),
    but ``wave_size`` counts only the rows in THIS frame — a wave that
    straddles micro-batches needs its size from the accumulated
    schedule; that is :func:`fetch_waves_incremental`'s job.
    """
    if window_s <= 0:
        raise ValueError("window_s must be positive")
    from pyspark.sql import Window as W

    wave = F.floor(F.col(offset_col) / F.lit(float(window_s)))
    out = scheduled.withColumn("wave", wave.cast("long"))
    w = W.partitionBy(host_col, "wave")
    return out.withColumn("wave_size", F.count(F.lit(1)).over(w).cast("long"))


def wave_counts_state(spark, *, host_col: str = "host") -> DataFrame:
    """Empty persisted-state frame for :func:`fetch_waves_incremental`:
    (host, wave, n) — how many URLs each (host, wave) dispatch slot has
    accumulated across micro-batches.  Bounded: a host pacing at delay
    ``d`` holds at most ``ceil(window_s / d)`` URLs per wave and the
    frame is one row per NON-EMPTY (host, wave), so it grows with the
    schedule horizon, not the stream — and a dispatcher can prune rows
    for waves it has already fired (their counts are final: offsets
    only grow, so a later batch can never land in a fired wave of the
    same host unless the host's queue was reset).  Same persistable
    small-summarizing-state pattern as the host fetch counters."""
    return spark.createDataFrame([], f"{host_col} string, wave long, n long")


def fetch_waves_incremental(
    scheduled: DataFrame,
    counts: DataFrame,
    window_s: float,
    *,
    host_col: str = "host",
    offset_col: str = "fetch_offset_s",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of :func:`fetch_waves` against a persisted
    (host, wave, n) counter table: returns ``(batch with wave +
    ACCUMULATED wave_size, updated counts)``.  A wave that straddles
    micro-batches (offsets from :func:`schedule_fetches_incremental`
    keep growing across batches, so batch 2's first URLs for a host can
    land in the wave batch 1 opened) gets its size from the accumulated
    schedule — the dispatcher-facing number — not from this frame
    alone: each emitted row carries the wave's total count over every
    batch seen so far, and the updated state holds the same totals for
    the next batch.  Rows already emitted in earlier batches are NOT
    re-emitted with the grown size; a dispatcher sizing its pool for a
    wave should read the LATEST batch's rows (or the state) for that
    wave.

    Scale shape: the per-batch wave count (one bounded-group window),
    one groupBy(host, wave) over the BATCH, a state-sized union-sum
    fold, and one broadcastable equi-join back — history is never
    rescanned (the same fold shape as
    :func:`schedule_fetches_incremental`'s host counters).  NULL-host
    rows keep their batch-local size (the counter join is an
    equi-join), mirroring the scheduler's NULL-host contract.
    """
    batch = fetch_waves(
        scheduled, window_s, host_col=host_col, offset_col=offset_col
    )
    delta = (
        batch.filter(F.col(host_col).isNotNull())
        .groupBy(host_col, "wave")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    updated = (
        counts.unionByName(delta)
        .groupBy(host_col, "wave")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    acc = updated.select(host_col, "wave", F.col("n").alias("__acc"))
    out = (
        batch.join(acc, on=[host_col, "wave"], how="left")
        .withColumn(
            "wave_size",
            F.coalesce(F.col("__acc"), F.col("wave_size")).cast("long"),
        )
        .drop("__acc")
    )
    return out, updated


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    agent: str = "*",
    broadcast: bool = False,
) -> DataFrame:
    """Attach an ``allowed`` flag to a URL frontier using parsed robots
    rules (:func:`parse_robots`), per RFC 9309 group selection: the
    frontier agent's OWN group decides where one exists for the host,
    else the ``*`` group, else everything is allowed; within the chosen
    group the LONGEST-matching rule decides (length of the rule pattern,
    wildcards counted — the RFC's "most octets" reading, same as
    Google's matcher) and Allow wins a length tie (the common crawler
    interpretation).  Rule paths support the RFC 9309 special
    characters: ``*`` matches any character run and a TRAILING ``$``
    anchors the end of the URL (``Disallow: /*.php$`` blocks exactly
    the URLs ending in ``.php``); a ``$`` anywhere else is literal.
    Matching compiles each rule to a SQL LIKE pattern (``*``→``%``,
    prefix rules get a trailing ``%``; literal ``%``/``_``/``\\``
    escaped) — evaluated JVM-side inside the per-host rule array, no
    regex engine involved.

    Frontier rows pass through UNTOUCHED — duplicates stay duplicates,
    and payload columns of any type (maps, binaries, …) ride along
    because nothing groups on them.  Plan: the rules frame collapses to
    ONE row per host (group selection + ``collect_list`` into a
    rule array — robots files are KBs, so the array is small), then one
    left join on ``__host`` and a pure array expression compute the
    verdict — the frontier itself is never aggregated.  The join is a
    plain equi-join by default so AQE picks broadcast vs shuffle from
    the measured rules size; ``broadcast=True`` forces the hint for the
    common crawl case (rules ≪ frontier), but is NOT the default — an
    all-hosts rules frame for a 100M-host frontier is tens of GB, where
    a forced broadcast is an OOM rather than a slow plan.
    """
    u = urls.withColumn("__host", url_host(F.col(url_col))).withColumn(
        "__path",
        F.coalesce(
            F.nullif(
                F.regexp_replace(
                    F.col(url_col), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    a = agent.lower()
    spec = F.lower(F.col("agent")) == a
    # compile the rule path to a LIKE pattern once, rules-side (KB-scale):
    # strip a trailing '$' (end anchor), escape LIKE specials, '*' -> '%',
    # and append '%' for ordinary prefix rules
    ends = F.col("path").endswith("$")
    body = F.when(
        ends, F.expr("substring(path, 1, length(path) - 1)")
    ).otherwise(F.col("path"))
    esc = F.regexp_replace(body, r"([\\%_])", r"\\$1")
    pat = F.concat(
        F.regexp_replace(esc, r"\*", "%"),
        F.when(ends, F.lit("")).otherwise(F.lit("%")),
    )
    rule = F.struct(
        F.col("path").alias("path"),
        F.col("allow").alias("allow"),
        pat.alias("pat"),
    )
    # one row per host: the agent's own group and the '*' group collected
    # side by side (collect_list skips the NULLs of the other branch);
    # the specific group wins when non-empty — RFC 9309 group selection
    per_host = (
        rules.filter(spec | (F.lower(F.col("agent")) == "*"))
        .groupBy(F.col("host").alias("__host"))
        .agg(
            F.collect_list(F.when(spec, rule)).alias("__spec"),
            F.collect_list(F.when(~spec, rule)).alias("__star"),
        )
        .select(
            "__host",
            F.when(F.size("__spec") > 0, F.col("__spec"))
            .otherwise(F.col("__star"))
            .alias("__rules"),
        )
    )
    if broadcast:
        per_host = F.broadcast(per_host)
    joined = u.join(per_host, on="__host", how="left")
    matches = F.filter(
        F.col("__rules"), lambda r: F.like(F.col("__path"), r["pat"])
    )
    # longest matching rule wins; Allow beats Disallow on equal length
    # (struct ordering is lexicographic on (len, allow)); array_max of an
    # empty/NULL match set is NULL -> no rule / no robots = allowed
    best = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                F.length(r["path"]).alias("l"), r["allow"].cast("int").alias("a")
            ),
        )
    )
    return (
        joined.withColumn(
            "allowed", F.coalesce(best["a"] == 1, F.lit(True))
        )
        .drop("__host", "__path", "__rules")
    )


def bigram_logprob(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram LM
    fit on the corpus itself — the distributed approximation of the
    CCNet/KenLM perplexity filter (a 5-gram KenLM is a single-node
    artifact; an interpolated bigram is the same signal, exactly
    computable in-engine).

    p(w2|w1) = lam * c(w1 w2)/c(w1) + (1-lam) * c(w2)/N; the first token
    scores unigram.  Mean over a doc's tokens, decimal-stable like
    :func:`unigram_logprob`.

    Plan: ONE corpus scan yields both the unigram stream and the bigram
    stream (zip_with of shifted slices); counts aggregate with map-side
    partials; the unigram table broadcasts, the bigram join is the one
    corpus-scale exchange (keyed on the pair).  Docs with no tokens
    survive with NULL.
    """
    from pathwaydataframework_spark.operators.dedup import _ensure_parallelism

    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokens(F.lower(F.trim(F.col(text_col)))), lambda t: F.length(t) > 0
        ).alias("__toks"),
    )
    uni_stream = base.select("doc_id", F.explode("__toks").alias("term"))
    uni = uni_stream.groupBy("term").agg(F.count(F.lit(1)).alias("uc"))
    uni = uni.localCheckpoint(eager=True)
    # unigram total rides the (already broadcast) vocab frames as a column
    # instead of a collected driver scalar — one fewer job per call
    total_df = uni.agg(
        F.coalesce(F.sum("uc"), F.lit(1)).cast("double").alias("__total")
    )
    uni_t = uni.crossJoin(F.broadcast(total_df))

    n1 = F.greatest(F.size("__toks") - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice("__toks", 1, n1),
        F.slice("__toks", 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg_stream = base.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bg = bg_stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))

    u1 = F.broadcast(
        uni_t.select(F.col("term").alias("w1"), F.col("uc").alias("c1"), "__total")
    )
    u2 = F.broadcast(uni_t.select(F.col("term").alias("w2"), F.col("uc").alias("c2")))
    scored_bg = (
        bg_stream.join(bg, on=["w1", "w2"])
        .join(u1, on="w1")
        .join(u2, on="w2")
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(lam) * F.col("bc") / F.col("c1")
                    + F.lit(1.0 - lam) * F.col("c2") / F.col("__total")
                ),
                6,
            ).alias("lp"),
        )
    )
    first_tok = base.filter(F.size("__toks") > 0).select(
        "doc_id", F.element_at("__toks", 1).alias("term")
    )
    scored_first = first_tok.join(
        F.broadcast(uni_t), on="term"
    ).select(
        "doc_id",
        F.round(F.log(F.col("uc") / F.col("__total")), 6).alias("lp"),
    )
    scored = scored_bg.unionByName(scored_first)
    means = (
        scored.withColumn("__lp", F.col("lp").cast("decimal(18,9)"))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("__lp").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_logp"
            )
        )
    )
    ids = base.select("doc_id")
    return ids.join(means, on="doc_id", how="left")


def winnowing_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, SIGMOD —
    the MOSS local-similarity sketch): hash every character k-gram of the
    normalized text, then keep the RIGHTMOST minimum of each ``window``
    of consecutive gram hashes.  The selected (position, hash) set is the
    fingerprint — guaranteed to share members between any two documents
    with a common substring of length >= k + window - 1, which whole-doc
    hashing (``fingerprint``) cannot do.

    Returns exploded (id, pos, gram_hash) rows, distinct per doc.

    Engine notes: gram hashes come from the md5-bucket primitive so an
    external SQL engine replays the exact selection (a Rabin-Karp rolling
    recurrence is a single-machine micro-optimization — the SELECTED SET
    is identical).  The whole operator is one narrow projection + explode:
    no shuffle, no UDF; at 100 TB it adds zero exchanges ahead of
    whatever joins consume the fingerprints.
    """
    from pathwaydataframework_spark.operators.sampling import hash_bucket

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    # intermediates are NAMED columns, never shared python expression
    # objects: embedding the hash-array expression inside the window
    # lambda would textually inline the whole n-element build into every
    # element access — an O(n²·k) expression tree (the same hazard
    # documented on _word_shingles)
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    # the EAGER barriers are load-bearing: projection collapsing
    # substitutes a named column back into the next stage's lambda, and
    # evaluating a non-attribute subtree INSIDE a higher-order-function
    # lambda is pathologically slow in the interpreted HOF path
    # (measured: one 600-char doc goes from 0.3 s to minutes when
    # __s/__hs collapse into the lambdas).  A lazy checkpoint is NOT a
    # barrier — the first action still executes the collapsed plan —
    # so each stage materializes (tiny frames: normalized text, then the
    # per-doc hash arrays).  At cluster scale persist the same frames to
    # storage instead.
    s1 = df.select(
        F.col(id_col),
        norm.alias("__s"),
        (F.length(norm) - F.lit(k) + 1).alias("__n"),
    ).localCheckpoint(eager=True)
    s2 = s1.select(
        id_col,
        "__n",
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0))),
            lambda i: hash_bucket(F.substring(F.col("__s"), i + 1, F.lit(k))),
        ).alias("__hs"),
    ).localCheckpoint(eager=True)
    # rightmost minimum of each window: min over structs (hash, -pos) —
    # smallest hash wins, ties resolved to the LARGEST position
    sel = F.transform(
        F.sequence(F.lit(0), F.greatest(F.col("__n") - F.lit(window), F.lit(0))),
        lambda j: F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(window - 1)),
                lambda o: F.struct(
                    F.element_at(F.col("__hs"), j + o + 1).alias("h"),
                    (-(j + o)).alias("np"),
                ),
            )
        ),
    )
    s3 = s2.select(
        id_col,
        F.when(F.col("__n") >= F.lit(window), F.array_distinct(sel))
        .otherwise(F.array().cast("array<struct<h:bigint,np:int>>"))
        .alias("__sel"),
    )
    return s3.select(
        id_col, F.explode("__sel").alias("__w")
    ).select(
        id_col,
        (-F.col("__w.np")).cast("long").alias("pos"),
        F.col("__w.h").alias("gram_hash"),
    ).distinct()
