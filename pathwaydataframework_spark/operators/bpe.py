"""Byte-pair-encoding tokenizer: offline merge learning + distributed
encoding — the real analogue of :func:`~pathwaydataframework_spark.
operators.text.tokenize_to_ids`'s whole-word vocab lookup, and the last
step between a crawled/curated corpus and actual training sequences.

Reference parity: the reference tokenizes through tiktoken's learned BPE
encodings (python/pathway/xpacks/llm/splitters.py:76-89 builds a
``tiktoken.get_encoding(...)`` and counts/splits with it); this module
supplies the same capability as engine operators instead of an external
service — a deterministic merge-rule encoder whose learned artifacts
(merges list, vocab) are plain Python/DataFrame values.

Scale shape (the part that matters at 100 TB):

- **Learning** (`learn_bpe_merges`) runs Sennrich's pair-merge loop over
  the *word-frequency table*, not the corpus: one explode + one groupBy
  collapses 100 TB of text to at most ``max_words`` (word, count) rows
  — the only data-sized step — and the driver-side loop is
  O(num_merges x total word chars) over that capped table, exactly how
  subword-nmt/SentencePiece learn from frequency tables offline.
- **Encoding** (`bpe_encode`) crosses into Python only for DISTINCT
  words: the corpus explodes JVM-side, `distinct` collapses the Zipfian
  tail (billions of occurrences -> millions of forms), one Arrow-batched
  kernel encodes each form once, and a join fans the ids back out.  The
  corpus-sized operations — explode, distinct, join, doc-keyed
  re-assembly — are all Catalyst exchanges; the Python kernel's cost is
  sublinear in corpus size and independent of document length skew.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "learn_bpe_merges",
    "bpe_vocab",
    "bpe_encode",
    "bpe_decode",
    "bpe_word_table",
    "bpe_encode_incremental",
]


# -- learning ---------------------------------------------------------------


def learn_bpe_merges(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 100,
    max_words: int = 100_000,
    min_pair_count: int = 2,
    lowercase: bool = True,
    space_marker: str | None = None,
) -> list[tuple[str, str]]:
    """Learn BPE merge rules from a corpus (Sennrich et al. 2016): start
    from characters, repeatedly merge the most frequent adjacent symbol
    pair, weighted by word frequency.

    The distributed part is ONE aggregation: case-fold (``lowercase=True``,
    the default — pass ``False`` for a case-sensitive vocabulary; use the
    SAME setting here and in :func:`bpe_encode` or upper-case tokens are
    unreachable) + whitespace-split + explode + groupBy(word) with
    map-side partial counts, capped to the ``max_words`` most frequent
    forms (TakeOrdered — per-partition heaps, no global sort).  The merge
    loop itself runs on the driver over that (word, count) table, which
    is how BPE is learned in practice — the corpus is never touched again
    after the one shuffle.

    Deterministic: ties on pair count break on the lexicographically
    smallest pair, so the same corpus always yields the same merges.
    Returns the merges in learned order (rank = list index).

    ``space_marker`` (GPT-2's ``Ġ``-style word-boundary symbol) prefixes
    every non-initial word before counting, so merges learn
    space-carrying tokens and :func:`bpe_decode` can reconstruct the
    spaces — use the SAME marker in :func:`bpe_encode`/:func:`bpe_decode`
    and include it in :func:`bpe_vocab`'s ``alphabet`` (a marker that
    never lands in a merge won't be derivable from the merges list).
    """
    text = F.trim(F.col(text_col))
    if lowercase:
        text = F.lower(text)
    words_arr = F.split(text, r"\s+")
    if space_marker:
        words_arr = _mark_spaces(words_arr, space_marker)
    counts = (
        df.select(F.explode(words_arr).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    freqs = {r["word"]: r["count"] for r in counts}
    syms: dict[str, tuple[str, ...]] = {w: tuple(w) for w in freqs}

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for w, c in freqs.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        # max count, ties to the lexicographically smallest pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w, s in syms.items():
            if a not in s:
                continue
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


def bpe_vocab(
    merges: list[tuple[str, str]], *, alphabet: str | None = None
) -> dict[str, int]:
    """token -> id table from a merges list: the (sorted) base alphabet
    takes ids 0..n-1, then each merge's concatenation takes the next id
    in learned order — the standard BPE vocab layout, so ids are stable
    under vocabulary growth (appending merges never renumbers)."""
    if alphabet is None:
        alphabet = "".join(sorted({c for pair in merges for part in pair for c in part}))
    vocab = {c: i for i, c in enumerate(sorted(set(alphabet)))}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


# -- encoding kernels (pure Python; run over DISTINCT words only) -----------


def _encode_longest(
    word: str, vocab: dict[str, int], max_len: int, unk_id: int
) -> list[int]:
    """Greedy longest-match against the vocab, left to right.  A position
    with no matching token emits ``unk_id`` and advances one character,
    so encoding always terminates and never drops input."""
    out: list[int] = []
    i, n = 0, len(word)
    while i < n:
        j = min(n, i + max_len)
        while j > i and word[i:j] not in vocab:
            j -= 1
        if j == i:
            out.append(unk_id)
            i += 1
        else:
            out.append(vocab[word[i:j]])
            i = j
    return out


def _encode_merges(
    word: str,
    ranks: dict[tuple[str, str], int],
    vocab: dict[str, int],
    unk_id: int,
) -> list[int]:
    """Classic BPE replay: start from characters and apply the
    lowest-rank applicable merge until none applies (ties in position go
    leftmost, matching subword-nmt/tiktoken behavior)."""
    parts = list(word)
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return [vocab.get(p, unk_id) for p in parts]


# -- distributed encode ------------------------------------------------------


def bpe_encode(
    df: DataFrame,
    vocab: dict[str, int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "longest",
    merges: list[tuple[str, str]] | None = None,
    unk_id: int = -1,
    broadcast_words: bool = False,
    lowercase: bool = True,
    max_word_len: int = 256,
    append_eos_id: int | None = None,
    space_marker: str | None = None,
) -> DataFrame:
    """Tokenize each document against a BPE vocab -> (doc_id, token_ids,
    n_tokens), the same contract as :func:`~pathwaydataframework_spark.
    operators.text.tokenize_to_ids` but subword instead of whole-word.

    ``append_eos_id`` appends a document-boundary token to every doc's
    ids (empty docs become ``[eos]``) — the standard prep before
    sequence packing, so concatenated training streams keep their
    document boundaries; counted in ``n_tokens``.

    ``mode='longest'`` is the deterministic greedy longest-match encoder
    (WordPiece-style decode of a BPE vocab); ``mode='merges'`` replays
    the learned merge rules by rank (exact Sennrich/tiktoken semantics —
    pass the ``merges`` list from :func:`learn_bpe_merges`).

    Input is case-folded by default (``lowercase=True`` — match the
    setting :func:`learn_bpe_merges` was run with; pass ``False`` for a
    vocab containing upper-case tokens, which would otherwise be
    unreachable).

    ``space_marker`` (opt-in, GPT-2's ``Ġ`` convention) prefixes every
    non-initial word with the boundary symbol BEFORE matching, so the
    marker rides inside the tokens and :func:`bpe_decode` (same marker)
    reconstructs the spaces — ``decode(encode(x)) == x`` exactly for
    trimmed single-space-separated text (whitespace RUNS still
    normalize to one space: the pre-tokenizer splits on ``\\s+``).
    Learn the vocab with the same marker (:func:`learn_bpe_merges`) and
    make sure the marker is in the vocab's alphabet; pick a symbol that
    never occurs in the corpus (U+0120 for natural text).

    Words longer than ``max_word_len`` characters are encoded in
    ``max_word_len``-sized chunks (no token may span a chunk boundary):
    natural-language words never get near the cap, but a whitespace-free
    base64 blob or minified-JS line would otherwise make the merges-mode
    kernel quadratic in the word length — the cap bounds the per-form
    cost at O(max_word_len²) while still never dropping input.

    Plan: whitespace pre-tokenization + posexplode stay JVM-side; the
    Python kernel sees only ``distinct`` word forms (one Arrow crossing,
    vocab shipped once per executor via a SparkContext broadcast); the
    encoded distinct-word table joins back, and one doc-keyed groupBy
    re-assembles ordered ids.  The join is a plain equi-join by default
    so AQE sizes it from the measured post-UDF table (a web corpus's
    distinct whitespace tokens — URLs, hashes, numbers — run to hundreds
    of millions of forms, where a forced broadcast is an OOM); pass
    ``broadcast_words=True`` to force the hint when the distinct-form
    table is known vocab-scale (measured sf0.1: forced broadcast saves
    only the AQE planning tick, ~equal wall-clock — SCALE.md r8).
    """
    _check_mode(mode, merges, max_word_len)
    encode_udf = _make_encode_udf(
        df.sparkSession, vocab, mode, merges, unk_id, max_word_len
    )
    _, occ = _pretokenize(df, id_col, text_col, lowercase, space_marker)
    # the empty word (an empty/NULL doc's single marker row) never enters
    # the distinct-form kernel or the word table
    encoded = occ.filter(F.length("word") > 0).select("word").distinct().select(
        "word", encode_udf(F.col("word")).alias("__ids")
    )
    if broadcast_words:
        encoded = F.broadcast(encoded)
    return _assemble_docs(occ, encoded, eos_id=append_eos_id)


def _check_mode(
    mode: str, merges: list[tuple[str, str]] | None, max_word_len: int
) -> None:
    if mode not in ("longest", "merges"):
        raise ValueError(f"unknown mode {mode!r}: expected 'longest' or 'merges'")
    if mode == "merges" and merges is None:
        raise ValueError("mode='merges' requires the merges list")
    if max_word_len < 1:
        raise ValueError(f"max_word_len must be >= 1, got {max_word_len}")


def _make_encode_udf(
    spark,
    vocab: dict[str, int],
    mode: str,
    merges: list[tuple[str, str]] | None,
    unk_id: int,
    max_word_len: int,
):
    """The Arrow-batched distinct-word kernel: word -> array<long> ids
    (vocab/ranks shipped once per executor via SparkContext broadcasts;
    over-cap words encoded in bounded chunks)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc_vocab = spark.sparkContext.broadcast(dict(vocab))
    max_len = max((len(t) for t in vocab), default=1)
    bc_ranks = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)} if merges is not None else {}
    )
    use_merges = mode == "merges"
    cap = max_word_len

    def _fn(words: pd.Series) -> pd.Series:
        v = bc_vocab.value
        r = bc_ranks.value
        if use_merges:
            enc = lambda w: _encode_merges(w, r, v, unk_id)  # noqa: E731
        else:
            enc = lambda w: _encode_longest(w, v, max_len, unk_id)  # noqa: E731

        def capped(w: str) -> list[int]:
            if len(w) <= cap:
                return enc(w)
            out: list[int] = []
            for i in range(0, len(w), cap):
                out.extend(enc(w[i : i + cap]))
            return out

        return words.map(capped)

    _fn.__annotations__ = {"words": pd.Series, "return": pd.Series}
    return pandas_udf(_fn, "array<long>")


def _mark_spaces(words_arr, space_marker: str):
    """Prefix every non-initial word with the boundary marker (GPT-2's
    ``Ġ`` convention): the marker IS the space, carried through
    tokenization so decode can put it back.  Empty split tokens are
    dropped FIRST — Spark's ``trim`` strips only ' ' (not \\t/\\n/\\r),
    so a newline-terminated text splits with a trailing '' that would
    otherwise become a phantom bare-marker token (inflating n_tokens,
    decoding to a stray space, and skewing learned pair counts)."""
    return F.transform(
        F.filter(words_arr, lambda w: F.length(w) > 0),
        lambda w, i: F.when(
            i > F.lit(0), F.concat(F.lit(space_marker), w)
        ).otherwise(w),
    )


def _pretokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool,
    space_marker: str | None = None,
):
    """JVM-side whitespace pre-tokenization: (base doc frame with word
    arrays, exploded (doc_id, pos, word) occurrences).

    ``occ`` keeps EVERY document's rows: ``posexplode_outer`` emits one
    (NULL, NULL) row for a NULL/empty word array (NULL text, or the
    space-marker path's empty-token filter emptying it), and
    ``split('') == ['']`` keeps the plain path's empty doc as one
    empty-word row — both dropped at assembly, where they have no ids.
    That lets :func:`_assemble_docs` rebuild documents from occurrences
    alone — r14: no join back to the id list, which was a second full
    scan of the input plus a corpus-wide shuffle."""
    text = F.trim(F.col(text_col))
    if lowercase:
        text = F.lower(text)
    words_arr = F.split(text, r"\s+")
    if space_marker:
        words_arr = _mark_spaces(words_arr, space_marker)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        words_arr.alias("__words"),
    )
    occ = base.select(
        "doc_id", F.posexplode_outer("__words").alias("pos", "word")
    )
    return base, occ


def _assemble_docs(
    occ: DataFrame,
    encoded: DataFrame,
    *,
    eos_id: int | None = None,
) -> DataFrame:
    """Fan the encoded word table back out over occurrences and rebuild
    ordered per-doc id arrays (doc-keyed groupBy; empty docs survive with
    an empty array, or ``[eos_id]`` when a boundary token is appended).

    r14: assembly is occurrence-only.  ``occ`` carries one row per doc
    even for empty/NULL text (:func:`_pretokenize`'s contract), the word
    join is LEFT (the empty word is never in the encoded table — its
    NULL ids drop inside the aggregation), and the old join back to the
    document id list — a second full input scan plus a corpus-wide
    shuffle purely to resurrect empty docs — is gone.

    ``id_col`` must be unique: the groupBy-terminal form emits one row
    per DISTINCT id, so duplicate input ids now collapse (and interleave
    their occurrences) where the pre-r14 ids-join fanned the assembled
    array back out once per duplicate row — pinned in
    tests/test_addendum.py."""
    mapped = occ.join(encoded, on="word", how="left").select(
        "doc_id", "pos", "__ids"
    )
    assembled = mapped.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.filter(
                    F.sort_array(F.collect_list(F.struct("pos", "__ids"))),
                    lambda s: s["__ids"].isNotNull(),
                ),
                lambda s: s["__ids"],
            )
        ).alias("token_ids")
    )
    filled = F.coalesce(F.col("token_ids"), F.array().cast("array<long>"))
    if eos_id is not None:
        filled = F.concat(filled, F.array(F.lit(int(eos_id)).cast("long")))
    return assembled.select(
        "doc_id",
        filled.alias("token_ids"),
        F.size(filled).cast("long").alias("n_tokens"),
    )


def bpe_decode(
    df: DataFrame,
    vocab: dict[str, int],
    *,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    unk_token: str = "�",
    space_marker: str | None = None,
) -> DataFrame:
    """token ids -> (doc_id, text): the inverse of :func:`bpe_encode`,
    tiktoken's ``decode`` as an engine operator.  Ids outside the vocab
    (e.g. ``unk_id``) decode to ``unk_token``.

    Whitespace is NOT recoverable from plain BPE ids (the encoder's
    whitespace pre-tokenization discards it), so the decoded text is the
    per-doc concatenation of token strings — ``decode(encode(x))``
    equals ``x`` with whitespace removed, which is the roundtrip
    contract the driver query pins.  UNLESS the corpus was encoded with
    a ``space_marker``: pass the same marker here and every marker
    (word-boundary symbol carried inside the tokens) turns back into
    one space — the roundtrip becomes exact identity for trimmed
    single-space-separated text.

    Plan: the id->token table is a small DataFrame joined to the
    posexploded ids, then the same ordered doc-keyed re-assembly as
    encoding — never a giant map literal in the expression tree (a
    100k-entry ``create_map`` would blow up codegen), never a Python
    crossing.  The table gets an explicit broadcast hint: unlike the
    corpus-DERIVED distinct-word table in :func:`bpe_encode` (where the
    size is unknowable and AQE decides), this one is the caller's vocab
    dict — vocab-scale by construction.
    """
    spark = df.sparkSession
    vtab = F.broadcast(
        spark.createDataFrame(
            [(i, t) for t, i in vocab.items()], "__tid long, __tok string"
        )
    )
    # r14: posexplode_outer keeps one (NULL, NULL) row for an empty/NULL
    # id array, so assembly needs no join back to the id list (a second
    # input scan + doc-keyed shuffle purely to resurrect empty docs);
    # the marker row's NULL token drops inside the aggregation, real
    # unknown ids still decode to unk_token
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(F.col(ids_col)).alias("pos", "__tid"),
    )
    joined = occ.join(vtab, on="__tid", how="left").select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos").isNotNull(),
            F.coalesce("__tok", F.lit(unk_token)),
        ).alias("__tok"),
    )
    assembled = joined.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.sort_array(F.collect_list(F.struct("pos", "__tok"))),
                    lambda s: s["__tok"].isNotNull(),
                ),
                lambda s: s["__tok"],
            ),
            "",
        ).alias("text")
    )
    text = F.coalesce("text", F.lit(""))
    if space_marker:
        text = F.replace(text, F.lit(space_marker), F.lit(" "))
    return assembled.select("doc_id", text.alias("text"))


# -- incremental / streaming encode ------------------------------------------


def bpe_word_table(spark) -> DataFrame:
    """Empty persisted-state frame for :func:`bpe_encode_incremental`:
    (word string, __ids array<long>) — the streaming analogue of the
    Bloom bitmap frame (dedup.build_bloom_index): write it out with
    ``.write.parquet`` between micro-batches and only NEW word forms
    ever cross into Python again."""
    return spark.createDataFrame([], "word string, __ids array<long>")


def bpe_encode_incremental(
    batch: DataFrame,
    word_table: DataFrame,
    vocab: dict[str, int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "longest",
    merges: list[tuple[str, str]] | None = None,
    unk_id: int = -1,
    lowercase: bool = True,
    max_word_len: int = 256,
    append_eos_id: int | None = None,
    space_marker: str | None = None,
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of :func:`bpe_encode` against a persisted
    word→ids table: returns ``(encoded batch, updated word table)``.
    ``append_eos_id`` adds the document-boundary token exactly like the
    batch operator, so an encode→pack stream lays out identically to
    the one-shot ``bpe_encode(append_eos_id=...)`` pipeline.

    The distinct-word kernel is naturally incremental — a word form
    encodes to the same ids forever — so the streaming shape is the
    Bloom-index fold-forward (dedup.update_bloom_index): anti-join the
    batch's distinct forms against the table, encode ONLY the new forms
    (the Arrow crossing shrinks batch over batch as the Zipfian head
    saturates), union them into the table, and assemble the batch's
    docs from the updated table.  The updated table comes back already
    ``localCheckpoint``-ed — the kernel runs ONCE per batch no matter
    how many actions follow — so feed it to the next batch as-is (or
    ``.write.parquet`` it for durable state); encode parameters must
    match across batches (they define the table's meaning, like the
    Bloom m/k).  ``checkpoint=False`` returns the LAZY table instead
    (no eager kernel execution) for callers that persist the state
    durably themselves and want exactly one materialization — those
    callers own the single-fold discipline: any second action on
    either return value re-runs the kernel.

    At 100 TB the table is bounded by DISTINCT corpus word forms (the
    same scale argument as batch bpe_encode's join side), the per-batch
    cost by batch size + new-form count — history is never re-encoded.
    """
    _check_mode(mode, merges, max_word_len)
    encode_udf = _make_encode_udf(
        batch.sparkSession, vocab, mode, merges, unk_id, max_word_len
    )
    _, occ = _pretokenize(batch, id_col, text_col, lowercase, space_marker)
    new_forms = (
        occ.filter(F.length("word") > 0)
        .select("word")
        .distinct()
        .join(word_table.select("word"), on="word", how="left_anti")
        .select("word", encode_udf(F.col("word")).alias("__ids"))
    )
    # localCheckpoint BEFORE deriving either return value: the encoded
    # batch and the updated table both read the new-forms kernel, and
    # without the cut each caller-side action would run it again (the
    # same single-fold discipline as pack_no_straddle_incremental's
    # internal checkpoint; micro-batches are memory-sized by definition)
    updated = word_table.unionByName(new_forms)
    if checkpoint:
        updated = updated.localCheckpoint()
    return _assemble_docs(occ, updated, eos_id=append_eos_id), updated
