"""Deduplication operators — exact and near-duplicate.

Reference analogue: ``Table.deduplicate`` (reference table.py:1064,
stdlib/stateful/deduplicate.py:9) keeps the last accepted value per instance;
plus the LLM-pipeline addendum ops (exact hash-dedup, MinHash+LSH, SimHash,
n-gram Jaccard) that a 100 TB training-data pipeline needs.

Scale design:
- exact_dedup: one hash-agg / window on the content hash — a single shuffle.
- MinHash: shingle explode → per-doc k min-hashes computed as k JVM-side
  ``min`` aggregates (no Python), → b band hashes → explode bands →
  self-join per (band, hash) bucket.  Candidate pairs are verified with an
  exact Jaccard join.  This is the textbook linear-scale LSH plan: no
  all-pairs comparison ever materializes.
- SimHash: 64-bit signature via per-bit weighted sums — one explode + one
  hash-agg; bucket by band for candidate generation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window as W

from pathwaydataframework_spark.internals.expression import lift
from pathwaydataframework_spark.internals.table import Table


def deduplicate(table: Table, *, value=None, instance=None, acceptor=None) -> Table:
    """Keep one row per instance — batch analogue of reference
    ``Table.deduplicate`` (table.py:1064).

    Batch semantics: the *last* row per instance ordered by ``value``
    (the reference keeps the last accepted value as the stream progresses;
    in a bounded table the acceptor chain reduces to the max accepted
    value).  Custom ``acceptor`` needs per-group sequential logic →
    applyInPandasWithState in the streaming round; batch supports the
    default acceptor (always accept → last value wins).
    """
    if acceptor is not None:
        from pathwaydataframework_spark.operators.stateful import (
            deduplicate_with_acceptor,
        )

        return deduplicate_with_acceptor(
            table, value=value, instance=instance, acceptor=acceptor
        )
    if value is None:
        raise ValueError("deduplicate needs value=")
    order_col = table._resolve(value)
    if instance is not None:
        # max_by aggregation, not a rank window: a hot instance key
        # partial-combines map-side instead of funnelling every duplicate
        # row through one task's sort (same hardening as exact_dedup /
        # dedup_lines_global).  The ordering key is null-guarded: max_by
        # IGNORES rows whose ordering is NULL, which would fabricate an
        # all-NULL output row for a group whose every value is NULL — the
        # (isNotNull, value) struct keeps every row orderable and matches
        # the old window's desc-nulls-last rank (non-null values win).
        cols = table._df.columns
        row = F.struct(*[F.col(c) for c in cols])
        okey = F.struct(
            order_col.isNotNull().cast("int").alias("__nn"), order_col.alias("__o")
        )
        out = (
            table._df.groupBy(table._resolve(instance).alias("__pw_k"))
            .agg(F.max_by(row, okey).alias("__r"))
            .select(*[F.col(f"__r.{c}").alias(c) for c in cols])
        )
    else:
        # "last value overall" is a single global max_by aggregate — a
        # Window.partitionBy() (no keys) would funnel every row through ONE
        # task; the agg gets map-side partials and stays parallel (same
        # hazard documented for interpolate in ordered.py).  Grouping on a
        # constant (instead of a global agg) makes empty input yield ZERO
        # rows rather than one all-NULL aggregate row.
        cols = table._df.columns
        row = F.struct(*[F.col(c) for c in cols])
        out = (
            table._df.groupBy(F.lit(1).alias("__g"))
            .agg(F.max_by(row, order_col).alias("__r"))
            .select(*[F.col(f"__r.{c}").alias(c) for c in cols])
        )
    return Table(out)


def exact_dedup(table: Table, *on, keep_order_by=None) -> Table:
    """Exact deduplication by content column(s): keeps the first row per key
    (ordered by ``keep_order_by``; default = the deterministic row-id hash,
    so the survivor is stable across runs and partitionings).

    One min_by aggregation over the content key — single shuffle with
    map-side partial combine, so a pathologically hot key (the same
    document repeated millions of times — exactly what exact dedup exists
    to remove) collapses inside each task instead of funnelling through
    one reducer's sort.  No UDFs.

    >>> import pathwaydataframework_spark as pw
    >>> t = pw.Table.from_rows(
    ...     spark, [(1, "x"), (2, "x"), (3, "y")], "id long, body string")
    >>> out = exact_dedup(t, pw.this.body, keep_order_by=pw.this.id)
    >>> sorted((r["id"], r["body"]) for r in out.df.collect())
    [(1, 'x'), (3, 'y')]
    """
    keys = [table._resolve(c) for c in on]
    # default order must NOT be the partition key (constant within each
    # partition → nondeterministic survivor); the row-id hash is a total
    # order, so the kept row is stable across runs and partitionings
    order = (
        table._resolve(keep_order_by) if keep_order_by is not None else table.id_expr()
    )
    cols = table._df.columns
    row = F.struct(*[F.col(c) for c in cols])
    # null-guarded ordering key: min_by IGNORES NULL-ordering rows (an
    # all-NULL-order group would yield a fabricated all-NULL row); the
    # (isNotNull, value) struct keeps every row orderable and reproduces the
    # old window's asc-nulls-first rank (a NULL order value wins: isNotNull
    # casts to 0, sorting before every non-null row's 1)
    okey = F.struct(
        order.isNotNull().cast("int").alias("__nn"), order.alias("__o")
    )
    out = (
        table._df.groupBy(*[k.alias(f"__pw_k{i}") for i, k in enumerate(keys)])
        .agg(F.min_by(row, okey).alias("__r"))
        .select(*[F.col(f"__r.{c}").alias(c) for c in cols])
    )
    return Table(out)


# -- shingling helpers ------------------------------------------------------


def _word_shingles(text: Column, n: int) -> Column:
    """n-gram word shingles as an array<string> — all JVM-side.

    Built by zip_with-folding n SHIFTED slices of the token array
    (t[0:m] ⊕ t[1:m+1] ⊕ …), which is O(n·m) per doc.  The obvious
    ``transform(sequence(...), i -> slice(toks, i+1, n))`` is O(m²) —
    non-literal slice starts defeat codegen — and measured 4× slower on
    the documents fixture.
    """
    toks = F.split(F.trim(text), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    num = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    parts = [F.slice(toks, k, num) for k in range(1, n + 1)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(acc)


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Fan-out operators amplify rows 10-100×; when the input arrives in
    fewer partitions than cores (single small file locally; a skewed listing
    at scale), spread it first.  No-op when the input is already parallel —
    at 100 TB the scan supplies thousands of partitions and this adds
    nothing."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        # cheap proxy for scan parallelism (a .rdd probe costs ~0.5 s per
        # call); non-file-backed frames return [] → assume already parallel
        files = df.inputFiles()
    except Exception:  # noqa: BLE001
        return df
    if files and len(files) < max(target // 2, 2):
        return df.repartition(target)
    return df


def shingle_docs(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs — the input to MinHash and Jaccard."""
    return _ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), _word_shingles(F.col(text_col), n).alias("__sh")
    ).select("doc_id", F.explode("__sh").alias("shingle"))


# -- exact n-gram Jaccard similarity join -----------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    block_by: str | None = None,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingles: pairs (a, b, jaccard) with
    a < b and jaccard ≥ threshold.

    Plan: shingle-explode → self-join on shingle (optionally pre-blocked by
    ``block_by`` to bound the candidate space) → count intersections →
    compute |A∪B| = |A|+|B|−|A∩B|.  Shuffles are keyed on shingles and doc
    pairs — no quadratic blowup beyond genuinely co-shingled docs.
    """
    sh = shingle_docs(df, id_col, text_col, n)
    if block_by:
        blocks = df.select(F.col(id_col).alias("doc_id"), F.col(block_by).alias("__blk"))
        sh = sh.join(blocks, on="doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count_distinct("shingle").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    join_cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    if block_by:
        join_cond = join_cond & (F.col("a.__blk") == F.col("b.__blk"))
    inter = (
        a.join(b, join_cond)
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# -- MinHash + LSH ----------------------------------------------------------


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """Per-doc MinHash signature: k min-hashes over xxhash64(shingle, seed),
    computed PER ROW as one running-min ``aggregate`` over the shingle
    array — zero exchanges, zero explode (r14; guide §2.4: remove shuffles
    outright).

    The r5 explode → k min-aggs formulation shuffled one signature row per
    doc (cheap but still a corpus-wide exchange + a 10-100× row explode
    feeding the partial aggs); the naive per-row alternative measured
    slower back then because banding re-evaluated the shingle expression
    per hash.  This form dodges both: ONE traversal of the shingle array
    folds a k-wide running-min accumulator (``least`` + per-seed
    ``xxhash64``), so the shingle array is built once per row, the k
    hashes are computed exactly as often as the explode path computed
    them, and the whole signature + banding stays inside one
    whole-stage-codegen projection.  Hash VALUES are identical to the
    explode form (seeds cast to int, matching the old integer literals),
    so persisted band indexes from earlier versions keep matching.
    Documents with no shingles (fewer than ``n`` words, empty or NULL
    text) are dropped, exactly like the exploded stream dropped them.
    """
    sh = _word_shingles(F.col(text_col), n)
    base = (
        _ensure_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), sh.alias("__sh"))
        .filter(F.size("__sh") > 0)
    )
    long_max = (1 << 63) - 1
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.aggregate(
        F.col("__sh"),
        F.array_repeat(F.lit(long_max).cast("long"), num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            seeds,
            lambda a, i: F.least(a, F.xxhash64(s, i.cast("int"))),
        ),
    )
    return base.select("doc_id", sig.alias("__sig")).select(
        "doc_id",
        *[
            F.element_at("__sig", k + 1).alias(f"h{k}")
            for k in range(num_hashes)
        ],
    )


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(doc_id, band_idx, band_hash) LSH band rows — the PERSISTABLE index
    format of a corpus.  Write it once (ideally bucketed on band_hash),
    then check every incoming batch against it with
    :func:`incremental_neardup_pairs` — the corpus text is never
    re-shingled.  ``bands × 8 bytes`` per doc, linear build."""
    compact = _minhash_compact_bands(
        df, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands
    )
    return _explode_band_rows(compact, bands, extra_cols=["sig"])


def _minhash_compact_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """ONE row per doc: (doc_id, band0..band{b-1}, sig) — the compact
    pre-explode form of the band index.  ``sig`` is the full-signature
    hash: the identical-signature collapse reads it directly, and a
    persisted index can dedup byte-identical docs without re-hashing."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n=n, num_hashes=num_hashes)
    band_cols = [
        F.xxhash64(
            *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    return sig.select(
        "doc_id",
        *band_cols,
        # re-states the band exprs; Catalyst CSE computes each hash once
        F.xxhash64(*[band_cols[b] for b in range(bands)]).alias("sig"),
    )


def _explode_band_rows(
    compact: DataFrame, bands: int, *, extra_cols: list[str] | None = None
) -> DataFrame:
    """(doc_id, band_idx, band_hash[, extras]) rows from the compact
    one-row-per-doc band frame — a narrow per-partition explode, no
    shuffle."""
    return compact.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.col(f"band{b}").alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
        *(extra_cols or []),
    ).select("doc_id", "bb.band_idx", "bb.band_hash", *(extra_cols or []))


def incremental_neardup_pairs(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    *,
    id_col: str,
    text_col: str,
    corpus_docs: DataFrame | None = None,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup matches of an incoming batch AGAINST an existing corpus:
    (new_id, corpus_id[, jaccard]).  The incremental path of a continuously
    ingesting pipeline — only the new batch is shingled/hashed; the corpus
    contributes its stored :func:`minhash_band_index` rows.  The band join
    is hash-partitioned on band_hash, so cost scales with the BATCH, not
    the corpus.

    With ``corpus_docs`` the candidates are verified by exact Jaccard
    (band parameters must match the persisted index's, or candidates are
    garbage — kept explicit rather than guessed from the index).
    """
    new_bands = minhash_band_index(
        new_docs, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands
    )
    cand = (
        new_bands.alias("a")
        .join(
            corpus_index.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col("a.doc_id").alias("new_id"), F.col("b.doc_id").alias("corpus_id")
        )
        .distinct()
    )
    if corpus_docs is None:
        return cand
    # Deliberately NOT pre-filtered to the matched id set (r15 A/B): a
    # semi-join on ids derived from ``cand`` re-executes the candidate
    # band join — and with it a corpus-index-scale exchange — once per
    # side, to save map-side shingle projections.  Measured slower at
    # sf0.1 (interleaved ×5: median 1.035 → 1.282 s); a checkpoint of
    # ``cand`` would fix the re-execution but adds a blocking
    # materialization to an incremental API.  See the same opt-out note
    # on :func:`_verify_jaccard_pairs`.
    ga = _ensure_parallelism(new_docs).select(
        F.col(id_col).alias("new_id"),
        _word_shingles(F.col(text_col), n).alias("g_a"),
    )
    gb = _ensure_parallelism(corpus_docs).select(
        F.col(id_col).alias("corpus_id"),
        _word_shingles(F.col(text_col), n).alias("g_b"),
    )
    return (
        cand.join(ga, on="new_id")
        .join(gb, on="corpus_id")
        .withColumn("n_inter", F.size(F.array_intersect("g_a", "g_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.size("g_a") + F.size("g_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", F.round("jaccard", 6).alias("jaccard"))
    )


def incremental_neardup_filter(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    *,
    id_col: str,
    text_col: str,
    corpus_docs: DataFrame | None = None,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Drop incoming rows that near-duplicate the corpus; keep the rest.
    Anti-join on the matched new_id set — new rows that only duplicate
    EACH OTHER are kept (run :func:`minhash_lsh_pairs` within the batch
    for intra-batch dedup)."""
    hits = incremental_neardup_pairs(
        new_docs,
        corpus_index,
        id_col=id_col,
        text_col=text_col,
        corpus_docs=corpus_docs,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
    ).select(F.col("new_id").alias(id_col)).distinct()
    return new_docs.join(hits, on=id_col, how="left_anti")


def collapse_pairs_by_signature(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    rep_pair_fn,
    intra_extras: dict | None = None,
) -> DataFrame:
    """Bound the degenerate-hot-band hazard shared by every banded
    self-join (MinHash bands, SimHash blocks, byte-group Hamming blocking,
    embedding LSH): collapse docs with IDENTICAL full signatures to one
    representative, pair representatives only, then expand group membership
    back into doc pairs.

    A band holding k byte-identical docs costs O(k) membership rows here
    instead of O(k²) join rows inside the band — the self-join sees one
    representative per signature, so per-band join work is linear in the
    number of *distinct* signatures.  (The expanded OUTPUT is still
    quadratic in group size — that is the pairs contract; corpus-level
    dedup composes this with connected components precisely to avoid
    materializing it.)

    Args:
        sigs: one row per doc: (id_col, sig_col, *carry); sig_col any
            groupable type (long hash, byte array, ...).  Identical sig ⇒
            identical band keys, so expansion introduces no false
            candidates and drops none.  Extra ``carry`` columns (e.g. the
            pre-explode band hashes) ride through to ``reps`` — r15: a
            caller whose banding needs per-doc payload can read it off
            ``reps`` directly instead of joining back to its own frame.
        rep_pair_fn: callable(reps) → DataFrame(rep_a, rep_b, *extras)
            where ``reps`` is one row per representative: id_col plus
            every carry column of ``sigs``; extras (e.g. a
            signature-level distance) are valid for every expanded pair
            because members share the representative's signature.
        intra_extras: extra column values for same-signature pairs (e.g.
            hamming → 0); cast to the rep-pair schema automatically.
    """
    groups = sigs.groupBy(sig_col).agg(F.min(id_col).alias("__rep"))
    # ONE materialization of the (sig, id, rep, *carry) membership: it
    # feeds four consumers (rep extraction, both expansion sides, intra
    # pairs) and would otherwise re-run the caller's signature pipeline
    # per consumer
    members = sigs.join(groups, on=sig_col).localCheckpoint(eager=True)
    reps = members.filter(F.col(id_col) == F.col("__rep")).drop("__rep")
    rep_pairs = rep_pair_fn(reps)
    extras = [c for c in rep_pairs.columns if c not in ("rep_a", "rep_b")]
    ma = members.select(F.col("__rep").alias("rep_a"), F.col(id_col).alias("__da"))
    mb = members.select(F.col("__rep").alias("rep_b"), F.col(id_col).alias("__db"))
    inter = (
        rep_pairs.join(ma, on="rep_a")
        .join(mb, on="rep_b")
        .select(
            F.least("__da", "__db").alias("id_a"),
            F.greatest("__da", "__db").alias("id_b"),
            *extras,
        )
    )
    x = members.select(F.col(sig_col).alias("__s"), F.col(id_col).alias("id_a"))
    y = members.select(F.col(sig_col).alias("__s"), F.col(id_col).alias("id_b"))
    intra = x.join(y, on="__s").filter(F.col("id_a") < F.col("id_b"))
    dtypes = dict(inter.dtypes)
    intra = intra.select(
        "id_a",
        "id_b",
        *[
            (intra_extras or {}).get(e, F.lit(None)).cast(dtypes[e]).alias(e)
            for e in extras
        ],
    )
    return inter.unionByName(intra)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, optionally
    verified with exact Jaccard.

    With num_hashes=64, bands=16 (rows/band=4) the S-curve crosses ~0.5 —
    tune per threshold.  Returns (id_a, id_b, jaccard) when verify else
    (id_a, id_b).
    """
    # materialize the COMPACT band frame ONCE (1 row/doc: band hashes +
    # full-signature hash): the membership build below consumes it twice
    # (groups aggregation + probe side), and without the pin each branch
    # re-runs the whole corpus scan + shingle fold — at 100 TB that is an
    # extra full corpus pass (measured at r15: dropping this checkpoint
    # is a wash at sf0.1 only because fixed overheads hide the second
    # scan; the checkpoint write is 1 row/doc).  r15: the full compact
    # frame goes INTO the collapse — its membership checkpoint carries
    # the band hashes as carry columns, the reps frame comes back with
    # them attached, and the old left-semi join back to compact for the
    # representatives' band hashes is gone (one join fewer; interleaved
    # same-session A/B at sf0.1, 8 pairs: best 2.025 → 1.902 s, median
    # 2.248 → 2.109 s, 6/8 pairs improved, output row-identical).
    compact = _minhash_compact_bands(
        df, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands
    ).localCheckpoint(eager=True)

    def _rep_band_pairs(reps: DataFrame) -> DataFrame:
        rb = _explode_band_rows(reps, bands)
        a = rb.alias("a")
        b = rb.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("rep_a"), F.col("b.doc_id").alias("rep_b"))
            .distinct()
        )

    cand = collapse_pairs_by_signature(compact, "doc_id", "sig", _rep_band_pairs)
    if not verify:
        return cand
    return _verify_jaccard_pairs(cand, df, id_col, text_col, n=n, threshold=threshold)


def _verify_jaccard_pairs(
    cand: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidate pairs.

    Joins each side's distinct-shingle set and computes Jaccard via
    array_intersect — O(candidates), not O(co-shingled pairs) like the
    full exact join.  Shared by the MinHash and SimHash blocking paths.

    Deliberately NOT pre-filtered to the candidate id set (r15 A/B): a
    semi-join on ids derived from ``cand`` re-executes the candidate
    subtree (a corpus-scale band self-join) once per reference — two
    extra SHUFFLED corpus-sized passes to save two map-side shingle
    projections.  Measured slower at sf0.1 (interleaved ×6: median
    2.289 → 2.565 s) and the trade only worsens where shuffle is the
    bottleneck; the incremental path measured the same way — see the
    matching opt-out note on :func:`incremental_neardup_pairs`."""
    shingle_sets = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), _word_shingles(F.col(text_col), n).alias("g")
    )
    ga = shingle_sets.select(F.col("doc_id").alias("id_a"), F.col("g").alias("g_a"))
    gb = shingle_sets.select(F.col("doc_id").alias("id_b"), F.col("g").alias("g_b"))
    return (
        cand.join(ga, on="id_a")
        .join(gb, on="id_b")
        .withColumn("n_inter", F.size(F.array_intersect("g_a", "g_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("g_a") + F.size("g_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- SimHash ----------------------------------------------------------------


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 32
) -> DataFrame:
    """Per-doc SimHash: sign of per-bit sums of token hashes.

    Computed PER ROW (r14; guide §2.4): one running ``aggregate`` over
    the token array folds a ``bits``-wide +1/−1 accumulator, then the
    sign bits pack into a long — zero exchanges, zero explode, one
    whole-stage-codegen projection.  The old explode → ``bits``
    conditional sums → doc-keyed exchange produced identical values
    (per-bit integer sums are order-independent), so signatures are
    bit-for-bit unchanged; NULL text drops exactly like the exploded
    stream dropped it."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        _ensure_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
        .filter(F.col("__toks").isNotNull())
    )
    # one literal mask per bit (bit 63 is the long sign bit — its mask is
    # the two's-complement min long, exactly what shiftleft(1L, 63) was)
    masks = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(bits)
        ]
    )
    # hash each token ONCE (the fold's per-bit lambda reads the element
    # hash, never recomputes xxhash64 per bit lane)
    hashes = F.transform(F.col("__toks"), lambda t: F.xxhash64(t))
    sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    # summing distinct powers of two equals the bitwise OR, with no ANSI
    # overflow (the sign-bit mask is negative, matching the old shiftleft)
    sig = F.aggregate(
        F.zip_with(
            sums,
            masks,
            lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    return base.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 32, max_hamming: int = 3
) -> DataFrame:
    """Candidate near-dup pairs with Hamming distance ≤ max_hamming, found by
    banding the signature into (max_hamming+1) blocks (pigeonhole: any pair
    within distance shares ≥1 exact block) then verifying with bit_count."""
    # one row per doc, two longs — materialize once for the collapse and
    # the representative block join (else the token explode + bit-sum agg
    # re-runs per consumer)
    sig = simhash_signatures(df, id_col, text_col, bits=bits).localCheckpoint(
        eager=True
    )
    nblocks = max_hamming + 1
    block_bits = bits // nblocks

    def _rep_block_pairs(reps: DataFrame) -> DataFrame:
        # r15: reps arrives with the simhash carry column attached
        # (collapse_pairs_by_signature), so the old left-semi join back
        # to the signature frame is gone
        blocks = reps.select(
            "doc_id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("blk_idx"),
                            F.shiftright(F.col("simhash"), i * block_bits)
                            .bitwiseAND(F.lit((1 << block_bits) - 1))
                            .alias("blk"),
                        )
                        for i in range(nblocks)
                    ]
                )
            ).alias("bb"),
        ).select("doc_id", "simhash", "bb.blk_idx", "bb.blk")
        a = blocks.alias("a")
        b = blocks.alias("b")
        return (
            a.join(
                b,
                (F.col("a.blk_idx") == F.col("b.blk_idx"))
                & (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("rep_a"),
                F.col("b.doc_id").alias("rep_b"),
                F.col("a.simhash").alias("sig_a"),
                F.col("b.simhash").alias("sig_b"),
            )
            .distinct()
            .withColumn(
                "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            )
            .filter(F.col("hamming") <= max_hamming)
            .select("rep_a", "rep_b", "hamming")
        )

    # identical simhash ⇒ hamming 0 for every same-signature pair
    return collapse_pairs_by_signature(
        sig, "doc_id", "simhash", _rep_block_pairs, intra_extras={"hamming": F.lit(0)}
    )


def simhash_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 64,
    blocks: int = 8,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """SimHash-blocked near-dup pairs verified with exact Jaccard.

    Same blocking as :func:`simhash_near_dups` (pairs sharing ≥1 exact
    signature block are candidates — pigeonhole-complete for Hamming
    distance < ``blocks``) but the verification step is exact n-gram
    Jaccard instead of Hamming distance, so the output is a property of
    the *text* alone: the set of pairs with Jaccard ≥ threshold that the
    blocking surfaces.  With blocks=8 over 64 bits, candidates cover all
    pairs within Hamming 7 — near-dups at Jaccard ≥ 0.8 sit well inside
    that, making the output equal to the exact threshold join (which is
    what the SQL oracle computes).  Returns (id_a, id_b, jaccard)."""
    sig = simhash_signatures(df, id_col, text_col, bits=bits)
    block_bits = bits // blocks
    mask = F.lit((1 << block_bits) - 1) if block_bits < 64 else F.lit(-1)
    blocked = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk_idx"),
                        F.shiftright(F.col("simhash"), i * block_bits)
                        .bitwiseAND(mask)
                        .alias("blk"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.blk_idx", "bb.blk")
    cand = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard_pairs(cand, df, id_col, text_col, n=n, threshold=threshold)


# -- exact-substring (span) deduplication -----------------------------------


def duplicate_span_starts(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 50
) -> DataFrame:
    """(doc_id, pos) of every duplicated k-token span occurrence EXCEPT its
    globally-first copy (kept occurrence = smallest (doc_id, pos)).

    The exact-substring method of Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better"), re-expressed relationally: instead
    of a suffix array, every k-gram occurrence keyed by the gram, ranked by
    (doc_id, pos), rank >= 2 marked for removal.

    Scale design: a pre-aggregated gram->count table filters the occurrence
    stream to grams that actually repeat BEFORE the rank window, so the
    expensive per-gram ordering only ever sees duplicated grams (tiny for a
    mostly-clean corpus) — the corpus-wide exchange is one map-side-combined
    groupBy plus one join keyed on the gram hash.
    """
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    num = F.greatest(F.size("__toks") - F.lit(k - 1), F.lit(0))
    parts = [F.slice("__toks", i, num) for i in range(1, k + 1)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda a, b: F.concat_ws(" ", a, b))
    # gram occurrences with their 0-based start positions; hash the gram
    # immediately so the exchanges carry an 8-byte key, not a k-token string
    occ = base.select(
        "doc_id", F.posexplode(acc).alias("pos", "__gram")
    ).select("doc_id", "pos", F.xxhash64("__gram").alias("gh"))
    repeated = (
        occ.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("gh")
    )
    dup_occ = occ.join(repeated, on="gh")
    # "every occurrence but the globally-first" = min-struct + inequality,
    # not a rank window: a boilerplate gram repeated 10M times would make
    # one task sort 10M rows; min() partial-combines map-side and the
    # join-back streams linearly
    firsts = dup_occ.groupBy("gh").agg(
        F.min(F.struct("doc_id", "pos")).alias("__first")
    )
    return (
        dup_occ.join(firsts, on="gh")
        .filter(F.struct("doc_id", "pos") != F.col("__first"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"))
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 50
) -> DataFrame:
    """Cut every duplicated k-token span (keeping its globally-first copy)
    out of each document: (id, clean_text, n_removed_tokens).

    A token is removed when ANY removal-start s covers it (s <= pos < s+k);
    overlapping spans merge naturally.  The rebuild is pure array
    expressions over a per-doc sorted start list — the only exchanges are
    the span detection above plus one left join of the (small) start lists
    back onto the corpus by id.
    """
    starts = (
        duplicate_span_starts(df, id_col, text_col, k=k)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__starts"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    joined = base.join(starts, on="doc_id", how="left")
    sts = F.coalesce(F.col("__starts"), F.array().cast("array<long>"))
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            sts, lambda s: (s <= i) & (i < s + F.lit(k))
        ),
    )
    return joined.select(
        F.col("doc_id").alias(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed_tokens"),
    )


# -- Corpus-level dedup -----------------------------------------------------


def corpus_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Corpus-level near-duplicate removal — the "give me the deduplicated
    training set" operator (reference deduplicate at table.py-level keeps
    latest per key; this is the document-collection analogue used by
    C4/RefinedWeb-style pipelines).

    MinHash-LSH candidate pairs, exact-Jaccard verified at ``threshold``,
    connected-componented (duplicate clusters are transitive: A≈B≈C is one
    group even when jaccard(A,C) dips under the threshold), then the
    smallest id of each component survives.

    Returns (id_col, canon, kept): ``canon`` = the surviving exemplar's id
    (itself for unique docs), ``kept`` = whether this row stays.  Filter on
    ``kept`` for the deduplicated corpus; group by ``canon`` for duplicate
    clusters.

    Scale path: banded equi-join candidates (never all-pairs), per-pair
    verification joins, and O(component-diameter) label-propagation rounds
    — duplicate clusters are near-cliques, so diameter is tiny.
    """
    from pathwaydataframework_spark.operators.graphs import connected_components

    pairs = minhash_lsh_pairs(
        df,
        id_col,
        text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
    )
    labels = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    canon = F.coalesce(F.col("component"), F.col(id_col))
    return (
        df.select(F.col(id_col))
        .join(
            labels.select(F.col("vertex").alias(id_col), "component"),
            on=id_col,
            how="left",
        )
        .select(
            F.col(id_col),
            canon.alias("canon"),
            (canon == F.col(id_col)).alias("kept"),
        )
    )


def dedup_lines_global(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
) -> DataFrame:
    """Global line-level exact dedup (the C4/RefinedWeb move: one copy of
    every repeated line survives ACROSS the whole corpus — boilerplate
    navigation, cookie banners, repeated headers collapse to their first
    occurrence).

    "First" = smallest (id, line-index) lexicographically, so the result
    is insertion-order deterministic.  Blank/whitespace lines are
    structure, not content — always kept.  Documents whose every line is
    removed survive with ``clean_text = ''``.

    Returns (id_col, clean_text, n_removed_lines).

    Scale path: explode → per-line MIN-AGGREGATION (not a rank window:
    min_by partial-combines map-side, so a boilerplate line repeated 10M
    times collapses inside each task before the exchange — the classic
    hot-line skew never reaches one reducer) → reassemble keyed by
    document.  Blank lines skip the line exchange entirely.  NULL text
    behaves as the empty document (clean_text = '', n_removed_lines = 0).
    """
    return _line_dedup_core(df, id_col, text_col, sep)


def _line_dedup_core(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str,
    seen_lines: DataFrame | None = None,
) -> DataFrame:
    """Shared engine behind :func:`dedup_lines_global` (seen_lines=None)
    and :func:`incremental_line_dedup` (seen_lines = a persisted
    :func:`line_index` frame): explode → optional corpus anti-join →
    per-line min-struct keep → reassemble.  One implementation, so the
    keep rule, blank handling, and accounting can never diverge between
    the batch and incremental paths."""
    import re as _re

    pat = _re.escape(sep)
    # NULL text behaves as the empty document (one blank line) so the
    # accounting columns stay non-NULL
    base = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )
    ex = base.select(
        "_id", F.posexplode(F.split(F.col("_t"), pat)).alias("_idx", "_line")
    )
    blank = F.trim(F.col("_line")) == ""
    content = ex.filter(~blank)
    if seen_lines is not None:
        content = content.join(
            seen_lines.select(F.col("line").alias("_line")), on="_line", how="left_anti"
        )
    # the surviving copy IS the per-line minimum (id, idx) — no need to
    # rank every occurrence, the min-agg's map-side combine absorbs skew
    kept_content = (
        content.groupBy("_line")
        .agg(F.min(F.struct("_id", "_idx")).alias("_first"))
        .select(
            F.col("_first._id").alias("_id"),
            F.col("_first._idx").alias("_idx"),
            "_line",
        )
    )
    kept = kept_content.unionByName(ex.filter(blank))
    reassembled = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    # r14: project the doc side to (_id, line count) BEFORE the join —
    # the full text was only ever read for size(split(...)), and carrying
    # it through the _id exchange shuffled the whole corpus body a second
    # time just to count its lines (guide §2.3: project before the
    # exchange)
    base_counts = base.select(
        "_id", F.size(F.split(F.col("_t"), pat)).alias("_n_lines")
    )
    return (
        base_counts.join(reassembled, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("_n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed_lines"),
        )
    )


def line_index(
    df: DataFrame, *, text_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """Distinct non-blank lines of a corpus as a single-column ``line``
    frame — the persistable artifact :func:`incremental_line_dedup`
    matches against (write to parquet once; the multimodal analogue is
    ``fingerprint_index``)."""
    import re as _re

    return (
        df.select(F.explode(F.split(F.col(text_col), _re.escape(sep))).alias("line"))
        .filter(F.trim(F.col("line")) != "")
        .distinct()
    )


def incremental_line_dedup(
    new_docs: DataFrame,
    seen_lines: DataFrame,
    *,
    id_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """Line-dedup an incoming batch AGAINST a persisted corpus line set —
    the continuous-ingest form of :func:`dedup_lines_global`: a line
    survives when it is blank, or when it is both absent from
    ``seen_lines`` (a :func:`line_index` frame) and the batch's first
    occurrence.  Only the batch explodes; corpus cost is the stored index.

    After each batch, append ``line_index(kept_docs, text_col='clean_text')``
    to the persisted index so later batches see this batch's lines.
    Returns (id_col, clean_text, n_removed_lines).
    """
    return _line_dedup_core(new_docs, id_col, text_col, sep, seen_lines=seen_lines)


# -- Bloom-filter exact dedup (BFF-style) ------------------------------------


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing: (m_bits, k) for ``expected_items`` keys at
    ``fpp`` false-positive rate — m = -n·ln p / ln²2, k = (m/n)·ln 2.
    10⁹ keys at 1% → ~1.2 GB of bitmap: one summary row set per ~100 TB
    corpus, reusable across every incremental batch."""
    import math

    if expected_items < 1:
        raise ValueError(f"expected_items must be >= 1, got {expected_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _bloom_positions(key: Column, m_bits: int, k: int, seed: int) -> Column:
    """Array of k bit positions in [0, m_bits) for a key — xxhash64 with
    k distinct salt columns, all JVM-side."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(seed * 131 + i)), F.lit(m_bits))
            for i in range(k)
        ]
    )


def build_bloom_index(
    df: DataFrame, key_col: str, *, m_bits: int = 1 << 22, k: int = 5, seed: int = 0
) -> DataFrame:
    """Summarize a corpus's keys into a Bloom bitmap FRAME:
    ``(word long, bits long)`` — word w holds bits [64w, 64w+64) packed by
    a ``bit_or`` aggregate.  At most m_bits/64 rows regardless of corpus
    size (2²² bits → 65 536 rows), so the index broadcasts; persist it
    with ``.write.parquet`` and it becomes the incremental-dedup state the
    next batch probes without touching the historical corpus (the same
    persistable-index pattern as :func:`line_index` /
    :func:`minhash_band_index`).

    One corpus scan, one m/64-key hash-agg (map-side combined) — the only
    pass over history a BFF-style pipeline ever pays."""
    pos = F.explode(_bloom_positions(F.col(key_col), m_bits, k, seed))
    return (
        _ensure_parallelism(df)
        .select(pos.alias("__pos"))
        .select(
            F.expr("__pos div 64").alias("word"),
            F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("__bit").alias("bits"))
    )


def update_bloom_index(
    index: DataFrame,
    batch: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 22,
    k: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Fold a new batch's keys into an existing Bloom bitmap frame —
    the per-micro-batch state update of streaming incremental dedup
    (foreachBatch: ``bloom_dedup`` against the index, then
    ``update_bloom_index`` and persist — the same
    dedup-then-extend-the-index loop as :func:`incremental_line_dedup`).
    Bloom bitmaps are unions: OR the word lanes.  Cost is one agg over
    the BATCH plus a ≤ m/64-row merge — history is never touched.
    Parameters must match the index's build parameters."""
    delta = build_bloom_index(batch, key_col, m_bits=m_bits, k=k, seed=seed)
    return (
        index.unionByName(delta)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_dedup(
    new_df: DataFrame,
    seen_df: DataFrame | None,
    key_col: str,
    *,
    index: DataFrame | None = None,
    m_bits: int = 1 << 22,
    k: int = 5,
    seed: int = 0,
    exact_confirm: bool = True,
) -> DataFrame:
    """Drop rows of ``new_df`` whose key already exists in the seen corpus
    — the Bloom-filter dedup of Dolma's BFF, Spark-shaped.  EXACT output
    by default: the Bloom bitmap only *prunes* (rows whose keys miss any
    of the k probe bits are provably unseen and skip the join entirely);
    candidates are then confirmed against the real corpus, so false
    positives never delete data.  ``exact_confirm=False`` gives the
    classic probabilistic BFF (drop every candidate; ~fpp of unseen rows
    lost — size with :func:`bloom_params`).

    Plan at 100 TB: the bitmap frame (≤ m/64 rows) broadcasts to the
    batch probe — the historical corpus is NOT scanned per batch when a
    prebuilt ``index`` is passed.  With exact_confirm, the (small)
    candidate key set broadcasts INTO the corpus scan as a semi-join
    filter, and the confirmed-duplicate keys broadcast back as an
    anti-join — ONE history scan (for the confirm), never shuffled, and
    every exchange batch-proportional.  Note the convenience path
    (``seen_df`` with no prebuilt ``index``) scans history TWICE — once
    to build the bitmap, once to confirm; at scale, build the index once
    with :func:`build_bloom_index`, persist it, and pass it here.
    """
    if index is None:
        if seen_df is None:
            raise ValueError("pass either seen_df or a prebuilt index")
        index = build_bloom_index(seen_df, key_col, m_bits=m_bits, k=k, seed=seed)
    key = F.col(key_col)
    probes = (
        new_df.select(key.alias("__key")).distinct()
        .select(
            "__key",
            F.explode(_bloom_positions(F.col("__key"), m_bits, k, seed)).alias(
                "__pos"
            ),
        )
        .select("__key", F.expr("__pos div 64").alias("word"), "__pos")
        .join(F.broadcast(index), on="word", how="left")
        .select(
            "__key",
            F.expr(
                "coalesce((shiftrightunsigned(bits, cast(__pos % 64 as int)) & 1)"
                " = 1, false)"
            ).alias("__hit"),
        )
    )
    cand = (
        probes.groupBy("__key")
        .agg(F.min(F.col("__hit").cast("int")).alias("__all_hit"))
        .filter(F.col("__all_hit") == 1)
        .select("__key")
    )
    if exact_confirm:
        if seen_df is None:
            raise ValueError("exact_confirm requires seen_df")
        confirmed = (
            seen_df.select(key.alias("__key"))
            .join(F.broadcast(cand), on="__key", how="leftsemi")
            .distinct()
        )
        drop_keys = confirmed
    else:
        drop_keys = cand
    return new_df.join(
        F.broadcast(drop_keys), on=new_df[key_col] == drop_keys["__key"], how="left_anti"
    )
