"""Deterministic sampling for training-data pipelines.

The reference engine has no sampling operators; a 100 TB curation
pipeline cannot live without them (held-out splits, per-language
rebalancing, source mixing).  Everything here is *hash-deterministic*:
membership depends only on (key, seed), never on partitioning, executor
count, or row order — so a sample is reproducible across runs, resumable
after failure, and exactly verifiable by an external SQL oracle.

Mechanism: the first 8 hex chars of ``md5(key || ':' || seed)`` are a
uniform 32-bit bucket; a row is kept when ``bucket < fraction · 2³²``.
md5 is bit-identical across engines (Spark, DuckDB, Python), unlike
xxhash64/murmur whose seeds differ — that cross-engine parity is the
whole point of choosing it here.  The filter is a pure column predicate:
no shuffle, no sort, pushed to the scan, linear at any scale.

>>> from pathwaydataframework_spark.operators import sampling
>>> docs = spark.range(1000).withColumnRenamed("id", "doc_id")
>>> s = sampling.hash_sample(docs, "doc_id", 0.25, seed=7)
>>> 180 < s.count() < 320            # ~250 expected, binomial spread
True
>>> s2 = sampling.hash_sample(docs, "doc_id", 0.25, seed=7)
>>> s.exceptAll(s2).count()          # deterministic: same sample again
0
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_BUCKETS = 1 << 32  # 8 hex chars


def hash_bucket(key: Column, seed: int = 0) -> Column:
    """Uniform [0, 2³²) bucket from md5(key:seed) — the cross-engine
    deterministic randomness primitive (DuckDB:
    ``('0x' || substr(md5(key || ':seed'), 1, 8))::BIGINT``).

    NULL keys yield a NULL bucket (``concat``, not ``concat_ws``, so the
    NULL propagates): a NULL key cannot be deterministically bucketed, so
    it is EXCLUDED by every sampling predicate — exactly matching the SQL
    replica, where ``NULL || ':seed'`` is NULL."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _BUCKETS)


def _snap(x: float) -> float:
    """Clamp a cumulative fraction to [0, 1], absorbing float-accumulation
    error near 1.0 (ten 0.1s sum to 0.9999999999999999 — without the snap
    the top hash bucket would belong to no split)."""
    x = min(x, 1.0)
    return 1.0 if abs(x - 1.0) < 1e-9 else x


def cumulative_bounds(fractions: Mapping[str, float]) -> list[tuple[str, int, int]]:
    """(name, lo, hi) integer bucket bounds for :func:`split` — exposed so
    the SQL oracle derives the IDENTICAL thresholds."""
    out = []
    lo = 0.0
    for name, frac in fractions.items():
        hi = lo + frac
        out.append((name, _threshold(_snap(lo)), _threshold(_snap(hi))))
        lo = hi
    return out


def hash_sample(
    df: DataFrame, key: str, fraction: float, *, seed: int = 0
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df
    return df.filter(hash_bucket(F.col(key), seed) < F.lit(_threshold(fraction)))


def split(
    df: DataFrame, key: str, fractions: Mapping[str, float], *, seed: int = 0
) -> dict[str, DataFrame]:
    """Disjoint deterministic splits (e.g. train/val/test).  Fractions must
    sum to ≤ 1; each row lands in at most one split, by hash range."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = hash_bucket(F.col(key), seed)
    return {
        name: df.filter((b >= F.lit(lo)) & (b < F.lit(hi)))
        for name, lo, hi in cumulative_bounds(fractions)
    }


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: Mapping[str, float],
    *,
    default: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages:
    ``{"en": 0.1, "de": 0.5, "fr": 1.0}``).  The per-stratum threshold is
    a CASE expression — still a pure scan-side predicate, no join."""
    thr = F.lit(_threshold(default))
    for value, frac in fractions.items():
        thr = F.when(F.col(strata_col) == F.lit(value), F.lit(_threshold(frac))).otherwise(thr)
    return df.filter(hash_bucket(F.col(key), seed) < thr)


def deterministic_shuffle(df: DataFrame, key: str, *, seed: int = 0) -> DataFrame:
    """Global pseudorandom permutation with explicit ``position`` column —
    the epoch shuffle of a training-data pipeline, reproducible across
    runs, engines and cluster sizes.

    Order is ``md5(key:seed)`` ascending (tie-break on the key), so a SQL
    oracle replays it exactly with ``row_number() OVER (ORDER BY md5(...))``.
    Positions are computed WITHOUT a global sort or single-partition
    window: the first two hex chars give 256 shards that are MONOTONE in
    the order (a fixed-width prefix of the hex string preserves
    lexicographic order), so ``position = shard_offset +
    rank_within_shard`` where the shard offsets are an exclusive prefix
    sum over 256 shard counts (tiny frame, broadcast back).  The
    per-shard rank window runs with 256-way parallelism — the same
    layout trick as
    :func:`~pathwaydataframework_spark.operators.packing.pack_by_offset`.
    At 100 TB, widen to 4 hex chars (65 536 shards) if 1/256th of the
    data outgrows an executor's sort buffer.

    Rows with a NULL key are excluded (cannot be deterministically
    placed), like every sampling predicate in this module.

    >>> from pathwaydataframework_spark.operators import sampling
    >>> docs = spark.range(100).withColumnRenamed("id", "doc_id")
    >>> s = sampling.deterministic_shuffle(docs, "doc_id", seed=3)
    >>> sorted(r["position"] for r in s.collect()) == list(range(100))
    True
    >>> s.orderBy("position").first()["doc_id"] == \\
    ...     sampling.deterministic_shuffle(docs, "doc_id", seed=3) \\
    ...     .orderBy("position").first()["doc_id"]
    True
    """
    out = _sharded_running_total(df, key, seed=seed, weight=F.lit(1))
    return out.withColumn("position", (F.col("__total") - 1).cast("long")).drop(
        "__total"
    )


def _sharded_running_total(
    df: DataFrame,
    key: str,
    *,
    seed: int,
    weight: Column,
    grp: Sequence[str] = (),
    seed_col: Column | None = None,
) -> DataFrame:
    """Inclusive running total of ``weight`` in ``md5(key:seed)`` order
    (tie-break on the key), per ``grp`` group, added as ``__total`` —
    the shared layout engine of :func:`deterministic_shuffle`
    (weight=1 → position) and :func:`token_budget_sample`
    (weight=tokens → budget cut).

    No global sort and no single-partition window: the first two hex
    chars of the hash give 256 shards MONOTONE in the order (a
    fixed-width hex prefix preserves lexicographic order), per-group ×
    per-shard partial sums prefix-sum into shard offsets (tiny frame,
    broadcast back — joined NULL-SAFELY on the group columns so a NULL
    group is a real group, matching SQL window semantics), and the
    in-shard running sum is a 256-way-parallel window.  At 100 TB widen
    to 4 hex chars (65 536 shards) if 1/256th of the data outgrows an
    executor's sort buffer — one change, both callers inherit it.

    Rows with a NULL key are excluded (cannot be deterministically
    ordered), like every sampling predicate in this module.

    ``seed_col`` (a Column) overrides ``seed`` with a PER-ROW seed —
    the hash becomes ``md5(key:seed_col)``, byte-identical to the
    per-call form when ``seed_col`` holds the integer a separate call
    would have passed as ``seed``.  This is what lets a multi-epoch
    loader compute every epoch's permutation in one plan
    (:func:`~pathwaydataframework_spark.operators.packing.read_packed_epochs`)
    instead of one plan per (epoch, rank): put the epoch number in
    ``grp`` so offsets and running sums stay epoch-scoped.
    """
    from functools import reduce
    from operator import and_

    from pyspark.sql import Window as W

    grp = list(grp)
    if seed_col is not None:
        h = F.md5(
            F.concat(F.col(key).cast("string"), F.lit(":"), seed_col.cast("string"))
        )
    else:
        h = F.md5(F.concat(F.col(key).cast("string"), F.lit(f":{seed}")))
    hashed = (
        df.filter(F.col(key).isNotNull())
        .withColumn("__h", h)
        .withColumn(
            "__shard", F.conv(F.substring(F.col("__h"), 1, 2), 16, 10).cast("int")
        )
        .withColumn("__w", weight.cast("long"))
    )
    counts = hashed.groupBy(*grp, "__shard").agg(F.sum("__w").alias("__n"))
    offsets = counts.withColumn(
        "__off",
        F.sum("__n").over(
            W.partitionBy(*grp)
            .orderBy("__shard")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
    ).select(
        *[F.col(g).alias(f"__g{i}") for i in range(len(grp)) for g in [grp[i]]],
        "__shard",
        F.coalesce("__off", F.lit(0)).alias("__off"),
    )
    offsets = offsets.withColumnRenamed("__shard", "__shard_o")
    cond = [hashed["__shard"] == offsets["__shard_o"]] + [
        hashed[g].eqNullSafe(offsets[f"__g{i}"]) for i, g in enumerate(grp)
    ]
    run = F.sum("__w").over(
        W.partitionBy(*grp, "__shard")
        .orderBy(F.col("__h"), F.col(key))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = (
        hashed.withColumn("__run", run)
        .join(F.broadcast(offsets), on=reduce(and_, cond))
        .withColumn("__total", (F.col("__off") + F.col("__run")).cast("long"))
        .drop(
            "__h", "__shard", "__shard_o", "__run", "__off", "__w",
            *[f"__g{i}" for i in range(len(grp))],
        )
    )
    return out


def mix_datasets(
    sources: Mapping[str, DataFrame],
    rates: Mapping[str, float],
    key: str,
    *,
    seed: int = 0,
    tag_col: str = "_pw_source",
) -> DataFrame:
    """Weighted dataset mixing: sample each source at its rate and union,
    tagging provenance.  The deterministic-hash property makes the mix
    reproducible epoch to epoch; upsampling (rate > 1) keeps whole copies
    plus a fractional deterministic remainder.  The sampling key is
    source-tagged (``name/key``) so sources sharing an id space draw
    INDEPENDENT subsets instead of the same correlated one."""
    if not sources:
        raise ValueError("no sources")
    unknown = set(rates) - set(sources)
    if unknown:
        # a typo'd rate key would otherwise silently leave its source at 1.0
        raise ValueError(f"rates for unknown sources: {sorted(unknown)}")
    for name, r in rates.items():
        # a negative rate would silently drop its source (0 copies + a
        # never-true fractional test); NaN likewise slips every branch
        if not (r == r) or r < 0:
            raise ValueError(f"rate for {name!r} must be >= 0, got {r}")
    parts = []
    for name, src in sources.items():
        rate = rates.get(name, 1.0)
        whole, frac = int(rate), rate - int(rate)
        for i in range(whole):
            parts.append(src.withColumn(tag_col, F.lit(name)))
        if frac > 0:
            tagged_key = F.concat(F.lit(f"{name}/"), F.col(key).cast("string"))
            kept = src.filter(
                hash_bucket(tagged_key, seed) < F.lit(_threshold(frac))
            )
            parts.append(kept.withColumn(tag_col, F.lit(name)))
    if not parts:  # every rate was 0 — a valid (empty) mix
        first = next(iter(sources.values()))
        return first.filter(F.lit(False)).withColumn(tag_col, F.lit(None).cast("string"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def temperature_sample(
    df: DataFrame,
    key: str,
    source_col: str,
    *,
    alpha: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-LM data move,
    Conneau et al. 2019 arXiv:1911.02116 §3.1): resample so source
    proportions follow p_s^alpha instead of the natural p_s, flattening
    head sources without replicating the tail.

    Downsample-only: acceptance rate r_s = (n_min / n_s)^(1-alpha), so the
    smallest source keeps everything, the largest is squeezed hardest, and
    expected output counts are proportional to n_s^alpha.  alpha=1 is the
    natural distribution (no-op), alpha=0 targets uniform.

    Determinism: the keep decision is md5-bucket < floor(r_s * 2^32), the
    same cross-engine primitive as every sampler here.  At alpha in
    {0, 0.5, 1} every step (divide, sqrt, multiply, floor) is IEEE
    correctly-rounded, so thresholds are bit-identical in any engine;
    other alphas go through pow(), whose last-ulp can differ across libm
    builds (flips a threshold only when r_s*2^32 sits within ~1e-7 of an
    integer).

    Plan: one per-source count aggregation, a 1-row global min, a
    broadcast rate join, then a scan-side filter — the corpus itself never
    shuffles.
    """
    if not (alpha == alpha) or not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if alpha == 1.0:
        # the natural distribution is a true no-op — return df unchanged
        # (the rate join would uselessly drop NULL-source/NULL-key rows
        # and cost two jobs), matching hash_sample's fraction>=1 shortcut
        return df
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    ratio = F.col("_nmin").cast("double") / F.col("_n").cast("double")
    if alpha == 0.5:
        rate = F.sqrt(ratio)  # correctly-rounded — cross-engine exact
    elif alpha == 0.0:
        rate = ratio
    else:
        rate = F.pow(ratio, F.lit(1.0 - float(alpha)))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        source_col, F.floor(rate * F.lit(float(_BUCKETS))).cast("long").alias("_thr")
    )
    return (
        df.join(F.broadcast(rates), on=source_col)
        .filter(hash_bucket(F.col(key), seed) < F.col("_thr"))
        .drop("_thr")
    )


def quality_binned_sample(
    df: DataFrame,
    key: str,
    score_col: str,
    *,
    edges: Sequence[float],
    rates: Sequence[float],
    seed: int = 0,
) -> DataFrame:
    """Curriculum / quality-weighted sampling: bin rows by a score column
    against explicit ``edges`` thresholds, keep each bin at its own rate.

    ``edges`` of length B-1 split scores into B ordered bins
    (bin i = scores in [edges[i-1], edges[i]));  ``rates`` has one keep
    fraction per bin.  The standard move for upsampling high-quality text
    while keeping a trickle of the tail.

    Pure scan-side predicate like every sampler here: bin assignment is a
    CASE chain, membership is the md5-hash threshold — zero exchanges, so
    at 100 TB the sample IS the scan.  Adds a ``quality_bin`` column.
    """
    if len(rates) != len(edges) + 1:
        raise ValueError(
            f"need len(edges)+1 rates, got {len(rates)} rates / {len(edges)} edges"
        )
    for r in rates:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rates must be in [0, 1], got {r}")
    if list(edges) != sorted(edges):
        raise ValueError("edges must be ascending")
    s = F.col(score_col)
    # NULL (and NaN) scores cannot be binned — exclude them, matching the
    # NULL-key exclusion of every other sampler here (otherwise every
    # 's < edge' WHEN falls through and NULLs land in the TOP bin)
    df = df.filter(s.isNotNull())
    if dict(df.dtypes).get(score_col) in ("double", "float"):
        df = df.filter(~F.isnan(s))
    bin_expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        bin_expr = F.when(s < F.lit(float(edges[i])), F.lit(i)).otherwise(bin_expr)
    thr = F.lit(_threshold(rates[-1]))
    for i in range(len(edges) - 1, -1, -1):
        thr = F.when(s < F.lit(float(edges[i])), F.lit(_threshold(rates[i]))).otherwise(thr)
    return df.withColumn("quality_bin", bin_expr.cast("long")).filter(
        hash_bucket(F.col(key), seed) < thr
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 8192,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023
    arXiv:2302.03169): pick the k corpus documents whose hashed-unigram
    distribution looks most like ``target``, by Gumbel-top-k over
    importance weights — the public recipe for "find me more data like my
    high-quality set" at pretraining scale.

    - **Features**: lowercased tokens hashed into ``buckets`` via the
      md5-bucket primitive (cross-engine deterministic).
    - **Models**: Laplace-smoothed bucket unigram models fit on target and
      corpus; log importance weight of a doc = Σ_tokens
      round(log p_t(b) − log p_s(b), 6), summed as exact decimals so
      partial-aggregation order cannot flip the 6th decimal.
    - **Resampling**: Gumbel-top-k (Gumbel noise + top-k IS sampling
      without replacement ∝ exp(logw)); the Gumbel uses the md5-bucket
      uniform u=(bucket+0.5)/2³², so the draw replays identically in any
      engine.  Sort key rounded to 6dp, ties broken by id.

    Returns the selected (rank, id, logw), rank 1..k.  Token-less docs
    have no tokens to weigh and are never candidates.

    Plan: two bucket-count aggregations (max ``buckets`` rows each), two
    driver scalars (token totals — one-time, like bm25's avgdl), a
    broadcast ratio join onto the exploded corpus, a doc-keyed sum, and a
    TakeOrderedAndProject for the top-k (never a global sort).
    """
    from pathwaydataframework_spark.operators.text import tokens

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")

    def featurize(df: DataFrame) -> DataFrame:
        toks = F.filter(
            tokens(F.lower(F.trim(F.col(text_col)))), lambda t: F.length(t) > 0
        )
        return df.select(
            F.col(id_col).alias("_id"), F.explode(toks).alias("_term")
        ).withColumn("_b", hash_bucket(F.col("_term"), seed) % F.lit(buckets))

    # NOT checkpointed: the exploded token table is corpus-scale — cheaper
    # to re-derive from the column-pruned scan (twice) than to materialize
    # tokens x docs to executor disk.  Only the tiny count tables persist.
    corpus_feats = featurize(corpus)
    s_counts = corpus_feats.groupBy("_b").agg(F.count(F.lit(1)).alias("_cs"))
    t_counts = featurize(target).groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    s_counts = s_counts.localCheckpoint(eager=True)
    t_counts = t_counts.localCheckpoint(eager=True)
    # token totals folded into the ratio job as a broadcast 1-row frame (the
    # aggs read the tiny checkpointed count tables) — no driver collects
    totals = (
        s_counts.agg(F.coalesce(F.sum("_cs"), F.lit(0)).alias("__ns"))
        .crossJoin(t_counts.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("__nt")))
    )
    # every corpus token's bucket has _cs >= 1; target-absent buckets take
    # the smoothed floor (0+1)/(n_t+buckets)
    ratio = (
        s_counts.join(t_counts, on="_b", how="left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.round(
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(1))
                    / (F.col("__nt") + F.lit(buckets)).cast("double")
                )
                - F.log(
                    (F.col("_cs") + F.lit(1))
                    / (F.col("__ns") + F.lit(buckets)).cast("double")
                ),
                6,
            ).alias("_lr"),
        )
    )
    scores = (
        corpus_feats.join(F.broadcast(ratio), on="_b")
        .withColumn("_lrd", F.col("_lr").cast("decimal(18,9)"))
        .groupBy("_id")
        .agg(F.round(F.sum("_lrd").cast("double"), 6).alias("logw"))
    )
    u = (hash_bucket(F.col("_id"), seed + 1) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    gumbel = -F.log(-F.log(u))
    keyed = scores.withColumn("_key", F.round(F.col("logw") + gumbel, 6))
    top = keyed.orderBy(F.col("_key").desc(), F.col("_id")).limit(k)
    from pyspark.sql import Window as _W

    return top.select(
        F.row_number()
        .over(_W.orderBy(F.col("_key").desc(), F.col("_id")))
        .cast("long")
        .alias("rank"),
        F.col("_id").alias(id_col),
        "logw",
    )


def leakage_safe_split(
    df: DataFrame,
    key: str,
    text_col: str,
    fractions: Mapping[str, float],
    *,
    seed: int = 0,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> dict[str, DataFrame]:
    """:func:`split`, but near-duplicate documents NEVER straddle a split
    boundary — the eval-contamination guard every pretraining pipeline
    needs: a test document whose near-copy sits in train leaks the answer.

    Mechanism: near-dup components from
    :func:`~pathwaydataframework_spark.operators.dedup.corpus_dedup`
    (MinHash-LSH pairs → connected components), then every member of a
    component is bucketed by its CANONICAL exemplar's hash — one draw per
    component, so the whole group lands on one side.  Unique docs ride
    their own id, identical to :func:`split`.

    Same determinism contract as every sampler here (md5 buckets,
    python-side integer thresholds).
    """
    from pathwaydataframework_spark.operators.dedup import corpus_dedup

    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    canon = corpus_dedup(
        df,
        key,
        text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
    ).select(key, "canon")
    joined = df.join(canon, on=key)
    b = hash_bucket(F.col("canon"), seed)
    return {
        name: joined.filter((b >= F.lit(lo)) & (b < F.lit(hi))).drop("canon")
        for name, lo, hi in cumulative_bounds(fractions)
    }


def assign_shards(
    df: DataFrame, key: str, *, rows_per_shard: int, seed: int = 0
) -> DataFrame:
    """Training-shard assignment — the final pipeline stage before export:
    a deterministic epoch shuffle (:func:`deterministic_shuffle`), then
    contiguous fixed-size shards by position.  Adds ``position``, ``shard``
    and ``pos_in_shard`` columns; write with
    ``.write.partitionBy('shard')`` for one file set per shard, each in
    reproducible shuffled order (WebDataset-style layout).

    Same determinism contract as the shuffle: shard membership and
    intra-shard order depend only on (key, seed), never on cluster
    topology — re-running the export on a different cluster byte-matches.
    """
    if rows_per_shard < 1:
        raise ValueError(f"rows_per_shard must be >= 1, got {rows_per_shard}")
    out = deterministic_shuffle(df, key, seed=seed)
    return out.withColumn(
        # integer floor-division, NOT float division cast to long: double
        # loses exactness past 2^53, so position/rows_per_shard could
        # misplace rows at extreme scale — `div` stays exact on longs
        "shard", F.expr(f"position div {int(rows_per_shard)}")
    ).withColumn(
        "pos_in_shard", (F.col("position") % F.lit(rows_per_shard)).cast("long")
    )


def token_budget_sample(
    df: DataFrame,
    key: str,
    tokens_col: str,
    *,
    budget: int,
    by: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Token-budget truncation — the "N tokens of source X" step of a
    training-data recipe: order the corpus deterministically
    (md5(key:seed), the same order :func:`deterministic_shuffle` uses)
    and keep the prefix whose RUNNING TOKEN TOTAL stays ≤ budget, per
    ``by`` group (source/language) or globally.  A document that would
    cross the budget is dropped, as is everything after it — so the kept
    set is a contiguous prefix of the shuffle order: reproducible across
    runs, engines and cluster sizes, and exactly SQL-replayable
    (``sum(tokens) OVER (ORDER BY md5 ...) <= budget``).

    No global sort and no single-partition window: delegates to
    :func:`_sharded_running_total` (the :func:`deterministic_shuffle`
    layout engine with SUM(tokens) instead of COUNT; NULL ``by`` values
    form a real group, null-safely, matching the SQL window replica).
    Adds a ``cum_tokens`` column (the running total including the row
    itself).

    Rows with a NULL key are excluded (cannot be deterministically
    ordered), like every sampling predicate in this module.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    grp = [by] if by is not None else []
    out = _sharded_running_total(
        df, key, seed=seed, weight=F.col(tokens_col), grp=grp
    )
    return out.withColumnRenamed("__total", "cum_tokens").filter(
        F.col("cum_tokens") <= budget
    )


def per_key_topk(
    df: DataFrame,
    key: str,
    order_col: str,
    *,
    k: int,
    descending: bool = True,
    tie_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per key with a ``rank`` column (1-based) — the
    per-site quota of a crawl pipeline: keep the k best documents per
    registrable domain, cap any one host's share of the corpus.

    Plan note (measured — scripts/skew_topk_spotcheck.py): a rank-window
    over a content key looks like the textbook skew trap (one 10⁸-page
    hot domain sorting on one task), but Catalyst's InferWindowGroupLimit
    rule lowers ``row_number() <= k`` to a two-phase group limit on its
    own: a PARTIAL WindowGroupLimit below the exchange keeps at most k
    rows per key per input partition (map-side, so a hot key never ships
    more than k·numPartitions rows), and a FINAL one after.  The classic
    hand-salted two-phase rewrite adds an extra exchange and measured
    ~40% SLOWER even at 90% hot-key share (5M rows, local[32]) — so this
    is deliberately the single-window form; tests/test_plans.py pins the
    Partial WindowGroupLimit so a version/config change that loses the
    rewrite fails a test instead of a production job.  The rule only
    fires for k ≤ spark.sql.optimizer.windowGroupLimitThreshold (default
    1000) — pass a larger k and you own the skew again.

    Pass ``tie_col`` whenever order values can repeat — it makes the
    ordering total, so results (and the rank column) are deterministic
    and SQL-oracle-exact (``row_number() OVER (PARTITION BY key ORDER BY
    order DESC, tie)``)."""
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = W.partitionBy(key).orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
