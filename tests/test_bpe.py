"""BPE tokenizer: merge learning (Sennrich replay), both encode kernels,
the distributed distinct-word plan, and composition with sequence packing."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from pathwaydataframework_spark.data import load_table
from pathwaydataframework_spark.operators import bpe, packing
from pathwaydataframework_spark.operators.bpe import (
    _encode_longest,
    _encode_merges,
)

# -- pure-kernel unit tests (no Spark) ---------------------------------------


def test_learn_merges_classic_corpus(spark):
    # Sennrich's canonical example shape: 'low'x5 'lower'x2 'newest'x6
    # 'widest'x3.  Highest-count pairs merge first; ties go to the
    # lexicographically smallest pair.
    rows = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    merges = bpe.learn_bpe_merges(df, num_merges=4, min_pair_count=1)
    # hand-derived: es(9) -> est(9) -> lo(7) -> low(7)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_vocab_layout():
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    v = bpe.bpe_vocab(merges, alphabet="abcdefghijklmnopqrstuvwxyz")
    assert v["a"] == 0 and v["z"] == 25
    assert v["es"] == 26 and v["est"] == 27 and v["lo"] == 28
    # derived alphabet: only chars appearing in merges
    small = bpe.bpe_vocab(merges)
    assert set(small) == {"e", "s", "t", "l", "o", "es", "est", "lo"}


def test_longest_kernel_greedy_and_unk():
    v = bpe.bpe_vocab([("t", "h"), ("th", "e")], alphabet="the")
    # 'the' -> single longest token, not th+e
    assert _encode_longest("the", v, 3, -1) == [v["the"]]
    assert _encode_longest("teh", v, 3, -1) == [v["t"], v["e"], v["h"]]
    # unknown char emits unk and advances
    assert _encode_longest("txh", v, 3, -99) == [v["t"], -99, v["h"]]
    assert _encode_longest("", v, 3, -1) == []


def test_merges_kernel_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    v = bpe.bpe_vocab(merges, alphabet="abcdefghijklmnopqrstuvwxyz")
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_merges("lowest", ranks, v, -1) == [v["low"], v["est"]]
    # rank order matters: 'es' merges before 'lo' in 'loes'
    assert _encode_merges("loes", ranks, v, -1) == [v["lo"], v["es"]]
    # unmergeable word falls back to chars
    assert _encode_merges("ab", ranks, v, -1) == [v["a"], v["b"]]


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcdef", min_size=0, max_size=24),
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef", min_size=1, max_size=2),
            st.text(alphabet="abcdef", min_size=1, max_size=2),
        ),
        max_size=8,
    ),
)
def test_longest_kernel_roundtrip_property(word, merges):
    """Greedy longest-match over a vocab containing every base char is a
    lossless segmentation: decoding the ids re-concatenates the word,
    and each emitted token IS the longest vocab prefix at its position."""
    v = bpe.bpe_vocab(merges, alphabet="abcdef")
    inv = {i: t for t, i in v.items()}
    max_len = max(len(t) for t in v)
    ids = _encode_longest(word, v, max_len, -1)
    assert -1 not in ids
    toks = [inv[i] for i in ids]
    assert "".join(toks) == word
    pos = 0
    for t in toks:
        for j in range(len(t) + 1, min(max_len, len(word) - pos) + 1):
            assert word[pos : pos + j] not in v
        pos += len(t)


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abc", min_size=1, max_size=16),
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=2),
            st.text(alphabet="abc", min_size=1, max_size=2),
        ),
        max_size=6,
    ),
)
def test_merges_kernel_roundtrip_property(word, merges):
    v = bpe.bpe_vocab(merges, alphabet="abc")
    inv = {i: t for t, i in v.items()}
    ranks = {p: i for i, p in enumerate(merges)}
    ids = _encode_merges(word, ranks, v, -1)
    assert "".join(inv[i] for i in ids) == word


# -- distributed encode -------------------------------------------------------


def test_bpe_encode_modes_and_shape(spark):
    rows = [(0, "the fast table"), (1, ""), (2, "zz the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [("t", "h"), ("th", "e"), ("t", "a"), ("ta", "b"),
              ("l", "e"), ("tab", "le")]
    v = bpe.bpe_vocab(merges, alphabet="abcdefghijklmnopqrstuvwxyz")
    out = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in bpe.bpe_encode(df, v, mode="longest").collect()
    }
    assert out[0][0] == [
        v["the"], v["f"], v["a"], v["s"], v["t"], v["table"]
    ]
    assert out[1] == ([], 0)  # empty doc survives with an empty array
    assert out[0][1] == 6 and out[2][1] == 3
    # merges replay agrees on this vocab's own training-style words
    out_m = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe.bpe_encode(df, v, mode="merges", merges=merges).collect()
    }
    assert out_m[0] == out[0][0]


def test_bpe_encode_learned_roundtrip(spark, sf_dir):
    """Learn merges from the real documents table, encode with replay,
    and verify the segmentation is lossless against the source text."""
    docs = load_table(spark, sf_dir, "documents").df.limit(50)
    merges = bpe.learn_bpe_merges(docs, num_merges=30)
    assert len(merges) == 30
    v = bpe.bpe_vocab(merges, alphabet="abcdefghijklmnopqrstuvwxyz")
    inv = {i: t for t, i in v.items()}
    enc = bpe.bpe_encode(docs, v, mode="merges", merges=merges)
    joined = enc.join(docs.select("doc_id", "text"), on="doc_id")
    for r in joined.collect():
        decoded = "".join(inv[i] for i in r["token_ids"])
        assert decoded == "".join(r["text"].lower().split())


def test_bpe_encode_plan_single_arrow_crossing(spark, sf_dir):
    """The Python kernel must run over DISTINCT words only: exactly one
    ArrowEvalPython node, fed by an Aggregate (the distinct), never by
    the corpus-sized explode directly."""
    docs = load_table(spark, sf_dir, "documents").df
    v = bpe.bpe_vocab([("t", "h")], alphabet="abcdefghijklmnopqrstuvwxyz")
    plan = bpe.bpe_encode(docs, v)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    arrow_at = plan.index("ArrowEvalPython")
    agg_after = plan.find("Aggregate", arrow_at)
    assert agg_after != -1, "kernel input is not the distinct-word aggregate"


def test_bpe_packing_composition(spark, sf_dir):
    """BPE ids feed sequence packing: encode -> n_tokens -> pack_by_offset
    produces gap-free, budget-respecting offsets per shard."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").df.limit(100)
    merges = bpe.learn_bpe_merges(docs, num_merges=20)
    v = bpe.bpe_vocab(merges, alphabet="abcdefghijklmnopqrstuvwxyz")
    enc = bpe.bpe_encode(docs, v, mode="merges", merges=merges)
    packed = packing.pack_by_offset(
        enc.select("doc_id", "n_tokens"), "doc_id", "n_tokens", 512, shards=4
    )
    assert packed.count() == 100
    assert packed.filter(F.col("start_offset") < 0).count() == 0
    w = W.partitionBy("shard").orderBy("start_offset")
    gaps = packed.withColumn(
        "prev_end", F.lag(F.col("start_offset") + F.col("n_tokens")).over(w)
    ).filter(
        F.col("prev_end").isNotNull()
        & (F.col("start_offset") != F.col("prev_end"))
    )
    assert gaps.count() == 0


def test_bpe_encode_case_sensitive_vocab(spark):
    """lowercase=False makes upper-case tokens reachable (ADVICE r7: the
    default fold must be documented AND overridable, matched between
    learning and encoding)."""
    v = {"A": 0, "b": 1, "Ab": 2}
    df = spark.createDataFrame([(0, "Ab A b")], "doc_id long, text string")
    sensitive = bpe.bpe_encode(df, v, lowercase=False).collect()[0]
    assert list(sensitive["token_ids"]) == [2, 0, 1]
    # the default fold maps 'Ab'->'ab', unreachable in this vocab -> unk
    folded = bpe.bpe_encode(df, v).collect()[0]
    assert list(folded["token_ids"]) == [-1, 1, -1, 1]
    # learning respects the same switch
    merges = bpe.learn_bpe_merges(
        df.select(F.lit("AB AB AB").alias("text")),
        num_merges=1,
        min_pair_count=1,
        lowercase=False,
    )
    assert merges == [("A", "B")]


def test_bpe_encode_word_length_cap(spark):
    """Words over max_word_len encode in bounded chunks — no token spans
    a chunk boundary, nothing is dropped, kernel cost stays O(cap^2)."""
    v = {"a": 0, "b": 1, "ab": 2}
    # 'abab' with cap=3 -> chunks 'aba'|'b' -> [ab, a] + [b]
    df = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
    out = bpe.bpe_encode(df, v, max_word_len=3).collect()[0]
    assert list(out["token_ids"]) == [2, 0, 1]
    # uncapped would be [ab, ab]
    out2 = bpe.bpe_encode(df, v).collect()[0]
    assert list(out2["token_ids"]) == [2, 2]
    # a base64-ish blob still encodes completely under a tiny cap
    blob = "ab" * 500
    df3 = spark.createDataFrame([(0, blob)], "doc_id long, text string")
    out3 = bpe.bpe_encode(df3, v, mode="merges", merges=[("a", "b")], max_word_len=64).collect()[0]
    assert out3["n_tokens"] == 500 and set(out3["token_ids"]) == {2}


def test_bpe_decode_roundtrip_and_unk(spark):
    """bpe_decode inverts bpe_encode up to whitespace; out-of-vocab ids
    decode to the unk_token; empty docs survive with empty text."""
    v = bpe.bpe_vocab([("t", "h"), ("th", "e")], alphabet="abcdefghijklmnopqrstuvwxyz")
    df = spark.createDataFrame(
        [(0, "the cat"), (1, ""), (2, "ab the")], "doc_id long, text string"
    )
    enc = bpe.bpe_encode(df, v)
    out = {r["doc_id"]: r["text"] for r in bpe.bpe_decode(enc, v).collect()}
    assert out == {0: "thecat", 1: "", 2: "abthe"}
    # an unk id (e.g. from a digit) decodes to the replacement token
    enc7 = bpe.bpe_encode(
        spark.createDataFrame([(0, "a7b")], "doc_id long, text string"), v
    )
    (dec,) = bpe.bpe_decode(enc7, v, unk_token="?").collect()
    assert dec["text"] == "a?b"


def test_bpe_decode_no_python_no_map_literal(spark, sf_dir):
    """Decode stays JVM-side: no Arrow/Python eval nodes, and the vocab
    arrives as a joined table, not an expression-tree map literal."""
    docs = load_table(spark, sf_dir, "documents").df
    v = bpe.bpe_vocab([("t", "h")], alphabet="abcdefghijklmnopqrstuvwxyz")
    enc = bpe.bpe_encode(docs, v)
    plan = bpe.bpe_decode(enc, v)._jdf.queryExecution().optimizedPlan().toString()
    # encode's single kernel is the only Python crossing in the whole tree
    assert plan.count("ArrowEvalPython") == 1
    assert "map_from" not in plan and "CreateMap" not in plan


def test_bpe_encode_append_eos(spark):
    """append_eos_id adds the doc-boundary token to every doc (empty docs
    become [eos]), counted in n_tokens — the packing prep step."""
    v = {"a": 0, "b": 1, "ab": 2}
    df = spark.createDataFrame(
        [(0, "ab a"), (1, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in bpe.bpe_encode(df, v, append_eos_id=99).collect()
    }
    assert out[0] == ([2, 0, 99], 3)
    assert out[1] == ([99], 1)
    # and composes with boundary-respecting packing
    from pathwaydataframework_spark.operators import packing

    enc = bpe.bpe_encode(df, v, append_eos_id=99)
    packed = packing.pack_no_straddle(
        enc.select("doc_id", "n_tokens"), "doc_id", "n_tokens", 4, shards=1
    )
    assert packed.count() == 2
    # the incremental encoder honors the same boundary token, so a
    # streaming encode->pack pipeline matches the one-shot layout
    inc, _tbl = bpe.bpe_encode_incremental(
        df, bpe.bpe_word_table(spark), v, append_eos_id=99
    )
    inc_out = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in inc.collect()
    }
    assert inc_out == out


def test_bpe_space_marker_lossless_roundtrip(spark):
    """space_marker mode (GPT-2's Ġ convention): non-initial words carry
    the boundary symbol through learn/encode, decode puts the spaces
    back — decode(encode(x)) == x exactly for trimmed single-space
    text, and whitespace runs normalize to one space."""
    M = "Ġ"  # Ġ
    rows = [
        (0, "the table"),
        (1, "a value  in   the row"),   # runs normalize to single spaces
        (2, "solo"),
        (3, ""),                        # empty doc stays empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # marker pairs tie-break LAST among equal counts ('Ġ' = U+0120 sorts
    # after ascii), so give the loop room to reach them
    merges = bpe.learn_bpe_merges(
        df, num_merges=60, min_pair_count=1, space_marker=M
    )
    # marked words mean marker-initial pairs are learnable
    assert any(M in a + b for a, b in merges)
    vocab = bpe.bpe_vocab(
        merges, alphabet="abcdefghijklmnopqrstuvwxyz" + M
    )
    enc = bpe.bpe_encode(df, vocab, space_marker=M)
    dec = {
        r["doc_id"]: r["text"]
        for r in bpe.bpe_decode(enc, vocab, space_marker=M).collect()
    }
    import re

    assert dec == {
        d: re.sub(r"\s+", " ", t.strip()) for d, t in rows
    }
    # the merges-mode kernel honors the marker too
    enc_m = bpe.bpe_encode(
        df, vocab, mode="merges", merges=merges, space_marker=M
    )
    dec_m = {
        r["doc_id"]: r["text"]
        for r in bpe.bpe_decode(enc_m, vocab, space_marker=M).collect()
    }
    assert dec_m == dec
    # incremental encode takes the same marker
    inc, _tbl = bpe.bpe_encode_incremental(
        df, bpe.bpe_word_table(spark), vocab, space_marker=M
    )
    got = {
        r["doc_id"]: list(r["token_ids"])
        for r in inc.collect()
    }
    want = {r["doc_id"]: list(r["token_ids"]) for r in enc.collect()}
    assert got == want


def test_bpe_space_marker_ignores_empty_split_tokens(spark):
    """Spark's trim strips only ' ' — a newline-terminated text splits
    with a trailing '' which must NOT become a phantom bare-marker
    token (inflated n_tokens, stray decoded space, skewed learned
    pairs) (code-review r9 finding)."""
    M = "Ġ"
    v = {c: i for i, c in enumerate("abcdehtĠ")}
    clean = spark.createDataFrame([(0, "the cat")], "doc_id long, text string")
    dirty = spark.createDataFrame(
        [(0, "the cat\n"), (1, "\tthe cat")], "doc_id long, text string"
    )
    want = [
        (r["doc_id"], list(r["token_ids"]), r["n_tokens"])
        for r in bpe.bpe_encode(clean, v, space_marker=M).collect()
    ][0]
    got = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in bpe.bpe_encode(dirty, v, space_marker=M).collect()
    }
    assert got[0] == (want[1], want[2])      # trailing \n: no phantom token
    assert got[1] == (want[1], want[2])      # leading \t: first word unmarked
    dec = {
        r["doc_id"]: r["text"]
        for r in bpe.bpe_decode(
            bpe.bpe_encode(dirty, v, space_marker=M), v, space_marker=M
        ).collect()
    }
    assert dec == {0: "the cat", 1: "the cat"}
    # learn path: the phantom '' must not count as a marker word
    corpus = spark.createDataFrame([("a b\n",)], "text string")
    merges = bpe.learn_bpe_merges(
        corpus, num_merges=5, min_pair_count=1, space_marker=M
    )
    assert ("Ġ", "b") in merges or all(M not in a or len(a) > 1 for a, b in merges)
    # the only marker-bearing symbol stream is 'Ġb' from the real word;
    # no pair may involve a STANDALONE phantom marker word's trailing edge
    flat = [a + b for a, b in merges]
    assert all(tok != M for tok in flat)
