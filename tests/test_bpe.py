"""Distributed BPE tokenizer training + encoding (operators/bpe.py):
the Sennrich et al. worked example, tie-break determinism, engine ==
Python-reference pair statistics, encode round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.bpe import (
    END,
    _py_pair_counts,
    _py_symbols,
    bpe_encode,
    encode_word,
    pair_counts,
    train_bpe,
    word_freq_table,
    word_symbols_expr,
)

# the classic corpus (Sennrich et al. 2016 §3.2 figure 1, scaled): word
# frequencies low:5 lower:2 newest:6 widest:3
TEXTS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_bpe_worked_example(spark):
    merges = train_bpe(_docs(spark), 5)
    # es (9) -> est (9) -> est</w> (9) -> lo (7) -> low (7); ties in the
    # first three resolve by pair order: (e,s) < (s,t) etc. collapse as
    # merges land — the pinned sequence is the paper's
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_train_bpe_tiebreak_lexicographic(spark):
    # "ab" x2 and "cd" x2: pairs (a,b), (b,</w>), (c,d), (d,</w>) all
    # tie at 2 — the lexicographically smallest pair must win
    docs = _docs(spark, ["ab ab cd cd"])
    merges = train_bpe(docs, 1)
    assert merges == [("a", "b")]


def test_train_bpe_early_stop_when_nothing_repeats(spark):
    docs = _docs(spark, ["abc def"])  # every pair occurs once
    assert train_bpe(docs, 10) == []


def test_train_bpe_max_words_prune(spark):
    # prune to the single most frequent word: merges come from "aaaa" only
    docs = _docs(spark, ["aaaa aaaa aaaa zz zz"])
    merges = train_bpe(docs, 1, max_words=1)
    assert merges == [("a", "a")]


def test_pair_counts_matches_python_reference(spark):
    docs = _docs(spark)
    wf = word_freq_table(docs)
    syms = wf.select("freq", word_symbols_expr(F.col("word")).alias("symbols"))
    got = {(r.a, r.b): r.cnt for r in pair_counts(syms).collect()}
    hist = {_py_symbols(r.word): r.freq for r in wf.collect()}
    assert got == _py_pair_counts(hist)


def test_word_symbols_multibyte_chars(spark):
    df = spark.createDataFrame([("naïve",), ("深度",)], "word string")
    rows = {
        r.word: r.s
        for r in df.select(
            "word", word_symbols_expr(F.col("word")).alias("s")
        ).collect()
    }
    assert rows["naïve"] == ["n", "a", "ï", "v", "e", END]
    assert rows["深度"] == ["深", "度", END]


def test_encode_word_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", END), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + END]
    assert encode_word("lower", ranks) == ["low", "e", "r", END]
    assert encode_word("xyz", ranks) == ["x", "y", "z", END]  # no merges apply


def test_bpe_encode_round_trip(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, 8)
    enc = bpe_encode(docs, merges)
    rows = enc.select("doc_id", "text", "bpe_tokens").collect()
    assert len(rows) == len(TEXTS)
    for r in rows:
        # concatenating subwords and splitting on the end marker must
        # reconstruct the analyzer words exactly
        rebuilt = "".join(r.bpe_tokens).split(END)
        assert rebuilt[-1] == ""
        assert rebuilt[:-1] == r.text.split()
