"""Distributed BPE tokenizer training + encoding.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") is the standard subword tokenizer
for LLM training corpora. Training iteratively merges the most frequent
adjacent symbol pair; encoding applies the learned merges by rank.

Scale shape — the part Spark owns vs the part it must not:
- **Corpus -> word histogram** is the distributed heavy lift: one
  map-side-combined aggregate over the analyzer tokens (Zipf skew is
  exactly what a combiner flattens: the hot words partial-aggregate on
  every mapper before the exchange).
- **Histogram -> merge table** is NOT distributed work and must not
  pretend to be: every production trainer (SentencePiece, HF
  tokenizers) trains on the pruned word-frequency histogram, whose size
  is bounded by ``max_words`` (default 1e6 — TakeOrdered, never a
  global sort), not by corpus bytes. At 100 TB the histogram is the
  same ~1e6 rows it is at 100 GB; the driver loop is O(max_words *
  n_merges) on ~100 bytes/row — the bounded-collect contract other
  operators use for partition lists and domain cardinalities.
- **Encoding** is distributed again: an Arrow-batched ``mapInPandas``
  with the merge-rank dict broadcast in the closure — map-only, no
  shuffle, linear in corpus bytes.
- ``pair_counts`` (one merge iteration's statistics) is also exposed as
  a pure DataFrame aggregate — the fully-distributed form a
  histogram-free trainer would iterate, and the registry query's
  oracle surface (``q_bpe_pair_counts``).

Symbol convention: a word's initial symbols are its characters plus a
terminal ``END`` marker (``</w>``), the original paper's word-boundary
device, so merges never cross word boundaries and decoding is exact.
Tie-break contract: merge the (count desc, pair lexicographic asc)
winner — deterministic across engines and runs.

Reference scope note: the reference counts tokens only via tiktoken for
LLM cost estimates (F8; e.g. Thematic_Screener/src/utils.py token
budgeting); it has no tokenizer-training stage. This module is part of
the beyond-reference training-data tier (COVERAGE.md), giving the
pretraining capstone a corpus-derived tokenizer instead of an imported
one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_cookbook_spark.functions.text import analyzer_tokens_expr

#: end-of-word marker (Sennrich et al. §3.2)
END = "</w>"

#: default histogram prune — the driver-side training bound
DEFAULT_MAX_WORDS = 1_000_000


def word_freq_table(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) over the analyzer tokens — ONE map-side-combined
    exchange keyed by word; the combiner absorbs Zipf skew."""
    out = (
        docs.select(F.explode(analyzer_tokens_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return out.filter(F.col("freq") >= min_freq) if min_freq > 1 else out


def word_symbols_expr(word: Column) -> Column:
    """Initial symbol array: characters + the END marker. Built from
    substrings over a position sequence (engine-portable — the DuckDB
    oracle uses the same substr rule, not an empty-pattern split whose
    edge semantics differ between engines)."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.substring(word, i, F.lit(1)),
        ),
        F.array(F.lit(END)),
    )


def pair_counts(
    symbols_df: DataFrame,
    symbols_col: str = "symbols",
    freq_col: str = "freq",
) -> DataFrame:
    """Adjacent-pair statistics of one merge iteration: (a, b, cnt)
    where cnt = sum of word frequencies over each occurrence of the
    pair. zip_with over the array against its own tail — a narrow
    projection — then explode + one aggregate keyed by the pair
    (bounded by |vocab|^2 in principle, tiny in practice)."""
    s = F.col(symbols_col)
    pairs = F.when(F.size(s) < 2, F.array().cast("array<struct<a:string,b:string>>")).otherwise(
        F.zip_with(
            F.slice(s, 1, F.size(s) - 1),
            F.slice(s, 2, F.size(s) - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
    )
    return (
        symbols_df.select(F.col(freq_col).alias("__f"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("__f").alias("cnt"))
    )


def _py_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def _py_pair_counts(histogram: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in histogram.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _py_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = DEFAULT_MAX_WORDS,
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Distributed word
    histogram -> TakeOrdered prune to ``max_words`` (freq desc, word
    asc — deterministic) -> bounded driver loop (module contract).
    Returns merges in rank order; stops early if no pair repeats."""
    rows = (
        word_freq_table(docs, text_col, min_freq)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    histogram = {_py_symbols(r["word"]): r["freq"] for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _py_pair_counts(histogram)
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        histogram = {
            _py_merge(syms, pair): freq for syms, freq in histogram.items()
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE encoding of one word (the HF/tiktoken
    algorithm): repeatedly merge the lowest-rank adjacent pair."""
    syms = list(_py_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with the learned merges: analyzer words ->
    per-word greedy merge by rank -> flat subword array in ``out_col``.
    Arrow-batched mapInPandas, merge table broadcast in the closure —
    map-only, no shuffle; the per-word work is cached across a batch's
    repeated words (Zipf again: the cache hit rate IS the skew)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    ranks = {pair: i for i, pair in enumerate(merges)}
    # tokenize JVM-side (Java \pL\pN has no exact Python twin) so the
    # words entering the Python stage match the engine analyzer
    toks_df = docs.withColumn("__words", analyzer_tokens_expr(F.col(text_col)))
    schema = StructType(
        list(toks_df.schema.fields) + [StructField(out_col, ArrayType(StringType()), True)]
    )

    def run(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for words in pdf["__words"]:
                flat: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    flat.extend(enc)
                out.append(flat)
            pdf[out_col] = out
            yield pdf

    return toks_df.mapInPandas(run, schema=schema).drop("__words")
