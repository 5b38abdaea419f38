"""BPE tokenizer training over a Spark corpus.

The missing half of the BPE-ish token-counting surface
(plans/sql_queries.py::bpe_token_stats): actually LEARNING the merge
table.  The scale shape is the standard one (sentencepiece / HF
tokenizers train from a word-count file, not from raw text): Spark does
the single heavy corpus aggregation — word frequencies — and the merge
loop runs driver-side over that compact, vocabulary-sized table.  At
100 TB the corpus pass is the only distributed stage; the word-freq
table is bounded by vocabulary size (millions of rows, KBs per row),
orders of magnitude smaller than the corpus.

Algorithm (Sennrich et al. 2016): words are char sequences ending in the
end-of-word marker; each step merges the most frequent adjacent symbol
pair.  Ties break deterministically by (count desc, pair lexicographic)
so the merge table is reproducible across runs and partitionings.

No reference counterpart (the reference consumes pre-tokenized TACRED);
this is part of the training-data-pipeline mandate.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one distributed pass: corpus -> (word, freq).  Partial
    aggregation makes the shuffle carry one row per distinct word per
    partition."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(vocab: dict[tuple, int]) -> Counter:
    counts: Counter = Counter()
    for symbols, freq in vocab.items():
        for i in range(len(symbols) - 1):
            counts[(symbols[i], symbols[i + 1])] += freq
    return counts


def _merge_pair(vocab: dict[tuple, int], pair: tuple) -> dict[tuple, int]:
    a, b = pair
    merged = a + b
    out: dict[tuple, int] = {}
    for symbols, freq in vocab.items():
        new = []
        i = 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(symbols[i])
                i += 1
        key = tuple(new)
        out[key] = out.get(key, 0) + freq
    return out


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Corpus -> ordered BPE merge table (length <= n_merges; stops early
    when no pair clears ``min_freq``)."""
    rows = word_frequencies(docs, text_col).collect()
    vocab = {
        tuple(list(r.word) + [EOW]): int(r.freq)
        for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic: highest count, then lexicographically smallest
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[pair] < min_freq:
            break
        vocab = _merge_pair(vocab, pair)
        merges.append(pair)
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge table to one word (training-order greedy —
    the canonical BPE encoder)."""
    symbols = list(word) + [EOW]
    for a, b in merges:
        i = 0
        out = []
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols
