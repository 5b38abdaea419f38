"""BPE tokenizer training (operators/bpe.py): learned merges vs an
independent pure-Python reference over raw text, plus encoder sanity."""

from collections import Counter

from relation_extraction_transformer_spark.operators import bpe as BPE


def _reference_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Independent implementation straight from raw text (no Spark, no
    word-freq precompute) — Sennrich et al. 2016 with (count desc, pair)
    tie-break."""
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(list(w) + [BPE.EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        new_vocab: Counter = Counter()
        a, b = best
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += f
        vocab = new_vocab
        merges.append(best)
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new wider",
    "low new lower newer",
    "the the the a a value",
]


def test_learn_bpe_matches_reference(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = BPE.learn_bpe(docs, n_merges=12)
    want = _reference_bpe(TEXTS, 12)
    assert got == want
    assert len(got) == 12


def test_learn_bpe_deterministic_across_partitioning(spark):
    docs2 = spark.createDataFrame([(t,) for t in TEXTS], "text string").repartition(2)
    docs7 = spark.createDataFrame([(t,) for t in TEXTS], "text string").repartition(7)
    assert BPE.learn_bpe(docs2, 8) == BPE.learn_bpe(docs7, 8)


def test_encode_word_roundtrip():
    merges = _reference_bpe(TEXTS, 12)
    for w in ["low", "lowest", "newer", "unseen"]:
        syms = BPE.encode_word(w, merges)
        assert "".join(syms) == w + BPE.EOW
        assert all(s for s in syms)
    # a frequent fully-merged word collapses to few symbols
    assert len(BPE.encode_word("low", merges)) <= 3
