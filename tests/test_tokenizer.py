"""Distributed BPE training (operators/tokenizer.py): merge rules vs
a pure-Python greedy replica, the chain/tie/exhaustion edge cases,
and the alphabet gate. Value parity vs DuckDB (including the unrolled
6-round oracle) is pinned by the bpe_merges oracle query."""

import pytest
from pyspark.sql import functions as F


def _py_bpe(words: dict[str, int], k: int) -> list[tuple[str, str, int]]:
    """Reference greedy BPE on a word-frequency dict."""
    vocab = {tuple(w): f for w, f in words.items()}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def _merges(spark, texts, k):
    from easyner_spark.operators.tokenizer import bpe_merges

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = bpe_merges(df, n_merges=k).orderBy("merge_rank").collect()
    return [(r["left"], r["right"], r["pair_count"]) for r in rows]


class TestBpeMerges:
    def test_matches_python_replica(self, spark):
        texts = [
            "the cat sat on the mat",
            "the bat and the rat saw the cat",
            "low lower lowest slow slowly",
        ]
        words: dict[str, int] = {}
        for t in texts:
            for w in t.lower().split():
                words[w] = words.get(w, 0) + 1
        assert _merges(spark, texts, 6) == _py_bpe(words, 6)

    def test_greedy_chain_aaa(self, spark):
        # [a,a,a]: (a,a) counts 2 but merges ONCE left-to-right, then
        # round 2 sees the new (aa, a) pair
        assert _merges(spark, ["aaa"], 2) == [("a", "a", 2), ("aa", "a", 1)]

    def test_tie_breaks_lexicographic(self, spark):
        assert _merges(spark, ["cd ab"], 1) == [("a", "b", 1)]

    def test_freq_weighting(self, spark):
        # 'ab' appears 3x across docs, 'cd' once
        assert _merges(spark, ["ab ab", "ab cd"], 1)[0] == ("a", "b", 3)

    def test_exhaustion_emits_fewer_rows(self, spark):
        # one 2-symbol word supports exactly one merge; later rounds
        # find no pairs and emit nothing
        assert _merges(spark, ["ab"], 3) == [("a", "b", 1)]

    def test_alphabet_gate_drops_unsafe_words(self, spark):
        # brace-bearing and non-ASCII words are excluded identically
        # on both engines (tokenizer.WORD_RE); only 'ok' survives
        assert _merges(spark, ["{x} café ok"], 1) == [("o", "k", 1)]

    def test_n_merges_gate(self, spark):
        with pytest.raises(ValueError):
            _merges(spark, ["ab"], 0)

    def test_token_counts_match_python_replica(self, spark):
        from easyner_spark.operators.tokenizer import bpe_token_counts

        texts = ["the cat sat on the mat", "low lower lowest the the"]
        words: dict[str, int] = {}
        for t in texts:
            for w in t.lower().split():
                words[w] = words.get(w, 0) + 1
        # replica: replay merges, then count final symbols
        vocab = {tuple(w): f for w, f in words.items()}
        for a, b, _ in _py_bpe(words, 3):
            new_vocab: dict[tuple[str, ...], int] = {}
            for syms, f in vocab.items():
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                t = tuple(out)
                new_vocab[t] = new_vocab.get(t, 0) + f
            vocab = new_vocab
        expected: dict[str, int] = {}
        for syms, f in vocab.items():
            for s in syms:
                expected[s] = expected.get(s, 0) + f
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["token"]: r["freq"]
            for r in bpe_token_counts(df, n_merges=3).collect()
        }
        assert got == expected

    def test_token_counts_hand_case(self, spark):
        # 'abab' x1: merge1 (a,b,2) -> {ab}{ab}; merge2 (ab,ab,1) -> {abab}
        from easyner_spark.operators.tokenizer import bpe_token_counts

        df = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
        got = {r["token"]: r["freq"] for r in bpe_token_counts(df, n_merges=2).collect()}
        assert got == {"abab": 1}

    def test_word_freqs_lowercases_and_counts(self, spark):
        from easyner_spark.operators.tokenizer import bpe_word_freqs

        df = spark.createDataFrame([(0, "The the THE cat")], "doc_id long, text string")
        out = {r["word"]: r["freq"] for r in bpe_word_freqs(df).collect()}
        assert out == {"the": 3, "cat": 1}
