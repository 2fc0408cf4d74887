"""bpe_encode: train-then-apply semantics on a closed corpus —
reconstruction, merge application, word_idx gap contract."""

from easyner_spark.operators.tokenizer import bpe_encode, bpe_merges


def test_encode_reconstructs_and_merges(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab ab cd"), (1, "ab cd UPPER cd")],
        "doc_id long, text string",
    )
    rows = bpe_encode(docs, n_merges=2).collect()
    # group tokens back per (doc, word)
    words = {}
    for r in rows:
        words.setdefault((r["doc_id"], r["word_idx"]), []).append(
            (r["tok_idx"], r["token"])
        )
    rebuilt = {
        k: "".join(t for _, t in sorted(v)) for k, v in words.items()
    }
    # reconstruction: token concatenation is the original (lowered) word
    assert rebuilt[(0, 0)] == "ab" and rebuilt[(0, 3)] == "cd"
    assert rebuilt[(1, 0)] == "ab" and rebuilt[(1, 3)] == "cd"
    # word_idx keeps the raw-split position: 'upper' (uppercase chars
    # are lowered -> 'upper' IS in-alphabet) occupies idx 2
    assert rebuilt[(1, 2)] == "upper"
    # the most frequent pair (a,b) merged: 'ab' encodes as ONE token
    m = {(r["left"], r["right"]) for r in bpe_merges(docs, n_merges=2).collect()}
    assert ("a", "b") in m
    assert [t for _, t in sorted(words[(0, 0)])] == ["ab"]


def test_word_idx_gaps_for_dropped_words(spark):
    # '{bad}' contains braces -> out of the [!-z] alphabet -> dropped,
    # but its split slot still counts
    docs = spark.createDataFrame(
        [(0, "ok {bad} ok2")], "doc_id long, text string"
    )
    got = {r["word_idx"] for r in bpe_encode(docs, n_merges=1).collect()}
    assert got == {0, 2}
