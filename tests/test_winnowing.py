"""Winnowing fingerprints (MOSS, SIGMOD 2003): selection parity vs an
independent pure-Python reference, the w+k-1 shared-run detection
guarantee, rightmost-tie rule, short-doc degeneracy, and the
candidate-pair bucket cap."""

import hashlib
import re

import pytest

from easyner_spark.operators.dedup import (
    winnow_candidate_pairs,
    winnow_fingerprints,
)

K, W = 3, 4
_BASE = 100_000_000


def _py_winnow(text: str, k: int = K, w: int = W):
    """Independent reference implementation (explicit loops, no SQL)."""
    toks = re.findall(r"\w+", text.lower())
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [" ".join(toks)]
    hashes = [
        hashlib.md5(g.encode("utf-8")).hexdigest()[:8] for g in grams
    ]
    n = len(hashes)
    out = set()
    for start in range(max(n - w, 0) + 1):
        frame = hashes[start : start + w]
        m = min(frame)
        # rightmost occurrence of the min within the frame
        pos = start + max(i for i, h in enumerate(frame) if h == m)
        out.add((pos, m))
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "a different sentence entirely with no overlap whatsoever here today"),
    # shares an 8-word run (>= w + k - 1 = 6) with doc 1:
    (3, "completely new prefix then quick brown fox jumps over the lazy dog finally"),
    (4, "tiny doc"),  # fewer than k tokens
    (5, "exactly three words"),  # exactly k tokens -> one gram
]


@pytest.fixture(scope="module")
def fps(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = winnow_fingerprints(docs, k=K, w=W).collect()
    return {
        did: {(r.pos, r.fp) for r in rows if r.doc_id == did}
        for did in {r.doc_id for r in rows}
    }


def test_matches_python_reference(fps):
    for did, text in DOCS:
        assert fps[did] == _py_winnow(text), f"doc {did}"


def test_shared_run_guarantee(fps):
    """Docs 1 and 3 share a >= w+k-1-word run -> at least one common
    fingerprint hash; doc 2 shares nothing with either."""
    h1 = {fp for _, fp in fps[1]}
    h2 = {fp for _, fp in fps[2]}
    h3 = {fp for _, fp in fps[3]}
    assert h1 & h3
    assert not (h1 & h2)
    assert not (h3 & h2)


def test_short_docs_degenerate(fps):
    # < k tokens and == k tokens both yield exactly one gram -> one fp
    assert len(fps[4]) == 1 and next(iter(fps[4]))[0] == 0
    assert len(fps[5]) == 1 and next(iter(fps[5]))[0] == 0


def test_rightmost_tie_rule(spark):
    """A doc made of ONE repeated gram: every window frame ties on the
    hash, and the rightmost position must win — so the selected set is
    every frame's last row, not its first."""
    text = " ".join(["x"] * 10)  # 8 identical grams 'x x x'
    docs = spark.createDataFrame([(9, text)], ["doc_id", "text"])
    got = {
        (r.pos, r.fp)
        for r in winnow_fingerprints(docs, k=K, w=W).collect()
    }
    assert got == _py_winnow(text)
    # every frame ties on the single hash -> each of the 5 window
    # starts selects its LAST row: positions {3,4,5,6,7}, never 0
    rep = hashlib.md5(b"x x x").hexdigest()[:8]
    assert got == {(p, rep) for p in (3, 4, 5, 6, 7)}


def test_candidate_pairs_and_cap(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    pairs = {
        (r.a, r.b): r.n_shared
        for r in winnow_candidate_pairs(
            docs, k=K, w=W, min_shared=1
        ).collect()
    }
    assert (1, 3) in pairs
    assert all(a == 1 and b == 3 for a, b in pairs)
    # cap of 0 documents per bucket drops everything
    assert (
        winnow_candidate_pairs(docs, k=K, w=W, max_bucket_size=1).count()
        == 0
        or (1, 3)
        not in {
            (r.a, r.b)
            for r in winnow_candidate_pairs(
                docs, k=K, w=W, min_shared=1, max_bucket_size=1
            ).collect()
        }
    )


def test_density_bound(spark, fx):
    """Winnowing keeps ~2/(w+1) of grams; assert the selected count is
    well below the gram count on real fixture text."""
    texts = list(fx.pages["text"])[:40]
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    n_fp = winnow_fingerprints(docs, k=K, w=W).count()
    n_grams = sum(
        max(len(re.findall(r"\w+", (t or "").lower())) - K + 1, 1)
        for t in texts
    )
    assert 0 < n_fp < 0.8 * n_grams
