"""Tests for the training-data operators: dedup family, similarity
search, text analysis. Expected values are computed by independent
plain-Python implementations (not the engine's column expressions), so
these genuinely cross-validate.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

WORD_RE = re.compile(r"\w+")

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "quick brown fox jumps over the lazy dog near the river bank"),  # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (4, "completely different content about spark shuffles and partitions"),
    (5, "der hund und die katze sind nicht auf der strasse"),
    (6, "short"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_shingles(text: str, k: int = 3) -> list[str]:
    toks = WORD_RE.findall(text.lower())
    if len(toks) < k:
        return sorted({" ".join(toks)})
    return sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


def py_minhash(sh: list[str], n: int = 12) -> list[str]:
    return [
        min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh) for i in range(n)
    ]


class TestExactDedup:
    def test_groups(self, spark, docs_df):
        from easyner_spark.operators.dedup import exact_dedup, exact_dup_groups

        out = {r.doc_id: r for r in exact_dedup(docs_df).collect()}
        assert out[1].canonical_id == 1 and not out[1].is_dup
        assert out[3].canonical_id == 1 and out[3].is_dup
        assert out[2].canonical_id == 2 and not out[2].is_dup
        expected = hashlib.sha256(DOCS[0][1].encode()).hexdigest()
        assert out[1].content_hash == expected

        groups = exact_dup_groups(docs_df).collect()
        assert len(groups) == 1
        assert groups[0].canonical_id == 1 and groups[0].dup_count == 2

    def test_plan_is_single_shuffle(self, spark, docs_df):
        from easyner_spark.operators.dedup import exact_dup_groups

        plan = exact_dup_groups(docs_df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1


class TestMinhash:
    def test_signature_matches_python(self, spark, docs_df):
        from easyner_spark.operators.dedup import minhash_signature, shingle_set

        rows = docs_df.select(
            "doc_id", shingle_set().alias("sh"), minhash_signature().alias("sig")
        ).collect()
        for r in rows:
            text = dict(DOCS)[r.doc_id]
            assert list(r.sh) == py_shingles(text), r.doc_id
            assert list(r.sig) == py_minhash(py_shingles(text)), r.doc_id

    def test_lsh_finds_near_and_exact_dups(self, spark, docs_df):
        from easyner_spark.operators.dedup import minhash_lsh_pairs

        pairs = {(r.a, r.b): r.est_jaccard for r in minhash_lsh_pairs(docs_df).collect()}
        assert pairs[(1, 3)] == 1.0          # exact dup: all components equal
        assert (1, 2) in pairs               # near dup: banded together
        assert pairs[(1, 2)] > 0.5
        assert (1, 4) not in pairs           # unrelated docs never collide

    def test_xxhash_variant_recovers_same_dups(self, spark, docs_df):
        """hash_fn='xxhash64' (the 2x-faster bench knob) finds the same
        near/exact duplicate pairs as the oracle-portable md5 path on
        the fixture corpus, with estimator values within MinHash noise
        (different hash family -> different component collisions)."""
        from easyner_spark.operators.dedup import minhash_lsh_pairs

        md5_pairs = {
            (r.a, r.b): r.est_jaccard for r in minhash_lsh_pairs(docs_df).collect()
        }
        xx_pairs = {
            (r.a, r.b): r.est_jaccard
            for r in minhash_lsh_pairs(docs_df, hash_fn="xxhash64").collect()
        }
        strong = {p for p, j in md5_pairs.items() if j >= 0.5}
        assert strong and strong <= set(xx_pairs)
        for p in strong:
            assert abs(md5_pairs[p] - xx_pairs[p]) <= 0.35

    def test_bucket_cap_drops_giant_buckets(self, spark):
        from easyner_spark.operators.dedup import minhash_lsh_pairs

        same = spark.createDataFrame(
            [(i, "identical boilerplate page text here repeated") for i in range(10)],
            "doc_id long, text string",
        )
        capped = minhash_lsh_pairs(same, max_bucket_size=5)
        assert capped.count() == 0  # all buckets exceed the cap -> dropped

    def test_ngram_jaccard_exact(self, spark, docs_df):
        from easyner_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

        jac = {
            (r.a, r.b): r.jaccard
            for r in ngram_jaccard_pairs(docs_df, minhash_lsh_pairs(docs_df)).collect()
        }
        a, b = set(py_shingles(DOCS[0][1])), set(py_shingles(DOCS[1][1]))
        expected = round(len(a & b) / len(a | b), 6)
        assert jac[(1, 2)] == expected
        assert jac[(1, 3)] == 1.0


class TestSimhash:
    def test_simhash_matches_python(self, spark, docs_df):
        from easyner_spark.operators.dedup import simhash

        def py_simhash(text: str, bits: int = 32) -> int:
            counts: dict[str, int] = {}
            for w in WORD_RE.findall(text.lower()):
                counts[w] = counts.get(w, 0) + 1
            sums = [0] * bits
            for w, c in counts.items():
                h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                for b in range(bits):
                    sums[b] += c if (h >> b) & 1 else -c
            return sum(1 << b for b in range(bits) if sums[b] > 0)

        out = {r.id: r.simhash for r in simhash(docs_df).collect()}
        for doc_id, text in DOCS:
            assert out[doc_id] == py_simhash(text), doc_id

    def test_pairs_hamming(self, spark, docs_df):
        from easyner_spark.operators.dedup import simhash_pairs

        pairs = {(r.a, r.b): r.hamming for r in simhash_pairs(docs_df).collect()}
        assert pairs[(1, 3)] == 0            # identical docs -> distance 0
        assert all(h <= 3 for h in pairs.values())


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        # 8-dim vectors: 0/1 near-identical, 2 orthogonal-ish, 3 opposite.
        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.01, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0]),
            (4, [0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]),
        ]
        return spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    def test_brute_force_topk(self, spark, emb_df):
        from easyner_spark.operators.similarity import brute_force_topk

        out = brute_force_topk(emb_df, k=2)
        top = {
            r.query_id: (r.neighbor_id, r.cosine)
            for r in out.where("rank = 1").collect()
        }
        assert top[0][0] == 1 and top[0][1] > 0.99
        assert top[1][0] == 0
        # every query emits exactly k rows (n-1 >= k here)
        counts = out.groupBy("query_id").count().collect()
        assert all(r["count"] == 2 for r in counts)

    def test_cosine_value(self, spark, emb_df):
        from easyner_spark.operators.similarity import brute_force_topk

        out = brute_force_topk(emb_df, k=4)
        row = [r for r in out.collect() if r.query_id == 0 and r.neighbor_id == 3]
        assert row and row[0].cosine == -1.0

    def test_blocked_topk_matches_fold_path(self, spark, emb_df):
        """Block-partitioned BLAS variant reproduces the sequential-fold
        verification path (same ranks and 6-decimal cosines) — the
        bench's hot path is value-pinned against the oracle-checked one.
        block_size=2 forces a real multi-block (Bc=3) run so the
        cross-block global top-k merge is exercised, not just the
        single-matmul degenerate case."""
        from easyner_spark.operators.similarity import (
            brute_force_topk,
            brute_force_topk_blocked,
        )

        exact = sorted(map(tuple, brute_force_topk(emb_df, k=3).collect()))
        fast = sorted(
            map(tuple, brute_force_topk_blocked(emb_df, k=3, block_size=2).collect())
        )
        assert len(exact) == len(fast)
        for e, f in zip(exact, fast):
            assert e[:3] == f[:3]           # query, neighbor, rank identical
            assert abs(e[3] - f[3]) < 2e-6  # cosine equal after round(6)

    def test_blocked_topk_no_driver_collect_plan(self, spark, emb_df):
        """The blocked path's physical plan is a CartesianProduct over
        packed blocks (each task reads one query block + one corpus
        block) — NOT a broadcast of the whole corpus."""
        from easyner_spark.operators.similarity import brute_force_topk_blocked

        out = brute_force_topk_blocked(emb_df, k=2, block_size=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" in plan
        assert "BroadcastNestedLoop" not in plan

    def test_blocked_topk_preserves_id_type_and_queries(self, spark):
        """String ids survive (no hardcoded long schema — ADVICE r1),
        and an explicit small query set against a larger corpus works."""
        from easyner_spark.operators.similarity import (
            brute_force_topk,
            brute_force_topk_blocked,
        )

        corpus = spark.createDataFrame(
            [(f"d{i}", [float(i % 3 == j) for j in range(4)]) for i in range(9)],
            "vec_id string, embedding array<float>",
        )
        queries = corpus.where("vec_id in ('d0', 'd4')")
        exact = sorted(
            map(tuple, brute_force_topk(corpus, k=2, queries=queries).collect())
        )
        fast = sorted(
            map(
                tuple,
                brute_force_topk_blocked(
                    corpus, k=2, queries=queries, block_size=3
                ).collect(),
            )
        )
        assert exact == fast
        assert fast and isinstance(fast[0][0], str)

    def test_blocked_topk_empty_corpus(self, spark):
        from easyner_spark.operators.similarity import brute_force_topk_blocked

        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        out = brute_force_topk_blocked(empty, k=3)
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "rank", "cosine"]

    def test_lsh_subset_of_exact_and_agrees(self, spark, emb_df):
        from easyner_spark.operators.similarity import brute_force_topk, lsh_topk

        exact = {
            (r.query_id, r.neighbor_id): r.cosine
            for r in brute_force_topk(emb_df, k=4).collect()
        }
        approx = lsh_topk(emb_df, k=4, n_bits=2, dim=8).collect()
        assert approx  # buckets are coarse enough to pair something
        for r in approx:
            key = (r.query_id, r.neighbor_id)
            if key in exact:
                assert abs(exact[key] - r.cosine) < 1e-9

    def test_neardup_threshold(self, spark, emb_df):
        from easyner_spark.operators.similarity import embedding_neardup_pairs

        # n_bits=0: the exact all-pairs verification twin
        pairs = embedding_neardup_pairs(emb_df, threshold=0.99, n_bits=0).collect()
        assert [(r.a, r.b) for r in pairs] == [(0, 1)]

    def test_neardup_default_is_bucketed_subset(self, spark):
        """The DEFAULT near-dup path (VERDICT r1 fix) is LSH-bucketed:
        one equi-join shuffle, no all-pairs theta join; every emitted
        pair carries the exact cosine and appears in the exact twin.
        The near-dup pair has a dominant first component, so its sign
        w.r.t. every +-1 plane equals sign(p0) for both vectors — they
        provably share all buckets and cannot be missed."""
        from easyner_spark.operators.similarity import embedding_neardup_pairs

        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.99, 0.001, 0.001, 0.001]),
            (2, [0.0, 1.0, -1.0, 0.0]),
            (3, [-1.0, 0.2, 0.0, 0.3]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        exact = {
            (r.a, r.b): r.cosine
            for r in embedding_neardup_pairs(df, threshold=0.5, n_bits=0).collect()
        }
        bucketed = embedding_neardup_pairs(df, threshold=0.5)  # defaults
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan
        got = bucketed.collect()
        for r in got:
            assert exact[(r.a, r.b)] == r.cosine
        assert any((r.a, r.b) == (0, 1) for r in got)

    def test_ivf_topk_subset_of_exact_and_deterministic(self, spark):
        """IVF-flat: every returned pair carries the exact cosine and
        appears in the brute-force result at its rank or better (recall
        loss only ever DROPS candidates); re-running yields identical
        output (deterministic md5 quantizer, no RNG)."""
        from easyner_spark.operators.similarity import brute_force_topk, ivf_topk

        import random

        rng = random.Random(7)
        vecs = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        exact = {
            (r.query_id, r.neighbor_id): r.cosine
            for r in brute_force_topk(df, k=5).collect()
        }
        got = ivf_topk(df, k=5, n_centroids=4, nprobe=2).collect()
        assert got  # probing 2 of 4 cells pairs something
        for r in got:
            key = (r.query_id, r.neighbor_id)
            if key in exact:
                assert exact[key] == r.cosine
        again = ivf_topk(df, k=5, n_centroids=4, nprobe=2).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, again))
        # full probe of every cell == exact brute force
        full = ivf_topk(df, k=5, n_centroids=4, nprobe=4)
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, brute_force_topk(df, k=5).collect())
        )

    def test_ivf_cached_centroids_match_self_trained(self, spark):
        """train_ivf_centroids + ivf_topk(centroids=...) must equal the
        self-training path row-for-row, with and without Lloyd rounds
        — the repeat-query amortization path cannot change values."""
        from easyner_spark.operators.similarity import (
            ivf_topk,
            train_ivf_centroids,
        )

        import random

        rng = random.Random(17)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        for iters in (0, 2):
            cents = train_ivf_centroids(df, n_centroids=4, refine_iters=iters)
            assert len(cents) == 4
            cached = ivf_topk(df, k=5, nprobe=2, centroids=cents).collect()
            self_t = ivf_topk(
                df, k=5, n_centroids=4, nprobe=2, refine_iters=iters
            ).collect()
            assert sorted(map(tuple, cached)) == sorted(map(tuple, self_t))

    def test_ivf_score_engines_agree(self, spark):
        """The cogrouped Arrow/BLAS scorer (default) and the pure
        JVM-expression join produce IDENTICAL rows — numpy pairwise-sum
        vs sequential-fold ulp drift is absorbed by _rank_topk's
        6-decimal rounding contract (r3; same property the blocked
        brute-force relies on). Also pins the cogroup lineage-dedup
        workaround (corpus side must arrive with all columns)."""
        import random

        from easyner_spark.operators.similarity import ivf_topk

        rng = random.Random(11)
        vecs = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        for refine in (0, 2):
            pandas_rows = sorted(
                map(
                    tuple,
                    ivf_topk(
                        df, k=4, n_centroids=4, nprobe=2,
                        refine_iters=refine, score_engine="pandas",
                    ).collect(),
                )
            )
            jvm_rows = sorted(
                map(
                    tuple,
                    ivf_topk(
                        df, k=4, n_centroids=4, nprobe=2,
                        refine_iters=refine, score_engine="jvm",
                    ).collect(),
                )
            )
            assert pandas_rows == jvm_rows and pandas_rows

    def test_ivf_topk_string_ids(self, spark):
        """String vector ids survive the IVF path (type-agnostic
        tie-break via negated cosine, code-review r2)."""
        from easyner_spark.operators.similarity import brute_force_topk, ivf_topk

        import random

        rng = random.Random(3)
        vecs = [(f"v{i:02d}", [rng.uniform(-1, 1) for _ in range(6)]) for i in range(20)]
        df = spark.createDataFrame(vecs, "vec_id string, embedding array<float>")
        full = ivf_topk(df, k=3, n_centroids=4, nprobe=4)
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, brute_force_topk(df, k=3).collect())
        )

    def test_neardup_auto_bits_scale_with_corpus(self, spark):
        """n_bits='auto' sizes the prefilter so expected bucket size
        tracks target_bucket regardless of corpus size (the fix for a
        fixed bit count going quadratic as n grows)."""
        from easyner_spark.operators.similarity import embedding_neardup_pairs

        import random

        rng = random.Random(5)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(64)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        out = embedding_neardup_pairs(df, threshold=0.9, n_bits="auto", target_bucket=8)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # 64 rows / target 8 -> 3 bits -> an 8-way bucket prefilter in
        # the join condition (concat of 3 sign bits)
        assert plan.count("CASE WHEN") >= 3
        got = out.collect()
        exact = {
            (r.a, r.b): r.cosine
            for r in embedding_neardup_pairs(df, threshold=0.9, n_bits=0).collect()
        }
        for r in got:
            assert exact[(r.a, r.b)] == r.cosine

    def test_ivf_refinement_reduces_distortion(self, spark):
        """Lloyd rounds are real k-means: mean cosine distance of each
        vector to its assigned centroid is non-increasing, the refined
        index stays deterministic across runs, and results remain a
        valid top-k (exact cosines, subset-of-exact property)."""
        import random

        from pyspark.sql import functions as F

        from easyner_spark.operators.similarity import (
            _centroid_structs,
            _with_norm,
            brute_force_topk,
            ivf_topk,
        )

        rng = random.Random(11)
        # three gaussian-ish clusters in 6d
        centers = [[3, 0, 0, 0, 0, 0], [0, 3, 0, 0, 0, 0], [0, 0, 3, 0, 0, 0]]
        vecs = [
            (i, [c + rng.gauss(0, 0.4) for c in centers[i % 3]])
            for i in range(45)
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

        def distortion(refine):
            # rebuild the quantizer exactly as ivf_topk does
            slim = _with_norm(df, "vec_id", "embedding")
            cents = [
                (r["id"], list(r["v"]))
                for r in slim.select("id", "v")
                .withColumn("h", F.md5(F.col("id").cast("string")))
                .orderBy("h", "id")
                .limit(3)
                .collect()
            ]
            for _ in range(refine):
                assigned = slim.withColumn(
                    "cell", F.array_min(_centroid_structs(cents, F.col("v")))["cid"]
                )
                means = (
                    assigned.select("cell", F.posexplode("v").alias("pos", "x"))
                    .groupBy("cell", "pos")
                    .agg(F.round(F.avg("x"), 9).alias("m"))
                    .groupBy("cell")
                    .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("mv"))
                    .collect()
                )
                cents = sorted((r["cell"], [e["m"] for e in r["mv"]]) for r in means)
            scored = slim.withColumn(
                "best", F.array_min(_centroid_structs(cents, F.col("v")))["ncos"]
            )
            return scored.agg(F.avg("best")).collect()[0][0]  # avg NEGATED cos

        d0, d2 = distortion(0), distortion(2)
        assert d2 <= d0 + 1e-9  # avg(-cos) falls => cells fit tighter
        a = sorted(map(tuple, ivf_topk(df, k=3, n_centroids=3, nprobe=1, refine_iters=2).collect()))
        b = sorted(map(tuple, ivf_topk(df, k=3, n_centroids=3, nprobe=1, refine_iters=2).collect()))
        assert a == b  # deterministic across runs
        exact = {
            (r.query_id, r.neighbor_id): r.cosine
            for r in brute_force_topk(df, k=3).collect()
        }
        for qid, nid, rank, cos in a:
            if (qid, nid) in exact:
                assert exact[(qid, nid)] == cos

    def test_hyperplanes_deterministic(self):
        from easyner_spark.operators.similarity import hyperplanes

        p1, p2 = hyperplanes(4, 8), hyperplanes(4, 8)
        assert p1 == p2
        assert all(x in (1.0, -1.0) for row in p1 for x in row)


class TestTextStats:
    def test_counts_and_ratios(self, spark, docs_df):
        from easyner_spark.operators.textstats import text_stats

        out = {r.doc_id: r for r in text_stats(docs_df).collect()}
        text = DOCS[0][1]
        words = WORD_RE.findall(text.lower())
        assert out[1].n_words == len(words)
        assert out[1].n_chars == len(text)
        assert out[1].n_tokens_ws == len(text.split())
        n_alpha = sum(c.isalpha() for c in text)
        assert out[1].alpha_ratio == round(n_alpha / len(text), 6)
        stops = {"the", "and", "of", "to", "in", "is", "that", "with", "for", "was"}
        n_stop = sum(w in stops for w in words)
        assert out[1].stopword_ratio == round(n_stop / len(words), 6)
        assert out[1].mean_word_len == round(
            sum(len(w) for w in words) / len(words), 6
        )

    def test_lang_id(self, spark, docs_df):
        from easyner_spark.operators.textstats import lang_id

        out = {r.doc_id: r.lang_pred for r in lang_id(docs_df).collect()}
        assert out[1] == "en"
        assert out[5] == "de"
        assert out[6] == "und"

    def test_lang_id_cjk(self, spark):
        from easyner_spark.operators.textstats import lang_id

        df = spark.createDataFrame([(1, "这是 一个 测试 文档")], "doc_id long, text string")
        assert lang_id(df).collect()[0].lang_pred == "zh"

    def test_fingerprint_content_defined(self, spark):
        from easyner_spark.operators.textstats import fingerprint

        df = spark.createDataFrame(
            [(1, "shared content body"), (2, "shared content body"), (3, "other")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
        assert out[1] == out[2] != out[3]
        # short text: whole-string md5
        assert out[3] == hashlib.md5(b"other").hexdigest()

    def test_stats_plan_has_no_shuffle(self, spark, docs_df):
        from easyner_spark.operators.textstats import text_stats

        plan = text_stats(docs_df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestIvfRecallGate:
    def test_bench_headline_recall_floor(self, spark):
        """Recall gate for the bench's `ann_ivf` headline (VERDICT r2
        #2): at the EXACT settings bench.py runs (k=10, nprobe=8, 3
        Lloyd rounds over a pinned 10% training sample, 16 centroids)
        over the sf0.1 `embeddings` table, recall@10 vs the exact
        blocked path must hold >= 0.75 — the bench number is only
        meaningful if the approximate plan is actually retrieving the
        neighborhood."""
        import os

        from easyner_spark.operators.similarity import (
            brute_force_topk_blocked,
            ivf_topk,
        )

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk_blocked(emb, k=10).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                emb, k=10, nprobe=8, refine_iters=3, train_frac=0.1
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.75, f"ann_ivf recall@10 {recall:.3f} < 0.75"

    def test_sampled_training_deterministic_and_falls_back(self, spark):
        """Sampled quantizer training (r5, VERDICT r4 weak-item fix):
        (a) training twice on the same corpus with the same train_frac
        yields the SAME centroid list (the sample is a pinned md5
        gate, not df.sample's partition-dependent RNG); (b) a sample
        too small to seed n_centroids cells falls back to full-corpus
        training instead of silently shrinking the quantizer; (c) the
        sampled path still indexes EVERY corpus row."""
        import os

        from easyner_spark.operators.similarity import (
            ivf_topk,
            train_ivf_centroids,
        )

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        a = train_ivf_centroids(emb, refine_iters=1, train_frac=0.1)
        b = train_ivf_centroids(emb, refine_iters=1, train_frac=0.1)
        assert a == b
        full = train_ivf_centroids(emb, refine_iters=1)
        assert len(a) == len(full)
        # (b) tiny corpus, tiny fraction: sample < n_centroids rows
        tiny = emb.limit(20)
        fb = train_ivf_centroids(tiny, n_centroids=16, train_frac=0.01)
        assert fb == train_ivf_centroids(tiny, n_centroids=16)
        # (c) every query row is ranked (top-k rows per query present)
        out = ivf_topk(emb.limit(200), k=5, nprobe=2, train_frac=0.1)
        assert out.select("query_id").distinct().count() == 200


class TestParagraphDedup:
    """paragraph_dedup vs a plain-Python first-occurrence reference."""

    PDOCS = [
        (1, "alpha beta\nsubscribe now\ngamma delta"),
        (2, "epsilon zeta\nsubscribe now\nalpha beta"),   # both paras dup'd/kept mix
        (3, "subscribe now\nalpha beta"),                 # all paras seen before
        (4, "unique tail paragraph"),
        (5, ""),                                          # single empty para
        (6, "x\n\ny"),                                    # empty middle para
        (7, "\nz"),                                       # empty first para (dup of 5's)
    ]

    @staticmethod
    def py_expected(docs, min_chars=0):
        seen = {}
        rows = {}
        for did, text in docs:
            paras = text.split("\n")
            kept = []
            for i, p in enumerate(paras):
                if len(p) < min_chars:
                    kept.append(p)
                    continue
                if p not in seen:
                    seen[p] = (did, i)
                if seen[p] == (did, i):
                    kept.append(p)
            rows[did] = ("\n".join(kept), len(paras), len(kept))
        return rows

    def _run(self, spark, min_chars):
        from easyner_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(self.PDOCS, "doc_id long, text string")
        out = paragraph_dedup(df, min_para_chars=min_chars).collect()
        got = {r["doc_id"]: (r["text_dedup"], r["n_paras"], r["n_kept"]) for r in out}
        assert got == self.py_expected(self.PDOCS, min_chars)

    def test_first_occurrence_semantics(self, spark):
        self._run(spark, 0)

    def test_min_chars_bypass(self, spark):
        # empty paragraphs bypass dedup: doc 6's '' and doc 7's ''
        # both survive even though doc 5 claimed '' first
        self._run(spark, 1)

    def test_every_doc_survives(self, spark):
        from easyner_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(self.PDOCS, "doc_id long, text string")
        out = paragraph_dedup(df)
        assert out.count() == len(self.PDOCS)
        fully = {r["doc_id"]: r for r in out.collect()}
        # doc 3: every para is a global dup -> empty doc, n_kept 0
        assert fully[3]["text_dedup"] == ""
        assert fully[3]["n_kept"] == 0


class TestNeardupGroups:
    """Fuzzy-dedup composition: LSH pairs -> connected components ->
    min-id keeper. Chain semantics matter: A~B and B~C cost ONE doc,
    not two (pairwise output alone would over-remove)."""

    # 1~2~3 form one transitive near-dup chain (each adjacent pair
    # shares almost all shingles); 4 is unrelated.
    CHAIN = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "gamma delta epsilon zeta eta theta iota kappa"),
        (4, "totally unrelated words about spark adaptive execution plans"),
    ]

    def test_chain_one_group_min_keeper(self, spark):
        from easyner_spark.operators.dedup import neardup_groups

        df = spark.createDataFrame(self.CHAIN, "doc_id long, text string")
        got = {r["id"]: (r["group_id"], r["is_dup"]) for r in
               neardup_groups(df, min_est_jaccard=0.3).collect()}
        assert got[1] == (1, False)
        assert got[2] == (1, True)
        assert got[3][0] in (1, 3)  # 3 may chain through 2 or miss LSH
        assert got[4] == (4, False)
        # every input id appears exactly once
        assert set(got) == {1, 2, 3, 4}

    def test_singletons_when_no_pairs(self, spark):
        from easyner_spark.operators.dedup import neardup_groups

        df = spark.createDataFrame(
            [(10, "one two three four five six"),
             (20, "sieben acht neun zehn elf zwoelf")],
            "doc_id long, text string",
        )
        got = {r["id"]: (r["group_id"], r["is_dup"]) for r in
               neardup_groups(df).collect()}
        assert got == {10: (10, False), 20: (20, False)}


class TestIncrementalDedup:
    """Bloom-prefiltered new-vs-seen novelty: the filter changes cost,
    never values — bloom and exact paths must agree exactly."""

    SEEN = [(i, f"seen document number {i} with stable body text") for i in range(40)]
    # 0-19: exact copies of seen (must drop); 100-104: novel;
    # 200/201: in-batch dup pair (one survivor, min id)
    NEW = (
        [(1000 + i, f"seen document number {i} with stable body text") for i in range(20)]
        + [(100 + i, f"genuinely novel text {i} never crawled before") for i in range(5)]
        + [(200, "same fresh text twice"), (201, "same fresh text twice")]
    )

    def _frames(self, spark):
        seen = spark.createDataFrame(self.SEEN, "doc_id long, text string")
        new = spark.createDataFrame(self.NEW, "doc_id long, text string")
        return new, seen

    def test_bloom_matches_exact_antijoin(self, spark):
        from easyner_spark.operators.dedup import incremental_new_docs

        new, seen = self._frames(spark)
        with_bloom = {(r["id"], r["content_hash"]) for r in
                      incremental_new_docs(new, seen, use_bloom=True).collect()}
        exact = {(r["id"], r["content_hash"]) for r in
                 incremental_new_docs(new, seen, use_bloom=False).collect()}
        assert with_bloom == exact

    def test_values(self, spark):
        from easyner_spark.operators.dedup import incremental_new_docs

        new, seen = self._frames(spark)
        ids = sorted(r["id"] for r in incremental_new_docs(new, seen).collect())
        assert ids == [100, 101, 102, 103, 104, 200]

    def test_tiny_filter_false_positive_path(self, spark):
        # m_bits=64 (one word) makes nearly everything a Bloom hit ->
        # the exact re-check must still produce correct values
        from easyner_spark.operators.dedup import incremental_new_docs

        new, seen = self._frames(spark)
        out = incremental_new_docs(new, seen, m_bits=64, k=2)
        assert sorted(r["id"] for r in out.collect()) == [100, 101, 102, 103, 104, 200]

    def test_bloom_build_no_false_negatives(self, spark):
        # every inserted key must probe all-set against the built words
        from easyner_spark.operators.dedup import (
            BLOOM_K, _bloom_positions, bloom_build,
        )

        keys = spark.createDataFrame(
            [(f"k{i}",) for i in range(200)], "content_hash string"
        )
        m_bits = 1 << 12
        words = {r["word_idx"]: r["word"] for r in
                 bloom_build(keys, m_bits=m_bits).collect()}
        probes = keys.select(
            "content_hash",
            _bloom_positions(F.col("content_hash"), m_bits, BLOOM_K).alias("ps"),
        ).collect()
        for row in probes:
            for p in row["ps"]:
                assert (words.get(p["w"], 0) >> p["b"]) & 1 == 1, row["content_hash"]

    def test_column_order_and_prebuilt_bloom(self, spark):
        from easyner_spark.operators.dedup import (
            bloom_build, incremental_new_docs,
        )

        new, seen = self._frames(spark)
        a = incremental_new_docs(new, seen, use_bloom=True)
        b = incremental_new_docs(new, seen, use_bloom=False)
        assert a.columns == b.columns == ["id", "content_hash"]
        # a caller-persisted filter must reproduce the rebuilt one
        from pyspark.sql import functions as F
        seen_h = seen.select(
            F.sha2(F.col("text").cast("binary"), 256).alias("content_hash")
        )
        pre = bloom_build(seen_h, "content_hash")
        c = incremental_new_docs(new, seen, prebuilt_bloom=pre)
        assert sorted(r["id"] for r in c.collect()) == \
            sorted(r["id"] for r in a.collect())


class TestDecontaminate:
    """Benchmark n-gram overlap: bench-identical docs score 1.0, partial
    overlaps measure leaked grams, disjoint docs score 0."""

    BENCH = [(900, "one two three four five six seven eight nine ten")]
    DOCS = [
        # identical to the bench doc -> every 8-gram hits
        (1, "one two three four five six seven eight nine ten"),
        # shares the bench doc's first 8 words then diverges
        (2, "one two three four five six seven eight zebra yak xylo walrus"),
        # disjoint
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # short doc (<8 words): whole word sequence is the single gram
        (4, "one two three"),
    ]

    def _run(self, spark, **kw):
        from easyner_spark.operators.dedup import decontaminate

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        bench = spark.createDataFrame(self.BENCH, "doc_id long, text string")
        return {r["id"]: r.asDict() for r in
                decontaminate(docs, bench, n=8, threshold=0.5, **kw).collect()}

    def test_values(self, spark):
        got = self._run(spark)
        # doc 1: 10 words -> 3 distinct 8-grams, all in bench
        assert (got[1]["n_grams"], got[1]["n_hits"]) == (3, 3)
        assert got[1]["overlap_frac"] == 1.0 and got[1]["contaminated"]
        # doc 2: 12 words -> 5 grams, exactly one ("one..eight") in bench
        assert (got[2]["n_grams"], got[2]["n_hits"]) == (5, 1)
        assert got[2]["overlap_frac"] == 0.2 and not got[2]["contaminated"]
        # doc 3: nothing shared
        assert got[3]["n_hits"] == 0 and not got[3]["contaminated"]
        # doc 4: one whole-sequence gram, not a bench 8-gram
        assert (got[4]["n_grams"], got[4]["n_hits"]) == (1, 0)
        # every input doc got a row
        assert set(got) == {1, 2, 3, 4}

    def test_broadcast_off_same_values(self, spark):
        assert self._run(spark) == self._run(spark, broadcast_bench=False)

    def test_scale_plan_shape(self, spark):
        # bench grams broadcast; the corpus side pays ONE hash shuffle
        # (the per-doc rollup) — bench-side distinct is the only other
        # exchange and it is on the small side
        from easyner_spark.operators.dedup import decontaminate

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        bench = spark.createDataFrame(self.BENCH, "doc_id long, text string")
        df = decontaminate(docs, bench)
        df.collect()
        plan = (
            df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert plan.count("BroadcastExchange") == 1
        assert plan.count("Exchange hashpartitioning") <= 2


class TestPiiRedact:
    """Sequential email -> IPv4 -> phone scrub; counts are per-stage so
    categories never double-count the same characters."""

    def _run(self, spark, rows):
        from easyner_spark.operators.textstats import pii_redact

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["id"]: r.asDict() for r in pii_redact(df).collect()}

    def test_each_category(self, spark):
        got = self._run(spark, [
            (1, "write to jane.doe+x@sub.ex-a.org today"),
            (2, "server at 10.0.255.7 answered"),
            (3, "call +46 70-123 45 68 now"),
            (4, "clean text with the number 42"),
        ])
        assert got[1]["n_emails"] == 1 and got[1]["text_redacted"] == \
            "write to <EMAIL> today"
        assert got[2]["n_ips"] == 1 and got[2]["text_redacted"] == \
            "server at <IP> answered"
        assert got[3]["n_phones"] == 1 and got[3]["text_redacted"] == \
            "call <PHONE> now"
        assert got[4] == {"id": 4, "text_redacted": "clean text with the number 42",
                          "n_emails": 0, "n_ips": 0, "n_phones": 0, "has_pii": False}

    def test_sequential_no_double_count(self, spark):
        # the email's digit run disappears before the phone pass;
        # the IP is redacted before the phone pass can see its digits
        got = self._run(spark, [
            (1, "mail a1234567890@x.com plus ip 192.168.100.200 end"),
        ])
        r = got[1]
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 0)
        assert r["text_redacted"] == "mail <EMAIL> plus ip <IP> end"
        assert r["has_pii"]

    def test_multiple_matches_one_row(self, spark):
        got = self._run(spark, [(1, "a@b.se then c@d.org then 10.1.1.1 and 10.2.2.2")])
        assert got[1]["n_emails"] == 2 and got[1]["n_ips"] == 2

    def test_zero_shuffle_plan(self, spark):
        from easyner_spark.operators.textstats import pii_redact

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestLabelCentroids:
    def test_centroid_math_and_shape(self, spark):
        from easyner_spark.operators.similarity import label_centroids

        rows = [
            (1, [1.0, -2.0], 0),
            (2, [3.0, 4.0], 0),
            (3, [10.0, 0.5], 1),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        got = {(r["label"], r["dim"]): r for r in label_centroids(df).collect()}
        assert got[(0, 0)]["mean"] == 2.0 and got[(0, 0)]["n"] == 2
        assert got[(0, 1)]["mean"] == 1.0
        assert got[(1, 0)]["mean"] == 10.0 and got[(1, 1)]["mean"] == 0.5
        assert got[(0, 0)]["mean_q"] == 2_000_000

    def test_single_shuffle_plan(self, spark):
        from easyner_spark.operators.similarity import label_centroids

        df = spark.createDataFrame(
            [(1, [1.0], 0)], "vec_id long, embedding array<float>, label int"
        )
        plan = label_centroids(df)._jdf.queryExecution().executedPlan().toString()
        import re

        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


class TestSQTopk:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.01, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0]),
            (4, [0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]),
        ]
        return spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    def test_integer_ranking_hand_computed(self, spark, emb_df):
        """Per-dim bounds on this fixture give q0 codes
        [255,0,0,0,255,0,0,0]; hand-folded integer dots rank
        n1 (130050) > n4 (97410) > n2 (64770) > n3 (0)."""
        from easyner_spark.operators.similarity import sq_topk

        out = sq_topk(emb_df, k=4, dim=8)
        rows = {r.rank: r for r in out.collect() if r.query_id == 0}
        assert [rows[i].neighbor_id for i in (1, 2, 3, 4)] == [1, 4, 2, 3]
        assert rows[1].score == 130050 and rows[4].score == 0
        # everything emitted is integral: schema has no float column
        assert all(f.dataType.simpleString() == "bigint" for f in out.schema.fields)

    def test_codes_bounded_and_deterministic(self, spark, emb_df):
        from easyner_spark.operators.similarity import _sq_codes

        codes = _sq_codes(emb_df, "vec_id", "embedding", dim=8, levels=256)
        vals = [c for r in codes.collect() for c in r.code]
        assert all(0 <= c <= 255 for c in vals)
        # min/max-attaining dims hit the rail codes exactly
        by_id = {r.id: r.code for r in codes.collect()}
        assert by_id[0][0] == 255 and by_id[3][0] == 0

    def test_duckdb_oracle_parity_on_fixture(self, spark, emb_df, tmp_path):
        """The module-local oracle generator reproduces the operator
        value-for-value on an adversarial small corpus (rail values,
        negative dims, a constant-ish dim) — the same generator the
        driver runs at sf0.01."""
        import duckdb

        from easyner_spark.operators.similarity import sq_topk, sq_topk_oracle_sql

        pq = str(tmp_path / "emb.parquet")
        emb_df.write.mode("overwrite").parquet(pq)
        got = sorted(
            tuple(r) for r in sq_topk(emb_df, k=3, dim=8).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}/*.parquet')"
        )
        want = sorted(
            tuple(r) for r in con.execute(sq_topk_oracle_sql(k=3)).fetchall()
        )
        assert got == want


def test_embedding_drift_exact_and_monitorable(spark):
    from easyner_spark.operators.similarity import embedding_drift

    rows = [
        # epoch 0 centered on +x; epoch 1 identical -> cos 1.0;
        # epoch 2 flipped -> cos -1.0
        (0, [1.0, 0.0]), (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [-1.0, 0.0]), (2, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["epoch", "embedding"])
    out = {r.epoch: r for r in embedding_drift(df).collect()}
    assert out[0].cos_to_prev is None and out[0].n_vecs == 2
    assert out[1].cos_to_prev == 1.0
    assert out[2].cos_to_prev == -1.0


def test_embedding_drift_oracle_parity(spark):
    import duckdb

    from easyner_spark.operators.similarity import (
        embedding_drift,
        embedding_drift_oracle_sql,
    )

    rows = [
        (e, [((e * 7 + i * 3 + j) % 11) / 7.0 - 0.5 for j in range(4)])
        for e in range(3)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["epoch", "embedding"])
    got = sorted(tuple(r) for r in embedding_drift(df).collect())
    vals = ", ".join(
        "({}, [{}])".format(e, ", ".join(f"{x!r}::FLOAT" for x in v))
        for e, v in rows
    )
    sql = embedding_drift_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(epoch, embedding)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_kcenter_select_hand_geometry(spark):
    from easyner_spark.operators.similarity import kcenter_select

    # three tight clusters on a line: {0}, {10}, {100} (1-D embeddings)
    rows = [
        (1, [0.0]), (2, [0.001]), (3, [10.0]), (4, [10.001]),
        (5, [100.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    sel = kcenter_select(df, k=3)
    # seed = min id (1, at 0); farthest = 5 (at 100); then the 10ish
    # cluster — 4 (10.001) edges out 3 (10.0) by the quantized hair
    assert [(r, i) for r, i, _ in sel] == [(0, 1), (1, 5), (2, 4)]
    # radii non-increasing
    radii = [d for _, _, d in sel[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_select_oracle_parity(spark):
    import duckdb

    from easyner_spark.operators.similarity import (
        kcenter_select,
        kcenter_select_oracle_sql,
    )

    rows = [
        (i, [((i * 7 + j * 3) % 13) / 3.0 for j in range(4)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = kcenter_select(df, k=5)
    vals = ", ".join(
        "({}, [{}])".format(i, ", ".join(f"{x!r}::FLOAT" for x in v))
        for i, v in rows
    )
    sql = kcenter_select_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(id, embedding)", k=5
    )
    want = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert [(r, i, d) for r, i, d in got] == want


class TestSemDeDup:
    """SemDeDup (r5): within-cell semantic pruning semantics."""

    def test_duplicates_pruned_within_cell(self, spark):
        from easyner_spark.operators.similarity import semdedup

        # two tight duplicate groups + one unique vector
        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),   # ~dup of 1
            (3, [0.0, 1.0, 0.0, 0.0]),
            (4, [0.01, 0.999, 0.0, 0.0]),   # ~dup of 3
            (5, [0.0, 0.0, 1.0, 0.0]),      # unique
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = {r.id: (r.dup_of, r.kept) for r in semdedup(
            emb, threshold=0.95, n_centroids=3
        ).collect()}
        assert len(out) == 5
        kept = {i for i, (_, k) in out.items() if k}
        dropped = {i: d for i, (d, k) in out.items() if not k}
        # every vector is either kept or points at a smaller kept-ish id
        assert all(d < i for i, d in dropped.items())
        # the two near-identical pairs cannot BOTH survive if they
        # share a cell; 5 is always kept (nothing is close to it)
        assert 5 in kept and 1 in kept and 3 in kept

    def test_centroid_reuse_matches_self_train(self, spark):
        import os

        from easyner_spark.operators.similarity import (
            semdedup,
            train_ivf_centroids,
        )

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(300)
        cents = train_ivf_centroids(emb, refine_iters=0)
        a = sorted(map(tuple, semdedup(emb, threshold=0.3).collect()))
        b = sorted(map(tuple, semdedup(
            emb, threshold=0.3, centroids=cents
        ).collect()))
        assert a == b and len(a) == 300
