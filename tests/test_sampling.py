"""Corpus-curation operator tests (sampling.py) — expected values from
independent plain-Python implementations (hashlib.md5, manual sort/
cumsum), so these genuinely cross-validate the column expressions."""

from __future__ import annotations

import hashlib

import pytest

from easyner_spark.operators.sampling import (
    deterministic_sample,
    per_host_cap,
    sample_threshold,
    token_budget_select,
)

URLS = [f"https://site{i % 7}.example.net/p/{i}" for i in range(400)]


def py_keep(url: str, rate: float, seed: str = "") -> bool:
    h = hashlib.md5((seed + url).encode()).hexdigest()[:12]
    return h < sample_threshold(rate)


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


class TestDeterministicSample:
    def test_matches_python_md5_gate(self, spark, pages):
        got = {r["url"] for r in deterministic_sample(pages, 0.3, seed="s").collect()}
        want = {u for u in URLS if py_keep(u, 0.3, "s")}
        assert got == want
        # sane rate on 400 urls (binomial 3-sigma ≈ 0.07)
        assert 0.2 < len(got) / len(URLS) < 0.4

    def test_rate_monotone_and_deterministic(self, spark, pages):
        s_small = {r["url"] for r in deterministic_sample(pages, 0.2).collect()}
        s_big = {r["url"] for r in deterministic_sample(pages, 0.5).collect()}
        assert s_small <= s_big          # lower rate is a SUBSET: same hash, lower cut
        again = {r["url"] for r in deterministic_sample(pages, 0.2).collect()}
        assert again == s_small          # rerun picks identical rows

    def test_seeds_independent(self, spark, pages):
        a = {r["url"] for r in deterministic_sample(pages, 0.3, seed="a").collect()}
        b = {r["url"] for r in deterministic_sample(pages, 0.3, seed="b").collect()}
        assert a != b

    def test_edge_rates(self, spark, pages):
        assert deterministic_sample(pages, 0.0).count() == 0
        assert deterministic_sample(pages, 1.0).count() == len(URLS)


ROWS = [
    # host, url, quality — ties on quality within h1 exercise url tie-break
    ("h1", "u1", 5.0), ("h1", "u2", 5.0), ("h1", "u3", 7.0), ("h1", "u4", 1.0),
    ("h2", "u5", 2.0), ("h2", "u6", 3.0),
    ("h3", "u7", 9.0),
]


class TestPerHostCap:
    @staticmethod
    def py_cap(rows, cap):
        out = {}
        by_host: dict[str, list] = {}
        for h, u, q in rows:
            by_host.setdefault(h, []).append((u, q))
        for h, items in by_host.items():
            ranked = sorted(items, key=lambda t: (-t[1], t[0]))[:cap]
            for rank, (u, q) in enumerate(ranked, 1):
                out[u] = rank
        return out

    def test_cap_and_tiebreak(self, spark):
        df = spark.createDataFrame(ROWS, "host string, url string, quality double")
        out = per_host_cap(df, cap=2, id_col="url", keep_rank=True).collect()
        got = {r["url"]: r["host_rank"] for r in out}
        assert got == self.py_cap(ROWS, 2)
        # h1 kept exactly cap rows: u3 (7.0) then u1 (5.0, url < u2)
        assert got.keys() >= {"u3", "u1"} and "u2" not in got and "u4" not in got

    def test_rank_col_dropped_by_default(self, spark):
        df = spark.createDataFrame(ROWS, "host string, url string, quality double")
        assert "host_rank" not in per_host_cap(df, cap=1, id_col="url").columns


class TestTokenBudget:
    DOCS = [
        # id, quality, n_tokens
        (1, 9.0, 100), (2, 8.0, 200), (3, 8.0, 50), (4, 5.0, 400), (5, 1.0, 10),
    ]

    def _run(self, spark, budget, **kw):
        df = spark.createDataFrame(self.DOCS, "doc_id long, quality double, n_tokens long")
        out = token_budget_select(df, budget=budget, **kw)
        return {r["doc_id"]: r["cum_tokens"] for r in out.collect()}

    def test_prefix_by_quality(self, spark):
        # order: 1 (100), 2 (200, id<3 at q=8), 3 (50), 4 (400), 5 (10)
        assert self._run(spark, 350) == {1: 100, 2: 300, 3: 350}

    def test_atomic_documents_never_split(self, spark):
        # budget 349: doc 3 would land exactly at 350 > 349 — dropped,
        # and so is everything after it (prefix semantics, no skip-fill)
        assert self._run(spark, 349) == {1: 100, 2: 300}

    def test_budget_zero(self, spark):
        assert self._run(spark, 0) == {}

    def test_strategies_agree(self, spark):
        # distributed two-pass prefix sum == naive global window,
        # including with more partitions than rows (empty partitions)
        for budget in (0, 349, 350, 100000):
            assert self._run(spark, budget, num_partitions=7) == self._run(
                spark, budget, strategy="window"
            )

    def test_distributed_at_scale_shape(self, spark):
        # 2k docs across 16 range partitions; python reference cumsum
        docs = [(i, float((i * 13) % 97), 10 + i % 50) for i in range(2000)]
        df = spark.createDataFrame(docs, "doc_id long, quality double, n_tokens long")
        got = {
            r["doc_id"]: r["cum_tokens"]
            for r in token_budget_select(df, 40_000, num_partitions=16).collect()
        }
        acc, want = 0, {}
        for i, q, t in sorted(docs, key=lambda d: (-d[1], d[0])):
            acc += t
            if acc > 40_000:
                break
            want[i] = acc
        assert got == want


class TestPackSequences:
    ROWS = [(1, 300), (2, 300), (3, 100), (4, 512), (5, 1)]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, n_tokens long")

    def test_hand_computed_packing(self, spark):
        """Stream positions: 0, 300, 600, 700, 1212 at capacity 512 ->
        windows 0,0,1,1,2; doc 4 (512 tokens at offset 188) spans
        windows 1-2 but is ASSIGNED to its start window (concat
        packing never truncates)."""
        from easyner_spark.operators.sampling import pack_sequences

        got = {
            r.doc_id: (r.start_tok, r.seq_id, r.seq_off)
            for r in pack_sequences(self._df(spark), capacity=512).collect()
        }
        assert got == {
            1: (0, 0, 0),
            2: (300, 0, 300),
            3: (600, 1, 88),
            4: (700, 1, 188),
            5: (1212, 2, 188),
        }

    def test_window_twin_parity_and_exact_multiple(self, spark):
        """Distributed two-pass == serial window twin, including a
        start_tok that is an EXACT multiple of capacity (the
        floor-on-doubles trap `div` exists to avoid)."""
        from easyner_spark.operators.sampling import (
            pack_sequences,
            release_token_budget_caches,
        )

        rows = [(i, 256) for i in range(1, 9)]  # starts 0,256,512,...
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        dist = sorted(map(tuple, pack_sequences(df, capacity=512).collect()))
        win = sorted(
            map(tuple, pack_sequences(df, capacity=512, strategy="window").collect())
        )
        assert dist == win
        assert [t[3] for t in dist] == [0, 0, 1, 1, 2, 2, 3, 3]
        release_token_budget_caches()

    def test_distributed_plan_has_no_single_partition(self, spark):
        from easyner_spark.operators.sampling import (
            pack_sequences,
            release_token_budget_caches,
        )

        out = pack_sequences(self._df(spark), capacity=512)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        assert "rangepartitioning" in plan
        release_token_budget_caches()
