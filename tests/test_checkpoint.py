"""Checkpoint/resume semantics (SURVEY §5.2.6): kill mid-run, re-run,
assert byte-identical final tables; last-wins merge parity with the
reference's dict-merge (scripts/util.py:15)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from easyner_spark.sinks.checkpoint import SnapshotTable, resumable_run


@pytest.fixture()
def tmp_table(tmp_path):
    def make(name, keys):
        return SnapshotTable(str(tmp_path / name), keys)

    return make


class TestSnapshotTable:
    def test_merge_last_wins(self, spark, tmp_table):
        t = tmp_table("t", ["url"])
        t.merge(spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, v int"))
        t.merge(spark.createDataFrame([("u2", 20), ("u3", 3)], "url string, v int"))
        got = {r.url: r.v for r in t.read(spark).collect()}
        assert got == {"u1": 1, "u2": 20, "u3": 3}

    def test_snapshots_and_rollback(self, spark, tmp_table):
        t = tmp_table("t", ["url"])
        s1 = t.merge(spark.createDataFrame([("u1", 1)], "url string, v int"))
        s2 = t.merge(spark.createDataFrame([("u1", 99)], "url string, v int"))
        assert t.history() == [s1, s2]
        assert t.read(spark).collect()[0].v == 99
        t.rollback(s1)
        assert t.read(spark).collect()[0].v == 1
        with pytest.raises(ValueError):
            t.rollback(42)

    def test_unreadable_before_first_commit(self, spark, tmp_table):
        assert tmp_table("t", ["url"]).read(spark) is None


class TestResumableRun:
    @pytest.fixture()
    def inputs(self, spark):
        rows = [(f"u{i}", i % 4, i * 10) for i in range(40)]
        return spark.createDataFrame(rows, "url string, batch int, v int")

    @staticmethod
    def process(df):
        return df.select("url", "batch", (F.col("v") * 2).alias("v2"))

    def test_full_run_then_noop_rerun(self, spark, inputs, tmp_table):
        table, lineage, metrics = (
            tmp_table("data", ["url"]),
            tmp_table("lineage", ["batch_id"]),
            tmp_table("metrics", ["batch_id", "partition_id"]),
        )
        ran = resumable_run(spark, inputs, "batch", self.process, table, lineage, metrics)
        assert ran == ["0", "1", "2", "3"]
        assert table.read(spark).count() == 40
        lin = {r.batch_id: r for r in lineage.read(spark).collect()}
        assert set(lin) == {"0", "1", "2", "3"}
        assert all(r.n_rows == 10 and r.status == "done" for r in lin.values())
        # metrics: per-partition rows sum to lineage rows
        m = metrics.read(spark).groupBy("batch_id").agg(F.sum("n_rows").alias("s")).collect()
        assert all(r.s == 10 for r in m)
        # re-run: everything already done -> no work, identical table
        assert resumable_run(spark, inputs, "batch", self.process, table, lineage, metrics) == []
        assert table.read(spark).count() == 40

    def test_kill_and_resume_identical(self, spark, inputs, tmp_table):
        table, lineage = tmp_table("data", ["url"]), tmp_table("lineage", ["batch_id"])

        boom = {"after": 2, "n": 0}

        def failing_process(df):
            if boom["n"] >= boom["after"]:
                raise RuntimeError("simulated kill")
            boom["n"] += 1
            return self.process(df)

        with pytest.raises(RuntimeError):
            resumable_run(spark, inputs, "batch", failing_process, table, lineage)
        assert table.read(spark).count() == 20          # two batches committed
        done_before = {r.batch_id for r in lineage.read(spark).collect()}
        assert done_before == {"0", "1"}

        # resume with the healthy process: only the missing batches run
        ran = resumable_run(spark, inputs, "batch", self.process, table, lineage)
        assert ran == ["2", "3"]

        # final table identical to a one-shot run
        oneshot = tmp_table("oneshot", ["url"])
        resumable_run(spark, inputs, "batch", self.process, oneshot, tmp_table("l2", ["batch_id"]))
        a = sorted(map(tuple, table.read(spark).collect()))
        b = sorted(map(tuple, oneshot.read(spark).collect()))
        assert a == b

    def test_reprocessing_batch_is_idempotent(self, spark, inputs, tmp_table):
        """Force-reprocess a completed batch (lineage wiped): last-wins
        merge keeps the table deduplicated on the key."""
        table, lineage = tmp_table("data", ["url"]), tmp_table("lineage", ["batch_id"])
        resumable_run(spark, inputs, "batch", self.process, table, lineage)
        fresh_lineage = tmp_table("lineage2", ["batch_id"])
        resumable_run(spark, inputs, "batch", self.process, table, fresh_lineage)
        assert table.read(spark).count() == 40  # no dupes after double-processing


class TestEpochedAdditiveMerge:
    def test_replayed_epoch_is_noop(self, spark, tmp_table):
        """ADVICE r1: the epoch id commits atomically with the additive
        snapshot, so replaying the SAME epoch (crash before any
        downstream marker) cannot double-count."""
        t = tmp_table("edges", ["k"])
        delta = spark.createDataFrame([("a", 2), ("b", 1)], "k string, n int")
        s1 = t.merge_additive(delta, sum_cols=["n"], epoch=0)
        assert t.current_epoch() == 0
        # crash-window replay: same epoch again -> no-op, same snapshot
        assert t.merge_additive(delta, sum_cols=["n"], epoch=0) == s1
        assert {r.k: r.n for r in t.read(spark).collect()} == {"a": 2, "b": 1}
        # next epoch folds normally
        t.merge_additive(delta, sum_cols=["n"], epoch=1)
        assert {r.k: r.n for r in t.read(spark).collect()} == {"a": 4, "b": 2}
        assert t.current_epoch() == 1
        # and an older epoch arriving late is also refused
        t.merge_additive(delta, sum_cols=["n"], epoch=0)
        assert {r.k: r.n for r in t.read(spark).collect()} == {"a": 4, "b": 2}

    def test_pointer_backward_compat(self, spark, tmp_table):
        """Epoch-less commits keep the plain pointer format."""
        t = tmp_table("t", ["k"])
        t.merge_additive(
            spark.createDataFrame([("a", 1)], "k string, n int"), sum_cols=["n"]
        )
        assert t.current_epoch() is None
        assert t.current_snapshot() == 1


class TestBucketedJoin:
    def test_colocated_join_no_exchange(self, spark, tmp_path):
        """Both sides bucketed+sorted on the join key -> SortMergeJoin
        with ZERO Exchange (and zero Sort) in the final plan; the same
        join from plain path reads shuffles both sides."""
        import uuid

        from pyspark.sql import functions as F

        from easyner_spark.sinks.bucketed import read_table, write_bucketed

        sfx = uuid.uuid4().hex[:8]
        sents = spark.range(0, 500).select(
            F.concat(F.lit("u"), (F.col("id") % 50).cast("string")).alias("url"),
            F.col("id").alias("sent_idx"),
        )
        ments = sents.where("sent_idx % 3 = 0").withColumn("mention", F.lit("m"))
        try:
            write_bucketed(sents, f"b_sents_{sfx}", ["url"], n_buckets=4)
            write_bucketed(ments, f"b_ments_{sfx}", ["url"], n_buckets=4)
            joined = read_table(spark, f"b_sents_{sfx}").join(
                read_table(spark, f"b_ments_{sfx}"), "url"
            )
            # force the merge-join path: the point is bucket co-location,
            # not broadcastability of a toy table
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                assert len(joined.collect()) > 0
                plan = joined._jdf.queryExecution().executedPlan().toString()
                plan = plan.split("== Initial Plan ==")[0]
                assert "SortMergeJoin" in plan
                assert "Exchange" not in plan, plan
                # un-bucketed twin shuffles both sides
                plain = sents.join(ments, "url")
                plain.collect()
                pplan = plain._jdf.queryExecution().executedPlan().toString()
                pplan = pplan.split("== Initial Plan ==")[0]
                assert "Exchange hashpartitioning" in pplan
            finally:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        finally:
            spark.sql(f"DROP TABLE IF EXISTS b_sents_{sfx}")
            spark.sql(f"DROP TABLE IF EXISTS b_ments_{sfx}")


class TestEpochCarryForward:
    def test_lastwins_merge_preserves_epoch(self, spark, tmp_table):
        """A merge()/overwrite()/rollback() on an epoch-carrying table
        must not erase the replay-protection epoch (code-review r2)."""
        t = tmp_table("edges", ["k"])
        delta = spark.createDataFrame([("a", 2)], "k string, n int")
        t.merge_additive(delta, sum_cols=["n"], epoch=42)
        assert t.current_epoch() == 42
        t.merge(spark.createDataFrame([("a", 9)], "k string, n int"))
        assert t.current_epoch() == 42
        t.overwrite(spark.createDataFrame([("a", 1)], "k string, n int"))
        assert t.current_epoch() == 42
        t.rollback(1)
        assert t.current_epoch() == 42
        # epoch-less additive fold also keeps it
        t.merge_additive(delta, sum_cols=["n"])
        assert t.current_epoch() == 42
        # and the replay guard still holds after all of that
        before = {r.k: r.n for r in t.read(spark).collect()}
        t.merge_additive(delta, sum_cols=["n"], epoch=42)
        assert {r.k: r.n for r in t.read(spark).collect()} == before


class TestRollbackRestoresEpoch:
    def test_rollback_reopens_replay_of_undone_epochs(self, spark, tmp_table):
        """ADVICE r2: rollback must restore the epoch committed WITH the
        target snapshot — carrying the latest epoch backwards would make
        merge_additive guard-skip the replay of exactly the epochs the
        rollback undid, losing their contributions forever."""
        t = tmp_table("edges", ["k"])
        d = lambda n: spark.createDataFrame([("a", n)], "k string, n int")
        s1 = t.merge_additive(d(1), sum_cols=["n"], epoch=0)   # a=1
        t.merge_additive(d(10), sum_cols=["n"], epoch=1)       # a=11
        t.merge_additive(d(100), sum_cols=["n"], epoch=2)      # a=111

        t.rollback(s1)
        assert t.current_epoch() == 0  # epoch travels WITH the snapshot
        assert {r.k: r.n for r in t.read(spark).collect()} == {"a": 1}

        # replay of the undone epochs now folds instead of no-op'ing
        t.merge_additive(d(10), sum_cols=["n"], epoch=1)
        t.merge_additive(d(100), sum_cols=["n"], epoch=2)
        assert {r.k: r.n for r in t.read(spark).collect()} == {"a": 111}
        assert t.current_epoch() == 2

    def test_rollback_to_epochless_snapshot(self, spark, tmp_table):
        t = tmp_table("t", ["k"])
        s1 = t.merge(spark.createDataFrame([("a", 1)], "k string, v int"))
        t.merge_additive(
            spark.createDataFrame([("a", 5)], "k string, v int"),
            sum_cols=["v"],
            epoch=7,
        )
        t.rollback(s1)
        assert t.current_epoch() is None
        assert t.current_snapshot() == s1

    def test_time_travel_read(self, spark, tmp_table):
        import pytest

        t = tmp_table("tt", ["k"])
        s1 = t.merge(spark.createDataFrame([("a", 1)], "k string, v int"))
        s2 = t.merge(spark.createDataFrame([("a", 2)], "k string, v int"))
        # historical snapshot readable without moving the pointer
        assert {r.k: r.v for r in t.read_snapshot(spark, s1).collect()} == {
            "a": 1
        }
        assert t.current_snapshot() == s2
        assert {r.k: r.v for r in t.read(spark).collect()} == {"a": 2}
        with pytest.raises(ValueError):
            t.read_snapshot(spark, 999)


class TestTableMaintenance:
    def test_expire_never_drops_current_after_rollback(self, spark, tmp_table):
        t = tmp_table("exp_rb", ["k"])
        snaps = [
            t.overwrite(spark.createDataFrame([("a", i)], "k string, v int"))
            for i in range(1, 5)
        ]
        t.rollback(snaps[1])
        expired = t.expire_snapshots(keep_last=1)
        # newest snapshot retained by keep_last, live snapshot retained
        # unconditionally
        assert set(expired) == {snaps[0], snaps[2]}
        assert t.history() == [snaps[1], snaps[3]]
        assert {r.v for r in t.read(spark).collect()} == {2}

    def test_orphan_cleanup(self, spark, tmp_table):
        import os

        t = tmp_table("orph", ["k"])
        s1 = t.merge(spark.createDataFrame([("a", 1)], "k string, v int"))
        # simulate writers killed between tmp write and os.replace
        debris_root = os.path.join(t.path, ".current.deadbeef")
        debris_snap = os.path.join(t.path, f"snap-{s1:06d}", "._epoch.cafe")
        for p in (debris_root, debris_snap):
            with open(p, "w", encoding="utf-8") as f:
                f.write("junk")
        assert t.orphan_files() == [
            ".current.deadbeef",
            os.path.join(f"snap-{s1:06d}", "._epoch.cafe"),
        ]
        removed = t.remove_orphans()
        assert len(removed) == 2 and t.orphan_files() == []
        # table state untouched
        assert t.current_snapshot() == s1
        assert {r.v for r in t.read(spark).collect()} == {1}
