"""Writer-parity suite: the SAME checkpoint scenarios against the
parquet SnapshotTable (always) and the real-Iceberg twin (skipped
where the iceberg-spark-runtime jar / catalog conf are absent — this
sandbox; configure spark.sql.catalog.local per
easyner_spark/sinks/iceberg.py and both halves run).

The parquet half is NOT redundant with test_checkpoint.py: it pins
that the scenarios exercised here stay writer-agnostic (no use of
parquet-twin-only surface), which is what makes the Iceberg swap a
one-constructor change.
"""

from __future__ import annotations

import uuid

import pytest

from easyner_spark.sinks.checkpoint import SnapshotTable
from easyner_spark.sinks.iceberg import IcebergSnapshotTable, iceberg_available


def _parquet_factory(spark, tmp_path):
    def make(name, key_cols):
        return SnapshotTable(str(tmp_path / name), key_cols)

    return make


def _iceberg_factory(spark, tmp_path):
    def make(name, key_cols):
        ident = f"local.db.{name}_{uuid.uuid4().hex[:8]}"
        return IcebergSnapshotTable(spark, ident, key_cols)

    return make


@pytest.fixture(params=["parquet", "iceberg"])
def table_factory(request, spark, tmp_path):
    if request.param == "iceberg":
        if not iceberg_available(spark, "local"):
            pytest.skip(
                "iceberg-spark-runtime jar / spark.sql.catalog.local not "
                "configured (see easyner_spark/sinks/iceberg.py)"
            )
        return _iceberg_factory(spark, tmp_path)
    return _parquet_factory(spark, tmp_path)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


class TestWriterParity:
    def test_merge_last_wins(self, spark, table_factory):
        t = table_factory("merge", ["k"])
        t.merge(_rows(spark, [("a", 1), ("b", 2)]))
        t.merge(_rows(spark, [("b", 20), ("c", 3)]))
        got = {r.k: r.v for r in t.read(spark).collect()}
        assert got == {"a": 1, "b": 20, "c": 3}

    def test_additive_epoch_guard_and_replay(self, spark, table_factory):
        t = table_factory("add", ["k"])
        t.merge_additive(_rows(spark, [("a", 1), ("b", 2)]), ["v"], epoch=1)
        t.merge_additive(_rows(spark, [("a", 10)]), ["v"], epoch=2)
        # replayed epoch must be a no-op
        t.merge_additive(_rows(spark, [("a", 10)]), ["v"], epoch=2)
        got = {r.k: r.v for r in t.read(spark).collect()}
        assert got == {"a": 11, "b": 2}
        assert t.current_epoch() == 2

    def test_rollback_restores_data_and_epoch(self, spark, table_factory):
        t = table_factory("rb", ["k"])
        t.merge_additive(_rows(spark, [("a", 1)]), ["v"], epoch=1)
        snap1 = t.current_snapshot()
        t.merge_additive(_rows(spark, [("a", 100)]), ["v"], epoch=2)
        assert {r.k: r.v for r in t.read(spark).collect()} == {"a": 101}
        t.rollback(snap1)
        assert {r.k: r.v for r in t.read(spark).collect()} == {"a": 1}
        # epoch restored with the lineage: epoch-2 data may now REPLAY
        assert t.current_epoch() == 1
        t.merge_additive(_rows(spark, [("a", 100)]), ["v"], epoch=2)
        assert {r.k: r.v for r in t.read(spark).collect()} == {"a": 101}

    def test_time_travel_read(self, spark, table_factory):
        t = table_factory("tt", ["k"])
        t.merge(_rows(spark, [("a", 1)]))
        snap1 = t.current_snapshot()
        t.merge(_rows(spark, [("a", 2)]))
        old = t.read_snapshot(spark, snap1)
        assert {r.k: r.v for r in old.collect()} == {"a": 1}
        # pointer unmoved
        assert {r.k: r.v for r in t.read(spark).collect()} == {"a": 2}

    def test_history_grows_monotonically(self, spark, table_factory):
        t = table_factory("hist", ["k"])
        t.merge(_rows(spark, [("a", 1)]))
        h1 = t.history()
        t.merge(_rows(spark, [("b", 2)]))
        h2 = t.history()
        assert len(h2) == len(h1) + 1 and set(h1) <= set(h2)

    def test_unknown_snapshot_rejected(self, spark, table_factory):
        t = table_factory("bad", ["k"])
        t.merge(_rows(spark, [("a", 1)]))
        with pytest.raises(ValueError, match="unknown snapshot"):
            t.rollback(10**12)

    def test_expire_snapshots_retention(self, spark, table_factory):
        t = table_factory("exp", ["k"])
        for i in range(1, 5):
            t.overwrite(_rows(spark, [("a", i)]))
        hist = t.history()
        assert len(hist) == 4
        expired = t.expire_snapshots(keep_last=2)
        assert expired == hist[:2]
        assert t.history() == hist[2:]
        assert {r.v for r in t.read(spark).collect()} == {4}
        with pytest.raises(ValueError):
            t.read_snapshot(spark, hist[0])

    def test_expire_keeps_everything_when_short(self, spark, table_factory):
        t = table_factory("exps", ["k"])
        t.overwrite(_rows(spark, [("a", 1)]))
        assert t.expire_snapshots(keep_last=5) == []
        assert len(t.history()) == 1
        with pytest.raises(ValueError):
            t.expire_snapshots(keep_last=0)
