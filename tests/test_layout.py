"""Z-order clustering + manifest file pruning (sinks/layout.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from easyner_spark.sinks.layout import (
    plan_files,
    pruned_read,
    write_clustered,
    zorder_key,
    zorder_key_sql,
)


def _grid(spark):
    """The full 64x64 grid, one row per cell."""
    return spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_key_locality_and_oracle(spark):
    got = {
        (r.x, r.y): r.z
        for r in _grid(spark)
        .select("x", "y", zorder_key(["x", "y"], bits=6).alias("z"))
        .collect()
    }
    # interleave: x bits at even positions, y bits at odd
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 5)] == 0b100111  # x=011, y=101 -> z=1 0 0 1 1 1
    want = {
        (x, y): z
        for x, y, z in duckdb.sql(
            "SELECT x, y, "
            + zorder_key_sql(["x", "y"], bits=6)
            + " AS z FROM (SELECT range % 64 AS x, range // 64 AS y "
            "FROM range(0, 4096))"
        ).fetchall()
    }
    assert got == want


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("layout")
    zp, lp = str(root / "z"), str(root / "lin")
    nz = write_clustered(_grid(spark), zp, ["x", "y"], 16, "zorder", bits=6)
    nl = write_clustered(_grid(spark), lp, ["x", "y"], 16, "linear")
    return zp, lp, nz, nl


def test_pruning_beats_linear_on_second_dim(spark, layouts):
    zp, lp, nz, nl = layouts
    assert nz == 16 and nl == 16
    box_y = {"y": (16, 31)}
    z_kept, z_total = plan_files(spark, zp, box_y)
    l_kept, l_total = plan_files(spark, lp, box_y)
    # linear (sorted by x) cannot skip anything for a y-only box
    assert len(l_kept) == l_total == 16
    # z-order keeps every dimension partially local
    assert len(z_kept) <= 8 < 16 and z_total == 16
    # an x-box prunes under BOTH layouts
    box_x = {"x": (0, 15)}
    assert len(plan_files(spark, zp, box_x)[0]) <= 8
    assert len(plan_files(spark, lp, box_x)[0]) <= 8


def test_pruned_read_exactly_matches_full_scan(spark, layouts):
    zp, _, _, _ = layouts
    box = {"x": (10, 25), "y": (40, 50)}
    got = sorted(
        (r.x, r.y, r.payload) for r in pruned_read(spark, zp, box).collect()
    )
    want = sorted(
        (r.x, r.y, r.payload)
        for r in _grid(spark)
        .where("x BETWEEN 10 AND 25 AND y BETWEEN 40 AND 50")
        .collect()
    )
    assert got == want and len(got) == 16 * 11


def test_pruned_read_empty_box(spark, layouts):
    zp, _, _, _ = layouts
    out = pruned_read(spark, zp, {"x": (1000, 2000)})
    assert out.count() == 0
    assert set(out.columns) == {"x", "y", "payload"}


def test_bad_args(spark):
    with pytest.raises(ValueError):
        zorder_key_sql([], bits=6)
    with pytest.raises(ValueError):
        zorder_key_sql(["a", "b"], bits=32)
    with pytest.raises(ValueError):
        write_clustered(_grid(spark), "/tmp/x", ["x"], 4, layout="hilbert")


class TestBloomManifest:
    @pytest.fixture(scope="class")
    def bloom_path(self, spark, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("layout_bloom") / "t")
        # 4096 rows, each with a high-cardinality url-like key whose
        # min/max box is useless for pruning
        df = _grid(spark).withColumn(
            "url", F.concat(F.lit("https://h"), F.col("payload") % 50,
                            F.lit(".org/p/"), F.col("payload"))
        )
        write_clustered(df, path, ["x", "y"], 16, "zorder", bits=6,
                        bloom_cols=["url"])
        return path

    def test_point_lookup_prunes_files(self, spark, bloom_path):
        kept, total = plan_files(
            spark, bloom_path, equals={"url": "https://h7.org/p/7"}
        )
        # the key lives in exactly one file; bloom false positives may
        # keep a few more, never most
        assert total == 16 and 1 <= len(kept) <= 4

    def test_point_lookup_exactly_matches_full_scan(self, spark, bloom_path):
        got = [
            (r.x, r.y, r.payload)
            for r in pruned_read(
                spark, bloom_path, equals={"url": "https://h7.org/p/7"}
            ).collect()
        ]
        assert got == [(7 % 64, 7 // 64, 7)]

    def test_absent_key_reads_nothing_or_false_positives_only(
        self, spark, bloom_path
    ):
        out = pruned_read(
            spark, bloom_path, equals={"url": "https://absent.example/x"}
        )
        assert out.count() == 0

    def test_combined_box_and_point(self, spark, bloom_path):
        got = pruned_read(
            spark, bloom_path,
            ranges={"x": (0, 63)}, equals={"url": "https://h9.org/p/9"},
        ).collect()
        assert [(r.x, r.y, r.payload) for r in got] == [(9, 0, 9)]
