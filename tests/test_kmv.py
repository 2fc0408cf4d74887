"""KMV / bottom-k distinct sketches and set-operation estimates
(sketches.kmv_sketch, sketches.kmv_set_ops)."""

import duckdb

from easyner_spark.operators.sketches import (
    kmv_set_ops,
    kmv_set_ops_oracle_sql,
    kmv_sketch,
    kmv_sketch_oracle_sql,
)

ROWS = [
    # g1: 5 distinct (v1 duplicated), g2: 6 distinct, overlap {v3,v4,v5}
    ("g1", "v1"), ("g1", "v1"), ("g1", "v2"), ("g1", "v3"),
    ("g1", "v4"), ("g1", "v5"),
    ("g2", "v3"), ("g2", "v4"), ("g2", "v5"), ("g2", "v6"),
    ("g2", "v7"), ("g2", "v8"),
]


def _frame(spark, rows=ROWS):
    return spark.createDataFrame(rows, "g string, v string")


def test_exact_regime(spark):
    sk = kmv_sketch(_frame(spark), "v", ["g"], k=16)
    got = {r.g: r for r in sk.collect()}
    assert (got["g1"].n_min, got["g1"].estimate) == (5, 5)
    assert (got["g2"].n_min, got["g2"].estimate) == (6, 6)
    assert got["g1"].sketch == sorted(got["g1"].sketch)
    ops = kmv_set_ops(sk, "g", k=16).collect()
    assert len(ops) == 1
    r = ops[0]
    assert (r.g_a, r.g_b) == ("g1", "g2")
    # exact: |union| = 8, |intersection| = 3
    assert (r.n_union_min, r.union_est, r.overlap) == (8, 8, 3)
    assert r.jaccard_micro == 3 * 1_000_000 // 8
    assert r.inter_est == 3
    # exact set differences: g1\g2 = {v1,v2}, g2\g1 = {v6,v7,v8}
    assert (r.a_only, r.b_only) == (2, 3)
    assert (r.a_only_est, r.b_only_est) == (2, 3)


def test_estimate_regime_and_partition_invariance(spark):
    rows = [("g", f"tok{i % 3000}") for i in range(6000)]
    df = _frame(spark, rows)
    est = kmv_sketch(df, "v", ["g"], k=64).collect()[0]
    assert est.n_min == 64
    assert abs(est.estimate - 3000) / 3000 < 0.25
    # the k smallest distinct hashes are partition-invariant
    est7 = kmv_sketch(df.repartition(7), "v", ["g"], k=64).collect()[0]
    assert est7.sketch == est.sketch and est7.estimate == est.estimate


def test_global_sketch_no_groups(spark):
    est = kmv_sketch(_frame(spark), "v", k=16).collect()[0]
    assert (est.n_min, est.estimate) == (8, 8)


def test_oracle_twins(spark):
    vals = ", ".join(f"('{g}', '{v}')" for g, v in ROWS)
    src = f"SELECT * FROM (VALUES {vals}) AS t(g, v)"
    got = sorted(
        tuple(r)
        for r in kmv_sketch(_frame(spark), "v", ["g"], k=4)
        .drop("sketch")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(kmv_sketch_oracle_sql(src, "g", "v", k=4)).fetchall()
    )
    assert got == want
    got_ops = sorted(
        tuple(r)
        for r in kmv_set_ops(
            kmv_sketch(_frame(spark), "v", ["g"], k=4), "g", k=4
        ).collect()
    )
    want_ops = sorted(
        tuple(r)
        for r in duckdb.sql(
            kmv_set_ops_oracle_sql(src, "g", "v", k=4)
        ).fetchall()
    )
    assert got_ops == want_ops


def test_null_values_carry_no_identity(spark):
    rows = [("g1", "v1"), ("g1", None), ("g1", "v2"), ("g2", None)]
    got = {r.g: r for r in kmv_sketch(_frame(spark, rows), "v", ["g"], k=8).collect()}
    # NULLs are not values: g1 counts 2, an all-NULL group vanishes
    assert set(got) == {"g1"}
    assert (got["g1"].n_min, got["g1"].estimate) == (2, 2)
    # oracle agrees on the same frame
    src = ("SELECT * FROM (VALUES ('g1', 'v1'), ('g1', NULL), "
           "('g1', 'v2'), ('g2', NULL)) AS t(g, v)")
    want = duckdb.sql(kmv_sketch_oracle_sql(src, "g", "v", k=8)).fetchall()
    assert [(r[0], r[1], r[3]) for r in want] == [("g1", 2, 2)]


def test_histogram_drift(spark):
    from easyner_spark.operators.sketches import (
        histogram_drift,
        histogram_drift_oracle_sql,
        histogram_fixed_bins,
    )
    from pyspark.sql import functions as F

    # epoch A: uniform 0..99; epoch B: shifted mass into the tail bin
    a = spark.range(100).select(F.col("id").alias("x"))
    b = spark.range(100).select((F.col("id") % 40 + 60).alias("x"))
    ha = histogram_fixed_bins(a, "x", bin_width=25, n_bins=4)
    hb = histogram_fixed_bins(b, "x", bin_width=25, n_bins=4)
    rows = {r.bin: r for r in histogram_drift(ha, hb).collect()}
    # A: 25 rows per bin (shares 250k); B: bins 0,1 empty (absent side
    # counts as zero), bins 2/3 hold 45/55 rows (shares 450k/550k)
    assert rows[0].n_b == 0 and rows[0].share_a_micro == 250_000
    assert rows[0].delta_micro == -250_000
    tv = sum(r.abs_delta_micro for r in rows.values()) // 2
    assert tv == 500_000  # half the mass moved
    # oracle twin on the same frames via VALUES
    import duckdb

    def vals(df):
        return "SELECT * FROM (VALUES " + ", ".join(
            f"({r.bin}, {r.lo}, {r.hi}, {r.n})" for r in df.collect()
        ) + ") AS h(bin, lo, hi, n)"

    got = sorted(tuple(r) for r in histogram_drift(ha, hb).collect())
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            histogram_drift_oracle_sql(vals(ha), vals(hb))
        ).fetchall()
    )
    assert got == want
