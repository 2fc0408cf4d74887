"""Skew handling evidence (north_rule: "handles URL-host skew via
salted repartitioning and AQE skew-join splitting").

Salted variants are value-pinned elsewhere (TestSaltedRollup, nel
tests) and measured in BASELINE.md; here the OTHER leg: AQE's
skew-join splitting genuinely activates on a hot-key sort-merge join
once the skewed partition crosses the (test-lowered) threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",   # force SMJ
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_hot_key_join(spark, tmp_path):
    # hot fact side: 50k rows on ONE host key, a trickle elsewhere
    fact = spark.range(0, 52_000).select(
        F.when(F.col("id") < 50_000, F.lit("hot.example.com"))
        .otherwise(F.concat(F.lit("host-"), (F.col("id") % 97).cast("string")))
        .alias("host"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.createDataFrame(
        [("hot.example.com", 1)] + [(f"host-{i}", 0) for i in range(97)],
        "host string, flag int",
    )
    fpath, dpath = str(tmp_path / "fact.parquet"), str(tmp_path / "dim.parquet")
    fact.write.parquet(fpath)
    dim.write.parquet(dpath)

    old = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    try:
        joined = spark.read.parquet(fpath).join(spark.read.parquet(dpath), "host")
        # collect() (not count()) so joined's OWN queryExecution runs
        # and its AQE plan finalizes
        assert len(joined.collect()) == 52_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        # AQE marks the split join + reader: SortMergeJoin(skew=true)
        # reading AQEShuffleRead skewed partition splits
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
