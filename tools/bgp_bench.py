"""Measured payoff of cost-based BGP join ordering on a skewed KG.

Builds a synthetic KG with the predicate skew every real KG has
(one dense predicate dominating the edge count, rare predicates a
few rows), runs the same 3-pattern chain query with (a) the
syntactic literal-count order and (b) bgp_stats System-R order,
interleaved round-robin per the repo's measurement protocol (this
VM drifts ~2x across minutes; never time contenders in separate
windows). Prints one JSON line.

    python tools/bgp_bench.py          # defaults: 2M dense rows
    BGP_DENSE=500000 python tools/bgp_bench.py
"""

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from easyner_spark.operators.triples import bgp_stats, match_patterns  # noqa: E402
from easyner_spark.session import get_spark  # noqa: E402


def build_kg(spark, dense_rows: int):
    """'follows' is dense (dense_rows edges over 50k nodes);
    'works_for' is rare (500 edges); 'located_in' tiny (40)."""
    n_nodes = 50_000

    def dense(pred: str, mult: int):
        return spark.range(dense_rows).select(
            F.concat(F.lit("n"), (F.col("id") % n_nodes).cast("string")).alias(
                "subj_id"
            ),
            F.lit(pred).alias("pred"),
            F.concat(
                F.lit("n"),
                ((F.col("id") * mult + 13) % n_nodes).cast("string"),
            ).alias("obj_id"),
        )

    tiny = spark.range(40).select(
        F.concat(F.lit("n"), (F.col("id") * 1251).cast("string")).alias(
            "subj_id"
        ),
        F.lit("located_in").alias("pred"),
        F.concat(F.lit("city"), (F.col("id") % 7).cast("string")).alias(
            "obj_id"
        ),
    )
    return (
        dense("follows", 7919)
        .unionByName(dense("cites", 104729))
        .unionByName(tiny)
    )


def main() -> None:
    dense_rows = int(os.environ.get("BGP_DENSE", "2000000"))
    reps = int(os.environ.get("BGP_REPEAT", "3"))
    spark = get_spark(
        "bgp-bench",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/bgp_bench_kg_{dense_rows}.parquet"
    if not os.path.exists(path):
        build_kg(spark, dense_rows).write.mode("overwrite").parquet(path)
    edges = spark.read.parquet(path)

    # The chain: ?a follows ?b, ?b cites ?c, ?c located_in ?d.
    # Every pattern has exactly ONE literal (the predicate), so the
    # syntactic heuristic tie-breaks on INPUT ORDER and seeds at the
    # dense 'follows' scan — joining the two dense relations first
    # (an ~(rows/nodes)^2-per-key intermediate blowup) before the
    # 40-row located_in filter cuts it. The stats order seeds at
    # located_in and works backward, so the dense tables are only
    # ever probed through the bound key set.
    pats = [
        ("?a", "follows", "?b"),
        ("?b", "cites", "?c"),
        ("?c", "located_in", "?d"),
    ]
    stats = bgp_stats(edges)

    def run(use_stats: bool) -> float:
        t0 = time.monotonic()
        match_patterns(edges, pats, stats=stats if use_stats else None).count()
        return round(time.monotonic() - t0, 3)

    # warm both once, then interleave
    run(False), run(True)
    syntactic, costed = [], []
    for _ in range(reps):
        syntactic.append(run(False))
        costed.append(run(True))
    syn = sorted(syntactic)[reps // 2]
    cst = sorted(costed)[reps // 2]
    print(
        json.dumps(
            {
                "metric": "bgp_join_order",
                "dense_rows": dense_rows,
                "stats": stats,
                "syntactic_sec": syn,
                "cost_based_sec": cst,
                "speedup": round(syn / cst, 2) if cst > 0 else None,
                "reps": {"syntactic": syntactic, "cost_based": costed},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
