#!/usr/bin/env python
"""Giant-component stress tier for connected_components (VERDICT r2
next-step #4): measure the "common alias" worst case the components.py
docstring predicts — one hub linked to 30%+ of all nodes — against a
uniform small-component graph with the SAME edge count.

What the large-star/small-star claim actually promises: a giant star
does NOT melt a single reducer, because large-star points a node's
LARGER neighbors at its minimum neighbor (splitting the hub's edge set
across subtree minima) and the per-round groupBy(src).min aggregates
map-side before the shuffle. The cost of pathological topology shows up
as extra ROUNDS (diameter), not as a hot key — so the tiers report
rounds alongside wall time.

Tiers (equal edge count E, deterministic spark.range generation):
  uniform   stars of 5 nodes (E hubs of degree 4)         — baseline
  giant     one hub wired to 30% of all nodes, remaining
            edges as stars of 5                           — hot-key case
  path      one chain of `chain` nodes (diameter driver),
            remaining edges as stars of 5                 — round-count case

Contenders run INTERLEAVED round-robin (this VM's speed drifts ~2x
across minutes); first round is warm-up; per-tier median of N runs.
Prints one JSON line; paste into BASELINE.md.

Usage: CS_EDGES=800000 CS_CPUS=32 CS_REPEAT=3 CS_CHAIN=100000 \
       python tools/components_stress.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def build_tiers(spark, n_edges: int, chain: int):
    """Edge DataFrames per tier, each with exactly n_edges rows and
    node ids disjoint from each other's hub ranges."""

    def stars(n: int, offset: int = 0):
        # EXACTLY n edges for any n (the old 5n//4-range form shorted
        # the tier by up to 3 edges when n % 4 != 0, breaking the
        # equal-edge-count premise): edge i joins leaf 1 + i%4 of star
        # i//4 to that star's hub; the last star may be partial — still
        # a star, still n rows.
        ids = spark.range(n)
        hub = F.lit(offset) + F.floor(F.col("id") / 4) * 5
        return ids.select(
            (hub + 1 + F.pmod("id", F.lit(4))).alias("src"),
            hub.alias("dst"),
        )

    n_hub = (n_edges * 3) // 10  # 30% of edges = hub degree; hub
    # touches 30% of the giant tier's ~n_edges*1.25/1.0 nodes too
    giant_hub = spark.range(1, n_hub + 1).select(
        F.col("id").alias("src"), F.lit(0).alias("dst")
    )
    path = spark.range(1, chain).select(
        F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
    )
    return {
        "uniform": stars(n_edges),
        "giant": giant_hub.unionByName(stars(n_edges - n_hub, offset=10_000_000)),
        "path": path.unionByName(stars(n_edges - (chain - 1), offset=20_000_000)),
    }


def main() -> None:
    n_edges = int(os.environ.get("CS_EDGES", "800000"))
    cpus = int(os.environ.get("CS_CPUS", "32"))
    repeat = int(os.environ.get("CS_REPEAT", "3"))
    chain = int(os.environ.get("CS_CHAIN", "100000"))

    from easyner_spark.operators.components import connected_components
    from easyner_spark.session import get_spark

    spark = get_spark(
        "components_stress",
        cores=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": str(cpus),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize edge inputs to parquet so every timed run reads the
    # same canonicalizable scan (range sources don't ReuseExchange)
    tiers = {}
    for name, df in build_tiers(spark, n_edges, chain).items():
        path = f"/tmp/easyner_cstress_{name}_{n_edges}_{chain}.parquet"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df.repartition(cpus).write.mode("overwrite").parquet(path)
        tiers[name] = spark.read.parquet(path)

    runs: dict = {k: [] for k in tiers}
    rounds: dict = {k: None for k in tiers}
    for i in range(repeat + 1):
        for name, edges in tiers.items():
            st: dict = {}
            t0 = time.perf_counter()
            _force(connected_components(edges, max_iter=40, stats=st))
            dt = time.perf_counter() - t0
            rounds[name] = st.get("rounds")
            if i > 0:
                runs[name].append(dt)

    med = {k: round(statistics.median(v), 3) for k, v in runs.items()}
    print(
        json.dumps(
            {
                "metric": "components_stress",
                "edges": n_edges,
                "chain": chain,
                "cpus": cpus,
                "repeat": repeat,
                "sec": med,
                "rounds": rounds,
                "giant_over_uniform": round(med["giant"] / med["uniform"], 2),
                "path_over_uniform": round(med["path"] / med["uniform"], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
