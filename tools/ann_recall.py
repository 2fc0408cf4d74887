#!/usr/bin/env python
"""ANN recall/efficiency report: recall@k of the bucketed ANN paths
(sign-LSH multi-probe, IVF-flat nprobe) against exact brute force,
alongside the candidate-pairs-scored count (the cost knob the recall
buys down). Prints one JSON line; the table lives in BASELINE.md.

The sf embeddings are ISOTROPIC synthetic vectors — the hardest case
for bucketed ANN (cosines concentrate, so 'nearest' is barely
structured); real text/image embeddings cluster and recall is far
higher at the same probe depth. Treat these numbers as the floor.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/ann_recall.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from easyner_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )
    from easyner_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    k = int(os.environ.get("ANN_K", "10"))
    spark = get_spark(
        "ann_recall", cores=8, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    exact = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, k=k).collect()
    }

    def measure(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return round(len(got & exact) / len(exact), 4)

    variants = {
        "lsh_6b": (lsh_topk(emb, k=k), None),
        "lsh_6b_probe2": (lsh_topk(emb, k=k, probe_bits=2), None),
        "lsh_4b_probe4": (lsh_topk(emb, k=k, n_bits=4, probe_bits=4), None),
        "ivf_nprobe4": (ivf_topk(emb, k=k), None),
        "ivf_nprobe8": (ivf_topk(emb, k=k, nprobe=8), None),
    }
    out = {name: measure(df) for name, (df, _) in variants.items()}
    print(
        json.dumps(
            {
                "metric": "ann_recall_at_k",
                "k": k,
                "corpus": n,
                "exact_pairs": len(exact),
                "recall": out,
                "note": "isotropic synthetic vectors = worst case / floor",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
