"""compaction_plan: contiguous path-order bin packing + oversized-file
handling pinned on a closed ledger."""

from easyner_spark.operators.sampling import release_token_budget_caches
from easyner_spark.sinks.checkpoint import compaction_plan


def test_compaction_groups(spark):
    # paths sort a..f; sizes chosen so groups break at 100 bytes
    rows = [
        ("a", 40),
        ("b", 40),
        ("c", 40),   # starts at 80 -> still group 0
        ("d", 250),  # oversized: starts at 120 -> group 1, alone
        ("e", 30),   # starts at 370 -> group 3 (big file spans groups 1-3)
        ("f", 30),   # starts at 400 -> group 4
    ]
    files = spark.createDataFrame(rows, "path string, size_bytes long")
    try:
        got = {
            r["path"]: (r["group_id"], r["n_files"], r["group_bytes"])
            for r in compaction_plan(files, target_bytes=100).collect()
        }
    finally:
        release_token_budget_caches()
    assert got["a"] == (0, 3, 120)
    assert got["b"] == (0, 3, 120)
    assert got["c"] == (0, 3, 120)   # group may exceed target by one file
    assert got["d"] == (1, 1, 250)   # oversized file is its own group
    assert got["e"] == (3, 1, 30)    # group ids skip over the big file's span
    assert got["f"] == (4, 1, 30)
    # groups are contiguous in path order
    order = [got[p][0] for p in "abcdef"]
    assert order == sorted(order)
