"""Local stand-in for the driver's correctness gate: run every
`queries()` entry on Spark and its `oracle_sql()` twin on DuckDB over
the same parquet, compare row count, schema width and an
order-insensitive value multiset. Usage:

    python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(normalize_cell(x) for x in v)
    return v


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import __spark_entry__ as entrymod
    from easyner_spark import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        srows = [tuple(normalize_cell(c) for c in row) for row in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        orel = con.sql(oracles[name])
        orows = [tuple(normalize_cell(c) for c in row) for row in orel.fetchall()]
        ocols = [d[0] for d in orel.description]
        ok_schema = [c.lower() for c in scols] == [c.lower() for c in ocols]
        # order-insensitive, column-name-sorted value comparison (what
        # the driver's value-hash does)
        order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
        sset = sorted([tuple(r[i] for i in order) for r in srows])
        oset = sorted([tuple(r[i] for i in order) for r in orows])
        ok = ok_schema and len(srows) == len(orows) and sset == oset
        status = "OK " if ok else "FAIL"
        print(f"{status} {name}: spark={len(srows)} duckdb={len(orows)} schema_match={ok_schema}")
        if not ok:
            failures += 1
            if not ok_schema:
                print(f"   spark cols: {scols}\n   duck cols:  {ocols}")
            diff1 = [r for r in sset if r not in oset][:3]
            diff2 = [r for r in oset if r not in sset][:3]
            if diff1:
                print(f"   spark-only: {diff1}")
            if diff2:
                print(f"   duck-only:  {diff2}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
