"""SHACL-lite shape validation (triples.validate_shapes)."""

import duckdb
import pandas as pd

from easyner_spark.operators.triples import (
    validate_shapes,
    validate_shapes_oracle_sql,
)

KG = [
    ("alice", "works_for", "acme"),
    ("alice", "works_for", "bcorp"),    # max_out 1 exceeded
    ("acme", "works_for", "bcorp"),     # domain violation (org, not person)
    ("bob", "works_for", "carol"),      # range violation (person, not org)
    ("ghost", "works_for", "acme"),     # untyped subj: unverifiable, no flag
    ("alice", "likes", "bob"),          # unconstrained predicate
]
TYPES = [
    ("alice", "person"), ("bob", "person"), ("carol", "person"),
    ("acme", "org"), ("bcorp", "org"),
]
SHAPES = [("works_for", "person", "org", 1)]


def _frames(spark):
    e = spark.createDataFrame(KG, "subj string, pred string, obj string")
    t = spark.createDataFrame(TYPES, "entity_id string, ent_type string")
    s = spark.createDataFrame(
        SHAPES, "pred string, domain_type string, range_type string, max_out long"
    )
    return e, t, s


def test_all_three_violation_kinds(spark):
    e, t, s = _frames(spark)
    got = {
        (r.kind, r.subj, r.obj): r.detail
        for r in validate_shapes(e, t, s).collect()
    }
    assert got[("domain", "acme", "bcorp")] == "org"
    assert got[("range", "bob", "carol")] == "person"
    assert got[("max_out", "alice", "")] == "2"
    # untyped subj and unconstrained predicate produce nothing
    assert len(got) == 3


def test_sentinels_disable_constraints(spark):
    e, t, _ = _frames(spark)
    s = spark.createDataFrame(
        [("works_for", "", "", 0)],
        "pred string, domain_type string, range_type string, max_out long",
    )
    assert validate_shapes(e, t, s).count() == 0


def test_oracle_twin(spark):
    e, t, s = _frames(spark)
    kg_pd = pd.DataFrame(KG, columns=["subj", "pred", "obj"])
    ty_pd = pd.DataFrame(TYPES, columns=["entity_id", "ent_type"])
    sh_pd = pd.DataFrame(
        SHAPES, columns=["pred", "domain_type", "range_type", "max_out"]
    )
    duckdb.sql("CREATE OR REPLACE TABLE _vs_kg AS SELECT * FROM kg_pd")
    duckdb.sql("CREATE OR REPLACE TABLE _vs_ty AS SELECT * FROM ty_pd")
    duckdb.sql("CREATE OR REPLACE TABLE _vs_sh AS SELECT * FROM sh_pd")
    got = sorted(tuple(r) for r in validate_shapes(e, t, s).collect())
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            validate_shapes_oracle_sql(
                "SELECT * FROM _vs_kg",
                "SELECT * FROM _vs_ty",
                "SELECT * FROM _vs_sh",
            )
        ).fetchall()
    )
    assert got == want
