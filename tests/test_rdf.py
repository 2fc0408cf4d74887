"""N-Triples serialization (sinks/rdf.py): spec escaping, literal
mode, DuckDB oracle parity."""

import duckdb

from easyner_spark.sinks.rdf import to_ntriples, to_ntriples_oracle_sql

ROWS = [
    ("mTOR", "inhibits", "TSC1"),
    # every IRI-forbidden character class + percent injectivity
    ('sp ace"<>\\%', "p|p", "o`o{}^"),
    ("nl\nid", "tab\tpred", "cr\rid"),
]
LIT_ROWS = [
    ("e1", "label", 'say "hi"\\now'),
    ("e2", "label", "line1\nline2\ttabbed\rcr"),
]


def test_iri_escaping(spark):
    df = spark.createDataFrame(ROWS, "subj string, pred string, obj string")
    lines = sorted(r.ntriple for r in to_ntriples(df).collect())
    assert (
        "<http://kg.local/e/mTOR> <http://kg.local/p/inhibits> "
        "<http://kg.local/e/TSC1> ." in lines
    )
    weird = next(l for l in lines if "sp%20ace" in l)
    assert weird == (
        "<http://kg.local/e/sp%20ace%22%3C%3E%5C%25> "
        "<http://kg.local/p/p%7Cp> <http://kg.local/e/o%60o%7B%7D%5E> ."
    )
    nl = next(l for l in lines if "nl%0Aid" in l)
    assert "\n" not in nl and "\t" not in nl and "\r" not in nl
    assert "tab%09pred" in nl and "cr%0Did" in nl


def test_literal_escaping(spark):
    df = spark.createDataFrame(LIT_ROWS, "subj string, pred string, obj string")
    lines = {
        r.ntriple for r in to_ntriples(df, obj_is_literal=True).collect()
    }
    assert (
        '<http://kg.local/e/e1> <http://kg.local/p/label> '
        '"say \\"hi\\"\\\\now" .' in lines
    )
    assert (
        '<http://kg.local/e/e2> <http://kg.local/p/label> '
        '"line1\\nline2\\ttabbed\\rcr" .' in lines
    )


def test_oracle_twin_both_modes(spark):
    import pandas as pd

    df = spark.createDataFrame(
        ROWS + LIT_ROWS, "subj string, pred string, obj string"
    )
    pdf = pd.DataFrame(ROWS + LIT_ROWS, columns=["subj", "pred", "obj"])
    duckdb.sql("CREATE OR REPLACE TABLE _nt AS SELECT * FROM pdf")
    for lit in (False, True):
        got = sorted(
            r.ntriple for r in to_ntriples(df, obj_is_literal=lit).collect()
        )
        want = sorted(
            r[0]
            for r in duckdb.sql(
                to_ntriples_oracle_sql("SELECT * FROM _nt", obj_is_literal=lit)
            ).fetchall()
        )
        assert got == want
