"""RDF N-Triples serialization of the node/edge tables.

The north-star KG materializes node/edge tables; downstream graph
stores (Blazegraph, Jena, Virtuoso, any SPARQL endpoint) ingest
N-Triples (W3C RDF 1.1 N-Triples). This sink renders edges as one
triple line per row with SPEC-CORRECT escaping, entirely in JVM
string expressions (one codegen'd projection — serializing 10^12
triples is a scan, not a job):

  <http://kg.local/e/{subj}> <http://kg.local/p/{pred}> <obj> .

- IRI path segments percent-encode the characters N-Triples forbids
  inside <> (space, quotes, angle brackets, backslash, control chars
  — RDF 1.1 N-Triples grammar IRIREF) plus '%' itself first so
  encoding is injective and round-trippable.
- Literals escape backslash, quote, newline, carriage return, tab
  (grammar ECHAR) and are typed plain strings.

Reference parity: no analog (the reference's result format is JSON /
TSV, scripts/analysis.py); north-star edge-table export.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BASE_ENTITY = "http://kg.local/e/"
BASE_PRED = "http://kg.local/p/"

# (char, %XX) pairs, '%' FIRST so later encodings never double-encode
_IRI_ENC = [
    ("%", "%25"),
    (" ", "%20"),
    ('"', "%22"),
    ("<", "%3C"),
    (">", "%3E"),
    ("\\", "%5C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("{", "%7B"),
    ("|", "%7C"),
    ("}", "%7D"),
    ("\n", "%0A"),
    ("\r", "%0D"),
    ("\t", "%09"),
]
# literal ECHAR escapes, backslash FIRST
_LIT_ENC = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]


def _chain_replace(col: Column, pairs: list[tuple[str, str]]) -> Column:
    for a, b in pairs:
        col = F.replace(col, F.lit(a), F.lit(b))
    return col


def iri_encode(col: Column | str) -> Column:
    """Percent-encode an id into an IRI path segment (injective:
    '%' is encoded first)."""
    c = F.col(col) if isinstance(col, str) else col
    return _chain_replace(c.cast("string"), _IRI_ENC)


def literal_escape(col: Column | str) -> Column:
    """N-Triples ECHAR escaping for literal bodies."""
    c = F.col(col) if isinstance(col, str) else col
    return _chain_replace(c.cast("string"), _LIT_ENC)


def to_ntriples(
    edges: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    obj_is_literal: bool = False,
    base_entity: str = BASE_ENTITY,
    base_pred: str = BASE_PRED,
) -> DataFrame:
    """One column `ntriple`, one spec-correct line per edge. Pure
    projection — zero shuffle at any scale; write with
    df.write.text(path) for the standard line-per-triple file."""
    s = F.concat(F.lit("<" + base_entity), iri_encode(subj), F.lit(">"))
    p = F.concat(F.lit("<" + base_pred), iri_encode(pred), F.lit(">"))
    if obj_is_literal:
        o = F.concat(F.lit('"'), literal_escape(obj), F.lit('"'))
    else:
        o = F.concat(F.lit("<" + base_entity), iri_encode(obj), F.lit(">"))
    return edges.select(
        F.concat(s, F.lit(" "), p, F.lit(" "), o, F.lit(" .")).alias("ntriple")
    )


def _sql_chain_replace(expr: str, pairs: list[tuple[str, str]]) -> str:
    for a, b in pairs:
        # single-quote SQL string literals; escape embedded quotes and
        # represent control characters with DuckDB's chr()
        def lit(ch: str) -> str:
            if ch == "\n":
                return "chr(10)"
            if ch == "\r":
                return "chr(13)"
            if ch == "\t":
                return "chr(9)"
            return "'" + ch.replace("'", "''").replace("\\", "\\") + "'"

        expr = f"replace({expr}, {lit(a)}, {lit(b)})"
    return expr


def to_ntriples_oracle_sql(
    triples_sql: str,
    obj_is_literal: bool = False,
    base_entity: str = BASE_ENTITY,
    base_pred: str = BASE_PRED,
) -> str:
    """DuckDB twin of :func:`to_ntriples`; `triples_sql` yields
    (subj, pred, obj). The escape chains are generated from the SAME
    pair tables as the Spark side."""
    s = _sql_chain_replace("CAST(subj AS VARCHAR)", _IRI_ENC)
    p = _sql_chain_replace("CAST(pred AS VARCHAR)", _IRI_ENC)
    if obj_is_literal:
        o = f"'\"' || {_sql_chain_replace('CAST(obj AS VARCHAR)', _LIT_ENC)} || '\"'"
    else:
        o = f"'<{base_entity}' || {_sql_chain_replace('CAST(obj AS VARCHAR)', _IRI_ENC)} || '>'"
    return f"""
SELECT '<{base_entity}' || {s} || '> '
    || '<{base_pred}' || {p} || '> '
    || {o} || ' .' AS ntriple
FROM ({triples_sql})
"""
