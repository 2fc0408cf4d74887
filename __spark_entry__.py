"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every implemented operator from SURVEY.md section 2
as a (spark, sf_dir) -> DataFrame callable over the driver's parquet
tables; `oracle_sql()` gives the DuckDB-equivalent ANSI SQL.

The `documents` table is the pages stand-in (FIXTURES.md F7). Its text
is punctuation-free word soup, so each query first "senticizes" it with
a deterministic substitution (' a ' -> '. ') — expressible identically
in Spark and DuckDB — which gives the sentence operators real multi-
sentence inputs at the oracle gate. Char-offset and case semantics are
covered by the self-oracle fixture tests in tests/ (FIXTURES.md F1/F4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Dictionary over the documents-table vocabulary: unigrams, bigrams and
# a trigram, exercising the n-gram matching paths (SURVEY section 2.4 T4).
DICT = [
    ("hash", "kw1"),
    ("merge", "kw1"),
    ("spark", "kw1"),
    ("window", "kw1"),
    ("sort table", "kw2"),
    ("row scan", "kw2"),
    ("fast merge", "kw2"),
    ("table value part", "kw3"),
]

# NEL alias lookup over the same dictionary (SURVEY section 2.5 J1):
# one term maps to two IDs (one-to-many), one term is absent ('' path).
ALIAS = [
    ("hash", "KB:01"),
    ("merge", "KB:02"),
    ("merge", "KB:12"),
    ("spark", "KB:03"),
    ("sort table", "KB:04"),
    ("row scan", "KB:04"),
    ("fast merge", "KB:02"),
    ("table value part", "KB:05"),
    # "window" intentionally absent -> ''
]


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> pages-shaped df with synthetic sentence boundaries."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.regexp_replace("text", " a ", ". ").alias("text"),
        "lang",
    )


def _sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.splitter import split_sentences

    return split_sentences(_pages(spark, sf_dir), lang_filter=None)


def _mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.ner_dict import dict_ner

    return dict_ner(_sentences(spark, sf_dir), DICT)


def _as_doc_id(df: DataFrame) -> DataFrame:
    return df.withColumn("doc_id", F.col("url").cast("long")).drop("url")


def q_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _sentences(spark, sf_dir)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
    )


def q_dict_ner(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _mentions(spark, sf_dir)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("begin_tok").cast("long").alias("begin_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        "mention_lc",
        "class",
    )


def q_entity_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.analysis import entity_frequency

    freq = entity_frequency(_mentions(spark, sf_dir), mention_col="mention_lc")
    return freq.select(
        "mention",
        F.col("total_count").cast("long").alias("total_count"),
        F.col("articles_spanned").cast("long").alias("articles_spanned"),
    )


def _alias_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ALIAS, "term string, ID string")


def q_link_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.nel import link_entities

    out = link_entities(_mentions(spark, sf_dir), _alias_df(spark))
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("begin_tok").cast("long").alias("begin_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        "mention_lc",
        "entity_id",
    )


def q_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import extract_triples

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)), keep_unmatched=False
    )
    out = extract_triples(linked)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "subj_id",
        "pred",
        "obj_id",
    )


def q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import aggregate_edges, extract_triples

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)), keep_unmatched=False
    )
    out = aggregate_edges(extract_triples(linked))
    return out.select(
        "subj_id",
        "pred",
        "obj_id",
        F.col("support").cast("long").alias("support"),
        F.col("doc_count").cast("long").alias("doc_count"),
    )


SEARCH_TERMS = ["hash", "sort table"]


def q_search_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.search import search_sentences

    sents = _sentences(spark, sf_dir)
    out = search_sentences(sents, _mentions(spark, sf_dir), SEARCH_TERMS, match_col="mention_lc")
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
    )


def q_doc_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.sinks.pubtator import sentence_doc_offsets

    out = sentence_doc_offsets(_sentences(spark, sf_dir))
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("doc_offset").cast("long").alias("doc_offset"),
    )


def q_term_freq_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.analysis import term_frequency_per_doc

    out = term_frequency_per_doc(_mentions(spark, sf_dir).withColumn("mention", F.col("mention_lc")))
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        "mention",
        F.col("cnt").cast("long").alias("cnt"),
    )


def q_resolve_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-dependent sequential rules (reference entity_merger2.py:
    99-146) — not SQL-expressible; driver records the rows-only check,
    bit-exact parity is established by tests/test_merger_parity.py."""
    from easyner_spark.operators.merger import resolve_conflicts

    pri = {"kw1": 1, "kw2": 2, "kw3": 3}
    out = resolve_conflicts(_mentions(spark, sf_dir), priority=pri)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("begin_tok").cast("long").alias("begin_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        "mention_lc",
        "class",
    )


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the co-occurrence graph (iterative
    large-star/small-star; oracle = recursive-CTE min-label closure)."""
    from easyner_spark.operators.components import connected_components

    edges = q_triples(spark, sf_dir).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    return connected_components(edges).select("node", "component")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> sentences -> dictionary NER -> ranked entity
    frequency top-50 (the reference pipeline's main output,
    reference README.md:71; scripts/analysis.py:40-80)."""
    from easyner_spark.operators.analysis import entity_frequency, top_n

    sf_dir = "/root/testdata/sf0.001"
    freq = entity_frequency(_mentions(spark, sf_dir), mention_col="mention_lc")
    return top_n(freq, 50)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "split_sentences": q_split_sentences,
        "dict_ner": q_dict_ner,
        "entity_frequency": q_entity_frequency,
        "link_entities": q_link_entities,
        "triples": q_triples,
        "edges": q_edges,
        "search_sentences": q_search_sentences,
        "doc_offsets": q_doc_offsets,
        "term_freq_per_doc": q_term_freq_per_doc,
        "resolve_conflicts": q_resolve_conflicts,
        "components": q_components,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles. Shared CTE prelude mirroring the Spark pipeline:
# senticize -> normalize -> sentence split (sentinel chr(30) trick; RE2
# has no lookbehind) -> tokenize -> n-gram leads -> dictionary join.
# ---------------------------------------------------------------------------

_DICT_VALUES = ", ".join(f"('{t}', '{c}')" for t, c in DICT)
_ALIAS_VALUES = ", ".join(f"('{t}', '{i}')" for t, i in ALIAS)

_PRELUDE = r"""
WITH sent0 AS (
  SELECT doc_id,
         list_filter(
           string_split(
             regexp_replace(
               trim(regexp_replace(regexp_replace(text, ' a ', '. ', 'g'), '\n+', ' ', 'g')),
               '([.!?])\s+', '\1' || chr(30), 'g'),
             chr(30)),
           s -> length(s) > 0) AS sents
  FROM documents
),
sentences AS (
  SELECT doc_id,
         generate_subscripts(sents, 1) - 1 AS sent_idx,
         unnest(sents) AS sentence
  FROM sent0
),
toks AS (
  SELECT doc_id, sent_idx,
         generate_subscripts(regexp_extract_all(sentence, '\w+|[^\w\s]'), 1) - 1 AS tok_idx,
         unnest(regexp_extract_all(sentence, '\w+|[^\w\s]')) AS tok
  FROM sentences
),
leads AS (
  SELECT doc_id, sent_idx, tok_idx, tok AS t0,
         lead(tok, 1) OVER w AS t1,
         lead(tok, 2) OVER w AS t2
  FROM toks
  WINDOW w AS (PARTITION BY doc_id, sent_idx ORDER BY tok_idx)
),
grams AS (
  SELECT doc_id, sent_idx, tok_idx AS begin_tok, tok_idx + 1 AS end_tok, t0 AS gram FROM leads
  UNION ALL
  SELECT doc_id, sent_idx, tok_idx, tok_idx + 2, t0 || ' ' || t1 FROM leads WHERE t1 IS NOT NULL
  UNION ALL
  SELECT doc_id, sent_idx, tok_idx, tok_idx + 3, t0 || ' ' || t1 || ' ' || t2 FROM leads WHERE t2 IS NOT NULL
),
dict(term, class) AS (VALUES __DICT__),
mentions AS (
  SELECT g.doc_id, g.sent_idx, g.begin_tok, g.end_tok, g.gram AS mention_lc, d.class
  FROM grams g JOIN dict d ON g.gram = d.term
),
alias(term, id) AS (VALUES __ALIAS__),
linked AS (
  SELECT m.doc_id, m.sent_idx, m.begin_tok, m.end_tok, pa.id AS entity_id
  FROM mentions m
  JOIN (SELECT term, min(id) AS id FROM alias GROUP BY term) pa
    ON m.mention_lc = pa.term
),
firsts AS (
  SELECT doc_id, sent_idx, entity_id, begin_tok, end_tok,
         row_number() OVER (PARTITION BY doc_id, sent_idx, entity_id
                            ORDER BY begin_tok, end_tok) AS rn
  FROM linked
),
ranked AS (
  SELECT doc_id, sent_idx, entity_id,
         row_number() OVER (PARTITION BY doc_id, sent_idx
                            ORDER BY begin_tok, end_tok, entity_id) AS ord
  FROM firsts WHERE rn = 1
),
triples AS (
  SELECT a.doc_id, a.sent_idx, a.entity_id AS subj_id,
         'co_occurs_with' AS pred, b.entity_id AS obj_id
  FROM ranked a
  JOIN ranked b ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.ord < b.ord
)
""".replace("__DICT__", _DICT_VALUES).replace("__ALIAS__", _ALIAS_VALUES)


def oracle_sql() -> dict[str, str]:
    return {
        "split_sentences": _PRELUDE
        + """
SELECT doc_id, sent_idx::BIGINT AS sent_idx, sentence FROM sentences
""",
        "dict_ner": _PRELUDE
        + """
SELECT doc_id, sent_idx::BIGINT AS sent_idx, begin_tok::BIGINT AS begin_tok,
       end_tok::BIGINT AS end_tok, mention_lc, class
FROM mentions
""",
        "entity_frequency": _PRELUDE
        + """
SELECT mention_lc AS mention,
       count(*)::BIGINT AS total_count,
       count(DISTINCT doc_id)::BIGINT AS articles_spanned
FROM mentions
GROUP BY mention_lc
""",
        "link_entities": _PRELUDE
        + """
SELECT m.doc_id, m.sent_idx::BIGINT AS sent_idx, m.begin_tok::BIGINT AS begin_tok,
       m.end_tok::BIGINT AS end_tok, m.mention_lc,
       coalesce(a.id, '') AS entity_id
FROM mentions m LEFT JOIN alias a ON m.mention_lc = a.term
""",
        "triples": _PRELUDE
        + """
SELECT doc_id, sent_idx::BIGINT AS sent_idx, subj_id, pred, obj_id FROM triples
""",
        "edges": _PRELUDE
        + """
SELECT subj_id, pred, obj_id, count(*)::BIGINT AS support,
       count(DISTINCT doc_id)::BIGINT AS doc_count
FROM triples
GROUP BY subj_id, pred, obj_id
""",
        "search_sentences": _PRELUDE
        + f"""
SELECT s.doc_id, s.sent_idx::BIGINT AS sent_idx, s.sentence
FROM sentences s
WHERE EXISTS (
  SELECT 1 FROM mentions m
  WHERE m.doc_id = s.doc_id AND m.sent_idx = s.sent_idx
    AND m.mention_lc IN ({", ".join(repr(t) for t in SEARCH_TERMS)})
)
""",
        "doc_offsets": _PRELUDE
        + """
SELECT doc_id, sent_idx::BIGINT AS sent_idx,
       coalesce(sum(length(sentence) + 1) OVER (
         PARTITION BY doc_id ORDER BY sent_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS doc_offset
FROM sentences
""",
        "term_freq_per_doc": _PRELUDE
        + """
SELECT doc_id, mention_lc AS mention, count(*)::BIGINT AS cnt
FROM mentions
GROUP BY doc_id, mention_lc
""",
        "components": _PRELUDE.replace("WITH sent0", "WITH RECURSIVE sent0", 1)
        + """
, cc_edges AS (SELECT DISTINCT subj_id AS a, obj_id AS b FROM triples),
cc_sym AS (SELECT a, b FROM cc_edges UNION SELECT b, a FROM cc_edges),
cc_nodes AS (SELECT DISTINCT a AS node FROM cc_sym),
reach(node, lbl) AS (
  SELECT node, node FROM cc_nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN cc_sym e ON r.node = e.a
)
SELECT node, min(lbl) AS component FROM reach GROUP BY node
""",
    }
