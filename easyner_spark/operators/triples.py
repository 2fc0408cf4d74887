"""Triple extraction: linked mentions -> (subj, pred, obj) edges.

Generalizes the reference's germ of relation extraction —
`hasCoOccurrence = len(entities) >= 2` per sentence
(scripts/entity_parser.py:41-42) — into ordered co-occurrence pairs:
for each sentence, the DISTINCT canonical entity ids in span order
(first occurrence; ties (begin, end, id)); emit (id_i,
'co_occurs_with', id_j) for i < j (SURVEY.md section 7.0.4).

Spark shape: one groupBy (url, sent_idx, entity_id) for first-occurrence
spans, a row_number window on the same key, then a per-sentence
self-equi-join on (url, sent_idx). All three reuse ONE hash partitioning
on (url, sent_idx) — Catalyst/AQE sees the shared clustering, and
sentence groups are tiny (a handful of entities), so the self-join
never explodes. Skewed hosts spread across partitions because the key
includes sent_idx and url (full url, not host).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PRED_CO_OCCURS = "co_occurs_with"


def extract_triples(
    linked_mentions: DataFrame,
    pred: str = PRED_CO_OCCURS,
) -> DataFrame:
    """linked mentions (url, sent_idx, entity_id, begin, end) ->
    per-sentence ordered co-occurrence triples."""
    ids = (
        linked_mentions.where(F.col("entity_id") != "")
        .groupBy("url", "sent_idx", "entity_id")
        # lexicographic-min (begin, end): the id's FIRST occurrence in
        # canonical mention order, not independent per-column minima
        .agg(F.min(F.struct("begin", "end")).alias("first_span"))
    )
    w = Window.partitionBy("url", "sent_idx").orderBy("first_span", "entity_id")
    ranked = ids.withColumn("ord", F.row_number().over(w)).select(
        "url", "sent_idx", "entity_id", "ord"
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.url") == F.col("b.url"))
            & (F.col("a.sent_idx") == F.col("b.sent_idx"))
            & (F.col("a.ord") < F.col("b.ord")),
        )
        .select(
            F.col("a.url").alias("url"),
            F.col("a.sent_idx").alias("sent_idx"),
            F.col("a.entity_id").alias("subj_id"),
            F.lit(pred).alias("pred"),
            F.col("b.entity_id").alias("obj_id"),
        )
    )


def aggregate_edges(triples: DataFrame, exact_sets: bool = False) -> DataFrame:
    """Deduplicated edge table with provenance (SURVEY section 7.2.8):
    (subj_id, pred, obj_id) -> support count + distinct-doc count
    (+ exemplar urls in the test profile — unbounded sets are gated off
    at web scale, same policy as analysis.entity_frequency)."""
    aggs = [
        F.count(F.lit(1)).alias("support"),
        F.countDistinct("url").alias("doc_count"),
    ]
    if exact_sets:
        aggs.append(
            F.slice(F.sort_array(F.collect_set("url")), 1, 16).alias("example_urls")
        )
    return triples.groupBy("subj_id", "pred", "obj_id").agg(*aggs)
