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
    per-sentence ordered co-occurrence triples.

    Plan shape (chosen over the window+self-join formulation after
    profiling at 600k docs — that one cost ~4x the CPU in sort-merge
    sorts and row_number):
      1. groupBy (url, sent_idx, entity_id) min(first_span) — first
         occurrence per id;
      2. groupBy (url, sent_idx) collect the (span, id) structs, sort
         the ARRAY in-memory (sentences hold a handful of entities, so
         the sort is trivially cheap and bounded);
      3. nested array transform emits the i<j pairs; one explode.
    Two shuffles that share the (url, sent_idx) clustering, no join, no
    window state. `extract_triples_join` keeps the relational
    formulation as a cross-validation path.
    """
    ids = (
        linked_mentions.where(F.col("entity_id") != "")
        .groupBy("url", "sent_idx", "entity_id")
        # lexicographic-min (begin, end): the id's FIRST occurrence in
        # canonical mention order, not independent per-column minima
        .agg(F.min(F.struct("begin", "end")).alias("first_span"))
    )
    per_sent = ids.groupBy("url", "sent_idx").agg(
        F.array_sort(
            F.collect_list(F.struct("first_span", "entity_id"))
        ).getField("entity_id").alias("ids")
    )
    n = F.size("ids")
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.greatest(n - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("subj_id"), y.alias("obj_id")),
            ),
        )
    )
    return (
        per_sent.where(n >= 2)
        .select("url", "sent_idx", F.explode(pairs).alias("p"))
        .select(
            "url",
            "sent_idx",
            F.col("p.subj_id").alias("subj_id"),
            F.lit(pred).alias("pred"),
            F.col("p.obj_id").alias("obj_id"),
        )
    )


def extract_triples_join(
    linked_mentions: DataFrame,
    pred: str = PRED_CO_OCCURS,
) -> DataFrame:
    """Relational formulation of extract_triples (row_number window +
    per-sentence self-join) — slower at scale, kept as the
    cross-validation twin; results are identical (tested)."""
    ids = (
        linked_mentions.where(F.col("entity_id") != "")
        .groupBy("url", "sent_idx", "entity_id")
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
