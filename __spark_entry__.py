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


def q_disambiguate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lesk-style context disambiguation: 'merge' maps to KB:02|KB:12 in
    ALIAS, so the corpus genuinely exercises the ambiguous path; profiles
    are built from the unambiguous terms only."""
    from easyner_spark.operators.nel import disambiguate_mentions

    out = disambiguate_mentions(
        _mentions(spark, sf_dir), _sentences(spark, sf_dir), _alias_df(spark)
    )
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("begin_tok").cast("long").alias("begin_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        "mention_lc",
        "entity_id",
        F.col("n_cands").cast("long").alias("n_cands"),
        F.col("score").cast("long").alias("score"),
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


def q_predicate_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependency-pattern predicate extraction (north_star): inject a
    deterministic relation verb into the word soup (' slow ' -> ' inhibits ',
    a token that genuinely occurs in the corpus)
    so the lexicon path fires on real pairs, then run the char-gap
    pattern rule; pairs with no verb between the spans keep the
    co-occurrence fallback."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.ner_dict import dict_ner
    from easyner_spark.operators.splitter import split_sentences
    from easyner_spark.operators.triples import extract_predicate_triples

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.regexp_replace(
            F.regexp_replace("text", " slow ", " inhibits "), " a ", ". "
        ).alias("text"),
        "lang",
    )
    sents = split_sentences(pages, lang_filter=None)
    linked = link_entities(
        dict_ner(sents, DICT), primary_alias(_alias_df(spark)), keep_unmatched=False
    )
    out = extract_predicate_triples(linked, sents)
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


def q_fuse_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knowledge fusion (TruthFinder/Sums-style iterative truth
    discovery) over the real extraction output: each triple becomes a
    claim attributed to a synthetic host bucket source = 'h'||(doc_id%7)
    — the Common-Crawl many-hosts-assert-conflicting-facts shape. Three
    trust iterations, per-step round(9) state so Spark and DuckDB walk
    the identical float trajectory."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import extract_triples, fuse_claims

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)), keep_unmatched=False
    )
    claims = extract_triples(linked).select(
        F.concat(F.lit("h"), (F.col("url").cast("long") % 7).cast("string")).alias(
            "source"
        ),
        "subj_id",
        "pred",
        "obj_id",
    )
    out = fuse_claims(claims, iters=3, state_round=9)
    return out.select(
        "subj_id",
        "pred",
        "obj_id",
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("confidence").cast("double").alias("confidence"),
        "is_best",
    )


def q_predicate_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema induction over the KG edge table: per-predicate
    functional-property profile (1:1 / 1:N / N:1 / N:M). Input edges =
    the real co-occurrence triples (N:M by construction) UNION three
    synthetic predicates engineered to land in each other cardinality
    class (capital_of 1:1, has_part 1:N, in_country N:1) — the synth
    axis exists because the extraction pipeline emits a single
    predicate and the classifier's CASE arms all need coverage."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import (
        extract_triples,
        predicate_cardinality,
    )

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)), keep_unmatched=False
    )
    real = extract_triples(linked).select("subj_id", "pred", "obj_id")
    d = F.col("doc_id").cast("string")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    synth = (
        docs.select(
            F.concat(F.lit("s"), d).alias("subj_id"),
            F.lit("capital_of").alias("pred"),
            F.concat(F.lit("o"), d).alias("obj_id"),
        )
        .unionByName(
            docs.select(
                F.concat(F.lit("s"), (F.col("doc_id") % 10).cast("string")).alias(
                    "subj_id"
                ),
                F.lit("has_part").alias("pred"),
                F.concat(F.lit("o"), d).alias("obj_id"),
            )
        )
        .unionByName(
            docs.select(
                F.concat(F.lit("s"), d).alias("subj_id"),
                F.lit("in_country").alias("pred"),
                F.concat(F.lit("o"), (F.col("doc_id") % 10).cast("string")).alias(
                    "obj_id"
                ),
            )
        )
    )
    return predicate_cardinality(real.unionByName(synth).distinct())


def q_entity_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document topical-entity ranking by position-weighted
    mention counts (lead sentence x3, first 3 sentences x2, body x1)
    — the doc->entity edge weight for KG node construction."""
    from easyner_spark.operators.analysis import entity_salience
    from easyner_spark.operators.nel import link_entities, primary_alias

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)), keep_unmatched=False
    )
    out = entity_salience(linked)
    return out.select(
        F.col("url").cast("long").alias("url"),
        "entity_id",
        "n_mentions",
        "first_sent",
        "salience",
        F.col("rank").alias("sal_rank"),
    )


def q_host_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation relatedness over the extracted host graph with the
    per-source fanout cap biting (max_out=3 < several sources' real
    out-degree) so the deterministic truncation rule is value-checked,
    not just the happy path."""
    from easyner_spark.operators.webtext import host_cocitation, host_graph

    hg = host_graph(_synth_html_pages(spark, sf_dir))
    return host_cocitation(hg, max_out=3)


# Predicate-signature typing rules shared verbatim by the Spark query
# and the DuckDB oracle VALUES list (entity_types_oracle_sql inlines
# this same object).
TYPE_RULES = [
    ("inhibits", "subj", "chemical", 2),
    ("inhibits", "obj", "protein", 2),
    ("co_occurs_with", "subj", "concept", 1),
    ("co_occurs_with", "obj", "concept", 1),
]


def q_entity_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ontology-lite type induction: the predicate-pattern pipeline's
    edges (inhibits + co_occurs_with fallback) vote types onto their
    endpoints; argmax with type-asc ties. Composes the whole chain
    extract -> link -> predicate triples -> typed nodes."""
    from easyner_spark.operators.triples import entity_types

    edges = (
        q_predicate_triples(spark, sf_dir)
        .select("subj_id", "pred", "obj_id")
        .distinct()
    )
    return entity_types(edges, TYPE_RULES)


def q_isa_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taxonomy transitive closure by min-plus doubling over a
    deterministic synthetic subclass forest: n_k is-a n_(k DIV 2)
    (depth ~9 at 500 docs — deeper than one doubling round, so the
    squaring recurrence is genuinely exercised) plus a second parent
    n_(k DIV 3) on every 5th node to make it a DAG (multi-parent
    min-depth paths value-checked, not just the chain)."""
    from easyner_spark.operators.graph import isa_closure

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tree = docs.where(F.col("doc_id") >= 1).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("child"),
        F.concat(F.lit("n"), F.expr("doc_id DIV 2").cast("string")).alias("parent"),
    )
    dag = docs.where((F.col("doc_id") % 5 == 0) & (F.col("doc_id") >= 3)).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("child"),
        F.concat(F.lit("n"), F.expr("doc_id DIV 3").cast("string")).alias("parent"),
    )
    return isa_closure(tree.unionByName(dag), max_depth=16)


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


def q_search_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/J5 companion: every annotation row of every hit sentence
    (the reference re-emits the full entities/spans lists,
    scripts/search.py:47-53)."""
    from easyner_spark.operators.search import search_mentions

    out = search_mentions(
        _mentions(spark, sf_dir), SEARCH_TERMS, match_col="mention_lc"
    )
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("begin_tok").cast("long").alias("begin_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        "mention_lc",
        "class",
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


def q_entity_frequency_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 compat completion: the nested per-batch count map
    (scripts/analysis.py:47-80). batch_id is synthesized as
    doc_id % 7; the map is rendered with to_json (keys in ascending
    batch order) so DuckDB can build the identical string."""
    from easyner_spark.operators.analysis import entity_frequency

    m = _mentions(spark, sf_dir).withColumn(
        "batch_id", F.pmod(F.col("url").cast("long"), F.lit(7))
    )
    freq = entity_frequency(
        m, mention_col="mention_lc", batch_col="batch_id", batch_counts=True
    )
    return freq.select(
        "mention",
        F.col("total_count").cast("long").alias("total_count"),
        F.col("articles_spanned").cast("long").alias("articles_spanned"),
        F.col("batches_spanned").cast("long").alias("batches_spanned"),
        F.to_json("batch_count").alias("batch_count_json"),
        "freq_per_article",
        "freq_per_batch",
    )


def q_resolve_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-dependent sequential rules (reference entity_merger2.py:
    99-146). The oracle expresses the loop as a recursive CTE over a
    survivor bitmask (delete i iff some alive j beats it, i descending)
    — see oracle_sql(); bit-exact parity is additionally pinned by
    tests/test_merger_parity.py."""
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


def q_span_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 + A5: span-tolerant P/R/F1 with a deterministic perturbed
    gold twin — doc_id%3==0 shifts spans +1 (inside stride -> TP),
    doc_id%10==7 shifts +5 (outside stride -> FP+FN), doc_id%10==3
    drops the gold row (-> FP). The oracle replays the band-match
    EXISTS semantics (each pred counted once) in SQL."""
    from easyner_spark.operators.evaluate import prf, span_match_counts

    m = _mentions(spark, sf_dir).select(
        "url",
        "class",
        F.col("begin_tok").alias("begin"),
        F.col("end_tok").alias("end"),
    )
    d = F.col("url").cast("long")
    shift = (
        F.when(d % 10 == 7, F.lit(5)).when(d % 3 == 0, F.lit(1)).otherwise(F.lit(0))
    )
    gold = (
        m.where(d % 10 != 3)
        .withColumn("begin", F.col("begin") + shift)
        .withColumn("end", F.col("end") + shift)
    )
    out = prf(span_match_counts(m, gold, keys=["url", "class"], stride=1))
    return out.select(
        "class",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        "precision",
        "recall",
        "f1",
    )


def q_merger_v1_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 compat boundary (reference entity_merger.py:20-56): the
    per-sentence {tag: [entities]} / {tag: [[b, e]]} nesting rendered
    as the byte-stable to_json export. Token spans feed begin/end so
    the oracle can rebuild the identical JSON string in SQL."""
    from easyner_spark.operators.merger import merger_v1_export

    m = _mentions(spark, sf_dir).select(
        "url",
        "sent_idx",
        F.col("mention_lc").alias("mention"),
        F.col("begin_tok").alias("begin"),
        F.col("end_tok").alias("end"),
        "class",
    )
    out = merger_v1_export(m)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "json",
    )


def q_co_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 compat: the reference co-occurrence extractor
    (entity_parser.py:19-55) over a deterministic IOB labeling of the
    document token stream (B on 'hash'/'scan', I on 'merge', else O —
    corpus vocabulary, so entities genuinely occur). Quirk parity (B-after-B concat, trailing-entity drop,
    punctuation chains) is pinned bit-level in pytest; this oracle
    checks the full-corpus values."""
    from easyner_spark.operators.iob import co_occurrence

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.col("doc_id").cast("int").alias("seq_id"),
        F.posexplode(
            F.expr(r"regexp_extract_all(lower(text), r'(?U)\w+|[^\w\s]', 0)")
        ).alias("tok_idx", "token"),
    ).withColumn(
        "label",
        F.when(F.col("token").isin("hash", "scan"), F.lit("B"))
        .when(F.col("token") == "merge", F.lit("I"))
        .otherwise(F.lit("O")),
    )
    out = co_occurrence(toks)
    return out.select(
        F.col("seq_id").cast("long").alias("doc_id"),
        "has_cooccurrence",
        F.to_json("entities").alias("entities_json"),
        "text",
    )


def q_error_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NER error-inspection regions (error_detection.py:8-95) over a
    deterministic gold/pred IOB labeling of the document token stream:
    gold marks hash=B merge=I, pred only hash-at-even-token-index=B —
    corpus vocabulary, so disagreement regions genuinely occur."""
    from easyner_spark.operators.iob import error_regions

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.col("doc_id").cast("int").alias("seq_id"),
        F.posexplode(
            F.expr(r"regexp_extract_all(lower(text), r'(?U)\w+|[^\w\s]', 0)")
        ).alias("tok_idx", "token"),
    ).select(
        "seq_id",
        "tok_idx",
        "token",
        F.when(F.col("token") == "hash", F.lit("B"))
        .when(F.col("token") == "merge", F.lit("I"))
        .otherwise(F.lit("O"))
        .alias("label_true"),
        F.when(
            (F.col("token") == "hash") & (F.col("tok_idx") % 2 == 0), F.lit("B")
        )
        .otherwise(F.lit("O"))
        .alias("label_pred"),
    )
    out = error_regions(toks)
    return out.select(
        F.col("seq_id").cast("long").alias("doc_id"),
        F.col("region_idx").cast("long").alias("region_idx"),
        "word",
        F.to_json("true_tags").alias("true_tags_json"),
        F.to_json("pred_tags").alias("pred_tags_json"),
    )


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the co-occurrence graph (iterative
    large-star/small-star; oracle = recursive-CTE min-label closure)."""
    from easyner_spark.operators.components import connected_components

    edges = q_triples(spark, sf_dir).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    # local_finish_edges=0: the oracle gate pins the DISTRIBUTED
    # fixpoint; the hybrid local finish is pytest-pinned equal to it
    return connected_components(edges, local_finish_edges=0).select(
        "node", "component"
    )


def q_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental component-map maintenance: the triples graph is
    split by sent_idx parity into an OLD graph (even — its component
    map is computed first, standing in for the persisted map of all
    prior crawl epochs) and a NEW edge batch (odd); the operator folds
    the batch into the map WITHOUT the old edge list. The oracle is
    the full-graph closure — the incremental contract is exact
    equality with a full recompute."""
    from easyner_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    t = q_triples(spark, sf_dir)
    old = t.where(F.col("sent_idx") % 2 == 0).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    new = t.where(F.col("sent_idx") % 2 == 1).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    mapping = connected_components(old, local_finish_edges=0)
    return incremental_components(mapping, new, local_finish_edges=0).select(
        "node", "component"
    )


def q_k_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop BFS neighborhood table over the co-occurrence triple
    graph, every node as a source; oracle = bounded recursive CTE with
    a min-dist rollup."""
    from easyner_spark.operators.graph import k_hop

    edges = q_triples(spark, sf_dir).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    return k_hop(edges, k=2).select("source", "node", "dist")


def q_kg_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI/NPMI edge weighting over sentence-level entity co-occurrence
    (beyond-reference KG edge scoring; reference analog is the raw pair
    count in cooccurrence_analysis.py). Floats follow the repo-wide
    round(·, 6) oracle contract; counts are exact integers."""
    from easyner_spark.operators.graph import edge_pmi

    out = edge_pmi(_mentions(spark, sf_dir))
    return out.select(
        "a", "b", "pair_cnt", "cnt_a", "cnt_b", "pmi", "npmi"
    )


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration (3) PageRank over the distinct directed triple
    graph — GraphFrames-style iterative DataFrame joins with a per-
    iteration round(·, 9) state contract so the unrolled DuckDB CTE
    oracle is bit-stable (see operators/graph.py docstring)."""
    from easyner_spark.operators.graph import pagerank

    edges = q_triples(spark, sf_dir).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    return pagerank(edges).select("node", "rank")


def q_kg_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from seeds (KB:01, KB:03) over the
    directed triple graph — random walk with restart, ALL-BIGINT
    micro-unit iteration (3 rounds, damping 17/20)."""
    from easyner_spark.operators.graph import ppr

    edges = q_triples(spark, sf_dir).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    return ppr(edges, seeds=("KB:01", "KB:03")).select("node", "score", "is_seed")


def q_kg_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected entity
    co-occurrence graph (canonical-ordering wedge join, a < b < c) —
    integer-exact, the graph-cohesion companion to components."""
    from easyner_spark.operators.graph import sentence_pairs, triangle_counts

    pairs = sentence_pairs(_mentions(spark, sf_dir))
    und = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return triangle_counts(und).select("node", "triangles")


def q_kg_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-iteration label propagation over the entity
    co-occurrence graph — the community layer between edge_pmi's
    weights and components' pure reachability (operators/graph.py
    docstring: LPA splits what transitivity over-merges)."""
    from easyner_spark.operators.graph import label_propagation, sentence_pairs

    pairs = sentence_pairs(_mentions(spark, sf_dir))
    und = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return label_propagation(und, iters=3).select("node", "label")


def q_kg_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node LOCAL clustering coefficient over the entity
    co-occurrence graph — the clique-vs-star split kg_triangles' raw
    counts can't make (a promiscuous extraction-artifact hub has many
    triangles but a near-zero coefficient). Ratio computed from exact
    integers under the round(·, 6) contract."""
    from easyner_spark.operators.graph import clustering_coeff, sentence_pairs

    pairs = sentence_pairs(_mentions(spark, sf_dir))
    und = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return clustering_coeff(und).select(
        "node", "degree", "triangles", "coeff"
    )


def q_kg_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity decomposition of kg_communities' LPA labels
    over the co-occurrence graph — per-community q_term rows (exact
    integers e_c, D_c, m in one rounded double expression) instead of
    one global order-dependent float sum; Q = sum(q_term)."""
    from easyner_spark.operators.graph import (
        label_propagation,
        modularity,
        sentence_pairs,
    )

    pairs = sentence_pairs(_mentions(spark, sf_dir))
    und = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    lab = label_propagation(und, iters=3)
    return modularity(und, lab).select(
        "community", "n_nodes", "degree_sum", "intra_edges", "q_term"
    )


def q_kg_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two KG epochs: edges from the first 4/5
    of documents vs the full corpus (weight = support count) through
    edge_diff — the added/changed/removed audit slice an incremental
    build publishes next to each checkpoint, and the exact re-process
    set for downstream consumers."""
    from easyner_spark.operators.graph import edge_diff

    t = q_triples(spark, sf_dir)
    keys = ("subj_id", "pred", "obj_id")
    old = (
        t.where(F.col("doc_id") % 5 < 4)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    new = t.groupBy(*keys).agg(F.count(F.lit(1)).alias("weight"))
    return edge_diff(old, new, keys=keys).select(
        *keys, "old_weight", "new_weight", "delta", "status"
    )


_TOK_RE = r"(?U)\\w+|[^\\w\\s]"


def _pronoun_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document token stream with pronouns injected (' the ' ->
    ' it ') — corpus vocabulary has no natural pronouns; the
    substitution is deterministic in both engines (literal
    non-overlapping regexp_replace)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.lit(0).cast("long").alias("sent_idx"),
        F.posexplode(
            F.expr(
                "regexp_extract_all(regexp_replace(lower(text),"
                " ' the ', ' it '), r'(?U)\\w+|[^\\w\\s]', 0)"
            )
        ).alias("tok_idx", "tok"),
    ).select(
        "doc_id", "sent_idx",
        F.col("tok_idx").cast("long").alias("tok_idx"), "tok",
    )


def q_passive_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passive-voice pattern triples with flipped roles (north_star
    coverage): inject ' slow ' -> ' is inhibited by ' (a real corpus
    token) so the passive rule
    fires on real pairs; 'X is inhibited by Y' emits
    (Y, inhibits, X) — the triple the order-based active rule gets
    backward. Non-passive pairs emit nothing."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.ner_dict import dict_ner
    from easyner_spark.operators.splitter import split_sentences
    from easyner_spark.operators.triples import extract_passive_triples

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.regexp_replace(
            F.regexp_replace("text", " slow ", " is inhibited by "), " a ", ". "
        ).alias("text"),
        "lang",
    )
    sents = split_sentences(pages, lang_filter=None)
    linked = link_entities(
        dict_ner(sents, DICT), primary_alias(_alias_df(spark)), keep_unmatched=False
    )
    out = extract_passive_triples(linked, sents)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "subj_id",
        "pred",
        "obj_id",
    )


def q_nominal_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nominalization pattern triples (north_star coverage): inject
    ' slow ' -> ' inhibition of hash by ' so the phrase lands before a
    real dictionary mention ('hash') and fires whenever the NEXT soup
    token is also an entity; 'inhibition of X by Y' emits
    (Y, inhibits, X) — a shape neither the active order rule (the
    predicate precedes both entities) nor the passive rule covers.
    First-span semantics apply: sentences where 'hash' already
    occurred earlier keep the earlier span and emit nothing."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.ner_dict import dict_ner
    from easyner_spark.operators.splitter import split_sentences
    from easyner_spark.operators.triples import extract_nominal_triples

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", " slow ", " inhibition of hash by "),
                " big ",
                " suppression of merge by ",
            ),
            " a ",
            ". ",
        ).alias("text"),
        "lang",
    )
    sents = split_sentences(pages, lang_filter=None)
    linked = link_entities(
        dict_ner(sents, DICT), primary_alias(_alias_df(spark)), keep_unmatched=False
    )
    out = extract_nominal_triples(linked, sents)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "subj_id",
        "pred",
        "obj_id",
    )


def q_pronoun_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreference-lite: injected pronouns linked to the nearest
    preceding dictionary mention in the same sentence (lookback 0) —
    the KG recall booster for 'it inhibits X' sentences the
    dictionary path drops."""
    from easyner_spark.operators.triples import pronoun_links

    toks = _pronoun_tokens(spark, sf_dir)
    ments = toks.where(F.col("tok").isin("hash", "scan")).select(
        "doc_id", "sent_idx",
        F.col("tok_idx").alias("begin_tok"),
        (F.col("tok_idx") + 1).alias("end_tok"),
        F.col("tok").alias("term"),
    )
    return pronoun_links(toks, ments, lookback=0).select(
        "doc_id", "sent_idx", "tok_idx", "pronoun",
        F.col("ant_sent").cast("long").alias("ant_sent"),
        F.col("ant_tok").cast("long").alias("ant_tok"),
        "antecedent",
    )


def q_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the deterministic pred/gold token
    labelings (error_regions' rater pair) — chance-corrected
    agreement as one double division of exact BIGINTs."""
    from easyner_spark.operators.evaluate import cohens_kappa

    toks = _pronoun_tokens(spark, sf_dir)
    gold = toks.select(
        "doc_id", "sent_idx", "tok_idx",
        F.when(F.col("tok").isin("hash", "scan"), F.lit("B"))
        .otherwise(F.lit("O")).alias("label"),
    )
    pred = toks.select(
        "doc_id", "sent_idx", "tok_idx",
        F.when(
            (F.col("tok") == "hash") & (F.col("tok_idx") % 2 == 0),
            F.lit("B"),
        ).otherwise(F.lit("O")).alias("label"),
    )
    return cohens_kappa(pred, gold).select(
        "n", "agree", "chance_prod_sum", "kappa"
    )


def q_host_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-entity affinity: per-host mention counts and shares over
    the pipeline's real mention table joined to the skewed host
    synthesis — the source-authority feature for canonicalization
    and crawl targeting."""
    from easyner_spark.operators.webtext import host_topics

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    host = (
        F.when(did % 10 < 3, F.lit("hub.example.com"))
        .when(did % 10 < 5, F.lit("blog.example.org"))
        .otherwise(
            F.concat(
                F.lit("site"), (did % 37).cast("string"),
                F.lit(".example.net"),
            )
        )
    )
    hosts = d.select(did.cast("string").alias("url"), host.alias("host"))
    return host_topics(_mentions(spark, sf_dir), hosts).select(
        "host", "term", "n_mentions", "share"
    )


def q_microdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org microdata pulls (itemtype + itemprop/content) over
    deterministic synthesis — the third structured-data syntax next
    to jsonld/opengraph; flat-scope contract documented."""
    from easyner_spark.operators.webtext import extract_microdata

    return extract_microdata(_microdata_pages(spark, sf_dir))


def _microdata_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every doc not divisible by 4 carries an itemscope'd Person/
    Product (cycling) with two itemprops; every 6th adds a scopeless
    extra itemprop; every 4th has no microdata."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    typ = F.when(
        did % 2 == 0, F.lit("https://schema.org/Person")
    ).otherwise(F.lit("https://schema.org/Product"))
    html = F.concat(
        F.lit("<html>"),
        F.when(
            did % 4 != 0,
            F.concat(
                F.lit('<div itemscope itemtype="'), typ, F.lit('">'),
                F.lit('<span itemprop="name" content="Entity '),
                (did % 30).cast("string"), F.lit('">x</span>'),
                F.lit('<meta itemprop="sku" content="S'),
                (did % 17).cast("string"), F.lit('"></div>'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 6 == 0,
            F.concat(
                F.lit('<b itemprop="note" content="n'),
                (did % 5).cast("string"), F.lit('">y</b>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</html>"),
    )
    return d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        html.alias("html"),
    )


_MICRODATA_PAGES_SQL = """
SELECT 'u' || doc_id AS url,
  '<html>'
  || (CASE WHEN doc_id % 4 != 0
      THEN '<div itemscope itemtype="'
           || (CASE WHEN doc_id % 2 = 0 THEN 'https://schema.org/Person'
               ELSE 'https://schema.org/Product' END)
           || '"><span itemprop="name" content="Entity ' || (doc_id % 30)
           || '">x</span><meta itemprop="sku" content="S' || (doc_id % 17)
           || '"></div>'
      ELSE '' END)
  || (CASE WHEN doc_id % 6 = 0
      THEN '<b itemprop="note" content="n' || (doc_id % 5) || '">y</b>'
      ELSE '' END)
  || '</html>' AS html
FROM documents
"""


def q_unescape_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-entity normalization (fixed replace chain, &amp; last) —
    the equality-key cleaner exact_dedup/anchor_terms/alias joins
    need ('AT&amp;T' == 'AT&T')."""
    from easyner_spark.operators.webtext import html_unescape

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    raw = F.concat(
        F.lit("v&amp;"),
        F.when(did % 2 == 0, F.lit("&lt;tag&gt; ")).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.lit("&quot;q&#39; ")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("&amp;lt;dbl ")).otherwise(F.lit("")),
        F.lit("w&nbsp;z"),
    )
    return d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        raw.alias("raw"),
        html_unescape(raw).alias("clean"),
    )


def q_host_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-bounded strongly-connected-component labels over the host
    link graph — reciprocal-ring (link-exchange) detection that
    undirected components over-merge."""
    from easyner_spark.operators.graph import bounded_scc
    from easyner_spark.operators.webtext import host_graph

    hg = host_graph(_synth_html_pages(spark, sf_dir))
    return bounded_scc(
        hg.select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        ),
        k=3,
    ).select("node", "scc_label")


def q_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-text date mentions normalized to ISO-8601 by pure string
    ops over deterministically injected long/ISO forms — the temporal
    grounding feeder beyond edge_temporal's cue words."""
    from easyner_spark.operators.webtext import date_facts

    return date_facts(_date_pages(spark, sf_dir))


def _date_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 2nd doc carries a long-form date (month cycling by
    doc_id, day 1-28, year 1999+id%25), every 3rd an ISO date, every
    6th both."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    month_names = [
        "January", "February", "March", "April", "May", "June",
        "July", "August", "September", "October", "November",
        "December",
    ]
    mexpr = F.when(did % 12 == 0, F.lit(month_names[0]))
    for i, nm in enumerate(month_names[1:], start=1):
        mexpr = mexpr.when(did % 12 == i, F.lit(nm))
    text = F.concat(
        F.lit("posted "),
        F.when(
            did % 2 == 0,
            F.concat(
                mexpr, F.lit(" "), (did % 28 + 1).cast("string"),
                F.lit(", "), (1999 + did % 25).cast("string"), F.lit(" "),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("on 20"), F.lpad((did % 100).cast("string"), 2, "0"),
                F.lit("-"), F.lpad((did % 12 + 1).cast("string"), 2, "0"),
                F.lit("-"), F.lpad((did % 28 + 1).cast("string"), 2, "0"),
                F.lit(" "),
            ),
        ).otherwise(F.lit("")),
        F.lit("end"),
    )
    return d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        text.alias("text"),
    )


_DATE_PAGES_SQL = """
SELECT 'u' || doc_id AS url,
  'posted '
  || (CASE WHEN doc_id % 2 = 0
      THEN (CASE doc_id % 12
            WHEN 0 THEN 'January' WHEN 1 THEN 'February'
            WHEN 2 THEN 'March' WHEN 3 THEN 'April'
            WHEN 4 THEN 'May' WHEN 5 THEN 'June'
            WHEN 6 THEN 'July' WHEN 7 THEN 'August'
            WHEN 8 THEN 'September' WHEN 9 THEN 'October'
            WHEN 10 THEN 'November' ELSE 'December' END)
           || ' ' || (doc_id % 28 + 1) || ', ' || (1999 + doc_id % 25)
           || ' '
      ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0
      THEN 'on 20' || lpad((doc_id % 100)::VARCHAR, 2, '0') || '-'
           || lpad((doc_id % 12 + 1)::VARCHAR, 2, '0') || '-'
           || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') || ' '
      ELSE '' END)
  || 'end' AS text
FROM documents
"""


def q_kg_window_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window (<=5) entity co-occurrence counts — the tighter-
    evidence edge weighting sentence-level pairs can't express."""
    from easyner_spark.operators.graph import window_cooc

    m = _mentions(spark, sf_dir)
    return window_cooc(
        m, window=5, doc_col="url", sent_col="sent_idx",
        term_col="mention_lc", pos_col="begin_tok",
    ).select("a", "b", "n_pairs")


def q_kg_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-bounded harmonic centrality over the triple graph — the
    disconnected-graph centrality, distance counts rolled up as exact
    integers and folded in one fixed-order float expression."""
    from easyner_spark.operators.graph import harmonic_centrality

    edges = q_triples(spark, sf_dir).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    return harmonic_centrality(edges, k=2).select(
        "source", "hc", "n_reached"
    )


def q_host_wrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional PageRank over the host link graph — the
    rank the link COUNTS justify (host_graph's n_links drives the
    inflow split), vs host_rank's one-host-one-vote uniform walk."""
    from easyner_spark.operators.graph import weighted_pagerank
    from easyner_spark.operators.webtext import host_graph

    hg = host_graph(_synth_html_pages(spark, sf_dir))
    return weighted_pagerank(
        hg.select(
            F.col("src_host").alias("src"),
            F.col("dst_host").alias("dst"),
            F.col("n_links").alias("weight"),
        )
    ).select("node", "rank")


_KWIC_TERMS = ("hash", "scan", "merge")


def q_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance: first occurrence of each query
    term per document (instr-located char offsets), 20-char windows —
    pure substring arithmetic, zero UDF, zero regex."""
    from easyner_spark.operators.search import kwic

    docs = _docs(spark, sf_dir)
    sents = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit(0).cast("long").alias("sent_idx"),
        F.col("text").alias("sentence"),
    )
    parts = []
    for t in _KWIC_TERMS:
        pos = F.instr(F.col("sentence"), t)
        parts.append(
            sents.where(pos > 0).select(
                "url",
                "sent_idx",
                (pos - 1).cast("long").alias("begin"),
                (pos - 1 + len(t)).cast("long").alias("end"),
                F.lit(t).alias("mention"),
            )
        )
    ments = parts[0]
    for x in parts[1:]:
        ments = ments.unionByName(x)
    return kwic(ments, sents, window=20)


def q_citations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scholarly-identifier pulls (DOI / arXiv / PMID) over pages with
    deterministically injected citations — the web->literature
    linking edge for a scientific KG."""
    from easyner_spark.operators.webtext import citation_facts

    return citation_facts(_citation_pages(spark, sf_dir))


def _citation_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 3rd doc cites a DOI, every 5th an arXiv id, every 7th a
    PMID (some docs carry several); the rest carry none."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    text = F.concat(
        F.lit("body "),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("see 10.1038/j"), (did % 50).cast("string"),
                F.lit(".x "),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit("arXiv:20"), F.lpad((did % 100).cast("string"), 2, "0"),
                F.lit(".1"), F.lpad((did % 1000).cast("string"), 4, "0"),
                F.lit(" "),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(F.lit("PMID: "), (10000 + did).cast("string"), F.lit(" ")),
        ).otherwise(F.lit("")),
        F.lit("end"),
    )
    return d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        text.alias("text"),
    )


_CITATION_PAGES_SQL = """
SELECT 'u' || doc_id AS url,
  'body '
  || (CASE WHEN doc_id % 3 = 0
      THEN 'see 10.1038/j' || (doc_id % 50) || '.x ' ELSE '' END)
  || (CASE WHEN doc_id % 5 = 0
      THEN 'arXiv:20' || lpad((doc_id % 100)::VARCHAR, 2, '0')
           || '.1' || lpad((doc_id % 1000)::VARCHAR, 4, '0') || ' '
      ELSE '' END)
  || (CASE WHEN doc_id % 7 = 0
      THEN 'PMID: ' || (10000 + doc_id) || ' ' ELSE '' END)
  || 'end' AS text
FROM documents
"""


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keywords per document (smoothed sklearn-style
    idf, round-6 contract, per-doc window — no SinglePartition) —
    the per-document tagging/summarization product."""
    from easyner_spark.operators.ranking import doc_keywords

    return doc_keywords(_docs(spark, sf_dir), k=5)


def q_kg_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the entity co-occurrence graph — one
    exact-integer-sums Pearson row; the structural fingerprint that
    picks the pruning strategy (k_core vs template_cap)."""
    from easyner_spark.operators.graph import (
        degree_assortativity,
        sentence_pairs,
    )

    pairs = sentence_pairs(_mentions(spark, sf_dir))
    und = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return degree_assortativity(und).select(
        "m2", "sum_x", "sum_xx", "sum_xy", "r"
    )


def _merge_label_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic noisy-label synthesis: four base names cycled by
    doc_id, a numeric qualifier, and a trailing-typo variant every 7th
    doc — guarantees distance-1 pairs inside prefix blocks."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    base = (
        F.when(did % 4 == 0, F.lit("alpha"))
        .when(did % 4 == 1, F.lit("beta"))
        .when(did % 4 == 2, F.lit("gamma"))
        .otherwise(F.lit("delta"))
    )
    label = F.concat(
        base,
        (did % 25).cast("string"),
        F.when(did % 7 == 0, F.lit("x")).otherwise(F.lit("")),
    )
    return d.select(
        F.concat(F.lit("n"), did.cast("string")).alias("id"),
        label.alias("label"),
    )


_MERGE_LABELS_SQL = """
SELECT 'n' || doc_id AS id,
       (CASE WHEN doc_id % 4 = 0 THEN 'alpha'
             WHEN doc_id % 4 = 1 THEN 'beta'
             WHEN doc_id % 4 = 2 THEN 'gamma'
             ELSE 'delta' END)
       || (doc_id % 25)
       || (CASE WHEN doc_id % 7 = 0 THEN 'x' ELSE '' END) AS label
FROM documents
"""


def q_entity_merge_cands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage merge candidates over noisy entity labels:
    two-key (prefix/suffix + length-bucket) blocking, block-size cap,
    JVM levenshtein verify — the typo-tolerant canonicalization feeder
    name_similarity_edges' char-grams under-score."""
    from easyner_spark.operators.nel import edit_merge_candidates

    return edit_merge_candidates(
        _merge_label_rows(spark, sf_dir), max_dist=2
    ).select("id_a", "id_b", "label_a", "label_b", "dist")


def q_host_trust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank spam mass over the extracted host link graph:
    personalized PageRank from the two declared-trusted hosts vs plain
    PageRank; mass -> 1 flags hosts whose authority is unreachable
    from trust (link-farm shape). The demotion signal crawl
    prioritization applies before believing host_rank."""
    from easyner_spark.operators.graph import spam_mass
    from easyner_spark.operators.webtext import host_graph

    hg = host_graph(_synth_html_pages(spark, sf_dir))
    edges = hg.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    seeds = spark.createDataFrame(
        [("hub.example.com",), ("blog.example.org",)], ["node"]
    )
    return spam_mass(edges, seeds).select("node", "pr", "tr", "spam_mass")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-packing metadata: every document's landing
    position (window id + offset) in the capacity-512 packed token
    stream, computed by the distributed two-pass prefix sum (no
    Exchange SinglePartition; the oracle uses the serial window the
    engine refuses to plan). Exact integers only."""
    from easyner_spark.operators.sampling import pack_sequences
    from easyner_spark.operators.textstats import words_array

    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(words_array("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(d, capacity=512)


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles of document length: ONE value-keyed
    aggregate collapses the corpus to its distinct lengths, then the
    running-sum window + rank pick run on that bounded table. q rides
    as integer micro-units, rank via integer ceil-division — every
    cell integer-exact (sketches.exact_quantiles)."""
    from easyner_spark.operators.sketches import exact_quantiles

    return exact_quantiles(_docs(spark, sf_dir), F.length("text"))


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, first 6 merge rules: one corpus scan
    collapses to the word-frequency table, then each round is a
    bounded pair aggregate + 1-row argmax + broadcast rewrite — the
    canonical corpus-scale BPE formulation (operators/tokenizer.py);
    the oracle unrolls all 6 data-dependent rounds in SQL."""
    from easyner_spark.operators.tokenizer import bpe_merges

    return bpe_merges(_docs(spark, sf_dir), n_merges=6)


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies after applying the 6 learned BPE
    rules — the trained tokenizer's actual output distribution; the
    oracle re-derives all 6 merges AND the final rewrite in SQL."""
    from easyner_spark.operators.tokenizer import bpe_token_counts

    return bpe_token_counts(_docs(spark, sf_dir), n_merges=6)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus encoded by its own trained tokenizer (train 6 rules,
    apply to every document's word stream): (doc_id, word_idx,
    tok_idx, token). Encoding chains the 6 learned rules over the
    DISTINCT-word dictionary, never per-document."""
    from easyner_spark.operators.tokenizer import bpe_encode

    return bpe_encode(_docs(spark, sf_dir), n_merges=6)


def q_tokenized_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining assembly chain composed end-to-end: train
    the BPE tokenizer on the corpus, encode every document, count each
    document's REAL subword tokens, and concat-pack into capacity-128
    context windows. Documents with zero in-alphabet words are absent
    (nothing to pack). Uses pack_sequences' window twin — the packing
    input is the bounded per-doc count table, not the corpus."""
    from easyner_spark.operators.sampling import pack_sequences
    from easyner_spark.operators.tokenizer import bpe_encode

    enc = bpe_encode(_docs(spark, sf_dir), n_merges=6)
    counts = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        counts, capacity=128, tokens_col="n_tokens", id_col="doc_id",
        strategy="window",
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("seq_off").cast("long").alias("seq_off"),
    )


def q_kg_edge_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge temporal lifecycle (first/last epoch, epoch count,
    new/stale/active status vs the latest crawl epoch) -- the diff
    view an incremental KG maintains per ingestion round. Epoch is
    synthesized as doc_id % 5 (same recipe as latest_crawl's
    synthetic recrawls); exact integers + string CASE only."""
    from easyner_spark.operators.triples import edge_history

    t = q_triples(spark, sf_dir).withColumn(
        "epoch", (F.col("doc_id") % 5).cast("long")
    )
    return edge_history(t)


def q_kg_wl_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round Weisfeiler-Lehman structural labels over the entity
    co-occurrence graph: string-hash color refinement, no floats —
    entities sharing a label are structurally indistinguishable to
    depth 2 (graph.wl_labels docstring)."""
    from easyner_spark.operators.graph import sentence_pairs, wl_labels

    pairs = sentence_pairs(_mentions(spark, sf_dir))
    und = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return wl_labels(und, iters=2)


CMS_CANDIDATES = ["join", "hash", "row", "batch", "scan", "zzznope"]


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates for a candidate term list over the
    document token stream — O(d*w) sketch state instead of a full
    GROUP BY over the key space; the absent candidate ('zzznope')
    exercises collision-floor behavior. Deterministic md5-seeded
    rows; the oracle rebuilds the identical sketch
    (sketches.cms_oracle_sql)."""
    from easyner_spark.operators.sketches import cms_estimate, cms_sketch
    from easyner_spark.operators.textstats import words_array

    tok = _docs(spark, sf_dir).select(F.explode(words_array("text")).alias("x"))
    sk = cms_sketch(tok, "x")
    cand = spark.createDataFrame([(t,) for t in CMS_CANDIDATES], "term string")
    return cms_estimate(sk, cand)


def q_kg_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the entity co-occurrence graph: extraction-noise
    periphery peels away, the dense evidence core survives with its
    within-core degree. Capped-round contract — both engines run at
    most 8 peeling rounds; convergence within the cap is asserted by
    pytest at this scale (graph.k_core docstring)."""
    from easyner_spark.operators.graph import k_core, sentence_pairs

    pairs = sentence_pairs(_mentions(spark, sf_dir))
    und = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return k_core(und, k=2, max_rounds=8)


def q_kg_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor / Adamic-Adar link prediction over the entity
    co-occurrence graph — the KG-completion layer above components
    (reachability) and kg_communities (density): pairs that SHARE
    neighbors but never co-occur are the candidate missing edges.
    Adamic-Adar weights are micro-unit-quantized per wedge center
    before the cross-row sum (graph.link_prediction docstring)."""
    from easyner_spark.operators.graph import link_prediction, sentence_pairs

    pairs = sentence_pairs(_mentions(spark, sf_dir))
    und = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return link_prediction(und, min_common=2)


# ---------------------------------------------------------------------------
# Webtext URL/host operators over the documents table with
# deterministically synthesized urls (input_hint: pages keyed by url).
# The url construction is repeated VERBATIM in the oracle SQL; both
# engines parse/canonicalize with the same ASCII regexes.
# ---------------------------------------------------------------------------


def _synth_url_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> pages with a skewed deterministic url per doc:
    30% of docs on one hot host, 20% on a second, the rest spread over
    37 tail hosts; every 13th doc http, every 11th carries a port."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    host = (
        F.when(did % 10 < 3, F.lit("hub.example.com"))
        .when(did % 10 < 5, F.lit("blog.example.org"))
        .otherwise(F.concat(F.lit("site"), (did % 37).cast("string"), F.lit(".example.net")))
    )
    scheme = F.when(did % 13 == 0, F.lit("http")).otherwise(F.lit("https"))
    port = F.when(did % 11 == 0, F.lit(":8080")).otherwise(F.lit(""))
    url = F.concat(scheme, F.lit("://"), host, port, F.lit("/p/"), did.cast("string"))
    return d.select("doc_id", url.alias("url"), "text", "lang")


def q_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host rollup (page count, chars, language spread) — one
    partial-agg-absorbed shuffle on the extracted host key."""
    from easyner_spark.operators.webtext import host_stats

    out = host_stats(_synth_url_pages(spark, sf_dir))
    return out.select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("n_langs").cast("long").alias("n_langs"),
        "mean_chars",
    )


def q_host_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-skew profile: rank/share/cumulative share plus the salt
    factor a host-keyed join would need (target 50 rows/partition at
    this scale so the hot host actually salts)."""
    from easyner_spark.operators.webtext import host_skew_profile

    out = host_skew_profile(_synth_url_pages(spark, sf_dir), target_partition_rows=50)
    return out.select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("host_rank").cast("long").alias("host_rank"),
        "share",
        "cum_share",
        F.col("salt").cast("long").alias("salt"),
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL exact dedup: recrawl variants (www., tracking
    params, trailing slash, fragments) collapse onto one canonical
    form; min raw url per group survives."""
    from easyner_spark.operators.webtext import url_dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    host = (
        F.when(did % 10 < 3, F.lit("hub.example.com"))
        .when(did % 10 < 5, F.lit("blog.example.org"))
        .otherwise(F.concat(F.lit("site"), (did % 37).cast("string"), F.lit(".example.net")))
    )
    base = F.concat(F.lit("https://"), host, F.lit("/p/"), (did % 211).cast("string"))
    url = (
        F.when(did % 4 == 0, F.concat(base, F.lit("?utm_source=feed&id="), (did % 211).cast("string")))
        .when(did % 4 == 1, F.concat(F.lit("https://www."), host, F.lit("/p/"), (did % 211).cast("string")))
        .when(did % 4 == 2, F.concat(base, F.lit("/")))
        .otherwise(F.concat(base, F.lit("#sec-"), did.cast("string")))
    )
    pages = d.select("doc_id", url.alias("url"))
    return url_dedup(pages).select("doc_id", "url", "canon_url", "is_dup")


def q_resolve_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution by pointer doubling: a synthetic
    functional redirect graph over documents (r = doc_id % 10):
    r 1-4 step down one id (chains of 1..4 hops onto the r=0
    terminal), r 7<->8 form a 2-cycle, r 9 self-loops; r 0/5/6 have
    no redirect (terminals). Chains resolve with exact hop counts;
    the cycles exhaust max_steps=8 and come back 'unresolved'."""
    from easyner_spark.operators.webtext import resolve_redirects

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    r = did % 10
    target_id = (
        F.when(r.between(1, 4), did - 1)
        .when(r == 7, did + 1)
        .when(r == 8, did - 1)
        .when(r == 9, did)
    )
    redirects = d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        F.concat(F.lit("u"), target_id.cast("string")).alias("target"),
    ).where(target_id.isNotNull())
    return resolve_redirects(redirects, max_steps=8)


def _synth_html_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_synth_url_pages + a deterministic html column (binary, as the
    input_hint specifies) carrying 2-4 outlinks per page: one absolute
    cross-host link, one relative link (resolves to the source host),
    every 3rd page a protocol-relative link to the hub, every 4th a
    mailto: (dropped by the classifier)."""
    did = F.col("doc_id")
    link_abs = F.concat(
        F.lit('<a href="https://site'),
        ((did * 7) % 37).cast("string"),
        F.lit('.example.net/p/1">x</a>'),
    )
    link_rel = F.concat(
        F.lit('<a href="/local/'), (did % 5).cast("string"), F.lit('">y</a>')
    )
    link_proto = F.when(
        did % 3 == 0, F.lit('<a href="//hub.example.com/z">z</a>')
    ).otherwise(F.lit(""))
    link_mail = F.when(
        did % 4 == 0, F.lit('<a href="mailto:a@b.c">m</a>')
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body><p>t</p>"),
        link_abs, link_rel, link_proto, link_mail,
        F.lit("</body></html>"),
    )
    return _synth_url_pages(spark, sf_dir).withColumn(
        "html", html.cast("binary")
    )


def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The host-level link graph (src_host, dst_host, n_links) — the
    canonical Common-Crawl derived product, aggregated from regex href
    extraction in one partial-agg shuffle."""
    from easyner_spark.operators.webtext import host_graph

    out = host_graph(_synth_html_pages(spark, sf_dir))
    return out.select(
        "src_host", "dst_host", F.col("n_links").cast("long").alias("n_links")
    )


def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-authority PageRank over the extracted link graph — link
    extraction, host-graph rollup, and the fixed-iteration power
    method composed end-to-end (crawl prioritization)."""
    from easyner_spark.operators.graph import pagerank
    from easyner_spark.operators.webtext import host_graph

    hg = host_graph(_synth_html_pages(spark, sf_dir))
    edges = hg.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    return pagerank(edges, iters=3).select("node", "rank")


def q_host_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host link reciprocity over the extracted host graph — the
    graph-side link-farm fingerprint (reciprocal-ring detection)."""
    from easyner_spark.operators.webtext import host_graph, host_reciprocity

    hg = host_graph(_synth_html_pages(spark, sf_dir))
    return host_reciprocity(hg)


def q_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-proportional deterministic sampling (FineWeb-style soft
    quality filter): keep probability n_words/200, integer-exact
    md5_long32 cross-multiplication gate, zero shuffle."""
    from easyner_spark.operators.sampling import quality_weighted_sample
    from easyner_spark.operators.textstats import words_array

    scored = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(words_array("text")).cast("long").alias("n_words"),
    )
    return quality_weighted_sample(
        scored, score_col="n_words", max_score=200, key="doc_id", seed="qs1"
    ).select(F.col("doc_id").alias("id"), "n_words")


def q_host_spam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-farm signals over the extracted host graph: outlink
    volume, fanout, hottest-target share, and reciprocity per source
    host — exact BIGINT floor-division percentages, the graph-QA
    layer crawl prioritization consults before trusting host_rank."""
    from easyner_spark.operators.webtext import host_graph, host_spam_signals

    return host_spam_signals(host_graph(_synth_html_pages(spark, sf_dir)))


def q_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the extracted host link graph —
    the hub/authority split PageRank can't make (an index page links
    out everywhere = hub; a hot target = authority). Fixed-iteration,
    L-inf normalized, round(·,9) state contract; oracle = unrolled
    CTE chain (_hits_oracle_body, the pagerank recipe)."""
    from easyner_spark.operators.graph import hits
    from easyner_spark.operators.webtext import host_graph

    hg = host_graph(_synth_html_pages(spark, sf_dir))
    edges = hg.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    return hits(edges, iters=3)


def _synth_anchor_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_synth_url_pages + html whose links carry MULTI-WORD anchor
    text (the signal anchor_terms aggregates): an absolute cross-host
    link ('Read Page N'), a relative link with two rotating labels,
    every 4th page a protocol-relative 'The HUB portal' link."""
    did = F.col("doc_id")
    a1 = F.concat(
        F.lit('<a href="https://site'),
        ((did * 7) % 37).cast("string"),
        F.lit('.example.net/p/1">Read Page '),
        (did % 211).cast("string"),
        F.lit("</a>"),
    )
    a2 = F.concat(
        F.lit('<a href="/local/'),
        (did % 5).cast("string"),
        F.lit('">'),
        F.when(did % 3 == 0, F.lit("Home & Garden")).otherwise(F.lit("next-page 2")),
        F.lit("</a>"),
    )
    a3 = F.when(
        did % 4 == 0, F.lit('<a href="//hub.example.com/z">The HUB portal</a>')
    ).otherwise(F.lit(""))
    html = F.concat(F.lit("<html><body>"), a1, a2, a3, F.lit("</body></html>"))
    return _synth_url_pages(spark, sf_dir).withColumn("html", html.cast("binary"))


def q_link_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text link density (jusText-style list-page signal):
    synthetic pages whose anchor text is a 40-char snippet of the doc
    and whose even-id pages carry 200 extra chars of body text, so
    density splits by id parity; exact integer counts both engines."""
    from easyner_spark.operators.webtext import link_density

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body><a href="https://x.example/p">'),
        F.substring("text", 1, 40),
        F.lit("</a>"),
        F.when(did % 2 == 0, F.substring("text", 41, 200)).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = docs.select(did.cast("string").alias("url"), html.alias("html"))
    out = link_density(pages)
    return out.select(
        F.col("url").cast("long").alias("id"),
        "n_chars",
        "n_anchors",
        "anchor_chars",
        "density_micro",
        "is_linkfarm_page",
    )


def q_anchor_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host anchor-text term profile (dst_host, term, n) — the
    web-derived alias/name table for entity canonicalization; one
    partial-agg shuffle after scan-fused extraction."""
    from easyner_spark.operators.webtext import anchor_terms

    out = anchor_terms(_synth_anchor_pages(spark, sf_dir))
    return out.select("dst_host", "term", F.col("n").cast("long").alias("n"))


def q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl change tracking: 5 synthetic fetches per url with
    deterministic text flips (did%7<2 appends ' v2'), lag-compare per
    url ordered by unique warc_ts."""
    from easyner_spark.operators.webtext import crawl_delta

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://site"), (did % 100).cast("string"), F.lit(".example.net/p")
    )
    text = F.concat(
        F.lit("page content "),
        (did % 100).cast("string"),
        F.when(did % 7 < 2, F.lit(" v2")).otherwise(F.lit("")),
    )
    pages = d.select(
        url.alias("url"),
        (F.lit(1700000000) + did).cast("long").alias("warc_ts"),
        text.alias("text"),
        "doc_id",
    )
    out = crawl_delta(pages)
    return out.select(
        "url",
        "warc_ts",
        F.col("doc_id").cast("long").alias("doc_id"),
        "change",
        F.col("delta_chars").cast("long").alias("delta_chars"),
    )


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide paragraph dedup over documents
    restructured into newline paragraphs, with shared boilerplate
    paragraphs ('subscribe...', 'all rights reserved') injected on
    every 2nd/3rd doc so cross-document collapse actually fires."""
    from easyner_spark.operators.dedup import paragraph_dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    text = F.concat(
        F.regexp_replace("text", " a ", "\n"),
        F.when(did % 2 == 0, F.lit("\nsubscribe to our newsletter")).otherwise(
            F.lit("")
        ),
        F.when(did % 3 == 0, F.lit("\nall rights reserved")).otherwise(F.lit("")),
    )
    out = paragraph_dedup(d.select("doc_id", text.alias("text")))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text_dedup",
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_kept").cast("long").alias("n_kept"),
    )


def q_crawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl scheduling: next-fetch priority per url = host authority
    (PageRank over the extracted link graph) x recrawl change activity
    (crawl_delta 'changed' count). The composition a crawler actually
    ranks its frontier by — authority says the host matters, change
    rate says the page goes stale. 50 urls x ~10 fetches on hosts
    overlapping the link graph's tail (missing hosts take the 0.15
    teleport floor via the left join)."""
    from easyner_spark.operators.graph import pagerank
    from easyner_spark.operators.webtext import crawl_delta, host_graph

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    key = did % 50
    host = F.concat(F.lit("site"), (key % 37).cast("string"), F.lit(".example.net"))
    pages = d.select(
        F.concat(F.lit("https://"), host, F.lit("/p/"), key.cast("string")).alias("url"),
        host.alias("host"),
        (F.lit(1700000000) + did).cast("long").alias("warc_ts"),
        F.concat(
            F.lit("page content "),
            key.cast("string"),
            F.when(did % 7 < 2, F.lit(" v2")).otherwise(F.lit("")),
        ).alias("text"),
    )
    freq = (
        crawl_delta(pages)
        .groupBy("url", "host")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum(
                F.when(F.col("change") == "changed", F.lit(1)).otherwise(F.lit(0))
            ).alias("n_changed"),
        )
    )
    hg = host_graph(_synth_html_pages(spark, sf_dir))
    ranks = pagerank(
        hg.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst")),
        iters=3,
    ).withColumnRenamed("node", "host")
    out = freq.join(F.broadcast(ranks), "host", "left")
    return out.select(
        "url",
        F.col("n_fetches").cast("long").alias("n_fetches"),
        F.col("n_changed").cast("long").alias("n_changed"),
        F.round(
            F.coalesce(F.col("rank"), F.lit(0.15)) * (F.lit(1) + F.col("n_changed")),
            6,
        ).alias("priority"),
    )


def q_fuzzy_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy NEL second pass (nel.fuzzy_link_surfaces): surface forms
    the exact alias join misses — pluralized and head-clipped variants
    of every alias term — map to the char-gram-closest alias entity
    (bipartite inverted-index join, per-surface argmax window:
    jq desc, ID asc, term asc). The oracle rebuilds the whole chain
    including the tie on 'rapamycin' carrying two KB ids (min ID must
    win deterministically)."""
    from easyner_spark.operators.nel import fuzzy_link_surfaces

    t = _alias_df(spark).select(F.lower("term").alias("term"))
    surfaces = (
        t.select(F.concat("term", F.lit("s")).alias("name"))
        .unionByName(t.select(F.substring("term", 2, 1000).alias("name")))
        .distinct()
    )
    return fuzzy_link_surfaces(surfaces, _alias_df(spark), k=3, threshold=0.4)


def q_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-name canonicalization edges: EXACT char-3-gram
    Jaccard >= 0.5 between corpus surface forms and their pluralized
    variants (inverted-index join, never all-pairs) — the record-
    linkage feeder operators/components merges into canonical nodes.
    Oracle generated by nel.name_similarity_oracle_sql."""
    from easyner_spark.operators.nel import name_similarity_edges

    words = (
        _docs(spark, sf_dir)
        .select(F.explode(F.expr(r"regexp_extract_all(lower(text), '\\w+', 0)")).alias("name"))
        .distinct()
    )
    names = words.unionByName(
        words.select(F.concat(F.col("name"), F.lit("s")).alias("name"))
    ).distinct()
    return name_similarity_edges(names, k=3, threshold=0.5)


def q_topic_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-argmax topic bucketing (lang_id contract applied to
    subject matter; zero shuffle). Oracle generated from the SAME
    lexicon dict by topic_oracle_sql, so marker sets cannot drift."""
    from easyner_spark.operators.textstats import topic_id

    return topic_id(_docs(spark, sf_dir))


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-substring flagging (Lee et al. 2022
    semantics, relational formulation) over the perturbed corpus —
    the first-word-dropped twins guarantee long shared token runs, so
    every document yields merged duplicate spans. k=8 token windows,
    count>=2 anywhere in the corpus; oracle generated by the
    operator's own repeated_spans_oracle_sql."""
    from easyner_spark.operators.dedup import repeated_spans

    return repeated_spans(_docs_perturbed(spark, sf_dir), k=8, min_count=2)


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-context training-window chunker (32-token windows, 8
    overlap, runt tails under 5 tokens dropped unless they're the
    doc's only chunk) — zero shuffle, one scan-fused narrow chain.
    Oracle generated by the operator's own chunk_docs_oracle_sql
    (generate_series stride + 1-based inclusive list_slice)."""
    from easyner_spark.operators.sampling import chunk_docs

    return chunk_docs(_docs(spark, sf_dir), max_tokens=32, overlap=8, min_tail=5)


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style domain blocklist over the skewed synthetic urls:
    blocking 'example.org' must also block 'blog.example.org' (parent-
    domain semantics via the host_suffixes codegen array — zero
    shuffle, zero join for a literal list). The oracle decides
    membership by an INDEPENDENT formulation (exact-or-'.'-suffix
    LIKE), so the suffix-array construction itself is under test."""
    from easyner_spark.operators.webtext import url_blocklist_filter

    blocked = ("example.org", "hub.example.com", "site5.example.net")
    return url_blocklist_filter(_synth_url_pages(spark, sf_dir), blocked).select(
        "doc_id", "url"
    )


_ROBOTS_RULES = [
    # longest-match demo on the hot host: /p/1* disallowed EXCEPT the
    # longer /p/11* allow carve-out; /p/13 is an exact-length tie
    # (allow must win per RFC 9309)
    ("hub.example.com", "disallow", "/p/1"),
    ("hub.example.com", "allow", "/p/11"),
    ("hub.example.com", "disallow", "/p/2"),
    ("hub.example.com", "allow", "/p/13"),
    ("hub.example.com", "disallow", "/p/13"),
    # whole-host block via the empty prefix
    ("blog.example.org", "disallow", ""),
    # explicit allow-everything host
    ("site3.example.net", "allow", "/"),
    # rule that matches nothing on its host
    ("site5.example.net", "disallow", "/q"),
]


def q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REP politeness verdicts over the skewed synthetic urls:
    longest-match, allow-on-tie, empty-prefix host block, rule-less
    hosts allowed. Host-keyed join is AQE-decided (skew hazard
    documented in webtext.robots_verdict); winner is a min-of-struct
    partial agg on the url key."""
    from easyner_spark.operators.webtext import robots_verdict

    rules = spark.createDataFrame(
        _ROBOTS_RULES, "host string, directive string, path_prefix string"
    )
    return robots_verdict(_synth_url_pages(spark, sf_dir), rules)


# Closed 23-entity synthetic KG shared by the kg_negatives /
# kg_random_walks / kg_degree_stats queries AND their oracles — one
# definition per side so the Spark/SQL pairs cannot drift (the
# _ANCHORS_PREFIX pattern).
_KG_EDGES_SQL = """SELECT 'e' || (doc_id % 23) AS a,
    'e' || ((doc_id * 7 + 3) % 23) AS b
  FROM documents
  WHERE (doc_id % 23) != ((doc_id * 7 + 3) % 23)"""

_KG_TRIPLES_SQL = """SELECT DISTINCT 'e' || (doc_id % 23) AS subj,
    CASE WHEN doc_id % 3 = 0 THEN 'inhibits'
         WHEN doc_id % 3 = 1 THEN 'binds'
         ELSE 'activates' END AS pred,
    'e' || ((doc_id * 7 + 3) % 23) AS obj
  FROM documents
  WHERE (doc_id % 23) != ((doc_id * 7 + 3) % 23)"""


def _kg_synth_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) twin of _KG_EDGES_SQL (non-distinct; callers dedup
    as their operator requires)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    return d.select(
        F.concat(F.lit("e"), (did % 23).cast("string")).alias("src"),
        F.concat(F.lit("e"), ((did * 7 + 3) % 23).cast("string")).alias("dst"),
    ).where((did % 23) != ((did * 7 + 3) % 23))


def _kg_synth_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subj, pred, obj) twin of _KG_TRIPLES_SQL (distinct)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    return (
        d.select(
            F.concat(F.lit("e"), (did % 23).cast("string")).alias("subj"),
            F.when(did % 3 == 0, F.lit("inhibits"))
            .when(did % 3 == 1, F.lit("binds"))
            .otherwise(F.lit("activates"))
            .alias("pred"),
            F.concat(F.lit("e"), ((did * 7 + 3) % 23).cast("string")).alias("obj"),
        )
        .where((did % 23) != ((did * 7 + 3) % 23))
        .distinct()
    )


def q_kg_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-LCWA negative sampling over the closed deterministic
    triple set (23-entity vocab, 3 predicates): per true triple k=3
    md5-indexed object corruptions, self-corruptions and accidental
    positives dropped — bit-reproducible, no RNG."""
    from easyner_spark.operators.graph import kg_negatives

    return kg_negatives(_kg_synth_triples(spark, sf_dir), k=3)


# Richer closed synthetic KG for rule mining: 31-entity vocab, 7
# predicates built as residue permutations x -> a*x+b (mod 31) so the
# DISTINCT triple set is the same exact algebra at every sf >= 217
# docs, with DESIGNED rule structure: employs = works_for^-1 (inv rule
# conf 1.0), city_of = located_in gated on subj residue (imp rule one
# direction 1.0, other 21/31), near an involution (symmetric inv
# rule), and same_region = near o located_in gated on subj%5 (chain
# rule std-conf 24/31 but PCA-conf 1.0 — the open-world case PCA
# exists for). One definition per side (the _KG_EDGES_SQL pattern).
_KG_RULES_SQL = """SELECT DISTINCT
  'n' || (CASE WHEN doc_id % 7 = 1 THEN (doc_id * 3 + 2) % 31
               ELSE doc_id % 31 END) AS subj,
  CASE doc_id % 7 WHEN 0 THEN 'works_for' WHEN 1 THEN 'employs'
       WHEN 2 THEN 'located_in' WHEN 3 THEN 'city_of'
       WHEN 4 THEN 'near' WHEN 5 THEN 'partner_of'
       ELSE 'same_region' END AS pred,
  'n' || (CASE doc_id % 7
       WHEN 0 THEN (doc_id * 3 + 2) % 31
       WHEN 1 THEN doc_id % 31
       WHEN 2 THEN (doc_id * 5 + 4) % 31
       WHEN 3 THEN (doc_id * 5 + 4) % 31
       WHEN 4 THEN (31 - doc_id % 31) % 31
       WHEN 5 THEN (doc_id * 7 + 9) % 31
       ELSE (doc_id * 26 + 27) % 31 END) AS obj
  FROM documents
  WHERE NOT (doc_id % 7 = 3 AND (doc_id % 31) % 3 = 0)
    AND NOT (doc_id % 7 = 5 AND (doc_id % 31) % 2 = 1)
    AND NOT (doc_id % 7 = 6 AND (doc_id % 31) % 5 = 0)"""


def _kg_rules_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subj, pred, obj) twin of _KG_RULES_SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    m = did % 7
    x = did % 31
    subj = F.concat(
        F.lit("n"),
        F.when(m == 1, (did * 3 + 2) % 31).otherwise(x).cast("string"),
    )
    pred = (
        F.when(m == 0, F.lit("works_for"))
        .when(m == 1, F.lit("employs"))
        .when(m == 2, F.lit("located_in"))
        .when(m == 3, F.lit("city_of"))
        .when(m == 4, F.lit("near"))
        .when(m == 5, F.lit("partner_of"))
        .otherwise(F.lit("same_region"))
    )
    obj = F.concat(
        F.lit("n"),
        F.when(m == 0, (did * 3 + 2) % 31)
        .when(m == 1, x)
        .when(m == 2, (did * 5 + 4) % 31)
        .when(m == 3, (did * 5 + 4) % 31)
        .when(m == 4, (31 - x) % 31)
        .when(m == 5, (did * 7 + 9) % 31)
        .otherwise((did * 26 + 27) % 31)
        .cast("string"),
    )
    return (
        d.where(
            ~((m == 3) & (x % 3 == 0))
            & ~((m == 5) & (x % 2 == 1))
            & ~((m == 6) & (x % 5 == 0))
        )
        .select(subj.alias("subj"), pred.alias("pred"), obj.alias("obj"))
        .distinct()
    )


def q_kg_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMIE-style closed horn-rule mining (imp/inv/chain shapes with
    support, std confidence, PCA confidence, head coverage — all
    exact BIGINT micro-units) over the designed 31-entity rule KG."""
    from easyner_spark.operators.triples import mine_rules

    return mine_rules(_kg_rules_triples(spark, sf_dir), min_support=2)


def q_kg_rule_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG completion: apply the mined rules (PCA confidence >= 0.7)
    to derive missing triples with best-rule score + firing-rule
    count — the AMIE prediction step, broadcast rules on bounded
    predicate vocabulary."""
    from easyner_spark.operators.triples import rule_predictions

    return rule_predictions(
        _kg_rules_triples(spark, sf_dir), min_support=2, min_pca_micro=700_000
    )


# Deterministic node-type table for the 31-entity rule KG: residue
# mod 3 -> person/place/org; 'n7' left untyped to exercise the
# unknown bucket. One definition per side.
_KG_TYPES_SQL = """SELECT 'n' || range AS entity_id,
  CASE range % 3 WHEN 0 THEN 'person' WHEN 1 THEN 'place'
       ELSE 'org' END AS ent_type
  FROM range(0, 31) WHERE range != 7"""


def _kg_rules_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(entity_id, ent_type) twin of _KG_TYPES_SQL."""
    r = spark.range(31).where(F.col("id") != 7)
    return r.select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("entity_id"),
        F.when(F.col("id") % 3 == 0, F.lit("person"))
        .when(F.col("id") % 3 == 1, F.lit("place"))
        .otherwise(F.lit("org"))
        .alias("ent_type"),
    )


def q_kg_pred_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate domain/range signature induction over the rule KG:
    per (pred, subj_type, obj_type) exact counts, micro shares, and
    the min(struct)-argmax dominant flag; 'n7' untyped to cover the
    unknown bucket."""
    from easyner_spark.operators.triples import predicate_signatures

    return predicate_signatures(
        _kg_rules_triples(spark, sf_dir), _kg_rules_types(spark, sf_dir)
    )


def q_kg_pred_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate synonym / inverse / symmetry detection over the
    designed rule KG — employs=works_for^-1 scores inverse containment
    1.0, 'near' scores as an involution, city_of surfaces as a
    located_in subset; exact BIGINT micro-unit Jaccard + both
    containments."""
    from easyner_spark.operators.triples import predicate_equivalences

    return predicate_equivalences(_kg_rules_triples(spark, sf_dir))


# Sparser node-type table for type inference: only residues with
# range % 4 != 0 are typed, so n0, n4, ..., n28 (8 entities) are the
# inference targets. One definition per side.
_KG_SPARSE_TYPES_SQL = """SELECT 'n' || range AS entity_id,
  CASE range % 3 WHEN 0 THEN 'person' WHEN 1 THEN 'place'
       ELSE 'org' END AS ent_type
  FROM range(0, 31) WHERE range % 4 != 0"""


def _kg_sparse_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(entity_id, ent_type) twin of _KG_SPARSE_TYPES_SQL."""
    r = spark.range(31).where(F.col("id") % 4 != 0)
    return r.select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("entity_id"),
        F.when(F.col("id") % 3 == 0, F.lit("person"))
        .when(F.col("id") % 3 == 1, F.lit("place"))
        .otherwise(F.lit("org"))
        .alias("ent_type"),
    )


def q_kg_type_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-vote type propagation: the 8 untyped rule-KG
    entities inherit exact BIGINT vote shares from the typed
    participants of their predicates (subject votes from domain
    counts, object votes from range counts), argmax flagged via the
    min(struct) rule."""
    from easyner_spark.operators.triples import infer_entity_types

    return infer_entity_types(
        _kg_rules_triples(spark, sf_dir), _kg_sparse_types(spark, sf_dir)
    )


# Shared KMV fixture: 5 hosts with overlapping deterministic token
# vocabularies (residues mod 211). One definition per side.
_KMV_SRC_SQL = """SELECT
  CASE WHEN doc_id % 10 < 3 THEN 'hub' WHEN doc_id % 10 < 5 THEN 'blog'
       ELSE 'site' || (doc_id % 3) END AS host,
  't' || (doc_id % 211) AS tok
  FROM documents"""


def _kmv_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, tok) twin of _KMV_SRC_SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    host = (
        F.when(did % 10 < 3, F.lit("hub"))
        .when(did % 10 < 5, F.lit("blog"))
        .otherwise(F.concat(F.lit("site"), (did % 3).cast("string")))
    )
    return d.select(
        host.alias("host"),
        F.concat(F.lit("t"), (did % 211).cast("string")).alias("tok"),
    )


def q_host_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host KMV bottom-k distinct sketch (k=64) of the token
    column: exact counts below k, order-statistic inversion above —
    deterministic 48-bit md5 hashes, mapInPandas map-side prune, one
    bounded shuffle."""
    from easyner_spark.operators.sketches import kmv_sketch

    return kmv_sketch(_kmv_src(spark, sf_dir), "tok", ["host"], k=64).drop(
        "sketch"
    )


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise union / intersection / Jaccard estimates between the
    5 host token sets computed from the KMV sketches ALONE (no data
    rescan) — all BIGINT floor arithmetic, oracle-identical."""
    from easyner_spark.operators.sketches import kmv_set_ops, kmv_sketch

    sk = kmv_sketch(_kmv_src(spark, sf_dir), "tok", ["host"], k=64)
    return kmv_set_ops(sk, "host", k=64)


def q_entity_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity cards over the designed rule KG: per entity the top-3
    facts ranked by predicate rarity (ascending global edge count,
    deterministic tie-break) — the serving projection of the node/edge
    tables."""
    from easyner_spark.operators.triples import entity_summaries

    return entity_summaries(_kg_rules_triples(spark, sf_dir), k=3)


def q_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two deterministic epoch halves of
    the corpus (even vs odd doc_id) over the text-length histogram —
    exact micro-unit shares and signed deltas; sum(abs_delta)/2 is the
    total-variation distance, the crawl-shift tripwire."""
    from easyner_spark.operators.sketches import (
        histogram_drift,
        histogram_fixed_bins,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = d.where(F.col("doc_id") % 2 == 0).select(
        F.length("text").alias("x")
    )
    b = d.where(F.col("doc_id") % 2 == 1).select(
        (F.length("text") + (F.col("doc_id") % 90)).alias("x")
    )
    return histogram_drift(
        histogram_fixed_bins(a, "x", bin_width=100, n_bins=12),
        histogram_fixed_bins(b, "x", bin_width=100, n_bins=12),
    )


def _length_drift_oracle() -> str:
    """q_length_drift oracle: two histogram twins through the drift
    twin."""
    from easyner_spark.operators.sketches import (
        histogram_drift_oracle_sql,
        histogram_oracle_sql,
    )

    ha = histogram_oracle_sql(
        "length(text)",
        100,
        12,
        source="(SELECT * FROM documents WHERE doc_id % 2 = 0) AS da",
    )
    hb = histogram_oracle_sql(
        "length(text) + (doc_id % 90)",
        100,
        12,
        source="(SELECT * FROM documents WHERE doc_id % 2 = 1) AS db",
    )
    return histogram_drift_oracle_sql(ha, hb)


# Declared SHACL-lite shapes for the rule KG. One definition per side.
_KG_SHAPES_SQL = """SELECT * FROM (VALUES
  ('works_for', 'person', 'org', 2),
  ('located_in', '', 'place', 0),
  ('near', 'place', 'place', 3)) AS s(pred, domain_type, range_type, max_out)"""

_KG_SHAPES_ROWS = [
    ("works_for", "person", "org", 2),
    ("located_in", "", "place", 0),
    ("near", "place", "place", 3),
]


def q_kg_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite validation of the rule KG against declared
    domain/range/max-out shapes — the residue type table guarantees
    deterministic violations of all three kinds; n7 stays untyped and
    is correctly never flagged."""
    from easyner_spark.operators.triples import validate_shapes

    shapes = spark.createDataFrame(
        _KG_SHAPES_ROWS,
        "pred string, domain_type string, range_type string, max_out long",
    )
    return validate_shapes(
        _kg_rules_triples(spark, sf_dir), _kg_rules_types(spark, sf_dir), shapes
    )


# N-Triples fixture: ids that exercise IRI percent-encoding (space,
# angle brackets, pipe, quote). One definition per side.
_NT_SRC_SQL = """SELECT
  'e' || (doc_id % 17)
      || CASE WHEN doc_id % 4 = 0 THEN ' sp' ELSE '' END AS subj,
  CASE WHEN doc_id % 2 = 0 THEN 'rel<a>' ELSE 'rel|b' END AS pred,
  'o"' || (doc_id % 13) AS obj
  FROM documents"""


def q_kg_ntriples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF N-Triples serialization of an edge table with
    spec-correct IRI percent-encoding — one codegen'd projection,
    zero shuffle; ids deliberately carry space/angle/pipe/quote to
    exercise every escape in the value hash."""
    from easyner_spark.sinks.rdf import to_ntriples

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    t = d.select(
        F.concat(
            F.lit("e"),
            (did % 17).cast("string"),
            F.when(did % 4 == 0, F.lit(" sp")).otherwise(F.lit("")),
        ).alias("subj"),
        F.when(did % 2 == 0, F.lit("rel<a>"))
        .otherwise(F.lit("rel|b"))
        .alias("pred"),
        F.concat(F.lit('o"'), (did % 13).cast("string")).alias("obj"),
    )
    return to_ntriples(t)


# Predicate provenance fixture: 4 multi-host predicates + one
# single-source spam predicate. One definition per side.
_PRED_SUPPORT_SQL = """SELECT
  CASE doc_id % 5 WHEN 0 THEN 'treats' WHEN 1 THEN 'inhibits'
       WHEN 2 THEN 'binds' WHEN 3 THEN 'activates'
       ELSE 'spamlink' END AS pred,
  CASE WHEN doc_id % 5 = 4 THEN 'farm.biz'
       ELSE 'h' || (doc_id % 7) END AS host
  FROM documents"""


def q_pred_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate source-diversity QA: exact per-predicate fact and
    distinct-source counts, dominant source share, single-source
    tripwire (the 'spamlink' predicate trips it by construction)."""
    from easyner_spark.operators.triples import predicate_support_profile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    m = did % 5
    t = d.select(
        F.when(m == 0, F.lit("treats"))
        .when(m == 1, F.lit("inhibits"))
        .when(m == 2, F.lit("binds"))
        .when(m == 3, F.lit("activates"))
        .otherwise(F.lit("spamlink"))
        .alias("pred"),
        F.when(m == 4, F.lit("farm.biz"))
        .otherwise(F.concat(F.lit("h"), (did % 7).cast("string")))
        .alias("host"),
    )
    return predicate_support_profile(t)


def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over two deterministic
    6-bit dimensions of doc_id — the layout key behind
    sinks/layout.write_clustered's multi-dimensional file pruning;
    pure codegen'd bit math shared verbatim with the oracle."""
    from easyner_spark.sinks.layout import zorder_key

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        (F.col("doc_id") % 64).alias("x"),
        ((F.col("doc_id") * 7) % 64).alias("y"),
    ).select("doc_id", "x", "y", zorder_key(["x", "y"], bits=6).alias("zkey"))


def q_kg_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DeepWalk corpus over the closed 23-entity triple
    graph (subj->obj edges): 2 walks x 3 steps per start node,
    md5-indexed neighbor choice, dangling nodes end walks early."""
    from easyner_spark.operators.graph import kg_random_walks

    return kg_random_walks(
        _kg_synth_edges(spark, sf_dir), walk_len=3, walks_per_node=2
    )


def q_walk_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram pair counts (window 2) over the deterministic walk
    corpus — the DeepWalk chain composed end-to-end: edges -> walks ->
    training pairs."""
    from easyner_spark.operators.graph import walk_skipgrams

    return walk_skipgrams(q_kg_random_walks(spark, sf_dir), window=2)


def q_kg_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG health monitoring: exact quantiles of the node total-degree
    distribution over the closed 23-entity graph — the degree table is
    bounded (|nodes|), exactly the discrete-metric contract
    sketches.exact_quantiles documents."""
    from easyner_spark.operators.sketches import exact_quantiles

    edges = _kg_synth_edges(spark, sf_dir).distinct()
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return exact_quantiles(deg, "deg")


# Constraint-bearing synthetic KG for q_kg_violations: objects cycle
# mod 11 while subjects cycle mod 23, so 'capital_of' subjects
# accumulate multiple objects (functional violations) and 'located_in'
# objects accumulate multiple subjects (inverse-functional violations).
_KG_FUNC_SQL = """SELECT DISTINCT 'e' || (doc_id % 23) AS subj_id,
    CASE WHEN doc_id % 2 = 0 THEN 'capital_of' ELSE 'located_in' END AS pred,
    'c' || (doc_id % 11) AS obj_id
  FROM documents"""

_KG_CONSTRAINTS = [
    ("capital_of", "functional"),
    ("located_in", "inverse_functional"),
]


def q_kg_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-constraint contradiction table (OWL functional /
    inverse-functional property QA) over the engineered synthetic KG —
    the review gate between extracted edges and the canonical store.
    One composite-key shuffle per kind, no collect_set (conflicting
    sets can be hub-sized)."""
    from easyner_spark.operators.triples import functional_violations

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    edges = d.select(
        F.concat(F.lit("e"), (did % 23).cast("string")).alias("subj_id"),
        F.when(did % 2 == 0, F.lit("capital_of"))
        .otherwise(F.lit("located_in"))
        .alias("pred"),
        F.concat(F.lit("c"), (did % 11).cast("string")).alias("obj_id"),
    ).distinct()
    return functional_violations(edges, _KG_CONSTRAINTS)


# BGP query shared by q_kg_pattern and its oracle (one definition per
# side): ?x inhibits ?y, ?y binds ?z, ?x activates ?y — a chain join
# plus a second predicate constraint on an already-bound pair.
_KG_PATTERNS = [
    ("?x", "inhibits", "?y"),
    ("?y", "binds", "?z"),
    ("?x", "activates", "?y"),
]


def q_kg_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive triple-pattern (SPARQL-BGP-lite) query over the
    closed 23-entity KG: two entity-keyed equi-joins planned greedy
    most-bound-first by triples.match_patterns; the oracle verifies
    with the naive cross-product formulation (conjunctive queries are
    join-order independent under bag semantics, so the oracle checks
    the RESULT without replicating the plan). Runs through the
    cost-based path: bgp_stats' per-predicate (n_edges, n_subj,
    n_obj) System-R estimates replace the syntactic literal-count
    heuristic for the join order."""
    from easyner_spark.operators.triples import bgp_stats, match_patterns

    t = _kg_synth_triples(spark, sf_dir)
    return match_patterns(
        t,
        _KG_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        stats=bgp_stats(t, subj="subj", pred="pred", obj="obj"),
    )

_KG_OPT_PATTERNS = [("?x", "inhibits", "?y")]
_KG_OPT_GROUPS = [
    [("?y", "binds", "?z")],
    [("?w", "activates", "?x")],
]


def q_kg_pattern_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL OPTIONAL over the closed KG: required ?x inhibits ?y
    with two optional groups (?y binds ?z; ?w activates ?x) — LEFT
    JOIN bag semantics, unmatched bindings keep NULLs; the oracle
    runs the same LEFT JOIN formulation naively."""
    from easyner_spark.operators.triples import match_patterns

    return match_patterns(
        _kg_synth_triples(spark, sf_dir),
        _KG_OPT_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        optionals=_KG_OPT_GROUPS,
    )


_KG_MINUS_PATTERNS = [("?x", "located_in", "?y")]
_KG_MINUS_GROUPS = [[("?y", "city_of", "?z")]]


def q_kg_pattern_minus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL MINUS over the rule KG: located_in pairs whose OBJECT is
    not itself a declared city (city_of's designed residue gaps make
    the exclusion split 31 -> 11 rows) — left anti-join on the shared
    variable, NOT EXISTS on the oracle side."""
    from easyner_spark.operators.triples import match_patterns

    return match_patterns(
        _kg_rules_triples(spark, sf_dir),
        _KG_MINUS_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        minus=_KG_MINUS_GROUPS,
    )


_KG_VALUES_BINDINGS = {"x": ("n1", "n2", "n3", "n4", "n5")}


def q_kg_pattern_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL VALUES over the rule KG: the located_in pattern
    restricted to five explicit subjects (the parameterized-query
    surface; isin predicates push to the scan)."""
    from easyner_spark.operators.triples import match_patterns

    return match_patterns(
        _kg_rules_triples(spark, sf_dir),
        [("?x", "located_in", "?y")],
        subj="subj",
        pred="pred",
        obj="obj",
        bindings=_KG_VALUES_BINDINGS,
    )


_KG_FILTER_PATTERNS = [
    ("?x", "located_in", "?y"),
    ("?y", "near", "?z"),
]
_KG_FILTERS = {
    "x": [(">=", "n1"), ("<", "n8")],   # binary string range
    "y": [("contains", "2")],
    "z": [("regex", "^n[0-9]+$"), ("!=", "n15")],
}


def q_kg_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL FILTER over the rule KG (r5): the located_in/near chain
    with per-variable scalar predicates — a binary-collation string
    range on ?x, substring containment on ?y, regex + inequality on
    ?z. match_patterns applies each predicate INSIDE every pattern
    frame that binds the variable (scan-level, before the joins —
    PushedFilters on a parquet KG), so the filters cut seed
    cardinality rather than trimming the joined result; the oracle
    emits the same predicates as WHERE conditions of the naive
    formulation."""
    from easyner_spark.operators.triples import match_patterns

    return match_patterns(
        _kg_rules_triples(spark, sf_dir),
        _KG_FILTER_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        filters=_KG_FILTERS,
    )


def _kg_pattern_filter_oracle() -> str:
    """q_kg_pattern_filter oracle: naive formulation with the SAME
    filter dict emitted as WHERE conditions."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_RULES_SQL,
        _KG_FILTER_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        filters=_KG_FILTERS,
    )


_KG_AGG_PATTERNS = [("?x", "located_in", "?y")]
_KG_AGG_GROUP_BY = ["y"]
_KG_AGG_AGGS = {
    "n": ("count", "*"),
    "n_subj": ("count_distinct", "x"),
    "first_subj": ("min", "x"),
    "last_subj": ("max", "x"),
}


def q_kg_pattern_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL aggregation over the rule KG (r5): the located_in
    pattern rolled up per region — COUNT(*), COUNT(DISTINCT ?x),
    MIN/MAX(?x) GROUP BY ?y, applied over the solution bag after the
    full pattern algebra (the SELECT-COUNT shape CLI query mode
    special-cased is now native to match_patterns). One keyed
    shuffle; partial aggs absorb hub regions."""
    from easyner_spark.operators.triples import match_patterns

    return match_patterns(
        _kg_rules_triples(spark, sf_dir),
        _KG_AGG_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        group_by=_KG_AGG_GROUP_BY,
        aggregates=_KG_AGG_AGGS,
    )


def _kg_pattern_agg_oracle() -> str:
    """q_kg_pattern_agg oracle: outer GROUP BY over the naive
    formulation, from the SAME group_by/aggregates dicts."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_RULES_SQL,
        _KG_AGG_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        group_by=_KG_AGG_GROUP_BY,
        aggregates=_KG_AGG_AGGS,
    )


def q_kg_pattern_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ORDER BY / LIMIT over the rule KG (r5): the located_in
    rollup ranked by count descending, top 10 — TakeOrderedAndProject
    (per-partition top-k + one tiny merge), never a global sort; the
    sort is made total (remaining columns ascending) on BOTH engines
    with explicit NULLS placement, so the surviving-k set is
    deterministic and oracle-checkable."""
    from easyner_spark.operators.triples import match_patterns

    return match_patterns(
        _kg_rules_triples(spark, sf_dir),
        _KG_AGG_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        group_by=_KG_AGG_GROUP_BY,
        aggregates={"n": ("count", "*")},
        order_by=[("n", "desc")],
        limit=10,
    )


def _kg_pattern_topk_oracle() -> str:
    """q_kg_pattern_topk oracle: ORDER BY ... LIMIT over the naive
    GROUP BY formulation, same total-order tie-break."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_RULES_SQL,
        _KG_AGG_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        group_by=_KG_AGG_GROUP_BY,
        aggregates={"n": ("count", "*")},
        order_by=[("n", "desc")],
        limit=10,
    )


_KG_UNION_ALTS = [[("?x", "city_of", "?y")]]


def q_kg_pattern_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UNION over the rule KG: located_in pairs OR city_of
    pairs as ONE query (bag union of alternate required groups; the
    oracle runs the same UNION ALL formulation)."""
    from easyner_spark.operators.triples import match_patterns

    return match_patterns(
        _kg_rules_triples(spark, sf_dir),
        [("?x", "located_in", "?y")],
        subj="subj",
        pred="pred",
        obj="obj",
        unions=_KG_UNION_ALTS,
    )


def _kg_pattern_union_oracle() -> str:
    """q_kg_pattern_union oracle: UNION ALL formulation from the SAME
    alternates."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_RULES_SQL,
        [("?x", "located_in", "?y")],
        subj="subj",
        pred="pred",
        obj="obj",
        unions=_KG_UNION_ALTS,
    )


_KG_PATH_PATTERNS = [
    ("?x", "works_for", "?e"),
    ("?e", "located_in+", "?y"),
]


def q_kg_property_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL property path over the rule KG: ?x works_for ?e,
    ?e located_in+ ?y — the employer's whole location ANCESTRY via
    the 10-hop-bounded transitive closure (BFS pair expansion with
    first-arrival pruning; recursive-CTE twin on the oracle side)."""
    from easyner_spark.operators.triples import match_patterns

    return match_patterns(
        _kg_rules_triples(spark, sf_dir),
        _KG_PATH_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
    )


_TEMPLATE_PAGES_SQL = """SELECT 'https://site' || (doc_id % 7)
      || '.example.net/p/' || doc_id AS url,
    regexp_replace(text, ' a ', chr(10), 'g')
      || chr(10) || 'copyright site ' || (doc_id % 7)
      || (CASE WHEN doc_id % 2 = 0
          THEN chr(10) || 'subscribe now' ELSE '' END) AS text
  FROM documents"""


def _template_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> 7-host pages with an engineered 100% per-host
    footer ('copyright site K') and a ~50% promo line on top of the
    senticized unique body paragraphs (twin of _TEMPLATE_PAGES_SQL)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    hid = (did % 7).cast("string")
    url = F.concat(
        F.lit("https://site"), hid, F.lit(".example.net/p/"), did.cast("string")
    )
    text = F.concat(
        F.regexp_replace("text", " a ", "\n"),
        F.lit("\ncopyright site "),
        hid,
        F.when(did % 2 == 0, F.lit("\nsubscribe now")).otherwise(F.lit("")),
    )
    return d.select(url.alias("url"), text.alias("text"))


def q_host_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host template mining (webtext.host_templates): paragraphs
    on >= 40% of a host's pages — the engineered footer (100%) and
    promo (~50%) lines surface; unique body paragraphs do not.
    Integer cross-multiply gate, min(struct) collapse, no floats."""
    from easyner_spark.operators.webtext import host_templates

    return host_templates(
        _template_pages(spark, sf_dir), min_host_pages=3, min_frac_pct=40
    )


def q_template_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect -> strip composed end-to-end: every host's template
    paragraphs anti-joined out of every page of that host (digests
    cross the exchange, not text), texts rebuilt in paragraph order."""
    from easyner_spark.operators.webtext import (
        host_templates,
        strip_host_templates,
    )

    pages = _template_pages(spark, sf_dir)
    tmpl = host_templates(pages, min_host_pages=3, min_frac_pct=40)
    return strip_host_templates(pages, tmpl)


def _kg_rank_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold triples + deterministic filtered negatives (kg_negatives
    k=3, slot-deduped), every candidate scored by the md5-32 micro-unit
    rule — the bit-reproducible stand-in for a trained KG-embedding
    scorer, shared with the SQL twin."""
    from easyner_spark.operators.graph import kg_negatives

    t = _kg_synth_triples(spark, sf_dir)
    negs = (
        kg_negatives(t, k=3)
        .select("subj", "pred", F.col("obj_neg").alias("obj"))
        .distinct()
        .withColumn("is_gold", F.lit(0))
    )
    gold = t.select("subj", "pred", "obj").withColumn("is_gold", F.lit(1))
    cand = gold.unionByName(negs)
    score = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "subj", "pred", "obj", F.lit("sc"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    return cand.withColumn("score_micro", score)


def q_kg_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered link-prediction ranking (Bordes-style protocol): per
    gold triple, rank among its query's scored candidates — one
    bounded (subj, pred) equi-join + one partial-agg count, ties
    broken deterministically by smaller object id, other golds never
    count as competitors."""
    from easyner_spark.operators.graph import ranking_eval

    return ranking_eval(_kg_rank_candidates(spark, sf_dir))


def q_kg_rank_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup of the ranking eval: n_gold, Hits@1/3/10 counts,
    reciprocal-rank sums in micro-units (integer div — exact across
    engines) and the integer-mean mrr_micro."""
    from easyner_spark.operators.graph import ranking_eval, ranking_summary

    return ranking_summary(ranking_eval(_kg_rank_candidates(spark, sf_dir)))


def q_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional bitext mining over deterministic 3-page translation
    clusters (doc_id div 3; langs en/de/fr by doc_id mod 3): sentences
    of cross-language page pairs aligned by index under the 50%
    sentence-count gate — the parallel-data product hreflang_clusters
    exists to feed."""
    from easyner_spark.operators.webtext import bitext_candidates

    sents = _sentences(spark, sf_dir)
    did = F.col("url").cast("long")
    lang = (
        F.when(did % 3 == 0, F.lit("en"))
        .when(did % 3 == 1, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    s = sents.select(
        "url",
        lang.alias("lang"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clusters = d.select(
        F.col("doc_id").cast("string").alias("node"),
        F.concat(F.lit("g"), F.expr("doc_id div 3").cast("string")).alias(
            "cluster"
        ),
    )
    return bitext_candidates(s, clusters, max_count_diff_pct=50)


def q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-host mirror detection over deterministic 40-host pages
    (doc_id % 40) where mirror-h<K> re-serves host h<K>'s even-doc_id
    pages verbatim: every (h<K>, mirror-h<K>) pair flags at 100%
    containment of the mirror's distinct content set; digest-count cap
    and integer cross-multiply gate, no floats."""
    from easyner_spark.operators.webtext import mirror_hosts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    hid = (did % 40).cast("string")
    base = d.select(
        F.concat(
            F.lit("http://h"), hid, F.lit(".example.org/p/"),
            did.cast("string"),
        ).alias("url"),
        "text",
    )
    mirr = d.where(did % 2 == 0).select(
        F.concat(
            F.lit("http://mirror-h"), hid, F.lit(".example.org/p/"),
            did.cast("string"),
        ).alias("url"),
        "text",
    )
    return mirror_hosts(base.unionByName(mirr))


def q_url_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL equivalence classes over deterministic alias
    evidence: per-doc url variants (utm param / www. / trailing slash
    by doc_id % 3) that fold onto one base by normalization, every
    5th page declaring a rel=canonical to one of 7 shared hubs
    (bridging ~14 base classes each), every 11th url reached by a
    redirect hop — all closed through the shared components engine."""
    from easyner_spark.operators.webtext import url_equivalence

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    hid = (did % 13).cast("string")
    pid = (did % 97).cast("string")
    base = F.concat(F.lit("https://h"), hid, F.lit(".example.org/a/"), pid)
    url = (
        F.when(did % 3 == 0, F.concat(base, F.lit("?utm_source=mail")))
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("https://www.h"), hid, F.lit(".example.org/a/"), pid
            ),
        )
        .otherwise(F.concat(base, F.lit("/")))
    )
    html = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(
                '<html><head><link rel="canonical"'
                ' href="https://hub.example.org/c/'
            ),
            (did % 7).cast("string"),
            F.lit('"></head></html>'),
        ),
    ).otherwise(F.lit("<html><head></head></html>"))
    pages = d.select(url.alias("url"), html.alias("html"))
    redirects = d.where(did % 11 == 0).select(
        F.concat(
            F.lit("https://old.example.org/r/"), did.cast("string")
        ).alias("src"),
        base.alias("dst"),
    )
    return url_equivalence(pages, redirects)


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment (syndication) detection: every 7th doc
    re-served inside a portal wrapper (id + 500000, chrome words
    around the full text) — the (portal, article) direction flags at
    100% containment of the article's shingles; Jaccard would score
    the pair low. df-capped shingles, integer cross-multiply gate."""
    from easyner_spark.operators.dedup import containment_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    portals = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(
            F.lit("portal syndication wrapper intro "),
            F.col("text"),
            F.lit(" portal footer navigation links"),
        ).alias("text"),
    )
    return containment_pairs(d.unionByName(portals), k=5)


def _table_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> pages whose html carries a 2-row infobox table
    (type/host facts from doc_id residues) plus, on every 4th page, a
    3-column layout table the infobox arity gate must skip (twin of
    _TABLE_PAGES_SQL)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><table class="infobox"><tr><th>type</th><td>t'),
        (did % 6).cast("string"),
        F.lit("</td></tr><tr><th>host</th><td>h"),
        (did % 13).cast("string"),
        F.lit("</td></tr></table>"),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit("<table><tr><td>x"),
                (did % 3).cast("string"),
                F.lit("</td><td>y</td><td>z</td></tr></table>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</html>"),
    )
    return d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        html.alias("html"),
    )


_TABLE_PAGES_SQL = """
SELECT 'u' || doc_id AS url,
  '<html><table class="infobox"><tr><th>type</th><td>t' || (doc_id % 6)
  || '</td></tr><tr><th>host</th><td>h' || (doc_id % 13)
  || '</td></tr></table>'
  || (CASE WHEN doc_id % 4 = 0
      THEN '<table><tr><td>x' || (doc_id % 3)
           || '</td><td>y</td><td>z</td></tr></table>'
      ELSE '' END)
  || '</html>' AS html
FROM documents
"""


def q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell HTML table extraction (webtext.extract_tables): three
    stacked posexplodes over scan-fused regexp_extract_all, zero
    shuffle; indices 0-based document order."""
    from easyner_spark.operators.webtext import extract_tables

    return extract_tables(_table_pages(spark, sf_dir))


def q_infobox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Infobox key-value extraction (webtext.infobox_pairs): the
    arity-2 gate keeps the 2-cell fact rows and skips every 4th
    page's 3-column layout table."""
    from easyner_spark.operators.webtext import infobox_pairs

    return infobox_pairs(_table_pages(spark, sf_dir))


def _sameas_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared sameAs synthesis (twin: _SAMEAS_PAGES_SQL): every 2nd
    page a 2-target array (wiki + wikidata keyed by doc_id div 5, so
    5-page groups share authorities), every 5th the single-string
    form."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    g = F.expr("doc_id div 5").cast("string")
    block = (
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit('<script type="application/ld+json">'
                      '{"@type": "Person", "name": "Entity '),
                g,
                F.lit('", "sameAs": ["https://wiki.example/E'),
                g,
                F.lit('", "https://data.example/Q'),
                g,
                F.lit('"]}</script>'),
            ),
        )
        .when(
            did % 5 == 0,
            F.concat(
                F.lit('<script type="application/ld+json">'
                      '{"@type": "Organization",'
                      ' "sameAs": "https://data.example/Q'),
                g,
                F.lit('"}</script>'),
            ),
        )
        .otherwise(F.lit(""))
    )
    return d.select(
        F.concat(F.lit("u"), s).alias("url"),
        F.concat(F.lit("<html>"), block, F.lit("</html>")).alias("html"),
    )


def q_sameas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sameAs alignment edges over the shared synthesis — both
    declaration forms value-checked."""
    from easyner_spark.operators.webtext import extract_sameas

    return extract_sameas(_sameas_pages(spark, sf_dir))


def q_sameas_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-NLP entity merging over the shared sameAs synthesis: the
    5-page authority groups collapse into one entity class each
    (pages + their wiki/wikidata authorities, min-url canonical)
    through the shared components engine."""
    from easyner_spark.operators.webtext import sameas_clusters

    return sameas_clusters(_sameas_pages(spark, sf_dir))


def _pagination_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-page article series synthesis (doc_id div 4): interior pages
    declare both rel=prev and rel=next, heads only next, tails only
    prev; carries the document text for assembly (twin:
    _pagination_oracle's pages_sql)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    g = F.expr("doc_id div 4").cast("string")
    k = did % 4
    base = F.concat(F.lit("https://p.example/s"), g, F.lit("/p"))
    url = F.concat(base, k.cast("string"))
    prev_el = F.when(
        k > 0,
        F.concat(F.lit('<link rel="prev" href="'), base,
                 (k - 1).cast("string"), F.lit('">')),
    ).otherwise(F.lit(""))
    next_el = F.when(
        k < 3,
        F.concat(F.lit('<link rel="next" href="'), base,
                 (k + 1).cast("string"), F.lit('">')),
    ).otherwise(F.lit(""))
    return d.select(
        url.alias("url"),
        F.concat(F.lit("<html><head>"), prev_el, next_el,
                 F.lit("</head></html>")).alias("html"),
        "text",
    )


def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination-series reconstruction over the shared 4-page series
    synthesis — every page lands in its series at its exact page_ord
    via the pointer-doubling walk."""
    from easyner_spark.operators.webtext import pagination_series

    return pagination_series(_pagination_pages(spark, sf_dir), max_pages=4)


def q_series_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pagination capstone composed end-to-end: reconstruct the
    4-page series, then concatenate each series' page texts in
    page_ord order into one document (125-ish assembled articles at
    sf0.01, n_pages = 4 each)."""
    from easyner_spark.operators.webtext import (
        assemble_series,
        pagination_series,
    )

    pages = _pagination_pages(spark, sf_dir)
    series = pagination_series(pages, max_pages=4)
    return assemble_series(pages, series)


def q_edge_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evidence sentences per KG edge over the real extraction chain
    (split -> dict NER -> NEL -> triples): up to 3 deterministic
    lexicographic-min (url, sent_idx) examples per edge, sentence text
    joined in AFTER the k-filter on the uniform sentence key."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import edge_evidence, extract_triples

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)),
        keep_unmatched=False,
    )
    tri = extract_triples(linked)
    out = edge_evidence(tri, _sentences(spark, sf_dir), k=3)
    return out.select(
        "subj_id", "pred", "obj_id", "evidence_rank",
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
    )


def q_edge_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-text temporal qualifiers over the real extraction chain:
    every 3rd sentence gets a deterministic ISO date appended, so
    edges collect first/last event dates and a temporal-support
    ratio; undated edges keep NULLs."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import edge_temporal, extract_triples

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)),
        keep_unmatched=False,
    )
    tri = extract_triples(linked)
    sents = _sentences(spark, sf_dir).select(
        "url",
        "sent_idx",
        F.when(
            F.col("sent_idx") % 3 == 0,
            F.concat(
                F.col("sentence"),
                F.lit(" dated 2020-01-"),
                F.lpad(((F.col("sent_idx") % 28) + 1).cast("string"), 2, "0"),
            ),
        ).otherwise(F.col("sentence")).alias("sentence"),
    )
    return edge_temporal(tri, sents)


def q_edge_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negation QA over the real extraction chain: every 4th sentence
    gets a negation cue injected, so edges carry exact negated-vs-
    total evidence counts for the confidence downgrade."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import edge_negation, extract_triples

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)),
        keep_unmatched=False,
    )
    tri = extract_triples(linked)
    sents = _sentences(spark, sf_dir).select(
        "url",
        "sent_idx",
        F.when(
            F.col("sent_idx") % 4 == 0,
            F.concat(F.col("sentence"), F.lit(" but not confirmed")),
        ).otherwise(F.col("sentence")).alias("sentence"),
    )
    return edge_negation(tri, sents)


def q_edge_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed edge confidence over the real chain with the same
    every-4th-sentence negation injection: non-negated share x
    doc-diversity clamp in exact micro-units — the rankable edge
    table the KG ships."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import (
        edge_confidence,
        extract_triples,
    )

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)),
        keep_unmatched=False,
    )
    tri = extract_triples(linked)
    sents = _sentences(spark, sf_dir).select(
        "url",
        "sent_idx",
        F.when(
            F.col("sent_idx") % 4 == 0,
            F.concat(F.col("sentence"), F.lit(" but not confirmed")),
        ).otherwise(F.col("sentence")).alias("sentence"),
    )
    return edge_confidence(tri, sents, doc_clamp=5)


def q_acronyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acronym-definition mining over injected definitions: 12
    deterministic 3-word org names with matching acronyms (initials
    spell it, leading 'The' exercises the Schwartz-Hearst suffix
    trim) plus a false parenthetical aside every 5th doc (initials
    mismatch, rejected)."""
    from easyner_spark.operators.nel import acronym_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    a = F.element_at(
        F.array(F.lit("Global"), F.lit("United"), F.lit("Open"),
                F.lit("Federal")),
        (did % 4 + 1).cast("int"),
    )
    b = F.element_at(
        F.array(F.lit("Web"), F.lit("Health"), F.lit("Data")),
        (did % 3 + 1).cast("int"),
    )
    acr = F.upper(
        F.concat(F.substring(a, 1, 1), F.substring(b, 1, 1), F.lit("C"))
    )
    text = F.concat(
        F.col("text"),
        F.lit(" The "),
        a, F.lit(" "), b, F.lit(" Council ("), acr, F.lit(") met."),
        F.when(
            did % 5 == 0, F.lit(" We read the new Policy (ZZX) today."),
        ).otherwise(F.lit("")),
    )
    return acronym_pairs(d.select("doc_id", text.alias("text")))


def q_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote attribution over injected attributed quotes: every doc
    one 'said' quote from a rotating 2-word speaker, every 3rd doc a
    second 'says' quote — speakers lowercased, order pinned by
    quote_idx, the trailing sentence never spliced into the name."""
    from easyner_spark.operators.triples import quote_attributions

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    name = F.element_at(
        F.array(F.lit("Ada Wong"), F.lit("Bo Chen"), F.lit("Cy Day"),
                F.lit("Di Eko")),
        (did % 4 + 1).cast("int"),
    )
    text = F.concat(
        F.col("text"),
        F.lit(' "Claim number '),
        did.cast("string"),
        F.lit(' holds in every test we ran," said '),
        name,
        F.lit(". More prose."),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(' "We will keep verifying the results" says '),
                name,
                F.lit("."),
            ),
        ).otherwise(F.lit("")),
    )
    return quote_attributions(d.select("doc_id", text.alias("text")))


def q_numeric_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-fact extraction over injected measurements: every doc
    one integer kg fact + one decimal percent; every 4th doc a
    %-shorthand (normalized to 'percent') and a '5kgs' trap the unit
    boundary must reject."""
    from easyner_spark.operators.triples import numeric_facts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    text = F.concat(
        F.col("text"),
        F.lit(" The sample weighs "),
        (did % 90 + 10).cast("string"),
        F.lit(" kg at "),
        (did % 80 + 10).cast("string"),
        F.lit("."),
        (did % 10).cast("string"),
        F.lit(" percent purity."),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" Up "), (did % 30).cast("string"),
                F.lit("% from 5kgs baseline."),
            ),
        ).otherwise(F.lit("")),
    )
    return numeric_facts(d.select("doc_id", text.alias("text")))


def q_headings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outline extraction over deterministic page structure: one h1
    per page, (doc_id % 4) h2 sections each followed by an h3, and an
    empty h4 the emptiness gate drops."""
    from easyner_spark.operators.webtext import extract_headings

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so the
    # zero-section case must be an explicit empty array
    idxs = F.when(
        did % 4 > 0, F.sequence(F.lit(1), (did % 4).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    sections = F.concat_ws(
        "",
        F.transform(
            idxs,
            lambda i: F.concat(
                F.lit("<h2>section "), i.cast("string"),
                F.lit("</h2><p>body</p><h3>notes "), i.cast("string"),
                F.lit("</h3>"),
            ),
        ),
    )
    html = F.concat(
        F.lit("<html><h1>doc "), s, F.lit("</h1>"),
        sections,
        F.lit("<h4>  </h4></html>"),
    )
    pages = d.select(
        F.concat(F.lit("u"), s).alias("url"), html.alias("html")
    )
    return extract_headings(pages)


def q_html_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List extraction over deterministic structure: a 3-item nav
    <ul> on every page plus a (doc_id % 3)-item ranked <ol>, one item
    empty on every 6th page (dropped, positions kept)."""
    from easyner_spark.operators.webtext import extract_lists

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    idxs = F.when(
        did % 3 > 0, F.sequence(F.lit(1), (did % 3).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    ol = F.concat_ws(
        "",
        F.transform(
            idxs,
            lambda i: F.concat(
                F.lit("<li>rank "), i.cast("string"), F.lit(" item</li>")
            ),
        ),
    )
    html = F.concat(
        F.lit('<html><ul class="nav"><li>Home</li><li>Docs '),
        s,
        F.lit("</li>"),
        F.when(did % 6 == 0, F.lit("<li> </li>")).otherwise(
            F.lit("<li>Contact</li>")
        ),
        F.lit("</ul><ol>"),
        ol,
        F.lit("</ol></html>"),
    )
    pages = d.select(
        F.concat(F.lit("u"), s).alias("url"), html.alias("html")
    )
    return extract_lists(pages)


def q_ntriples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KG's interop export: the real extraction chain's distinct
    edges serialized as W3C N-Triples lines (byte-wise percent-encoded
    IRIs) — what a triple store loads."""
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.triples import extract_triples
    from easyner_spark.sinks.export import to_ntriples

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)),
        keep_unmatched=False,
    )
    edges = (
        extract_triples(linked)
        .select("subj_id", "pred", "obj_id")
        .distinct()
    )
    return to_ntriples(edges)


def q_entity_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preferred labels over the real canonical-mention stream with a
    deterministic md5-bucket component map (the co-occurrence closure
    over the tiny synthetic dictionary merges EVERYTHING into one
    component — value-matched but a 1-row check; the bucket map keeps
    multiple multi-id entities so the join, argmax, tie-break, and
    totals all carry signal)."""
    from easyner_spark.operators.nel import (
        entity_labels,
        link_entities,
        primary_alias,
    )

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)),
        keep_unmatched=False,
    )
    comp = (
        linked.select(F.col("entity_id").alias("node"))
        .distinct()
        .select(
            "node",
            F.concat(F.lit("g"), F.substring(F.md5("node"), 1, 1)).alias(
                "component"
            ),
        )
    )
    return entity_labels(linked, comp)


def q_social(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Social-profile extraction over deterministic outlinks: every
    page a twitter (x.com on odd docs) + github profile keyed by
    doc_id div 3 (identity evidence shared by 3-page groups), every
    4th a youtube @handle, plus a non-social link ignored."""
    from easyner_spark.operators.webtext import social_profiles

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    g = F.expr("doc_id div 3").cast("string")
    tw_host = F.when(did % 2 == 0, F.lit("twitter.com")).otherwise(
        F.lit("x.com")
    )
    html = F.concat(
        F.lit('<html><a href="https://'),
        tw_host,
        F.lit("/Org"), g, F.lit('">t</a>'),
        F.lit('<a href="https://github.com/org-'), g, F.lit('">g</a>'),
        F.when(
            did % 4 == 0,
            F.concat(F.lit('<a href="https://youtube.com/@org'), g,
                     F.lit('">y</a>')),
        ).otherwise(F.lit("")),
        F.lit('<a href="https://example.org/x">n</a></html>'),
    )
    pages = d.select(
        F.concat(F.lit("https://h"), (did % 7).cast("string"),
                 F.lit(".example.org/p/"), did.cast("string")).alias("url"),
        html.alias("html"),
    )
    return social_profiles(pages)


def q_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contact-fact extraction over injected imprint lines: one email
    per doc (mixed case, lowercased) and a phone with rotating
    grouping (normalized to digits-with-plus) on every 2nd doc."""
    from easyner_spark.operators.textstats import contact_facts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    text = F.concat(
        F.col("text"),
        F.lit(" Contact Team"), s,
        F.lit("@Example"), (did % 5).cast("string"), F.lit(".ORG now."),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" Call +46 8-"), ((did % 900) + 100).cast("string"),
                F.lit(" 4"), (did % 10).cast("string"), F.lit("6 78."),
            ),
        ).otherwise(F.lit("")),
    )
    return contact_facts(d.select("doc_id", text.alias("text")))


def q_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinate extraction over injected geo lines: a valid lat/lon
    per doc (lat from doc_id % 170 - 85, lon from doc_id % 350 - 175)
    plus an out-of-range version-number pair every 3rd doc that the
    plausibility gate drops."""
    from easyner_spark.operators.triples import geo_facts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    lat = (did % 170 - 85).cast("string")
    lon = (did % 350 - 175).cast("string")
    text = F.concat(
        F.col("text"),
        F.lit(" Located at "), lat, F.lit("."),
        (did % 9000 + 1000).cast("string"),
        F.lit(", "), lon, F.lit("."),
        (did % 900 + 100).cast("string"),
        F.lit(" on the map."),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" Release 99."), (did % 10).cast("string"),
                F.lit(", 999."), (did % 10).cast("string"), F.lit(" shipped."),
            ),
        ).otherwise(F.lit("")),
    )
    return geo_facts(d.select("doc_id", text.alias("text")))


def q_copula_isa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copula is-a mining over injected hypernym sentences: 25 child
    terms mapping onto 9 parents (doc_id residues), plus the real
    document text riding along as noise the pattern never matches —
    multi-doc support counts per (child, parent)."""
    from easyner_spark.operators.triples import copula_isa

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    k = (did % 25).cast("string")
    p = F.expr("(doc_id % 25) div 3").cast("string")
    sents = d.select(
        did.cast("string").alias("url"),
        F.concat(
            F.col("text"),
            F.lit(" A kind"), k, F.lit(" is a type"), p, F.lit(" indeed."),
        ).alias("sentence"),
    )
    return copula_isa(sents)


def q_apposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Appositive role mining over injected 'Name<k>, the <role>
    of/at Org<g>' sentences riding on real document text as noise —
    the NP-carried relation family the verb lexicon can't extract;
    multi-doc support per (subj, role, obj)."""
    from easyner_spark.operators.triples import apposition_facts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    role = F.element_at(
        F.array(F.lit("ceo"), F.lit("director"), F.lit("founder")),
        (did % 3 + 1).cast("int"),
    )
    conn = F.when(did % 2 == 0, F.lit("of")).otherwise(F.lit("at"))
    sents = d.select(
        did.cast("string").alias("url"),
        F.concat(
            F.col("text"),
            F.lit(" Note that Alice"), (did % 21).cast("string"),
            F.lit(", the "), role, F.lit(" "), conn,
            F.lit(" Acme"), (did % 7).cast("string"),
            F.lit(", spoke."),
        ).alias("sentence"),
    )
    return apposition_facts(sents)


def q_mined_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mining->closure chain composed end-to-end: copula is-a
    candidates over chained hypernym sentences ('kindK is a
    kind(K div 3)'), support-floored, self-edges dropped, then the
    min-plus doubling closure — ancestors at exact minimal depth
    (chains reach depth 3: kind24 -> kind8 -> kind2 -> kind0)."""
    from easyner_spark.operators.graph import isa_closure
    from easyner_spark.operators.triples import copula_isa

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    k = (did % 25).cast("string")
    p = F.expr("(doc_id % 25) div 3").cast("string")
    sents = d.select(
        did.cast("string").alias("url"),
        F.concat(
            F.col("text"),
            F.lit(" A kind"), k, F.lit(" is a kind"), p, F.lit(" again."),
        ).alias("sentence"),
    )
    cands = copula_isa(sents)
    edges = cands.where(
        (F.col("n_docs") >= 2) & (F.col("child") != F.col("parent"))
    ).select("child", "parent")
    return isa_closure(edges, max_depth=16)


def q_definitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glossary extraction over deterministic <dl> synthesis: every
    page defines (doc_id % 4 + 1) terms; every 5th page adds an
    orphan <dt> (no following <dd>, contributes nothing)."""
    from easyner_spark.operators.webtext import extract_definitions

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    idxs = F.sequence(F.lit(1), (did % 4 + 1).cast("int"))
    defs = F.concat_ws(
        "",
        F.transform(
            idxs,
            lambda i: F.concat(
                F.lit("<dt>Term "), i.cast("string"),
                F.lit("-"), (did % 9).cast("string"),
                F.lit("</dt> <dd>meaning "), i.cast("string"),
                F.lit(" of group "), (did % 9).cast("string"),
                F.lit("</dd>"),
            ),
        ),
    )
    html = F.concat(
        F.lit("<html><dl>"),
        defs,
        F.when(did % 5 == 0, F.lit("<dt>orphan</dt>")).otherwise(F.lit("")),
        F.lit("</dl></html>"),
    )
    pages = d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        html.alias("html"),
    )
    return extract_definitions(pages)


def q_host_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host language mixture composing the REAL lang_id
    predictions over the documents table with a deterministic 7-host
    assignment — exact micro-unit shares per (host, lang)."""
    from easyner_spark.operators.textstats import host_lang_mix, lang_id

    d = _docs(spark, sf_dir)
    lp = lang_id(d).select(
        "doc_id", "lang_pred"
    )
    rows = lp.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias(
            "host"
        ),
        "lang_pred",
    )
    return host_lang_mix(rows)


def q_definition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The glossary-to-KG composition: extract_definitions over <dl>
    terms rotating through the alias dictionary, linked by the same
    broadcast primary-alias join the NEL layer uses — (url, term,
    entity_id, definition) definition-grade facts; 'window' stays
    unlinked ('' id, the NEL miss contract)."""
    from easyner_spark.operators.nel import primary_alias
    from easyner_spark.operators.webtext import extract_definitions

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    term = F.element_at(
        F.array(F.lit("hash"), F.lit("merge"), F.lit("spark"),
                F.lit("window"), F.lit("sort table")),
        (did % 5 + 1).cast("int"),
    )
    html = F.concat(
        F.lit("<html><dl><dt>"), term,
        F.lit("</dt><dd>meaning of "), term,
        F.lit(" in doc "), did.cast("string"),
        F.lit("</dd></dl></html>"),
    )
    pages = d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        html.alias("html"),
    )
    defs = extract_definitions(pages)
    pa = primary_alias(_alias_df(spark)).select(
        F.col("term").alias("_t"), F.col("ID")
    )
    return (
        defs.join(F.broadcast(pa), defs["term"] == pa["_t"], "left")
        .select(
            "url",
            "term",
            F.coalesce(F.col("ID"), F.lit("")).alias("entity_id"),
            "definition",
        )
    )


def q_amp_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMP-variant folding composed end-to-end: every 2nd page
    declares an amphtml mirror (root-relative on every 4th); the
    edges feed url_equivalence so page + AMP variant land in one
    canonical class."""
    from easyner_spark.operators.webtext import (
        extract_amphtml,
        url_equivalence,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    amp = F.when(
        did % 4 == 0, F.concat(F.lit('<link rel="amphtml" href="/amp/'), s,
                               F.lit('">')),
    ).otherwise(
        F.concat(F.lit('<link rel="amphtml" href="https://m'),
                 (did % 7).cast("string"), F.lit(".example.org/amp/"), s,
                 F.lit('">')),
    )
    html = F.concat(
        F.lit("<html><head>"),
        F.when(did % 2 == 0, amp).otherwise(F.lit("")),
        F.lit("</head></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://m"), (did % 7).cast("string"),
                 F.lit(".example.org/p/"), s).alias("url"),
        html.alias("html"),
    )
    return url_equivalence(pages, extract_amphtml(pages))


def q_jsonld_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-fact pulls over mixed JSON-LD blocks: Event blocks
    (startDate + location) on even docs, Product blocks (price) on
    odd — one generic puller, the block's @type as class context."""
    from easyner_spark.operators.webtext import jsonld_fields

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    block = F.when(
        did % 2 == 0,
        F.concat(
            F.lit('<script type="application/ld+json">'
                  '{"@type": "Event", "name": "ev '),
            s,
            F.lit('", "startDate": "2026-0'),
            (did % 9 + 1).cast("string"),
            F.lit('-01", "location": "City '),
            (did % 13).cast("string"),
            F.lit('"}</script>'),
        ),
    ).otherwise(
        F.concat(
            F.lit('<script type="application/ld+json">'
                  '{"@type": "Product", "name": "w '),
            s,
            F.lit('", "price": "'),
            (did % 90 + 10).cast("string"),
            F.lit('.50"}</script>'),
        )
    )
    pages = d.select(
        F.concat(F.lit("u"), s).alias("url"),
        F.concat(F.lit("<html>"), block, F.lit("</html>")).alias("html"),
    )
    return jsonld_fields(pages)


def q_anchor_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-rel classification over rotating rel variants: nofollow /
    ugc sponsored / noopener / no rel — the follow flag the link graph
    filters on before rank flows."""
    from easyner_spark.operators.webtext import anchor_rels

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    rel = (
        F.when(did % 4 == 0, F.lit(' rel="nofollow"'))
        .when(did % 4 == 1, F.lit(' rel="ugc sponsored"'))
        .when(did % 4 == 2, F.lit(' rel="noopener"'))
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit('<html><a href="https://t'), (did % 9).cast("string"),
        F.lit(".example.org/x/"), s, F.lit('"'), rel,
        F.lit(">out</a></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://a"), (did % 5).cast("string"),
                 F.lit(".example.org/p/"), s).alias("url"),
        html.alias("html"),
    )
    return anchor_rels(pages)


def q_declarations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-declared page metadata over 4 variants: full declarations
    (rotating lang), lang-only, charset-only, and nothing — the
    declared side of the declared-vs-detected language QA pair."""
    from easyner_spark.operators.webtext import page_declarations

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("sv")),
        (did % 4 + 1).cast("int"),
    )
    html = (
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<html lang="'), lang,
                F.lit('"><head><meta charset="utf-8">'
                      '<meta property="og:locale" content="'),
                lang, F.lit('_x"></head></html>'),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(F.lit('<html lang="'), lang, F.lit('"><p>x</p></html>')),
        )
        .otherwise(
            F.when(
                did % 2 == 0,
                F.lit('<html><meta charset="iso-8859-1"></html>'),
            ).otherwise(F.lit("<html><p>none</p></html>"))
        )
    )
    pages = d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        html.alias("html"),
    )
    return page_declarations(pages)


def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL path-template profile over 11 hosts x 3 engineered path
    shapes: numeric post ids fold to '/post/{N}/comments', md5-derived
    12-hex segments to '/s/{H}', and a literal '/about' stays
    itself — the crawler-trap / URL-space map."""
    from easyner_spark.operators.webtext import url_templates

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    path = (
        F.when(did % 3 == 0,
               F.concat(F.lit("/post/"), did.cast("string"),
                        F.lit("/comments")))
        .when(did % 3 == 1,
              F.concat(F.lit("/s/"),
                       F.substring(F.md5(did.cast("string")), 1, 12)))
        .otherwise(F.lit("/about"))
    )
    pages = d.select(
        F.concat(F.lit("https://t"), (did % 11).cast("string"),
                 F.lit(".example.org"), path).alias("url")
    )
    return url_templates(pages)


def q_template_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trap-aware capping over the same path-shape synthesis as
    url_templates: the numeric post template is capped at 5 urls per
    host (md5-rank deterministic pick), the literal /about and
    singleton hex pages pass through."""
    from easyner_spark.operators.webtext import template_cap

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    path = (
        F.when(did % 3 == 0,
               F.concat(F.lit("/post/"), did.cast("string"),
                        F.lit("/comments")))
        .when(did % 3 == 1,
              F.concat(F.lit("/s/"),
                       F.substring(F.md5(did.cast("string")), 1, 12)))
        .otherwise(F.lit("/about"))
    )
    pages = d.select(
        F.concat(F.lit("https://t"), (did % 11).cast("string"),
                 F.lit(".example.org"), path).alias("url")
    )
    return template_cap(pages, cap=5)


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer readability counts over the real documents table:
    sentence / word / vowel-group-syllable counts and micro-unit
    ratios — the Flesch-family inputs, zero shuffle, no floats."""
    from easyner_spark.operators.textstats import readability_counts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return readability_counts(d)


def q_surface_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host structured-data adoption over 7 hosts with engineered
    rates: jsonld on even docs, og on every 3rd, a table on every 5th,
    title on all but every 11th — exact floor-division percentages
    per host, one algebraic rollup."""
    from easyner_spark.operators.webtext import host_surface_profile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    html = F.concat(
        F.lit("<html>"),
        F.when(did % 11 != 0, F.lit("<title>t</title>")).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.lit('<script type="application/ld+json">{"@type":"T"}'
                  "</script>"),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.lit('<meta property="og:title" content="x">'),
        ).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("<table></table>")).otherwise(F.lit("")),
        F.lit("</html>"),
    )
    pages = d.select(
        F.concat(
            F.lit("https://h"), (did % 7).cast("string"),
            F.lit(".example.org/p/"), did.cast("string"),
        ).alias("url"),
        html.alias("html"),
    )
    return host_surface_profile(pages)


def q_page_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared-entity layer over mixed-surface synthesis: every
    page has a <title>, every 2nd an og card (title+type), every 3rd
    a JSON-LD Person — all surfaces kept with provenance so
    cross-source disagreement stays visible."""
    from easyner_spark.operators.webtext import page_entities

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        s,
        F.lit("</title>"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit('<meta property="og:title" content="doc '),
                s,
                F.lit(' card"><meta property="og:type" content="article">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head>"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<script type="application/ld+json">'
                      '{"@type": "Person", "name": "Entity '),
                s,
                F.lit('"}</script>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</html>"),
    )
    pages = d.select(
        F.concat(F.lit("u"), s).alias("url"), html.alias("html")
    )
    return page_entities(pages)


def q_meta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """meta-refresh redirect extraction over four page variants:
    absolute target (hard 0s move), root-relative, relative (resolved
    against the declaring page's directory), and no refresh at all —
    delays value-checked as BIGINT seconds."""
    from easyner_spark.operators.webtext import extract_refresh

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    url = F.concat(
        F.lit("https://h"), (did % 13).cast("string"),
        F.lit(".example.org/d/"), s,
    )
    el = (
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="0;'
                      'url=https://h'),
                (did % 13).cast("string"),
                F.lit('.example.org/canonical">'),
            ),
        )
        .when(
            did % 4 == 1,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="'),
                (did % 9).cast("string"),
                F.lit(';url=/home">'),
            ),
        )
        .when(
            did % 4 == 2,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="'),
                (did % 9).cast("string"),
                F.lit("; url=next"),
                (did % 5).cast("string"),
                F.lit('.html">'),
            ),
        )
        .otherwise(F.lit(""))
    )
    pages = d.select(
        url.alias("url"),
        F.concat(F.lit("<html>"), el, F.lit("</html>")).alias("html"),
    )
    return extract_refresh(pages)


def q_jsonld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-LD extraction over deterministic ld+json synthesis: every
    page declares an Article block (name = 'doc <id>'); every 4th
    page adds a Person block missing its name — case-preserving
    types, plain <script> ignored by the typed-wrapper contract."""
    from easyner_spark.operators.webtext import extract_jsonld

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    html = F.concat(
        F.lit('<html><script type="application/ld+json">'
              '{"@context": "https://schema.org", "@type": "Article",'
              ' "name": "doc '),
        s,
        F.lit('"}</script><script>var x = 1;</script>'),
        F.when(
            did % 4 == 0,
            F.lit('<script type="application/ld+json">'
                  '{"@type": "Person"}</script>'),
        ).otherwise(F.lit("")),
        F.lit("</html>"),
    )
    pages = d.select(
        F.concat(F.lit("u"), s).alias("url"), html.alias("html")
    )
    return extract_jsonld(pages)


def _breadcrumb_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic BreadcrumbList synthesis: every doc not divisible
    by 7 declares a 3-level trail Home > Section <id%5> > Doc <id>;
    every 4th doc prepends an Article decoy block (type gate); every
    10th doc repeats the trail's top two levels in a second block
    (distinct-url voting)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    sec = (did % 5).cast("string")
    trail1 = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@type": "BreadcrumbList", "itemListElement": ['
              '{"@type": "ListItem", "position": 1, "name": "Home"}, '
              '{"@type": "ListItem", "position": 2, "name": "Section '),
        sec,
        F.lit('"}, {"@type": "ListItem", "position": 3, "name": "Doc '),
        s,
        F.lit('"}]}</script>'),
    )
    trail2 = F.concat(
        F.lit('<script type="application/ld+json">'
              '{"@type": "BreadcrumbList", "itemListElement": ['
              '{"@type": "ListItem", "position": 1, "name": "Home"}, '
              '{"@type": "ListItem", "position": 2, "name": "Section '),
        sec,
        F.lit('"}]}</script>'),
    )
    html = F.concat(
        F.lit("<html>"),
        F.when(
            did % 4 == 0,
            F.lit('<script type="application/ld+json">'
                  '{"@type": "Article", "name": "decoy"}</script>'),
        ).otherwise(F.lit("")),
        F.when(did % 7 != 0, trail1).otherwise(F.lit("")),
        F.when((did % 10 == 0) & (did % 7 != 0), trail2).otherwise(
            F.lit("")
        ),
        F.lit("</html>"),
    )
    return d.select(F.concat(F.lit("u"), s).alias("url"), html.alias("html"))


_BREADCRUMB_PAGES_SQL = """
SELECT 'u' || doc_id AS url,
  '<html>'
  || (CASE WHEN doc_id % 4 = 0
      THEN '<script type="application/ld+json">{"@type": "Article", "name": "decoy"}</script>'
      ELSE '' END)
  || (CASE WHEN doc_id % 7 != 0
      THEN '<script type="application/ld+json">{"@type": "BreadcrumbList", "itemListElement": [{"@type": "ListItem", "position": 1, "name": "Home"}, {"@type": "ListItem", "position": 2, "name": "Section '
        || (doc_id % 5)
        || '"}, {"@type": "ListItem", "position": 3, "name": "Doc '
        || doc_id || '"}]}</script>'
      ELSE '' END)
  || (CASE WHEN doc_id % 10 = 0 AND doc_id % 7 != 0
      THEN '<script type="application/ld+json">{"@type": "BreadcrumbList", "itemListElement": [{"@type": "ListItem", "position": 1, "name": "Home"}, {"@type": "ListItem", "position": 2, "name": "Section '
        || (doc_id % 5) || '"}]}</script>'
      ELSE '' END)
  || '</html>' AS html
FROM documents
"""


def q_breadcrumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-declared taxonomy trails (schema.org BreadcrumbList) over
    the deterministic synthesis: type gate vs Article decoys, 1-based
    positions, case-preserved names, block_idx in document order."""
    from easyner_spark.operators.webtext import extract_breadcrumbs

    return extract_breadcrumbs(_breadcrumb_pages(spark, sf_dir))


def q_breadcrumb_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide declared-taxonomy rollup: adjacent trail pairs,
    lowercased, distinct-url voting (the every-10th second block must
    NOT double-count its page)."""
    from easyner_spark.operators.webtext import (
        breadcrumb_edges,
        extract_breadcrumbs,
    )

    return breadcrumb_edges(
        extract_breadcrumbs(_breadcrumb_pages(spark, sf_dir))
    ).select("parent", "child", "n_pages")


def _section_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sectioned-page synthesis: every 6th doc opens
    with a preamble list (NULL heading); docs not divisible by 7 get
    '<h2>Topic <id%5></h2>' with a two-item list; every 3rd of those
    adds a second '<h3>Tools</h3>' section."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    html = F.concat(
        F.lit("<html>"),
        F.when(
            did % 6 == 0,
            F.concat(
                F.lit("<ul><li>pre"), (did % 4).cast("string"),
                F.lit("</li></ul>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 != 0,
            F.concat(
                F.lit("<h2>Topic "), (did % 5).cast("string"),
                F.lit("</h2><p>x</p><ul><li>Item "),
                (did % 11).cast("string"),
                F.lit("</li><li>Item "), (did % 13).cast("string"),
                F.lit("</li></ul>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            (did % 3 == 0) & (did % 7 != 0),
            F.concat(
                F.lit("<h3>Tools</h3><ol><li>tool"),
                (did % 3).cast("string"), F.lit("</li></ol>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</html>"),
    )
    return d.select(F.concat(F.lit("u"), s).alias("url"), html.alias("html"))


_SECTION_PAGES_SQL = """
SELECT 'u' || doc_id AS url,
  '<html>'
  || (CASE WHEN doc_id % 6 = 0
      THEN '<ul><li>pre' || (doc_id % 4) || '</li></ul>' ELSE '' END)
  || (CASE WHEN doc_id % 7 != 0
      THEN '<h2>Topic ' || (doc_id % 5) || '</h2><p>x</p><ul><li>Item '
        || (doc_id % 11) || '</li><li>Item ' || (doc_id % 13)
        || '</li></ul>'
      ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0 AND doc_id % 7 != 0
      THEN '<h3>Tools</h3><ol><li>tool' || (doc_id % 3) || '</li></ol>'
      ELSE '' END)
  || '</html>' AS html
FROM documents
"""


def q_section_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section-scoped list extraction: nearest-preceding-heading
    association, preamble lists with NULL heading, document-order
    section/item indexes."""
    from easyner_spark.operators.webtext import section_lists

    return section_lists(_section_pages(spark, sf_dir))


def q_list_memberships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide (topic, member) rollup over section_lists — the
    list-page member-of feeder for the mined taxonomy."""
    from easyner_spark.operators.webtext import (
        list_memberships,
        section_lists,
    )

    return list_memberships(
        section_lists(_section_pages(spark, sf_dir))
    ).select("topic", "member", "n_pages")


def q_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection over deterministic synthesis: every 9th doc
    is a short canonical error page (phrase + short -> soft404), every
    13th has the phrase buried in real-length text (hit flagged, gated
    by length), every 11th url carries a not-found path segment."""
    from easyner_spark.operators.webtext import soft404_signals

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    url = F.concat(
        F.lit("https://h"),
        (did % 20).cast("string"),
        F.lit(".example.com/"),
        F.when(did % 11 == 0, F.lit("not-found/")).otherwise(F.lit("p/")),
        s,
    )
    txt = (
        F.when(
            did % 9 == 0,
            F.lit("Error 404 page not found. The page does not exist."),
        )
        .when(did % 13 == 0, F.concat(F.col("text"), F.lit(" page not found")))
        .otherwise(F.col("text"))
    )
    pages = d.select(url.alias("url"), txt.alias("text"))
    return soft404_signals(pages).select(
        "url",
        F.col("n_chars").cast("long").alias("n_chars"),
        "hit_phrase",
        "url_404",
        "is_soft404",
    )


def q_opengraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open Graph extraction over deterministic head synthesis: every
    page carries og:title/og:type (4 rotating types), every 3rd page
    an og:image gallery of 2 — repeated props emit one row each,
    document order pinned by prop_idx."""
    from easyner_spark.operators.webtext import extract_opengraph

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><head><meta property="og:title" content="doc '),
        did.cast("string"),
        F.lit('"><meta property="og:type" content="'),
        F.element_at(
            F.array(
                F.lit("article"), F.lit("profile"),
                F.lit("video"), F.lit("website"),
            ),
            (did % 4 + 1).cast("int"),
        ),
        F.lit('">'),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<meta property="og:image" content="https://img.example/'),
                did.cast("string"),
                F.lit('a.png"><meta property="og:image"'),
                F.lit(' content="https://img.example/'),
                did.cast("string"),
                F.lit('b.png">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head></html>"),
    )
    pages = d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        html.alias("html"),
    )
    return extract_opengraph(pages)


def q_feed_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed parsing over deterministic feed synthesis: even
    doc_ids serve RSS (2 items, every 5th missing pubDate), odd serve
    Atom (2 entries) — case-insensitive tags, case-preserving
    content, linkless items dropped."""
    from easyner_spark.operators.webtext import feed_parse

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    rss = F.concat(
        F.lit("<rss><channel><title>chan</title><item><title>Post A"),
        s,
        F.lit("</title><link>https://f.example/"),
        s,
        F.lit("/a</link>"),
        F.when(
            did % 5 != 0,
            F.concat(F.lit("<pubDate>2026-01-0"), (did % 9 + 1).cast("string"), F.lit("</pubDate>")),
        ).otherwise(F.lit("")),
        F.lit("</item><item><link>https://f.example/"),
        s,
        F.lit("/b</link></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed><title>f</title><entry><title>Entry A'),
        s,
        F.lit('</title><link href="https://f.example/'),
        s,
        F.lit('/a"/><updated>2026-02-0'),
        (did % 9 + 1).cast("string"),
        F.lit('</updated></entry><entry><link href="https://f.example/'),
        s,
        F.lit('/b"/></entry></feed>'),
    )
    feeds = d.select(
        F.concat(F.lit("https://f.example/feed/"), s).alias("url"),
        F.when(did % 2 == 0, rss).otherwise(atom).alias("feed_xml"),
    )
    return feed_parse(feeds)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning over a synthetic ledger: mostly
    1-10 KB files with every 19th ~120 KB (oversized vs the 100 KB
    target — lands whole in one group, groups stay contiguous in path
    order). Reuses pack_sequences' distributed prefix sum."""
    from easyner_spark.sinks.checkpoint import compaction_plan

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    files = d.select(
        F.concat(F.lit("part-"), did.cast("string"), F.lit(".parquet")).alias(
            "path"
        ),
        F.when(did % 19 == 0, F.lit(120_000))
        .otherwise(1000 + (did * 37) % 9000)
        .cast("long")
        .alias("size_bytes"),
    )
    # NB: the prefix-sum range cache stays pinned until the driver
    # materializes the result (releasing it here would re-sample range
    # bounds on recompute — sampling.py docstring); q_pack_sequences
    # pins its cache for the session the same way.
    return compaction_plan(files, target_bytes=100_000)


def q_lang_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact length quantiles — the distributed
    (partitioned-window) grouped variant of length_quantiles; feeds
    the adaptive per-stratum quality gate (grouped_quantile_filter)."""
    from easyner_spark.operators.sketches import grouped_quantiles

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return grouped_quantiles(d, "lang", F.length("text"))


def q_alias_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-phrase alias mining over the multi-word anchor corpus:
    hub aliases ('the hub portal') earn multi-host confidence, self-
    link phrases stay single-host and fail the gate."""
    from easyner_spark.operators.webtext import alias_candidates

    return alias_candidates(_synth_anchor_pages(spark, sf_dir))


def q_seed_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from topic seeds {e1, e5} over the closed
    KG — teleport mass restricted to the seeds, 3 iterations, the
    per-iteration round(·, 9) state contract that makes the iterative
    float algorithm value-oracle-able."""
    from easyner_spark.operators.graph import personalized_pagerank

    seeds = spark.createDataFrame([("e1",), ("e5",)], "node string")
    return personalized_pagerank(
        _kg_synth_edges(spark, sf_dir), seeds, iters=3
    )


def q_ner_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distant-supervision NER training examples: 3-token context
    windows around every dictionary mention, from the same token
    stream dict_ner matched on."""
    from easyner_spark.operators.ner_dict import ner_examples

    out = ner_examples(_mentions(spark, sf_dir), _sentences(spark, sf_dir))
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.col("begin_tok").cast("long").alias("begin_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        "label",
        "left_ctx",
        "mention_txt",
        "right_ctx",
    )


def _doclinks_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages synthesis for the page-graph queries (doc_links,
    page_rank) — SQL twin: _DOCLINKS_PREFIX."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://site"),
        (did % 37).cast("string"),
        F.lit(".example.net/p/"),
        did.cast("string"),
    )
    html = F.concat(
        F.lit('<html><body><a href="https://site'),
        ((did + 1) % 37).cast("string"),
        F.lit(".example.net/p/"),
        (did + 1).cast("string"),
        F.lit('">a</a><a href="/p/'),
        (did % 100).cast("string"),
        F.lit('">b</a><a href="sub/page'),
        (did % 7).cast("string"),
        F.lit('">c</a><a href="//site'),
        (did % 37).cast("string"),
        F.lit(".example.net/p/"),
        (did + 2).cast("string"),
        F.lit('">d</a>'),
        F.when(did % 5 == 0, F.lit('<a href="mailto:x@y.z">m</a>')).otherwise(
            F.lit("")
        ),
        F.lit("</body></html>"),
    ).cast("binary")
    return d.select(url.alias("url"), html.alias("html"))


def q_doc_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level link graph with href RESOLUTION value-checked on
    every branch (keep_external=True): absolute link to the next doc's
    exact url, root-relative '/p/<did%100>' (in-corpus only when the
    target doc shares the host), relative 'sub/page<k>' (resolves
    against the /p/ base dir, always external), protocol-relative
    (inherits the base scheme), mailto dropped."""
    from easyner_spark.operators.webtext import doc_link_graph

    return doc_link_graph(_doclinks_pages(spark, sf_dir), keep_external=True)


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified discovery frontier over the doc-link pages + a sitemap
    announcing each page's protocol-relative link target (engineered
    link+sitemap corroboration) + an RSS feed announcing the absolute
    link target on every 3rd doc (link+feed) or a feed-only item —
    parsed by the REAL sitemap_parse/feed_parse, merged with full
    href resolution, anti-joined against the corpus, provenance
    rolled up."""
    from easyner_spark.operators.webtext import (
        crawl_frontier,
        feed_parse,
        sitemap_parse,
    )

    pages = _doclinks_pages(spark, sf_dir)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    sm_xml = F.concat(
        F.lit("<urlset><url><loc>https://site"),
        (did % 37).cast("string"),
        F.lit(".example.net/p/"),
        (did + 2).cast("string"),
        F.lit("</loc></url></urlset>"),
    )
    sitemaps = d.select(
        F.concat(F.lit("https://site"), (did % 37).cast("string"),
                 F.lit(".example.net/sitemap.xml")).alias("url"),
        sm_xml.alias("sitemap_xml"),
    )
    fd_target = F.when(
        did % 3 == 0,
        F.concat(F.lit("https://site"), ((did + 1) % 37).cast("string"),
                 F.lit(".example.net/p/"), (did + 1).cast("string")),
    ).otherwise(F.concat(F.lit("https://feeds.example.org/item/"), s))
    feeds = d.select(
        F.concat(F.lit("https://feeds.example.org/f/"), s).alias("url"),
        F.concat(
            F.lit("<rss><channel><item><link>"),
            fd_target,
            F.lit("</link></item></channel></rss>"),
        ).alias("feed_xml"),
    )
    extra = [
        (sitemap_parse(sitemaps).select(F.col("loc").alias("url")), "sitemap"),
        (feed_parse(feeds).select(F.col("link").alias("url")), "feed"),
    ]
    return crawl_frontier(pages, extra)


def q_surt_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT index keys over the skewed synthetic urls (CDX ordering:
    reversed host labels + path) — hub.example.com and its would-be
    subdomains all sort under 'com,example,hub)'."""
    from easyner_spark.operators.webtext import surt_key

    p = _synth_url_pages(spark, sf_dir)
    return p.select("doc_id", "url", surt_key("url").alias("surt"))


def q_page_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level PageRank over the in-corpus page graph (the
    Common-Crawl page-rank product): href resolution -> membership
    join -> fixed-iteration PageRank. Uses doc_link_edges (the
    count-free edge path) so no n_links rollup shuffle is paid just
    to be dropped."""
    from easyner_spark.operators.graph import pagerank
    from easyner_spark.operators.webtext import doc_link_edges

    return pagerank(doc_link_edges(_doclinks_pages(spark, sf_dir)), iters=3)


def q_crawl_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-epoch fetch-budget apportionment across hosts by page
    count (Hamilton largest-remainder, exact integers): quotas sum to
    the 10000-fetch budget exactly; the skewed hub host draws its
    proportional share."""
    from easyner_spark.operators.sampling import apportion_budget

    p = _synth_url_pages(spark, sf_dir)
    from easyner_spark.operators.webtext import _host_col

    wts = (
        p.select(_host_col(F.col("url")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    return apportion_budget(wts, budget=10_000)


def q_polite_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-capped fetch allocation over the skewed hosts: the
    hub host (30% of pages) declares Crawl-delay 2s, so its Hamilton
    share clips to 1800 fetches/hour and the surplus shows up in
    `clipped` (next epoch's carry); every 7th tail host declares 30s."""
    from easyner_spark.operators.sampling import polite_quota
    from easyner_spark.operators.webtext import _host_col

    p = _synth_url_pages(spark, sf_dir)
    wts = (
        p.select(_host_col(F.col("url")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    delays = spark.createDataFrame(
        [("hub.example.com", 2)]
        + [(f"site{i}.example.net", 30) for i in range(0, 37, 7)],
        "host string, crawl_delay_s long",
    )
    return polite_quota(wts, delays, budget=10_000, epoch_seconds=3600)


def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap announcements from robots.txt (global directive — one
    inside a named-agent group still counts): even docs announce two
    sitemaps, odd docs one valid plus a spec-invalid relative value
    (dropped); case-insensitive name, trailing comments stripped."""
    from easyner_spark.operators.webtext import robots_sitemaps

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    s = did.cast("string")
    body = F.concat_ws(
        "\n",
        F.lit("User-agent: *"),
        F.lit("Disallow: /tmp"),
        F.concat(F.lit("Sitemap: https://r"), s,
                 F.lit(".example.org/sitemap.xml")),
        F.lit("User-agent: bot"),
        F.lit("Disallow: /"),
        F.when(
            did % 2 == 0,
            F.concat(F.lit("sitemap: https://r"), s, F.lit(".example.org/news"),
                     (did % 4).cast("string"), F.lit(".xml   # extra")),
        ).otherwise(F.lit("Sitemap: /relative-dropped")),
    )
    robots = d.select(
        F.concat(F.lit("https://r"), s, F.lit(".example.org/robots.txt")).alias(
            "url"
        ),
        body.alias("robots_txt"),
    )
    return robots_sitemaps(robots)


def q_sitemap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-index parsing over multi-line shard announcements: two
    children per index (one with lastmod), plus a spec-invalid
    loc-less block dropped."""
    from easyner_spark.operators.webtext import sitemap_index_parse

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    h = (did % 11).cast("string")
    xml = F.concat(
        F.lit("<sitemapindex>\n<sitemap>\n  <loc>https://s"),
        h,
        F.lit(".example.org/sm-"),
        did.cast("string"),
        F.lit("-a.xml</loc>\n  <lastmod>2026-0"),
        ((did % 9) + 1).cast("string"),
        F.lit("-05</lastmod>\n</sitemap>\n<sitemap><loc>https://s"),
        h,
        F.lit(".example.org/sm-"),
        did.cast("string"),
        F.lit("-b.xml</loc></sitemap>\n"
              "<sitemap><lastmod>2026-01-01</lastmod></sitemap>\n"
              "</sitemapindex>"),
    )
    indexes = d.select(
        F.concat(F.lit("https://s"), h, F.lit(".example.org/smi-"),
                 did.cast("string"), F.lit(".xml")).alias("url"),
        xml.alias("sitemap_xml"),
    )
    return sitemap_index_parse(indexes)


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parsing over 13 synthetic hosts: named-agent blocks
    dropped, '*' block kept, comments stripped (incl. trailing),
    case-insensitive directive names, empty Disallow no-op dropped,
    Crawl-delay captured — the raw-bytes front of the politeness
    chain (parse -> robots_verdict -> polite_quota)."""
    from easyner_spark.operators.webtext import parse_robots

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    h = (did % 13).cast("string")
    body = F.concat_ws(
        "\n",
        F.concat(F.lit("# robots for host "), h),
        F.lit("User-agent: Googlebot"),
        F.lit("Disallow: /private"),
        F.lit("User-agent: *"),
        F.concat(F.lit("Disallow: /tmp"), h),
        F.concat(F.lit("Allow: /tmp"), h, F.lit("/ok   # carve-out")),
        F.concat(F.lit("Crawl-delay: "), ((did % 13) + 1).cast("string")),
        F.lit("Disallow:"),
        F.concat(F.lit("DISALLOW: /x"), ((did % 13) % 3).cast("string")),
    )
    robots = d.where(did < 13).select(
        F.concat(F.lit("https://r"), h, F.lit(".example.org/robots.txt")).alias(
            "url"
        ),
        body.alias("robots_txt"),
    )
    return parse_robots(robots)


def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing over multi-line XML bodies: one entry with
    lastmod, one without, one spec-invalid (no <loc>, dropped) —
    block-wise matching so lastmod never leaks across entries."""
    from easyner_spark.operators.webtext import sitemap_parse

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    h = (did % 11).cast("string")
    xml = F.concat(
        F.lit("<urlset>\n<url>\n  <loc>https://s"),
        h,
        F.lit(".example.org/p/"),
        did.cast("string"),
        F.lit("</loc>\n  <lastmod>2026-0"),
        ((did % 9) + 1).cast("string"),
        F.lit("-01</lastmod>\n</url>\n<url><loc>https://s"),
        h,
        F.lit(".example.org/q/"),
        (did * 3).cast("string"),
        F.lit("</loc></url>\n<url><lastmod>2026-01-01</lastmod></url>\n</urlset>"),
    )
    sitemaps = d.select(
        F.concat(F.lit("https://s"), h, F.lit(".example.org/sitemap.xml")).alias(
            "url"
        ),
        xml.alias("sitemap_xml"),
    )
    return sitemap_parse(sitemaps)


def q_meta_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level robots directives over five content variants:
    absent tag, 'noindex', mixed-case 'NOINDEX, nofollow', 'none'
    (= both), and an explicit 'index, follow'."""
    from easyner_spark.operators.webtext import meta_robots

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    content = (
        F.when(did % 5 == 1, F.lit('<meta name="robots" content="noindex">'))
        .when(
            did % 5 == 2,
            F.lit('<meta name="robots" content="NOINDEX, nofollow">'),
        )
        .when(did % 5 == 3, F.lit('<meta name="robots" content="none">'))
        .when(
            did % 5 == 4,
            F.lit('<meta name="robots" content="index, follow">'),
        )
        .otherwise(F.lit(""))
    )
    pages = d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        F.concat(F.lit("<html><head>"), content, F.lit("</head></html>"))
        .cast("binary")
        .alias("html"),
    )
    return meta_robots(pages)


def q_hreflang_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Translation clusters over declared hreflang alternates: groups
    of 4 pages star onto their head, every 8th head chains to the
    next group's head (one-sided + chained declarations both merge —
    the components closure handles what naive pairwise grouping
    can't)."""
    from easyner_spark.operators.webtext import hreflang_clusters

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    lang = (
        F.when(did % 4 == 0, F.lit("en"))
        .when(did % 4 == 1, F.lit("sv"))
        .when(did % 4 == 2, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    html = F.concat(
        F.lit('<html><head><link rel="alternate" hreflang="'),
        lang,
        F.lit('" href="u'),
        (did - did % 4).cast("string"),
        F.lit('">'),
        F.when(
            did % 8 == 0,
            F.concat(
                F.lit('<link rel="alternate" hreflang="x-default" href="u'),
                (did + 4).cast("string"),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head></html>"),
    ).cast("binary")
    pages = d.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        html.alias("html"),
    )
    return hreflang_clusters(pages)


def q_kg_node_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized KG node table (north rule: 'deduplicated
    node/edge tables'): per canonical entity — its cross-document
    component, mention/doc support, crawl-epoch span (doc_id % 5),
    and co-occurrence degree. Mention stats pre-agg on (entity, doc)
    so the doc count is Expand-free; degree over distinct symmetric
    pairs; components = the same distributed fixpoint q_components
    pins. Entities never co-occurring keep degree 0 and component =
    their own id."""
    from easyner_spark.operators.components import connected_components
    from easyner_spark.operators.nel import link_entities, primary_alias

    linked = link_entities(
        _mentions(spark, sf_dir), primary_alias(_alias_df(spark)),
        keep_unmatched=False,
    )
    m = linked.select(
        "entity_id", F.col("url").cast("long").alias("doc_id")
    )
    gd = (
        m.repartition("entity_id")
        .groupBy("entity_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pe = gd.groupBy("entity_id").agg(
        F.sum("c").cast("long").alias("n_mentions"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min(F.col("doc_id") % 5).cast("long").alias("first_epoch"),
        F.max(F.col("doc_id") % 5).cast("long").alias("last_epoch"),
    )
    t = q_triples(spark, sf_dir)
    nb = (
        t.select(F.col("subj_id").alias("e"), F.col("obj_id").alias("n"))
        .unionByName(
            t.select(F.col("obj_id").alias("e"), F.col("subj_id").alias("n"))
        )
        .distinct()
    )
    dg = nb.groupBy("e").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    comp = connected_components(
        t.select(F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")),
        local_finish_edges=0,
    )
    return (
        pe.join(comp, pe["entity_id"] == comp["node"], "left")
        .join(dg, pe["entity_id"] == dg["e"], "left")
        .select(
            "entity_id",
            F.coalesce(F.col("component"), F.col("entity_id")).alias(
                "component"
            ),
            "n_mentions",
            "n_docs",
            "first_epoch",
            "last_epoch",
            F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
        )
    )


def q_stale_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Announced-newer-than-fetched recrawl targets: the sitemap
    lastmod (month did%9+1) vs the corpus fetch date (month did%7+1),
    compared as ISO strings — same month sorts fresh (day 01 < 15).
    The /q/ announcements never joined (never fetched: frontier's
    job); closes the incremental-recrawl triad with sitemap_frontier
    and crawl_delta."""
    from easyner_spark.operators.webtext import stale_announcements

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    meta = d.select(
        F.concat(
            F.lit("https://s"),
            (did % 11).cast("string"),
            F.lit(".example.org/p/"),
            did.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("2026-0"), ((did % 7) + 1).cast("string"), F.lit("-15")
        ).alias("fetch_date"),
    )
    return stale_announcements(q_sitemap_urls(spark, sf_dir), meta)


def q_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified eval-set selection: exactly 200 documents,
    apportioned across languages proportionally (Hamilton quotas),
    each stratum's rows chosen by smallest md5(doc_id) rank —
    deterministic, seed-free, sums exactly (mixture_sample's ppm gate
    is only right in expectation)."""
    from easyner_spark.operators.sampling import stratified_sample_exact

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    return stratified_sample_exact(d, group_col="lang", total=200)


def q_entity_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal burst detection over the NER mentions with epoch =
    doc_id % 5 (five synthetic crawl windows): is_burst is the pure-
    BIGINT cross-multiplied gate max*E > 2*total, burst_epoch the
    count-argmax epoch (smallest on ties)."""
    from easyner_spark.operators.analysis import entity_bursts

    m = _mentions(spark, sf_dir).select(
        "mention_lc", (F.col("url").cast("long") % 5).alias("epoch")
    )
    return entity_bursts(m, entity_col="mention_lc", epoch_col="epoch")


def q_html_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction: every 4th page titleless, every 5th
    uses uppercase TITLE tags (case-insensitivity via lower()), every
    2nd carries a meta description, every 3rd declares a rel=canonical
    onto the hub mirror (so effective_url folds recrawl variants)."""
    from easyner_spark.operators.webtext import extract_meta

    base = _synth_url_pages(spark, sf_dir)
    did = F.col("doc_id")
    html = F.concat(
        F.lit("<html><head>"),
        F.when(did % 4 == 0, F.lit("")).otherwise(
            F.concat(
                F.when(did % 5 == 0, F.lit("<TITLE> ")).otherwise(F.lit("<title> ")),
                F.lit("Doc "),
                (did % 211).cast("string"),
                F.when(did % 5 == 0, F.lit(" </TITLE>")).otherwise(
                    F.lit(" </title>")
                ),
            )
        ),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit('<meta name="description" content="summary '),
                (did % 50).cast("string"),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<link rel="canonical" href="https://hub.example.com/c/'),
                (did % 97).cast("string"),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"),
    ).cast("binary")
    return extract_meta(base.withColumn("html", html))


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style mixture resampling to fixed per-language keep
    rates (ppm): exact 32-bit md5 gate h32 * 1e6 < ppm * 2^32, pure
    BIGINT on both engines — no float thresholds. Zero shuffle."""
    from easyner_spark.operators.sampling import mixture_sample

    rates = {"en": 750_000, "de": 500_000, "fr": 250_000}
    return mixture_sample(
        _synth_url_pages(spark, sf_dir), rates, group_col="lang", key="url"
    ).select("doc_id", "url", "lang")


def _temp_mixture_rates() -> dict:
    """Shared (Spark + oracle) temperature-mixture rates: designed
    per-language corpus counts through temperature_targets(alpha=0.3)
    then mixture_rates — one Python source of truth, embedded as ppm
    literals on both sides (the q_mixture_sample pattern; the float
    pow happens ONCE, driver-side, never per row or per engine)."""
    from easyner_spark.operators.sampling import (
        mixture_rates,
        temperature_targets,
    )

    counts = {"en": 1_000_000, "de": 100_000, "fr": 10_000}
    return mixture_rates(counts, temperature_targets(counts, alpha=0.3))


def q_temp_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.3, the XLM-R rule) mixture
    resampling: designed head/tail language counts flattened into
    downsample-only ppm rates driver-side, rows gated by the exact
    BIGINT md5 threshold — head language downsampled hard, tail kept
    whole."""
    from easyner_spark.operators.sampling import mixture_sample

    return mixture_sample(
        _synth_url_pages(spark, sf_dir),
        _temp_mixture_rates(),
        group_col="lang",
        key="url",
    ).select("doc_id", "url", "lang")


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-gated 30% sample keyed on url (seed 'r3') —
    reproducible split selection, zero shuffle."""
    from easyner_spark.operators.sampling import deterministic_sample

    pages = _synth_url_pages(spark, sf_dir)
    out = deterministic_sample(pages, rate=0.3, key="url", seed="r3")
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "url")


def _quality_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_synth_url_pages + deterministic quality and token-count
    columns: quality = ((doc_id*37) % 101) / 4 — the dyadic /4 keeps
    the DOUBLE bit-identical across engines; n_tokens is pure integer
    arithmetic. Host extracted for capping."""
    from easyner_spark.operators.webtext import url_parts

    did = F.col("doc_id")
    return url_parts(_synth_url_pages(spark, sf_dir)).select(
        "doc_id",
        "url",
        "host",
        (((did * 37) % 101).cast("double") / F.lit(4.0)).alias("quality"),
        (F.lit(50) + did % 200).cast("long").alias("n_tokens"),
    )


def q_per_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style domain diversity cap: best 5 pages per host by quality
    (url tie-break) — one host-keyed window."""
    from easyner_spark.operators.sampling import per_host_cap

    out = per_host_cap(
        _quality_pages(spark, sf_dir), cap=5, order_col="quality",
        id_col="url", keep_rank=True,
    )
    return out.select(
        "host", "url", "quality",
        F.col("host_rank").cast("long").alias("host_rank"),
    )


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered token-budget corpus cut: the best documents
    whose running token sum stays within 30k tokens."""
    from easyner_spark.operators.sampling import token_budget_select

    out = token_budget_select(
        _quality_pages(spark, sf_dir), budget=30_000,
        order_col="quality", tokens_col="n_tokens", id_col="doc_id",
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "quality",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


def q_word_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top word-2-gram character fraction per document (the
    aggregation member of the Gopher repetition family)."""
    from easyner_spark.operators.textstats import word_repetition

    out = word_repetition(_docs(spark, sf_dir), n=2)
    return out.select(
        "doc_id", "top_gram", "top_cnt", "top_ngram_frac", "repetition_ok"
    )


def q_latest_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of crawl-snapshot selection: 5 synthetic recrawls per url
    (doc_id % 100), deterministic warc_ts with deliberate ties so the
    struct-max tie-break is exercised; as_of cutoff drops the most
    recent fetches of some urls."""
    from easyner_spark.operators.webtext import latest_crawl

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    host = (
        F.when(did % 10 < 3, F.lit("hub.example.com"))
        .otherwise(F.concat(F.lit("site"), (did % 37).cast("string"), F.lit(".example.net")))
    )
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), (did % 100).cast("string"))
    ts = (F.lit(1700000000) + (did % 17) * 1000 + did % 7).cast("long")
    pages = d.select(url.alias("url"), ts.alias("warc_ts"), "doc_id")
    out = latest_crawl(pages, as_of=1700013000)
    return out.select("url", "warc_ts", F.col("doc_id").cast("long").alias("doc_id"))


def q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate over documents restructured into
    multi-line web-ish text (bullets, ellipsis lines, hashtag spam,
    duplicated blocks injected deterministically by doc_id so every
    rule fires on a known subset)."""
    from easyner_spark.operators.textstats import gopher_filters

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did, nl = F.col("doc_id"), F.lit("\n")
    t1 = F.when(
        did % 5 == 0,
        F.concat(F.lit("- "), F.regexp_replace("text", " a ", "\n- ")),
    ).otherwise(F.regexp_replace("text", " a ", "\n"))
    t2 = F.when(did % 9 == 0, F.replace(t1, nl, F.lit("...\n"))).otherwise(t1)
    t3 = F.when(did % 3 == 0, F.concat(t2, F.lit(" ..."))).otherwise(t2)
    t4 = F.when(
        did % 7 == 0, F.concat(t3, F.lit("\nsee #a #b #c #d #e #f #g"))
    ).otherwise(t3)
    t5 = F.when(did % 11 == 0, F.concat(t4, nl, t4)).otherwise(t4)
    docs = d.select("doc_id", t5.alias("text"))
    out = gopher_filters(docs, min_words=30, max_words=100)
    return out.select(
        "doc_id",
        "n_words",
        "n_lines",
        "mean_word_len",
        "symbol_word_ratio",
        "bullet_line_ratio",
        "ellipsis_line_ratio",
        "alpha_word_ratio",
        "dup_line_frac",
        "word_count_ok",
        "mean_word_len_ok",
        "symbol_ratio_ok",
        "bullet_ok",
        "ellipsis_ok",
        "alpha_ok",
        "stopword_ok",
        "dup_line_ok",
        "gopher_keep",
    )


# ---------------------------------------------------------------------------
# Training-data-pipeline operators (dedup / similarity / text analysis)
# over the raw documents + embeddings tables.
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs_perturbed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ first-word-dropped copy (+100000 ids): deterministic
    near-duplicates so the near-dup operators demonstrate real recall."""
    d = _docs(spark, sf_dir)
    p = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return d.unionByName(p)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.textstats import text_stats

    out = text_stats(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens_ws").cast("long").alias("n_tokens_ws"),
        F.col("n_tokens_re").cast("long").alias("n_tokens_re"),
        F.col("n_words").cast("long").alias("n_words"),
        "alpha_ratio",
        "punct_ratio",
        "stopword_ratio",
        "mean_word_len",
        "quality",
        "lang_pred",
        "fingerprint",
    )


def q_paragraph_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-paragraph language segmentation rolled up per doc: majority
    lang (algebraic argmax), distinct-lang count, mixed flag — the
    CCNet/mC4-style segment-before-filter signal."""
    from easyner_spark.operators.textstats import paragraph_langs

    out = paragraph_langs(_docs(spark, sf_dir))
    return out.select(
        F.col("id").cast("long").alias("id"),
        "n_paras",
        "majority_lang",
        "n_langs",
        "is_mixed",
    )


def q_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-encoding artifact detection. The synthetic corpus is
    clean ASCII, so deterministic corruption is injected first (the
    q_predicate_triples recipe): docs with doc_id%3==0 get ' a ' ->
    ' \u00c3\u00a1 ' (the UTF-8-as-Latin-1 shape), docs with
    doc_id%7==0 get a smart-quote artifact suffix — both mirrored
    verbatim in the oracle SQL."""
    from easyner_spark.operators.textstats import mojibake_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corrupted = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.when(
                F.col("doc_id") % 3 == 0,
                F.regexp_replace("text", " a ", " \u00c3\u00a1 "),
            ).otherwise(F.col("text")),
            F.when(F.col("doc_id") % 7 == 0, F.lit("\u00e2\u20ac\u2122\u00c2 ")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return mojibake_stats(corrupted).select(
        F.col("id").cast("long").alias("id"),
        "n_chars",
        "n_atilde",
        "n_smart",
        "n_acirc",
        "n_repl",
        "mojibake_hits",
        "is_mojibake",
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.textstats import lang_id

    out = lang_id(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "lang_pred",
        *[F.col(f"hits_{lg}").cast("long").alias(f"hits_{lg}") for lg in ("de", "en", "es", "fr")],
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with deterministically injected PII
    (emails on doc_id%3==0, an IPv4 + phone tail on doc_id%5==0) so
    every category and the sequential-redaction order are exercised.
    The oracle replays the same injection and the same three-stage
    regexp pipeline in DuckDB (explicit 'g' flag — DuckDB replaces
    first-match by default while Spark replaces all)."""
    from easyner_spark.operators.textstats import pii_redact

    d = _docs(spark, sf_dir)
    sid = F.col("doc_id").cast("string")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" mail u"), sid, F.lit("@ex-a.org ok")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" ip 10."),
                    (F.col("doc_id") % 200).cast("string"),
                    F.lit(".0.1 tel +46 70-123 45"),
                    (F.col("doc_id") % 10).cast("string"),
                    F.lit("8"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_redact(injected)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark n-gram decontamination: bench = the
    doc_id%97==0 slice of documents, so those docs score overlap 1.0
    (self-contaminated) and the rest measure genuine 8-gram leakage.
    The oracle rebuilds the 8-gram shingles + distinct bench grams +
    per-doc hit rollup in SQL."""
    from easyner_spark.operators.dedup import decontaminate

    d = _docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 97 == 0)
    return decontaminate(d, bench, n=8, threshold=0.5).select(
        "id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hits").cast("long").alias("n_hits"),
        "overlap_frac",
        "contaminated",
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions over the events table via the built-in
    session_window aggregation; the oracle rebuilds sessions with the
    lag/gap-island formulation (new session when the micros gap is
    STRICTLY > 30 min — Spark merges adjacent windows, so an event at
    exactly prev + gap stays in the session; pinned by pytest), so the
    two independent formulations must agree on every boundary."""
    from easyner_spark.operators.events import sessionize

    return sessionize(_events(spark, sf_dir))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF join: every 'view' event matched to the user's most recent
    'click' at or before it (union-tag-window, one shuffle). The
    oracle is a LATERAL top-1 per view row with the same (ts desc,
    event_id desc) tie rule."""
    from easyner_spark.operators.events import asof_join

    ev = _events(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    from easyner_spark.operators.events import ts_micros

    out = asof_join(views, clicks, key="user_id", ts_col="ts")
    return out.select(
        "event_id",
        "user_id",
        ts_micros("ts").alias("ts_us"),
        F.col("event_id_right").alias("click_event_id"),
        ts_micros("ts_right").alias("click_ts_us"),
    )


def q_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event rollup incl. a JSON field summed out of props
    (from_json JVM-side). Integer cents keep double sums exact."""
    from easyner_spark.operators.events import event_rollup

    return event_rollup(_events(spark, sf_dir))


BM25_TERMS = ("spark", "join", "vector")


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of a fixed 3-term query over documents —
    zero data-keyed shuffles (per-doc tf projection + one broadcast
    1-row stats aggregate); oracle generated by the operator's own
    bm25_oracle_sql so both float expression trees stay in lockstep."""
    from easyner_spark.operators.ranking import bm25_rank

    return bm25_rank(_docs(spark, sf_dir), BM25_TERMS)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): add-one-smoothed
    hashed-bigram bag models for a target domain (doc_id % 7 == 0
    slice) vs the raw corpus; per-doc weight = exact BIGINT sum of
    per-bucket floor-quantized log ratios. The data-selection score
    for steering a crawl toward a target distribution; model is a
    bounded n_buckets-row table (train once, reuse via ratios=)."""
    from easyner_spark.operators.scoring import dsir_weights

    d = _docs(spark, sf_dir)
    return dsir_weights(d, d.where(F.col("doc_id") % 7 == 0))


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR resampling step: Gumbel top-k over the importance weights
    with an exact integer Gumbel key (md5-derived u, floor-quantized
    micro-nats) — the surviving-k set is engine- and run-stable;
    plans TakeOrderedAndProject, never a global sort."""
    from easyner_spark.operators.scoring import dsir_sample

    d = _docs(spark, sf_dir)
    return dsir_sample(d, d.where(F.col("doc_id") % 7 == 0), k=50)


def _dsir_weights_oracle() -> str:
    """q_dsir_weights oracle: generated by the operator module from
    the SAME bucket/smoothing/quantization construction."""
    from easyner_spark.operators.scoring import dsir_weights_oracle_sql

    return dsir_weights_oracle_sql()


def _dsir_sample_oracle() -> str:
    """q_dsir_sample oracle: same exact integer Gumbel key and total
    order."""
    from easyner_spark.operators.scoring import dsir_sample_oracle_sql

    return dsir_sample_oracle_sql(50)


def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shape quality filter: unigram LM trained on the corpus
    itself (bounded vocab aggregate), every document scored by
    per-token cross-entropy. Cross-row sums are exact BIGINT µ-units
    (per-word floor(ln(p)*1e6)), floats only in per-row finals —
    oracle generated by the operator's own unigram_lm_oracle_sql."""
    from easyner_spark.operators.scoring import unigram_lm_score

    return unigram_lm_score(_docs(spark, sf_dir), min_count=2)


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM conditional cross-entropy (the KenLM/
    CCNet shape one order down): bounded bigram+unigram count tables,
    per-transition µ-unit quantization before the exact per-doc sum.
    Oracle generated by the operator's own bigram_lm_oracle_sql."""
    from easyner_spark.operators.scoring import bigram_lm_score

    return bigram_lm_score(_docs(spark, sf_dir), min_count=2)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear quality classifier (fastText shape):
    token -> md5 bucket -> deterministic integer weight, doc margin =
    exact BIGINT fold, prob = sigmoid. ZERO shuffles — the entire
    scorer is one scan-fused whole-stage-codegen projection."""
    from easyner_spark.operators.scoring import hashed_linear_score

    return hashed_linear_score(_docs(spark, sf_dir))


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic cardinality sketch (linear counting over md5
    buckets): O(m) aggregate state, bit-identical estimate on every
    engine/run — the cross-engine-checkable alternative to HLL++ for
    corpus monitoring. Oracle from the operator's own generator."""
    from easyner_spark.operators.sketches import linear_count_distinct

    return linear_count_distinct(_docs(spark, sf_dir), "text")


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document-length histogram (100-char bins, tail bin
    absorbs): one partial-agg aggregate over at most 20 keys."""
    from easyner_spark.operators.sketches import histogram_fixed_bins

    return histogram_fixed_bins(_docs(spark, sf_dir), F.length("text"), 100, 20)


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (class prototypes): µ-unit
    quantization before the one (label, dim) group sum keeps the
    cross-row aggregation exact-integer; O(labels*dim) output."""
    from easyner_spark.operators.similarity import label_centroids

    return label_centroids(_emb(spark, sf_dir))


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index (term, doc, tf, df, idf) with a
    min_df=2 hapax cut — the unknown-query-terms counterpart of
    bm25_rank; ONE posting shuffle + a bounded df table joined back
    AQE-decided. Oracle from the operator's own generator."""
    from easyner_spark.operators.ranking import inverted_postings

    return inverted_postings(_docs(spark, sf_dir), min_df=2)


def q_tfidf_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse tf-idf cosine top-5 neighbors per document through the
    inverted-index self-join (max_df=50 caps the quadratic hot-term
    buckets — the gram_capped lesson); integer micro-unit dot/norms,
    one final rounded float division."""
    from easyner_spark.operators.ranking import tfidf_sim_topk

    return tfidf_sim_topk(_docs(spark, sf_dir), k=5, min_df=2, max_df=50).select(
        F.col("id").cast("long").alias("id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "rank",
        "cos",
    )


def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank sentence salience per document: PageRank (5 rounds,
    d=0.85, round(9) state) over the within-doc shared-token sentence
    graph built via the (url, token) postings self-join."""
    from easyner_spark.operators.ranking import textrank_sentences

    out = textrank_sentences(_sentences(spark, sf_dir), iters=5)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "score",
        "rank",
    )


def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail perplexity terciles under the
    corpus's own add-one unigram LM; all-integer ce_nano metric,
    bounded milli-nat threshold bins, type-1 exact quantiles."""
    from easyner_spark.operators.scoring import ppl_buckets

    return ppl_buckets(_docs(spark, sf_dir), min_count=2).select(
        F.col("id").cast("long").alias("id"),
        "n_tokens",
        "ce_nano",
        "bucket",
    )


def q_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter EM record linkage over consecutive-doc candidate
    pairs with three agreement fields (lang, 50-word length bucket,
    first token) — pattern-level EM on a <= 8-row table, 5 iterations,
    round(9)+clamp state."""
    from easyner_spark.operators.nel import fs_em_linkage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from easyner_spark.operators.textstats import words_array

    feat = docs.select(
        F.col("doc_id").alias("id"),
        "lang",
        F.size(words_array("text")).cast("long").alias("nw"),
        F.get(words_array("text"), 0).alias("fw"),
    )
    a = feat.select(*[F.col(c).alias(f"{c}_a") for c in feat.columns])
    b = feat.select(*[F.col(c).alias(f"{c}_b") for c in feat.columns])
    pairs = (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            F.col("id_a"),
            F.col("id_b"),
            F.col("lang_a").eqNullSafe(F.col("lang_b")).alias("ag_lang"),
            F.expr("(nw_a div 50)")
            .eqNullSafe(F.expr("(nw_b div 50)"))
            .alias("ag_len"),
            F.col("fw_a").eqNullSafe(F.col("fw_b")).alias("ag_first"),
        )
    )
    out = fs_em_linkage(pairs, ("ag_lang", "ag_len", "ag_first"), iters=5)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "match_prob",
        "is_match",
    )


def q_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health report over the text_stats chain —
    integer-only aggregates (counts and sums of exact ints; float
    columns enter only through comparisons against values the
    text_stats oracle already hash-matches), so the rollup is
    order-independent. The oracle wraps the text_stats SQL as a
    subquery — one definition of the per-doc stats, two consumers."""
    from easyner_spark.operators.textstats import text_stats

    s = text_stats(_docs(spark, sf_dir))
    langs = ("de", "en", "es", "fr")
    return s.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_words").cast("long")).alias("total_words"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        F.sum((F.col("quality") >= 0.5).cast("long")).alias("n_quality_ge_half"),
        *[
            F.sum((F.col("lang_pred") == lg).cast("long")).alias(f"n_{lg}")
            for lg in langs
        ],
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.dedup import exact_dedup

    d = _docs(spark, sf_dir)
    dup = d.select((F.col("doc_id") + 500000).alias("doc_id"), "text")
    return exact_dedup(d.unionByName(dup)).select(
        "doc_id", "content_hash", "canonical_id", "is_dup"
    )


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs_perturbed(spark, sf_dir)).select(
        "a", "b", "est_jaccard"
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs2 = _docs_perturbed(spark, sf_dir)
    return ngram_jaccard_pairs(docs2, minhash_lsh_pairs(docs2)).select(
        "a", "b", "jaccard"
    )


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_docs_perturbed(spark, sf_dir)).select(
        "a", "b", F.col("hamming").cast("long").alias("hamming")
    )


def q_winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (MOSS, SIGMOD 2003) over the
    perturbed near-dup corpus: word-3-gram md5 hashes, window w=4,
    min-per-window with the rightmost-tie rule — position-aware
    fingerprints the set-based minhash/simhash paths don't provide.
    Oracle replays the identical hash/key/window chain in DuckDB."""
    from easyner_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(_docs_perturbed(spark, sf_dir)).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "fp"
    )


def q_winnow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs sharing >= 2 winnowing fingerprints,
    df-capped (a fingerprint in > 200 docs is boilerplate and joins
    nobody) — the position-aware complement to minhash_dedup."""
    from easyner_spark.operators.dedup import winnow_candidate_pairs

    return winnow_candidate_pairs(_docs_perturbed(spark, sf_dir)).select(
        "a", "b", "n_shared"
    )


def q_fuzzy_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup: MinHash-LSH near-dup pairs -> connected
    components -> min-id group keeper (operators/dedup.neardup_groups).
    The oracle rebuilds the full chain in SQL: the shingle/signature/
    band CTEs shared with minhash_dedup plus a recursive reachability
    closure — so group assignment, not just the pair list, is
    value-checked."""
    from easyner_spark.operators.dedup import neardup_groups

    return neardup_groups(
        _docs_perturbed(spark, sf_dir), local_finish_edges=0
    ).select("id", "group_id", "is_dup")


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-crawl-vs-seen-corpus novelty with the distributed Bloom
    prefilter ON (operators/dedup.incremental_new_docs): seen =
    documents; new batch = exact copies (+100000, all dropped) union
    first-word-truncated copies (+200000, all novel). The oracle is a
    plain sha256 anti-join — Bloom false positives are re-verified so
    the filter must never change values, and zero false negatives is
    structural (a clear bit proves unseen)."""
    from easyner_spark.operators.dedup import incremental_new_docs

    d = _docs(spark, sf_dir)
    new = d.select((F.col("doc_id") + 100000).alias("doc_id"), "text").unionByName(
        d.select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    return incremental_new_docs(new, d.select("doc_id", "text"))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.similarity import brute_force_topk

    return brute_force_topk(_emb(spark, sf_dir), k=10).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine"
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easyner_spark.operators.similarity import lsh_topk

    return lsh_topk(_emb(spark, sf_dir), k=10).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine"
    )


def q_ann_topk_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path of exact top-k (VERDICT r1 fix #1): block-partitioned
    matmul over packed chunks, no driver-side corpus collect. Same
    oracle as ann_topk — the two paths must agree value-for-value.
    block_size below the 500-row tier forces a real multi-block run."""
    from easyner_spark.operators.similarity import brute_force_topk_blocked

    return brute_force_topk_blocked(_emb(spark, sf_dir), k=10, block_size=128).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine"
    )


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): IVF-cell clustering + within-cell
    cosine pruning — one row per vector with its cell, the smallest
    near-duplicate cell-mate (dup_of, NULL if unique at >= 0.3), and
    the kept flag. The semantic-dedup counterpart of minhash (lexical)
    and emb_neardup (pairwise): never all-pairs, quadratic only
    within corpus/n_centroids-sized cells."""
    from easyner_spark.operators.similarity import semdedup

    return semdedup(_emb(spark, sf_dir), threshold=0.3)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: deterministic md5-ranked centroids, argmax-cosine
    cell assignment (pure JVM array_max), nprobe-cell candidates, exact
    re-rank. The oracle rebuilds the identical quantizer in SQL."""
    from easyner_spark.operators.similarity import ivf_topk

    return ivf_topk(_emb(spark, sf_dir), k=10).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine"
    )


def q_ann_ivf_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ivf_topk with a PRE-TRAINED centroid list (train_ivf_centroids
    -> ivf_topk(centroids=...)): the repeat-query amortization path —
    training runs once per corpus snapshot, queries skip the Lloyd
    assignment jobs entirely. Values must equal the self-training
    refine_iters=0 path exactly, so it shares ann_ivf_topk's oracle
    SQL verbatim."""
    from easyner_spark.operators.similarity import ivf_topk, train_ivf_centroids

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(emb, refine_iters=0)
    return ivf_topk(emb, k=10, centroids=cents).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine"
    )


def q_ann_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN: symmetric integer-dot ranking over int8-
    style affine codes — the bandwidth leg of the ANN suite (8x fewer
    bytes than float64, integer math, zero floats emitted). The oracle
    rebuilds the identical quantizer in SQL (similarity.sq_topk)."""
    from easyner_spark.operators.similarity import sq_topk

    return sq_topk(_emb(spark, sf_dir), k=10)


def q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default near-dup path is now sign-LSH bucketed (VERDICT r1 fix
    #4): one equi-join shuffle on the 4-bit bucket key; the oracle
    reproduces the same deterministic buckets in SQL."""
    from easyner_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(_emb(spark, sf_dir), threshold=0.3).select(
        "a", "b", "cosine"
    )


def q_emb_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit O(n^2) verification twin (n_bits=0)."""
    from easyner_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _emb(spark, sf_dir), threshold=0.3, n_bits=0
    ).select("a", "b", "cosine")


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: documents' text bytes as an opaque media
    blob -> mapInPandas fake decoder -> typed metadata (the Spark-side
    schema/batch plumbing is real; the codec is a deterministic stub,
    see operators/multimodal.py)."""
    from easyner_spark.operators.multimodal import decode_media

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
    )
    out = decode_media(media)
    return out.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "content_sha",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        "codec",
    )


def q_media_meta_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decoding (engine='headers'): wrap each document's
    text as a P6 PPM with deterministic dimensions and parse the header
    back. The oracle recomputes dimensions/size/sha in SQL."""
    from easyner_spark.operators.multimodal import decode_media

    docs = _docs(spark, sf_dir)
    w = F.pmod(F.col("doc_id"), F.lit(1000)) + 1
    h = F.pmod(F.col("doc_id"), F.lit(77)) + 1
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(
            F.concat(
                F.lit("P6\n"),
                w.cast("string"),
                F.lit(" "),
                h.cast("string"),
                F.lit("\n255\n"),
                F.col("text"),
            ),
            "UTF-8",
        ).alias("content"),
    )
    out = decode_media(media, engine="headers")
    return out.select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "content_sha",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "codec",
    )


def q_boilerplate_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADVERSARIAL (non-identity) extraction oracle (VERDICT r2 #7).

    Each document's text is wrapped in HTML where correct extraction
    must CHANGE the input — a trivial "return the input" extractor
    cannot pass:

      - a kept ``<h1>Doc {id}</h1>`` headline block the extractor must
        EMIT (absent from documents.text);
      - nested boilerplate INSIDE the kept ``<p>`` block: a mid-
        paragraph ``<script>`` and a trailing ``<aside>`` rail that
        must be REMOVED without splitting the block, plus a ``PRE-``
        prefix so the kept block is not bytewise equal to the input;
      - the usual dropped envelope (head/style, nav, a link-dense
        related-links div, footer).

    Expected output (computed independently by the DuckDB oracle):
    ``'Doc ' || doc_id || '\\n' || 'PRE-' || text``."""
    from easyner_spark.operators.boilerplate import extract_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>t</title><style>p{}</style></head>"
                      "<body><nav>home | about | subscribe</nav>"
                      "<h1>Doc "),
                F.col("doc_id").cast("string"),
                F.lit("</h1><p>PRE-<script>var x=1;</script>"),
                F.col("text"),
                F.lit("<aside>share | print</aside></p>"
                      "<div><a href='/1'>rel one</a> <a href='/2'>rel two</a></div>"
                      "<footer>(c) crawl</footer></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    out = extract_text(pages)
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("extracted").alias("text"),
    )


def q_pubmed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADVERSARIAL (non-identity) S2-parser oracle (VERDICT r2 #7).

    Each document's text becomes the FIRST of three labeled
    AbstractText sections in a PubMed baseline envelope; the real
    parser (sources/pubmed.py, reference scripts/pubmed_bulk.py:
    108-139) must:

      - join non-empty sections with a single space, SKIPPING the
        empty ``Label="METHODS"`` section;
      - NOT inject the Label attributes into the text;
      - flatten inline markup (``Conc<i>lusion</i>`` -> Conclusion,
        stringify_children semantics);
      - round-trip XML-escaped metachars in the document text.

    Expected output (computed independently by the DuckDB oracle):
    ``text || ' Conclusion S-' || doc_id`` — identity cannot pass."""
    import pandas as pd

    from easyner_spark.sources.pubmed import PUBMED_SCHEMA, parse_pubmed_xml_bytes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    xml = docs.select(
        F.encode(
            F.concat(
                F.lit(
                    "<PubmedArticleSet><PubmedArticle><MedlineCitation><PMID>"
                ),
                F.col("doc_id").cast("string"),
                F.lit(
                    "</PMID><Article><Journal><JournalIssue><PubDate>"
                    "<Year>2024</Year></PubDate></JournalIssue></Journal>"
                    "<ArticleTitle>t</ArticleTitle><Abstract>"
                    '<AbstractText Label="BACKGROUND" NlmCategory="BACKGROUND">'
                ),
                F.replace(
                    F.replace(
                        F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                        F.lit("<"),
                        F.lit("&lt;"),
                    ),
                    F.lit(">"),
                    F.lit("&gt;"),
                ),
                F.lit(
                    "</AbstractText>"
                    '<AbstractText Label="METHODS"></AbstractText>'
                    '<AbstractText Label="CONCLUSIONS">Conc<i>lusion</i> S-'
                ),
                F.col("doc_id").cast("string"),
                F.lit(
                    "</AbstractText></Abstract></Article>"
                    "</MedlineCitation></PubmedArticle></PubmedArticleSet>"
                ),
            ),
            "UTF-8",
        ).alias("blob")
    )

    def gen(batches):
        cols = [
            "pmid", "title", "abstract", "mesh_terms",
            "pubdate", "chemical_list", "file_num",
        ]
        for pdf in batches:
            rows = []
            for blob in pdf["blob"]:
                rows.extend(parse_pubmed_xml_bytes(bytes(blob), 0))
            yield pd.DataFrame(rows, columns=cols)

    parsed = xml.mapInPandas(gen, PUBMED_SCHEMA)
    return parsed.select(
        F.col("pmid").cast("long").alias("doc_id"),
        F.col("abstract").alias("text"),
    )


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADVERSARIAL WARC-ingestion oracle (sources/warc.py — the
    Common-Crawl-style front of the pages table; loader shape mirrors
    sources/pubmed.py / reference scripts/pubmed_bulk.py:108-139).

    Each document becomes a three-record WARC/1.0 segment built in
    pure SQL expressions — warcinfo + request + response — and the
    real parser must:

      - skip the warcinfo and request records (WARC-Type gate), while
        still honoring THEIR Content-Length headers exactly (the
        request record's length varies with the url, so any boundary
        drift corrupts the response record that follows);
      - cut the response record by Content-Length, NOT by scanning
        for blank lines: the html body embeds a ``\\r\\n\\r\\nWARC/1.0``
        decoy that defeats delimiter-scanning parsers;
      - count OCTETS, not characters (the body carries a multi-byte
        'é'), read the status from the HTTP status line (doc_id%7==0
        pages are 404) and the mime from Content-Type before ';'.

    Expected output computed independently by the DuckDB oracle in
    closed form — identity cannot pass."""
    import pandas as pd

    from easyner_spark.sources.warc import WARC_SCHEMA, parse_warc_bytes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("https://example.com/d/"), F.col("doc_id").cast("string")).alias("u"),
        F.concat(
            F.lit("2024-01-01T00:00:"),
            F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
            F.lit("Z"),
        ).alias("dt"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(404)).otherwise(F.lit(200)).alias("st"),
        F.concat(
            F.lit("<html><body>\r\n\r\nWARC/1.0 decoy\r\n<p>é "),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("body"),
    )

    def rec(wtype: str, uri, payload, ctype: str):
        return F.concat(
            F.lit(f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: "),
            uri,
            F.lit("\r\nWARC-Date: "),
            F.col("dt"),
            F.lit(f"\r\nContent-Type: {ctype}\r\nContent-Length: "),
            F.octet_length(payload).cast("string"),
            F.lit("\r\n\r\n"),
            payload,
            F.lit("\r\n\r\n"),
        )

    http = F.concat(
        F.lit("HTTP/1.1 "),
        F.col("st").cast("string"),
        F.lit(" OK\r\nContent-Type: text/html; charset=UTF-8\r\nContent-Length: "),
        F.octet_length("body").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("body"),
    )
    reqp = F.concat(F.lit("GET "), F.col("u"), F.lit(" HTTP/1.1\r\nHost: x\r\n\r\n"))
    blob = F.concat(
        rec("warcinfo", F.lit("urn:info"), F.lit("software: test\r\n"), "application/warc-fields"),
        rec("request", F.col("u"), reqp, "application/http; msgtype=request"),
        rec("response", F.col("u"), http, "application/http; msgtype=response"),
    )
    seg = d.select(F.encode(blob, "UTF-8").alias("blob"))

    def gen(batches):
        cols = ["url", "warc_date", "status", "mime", "html"]
        for pdf in batches:
            rows = []
            for b in pdf["blob"]:
                rows.extend(parse_warc_bytes(bytes(b)))
            yield pd.DataFrame(rows, columns=cols)

    parsed = seg.mapInPandas(gen, WARC_SCHEMA)
    return parsed.select(
        F.regexp_extract("url", r"d/(\d+)", 1).cast("long").alias("doc_id"),
        "url",
        "warc_date",
        "status",
        "mime",
        F.decode(F.col("html"), "UTF-8").alias("body_text"),
    )


def q_craft_iob2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAFT pubannotator -> IOB2 converter (sources/craft.py; reference
    supplementary/experiment_scripts/CRAFT_preprocessing_spacy.py:20-84)
    over a closed-form adversarial corpus: per document the text is
    ``T{id} binds protein X34 in vivo , strongly .`` and the denotation
    list (in file order) exercises every converter quirk —

      d1 mid-token span inside 'protein'  -> expands to the whole token (B);
      d2 obj='_FRAGMENT'                  -> dropped;
      d3 span over 'protein'+'X34'        -> expanded start < pointer, SKIPPED;
      d4 span inside 'X34'                -> accepted after the skip (B);
      d5 'in vivo'                        -> multi-token B/I;
      d6 early span, late file position   -> out-of-order pointer skip;
      d7 'strongly .'                     -> trailing B/I across punctuation.

    Expected labels per doc: O O B B B I O B I — the oracle emits them
    in closed form (all spans are offsets relative to len('T'||id), so
    the oracle needs no char arithmetic)."""
    from easyner_spark.sources.craft import craft_to_iob2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    L = F.length(F.concat(F.lit("T"), F.col("doc_id").cast("string")))

    def den(i: int, obj: str, b: int, e: int):
        return F.struct(
            F.lit(f"d{i}").alias("id"),
            F.lit(obj).alias("obj"),
            F.struct(
                (L + F.lit(b)).cast("long").alias("begin"),
                (L + F.lit(e)).cast("long").alias("end"),
            ).alias("span"),
        )

    pa = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.lit("T"),
            F.col("doc_id").cast("string"),
            F.lit(" binds protein X34 in vivo , strongly ."),
        ).alias("text"),
        F.array(
            den(1, "PR", 8, 10),
            den(2, "_FRAGMENT", 1, 6),
            den(3, "CHEM", 9, 18),
            den(4, "GENE", 15, 17),
            den(5, "CELL", 19, 26),
            den(6, "OOO", 1, 5),
            den(7, "ADJ", 29, 39),
        ).alias("denotations"),
    )
    out = craft_to_iob2(pa)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("tok_idx").cast("long").alias("tok_idx"),
        "token",
        "label",
    )


def q_flair_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flair 3-column prediction-file reader (operators/iob.
    parse_flair_lines; reference supplementary/experiment_scripts/
    Flair_prediction_evaluation.py:10-12) driven end-to-end through a
    REAL file: one 3-token sentence per document (sorted doc_id order,
    blank-line boundaries), written to /tmp (driver-side fixture
    generation — the collect is the fixture, not the operator), parsed
    back through the single-partition line reader. The oracle rebuilds
    (seq_id, tok_idx, token, label_true, label_pred) in closed form:
    seq_id = dense doc rank, tokens w{id}{a,b,c}, fixed gold/pred
    labels including a disagreement pair."""
    import os

    from easyner_spark.operators.iob import parse_flair_lines

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
    ]
    rows = [("a", "B-GENE", "B-GENE"), ("b", "I-GENE", "O"), ("c", "O", "B-CHEM")]
    lines = []
    for d in ids:
        lines.extend(f"w{d}{suf} {lt} {lp}" for suf, lt, lp in rows)
        lines.append("")
    path = f"/tmp/easyner_flair_parse_{len(ids)}_{ids[0]}_{ids[-1]}.txt"
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    out = parse_flair_lines(spark, path)
    return out.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("tok_idx").cast("long").alias("tok_idx"),
        "token",
        "label_true",
        "label_pred",
    )


def _kg_rules_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (src, dst) directed edge set of the designed rule KG
    (no self loops) — the shared graph under the path-query fixtures."""
    t = _kg_rules_triples(spark, sf_dir)
    return (
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_kg_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark BFS distances (GraphFrames shortestPaths contract)
    over the rule-KG edge set: every node's directed hop distance to
    landmarks n0/n5 within 3 hops — reverse frontier expansion, first
    arrival is minimal, hop counts exact BIGINT."""
    from easyner_spark.operators.graph import shortest_paths

    return shortest_paths(
        _kg_rules_edges(spark, sf_dir), ("n0", "n5"), k=3
    )


def q_kg_paths_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded simple-path enumeration ("how is X connected to Y"):
    every <=3-hop cycle-free directed path from n1/n2 into n0/n3 over
    the rule KG, the full hop sequence spelled out as 'a>b>c' — the
    provenance view a KG consumer shows next to an inferred edge."""
    from easyner_spark.operators.graph import kg_paths

    return kg_paths(
        _kg_rules_edges(spark, sf_dir),
        sources=("n1", "n2"),
        targets=("n0", "n3"),
        max_len=3,
    )


def q_kg_schema_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-level quotient of the rule KG (person/place/org residue
    types, n7 untyped -> 'unknown'): every (subj_type, pred, obj_type)
    cell with exact edge and distinct-participant counts — the schema
    summary and BGP-planner statistics table."""
    from easyner_spark.operators.triples import schema_graph

    return schema_graph(
        _kg_rules_triples(spark, sf_dir), _kg_rules_types(spark, sf_dir)
    )


def q_kg_metapath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """works_for>located_in metapath composition over the rule KG:
    "entity connected to place via an employer", with the exact count
    of distinct intermediate instantiations as edge weight."""
    from easyner_spark.operators.triples import metapath_join

    return metapath_join(
        _kg_rules_triples(spark, sf_dir), ("works_for", "located_in")
    )


# Affiliation KG for PathSim: 40 persons across 7 companies of UNEQUAL
# size (p works_for c(p%7); every 5th person moonlights at c((p+3)%7))
# with employs as the exact inverse — off-diagonal peer pairs exist and
# double-affiliation persons get larger diagonals. One def per side.
_KG_AFFIL_SQL = """WITH affil_p AS (
  SELECT DISTINCT doc_id % 40 AS x FROM documents
)
SELECT 'p' || x AS subj, 'works_for' AS pred, 'c' || (x % 7) AS obj
  FROM affil_p
UNION ALL
SELECT 'c' || (x % 7), 'employs', 'p' || x FROM affil_p
UNION ALL
SELECT 'p' || x, 'works_for', 'c' || ((x + 3) % 7) FROM affil_p
  WHERE x % 5 = 0
UNION ALL
SELECT 'c' || ((x + 3) % 7), 'employs', 'p' || x FROM affil_p
  WHERE x % 5 = 0"""


def _kg_affil_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subj, pred, obj) twin of _KG_AFFIL_SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = d.select((F.col("doc_id") % 40).alias("x")).distinct()
    px = F.concat(F.lit("p"), F.col("x").cast("string"))
    c1 = F.concat(F.lit("c"), (F.col("x") % 7).cast("string"))
    c2 = F.concat(F.lit("c"), ((F.col("x") + 3) % 7).cast("string"))
    moon = p.where(F.col("x") % 5 == 0)
    return (
        p.select(px.alias("subj"), F.lit("works_for").alias("pred"), c1.alias("obj"))
        .unionByName(
            p.select(c1.alias("subj"), F.lit("employs").alias("pred"), px.alias("obj"))
        )
        .unionByName(
            moon.select(
                px.alias("subj"), F.lit("works_for").alias("pred"), c2.alias("obj")
            )
        )
        .unionByName(
            moon.select(
                c2.alias("subj"), F.lit("employs").alias("pred"), px.alias("obj")
            )
        )
    )


def q_kg_pathsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PathSim peer similarity under the symmetric works_for>employs
    metapath over the affiliation KG (employs is works_for's exact
    inverse; unequal company sizes + double affiliations make the
    normalization bite) — micro-unit floors, each unordered pair once."""
    from easyner_spark.operators.triples import metapath_pathsim

    return metapath_pathsim(
        _kg_affil_triples(spark, sf_dir), ("works_for", "employs")
    )


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url recrawl scheduling (change rate x staleness, Cho-style)
    over the 5-fetch synthetic recrawl history crawl_delta uses —
    all-BIGINT rates and priorities."""
    from easyner_spark.operators.webtext import recrawl_schedule

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://site"), (did % 100).cast("string"), F.lit(".example.net/p")
    )
    text = F.concat(
        F.lit("page content "),
        (did % 100).cast("string"),
        F.when(did % 7 < 2, F.lit(" v2")).otherwise(F.lit("")),
    )
    pages = d.select(
        url.alias("url"),
        (F.lit(1700000000) + did).cast("long").alias("warc_ts"),
        text.alias("text"),
    )
    return recrawl_schedule(pages)


def q_kg_ego(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop ego subgraph around n0/n5 over the rule KG: the induced
    edge set whose endpoints both lie within 2 undirected hops of a
    seed — one BFS + two broadcast semi-joins."""
    from easyner_spark.operators.graph import ego_subgraph

    return ego_subgraph(_kg_rules_edges(spark, sf_dir), ("n0", "n5"), k=2)


def _kg_ego_oracle() -> str:
    """q_kg_ego oracle: rule-KG edges through the operator's
    recursive-BFS twin."""
    from easyner_spark.operators.graph import ego_subgraph_oracle_sql

    prefix = f"""WITH RECURSIVE kgrE AS ({_KG_RULES_SQL}),
egoE AS (SELECT DISTINCT subj AS a, obj AS b FROM kgrE WHERE subj <> obj)"""
    return ego_subgraph_oracle_sql(prefix, ("n0", "n5"), k=2)


# Epoch-stamped functional-conflict fixture: 10 subjects x 4 objects
# across 3 epochs, predicate split by parity. One definition per side.
_TFV_SQL = """SELECT 's' || (doc_id % 10) AS subj,
  CASE WHEN doc_id % 2 = 0 THEN 'capital_of' ELSE 'id_of' END AS pred,
  'o' || (doc_id % 4) AS obj,
  doc_id % 3 AS epoch
  FROM documents"""


def _tfv_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subj, pred, obj, epoch) twin of _TFV_SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    return d.select(
        F.concat(F.lit("s"), (did % 10).cast("string")).alias("subj"),
        F.when(did % 2 == 0, F.lit("capital_of"))
        .otherwise(F.lit("id_of"))
        .alias("pred"),
        F.concat(F.lit("o"), (did % 4).cast("string")).alias("obj"),
        (did % 3).alias("epoch"),
    )


def q_kg_temporal_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch functional conflicts: capital_of (functional) and
    id_of (inverse-functional) violations WITHIN each crawl epoch —
    the extraction-error feed an incremental-KG ingest reviews, as
    opposed to cross-epoch change (edge_history's status)."""
    from easyner_spark.operators.triples import (
        temporal_functional_violations,
    )

    return temporal_functional_violations(
        _tfv_triples(spark, sf_dir),
        [("capital_of", "functional"), ("id_of", "inverse_functional")],
    )


def _kg_temporal_conflicts_oracle() -> str:
    """q_kg_temporal_conflicts oracle: the epoch-stamped synthesis
    through the operator's module-local twin."""
    from easyner_spark.operators.triples import (
        temporal_functional_violations_oracle_sql,
    )

    return temporal_functional_violations_oracle_sql(
        _TFV_SQL,
        [("capital_of", "functional"), ("id_of", "inverse_functional")],
    )


def q_kg_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full core-number decomposition (k_max=3) of the rule KG's
    undirected projection — nested peels, each on the previous core's
    reduced edge set; the graph-ML coreness tier feature."""
    from easyner_spark.operators.graph import core_numbers

    return core_numbers(_kg_rules_edges(spark, sf_dir), k_max=3)


def _kg_core_numbers_oracle() -> str:
    """q_kg_core_numbers oracle: stacked unrolled peels over the
    canonical undirected rule-KG pairs."""
    from easyner_spark.operators.graph import core_numbers_oracle_sql

    prefix = f"""WITH kgrE AS ({_KG_RULES_SQL}),
cnE AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
        FROM kgrE WHERE subj <> obj)"""
    return core_numbers_oracle_sql(prefix, k_max=3)


_KG_WHEN_PATTERNS = [("?x", "p", "?y"), ("?y", "q", "?z")]

# Epoch-stamped chain fixture: 6 entities on a shifted cycle, three
# predicates by doc residue, epochs 0-3 — p's objects and q's
# subjects overlap so the chain binds. One definition per side.
_KG_WHEN_SQL = """SELECT 'e' || (doc_id % 6) AS subj,
  CASE doc_id % 3 WHEN 0 THEN 'p' WHEN 1 THEN 'q' ELSE 'r' END AS pred,
  'e' || ((doc_id + 1) % 6) AS obj,
  doc_id % 4 AS epoch
  FROM documents"""


def _kg_when_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subj, pred, obj, epoch) twin of _KG_WHEN_SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    return d.select(
        F.concat(F.lit("e"), (did % 6).cast("string")).alias("subj"),
        F.when(did % 3 == 0, F.lit("p"))
        .when(did % 3 == 1, F.lit("q"))
        .otherwise(F.lit("r"))
        .alias("pred"),
        F.concat(F.lit("e"), ((did + 1) % 6).cast("string")).alias("obj"),
        (did % 4).alias("epoch"),
    )


def q_kg_standing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing-query matching over the epoch-stamped triple stream:
    bindings of the p/q chain plus the first epoch at which the WHOLE
    binding held (greatest of per-triple first assertions, min over
    join witnesses) — `first_epoch = e` IS the per-epoch delta feed
    an incremental KG alerts on."""
    from easyner_spark.operators.triples import match_patterns_when

    return match_patterns_when(
        _kg_when_triples(spark, sf_dir),
        _KG_WHEN_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
    )


def _kg_standing_query_oracle() -> str:
    """q_kg_standing_query oracle: the epoch-stamped synthesis through
    the operator's rolled-min + greatest twin."""
    from easyner_spark.operators.triples import (
        match_patterns_when_oracle_sql,
    )

    return match_patterns_when_oracle_sql(
        _KG_WHEN_SQL, _KG_WHEN_PATTERNS, subj="subj", pred="pred", obj="obj"
    )


def q_emb_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift across synthetic crawl epochs
    (vec_id % 4): cosine between consecutive epoch mean embeddings —
    micro-quantized BIGINT centroids, one (epoch, dim) rollup, float
    only in the final round(·,6) cosine."""
    from easyner_spark.operators.similarity import embedding_drift

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_drift(
        e.select((F.col("vec_id") % 4).alias("epoch"), "embedding")
    )


def _emb_drift_oracle() -> str:
    """q_emb_drift oracle: the epoch stamping through the operator's
    module-local twin."""
    from easyner_spark.operators.similarity import embedding_drift_oracle_sql

    return embedding_drift_oracle_sql(
        "SELECT vec_id % 4 AS epoch, embedding FROM embeddings"
    )


def q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (k=6) over the embeddings table —
    farthest-point traversal on exact milli-quantized BIGINT squared
    distances; the diversity sampler (one exemplar per far mode) next
    to sampling's distribution-preserving gates. The driver list is
    k rows (bounded-collect class) re-framed for the value check."""
    from easyner_spark.operators.similarity import kcenter_select

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sel = kcenter_select(e, k=6)
    return spark.createDataFrame(
        [(int(r), int(i), int(d)) for r, i, d in sel],
        "rank long, id long, radius_q2 long",
    )


def _kcenter_oracle() -> str:
    """q_kcenter oracle: unrolled greedy stages over the same table."""
    from easyner_spark.operators.similarity import kcenter_select_oracle_sql

    return kcenter_select_oracle_sql(
        "SELECT vec_id AS id, embedding FROM embeddings", k=6
    )


_B3_ASSIGN_SQL = """SELECT 'r' || doc_id AS r,
  'p' || (doc_id % 20) AS p, 'g' || (doc_id % 25) AS g
  FROM documents"""


def q_bcubed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed clustering evaluation of a deterministic residue
    clustering (predicted mod-20 vs gold mod-25 clusters — partial
    systematic overlap) — per-record micro-floor ratios, group-size
    arithmetic only, no pairwise join."""
    from easyner_spark.operators.dedup import bcubed_quality

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    a = d.select(
        F.concat(F.lit("r"), did.cast("string")).alias("record"),
        F.concat(F.lit("p"), (did % 20).cast("string")).alias("pred_cluster"),
        F.concat(F.lit("g"), (did % 25).cast("string")).alias("gold_cluster"),
    )
    return bcubed_quality(a)


def _bcubed_oracle() -> str:
    """q_bcubed oracle: the assignment synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.dedup import bcubed_quality_oracle_sql

    return bcubed_quality_oracle_sql(_B3_ASSIGN_SQL)


# Blocking-evaluation fixture: records are the documents themselves;
# gold duplicate pairs are (d, d+1) for doc_id % 4 = 0, the "blocker"
# under evaluation recalls half of gold (doc_id % 8 = 0) and adds
# (d, d+2) noise pairs for doc_id % 5 = 0. One definition per side.
_BQ_GOLD_SQL = """SELECT 'd' || doc_id AS a, 'd' || (doc_id + 1) AS b
  FROM documents WHERE doc_id % 4 = 0"""
_BQ_CAND_SQL = """SELECT 'd' || doc_id AS a, 'd' || (doc_id + 1) AS b
  FROM documents WHERE doc_id % 8 = 0
  UNION ALL
  SELECT 'd' || (doc_id + 2) AS a, 'd' || doc_id AS b
  FROM documents WHERE doc_id % 5 = 0"""


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER-blocking evaluation (Christen's pairs-completeness / pairs-
    quality / reduction-ratio triple) of a deterministic half-recall
    blocker against designed gold duplicate pairs — all-BIGINT
    micro-unit floors, the tuning harness for every LSH/blocking
    candidate generator in operators/dedup."""
    from easyner_spark.operators.dedup import blocking_quality

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    dd = lambda c: F.concat(F.lit("d"), c.cast("string"))  # noqa: E731
    gold = d.where(did % 4 == 0).select(
        dd(did).alias("a"), dd(did + 1).alias("b")
    )
    cand = d.where(did % 8 == 0).select(
        dd(did).alias("a"), dd(did + 1).alias("b")
    ).unionByName(
        d.where(did % 5 == 0).select(
            dd(did + 2).alias("a"), dd(did).alias("b")
        )
    )
    return blocking_quality(cand, gold, n_records=d.count())


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> sentences -> dictionary NER -> ranked entity
    frequency top-50 (the reference pipeline's main output,
    reference README.md:71; scripts/analysis.py:40-80)."""
    from easyner_spark.operators.analysis import entity_frequency, top_n

    sf_dir = "/root/testdata/sf0.001"
    freq = entity_frequency(_mentions(spark, sf_dir), mention_col="mention_lc")
    return top_n(freq, 50)


# The external driver value-checks the FIRST 50 registry entries (in
# dict order) against the DuckDB oracles; the full 217 run locally via
# tools/check_oracle.py. Lead the registry with this round's touched
# operators and the riskiest recent additions so the driver's window
# covers them (VERDICT r3 #4); everything else keeps its historical
# order behind them. queries() and oracle_sql() reorder identically,
# so the 1:1 key contract is unaffected.
_DRIVER_WINDOW_FIRST = [
    # --- round 5 window: the new FILTER query, then the oldest
    # never-driver-verified registry queries (VERDICT r4 #1 —
    # close the external ledger; the driver checks the FIRST 50) ---
    "kg_pattern_filter", "kg_pattern_agg", "kg_pattern_topk",
    "dsir_weights", "dsir_sample", "semdedup", "kappa",
    "host_topics",
    "kg_link_predict",
    "kg_kcore", "heavy_hitters", "kg_wl_labels", "kg_edge_history",
    "pack_sequences", "length_quantiles", "bpe_merges", "bpe_token_counts",
    "bpe_encode", "tokenized_pack", "host_stats", "url_dedup",
    "resolve_redirects", "robots_rules", "html_meta", "entity_bursts",
    "kg_random_walks", "walk_skipgrams", "kg_degree_stats", "kg_pattern",
    "kg_violations", "host_templates", "template_strip", "kg_rank_eval",
    "kg_rank_summary", "bitext", "mirror_hosts", "url_equivalence",
    "containment", "html_tables", "infobox", "host_spam", "opengraph",
    "feed_items", "crawl_frontier", "jsonld", "breadcrumbs",
    "breadcrumb_edges", "soft404", "section_lists", "list_memberships",
    "meta_refresh", "page_entities", "sameas", "sameas_entities",
    "pagination",
    # --- remaining never-driver-verified (orders the tail so any
    # wider driver window keeps covering unchecked queries first) ---
    "series_text", "surface_profile", "robots_sitemaps", "readability",
    "url_templates", "template_cap", "edge_evidence", "edge_temporal",
    "edge_negation", "edge_confidence", "acronyms", "quotes", "numeric_facts",
    "headings", "html_lists", "ntriples", "entity_labels", "social",
    "contacts", "geo", "copula_isa", "apposition", "mined_taxonomy",
    "sitemap_index", "declarations", "definitions", "host_langs",
    "definition_edges", "amp_fold", "jsonld_fields", "anchor_rels",
    "compaction_plan", "lang_quantiles", "alias_candidates", "seed_expansion",
    "ner_examples", "doc_links", "surt_index", "page_rank", "eval_split",
    "robots_parse", "sitemap_urls", "meta_robots", "hreflang_clusters",
    "kg_node_profile", "stale_pages", "latest_crawl", "host_graph",
    "host_reciprocity", "quality_sample", "host_rank", "host_hits",
    "anchor_terms", "crawl_delta", "crawl_priority", "name_match",
    "fuzzy_link", "topic_id", "repeated_spans", "chunk_docs", "url_blocklist",
    "mixture_sample", "deterministic_sample", "per_host_cap",
    "word_repetition", "gopher_filters", "mojibake", "link_density",
    "paragraph_langs", "pii_redact", "corpus_summary", "inverted_index",
    "tfidf_sim", "label_centroids", "distinct_count", "length_histogram",
    "sessionize", "asof_join", "event_rollup", "bm25_rank", "winnow_fps",
    "winnow_dedup", "fuzzy_dedup_groups", "incremental_dedup",
    "decontaminate", "ann_sq_topk", "warc_extract", "craft_iob2",
    "flair_parse",
]


def _prioritize(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_WINDOW_FIRST if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritize({
        "split_sentences": q_split_sentences,
        "dict_ner": q_dict_ner,
        "entity_frequency": q_entity_frequency,
        "entity_frequency_batched": q_entity_frequency_batched,
        "link_entities": q_link_entities,
        "disambiguate": q_disambiguate,
        "triples": q_triples,
        "predicate_triples": q_predicate_triples,
        "edges": q_edges,
        "fuse_claims": q_fuse_claims,
        "predicate_cardinality": q_predicate_cardinality,
        "entity_salience": q_entity_salience,
        "host_cocitation": q_host_cocitation,
        "entity_types": q_entity_types,
        "isa_closure": q_isa_closure,
        "search_sentences": q_search_sentences,
        "search_mentions": q_search_mentions,
        "doc_offsets": q_doc_offsets,
        "term_freq_per_doc": q_term_freq_per_doc,
        "resolve_conflicts": q_resolve_conflicts,
        "span_eval": q_span_eval,
        "merger_v1_nested": q_merger_v1_nested,
        "co_occurrence": q_co_occurrence,
        "error_regions": q_error_regions,
        "components": q_components,
        "incremental_components": q_incremental_components,
        "k_hop": q_k_hop,
        "kg_pmi": q_kg_pmi,
        "kg_pagerank": q_kg_pagerank,
        "kg_ppr": q_kg_ppr,
        "kg_triangles": q_kg_triangles,
        "kg_communities": q_kg_communities,
        "kg_clustering": q_kg_clustering,
        "kg_modularity": q_kg_modularity,
        "kg_snapshot_diff": q_kg_snapshot_diff,
        "host_trust": q_host_trust,
        "doc_keywords": q_doc_keywords,
        "kg_assortativity": q_kg_assortativity,
        "entity_merge_cands": q_entity_merge_cands,
        "host_wrank": q_host_wrank,
        "kwic": q_kwic,
        "citations": q_citations,
        "dates": q_dates,
        "kg_window_cooc": q_kg_window_cooc,
        "kg_harmonic": q_kg_harmonic,
        "microdata": q_microdata,
        "unescape_text": q_unescape_text,
        "host_scc": q_host_scc,
        "pronoun_links": q_pronoun_links,
        "passive_triples": q_passive_triples,
        "nominal_triples": q_nominal_triples,
        "kappa": q_kappa,
        "host_topics": q_host_topics,
        "kg_link_predict": q_kg_link_predict,
        "kg_kcore": q_kg_kcore,
        "heavy_hitters": q_heavy_hitters,
        "kg_wl_labels": q_kg_wl_labels,
        "kg_edge_history": q_kg_edge_history,
        "pack_sequences": q_pack_sequences,
        "length_quantiles": q_length_quantiles,
        "bpe_merges": q_bpe_merges,
        "bpe_token_counts": q_bpe_token_counts,
        "bpe_encode": q_bpe_encode,
        "tokenized_pack": q_tokenized_pack,
        "host_stats": q_host_stats,
        "host_skew": q_host_skew,
        "url_dedup": q_url_dedup,
        "resolve_redirects": q_resolve_redirects,
        "robots_rules": q_robots_rules,
        "html_meta": q_html_meta,
        "entity_bursts": q_entity_bursts,
        "kg_negatives": q_kg_negatives,
        "kg_rules": q_kg_rules,
        "kg_rule_preds": q_kg_rule_preds,
        "kg_pred_signatures": q_kg_pred_signatures,
        "kg_pred_equiv": q_kg_pred_equiv,
        "kg_type_infer": q_kg_type_infer,
        "kg_shortest_paths": q_kg_shortest_paths,
        "kg_paths": q_kg_paths_2hop,
        "kg_schema_graph": q_kg_schema_graph,
        "kg_metapath": q_kg_metapath,
        "kg_pathsim": q_kg_pathsim,
        "recrawl_schedule": q_recrawl_schedule,
        "kg_align": q_kg_align,
        "temp_mixture": q_temp_mixture,
        "kg_pattern_optional": q_kg_pattern_optional,
        "kg_property_path": q_kg_property_path,
        "kg_pattern_minus": q_kg_pattern_minus,
        "kg_pattern_values": q_kg_pattern_values,
        "kg_pattern_filter": q_kg_pattern_filter,
        "kg_pattern_agg": q_kg_pattern_agg,
        "kg_pattern_topk": q_kg_pattern_topk,
        "dsir_weights": q_dsir_weights,
        "dsir_sample": q_dsir_sample,
        "kg_pattern_union": q_kg_pattern_union,
        "blocking_quality": q_blocking_quality,
        "bcubed_quality": q_bcubed,
        "kg_ego": q_kg_ego,
        "kg_temporal_conflicts": q_kg_temporal_conflicts,
        "kg_core_numbers": q_kg_core_numbers,
        "kg_standing_query": q_kg_standing_query,
        "emb_drift": q_emb_drift,
        "kcenter_coreset": q_kcenter,
        "host_kmv": q_host_kmv,
        "kmv_set_ops": q_kmv_set_ops,
        "zorder_keys": q_zorder_keys,
        "entity_cards": q_entity_cards,
        "pred_support": q_pred_support,
        "kg_ntriples": q_kg_ntriples,
        "kg_shapes": q_kg_shapes,
        "length_drift": q_length_drift,
        "kg_random_walks": q_kg_random_walks,
        "walk_skipgrams": q_walk_skipgrams,
        "kg_degree_stats": q_kg_degree_stats,
        "kg_pattern": q_kg_pattern,
        "kg_violations": q_kg_violations,
        "host_templates": q_host_templates,
        "template_strip": q_template_strip,
        "kg_rank_eval": q_kg_rank_eval,
        "kg_rank_summary": q_kg_rank_summary,
        "bitext": q_bitext,
        "mirror_hosts": q_mirror_hosts,
        "url_equivalence": q_url_equivalence,
        "containment": q_containment,
        "html_tables": q_html_tables,
        "infobox": q_infobox,
        "host_spam": q_host_spam,
        "opengraph": q_opengraph,
        "feed_items": q_feed_items,
        "crawl_frontier": q_crawl_frontier,
        "jsonld": q_jsonld,
        "breadcrumbs": q_breadcrumbs,
        "breadcrumb_edges": q_breadcrumb_edges,
        "soft404": q_soft404,
        "section_lists": q_section_lists,
        "list_memberships": q_list_memberships,
        "meta_refresh": q_meta_refresh,
        "page_entities": q_page_entities,
        "sameas": q_sameas,
        "sameas_entities": q_sameas_entities,
        "pagination": q_pagination,
        "series_text": q_series_text,
        "surface_profile": q_surface_profile,
        "robots_sitemaps": q_robots_sitemaps,
        "readability": q_readability,
        "url_templates": q_url_templates,
        "template_cap": q_template_cap,
        "edge_evidence": q_edge_evidence,
        "edge_temporal": q_edge_temporal,
        "edge_negation": q_edge_negation,
        "edge_confidence": q_edge_confidence,
        "acronyms": q_acronyms,
        "quotes": q_quotes,
        "numeric_facts": q_numeric_facts,
        "headings": q_headings,
        "html_lists": q_html_lists,
        "ntriples": q_ntriples,
        "entity_labels": q_entity_labels,
        "social": q_social,
        "contacts": q_contacts,
        "geo": q_geo,
        "copula_isa": q_copula_isa,
        "apposition": q_apposition,
        "mined_taxonomy": q_mined_taxonomy,
        "sitemap_index": q_sitemap_index,
        "declarations": q_declarations,
        "definitions": q_definitions,
        "host_langs": q_host_langs,
        "definition_edges": q_definition_edges,
        "amp_fold": q_amp_fold,
        "jsonld_fields": q_jsonld_fields,
        "anchor_rels": q_anchor_rels,
        "compaction_plan": q_compaction_plan,
        "lang_quantiles": q_lang_quantiles,
        "alias_candidates": q_alias_candidates,
        "seed_expansion": q_seed_expansion,
        "ner_examples": q_ner_examples,
        "doc_links": q_doc_links,
        "surt_index": q_surt_index,
        "page_rank": q_page_rank,
        "crawl_quota": q_crawl_quota,
        "eval_split": q_eval_split,
        "polite_quota": q_polite_quota,
        "robots_parse": q_robots_parse,
        "sitemap_urls": q_sitemap_urls,
        "meta_robots": q_meta_robots,
        "hreflang_clusters": q_hreflang_clusters,
        "kg_node_profile": q_kg_node_profile,
        "stale_pages": q_stale_pages,
        "latest_crawl": q_latest_crawl,
        "host_graph": q_host_graph,
        "host_reciprocity": q_host_reciprocity,
        "quality_sample": q_quality_sample,
        "host_rank": q_host_rank,
        "host_hits": q_host_hits,
        "anchor_terms": q_anchor_terms,
        "crawl_delta": q_crawl_delta,
        "paragraph_dedup": q_paragraph_dedup,
        "crawl_priority": q_crawl_priority,
        "name_match": q_name_match,
        "fuzzy_link": q_fuzzy_link,
        "topic_id": q_topic_id,
        "repeated_spans": q_repeated_spans,
        "chunk_docs": q_chunk_docs,
        "url_blocklist": q_url_blocklist,
        "mixture_sample": q_mixture_sample,
        "deterministic_sample": q_deterministic_sample,
        "per_host_cap": q_per_host_cap,
        "token_budget": q_token_budget,
        "word_repetition": q_word_repetition,
        "gopher_filters": q_gopher_filters,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "mojibake": q_mojibake,
        "link_density": q_link_density,
        "paragraph_langs": q_paragraph_langs,
        "pii_redact": q_pii_redact,
        "corpus_summary": q_corpus_summary,
        "inverted_index": q_inverted_index,
        "tfidf_sim": q_tfidf_sim,
        "textrank": q_textrank,
        "ppl_buckets": q_ppl_buckets,
        "fs_linkage": q_fs_linkage,
        "label_centroids": q_label_centroids,
        "distinct_count": q_distinct_count,
        "length_histogram": q_length_histogram,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "event_rollup": q_event_rollup,
        "bm25_rank": q_bm25_rank,
        "unigram_lm": q_unigram_lm,
        "bigram_lm": q_bigram_lm,
        "quality_classifier": q_quality_classifier,
        "exact_dedup": q_exact_dedup,
        "minhash_dedup": q_minhash_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash_dedup": q_simhash_dedup,
        "winnow_fps": q_winnow_fps,
        "winnow_dedup": q_winnow_dedup,
        "fuzzy_dedup_groups": q_fuzzy_dedup_groups,
        "incremental_dedup": q_incremental_dedup,
        "decontaminate": q_decontaminate,
        "ann_topk": q_ann_topk,
        "ann_sq_topk": q_ann_sq_topk,
        "ann_topk_blocked": q_ann_topk_blocked,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "semdedup": q_semdedup,
        "ann_ivf_cached": q_ann_ivf_cached,
        "emb_neardup": q_emb_neardup,
        "emb_neardup_exact": q_emb_neardup_exact,
        "media_meta": q_media_meta,
        "media_meta_headers": q_media_meta_headers,
        "boilerplate_extract": q_boilerplate_extract,
        "pubmed_extract": q_pubmed_extract,
        "warc_extract": q_warc_extract,
        "craft_iob2": q_craft_iob2,
        "flair_parse": q_flair_parse,
    })


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


# ---------------------------------------------------------------------------
# Oracle SQL for the training-data operators. Generated programmatically
# so the hash constants / marker lists / hyperplanes are shared verbatim
# with the Spark implementations (easyner_spark.operators.{textstats,
# dedup,similarity}). Float determinism: every double is produced by the
# same IEEE op sequence in both engines (sequential-fold dot products,
# int/int divisions, literal-weight blends) — verified bitwise in tests.
# ---------------------------------------------------------------------------


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _textstats_oracle() -> tuple[str, str]:
    from easyner_spark.operators.textstats import LANG_MARKERS, STOPWORDS_EN

    hits_cols = ",\n    ".join(
        f"len(list_filter(words, w -> list_contains({_sql_list(m)}, w))) AS hits_{lg}"
        for lg, m in sorted(LANG_MARKERS.items())
    )
    # Mirror the Spark when-chain: CJK wins, then codes ascending on ties.
    lang_case = (
        "CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' "
        + " ".join(
            f"WHEN hits_{lg} > 0 AND hits_{lg} = best THEN '{lg}'"
            for lg in sorted(LANG_MARKERS)
        )
        + " ELSE 'und' END"
    )
    feat = f"""
WITH base AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\\w+') AS words
  FROM documents
),
feat AS (
  SELECT doc_id, text, words,
    length(text) AS n_chars,
    len(words) AS n_words,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
    length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct,
    len(list_filter(words, w -> list_contains({_sql_list(STOPWORDS_EN)}, w))) AS n_stop,
    list_sum(list_transform(words, w -> length(w))) AS sum_wlen,
    {hits_cols}
  FROM base
),
feat2 AS (
  SELECT *,
    greatest(hits_de, hits_en, hits_es, hits_fr) AS best,
    CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0::DOUBLE END AS alpha_ratio,
    CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0::DOUBLE END AS punct_ratio,
    CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0::DOUBLE END AS stop_ratio,
    CASE WHEN n_words > 0 THEN sum_wlen / n_words ELSE 0.0::DOUBLE END AS mean_wlen
  FROM feat
)
"""
    stats = f"""{feat}
SELECT doc_id,
  n_chars::BIGINT AS n_chars,
  len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens_ws,
  len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))::BIGINT AS n_tokens_re,
  n_words::BIGINT AS n_words,
  round(alpha_ratio, 6) AS alpha_ratio,
  round(punct_ratio, 6) AS punct_ratio,
  round(stop_ratio, 6) AS stopword_ratio,
  round(mean_wlen, 6) AS mean_word_len,
  round(alpha_ratio * 0.4::DOUBLE + (1.0::DOUBLE - punct_ratio) * 0.3::DOUBLE
        + stop_ratio * 0.3::DOUBLE, 6) AS quality,
  {lang_case} AS lang_pred,
  CASE WHEN length(text) >= 8
    THEN list_min(list_transform(range(1, length(text) - 6),
                                 i -> md5(substr(text, i::INT, 8))))
    ELSE md5(text) END AS fingerprint
FROM feat2
"""
    langid = f"""{feat}
SELECT doc_id, {lang_case} AS lang_pred,
  hits_de::BIGINT AS hits_de, hits_en::BIGINT AS hits_en,
  hits_es::BIGINT AS hits_es, hits_fr::BIGINT AS hits_fr
FROM feat2
"""
    return stats, langid


def _dedup_oracles() -> dict[str, str]:
    from easyner_spark.operators.dedup import (
        BAND_ROWS,
        N_HASHES,
        SIMHASH_BITS,
        winnow_candidate_pairs_oracle_sql,
        winnow_fingerprints_oracle_sql,
    )

    # the SELECT twin of _docs_perturbed (ids +100000, first word
    # dropped) — shared by the winnowing oracles
    docs2_select = (
        "SELECT doc_id AS id, text FROM documents UNION ALL "
        "SELECT doc_id + 100000, substr(text, strpos(text, ' ') + 1)"
        " FROM documents"
    )
    winnow_fp_sql = winnow_fingerprints_oracle_sql(docs2_select).replace(
        "SELECT doc_id, pos, fp FROM wfp",
        "SELECT doc_id, pos::BIGINT AS pos, fp FROM wfp",
    )
    winnow_pair_sql = winnow_candidate_pairs_oracle_sql(docs2_select)

    n_bands = N_HASHES // BAND_ROWS
    docs2 = """
docs2 AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, substr(text, strpos(text, ' ') + 1) FROM documents
)"""
    sig_comps = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{i}|' || s)))" for i in range(N_HASHES)
    )
    band_hash = " || '|' || ".join(
        f"sig[({BAND_ROWS} * band_idx + {r + 1})::INT]" for r in range(BAND_ROWS)
    )
    eq_terms = " + ".join(f"(sig_a[{i + 1}] = sig_b[{i + 1}])::INT" for i in range(N_HASHES))
    band_list = "[" + ", ".join(str(j) for j in range(n_bands)) + "]"
    mh_prelude = f"""
WITH {docs2},
toks AS (SELECT id, regexp_extract_all(lower(text), '\\w+') AS toks FROM docs2),
sh AS (
  SELECT id, list_sort(list_distinct(
    CASE WHEN len(toks) >= 3
      THEN list_transform(range(0, len(toks) - 2),
             i -> toks[(i + 1)::INT] || ' ' || toks[(i + 2)::INT] || ' ' || toks[(i + 3)::INT])
      ELSE [array_to_string(toks, ' ')] END)) AS sh
  FROM toks
),
sig AS (SELECT id, [{sig_comps}] AS sig FROM sh),
bands AS (SELECT id, sig, unnest({band_list}) AS band_idx FROM sig),
bands2 AS (SELECT id, sig, band_idx, md5({band_hash}) AS band_hash FROM bands),
cand AS (
  SELECT DISTINCT a.id AS a, b.id AS b, a.sig AS sig_a, b.sig AS sig_b
  FROM bands2 a JOIN bands2 b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
)"""
    minhash = f"""{mh_prelude}
SELECT a, b, round(({eq_terms}) / {N_HASHES}, 6) AS est_jaccard FROM cand
"""
    jaccard = f"""{mh_prelude}
SELECT c.a, c.b,
  round(len(list_intersect(sa.sh, sb.sh))
        / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
FROM cand c JOIN sh sa ON c.a = sa.id JOIN sh sb ON c.b = sb.id
"""
    sum_cols = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN cnt ELSE -cnt END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    fp_expr = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    simhash = f"""
WITH {docs2},
toks AS (SELECT id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok FROM docs2),
cnt AS (SELECT id, tok, count(*) AS cnt FROM toks GROUP BY id, tok),
h AS (SELECT id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h, cnt FROM cnt),
sums AS (SELECT id, {sum_cols} FROM h GROUP BY id),
fp AS (SELECT id, ({fp_expr})::BIGINT AS simhash FROM sums),
bands AS (SELECT id, simhash, unnest([0, 1, 2, 3]) AS band_idx FROM fp),
bands2 AS (SELECT id, simhash, band_idx, (simhash >> (8 * band_idx)) & 255 AS band_val FROM bands),
pairs AS (
  SELECT DISTINCT a.id AS a, b.id AS b, a.simhash AS sa, b.simhash AS sb
  FROM bands2 a JOIN bands2 b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.id < b.id
)
SELECT a, b, bit_count(xor(sa, sb))::BIGINT AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
"""
    exact = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 500000, text FROM documents
),
h AS (SELECT doc_id, sha256(text) AS content_hash FROM docs2)
SELECT doc_id, content_hash,
  min(doc_id) OVER (PARTITION BY content_hash) AS canonical_id,
  doc_id <> min(doc_id) OVER (PARTITION BY content_hash) AS is_dup
FROM h
"""
    # Fuzzy-dedup groups: the same candidate CTEs, thresholded at the
    # rounded est_jaccard (the Spark side filters AFTER round(·, 6)),
    # then a recursive min-label closure — the keeper contract of
    # dedup.neardup_groups, value-checked end to end.
    fuzzy_groups = mh_prelude.replace("WITH ", "WITH RECURSIVE ", 1) + f""",
prs AS (SELECT a, b FROM cand WHERE round(({eq_terms}) / {N_HASHES}, 6) >= 0.5),
sym AS (SELECT a, b FROM prs UNION SELECT b AS a, a AS b FROM prs),
cc_nodes AS (SELECT DISTINCT a AS node FROM sym),
reach(node, lbl) AS (
  SELECT node, node FROM cc_nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN sym e ON r.node = e.a
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT d.id, coalesce(c.component, d.id) AS group_id,
       coalesce(c.component, d.id) <> d.id AS is_dup
FROM (SELECT DISTINCT id FROM docs2) d LEFT JOIN comp c ON d.id = c.node
"""
    # Incremental novelty: plain sha256 canonicalize + anti-join — the
    # Bloom prefilter on the Spark side must be value-invisible.
    incremental = """
WITH new_docs AS (
  SELECT doc_id + 100000 AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000, substr(text, strpos(text, ' ') + 1) FROM documents
),
canon AS (
  SELECT min(id) AS id, sha256(text) AS content_hash
  FROM new_docs GROUP BY sha256(text)
),
seen_h AS (SELECT DISTINCT sha256(text) AS content_hash FROM documents)
SELECT c.id, c.content_hash FROM canon c
WHERE NOT EXISTS (SELECT 1 FROM seen_h s WHERE s.content_hash = c.content_hash)
"""
    # Benchmark 8-gram decontamination: same shingle construction at
    # k=8, bench grams = the doc_id%97==0 slice, per-doc hit rollup.
    # count(bg.gram) (not sum(::INT)) keeps n_hits BIGINT — DuckDB's
    # sum(INTEGER) is HUGEINT, which would break schema parity.
    gram8 = " || ' ' || ".join(f"toks[(i + {j})::INT]" for j in range(1, 9))
    decontaminate = f"""
WITH toks AS (
  SELECT doc_id AS id, regexp_extract_all(lower(text), '\\w+') AS toks FROM documents
),
sh AS (
  SELECT id, list_sort(list_distinct(
    CASE WHEN len(toks) >= 8
      THEN list_transform(range(0, len(toks) - 7), i -> {gram8})
      ELSE [array_to_string(toks, ' ')] END)) AS sh
  FROM toks
),
dg AS (SELECT id, unnest(sh) AS gram FROM sh),
bg AS (SELECT DISTINCT gram FROM dg WHERE id % 97 = 0),
per AS (
  SELECT dg.id, count(*) AS n_grams, count(bg.gram) AS n_hits
  FROM dg LEFT JOIN bg ON dg.gram = bg.gram GROUP BY dg.id
)
SELECT id, n_grams, n_hits,
       round(n_hits::DOUBLE / n_grams, 6) AS overlap_frac,
       round(n_hits::DOUBLE / n_grams, 6) >= 0.5 AS contaminated
FROM per
"""
    return {
        "exact_dedup": exact,
        "minhash_dedup": minhash,
        "ngram_jaccard": jaccard,
        "simhash_dedup": simhash,
        "winnow_fps": winnow_fp_sql,
        "winnow_dedup": winnow_pair_sql,
        "fuzzy_dedup_groups": fuzzy_groups,
        "incremental_dedup": incremental,
        "decontaminate": decontaminate,
    }


def _bucket_sql(planes: list[list[float]]) -> str:
    return " || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(f"{x:.1f}" for x in p)
        + "]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )


def _similarity_oracles() -> dict[str, str]:
    from easyner_spark.operators.similarity import (
        DIM,
        N_BITS,
        NEARDUP_BITS,
        hyperplanes,
    )

    planes = hyperplanes()
    norm = """
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS norm FROM e)"""
    bucket_expr = _bucket_sql(planes)
    topk = f"""{norm},
p AS (
  SELECT a.id AS query_id, b.id AS neighbor_id,
         list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
  FROM n a JOIN n b ON a.id <> b.id
),
r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine FROM r WHERE rank <= 10
"""
    lsh = f"""{norm},
bk AS (SELECT id, v, norm, {bucket_expr} AS bucket FROM n),
p AS (
  SELECT a.id AS query_id, b.id AS neighbor_id,
         list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.id <> b.id
),
r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine FROM r WHERE rank <= 10
"""
    from easyner_spark.operators.similarity import IVF_CENTROIDS, IVF_NPROBE

    ivf = f"""{norm},
cent AS (SELECT id AS cid, v AS cv FROM n ORDER BY md5(id::VARCHAR), id LIMIT {IVF_CENTROIDS}),
asg0 AS (
  SELECT n.id, n.v, n.norm, c.cid,
         list_dot_product(n.v, c.cv)
           / (n.norm * sqrt(list_dot_product(c.cv, c.cv))) AS ccos,
         row_number() OVER (PARTITION BY n.id
                            ORDER BY list_dot_product(n.v, c.cv)
                                     / (n.norm * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                                     c.cid ASC) AS rn
  FROM n CROSS JOIN cent c
),
asg AS (SELECT id, v, norm, cid AS cell FROM asg0 WHERE rn = 1),
probes AS (SELECT id, v, norm, cid AS cell FROM asg0 WHERE rn <= {IVF_NPROBE}),
p AS (
  SELECT a.id AS query_id, b.id AS neighbor_id,
         list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
  FROM probes a JOIN asg b ON a.cell = b.cell AND a.id <> b.id
),
r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine FROM r WHERE rank <= 10
"""
    semdd = f"""{norm},
cent AS (SELECT id AS cid, v AS cv FROM n ORDER BY md5(id::VARCHAR), id LIMIT {IVF_CENTROIDS}),
asg0 AS (
  SELECT n.id, n.v, n.norm, c.cid,
         row_number() OVER (PARTITION BY n.id
                            ORDER BY list_dot_product(n.v, c.cv)
                                     / (n.norm * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                                     c.cid ASC) AS rn
  FROM n CROSS JOIN cent c
),
asg AS (SELECT id, v, norm, cid AS cell FROM asg0 WHERE rn = 1),
p AS (
  SELECT b.id AS id, a.id AS dup,
         list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
),
d AS (SELECT id, min(dup) AS dup_of FROM p WHERE cos >= 0.3 GROUP BY id)
SELECT asg.id, asg.cell, d.dup_of, d.dup_of IS NULL AS kept
FROM asg LEFT JOIN d ON asg.id = d.id
"""

    nd_bucket = _bucket_sql(hyperplanes(NEARDUP_BITS, DIM))
    neardup = f"""{norm},
bk AS (SELECT id, v, norm, {nd_bucket} AS bucket FROM n),
p AS (
  SELECT a.id AS a, b.id AS b,
         list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.id < b.id
)
SELECT a, b, round(cos, 6) AS cosine FROM p WHERE cos >= 0.3
"""
    neardup_exact = f"""{norm},
p AS (
  SELECT a.id AS a, b.id AS b,
         list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
  FROM n a JOIN n b ON a.id < b.id
)
SELECT a, b, round(cos, 6) AS cosine FROM p WHERE cos >= 0.3
"""
    assert N_BITS == len(planes)
    return {
        "ann_topk": topk,
        "ann_topk_blocked": topk,
        "ann_lsh_topk": lsh,
        "ann_ivf_topk": ivf,
        "ann_ivf_cached": ivf,  # same values: supplied == seed centroids
        "emb_neardup": neardup,
        "emb_neardup_exact": neardup_exact,
        "ann_sq_topk": _sq_oracle(),
        "semdedup": semdd,
    }


def _sq_oracle() -> str:
    from easyner_spark.operators.similarity import sq_topk_oracle_sql

    return sq_topk_oracle_sql(source="embeddings", k=10, levels=256)


def _cooc_pairs_cte() -> str:
    """_PRELUDE extended with pr(a, b): the canonical distinct entity
    co-occurrence pairs — shared by the kg_triangles /
    kg_link_predict / kg_kcore oracles."""
    return _PRELUDE + """
, occ AS (SELECT DISTINCT doc_id, sent_idx, mention_lc AS term FROM mentions),
pr AS (
  SELECT DISTINCT x.term AS a, y.term AS b
  FROM occ x JOIN occ y
    ON x.doc_id = y.doc_id AND x.sent_idx = y.sent_idx AND x.term < y.term
)"""


def _link_predict_oracle() -> str:
    from easyner_spark.operators.graph import link_prediction_oracle_sql

    return link_prediction_oracle_sql(_cooc_pairs_cte(), min_common=2)


def _kcore_oracle() -> str:
    from easyner_spark.operators.graph import k_core_oracle_sql

    return k_core_oracle_sql(_cooc_pairs_cte(), k=2, max_rounds=8)


def _wl_oracle() -> str:
    from easyner_spark.operators.graph import wl_labels_oracle_sql

    return wl_labels_oracle_sql(_cooc_pairs_cte(), iters=2)


def _pack_oracle() -> str:
    from easyner_spark.operators.sampling import pack_sequences_oracle_sql

    return pack_sequences_oracle_sql(
        512, tokens_expr="len(regexp_extract_all(lower(text), '\\w+'))"
    )


def _cms_oracle() -> str:
    from easyner_spark.operators.sketches import cms_oracle_sql

    stream = """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS x FROM documents
)"""
    cand = " UNION ALL ".join(
        f"SELECT '{t}' AS term" for t in CMS_CANDIDATES
    )
    return cms_oracle_sql(stream, cand)


def _predicate_triples_oracle(as_prefix: bool = False) -> str:
    """Oracle for the char-gap pattern rule, expressed on TOKEN indices:
    the engine's mentions are token-aligned and the lexicon is
    letters-only, so "first lexicon token in the char gap
    (subj.end, obj.begin)" == "first lexicon token with tok_idx in
    [subj.end_tok, obj.begin_tok)" — same hit, same order. The prelude
    is rewritten with the same ' slow ' -> ' inhibits ' verb injection the
    Spark query applies (before senticizing, same replace order).
    `as_prefix=True` returns the chain WITHOUT a final SELECT, ending
    in e(subj_id, pred, obj_id) DISTINCT — for composition into
    downstream oracles (entity_types)."""
    from easyner_spark.operators.triples import PRED_LEXICON

    lex_values = ", ".join(
        f"('{s}', '{c}')" for s, c in sorted(PRED_LEXICON.items())
    )
    prelude = _PRELUDE.replace(
        "regexp_replace(text, ' a ', '. ', 'g')",
        "regexp_replace(regexp_replace(text, ' slow ', ' inhibits ', 'g'), ' a ', '. ', 'g')",
    )
    return (
        prelude
        + f"""
, f2 AS (
  SELECT doc_id, sent_idx, entity_id, begin_tok, end_tok,
         row_number() OVER (PARTITION BY doc_id, sent_idx
                            ORDER BY begin_tok, end_tok, entity_id) AS ord
  FROM firsts WHERE rn = 1
),
pp AS (
  SELECT a.doc_id, a.sent_idx, a.entity_id AS subj_id, b.entity_id AS obj_id,
         a.end_tok AS gb, b.begin_tok AS ge
  FROM f2 a JOIN f2 b
    ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.ord < b.ord
),
lex(surface, canon) AS (VALUES {lex_values}),
lex_toks AS (
  SELECT t.doc_id, t.sent_idx, t.tok_idx, l.canon
  FROM toks t JOIN lex l ON lower(t.tok) = l.surface
),
hit AS (
  SELECT p.doc_id, p.sent_idx, p.subj_id, p.obj_id,
         arg_min(h.canon, h.tok_idx) AS canon
  FROM pp p
  LEFT JOIN lex_toks h
    ON h.doc_id = p.doc_id AND h.sent_idx = p.sent_idx
   AND h.tok_idx >= p.gb AND h.tok_idx < p.ge
  GROUP BY p.doc_id, p.sent_idx, p.subj_id, p.obj_id
)"""
        + (
            """,
e AS (
  SELECT DISTINCT subj_id, coalesce(canon, 'co_occurs_with') AS pred, obj_id
  FROM hit
)"""
            if as_prefix
            else """
SELECT doc_id, sent_idx::BIGINT AS sent_idx, subj_id,
       coalesce(canon, 'co_occurs_with') AS pred, obj_id
FROM hit
"""
        )
    )


_MEDIA_META_SQL = """
WITH m AS (
  SELECT doc_id::VARCHAR AS media_id, 'image' AS kind, text,
         ('0x' || substr(sha256(text), 1, 8))::BIGINT AS h
  FROM documents
)
SELECT media_id, kind,
  octet_length(encode(text))::BIGINT AS n_bytes,
  sha256(text) AS content_sha,
  (64 + h % 1024)::BIGINT AS width,
  (64 + (h >> 10) % 1024)::BIGINT AS height,
  (1 + h % 300)::BIGINT AS n_frames,
  'fake/image' AS codec
FROM m
"""


def _lpa_oracle_body(iters: int = 3, final_sql: str | None = None) -> str:
    """Unrolled fixed-iteration label propagation over the undirected
    entity co-occurrence graph, mirroring operators/graph.
    label_propagation's contract exactly: symmetrized distinct edges,
    label_0 = own id, per round the neighbor-majority label with ties
    to the SMALLEST label (row_number over cnt DESC, label ASC ==
    Spark's min(struct(-cnt, label)))."""
    parts = [
        """
, occ AS (SELECT DISTINCT doc_id, sent_idx, mention_lc AS term FROM mentions),
pr AS (
  SELECT DISTINCT x.term AS a, y.term AS b
  FROM occ x JOIN occ y
    ON x.doc_id = y.doc_id AND x.sent_idx = y.sent_idx AND x.term < y.term
),
sym AS (SELECT a AS node, b AS nbr FROM pr UNION SELECT b, a FROM pr),
it0 AS (SELECT DISTINCT node, node AS label FROM sym)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
it{t} AS (
  SELECT node, label FROM (
    SELECT s.node, r.label, count(*) AS cnt,
           row_number() OVER (PARTITION BY s.node
                              ORDER BY count(*) DESC, r.label) AS rn
    FROM sym s JOIN it{t - 1} r ON s.nbr = r.node
    GROUP BY s.node, r.label
  ) WHERE rn = 1
)"""
        )
    parts.append(
        final_sql
        if final_sql is not None
        else f"\nSELECT node, label FROM it{iters}\n"
    )
    return "".join(parts)


# Deterministic skewed url synthesis shared (verbatim) by the webtext
# oracle queries — the SQL twin of __spark_entry__._synth_url_pages.
_URL_HOST_CASE = """CASE WHEN doc_id % 10 < 3 THEN 'hub.example.com'
         WHEN doc_id % 10 < 5 THEN 'blog.example.org'
         ELSE 'site' || (doc_id % 37) || '.example.net' END"""

_URL_PAGES_CTE = f"""
WITH p AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 13 = 0 THEN 'http' ELSE 'https' END)
         || '://' || {_URL_HOST_CASE}
         || (CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END)
         || '/p/' || doc_id AS url,
         text, lang
  FROM documents
),
h AS (
  SELECT *, regexp_replace(
              lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
              ':\\d+$', '') AS host
  FROM p
)
"""


def _redirects_oracle() -> str:
    """q_resolve_redirects oracle: the synthetic functional redirect
    graph (same doc_id % 10 rule) fed to the operator's module-local
    recursive-CTE twin."""
    from easyner_spark.operators.webtext import resolve_redirects_oracle_sql

    cte = """r AS (
  SELECT 'u' || doc_id AS url,
         'u' || (CASE WHEN doc_id % 10 BETWEEN 1 AND 4 THEN doc_id - 1
                      WHEN doc_id % 10 = 7 THEN doc_id + 1
                      WHEN doc_id % 10 = 8 THEN doc_id - 1
                      WHEN doc_id % 10 = 9 THEN doc_id END) AS target
  FROM documents
  WHERE doc_id % 10 IN (1, 2, 3, 4, 7, 8, 9)
)"""
    return resolve_redirects_oracle_sql(cte, max_steps=8)


def _robots_oracle() -> str:
    """q_robots_rules oracle: skewed-url synthesis + the _ROBOTS_RULES
    literals fed to the operator's module-local SQL twin."""
    from easyner_spark.operators.webtext import robots_verdict_oracle_sql

    pages_sql = f"""SELECT (CASE WHEN doc_id % 13 = 0 THEN 'http' ELSE 'https' END)
    || '://' || {_URL_HOST_CASE}
    || (CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END)
    || '/p/' || doc_id AS url FROM documents"""
    vals = ",\n    ".join(
        f"('{h}', '{d}', '{p}')" for h, d, p in _ROBOTS_RULES
    )
    rules_sql = (
        "SELECT * FROM (VALUES\n    "
        + vals
        + "\n  ) AS t(host, directive, path_prefix)"
    )
    return robots_verdict_oracle_sql(pages_sql, rules_sql)


def _kg_violations_oracle() -> str:
    """q_kg_violations oracle: same constraints list over the shared
    engineered edge synthesis."""
    from easyner_spark.operators.triples import (
        functional_violations_oracle_sql,
    )

    return functional_violations_oracle_sql(
        f"WITH e AS ({_KG_FUNC_SQL})", _KG_CONSTRAINTS
    )


def _host_templates_oracle() -> str:
    from easyner_spark.operators.webtext import host_templates_oracle_sql

    return host_templates_oracle_sql(
        _TEMPLATE_PAGES_SQL, min_host_pages=3, min_frac_pct=40
    )


def _template_strip_oracle() -> str:
    from easyner_spark.operators.webtext import (
        strip_host_templates_oracle_sql,
    )

    return strip_host_templates_oracle_sql(
        _TEMPLATE_PAGES_SQL, min_host_pages=3, min_frac_pct=40
    )


def _kg_rank_oracle(summary: bool) -> str:
    """q_kg_rank_eval / q_kg_rank_summary oracles: the same gold +
    filtered-negative candidate synthesis (kg_negatives SQL twin,
    slot-deduped) scored by the shared md5-32 micro-unit rule."""
    from easyner_spark.operators.graph import (
        kg_negatives_oracle_sql,
        ranking_eval_oracle_sql,
        ranking_summary_oracle_sql,
    )

    negs = kg_negatives_oracle_sql(_KG_TRIPLES_SQL, k=3)
    cands = f"""
WITH negs AS MATERIALIZED ({negs}),
golds AS ({_KG_TRIPLES_SQL}),
cand AS (
  SELECT subj, pred, obj, 1 AS is_gold FROM golds
  UNION ALL
  SELECT DISTINCT subj, pred, obj_neg AS obj, 0 AS is_gold FROM negs
)
SELECT subj, pred, obj,
       ('0x' || substr(md5(subj || '|' || pred || '|' || obj || '|sc'),
                       1, 8))::BIGINT % 1000000 AS score_micro,
       is_gold
FROM cand"""
    if summary:
        return ranking_summary_oracle_sql(cands)
    return ranking_eval_oracle_sql(cands)


def _bitext_oracle() -> str:
    """q_bitext oracle: the sentence prelude relabeled (url, lang) +
    the deterministic doc_id div 3 cluster table, through the
    operator's module-local SQL twin."""
    from easyner_spark.operators.webtext import bitext_candidates_oracle_sql

    sentences_sql = _PRELUDE + """
SELECT doc_id::VARCHAR AS url,
       CASE (doc_id % 3) WHEN 0 THEN 'en' WHEN 1 THEN 'de'
            ELSE 'fr' END AS lang,
       sent_idx::BIGINT AS sent_idx, sentence
FROM sentences
"""
    clusters_sql = (
        "SELECT doc_id::VARCHAR AS node, "
        "'g' || (doc_id // 3)::VARCHAR AS cluster FROM documents"
    )
    return bitext_candidates_oracle_sql(
        sentences_sql, clusters_sql, max_count_diff_pct=50
    )


def _mirror_hosts_oracle() -> str:
    """q_mirror_hosts oracle: the deterministic base+mirror page
    synthesis through the operator's module-local SQL twin (oracle
    groups on raw text where Spark groups on its sha2 digest)."""
    from easyner_spark.operators.webtext import mirror_hosts_oracle_sql

    pages_sql = """
SELECT 'http://h' || (doc_id % 40)::VARCHAR || '.example.org/p/'
         || doc_id::VARCHAR AS url, text
FROM documents
UNION ALL
SELECT 'http://mirror-h' || (doc_id % 40)::VARCHAR || '.example.org/p/'
         || doc_id::VARCHAR AS url, text
FROM documents WHERE doc_id % 2 = 0
"""
    return mirror_hosts_oracle_sql(pages_sql)


def _url_equivalence_oracle() -> str:
    """q_url_equivalence oracle: the deterministic variant/canonical/
    redirect synthesis through the operator's module-local twin (same
    CANONICAL_RE, same canonical_url chain, min-label closure)."""
    from easyner_spark.operators.webtext import url_equivalence_oracle_sql

    pages_sql = """
SELECT CASE WHEN doc_id % 3 = 0
            THEN 'https://h' || (doc_id % 13) || '.example.org/a/'
                 || (doc_id % 97) || '?utm_source=mail'
            WHEN doc_id % 3 = 1
            THEN 'https://www.h' || (doc_id % 13) || '.example.org/a/'
                 || (doc_id % 97)
            ELSE 'https://h' || (doc_id % 13) || '.example.org/a/'
                 || (doc_id % 97) || '/' END AS url,
       CASE WHEN doc_id % 5 = 0
            THEN '<html><head><link rel="canonical" href="https://hub.example.org/c/'
                 || (doc_id % 7) || '"></head></html>'
            ELSE '<html><head></head></html>' END AS html
FROM documents
"""
    redirects_sql = """SELECT
    'https://old.example.org/r/' || doc_id AS src,
    'https://h' || (doc_id % 13) || '.example.org/a/' || (doc_id % 97) AS dst
  FROM documents WHERE doc_id % 11 = 0"""
    return url_equivalence_oracle_sql(pages_sql, redirects_sql)


def _containment_oracle() -> str:
    """q_containment oracle: the base + portal-wrapper synthesis
    through the operator's module-local twin (same \\w+ tokenizer,
    5-shingles, df gate, cross-multiply containment gate)."""
    from easyner_spark.operators.dedup import containment_pairs_oracle_sql

    docs_sql = """
SELECT doc_id AS id, text FROM documents
UNION ALL
SELECT doc_id + 500000 AS id,
       'portal syndication wrapper intro ' || text
         || ' portal footer navigation links' AS text
FROM documents WHERE doc_id % 7 = 0
"""
    return containment_pairs_oracle_sql(docs_sql, k=5)


def _html_tables_oracle() -> str:
    """q_html_tables oracle: the shared table-page synthesis through
    the operator's module-local twin (same three regexes)."""
    from easyner_spark.operators.webtext import extract_tables_oracle_sql

    return extract_tables_oracle_sql(_TABLE_PAGES_SQL)


def _infobox_oracle() -> str:
    """q_infobox oracle: same synthesis through the arity-2 twin."""
    from easyner_spark.operators.webtext import infobox_pairs_oracle_sql

    return infobox_pairs_oracle_sql(_TABLE_PAGES_SQL)


def _host_spam_oracle() -> str:
    """q_host_spam oracle: the shared host-edge CTE chain through the
    operator's module-local twin (BIGINT floor-division percentages)."""
    from easyner_spark.operators.webtext import host_spam_signals_oracle_sql

    return host_spam_signals_oracle_sql(_HOSTLINKS_CTE.rstrip().rstrip(","))


def _opengraph_oracle() -> str:
    """q_opengraph oracle: the same og head synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import extract_opengraph_oracle_sql

    pages_sql = """
SELECT 'u' || doc_id AS url,
  '<html><head><meta property="og:title" content="doc ' || doc_id
  || '"><meta property="og:type" content="'
  || (CASE (doc_id % 4) WHEN 0 THEN 'article' WHEN 1 THEN 'profile'
           WHEN 2 THEN 'video' ELSE 'website' END)
  || '">'
  || (CASE WHEN doc_id % 3 = 0
      THEN '<meta property="og:image" content="https://img.example/'
           || doc_id || 'a.png"><meta property="og:image"'
           || ' content="https://img.example/' || doc_id || 'b.png">'
      ELSE '' END)
  || '</head></html>' AS html
FROM documents
"""
    return extract_opengraph_oracle_sql(pages_sql)


def _feed_items_oracle() -> str:
    """q_feed_items oracle: the even-RSS / odd-Atom synthesis through
    the operator's module-local twin."""
    from easyner_spark.operators.webtext import feed_parse_oracle_sql

    feeds_sql = """
SELECT 'https://f.example/feed/' || doc_id AS url,
  CASE WHEN doc_id % 2 = 0 THEN
    '<rss><channel><title>chan</title><item><title>Post A' || doc_id
    || '</title><link>https://f.example/' || doc_id || '/a</link>'
    || (CASE WHEN doc_id % 5 != 0
        THEN '<pubDate>2026-01-0' || (doc_id % 9 + 1) || '</pubDate>'
        ELSE '' END)
    || '</item><item><link>https://f.example/' || doc_id
    || '/b</link></item></channel></rss>'
  ELSE
    '<feed><title>f</title><entry><title>Entry A' || doc_id
    || '</title><link href="https://f.example/' || doc_id
    || '/a"/><updated>2026-02-0' || (doc_id % 9 + 1)
    || '</updated></entry><entry><link href="https://f.example/' || doc_id
    || '/b"/></entry></feed>'
  END AS feed_xml
FROM documents
"""
    return feed_parse_oracle_sql(feeds_sql)


def _crawl_frontier_oracle() -> str:
    """q_crawl_frontier oracle: the doc-link prefix + sitemap/feed
    parser twins as extra-source subqueries, through the operator's
    module-local twin."""
    from easyner_spark.operators.webtext import (
        crawl_frontier_oracle_sql,
        feed_parse_oracle_sql,
        sitemap_parse_oracle_sql,
    )

    pages_sql = (
        "SELECT 'https://site' || (doc_id % 37) || '.example.net/p/'"
        " || doc_id AS url FROM documents"
    )
    sm_sql = """
SELECT 'https://site' || (doc_id % 37) || '.example.net/sitemap.xml' AS url,
  '<urlset><url><loc>https://site' || (doc_id % 37) || '.example.net/p/'
  || (doc_id + 2) || '</loc></url></urlset>' AS sitemap_xml
FROM documents
"""
    fd_sql = """
SELECT 'https://feeds.example.org/f/' || doc_id AS url,
  '<rss><channel><item><link>'
  || (CASE WHEN doc_id % 3 = 0
      THEN 'https://site' || ((doc_id + 1) % 37) || '.example.net/p/'
           || (doc_id + 1)
      ELSE 'https://feeds.example.org/item/' || doc_id END)
  || '</link></item></channel></rss>' AS feed_xml
FROM documents
"""
    return crawl_frontier_oracle_sql(
        _DOCLINKS_PREFIX,
        pages_sql,
        [
            (
                f"SELECT loc AS url FROM ({sitemap_parse_oracle_sql(sm_sql)})",
                "sitemap",
            ),
            (
                f"SELECT link AS url FROM ({feed_parse_oracle_sql(fd_sql)})",
                "feed",
            ),
        ],
    )


_TEMPLATE_PAGES_URL_SQL = """
SELECT 'https://t' || (doc_id % 11) || '.example.org'
  || (CASE WHEN doc_id % 3 = 0
      THEN '/post/' || doc_id || '/comments'
      WHEN doc_id % 3 = 1
      THEN '/s/' || substr(md5(doc_id::VARCHAR), 1, 12)
      ELSE '/about' END) AS url
FROM documents
"""


def _url_templates_oracle() -> str:
    """q_url_templates oracle: the shared path-shape synthesis through
    the operator's module-local twin (md5 hex agrees byte-for-byte
    across engines)."""
    from easyner_spark.operators.webtext import url_templates_oracle_sql

    return url_templates_oracle_sql(_TEMPLATE_PAGES_URL_SQL)


def _template_cap_oracle() -> str:
    """q_template_cap oracle: the same synthesis through the capping
    twin (md5-rank pick agrees across engines)."""
    from easyner_spark.operators.webtext import template_cap_oracle_sql

    return template_cap_oracle_sql(_TEMPLATE_PAGES_URL_SQL, cap=5)


def _readability_oracle() -> str:
    """q_readability oracle: the real documents table through the
    operator's module-local twin."""
    from easyner_spark.operators.textstats import (
        readability_counts_oracle_sql,
    )

    twin = readability_counts_oracle_sql(
        "SELECT doc_id AS id, text FROM documents"
    )
    return (
        "SELECT id AS doc_id, n_sents, n_words, n_syllables,"
        " words_per_sent_micro, syll_per_word_micro"
        f" FROM ({twin})"
    )


def _robots_sitemaps_oracle() -> str:
    """q_robots_sitemaps oracle: the same announcement synthesis
    through the operator's module-local twin."""
    from easyner_spark.operators.webtext import robots_sitemaps_oracle_sql

    robots_sql = """
SELECT 'https://r' || doc_id || '.example.org/robots.txt' AS url,
  'User-agent: *' || chr(10)
  || 'Disallow: /tmp' || chr(10)
  || 'Sitemap: https://r' || doc_id || '.example.org/sitemap.xml' || chr(10)
  || 'User-agent: bot' || chr(10)
  || 'Disallow: /' || chr(10)
  || (CASE WHEN doc_id % 2 = 0
      THEN 'sitemap: https://r' || doc_id || '.example.org/news'
           || (doc_id % 4) || '.xml   # extra'
      ELSE 'Sitemap: /relative-dropped' END) AS robots_txt
FROM documents
"""
    return robots_sitemaps_oracle_sql(robots_sql)


def _anchor_rels_oracle() -> str:
    """q_anchor_rels oracle: the rotating-rel synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import anchor_rels_oracle_sql

    pages_sql = """
SELECT 'https://a' || (doc_id % 5) || '.example.org/p/' || doc_id AS url,
  '<html><a href="https://t' || (doc_id % 9) || '.example.org/x/'
  || doc_id || '"'
  || (CASE WHEN doc_id % 4 = 0 THEN ' rel="nofollow"'
       WHEN doc_id % 4 = 1 THEN ' rel="ugc sponsored"'
       WHEN doc_id % 4 = 2 THEN ' rel="noopener"'
       ELSE '' END)
  || '>out</a></html>' AS html
FROM documents
"""
    return anchor_rels_oracle_sql(pages_sql)


def _jsonld_fields_oracle() -> str:
    """q_jsonld_fields oracle: the Event/Product synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import jsonld_fields_oracle_sql

    pages_sql = """
SELECT 'u' || doc_id AS url,
  '<html>'
  || (CASE WHEN doc_id % 2 = 0
      THEN '<script type="application/ld+json">{"@type": "Event", "name": "ev '
           || doc_id || '", "startDate": "2026-0' || (doc_id % 9 + 1)
           || '-01", "location": "City ' || (doc_id % 13) || '"}</script>'
      ELSE '<script type="application/ld+json">{"@type": "Product", "name": "w '
           || doc_id || '", "price": "' || (doc_id % 90 + 10)
           || '.50"}</script>' END)
  || '</html>' AS html
FROM documents
"""
    return jsonld_fields_oracle_sql(pages_sql)


_AMP_PAGES_SQL = """
SELECT 'https://m' || (doc_id % 7) || '.example.org/p/' || doc_id AS url,
  '<html><head>'
  || (CASE WHEN doc_id % 2 = 0 THEN
        (CASE WHEN doc_id % 4 = 0
          THEN '<link rel="amphtml" href="/amp/' || doc_id || '">'
          ELSE '<link rel="amphtml" href="https://m' || (doc_id % 7)
               || '.example.org/amp/' || doc_id || '">' END)
      ELSE '' END)
  || '</head></html>' AS html
FROM documents
"""


def _amp_fold_oracle() -> str:
    """q_amp_fold oracle: the amphtml twin as url_equivalence's
    redirects subquery over the shared synthesis."""
    from easyner_spark.operators.webtext import (
        extract_amphtml_oracle_sql,
        url_equivalence_oracle_sql,
    )

    return url_equivalence_oracle_sql(
        _AMP_PAGES_SQL, extract_amphtml_oracle_sql(_AMP_PAGES_SQL)
    )


def _definition_edges_oracle() -> str:
    """q_definition_edges oracle: the rotating-term <dl> synthesis
    through the extraction twin, left-joined to the SAME ALIAS list
    (primary-alias min(ID) fold) inlined as VALUES."""
    from easyner_spark.operators.webtext import (
        extract_definitions_oracle_sql,
    )

    pages_sql = """
SELECT 'u' || doc_id AS url,
  '<html><dl><dt>'
  || (CASE (doc_id % 5) WHEN 0 THEN 'hash' WHEN 1 THEN 'merge'
       WHEN 2 THEN 'spark' WHEN 3 THEN 'window' ELSE 'sort table' END)
  || '</dt><dd>meaning of '
  || (CASE (doc_id % 5) WHEN 0 THEN 'hash' WHEN 1 THEN 'merge'
       WHEN 2 THEN 'spark' WHEN 3 THEN 'window' ELSE 'sort table' END)
  || ' in doc ' || doc_id || '</dd></dl></html>' AS html
FROM documents
"""
    alias_values = ", ".join(f"('{t}', '{i}')" for t, i in ALIAS)
    defs = extract_definitions_oracle_sql(pages_sql)
    return f"""
WITH dfs AS (SELECT * FROM ({defs})),
al AS (SELECT term, min(id) AS id
       FROM (VALUES {alias_values}) a(term, id) GROUP BY term)
SELECT d.url, d.term, coalesce(al.id, '') AS entity_id, d.definition
FROM dfs d LEFT JOIN al ON d.term = al.term
"""


def _definitions_oracle() -> str:
    """q_definitions oracle: the same <dl> synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import (
        extract_definitions_oracle_sql,
    )

    pages_sql = """
SELECT 'u' || doc_id AS url,
  '<html><dl>'
  || array_to_string(list_transform(range(1, (doc_id % 4 + 1) + 1),
       i -> '<dt>Term ' || i || '-' || (doc_id % 9)
            || '</dt> <dd>meaning ' || i || ' of group '
            || (doc_id % 9) || '</dd>'), '')
  || (CASE WHEN doc_id % 5 = 0 THEN '<dt>orphan</dt>' ELSE '' END)
  || '</dl></html>' AS html
FROM documents
"""
    return extract_definitions_oracle_sql(pages_sql)


def _declarations_oracle() -> str:
    """q_declarations oracle: the four-variant synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import page_declarations_oracle_sql

    pages_sql = """
SELECT 'u' || doc_id AS url,
  (CASE WHEN doc_id % 3 = 0
    THEN '<html lang="'
      || (CASE (doc_id % 4) WHEN 0 THEN 'en' WHEN 1 THEN 'de'
           WHEN 2 THEN 'fr' ELSE 'sv' END)
      || '"><head><meta charset="utf-8"><meta property="og:locale" content="'
      || (CASE (doc_id % 4) WHEN 0 THEN 'en' WHEN 1 THEN 'de'
           WHEN 2 THEN 'fr' ELSE 'sv' END)
      || '_x"></head></html>'
   WHEN doc_id % 3 = 1
    THEN '<html lang="'
      || (CASE (doc_id % 4) WHEN 0 THEN 'en' WHEN 1 THEN 'de'
           WHEN 2 THEN 'fr' ELSE 'sv' END)
      || '"><p>x</p></html>'
   WHEN doc_id % 2 = 0
    THEN '<html><meta charset="iso-8859-1"></html>'
   ELSE '<html><p>none</p></html>' END) AS html
FROM documents
"""
    return page_declarations_oracle_sql(pages_sql)


def _sitemap_index_oracle() -> str:
    """q_sitemap_index oracle: the shard-announcement synthesis
    through the operator's module-local twin."""
    from easyner_spark.operators.webtext import sitemap_index_parse_oracle_sql

    indexes_sql = """
SELECT 'https://s' || (doc_id % 11) || '.example.org/smi-' || doc_id
         || '.xml' AS url,
  '<sitemapindex>' || chr(10) || '<sitemap>' || chr(10)
  || '  <loc>https://s' || (doc_id % 11) || '.example.org/sm-' || doc_id
  || '-a.xml</loc>' || chr(10) || '  <lastmod>2026-0' || (doc_id % 9 + 1)
  || '-05</lastmod>' || chr(10) || '</sitemap>' || chr(10)
  || '<sitemap><loc>https://s' || (doc_id % 11) || '.example.org/sm-'
  || doc_id || '-b.xml</loc></sitemap>' || chr(10)
  || '<sitemap><lastmod>2026-01-01</lastmod></sitemap>' || chr(10)
  || '</sitemapindex>' AS sitemap_xml
FROM documents
"""
    return sitemap_index_parse_oracle_sql(indexes_sql)


def _mined_taxonomy_oracle() -> str:
    """q_mined_taxonomy oracle: the chained-hypernym mining flattened
    into the WITH RECURSIVE prefix the closure twin requires (flat
    chain per the nested-WITH quirk; explicit self-edge drop)."""
    from easyner_spark.operators.graph import (
        isa_closure_oracle_sql,
        ppr_oracle_sql,
    )

    prefix = r"""WITH RECURSIVE csent AS (
  SELECT doc_id::VARCHAR AS url,
    text || ' A kind' || (doc_id % 25) || ' is a kind'
    || ((doc_id % 25) // 3) || ' again.' AS sentence
  FROM documents
),
cels AS (SELECT url,
           unnest(regexp_extract_all(lower(sentence),
             '\b[a-z][a-z0-9-]+ (?:is|are) (?:a|an|the) [a-z][a-z0-9-]+',
             0)) AS el
         FROM csent),
cp AS (SELECT DISTINCT url,
         regexp_extract(el, '^([a-z0-9-]+) ', 1) AS child,
         regexp_extract(el, ' ([a-z0-9-]+)$', 1) AS parent
       FROM cels),
ced AS (SELECT child, parent, count(*)::BIGINT AS n
        FROM cp GROUP BY child, parent),
e AS (SELECT child, parent FROM ced WHERE n >= 2 AND child != parent)"""
    return isa_closure_oracle_sql(prefix, max_depth=16)


def _apposition_oracle() -> str:
    """q_apposition oracle: the injected-apposition synthesis through
    the operator's module-local twin."""
    from easyner_spark.operators.triples import apposition_facts_oracle_sql

    sentences_sql = """
SELECT doc_id::VARCHAR AS url,
  text || ' Note that Alice' || (doc_id % 21) || ', the '
  || (CASE doc_id % 3 WHEN 0 THEN 'ceo' WHEN 1 THEN 'director'
      ELSE 'founder' END)
  || ' ' || (CASE WHEN doc_id % 2 = 0 THEN 'of' ELSE 'at' END)
  || ' Acme' || (doc_id % 7) || ', spoke.' AS sentence
FROM documents
"""
    return apposition_facts_oracle_sql(sentences_sql)


def _copula_isa_oracle() -> str:
    """q_copula_isa oracle: the injected-hypernym synthesis through
    the operator's module-local twin."""
    from easyner_spark.operators.triples import copula_isa_oracle_sql

    sentences_sql = """
SELECT doc_id::VARCHAR AS url,
  text || ' A kind' || (doc_id % 25) || ' is a type'
  || ((doc_id % 25) // 3) || ' indeed.' AS sentence
FROM documents
"""
    return copula_isa_oracle_sql(sentences_sql)


def _geo_oracle() -> str:
    """q_geo oracle: the injected-coordinates synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.triples import geo_facts_oracle_sql

    docs_sql = """
SELECT doc_id AS id,
  text || ' Located at ' || (doc_id % 170 - 85) || '.'
  || (doc_id % 9000 + 1000) || ', ' || (doc_id % 350 - 175) || '.'
  || (doc_id % 900 + 100) || ' on the map.'
  || (CASE WHEN doc_id % 3 = 0
      THEN ' Release 99.' || (doc_id % 10) || ', 999.' || (doc_id % 10)
           || ' shipped.'
      ELSE '' END) AS text
FROM documents
"""
    return geo_facts_oracle_sql(docs_sql)


def _contacts_oracle() -> str:
    """q_contacts oracle: the injected-imprint synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.textstats import contact_facts_oracle_sql

    docs_sql = """
SELECT doc_id AS id,
  text || ' Contact Team' || doc_id || '@Example' || (doc_id % 5)
  || '.ORG now.'
  || (CASE WHEN doc_id % 2 = 0
      THEN ' Call +46 8-' || (doc_id % 900 + 100) || ' 4'
           || (doc_id % 10) || '6 78.'
      ELSE '' END) AS text
FROM documents
"""
    return contact_facts_oracle_sql(docs_sql)


def _social_oracle() -> str:
    """q_social oracle: the deterministic profile-outlink synthesis
    through the operator's module-local twin."""
    from easyner_spark.operators.webtext import social_profiles_oracle_sql

    pages_sql = """
SELECT 'https://h' || (doc_id % 7) || '.example.org/p/' || doc_id AS url,
  '<html><a href="https://'
  || (CASE WHEN doc_id % 2 = 0 THEN 'twitter.com' ELSE 'x.com' END)
  || '/Org' || (doc_id // 3) || '">t</a>'
  || '<a href="https://github.com/org-' || (doc_id // 3) || '">g</a>'
  || (CASE WHEN doc_id % 4 = 0
      THEN '<a href="https://youtube.com/@org' || (doc_id // 3)
           || '">y</a>'
      ELSE '' END)
  || '<a href="https://example.org/x">n</a></html>' AS html
FROM documents
"""
    return social_profiles_oracle_sql(pages_sql)


def _ntriples_oracle() -> str:
    """q_ntriples oracle: the prelude's distinct edge set through the
    serializer's module-local twin (prelude nested as a FROM subquery
    — the plain-WITH nesting DuckDB accepts)."""
    from easyner_spark.sinks.export import to_ntriples_oracle_sql

    edges_sql = (
        "SELECT * FROM ("
        + _PRELUDE
        + " SELECT DISTINCT subj_id, pred, obj_id FROM triples)"
    )
    return to_ntriples_oracle_sql(edges_sql)


def _html_lists_oracle() -> str:
    """q_html_lists oracle: the same nav/ranked-list synthesis through
    the operator's module-local twin."""
    from easyner_spark.operators.webtext import extract_lists_oracle_sql

    pages_sql = """
SELECT 'u' || doc_id AS url,
  '<html><ul class="nav"><li>Home</li><li>Docs ' || doc_id || '</li>'
  || (CASE WHEN doc_id % 6 = 0 THEN '<li> </li>'
      ELSE '<li>Contact</li>' END)
  || '</ul><ol>'
  || coalesce(array_to_string(list_transform(range(1, (doc_id % 3) + 1),
       i -> '<li>rank ' || i || ' item</li>'), ''), '')
  || '</ol></html>' AS html
FROM documents
"""
    return extract_lists_oracle_sql(pages_sql)


def _headings_oracle() -> str:
    """q_headings oracle: the same deterministic outline synthesis
    through the operator's module-local twin (range() is empty when
    stop <= start, matching the Spark side's explicit empty array)."""
    from easyner_spark.operators.webtext import extract_headings_oracle_sql

    pages_sql = """
SELECT 'u' || doc_id AS url,
  '<html><h1>doc ' || doc_id || '</h1>'
  || coalesce(array_to_string(list_transform(range(1, (doc_id % 4) + 1),
       i -> '<h2>section ' || i || '</h2><p>body</p><h3>notes ' || i
            || '</h3>'), ''), '')
  || '<h4>  </h4></html>' AS html
FROM documents
"""
    return extract_headings_oracle_sql(pages_sql)


def _numeric_facts_oracle() -> str:
    """q_numeric_facts oracle: the injected-measurements synthesis
    through the operator's module-local twin."""
    from easyner_spark.operators.triples import numeric_facts_oracle_sql

    docs_sql = """
SELECT doc_id AS id,
  text || ' The sample weighs ' || (doc_id % 90 + 10) || ' kg at '
  || (doc_id % 80 + 10) || '.' || (doc_id % 10) || ' percent purity.'
  || (CASE WHEN doc_id % 4 = 0
      THEN ' Up ' || (doc_id % 30) || '% from 5kgs baseline.'
      ELSE '' END) AS text
FROM documents
"""
    return numeric_facts_oracle_sql(docs_sql)


def _quotes_oracle() -> str:
    """q_quotes oracle: the injected-quotes synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.triples import quote_attributions_oracle_sql

    docs_sql = """
SELECT doc_id AS id,
  text || ' "Claim number ' || doc_id
  || ' holds in every test we ran," said '
  || (CASE (doc_id % 4) WHEN 0 THEN 'Ada Wong' WHEN 1 THEN 'Bo Chen'
       WHEN 2 THEN 'Cy Day' ELSE 'Di Eko' END)
  || '. More prose.'
  || (CASE WHEN doc_id % 3 = 0
      THEN ' "We will keep verifying the results" says '
           || (CASE (doc_id % 4) WHEN 0 THEN 'Ada Wong'
                WHEN 1 THEN 'Bo Chen' WHEN 2 THEN 'Cy Day'
                ELSE 'Di Eko' END) || '.'
      ELSE '' END) AS text
FROM documents
"""
    return quote_attributions_oracle_sql(docs_sql)


def _acronyms_oracle() -> str:
    """q_acronyms oracle: the same injected-definitions synthesis
    through the operator's module-local twin."""
    from easyner_spark.operators.nel import acronym_pairs_oracle_sql

    docs_sql = """
SELECT doc_id AS id,
  text || ' The '
  || (CASE (doc_id % 4) WHEN 0 THEN 'Global' WHEN 1 THEN 'United'
       WHEN 2 THEN 'Open' ELSE 'Federal' END)
  || ' '
  || (CASE (doc_id % 3) WHEN 0 THEN 'Web' WHEN 1 THEN 'Health'
       ELSE 'Data' END)
  || ' Council ('
  || upper(
       (CASE (doc_id % 4) WHEN 0 THEN 'g' WHEN 1 THEN 'u'
         WHEN 2 THEN 'o' ELSE 'f' END)
       || (CASE (doc_id % 3) WHEN 0 THEN 'w' WHEN 1 THEN 'h'
            ELSE 'd' END)
       || 'c')
  || ') met.'
  || (CASE WHEN doc_id % 5 = 0
      THEN ' We read the new Policy (ZZX) today.' ELSE '' END) AS text
FROM documents
"""
    return acronym_pairs_oracle_sql(docs_sql)


def _surface_profile_oracle() -> str:
    """q_surface_profile oracle: the engineered-rates synthesis
    through the operator's module-local twin."""
    from easyner_spark.operators.webtext import (
        host_surface_profile_oracle_sql,
    )

    pages_sql = """
SELECT 'https://h' || (doc_id % 7) || '.example.org/p/' || doc_id AS url,
  '<html>'
  || (CASE WHEN doc_id % 11 != 0 THEN '<title>t</title>' ELSE '' END)
  || (CASE WHEN doc_id % 2 = 0
      THEN '<script type="application/ld+json">{"@type":"T"}</script>'
      ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0
      THEN '<meta property="og:title" content="x">' ELSE '' END)
  || (CASE WHEN doc_id % 5 = 0 THEN '<table></table>' ELSE '' END)
  || '</html>' AS html
FROM documents
"""
    return host_surface_profile_oracle_sql(pages_sql)


_PAGINATION_PAGES_SQL = """
SELECT 'https://p.example/s' || (doc_id // 4) || '/p' || (doc_id % 4) AS url,
  '<html><head>'
  || (CASE WHEN doc_id % 4 > 0
      THEN '<link rel="prev" href="https://p.example/s' || (doc_id // 4)
           || '/p' || (doc_id % 4 - 1) || '">'
      ELSE '' END)
  || (CASE WHEN doc_id % 4 < 3
      THEN '<link rel="next" href="https://p.example/s' || (doc_id // 4)
           || '/p' || (doc_id % 4 + 1) || '">'
      ELSE '' END)
  || '</head></html>' AS html,
  text
FROM documents
"""


def _pagination_oracle() -> str:
    """q_pagination oracle: the shared 4-page-series synthesis through
    the operator's module-local twin (extraction + inverse edges +
    pointer-doubling walk via the redirect twin's final_sql hook)."""
    from easyner_spark.operators.webtext import pagination_series_oracle_sql

    return pagination_series_oracle_sql(_PAGINATION_PAGES_SQL, max_pages=4)


def _series_text_oracle() -> str:
    """q_series_text oracle: the pagination twin nested as the series
    subquery of the assembly twin over the same synthesis."""
    from easyner_spark.operators.webtext import (
        assemble_series_oracle_sql,
        pagination_series_oracle_sql,
    )

    return assemble_series_oracle_sql(
        f"SELECT url, text FROM ({_PAGINATION_PAGES_SQL})",
        pagination_series_oracle_sql(_PAGINATION_PAGES_SQL, max_pages=4),
    )


_SAMEAS_PAGES_SQL = """
SELECT 'u' || doc_id AS url,
  '<html>'
  || (CASE WHEN doc_id % 2 = 0
      THEN '<script type="application/ld+json">{"@type": "Person", "name": "Entity '
           || (doc_id // 5) || '", "sameAs": ["https://wiki.example/E'
           || (doc_id // 5) || '", "https://data.example/Q'
           || (doc_id // 5) || '"]}</script>'
      WHEN doc_id % 5 = 0
      THEN '<script type="application/ld+json">{"@type": "Organization", "sameAs": "https://data.example/Q'
           || (doc_id // 5) || '"}</script>'
      ELSE '' END)
  || '</html>' AS html
FROM documents
"""


def _sameas_oracle() -> str:
    """q_sameas oracle: the shared synthesis through the operator's
    module-local twin."""
    from easyner_spark.operators.webtext import extract_sameas_oracle_sql

    return extract_sameas_oracle_sql(_SAMEAS_PAGES_SQL)


def _sameas_entities_oracle() -> str:
    """q_sameas_entities oracle: the same synthesis through the
    flat-CTE min-label closure twin."""
    from easyner_spark.operators.webtext import sameas_clusters_oracle_sql

    return sameas_clusters_oracle_sql(_SAMEAS_PAGES_SQL)


def _page_entities_oracle() -> str:
    """q_page_entities oracle: the mixed-surface synthesis through the
    operator's module-local twin (which itself embeds the jsonld
    twin)."""
    from easyner_spark.operators.webtext import page_entities_oracle_sql

    pages_sql = """
SELECT 'u' || doc_id AS url,
  '<html><head><title>Doc ' || doc_id || '</title>'
  || (CASE WHEN doc_id % 2 = 0
      THEN '<meta property="og:title" content="doc ' || doc_id
           || ' card"><meta property="og:type" content="article">'
      ELSE '' END)
  || '</head>'
  || (CASE WHEN doc_id % 3 = 0
      THEN '<script type="application/ld+json">{"@type": "Person", "name": "Entity '
           || doc_id || '"}</script>'
      ELSE '' END)
  || '</html>' AS html
FROM documents
"""
    return page_entities_oracle_sql(pages_sql)


def _meta_refresh_oracle() -> str:
    """q_meta_refresh oracle: the four-variant synthesis through the
    operator's module-local twin (same element regex + href branches)."""
    from easyner_spark.operators.webtext import extract_refresh_oracle_sql

    pages_sql = """
SELECT 'https://h' || (doc_id % 13) || '.example.org/d/' || doc_id AS url,
  '<html>'
  || (CASE WHEN doc_id % 4 = 0
      THEN '<meta http-equiv="refresh" content="0;url=https://h'
           || (doc_id % 13) || '.example.org/canonical">'
      WHEN doc_id % 4 = 1
      THEN '<meta http-equiv="refresh" content="' || (doc_id % 9)
           || ';url=/home">'
      WHEN doc_id % 4 = 2
      THEN '<meta http-equiv="refresh" content="' || (doc_id % 9)
           || '; url=next' || (doc_id % 5) || '.html">'
      ELSE '' END)
  || '</html>' AS html
FROM documents
"""
    return extract_refresh_oracle_sql(pages_sql)


def _jsonld_oracle() -> str:
    """q_jsonld oracle: the Article/every-4th-Person synthesis through
    the operator's module-local twin."""
    from easyner_spark.operators.webtext import extract_jsonld_oracle_sql

    pages_sql = """
SELECT 'u' || doc_id AS url,
  '<html><script type="application/ld+json">{"@context": "https://schema.org", "@type": "Article", "name": "doc '
  || doc_id || '"}</script><script>var x = 1;</script>'
  || (CASE WHEN doc_id % 4 = 0
      THEN '<script type="application/ld+json">{"@type": "Person"}</script>'
      ELSE '' END)
  || '</html>' AS html
FROM documents
"""
    return extract_jsonld_oracle_sql(pages_sql)


def _breadcrumbs_oracle() -> str:
    """q_breadcrumbs oracle: the BreadcrumbList synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import (
        extract_breadcrumbs_oracle_sql,
    )

    return extract_breadcrumbs_oracle_sql(_BREADCRUMB_PAGES_SQL)


def _breadcrumb_edges_oracle() -> str:
    """q_breadcrumb_edges oracle: adjacency + distinct-url rollup in
    SQL over the same synthesis."""
    from easyner_spark.operators.webtext import breadcrumb_edges_oracle_sql

    return breadcrumb_edges_oracle_sql(_BREADCRUMB_PAGES_SQL)


def _section_lists_oracle() -> str:
    """q_section_lists oracle: the sectioned-page synthesis through
    the operator's module-local twin."""
    from easyner_spark.operators.webtext import section_lists_oracle_sql

    return section_lists_oracle_sql(_SECTION_PAGES_SQL)


def _list_memberships_oracle() -> str:
    """q_list_memberships oracle: the rollup twin over the same
    synthesis."""
    from easyner_spark.operators.webtext import list_memberships_oracle_sql

    return list_memberships_oracle_sql(_SECTION_PAGES_SQL)


def _soft404_oracle() -> str:
    """q_soft404 oracle: the error-page synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import soft404_oracle_sql

    pages_sql = """
SELECT 'https://h' || (doc_id % 20) || '.example.com/'
         || (CASE WHEN doc_id % 11 = 0 THEN 'not-found/' ELSE 'p/' END)
         || doc_id AS url,
  CASE WHEN doc_id % 9 = 0
       THEN 'Error 404 page not found. The page does not exist.'
       WHEN doc_id % 13 = 0 THEN text || ' page not found'
       ELSE text END AS text
FROM documents
"""
    return soft404_oracle_sql(pages_sql).replace(
        "length(t) AS n_chars", "length(t)::BIGINT AS n_chars"
    )


def _kg_pattern_oracle() -> str:
    """q_kg_pattern oracle: the naive conjunctive SQL generated from
    the SAME pattern list the Spark side plans greedily."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_TRIPLES_SQL, _KG_PATTERNS, subj="subj", pred="pred", obj="obj"
    )


def _kg_pattern_optional_oracle() -> str:
    """q_kg_pattern_optional oracle: the LEFT JOIN formulation from
    the SAME required patterns + optional groups."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_TRIPLES_SQL,
        _KG_OPT_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        optionals=_KG_OPT_GROUPS,
    )


def _kg_pattern_minus_oracle() -> str:
    """q_kg_pattern_minus oracle: NOT EXISTS formulation from the
    SAME required patterns + MINUS groups."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_RULES_SQL,
        _KG_MINUS_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
        minus=_KG_MINUS_GROUPS,
    )


def _kg_pattern_values_oracle() -> str:
    """q_kg_pattern_values oracle: IN-list formulation from the SAME
    bindings dict."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_RULES_SQL,
        [("?x", "located_in", "?y")],
        subj="subj",
        pred="pred",
        obj="obj",
        bindings=_KG_VALUES_BINDINGS,
    )


def _kg_property_path_oracle() -> str:
    """q_kg_property_path oracle: the rule-KG synthesis through the
    twin's recursive closure formulation."""
    from easyner_spark.operators.triples import match_patterns_oracle_sql

    return match_patterns_oracle_sql(
        _KG_RULES_SQL,
        _KG_PATH_PATTERNS,
        subj="subj",
        pred="pred",
        obj="obj",
    )


def _kg_random_walks_oracle() -> str:
    """q_kg_random_walks oracle: the shared closed edge synthesis fed
    to the operator's module-local unrolled SQL twin."""
    from easyner_spark.operators.graph import kg_random_walks_oracle_sql

    return kg_random_walks_oracle_sql(
        _KG_EDGES_SQL, walk_len=3, walks_per_node=2
    )


_DOCLINKS_PREFIX = """
WITH d AS (
  SELECT doc_id,
    'https://site' || (doc_id % 37) || '.example.net/p/' || doc_id AS src_url,
    '<html><body><a href="https://site' || ((doc_id + 1) % 37)
    || '.example.net/p/' || (doc_id + 1)
    || '">a</a><a href="/p/' || (doc_id % 100)
    || '">b</a><a href="sub/page' || (doc_id % 7)
    || '">c</a><a href="//site' || (doc_id % 37)
    || '.example.net/p/' || (doc_id + 2) || '">d</a>'
    || (CASE WHEN doc_id % 5 = 0
        THEN '<a href="mailto:x@y.z">m</a>' ELSE '' END)
    || '</body></html>' AS html
  FROM documents
),
els AS (SELECT src_url,
               unnest(regexp_extract_all(html,
                 '<a href="[^"]*"[^>]*>[^<]*</a>', 0)) AS el
        FROM d),
pa AS (SELECT src_url,
              regexp_extract(el, 'href="([^"]*)"', 1) AS href
       FROM els)"""


# q_hreflang_clusters oracle: same extraction regexes over the same
# synthesized heads, then the min-label reachability closure
# (_COMPONENTS_ORACLE's pattern on a new edge type).
_HREFLANG_ORACLE = """
WITH RECURSIVE d AS (
  SELECT 'u' || doc_id AS url,
    '<html><head><link rel="alternate" hreflang="'
    || (CASE WHEN doc_id % 4 = 0 THEN 'en'
             WHEN doc_id % 4 = 1 THEN 'sv'
             WHEN doc_id % 4 = 2 THEN 'de' ELSE 'fr' END)
    || '" href="u' || (doc_id - doc_id % 4) || '">'
    || (CASE WHEN doc_id % 8 = 0
        THEN '<link rel="alternate" hreflang="x-default" href="u'
             || (doc_id + 4) || '">'
        ELSE '' END)
    || '</head></html>' AS html
  FROM documents
),
els AS (SELECT url,
               unnest(regexp_extract_all(lower(html),
                 '<link rel="alternate" hreflang="[^"]*" href="[^"]*"', 0)) AS el
        FROM d),
hl_edges AS (
  SELECT DISTINCT url AS a, regexp_extract(el, 'href="([^"]*)"', 1) AS b
  FROM els WHERE regexp_extract(el, 'href="([^"]*)"', 1) != ''
),
hl_sym AS (SELECT a, b FROM hl_edges UNION SELECT b, a FROM hl_edges),
hl_nodes AS (SELECT DISTINCT a AS node FROM hl_sym),
reach(node, lbl) AS (
  SELECT node, node FROM hl_nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN hl_sym e ON r.node = e.a
)
SELECT node, min(lbl) AS cluster FROM reach GROUP BY node
"""


def _stale_pages_oracle() -> str:
    """q_stale_pages oracle: the sitemap-parse oracle as the entries
    subquery + the fetch-date synthesis, through the operator's
    module-local twin."""
    from easyner_spark.operators.webtext import stale_announcements_oracle_sql

    corpus_sql = """SELECT
    'https://s' || (doc_id % 11) || '.example.org/p/' || doc_id AS url,
    '2026-0' || ((doc_id % 7) + 1) || '-15' AS fetch_date
  FROM documents"""
    return stale_announcements_oracle_sql(_sitemap_urls_oracle(), corpus_sql)


def _meta_robots_oracle() -> str:
    """q_meta_robots oracle: the five-variant synthesis fed to the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import meta_robots_oracle_sql

    pages_sql = """SELECT 'u' || doc_id AS url,
    '<html><head>'
    || (CASE WHEN doc_id % 5 = 1
             THEN '<meta name="robots" content="noindex">'
             WHEN doc_id % 5 = 2
             THEN '<meta name="robots" content="NOINDEX, nofollow">'
             WHEN doc_id % 5 = 3
             THEN '<meta name="robots" content="none">'
             WHEN doc_id % 5 = 4
             THEN '<meta name="robots" content="index, follow">'
             ELSE '' END)
    || '</head></html>' AS html
  FROM documents"""
    return meta_robots_oracle_sql(pages_sql)


def _sitemap_urls_oracle() -> str:
    """q_sitemap_urls oracle: the synthetic multi-line sitemap bodies
    fed to the operator's module-local twin."""
    from easyner_spark.operators.webtext import sitemap_parse_oracle_sql

    sitemaps_sql = """SELECT
    'https://s' || (doc_id % 11) || '.example.org/sitemap.xml' AS url,
    '<urlset>' || chr(10) || '<url>' || chr(10)
    || '  <loc>https://s' || (doc_id % 11) || '.example.org/p/' || doc_id
    || '</loc>' || chr(10)
    || '  <lastmod>2026-0' || ((doc_id % 9) + 1) || '-01</lastmod>'
    || chr(10) || '</url>' || chr(10)
    || '<url><loc>https://s' || (doc_id % 11) || '.example.org/q/'
    || (doc_id * 3) || '</loc></url>' || chr(10)
    || '<url><lastmod>2026-01-01</lastmod></url>' || chr(10)
    || '</urlset>' AS sitemap_xml
  FROM documents"""
    return sitemap_parse_oracle_sql(sitemaps_sql)


def _robots_parse_oracle() -> str:
    """q_robots_parse oracle: the synthetic robots.txt bodies fed to
    the operator's module-local twin."""
    from easyner_spark.operators.webtext import parse_robots_oracle_sql

    robots_sql = """SELECT
    'https://r' || (doc_id % 13) || '.example.org/robots.txt' AS url,
    '# robots for host ' || (doc_id % 13)
    || chr(10) || 'User-agent: Googlebot'
    || chr(10) || 'Disallow: /private'
    || chr(10) || 'User-agent: *'
    || chr(10) || 'Disallow: /tmp' || (doc_id % 13)
    || chr(10) || 'Allow: /tmp' || (doc_id % 13) || '/ok   # carve-out'
    || chr(10) || 'Crawl-delay: ' || ((doc_id % 13) + 1)
    || chr(10) || 'Disallow:'
    || chr(10) || 'DISALLOW: /x' || ((doc_id % 13) % 3) AS robots_txt
  FROM documents WHERE doc_id < 13"""
    return parse_robots_oracle_sql(robots_sql)


def _polite_quota_oracle() -> str:
    """q_polite_quota oracle: host page counts + literal delay rows
    fed to the operator's module-local twin."""
    from easyner_spark.operators.sampling import polite_quota_oracle_sql

    weights_sql = (
        _URL_PAGES_CTE
        + "SELECT host AS key, count(*)::BIGINT AS w FROM h GROUP BY host"
    )
    vals = ", ".join(
        ["('hub.example.com', 2)"]
        + [f"('site{i}.example.net', 30)" for i in range(0, 37, 7)]
    )
    delays_sql = (
        f"SELECT * FROM (VALUES {vals}) AS t(key, delay_s)"
    )
    return polite_quota_oracle_sql(
        weights_sql, delays_sql, budget=10_000, epoch_seconds=3600
    )


def _eval_split_oracle() -> str:
    """q_eval_split oracle: narrow documents projection fed to the
    operator's module-local twin."""
    from easyner_spark.operators.sampling import stratified_sample_oracle_sql

    return stratified_sample_oracle_sql(
        "SELECT doc_id, lang FROM documents", total=200
    )


def _crawl_quota_oracle() -> str:
    """q_crawl_quota oracle: per-host page counts from the skewed url
    synthesis fed to the operator's module-local twin."""
    from easyner_spark.operators.sampling import apportion_budget_oracle_sql

    weights_sql = (
        _URL_PAGES_CTE
        + "SELECT host AS key, count(*)::BIGINT AS w FROM h GROUP BY host"
    )
    return apportion_budget_oracle_sql(weights_sql, budget=10_000)


def _page_rank_oracle() -> str:
    """q_page_rank oracle: the doc-link CTE chain continued by the
    shared unrolled PageRank body over in-corpus edges."""
    from easyner_spark.operators.webtext import doc_link_graph_oracle_sql

    pages_sql = (
        "SELECT 'https://site' || (doc_id % 37) || '.example.net/p/'"
        " || doc_id AS url FROM documents"
    )
    return doc_link_graph_oracle_sql(
        _DOCLINKS_PREFIX,
        pages_sql,
        final_sql=_pagerank_oracle_body(
            e_sql="SELECT DISTINCT src_url AS src, dst_url AS dst"
            " FROM flagged WHERE in_corpus"
        ),
    )


def _surt_index_oracle() -> str:
    """q_surt_index oracle: the skewed url synthesis + the operator's
    scalar SQL twin."""
    from easyner_spark.operators.webtext import surt_key_oracle_sql

    return f"""{_URL_PAGES_CTE}
SELECT doc_id::BIGINT AS doc_id, url, {surt_key_oracle_sql("url")} AS surt
FROM p
"""


def _doc_links_oracle() -> str:
    """q_doc_links oracle: the link synthesis prefix + corpus urls fed
    to the operator's module-local twin."""
    from easyner_spark.operators.webtext import doc_link_graph_oracle_sql

    pages_sql = (
        "SELECT 'https://site' || (doc_id % 37) || '.example.net/p/'"
        " || doc_id AS url FROM documents"
    )
    return doc_link_graph_oracle_sql(
        _DOCLINKS_PREFIX, pages_sql, keep_external=True
    )


def _ner_examples_oracle() -> str:
    """q_ner_examples oracle: the shared mentions prelude fed to the
    operator's module-local twin."""
    from easyner_spark.operators.ner_dict import ner_examples_oracle_sql

    return ner_examples_oracle_sql(_PRELUDE, window=3)


def _seed_expansion_oracle() -> str:
    """q_seed_expansion oracle: shared closed-KG edges + literal seed
    rows fed to the operator's module-local twin."""
    from easyner_spark.operators.graph import personalized_pagerank_oracle_sql

    return personalized_pagerank_oracle_sql(
        f"SELECT DISTINCT a AS src, b AS dst FROM ({_KG_EDGES_SQL})",
        "SELECT * FROM (VALUES ('e1'), ('e5')) AS t(node)",
        iters=3,
    )


def _lang_quantiles_oracle() -> str:
    from easyner_spark.operators.sketches import grouped_quantiles_oracle_sql

    return grouped_quantiles_oracle_sql("length(text)", "lang")


def _compaction_plan_oracle() -> str:
    """q_compaction_plan oracle: the synthetic ledger fed to the
    sink's module-local window-cumsum twin."""
    from easyner_spark.sinks.checkpoint import compaction_plan_oracle_sql

    files_sql = """SELECT 'part-' || doc_id || '.parquet' AS path,
    (CASE WHEN doc_id % 19 = 0 THEN 120000
          ELSE 1000 + (doc_id * 37) % 9000 END)::BIGINT AS size_bytes
  FROM documents"""
    return compaction_plan_oracle_sql(files_sql, target_bytes=100_000)


def _kg_degree_stats_oracle() -> str:
    """q_kg_degree_stats oracle: total-degree table of the closed
    graph as the quantile source."""
    from easyner_spark.operators.sketches import exact_quantiles_oracle_sql

    source = f"""(
  WITH e AS (SELECT DISTINCT a, b FROM ({_KG_EDGES_SQL}))
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
  ) GROUP BY node
) AS degsrc"""
    return exact_quantiles_oracle_sql("deg", source=source)


def _walk_skipgrams_oracle() -> str:
    """q_walk_skipgrams oracle: the walks oracle as a MATERIALIZED
    subquery under the operator's module-local twin."""
    from easyner_spark.operators.graph import walk_skipgrams_oracle_sql

    return walk_skipgrams_oracle_sql(_kg_random_walks_oracle(), window=2)


def _kg_negatives_oracle() -> str:
    """q_kg_negatives oracle: the closed triple synthesis fed to the
    operator's module-local SQL twin."""
    from easyner_spark.operators.graph import kg_negatives_oracle_sql

    return kg_negatives_oracle_sql(_KG_TRIPLES_SQL, k=3)


def _kg_rules_oracle() -> str:
    """q_kg_rules oracle: the designed rule-KG synthesis fed to the
    miner's module-local SQL twin."""
    from easyner_spark.operators.triples import mine_rules_oracle_sql

    return mine_rules_oracle_sql(_KG_RULES_SQL, min_support=2)


def _kg_rule_preds_oracle() -> str:
    """q_kg_rule_preds oracle: same synthesis through the prediction
    twin (which composes the miner's oracle as a CTE)."""
    from easyner_spark.operators.triples import rule_predictions_oracle_sql

    return rule_predictions_oracle_sql(
        _KG_RULES_SQL, min_support=2, min_pca_micro=700_000
    )


def _kg_pred_signatures_oracle() -> str:
    """q_kg_pred_signatures oracle: rule-KG triples + the residue
    type table through the operator's module-local twin."""
    from easyner_spark.operators.triples import predicate_signatures_oracle_sql

    return predicate_signatures_oracle_sql(_KG_RULES_SQL, _KG_TYPES_SQL)


def _kg_pred_equiv_oracle() -> str:
    """q_kg_pred_equiv oracle: rule-KG triples through the operator's
    module-local pair-set overlap twin."""
    from easyner_spark.operators.triples import predicate_equivalences_oracle_sql

    return predicate_equivalences_oracle_sql(_KG_RULES_SQL)


def _kg_type_infer_oracle() -> str:
    """q_kg_type_infer oracle: rule-KG triples + the sparse type
    table through the operator's module-local vote twin."""
    from easyner_spark.operators.triples import infer_entity_types_oracle_sql

    return infer_entity_types_oracle_sql(_KG_RULES_SQL, _KG_SPARSE_TYPES_SQL)


def _kg_shortest_paths_oracle() -> str:
    """q_kg_shortest_paths oracle: the rule-KG edge set walked
    backwards from the landmarks by the operator's recursive twin."""
    from easyner_spark.operators.graph import shortest_paths_oracle_sql

    prefix = f"""WITH RECURSIVE kgrE AS ({_KG_RULES_SQL}),
spE AS (SELECT DISTINCT subj AS a, obj AS b FROM kgrE WHERE subj <> obj)"""
    return shortest_paths_oracle_sql(prefix, ("n0", "n5"), k=3)


def _kg_paths_oracle() -> str:
    """q_kg_paths_2hop oracle: fenced simple-path recursion over the
    same edge set."""
    from easyner_spark.operators.graph import kg_paths_oracle_sql

    prefix = f"""WITH RECURSIVE kgrE AS ({_KG_RULES_SQL}),
kpE AS (SELECT DISTINCT subj AS a, obj AS b FROM kgrE WHERE subj <> obj)"""
    return kg_paths_oracle_sql(
        prefix, sources=("n1", "n2"), targets=("n0", "n3"), max_len=3
    )


def _kg_schema_graph_oracle() -> str:
    """q_kg_schema_graph oracle: rule-KG triples + residue types
    through the operator's module-local quotient twin."""
    from easyner_spark.operators.triples import schema_graph_oracle_sql

    return schema_graph_oracle_sql(_KG_RULES_SQL, _KG_TYPES_SQL)


def _kg_metapath_oracle() -> str:
    """q_kg_metapath oracle: rule-KG triples through the operator's
    chained-hop twin."""
    from easyner_spark.operators.triples import metapath_join_oracle_sql

    return metapath_join_oracle_sql(
        _KG_RULES_SQL, ("works_for", "located_in")
    )


def _kg_pathsim_oracle() -> str:
    """q_kg_pathsim oracle: affiliation-KG triples through the
    operator's flat-CTE PathSim twin (the fixture's own WITH folds
    into the twin's chain via a subquery)."""
    from easyner_spark.operators.triples import metapath_pathsim_oracle_sql

    return metapath_pathsim_oracle_sql(
        f"SELECT * FROM ({_KG_AFFIL_SQL})", ("works_for", "employs")
    )


def _recrawl_schedule_oracle() -> str:
    """q_recrawl_schedule oracle: the crawl_delta pages synthesis
    through the operator's module-local twin."""
    from easyner_spark.operators.webtext import recrawl_schedule_oracle_sql

    pages_sql = """SELECT
  'https://site' || (doc_id % 100) || '.example.net/p' AS url,
  1700000000 + doc_id AS warc_ts,
  'page content ' || (doc_id % 100)
  || (CASE WHEN doc_id % 7 < 2 THEN ' v2' ELSE '' END) AS text
  FROM documents"""
    return recrawl_schedule_oracle_sql(pages_sql)


def _temp_mixture_oracle() -> str:
    """q_temp_mixture oracle: the SAME driver-side rate dict (one
    Python source of truth) embedded as ppm literals over the shared
    BIGINT md5 gate."""
    rates = _temp_mixture_rates()
    case = " ".join(
        f"WHEN '{g}' THEN {ppm}" for g, ppm in sorted(rates.items())
    )
    return _URL_PAGES_CTE + f"""
SELECT doc_id, url, lang FROM h
WHERE ('0x' || substr(md5(url), 1, 8))::BIGINT * 1000000
      < (CASE lang {case} ELSE 0 END)::BIGINT * 4294967296
"""


_KG_ALIGN_PAIRS_SQL = """SELECT 's' || (doc_id % 25) AS a,
  't' || (doc_id % 40) AS b,
  (doc_id % 97)::BIGINT AS score
  FROM documents"""


def _kg_align_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, score) twin of _KG_ALIGN_PAIRS_SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    return d.select(
        F.concat(F.lit("s"), (did % 25).cast("string")).alias("a"),
        F.concat(F.lit("t"), (did % 40).cast("string")).alias("b"),
        (did % 97).cast("long").alias("score"),
    )


def q_kg_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-best-match entity alignment over a deterministic
    scored candidate table (25 source x 40 target entities, residue
    scores): keep (a, b) only when each is the other's argmax —
    min(struct) argmax both ways, lexicographic tie-break, exact
    integers."""
    from easyner_spark.operators.nel import reciprocal_best_links

    return reciprocal_best_links(_kg_align_pairs(spark, sf_dir))


def _kg_align_oracle() -> str:
    """q_kg_align oracle: the candidate synthesis through the
    operator's window-formulated twin."""
    from easyner_spark.operators.nel import reciprocal_best_links_oracle_sql

    return reciprocal_best_links_oracle_sql(_KG_ALIGN_PAIRS_SQL)


def _blocking_quality_oracle() -> str:
    """q_blocking_quality oracle: the module twin's arithmetic with
    n_records computed in-SQL (count of documents, matching the Spark
    side's d.count())."""
    return f"""
WITH bq_cand AS (
  SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
  FROM ({_BQ_CAND_SQL}) WHERE a <> b
),
bq_gold AS (
  SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
  FROM ({_BQ_GOLD_SQL}) WHERE a <> b
),
bq_counts AS (
  SELECT
    (SELECT count(*) FROM bq_cand)::BIGINT AS n_cand,
    (SELECT count(*) FROM bq_gold)::BIGINT AS n_gold,
    (SELECT count(*) FROM bq_cand c
       WHERE EXISTS (SELECT 1 FROM bq_gold g
                     WHERE g.lo = c.lo AND g.hi = c.hi))::BIGINT AS n_true,
    (SELECT count(*) FROM documents)::BIGINT AS nrec
)
SELECT n_cand, n_gold, n_true,
  CASE WHEN n_gold > 0
       THEN (1000000 * n_true) // n_gold ELSE NULL END::BIGINT AS pc_micro,
  CASE WHEN n_cand > 0
       THEN (1000000 * n_true) // n_cand ELSE NULL END::BIGINT AS pq_micro,
  (1000000 - (1000000 * n_cand) // ((nrec * (nrec - 1)) // 2))::BIGINT
    AS rr_micro
FROM bq_counts
"""


def _kg_shapes_oracle() -> str:
    """q_kg_shapes oracle: rule-KG triples + residue types + the
    declared shapes through the operator's module-local twin."""
    from easyner_spark.operators.triples import validate_shapes_oracle_sql

    return validate_shapes_oracle_sql(
        _KG_RULES_SQL, _KG_TYPES_SQL, _KG_SHAPES_SQL
    )


def _kg_ntriples_oracle() -> str:
    """q_kg_ntriples oracle: the escape-exercising synthesis through
    the sink's module-local twin (escape chains generated from the
    same pair tables)."""
    from easyner_spark.sinks.rdf import to_ntriples_oracle_sql

    return to_ntriples_oracle_sql(_NT_SRC_SQL)


def _pred_support_oracle() -> str:
    """q_pred_support oracle: the provenance synthesis through the
    operator's module-local twin."""
    from easyner_spark.operators.triples import (
        predicate_support_profile_oracle_sql,
    )

    return predicate_support_profile_oracle_sql(_PRED_SUPPORT_SQL)


def _entity_cards_oracle() -> str:
    """q_entity_cards oracle: rule-KG triples through the operator's
    module-local rank twin."""
    from easyner_spark.operators.triples import entity_summaries_oracle_sql

    return entity_summaries_oracle_sql(_KG_RULES_SQL, k=3)


def _zorder_keys_oracle() -> str:
    """q_zorder_keys oracle: the SAME generated bit-interleave
    expression (layout.zorder_key_sql) over the same dimensions."""
    from easyner_spark.sinks.layout import zorder_key_sql

    return f"""
SELECT doc_id, x, y, {zorder_key_sql(["x", "y"], bits=6)} AS zkey
FROM (SELECT doc_id, doc_id % 64 AS x, (doc_id * 7) % 64 AS y
      FROM documents)
"""


def _host_kmv_oracle() -> str:
    """q_host_kmv oracle: the shared token synthesis through the
    sketch's module-local rank twin."""
    from easyner_spark.operators.sketches import kmv_sketch_oracle_sql

    return kmv_sketch_oracle_sql(
        _KMV_SRC_SQL, "host", "tok", k=64, group_alias="host"
    )


def _kmv_set_ops_oracle() -> str:
    """q_kmv_set_ops oracle: same synthesis through the pairwise
    set-operation twin."""
    from easyner_spark.operators.sketches import kmv_set_ops_oracle_sql

    return kmv_set_ops_oracle_sql(_KMV_SRC_SQL, "host", "tok", k=64)


def _entity_bursts_oracle() -> str:
    """q_entity_bursts oracle: the shared mentions prelude extended
    with m(entity, epoch), fed to the operator's module-local twin."""
    from easyner_spark.operators.analysis import entity_bursts_oracle_sql

    prefix = (
        _PRELUDE
        + """, m AS (
  SELECT mention_lc AS entity, (doc_id % 5)::BIGINT AS epoch FROM mentions
)"""
    )
    return entity_bursts_oracle_sql(prefix)


def _html_meta_oracle() -> str:
    """q_html_meta oracle: head-tag synthesis mirrored verbatim, fed
    to the operator's module-local SQL twin."""
    from easyner_spark.operators.webtext import extract_meta_oracle_sql

    pages_sql = f"""SELECT (CASE WHEN doc_id % 13 = 0 THEN 'http' ELSE 'https' END)
    || '://' || {_URL_HOST_CASE}
    || (CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END)
    || '/p/' || doc_id AS url,
  '<html><head>'
  || (CASE WHEN doc_id % 4 = 0 THEN '' ELSE
      (CASE WHEN doc_id % 5 = 0 THEN '<TITLE> ' ELSE '<title> ' END)
      || 'Doc ' || (doc_id % 211)
      || (CASE WHEN doc_id % 5 = 0 THEN ' </TITLE>' ELSE ' </title>' END) END)
  || (CASE WHEN doc_id % 2 = 0
      THEN '<meta name="description" content="summary ' || (doc_id % 50) || '">'
      ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0
      THEN '<link rel="canonical" href="https://hub.example.com/c/'
           || (doc_id % 97) || '">'
      ELSE '' END)
  || '</head><body>x</body></html>' AS html
FROM documents"""
    return extract_meta_oracle_sql(pages_sql)


# Anchor extraction WITH-chain shared by the anchor_terms and
# alias_candidates oracles: url/html synthesis mirrored verbatim from
# _synth_anchor_pages, element/href/text pulls + target classifier
# mirrored from webtext.extract_anchors. Last relation:
# t(src_host, anchor, dst_host).
_ANCHORS_PREFIX = f"""
WITH d AS (
  SELECT doc_id,
    regexp_replace(lower(regexp_extract(
      (CASE WHEN doc_id % 13 = 0 THEN 'http' ELSE 'https' END) || '://'
      || {_URL_HOST_CASE}
      || (CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END)
      || '/p/' || doc_id,
      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), ':\\d+$', '') AS src_host,
    '<html><body><a href="https://site' || ((doc_id * 7) % 37)
    || '.example.net/p/1">Read Page ' || (doc_id % 211) || '</a>'
    || '<a href="/local/' || (doc_id % 5) || '">'
    || (CASE WHEN doc_id % 3 = 0 THEN 'Home & Garden' ELSE 'next-page 2' END)
    || '</a>'
    || (CASE WHEN doc_id % 4 = 0
        THEN '<a href="//hub.example.com/z">The HUB portal</a>' ELSE '' END)
    || '</body></html>' AS html
  FROM documents
),
els AS (SELECT src_host,
               unnest(regexp_extract_all(html,
                 '<a href="[^"]*"[^>]*>[^<]*</a>', 0)) AS el
        FROM d),
pa AS (SELECT src_host,
              regexp_extract(el, 'href="([^"]*)"', 1) AS href,
              regexp_extract(el, '>([^<]*)</a>', 1) AS anchor
       FROM els),
t AS (
  SELECT src_host, anchor,
    CASE WHEN regexp_matches(href, '^[hH][tT][tT][pP][sS]?://')
         THEN regexp_replace(lower(regexp_extract(href,
                '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), ':\\d+$', '')
         WHEN href LIKE '//%'
         THEN regexp_replace(lower(regexp_extract(href,
                '^//([^/?#]+)', 1)), ':\\d+$', '')
         WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN NULL
         ELSE src_host END AS dst_host
  FROM pa
)"""


def _alias_candidates_oracle() -> str:
    """q_alias_candidates oracle: the shared anchors prefix fed to the
    operator's module-local twin."""
    from easyner_spark.operators.webtext import alias_candidates_oracle_sql

    return alias_candidates_oracle_sql(_ANCHORS_PREFIX)


# Host link-graph CTE: url/html synthesis mirrored verbatim from
# _synth_html_pages, href extraction + classifier mirrored from
# webtext.extract_links (same regexes, same when-chain order).
_HOSTLINKS_CTE = f"""
WITH d AS (
  SELECT doc_id,
    regexp_replace(lower(regexp_extract(
      (CASE WHEN doc_id % 13 = 0 THEN 'http' ELSE 'https' END) || '://'
      || {_URL_HOST_CASE}
      || (CASE WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END)
      || '/p/' || doc_id,
      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), ':\\d+$', '') AS src_host,
    '<html><body><p>t</p><a href="https://site' || ((doc_id * 7) % 37)
    || '.example.net/p/1">x</a><a href="/local/' || (doc_id % 5) || '">y</a>'
    || (CASE WHEN doc_id % 3 = 0 THEN '<a href="//hub.example.com/z">z</a>' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0 THEN '<a href="mailto:a@b.c">m</a>' ELSE '' END)
    || '</body></html>' AS html
  FROM documents
),
l AS (SELECT src_host,
             unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
      FROM d),
t AS (
  SELECT src_host,
    CASE WHEN regexp_matches(href, '^[hH][tT][tT][pP][sS]?://')
         THEN regexp_replace(lower(regexp_extract(href,
                '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), ':\\d+$', '')
         WHEN href LIKE '//%'
         THEN regexp_replace(lower(regexp_extract(href,
                '^//([^/?#]+)', 1)), ':\\d+$', '')
         WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN NULL
         ELSE src_host END AS dst_host
  FROM l
),
hg AS (
  SELECT src_host, dst_host, count(*) AS n_links
  FROM t WHERE dst_host IS NOT NULL AND dst_host != ''
  GROUP BY src_host, dst_host
)
"""


def _sample_oracle() -> str:
    """md5-threshold sampling gate — threshold shared with
    sampling.sample_threshold so both engines cut on the same 12-hex
    prefix string."""
    from easyner_spark.operators.sampling import sample_threshold

    return (
        _URL_PAGES_CTE
        + f"""
SELECT doc_id::BIGINT AS doc_id, url FROM p
WHERE substring(md5('r3' || url), 1, 12) < '{sample_threshold(0.3)}'
"""
    )


def _gopher_oracle() -> str:
    from easyner_spark.operators.textstats import STOPWORDS_EN

    stop = _sql_list(STOPWORDS_EN)
    # n_ellipsis: the '...'-strip always removes a multiple of 3 chars,
    # so the /3 is integer-exact and the BIGINT cast cannot diverge
    # from Spark's truncating cast.
    return f"""
WITH t0 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0
         THEN '- ' || regexp_replace(text, ' a ', chr(10) || '- ', 'g')
         ELSE regexp_replace(text, ' a ', chr(10), 'g') END AS t
  FROM documents
),
t1 AS (SELECT doc_id, CASE WHEN doc_id % 9 = 0 THEN replace(t, chr(10), '...' || chr(10)) ELSE t END AS t FROM t0),
t2 AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN t || ' ...' ELSE t END AS t FROM t1),
t3 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN t || chr(10) || 'see #a #b #c #d #e #f #g' ELSE t END AS t FROM t2),
txt AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN t || chr(10) || t ELSE t END AS text FROM t3),
feat AS (
  SELECT doc_id, text,
    regexp_extract_all(lower(text), '\\w+') AS words,
    string_split(text, chr(10)) AS lines
  FROM txt
),
ints AS (
  SELECT doc_id,
    len(words) AS n_words,
    list_sum(list_transform(words, w -> length(w))) AS sum_wlen,
    len(list_filter(words, w -> list_contains({stop}, w))) AS n_stop,
    len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS n_alpha_words,
    len(lines) AS n_lines,
    len(list_distinct(lines)) AS n_dist_lines,
    len(list_filter(lines, l -> regexp_matches(l, '^[ \\t]*[-*]'))) AS n_bullet,
    len(list_filter(lines, l -> l LIKE '%...')) AS n_ell_lines,
    length(text) - length(replace(text, '#', '')) AS n_hash,
    ((length(text) - length(replace(text, '...', ''))) / 3)::BIGINT AS n_ellipsis
  FROM feat
),
r AS (
  SELECT doc_id, n_words, n_lines, n_stop,
    CASE WHEN n_words > 0 THEN sum_wlen / n_words ELSE 0.0::DOUBLE END AS mean_wlen,
    CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) / n_words ELSE 0.0::DOUBLE END AS sym,
    CASE WHEN n_lines > 0 THEN n_bullet / n_lines ELSE 0.0::DOUBLE END AS bul,
    CASE WHEN n_lines > 0 THEN n_ell_lines / n_lines ELSE 0.0::DOUBLE END AS ell,
    CASE WHEN n_words > 0 THEN n_alpha_words / n_words ELSE 0.0::DOUBLE END AS alp,
    CASE WHEN n_lines > 0 THEN 1.0::DOUBLE - n_dist_lines / n_lines ELSE 0.0::DOUBLE END AS dup
  FROM ints
)
SELECT doc_id,
  n_words::BIGINT AS n_words,
  n_lines::BIGINT AS n_lines,
  round(mean_wlen, 6) AS mean_word_len,
  round(sym, 6) AS symbol_word_ratio,
  round(bul, 6) AS bullet_line_ratio,
  round(ell, 6) AS ellipsis_line_ratio,
  round(alp, 6) AS alpha_word_ratio,
  round(dup, 6) AS dup_line_frac,
  (n_words >= 30 AND n_words <= 100) AS word_count_ok,
  (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS mean_word_len_ok,
  (sym <= 0.1) AS symbol_ratio_ok,
  (bul <= 0.9) AS bullet_ok,
  (ell <= 0.3) AS ellipsis_ok,
  (alp >= 0.8) AS alpha_ok,
  (n_stop >= 2) AS stopword_ok,
  (dup <= 0.3) AS dup_line_ok,
  (n_words >= 30 AND n_words <= 100 AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
   AND sym <= 0.1 AND bul <= 0.9 AND ell <= 0.3 AND alp >= 0.8
   AND n_stop >= 2 AND dup <= 0.3) AS gopher_keep
FROM r
"""


def _hits_oracle_body(
    iters: int = 3,
    e_sql: str = "SELECT DISTINCT src_host AS src, dst_host AS dst FROM hg",
) -> str:
    """Unrolled HITS CTE chain mirroring operators/graph.hits' op
    order exactly: per iteration, authority = round(sum of PREVIOUS
    hubs over in-edges / max, 9) for every node (missing -> 0), then
    hub = round(sum of NEW authorities over out-edges / max, 9);
    output rounds to 6."""
    parts = [
        f"""
, e AS ({e_sql}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
h0 AS (SELECT node, 1.0 AS hub FROM nodes)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
a{t}_raw AS (
  SELECT e.dst AS node, sum(h.hub) AS v
  FROM e JOIN h{t - 1} h ON e.src = h.node GROUP BY e.dst
),
a{t} AS (
  SELECT nodes.node,
         round(coalesce(r.v, 0.0) / (SELECT max(v) FROM a{t}_raw), 9) AS auth
  FROM nodes LEFT JOIN a{t}_raw r ON nodes.node = r.node
),
h{t}_raw AS (
  SELECT e.src AS node, sum(a.auth) AS v
  FROM e JOIN a{t} a ON e.dst = a.node GROUP BY e.src
),
h{t} AS (
  SELECT nodes.node,
         round(coalesce(r.v, 0.0) / (SELECT max(v) FROM h{t}_raw), 9) AS hub
  FROM nodes LEFT JOIN h{t}_raw r ON nodes.node = r.node
)"""
        )
    parts.append(
        f"""
SELECT a.node, round(a.auth, 6) AS authority, round(h.hub, 6) AS hub
FROM a{iters} a JOIN h{iters} h ON a.node = h.node
"""
    )
    return "".join(parts)


def _clustering_oracle() -> str:
    from easyner_spark.operators.graph import clustering_coeff_oracle_sql

    return clustering_coeff_oracle_sql(_cooc_pairs_cte())


def _modularity_oracle() -> str:
    from easyner_spark.operators.graph import modularity_oracle_sql

    prefix = _PRELUDE + _lpa_oracle_body(
        final_sql=",\nlab AS (SELECT node, label AS community FROM it3)"
    )
    return modularity_oracle_sql(prefix)


def _snapshot_diff_oracle() -> str:
    from easyner_spark.operators.graph import edge_diff_oracle_sql

    keys = ("subj_id", "pred", "obj_id")
    old_sql = (
        "SELECT subj_id, pred, obj_id, count(*) AS weight FROM triples"
        " WHERE doc_id % 5 < 4 GROUP BY subj_id, pred, obj_id"
    )
    new_sql = (
        "SELECT subj_id, pred, obj_id, count(*) AS weight FROM triples"
        " GROUP BY subj_id, pred, obj_id"
    )
    return _PRELUDE + edge_diff_oracle_sql(
        old_sql, new_sql, keys=keys, continuation=True
    )


def _host_trust_oracle() -> str:
    from easyner_spark.operators.graph import spam_mass_oracle_sql

    return _HOSTLINKS_CTE + spam_mass_oracle_sql(
        e_sql="SELECT DISTINCT src_host AS src, dst_host AS dst FROM hg",
        seeds_sql="SELECT 'hub.example.com' AS node"
        " UNION ALL SELECT 'blog.example.org' AS node",
    )


def _doc_keywords_oracle() -> str:
    from easyner_spark.operators.ranking import doc_keywords_oracle_sql

    return doc_keywords_oracle_sql(k=5)


def _assortativity_oracle() -> str:
    from easyner_spark.operators.graph import degree_assortativity_oracle_sql

    return degree_assortativity_oracle_sql(_cooc_pairs_cte())


def _merge_cands_oracle() -> str:
    from easyner_spark.operators.nel import edit_merge_candidates_oracle_sql

    return edit_merge_candidates_oracle_sql(_MERGE_LABELS_SQL, max_dist=2)


def _host_wrank_oracle() -> str:
    from easyner_spark.operators.graph import weighted_pagerank_oracle_sql

    return _HOSTLINKS_CTE + weighted_pagerank_oracle_sql(
        e_sql="SELECT src_host AS src, dst_host AS dst,"
        " n_links::BIGINT AS w FROM hg"
    )


def _kwic_oracle() -> str:
    from easyner_spark.operators.search import kwic_oracle_sql

    terms = " UNION ALL ".join(f"SELECT '{t}' AS term" for t in _KWIC_TERMS)
    mentions_sql = f"""
SELECT doc_id::VARCHAR AS url, 0::BIGINT AS sent_idx,
       (strpos(text, t.term) - 1)::BIGINT AS begin,
       (strpos(text, t.term) - 1 + length(t.term))::BIGINT AS "end",
       t.term AS mention
FROM documents CROSS JOIN ({terms}) t
WHERE strpos(text, t.term) > 0"""
    sentences_sql = (
        "SELECT doc_id::VARCHAR AS url, 0::BIGINT AS sent_idx,"
        " text AS sentence FROM documents"
    )
    return kwic_oracle_sql(mentions_sql, sentences_sql, window=20)


def _citations_oracle() -> str:
    from easyner_spark.operators.webtext import citation_facts_oracle_sql

    return citation_facts_oracle_sql(_CITATION_PAGES_SQL)


def _dates_oracle() -> str:
    from easyner_spark.operators.webtext import date_facts_oracle_sql

    return date_facts_oracle_sql(_DATE_PAGES_SQL)


def _window_cooc_oracle() -> str:
    from easyner_spark.operators.graph import window_cooc_oracle_sql

    occ = (
        "SELECT DISTINCT doc_id AS d, sent_idx AS s,"
        " mention_lc AS t, begin_tok AS p FROM mentions"
    )
    return _PRELUDE + ",\nwcbase AS (" + occ + ")" + window_cooc_oracle_sql(
        "SELECT * FROM wcbase", window=5
    ).replace("WITH wco AS", ", wco AS", 1).lstrip("\n")


def _harmonic_oracle() -> str:
    from easyner_spark.operators.graph import harmonic_centrality_oracle_sql

    prefix = _PRELUDE.replace("WITH sent0", "WITH RECURSIVE sent0", 1) + """
, hc_edges AS (SELECT DISTINCT subj_id AS a, obj_id AS b FROM triples
               WHERE subj_id <> obj_id),
hc_sym AS (SELECT a, b FROM hc_edges UNION SELECT b, a FROM hc_edges),
hc_nodes AS (SELECT DISTINCT a AS node FROM hc_sym),
hc_walk(source, node, dist) AS (
  SELECT node, node, 0 FROM hc_nodes
  UNION
  SELECT w.source, e.b, w.dist + 1
  FROM hc_walk w JOIN hc_sym e ON w.node = e.a
  WHERE w.dist < 2
),
hcw AS (
  SELECT source, node, min(dist)::BIGINT AS dist
  FROM hc_walk GROUP BY source, node
)"""
    return harmonic_centrality_oracle_sql(prefix, k=2)


def _microdata_oracle() -> str:
    from easyner_spark.operators.webtext import extract_microdata_oracle_sql

    return extract_microdata_oracle_sql(_MICRODATA_PAGES_SQL)


def _unescape_oracle() -> str:
    from easyner_spark.operators.webtext import html_unescape_sql

    raw = """'v&amp;'
  || (CASE WHEN doc_id % 2 = 0 THEN '&lt;tag&gt; ' ELSE '' END)
  || (CASE WHEN doc_id % 3 = 0 THEN '&quot;q&#39; ' ELSE '' END)
  || (CASE WHEN doc_id % 5 = 0 THEN '&amp;lt;dbl ' ELSE '' END)
  || 'w&nbsp;z'"""
    return f"""
WITH ue AS (SELECT 'u' || doc_id AS url, {raw} AS raw FROM documents)
SELECT url, raw, {html_unescape_sql('raw')} AS clean FROM ue
"""


def _host_scc_oracle() -> str:
    from easyner_spark.operators.graph import bounded_scc_oracle_sql

    prefix = _HOSTLINKS_CTE.replace("WITH d AS", "WITH RECURSIVE d AS", 1) + """
, sccE AS (SELECT DISTINCT src_host AS a, dst_host AS b FROM hg
           WHERE src_host != dst_host)"""
    return bounded_scc_oracle_sql(prefix, k=3)


_PRONOUN_TOKS_CTE = """
WITH pl0 AS (
  SELECT doc_id,
         regexp_replace(lower(text), ' the ', ' it ', 'g') AS t
  FROM documents
),
plt0 AS (
  SELECT doc_id, 0::BIGINT AS sent_idx,
         generate_subscripts(regexp_extract_all(t, '\\w+|[^\\w\\s]'), 1) - 1
           AS tok_idx,
         unnest(regexp_extract_all(t, '\\w+|[^\\w\\s]')) AS tok
  FROM pl0
)"""


def _pronoun_links_oracle() -> str:
    from easyner_spark.operators.triples import pronoun_links_oracle_sql

    return _PRONOUN_TOKS_CTE + pronoun_links_oracle_sql(
        "SELECT doc_id, sent_idx, tok_idx, tok FROM plt0",
        "SELECT doc_id, sent_idx, tok_idx AS begin_tok,"
        " tok_idx + 1 AS end_tok, tok AS term FROM plt0"
        " WHERE tok IN ('hash', 'scan')",
        lookback=0,
    )


def _kappa_oracle() -> str:
    from easyner_spark.operators.evaluate import cohens_kappa_oracle_sql

    pred = (
        "SELECT doc_id, sent_idx, tok_idx,"
        " CASE WHEN tok = 'hash' AND tok_idx % 2 = 0 THEN 'B'"
        " ELSE 'O' END AS label FROM plt0"
    )
    gold = (
        "SELECT doc_id, sent_idx, tok_idx,"
        " CASE WHEN tok IN ('hash', 'scan') THEN 'B'"
        " ELSE 'O' END AS label FROM plt0"
    )
    return _PRONOUN_TOKS_CTE + cohens_kappa_oracle_sql(pred, gold)


def _host_topics_oracle() -> str:
    from easyner_spark.operators.webtext import host_topics_oracle_sql

    hosts = f"""SELECT doc_id::VARCHAR AS url, {_URL_HOST_CASE} AS host
FROM documents"""
    return _PRELUDE + host_topics_oracle_sql(
        "SELECT doc_id::VARCHAR AS url, mention_lc AS term FROM mentions",
        hosts,
    )


def _passive_triples_oracle() -> str:
    """Passive rule on TOKEN indices: an (aux, participle, 'by')
    lead from the leads CTE that spans the ENTIRE pair gap — aux at
    gb, 'by' at ge - 1 (strict adjacency, ADVICE r3: the unanchored
    range test also fired for non-adjacent pairs around the phrase),
    output roles flipped. The engine's anchored trim-equals char
    regex sees exactly these phrases because the injected pattern is
    space-separated word-soup tokens."""
    from easyner_spark.operators.triples import PASSIVE_AUX, PASSIVE_LEXICON

    lex_values = ", ".join(
        f"('{s_}', '{c}')" for s_, c in sorted(PASSIVE_LEXICON.items())
    )
    aux_list = ", ".join(f"'{a}'" for a in PASSIVE_AUX)
    prelude = _PRELUDE.replace(
        "regexp_replace(text, ' a ', '. ', 'g')",
        "regexp_replace(regexp_replace(text, ' slow ', ' is inhibited by ',"
        " 'g'), ' a ', '. ', 'g')",
    )
    return (
        prelude
        + f"""
, pvf2 AS (
  SELECT doc_id, sent_idx, entity_id, begin_tok, end_tok,
         row_number() OVER (PARTITION BY doc_id, sent_idx
                            ORDER BY begin_tok, end_tok, entity_id) AS ord
  FROM firsts WHERE rn = 1
),
pvpp AS (
  SELECT a.doc_id, a.sent_idx, a.entity_id AS first_id,
         b.entity_id AS second_id, a.end_tok AS gb, b.begin_tok AS ge
  FROM pvf2 a JOIN pvf2 b
    ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.ord < b.ord
),
pvlex(surface, canon) AS (VALUES {lex_values}),
pvhits AS (
  SELECT l.doc_id, l.sent_idx, l.tok_idx, x.canon
  FROM leads l JOIN pvlex x ON lower(l.t1) = x.surface
  WHERE lower(l.t0) IN ({aux_list}) AND lower(l.t2) = 'by'
),
pvhit AS (
  SELECT p.doc_id, p.sent_idx, p.first_id, p.second_id,
         arg_min(h.canon, h.tok_idx) AS canon
  FROM pvpp p
  JOIN pvhits h
    ON h.doc_id = p.doc_id AND h.sent_idx = p.sent_idx
   AND h.tok_idx = p.gb AND h.tok_idx + 3 = p.ge
  GROUP BY p.doc_id, p.sent_idx, p.first_id, p.second_id
)
SELECT doc_id, sent_idx::BIGINT AS sent_idx, second_id AS subj_id,
       canon AS pred, first_id AS obj_id
FROM pvhit
"""
    )


def _nominal_triples_oracle() -> str:
    """Nominalization rule on TOKEN indices: a leads row at
    A.begin_tok - 2 must carry (nominal-in-lexicon, 'of'), the token
    at A.end_tok must be 'by' with B starting right after — the exact
    token mirror of the engine's char contract (prefix ends with
    '<nominal> of ', gap trim-equals 'by') on the single-space
    word-soup corpus. Roles flipped: B is the subject."""
    from easyner_spark.operators.triples import NOMINAL_LEXICON

    lex_values = ", ".join(
        f"('{s_}', '{c}')" for s_, c in sorted(NOMINAL_LEXICON.items())
    )
    prelude = _PRELUDE.replace(
        "regexp_replace(text, ' a ', '. ', 'g')",
        "regexp_replace(regexp_replace(regexp_replace(text, ' slow ',"
        " ' inhibition of hash by ', 'g'), ' big ',"
        " ' suppression of merge by ', 'g'), ' a ', '. ', 'g')",
    )
    return (
        prelude
        + f"""
, nmf AS (
  SELECT doc_id, sent_idx, entity_id, begin_tok, end_tok,
         row_number() OVER (PARTITION BY doc_id, sent_idx
                            ORDER BY begin_tok, end_tok, entity_id) AS ord
  FROM firsts WHERE rn = 1
),
nmpp AS (
  SELECT a.doc_id, a.sent_idx, a.entity_id AS first_id,
         b.entity_id AS second_id,
         a.begin_tok AS ab, a.end_tok AS ae, b.begin_tok AS bb
  FROM nmf a JOIN nmf b
    ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.ord < b.ord
),
nmlex(surface, canon) AS (VALUES {lex_values}),
nmhit AS (
  SELECT p.doc_id, p.sent_idx, p.first_id, p.second_id, x.canon
  FROM nmpp p
  JOIN leads l1 ON l1.doc_id = p.doc_id AND l1.sent_idx = p.sent_idx
               AND l1.tok_idx = p.ab - 2 AND lower(l1.t1) = 'of'
  JOIN nmlex x ON lower(l1.t0) = x.surface
  JOIN leads l2 ON l2.doc_id = p.doc_id AND l2.sent_idx = p.sent_idx
               AND l2.tok_idx = p.ae AND lower(l2.t0) = 'by'
  WHERE p.bb = p.ae + 1
)
SELECT doc_id, sent_idx::BIGINT AS sent_idx, second_id AS subj_id,
       canon AS pred, first_id AS obj_id
FROM nmhit
"""
    )


def _pagerank_oracle_body(
    iters: int = 3,
    e_sql: str = "SELECT DISTINCT subj_id AS src, obj_id AS dst FROM triples",
    final_sql: str | None = None,
) -> str:
    """Unrolled PageRank CTE chain over a distinct edge list (default:
    the triple graph; host_rank passes the link-graph edges),
    mirroring operators/graph.pagerank's op order exactly: base =
    (1.0 - 0.85) / N, inflow = sum(rank / deg), state = round(base +
    0.85 * coalesce(inflow, 0.0), 9), output round(·, 6).

    `final_sql` replaces the default terminal SELECT so consumers can
    keep composing CTEs on top of the final iteration (crawl_priority
    joins the ranks against recrawl change rates); it must start with
    ', ' (CTE continuation) or a SELECT."""
    parts = [
        f"""
, e AS ({e_sql}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, count(*)::DOUBLE AS deg FROM e GROUP BY src),
it0 AS (SELECT node, round(1.0 / nn.n, 9) AS rank FROM nodes CROSS JOIN nn)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
it{t} AS (
  SELECT nodes.node,
         round((1.0 - 0.85) / nn.n + 0.85 * coalesce(s.inflow, 0.0), 9) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / deg.deg) AS inflow
    FROM e
    JOIN deg ON e.src = deg.src
    JOIN it{t - 1} r ON e.src = r.node
    GROUP BY e.dst
  ) s ON nodes.node = s.node
)"""
        )
    parts.append(
        final_sql
        if final_sql is not None
        else f"\nSELECT node, round(rank, 6) AS rank FROM it{iters}\n"
    )
    return "".join(parts)


# min-label reachability closure over the co-occurrence triple graph —
# shared by the `components` oracle and (identically, by the
# incremental contract) `incremental_components`.
# Preferred labels: the canonical linked (entity, surface) stream +
# the deterministic md5-bucket component map + the min(struct(-n, s))
# argmax
_ENTITY_LABELS_ORACLE = _PRELUDE + """
, cmap AS (
  SELECT node, 'g' || substr(md5(node), 1, 1) AS component
  FROM (SELECT DISTINCT pa.id AS node
        FROM mentions m
        JOIN (SELECT term, min(id) AS id FROM alias GROUP BY term) pa
          ON m.mention_lc = pa.term)
),
lm AS (SELECT pa.id AS node, m.mention_lc AS s
       FROM mentions m
       JOIN (SELECT term, min(id) AS id FROM alias GROUP BY term) pa
         ON m.mention_lc = pa.term),
mp AS (SELECT coalesce(c.component, l.node) AS entity, l.s
       FROM lm l LEFT JOIN cmap c ON l.node = c.node),
lcnt AS (SELECT entity, s, count(*)::BIGINT AS n FROM mp GROUP BY entity, s),
lbest AS (
  SELECT entity, min(struct_pack(neg := -n, s := s)) AS b,
         count(*)::BIGINT AS n_surfaces, sum(n)::BIGINT AS n_mentions
  FROM lcnt GROUP BY entity
)
SELECT entity, b.s AS label, (-b.neg)::BIGINT AS n_label,
       n_surfaces, n_mentions
FROM lbest
"""


_COMPONENTS_ORACLE = _PRELUDE.replace("WITH sent0", "WITH RECURSIVE sent0", 1) + """
, cc_edges AS (SELECT DISTINCT subj_id AS a, obj_id AS b FROM triples),
cc_sym AS (SELECT a, b FROM cc_edges UNION SELECT b, a FROM cc_edges),
cc_nodes AS (SELECT DISTINCT a AS node FROM cc_sym),
reach(node, lbl) AS (
  SELECT node, node FROM cc_nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN cc_sym e ON r.node = e.a
)
SELECT node, min(lbl) AS component FROM reach GROUP BY node
"""


def oracle_sql() -> dict[str, str]:
    from easyner_spark.operators.ranking import (
        bm25_oracle_sql,
        inverted_postings_oracle_sql,
        textrank_oracle_sql,
        tfidf_sim_topk_oracle_sql,
    )
    from easyner_spark.operators.analysis import entity_salience_oracle_sql
    from easyner_spark.operators.textstats import (
        host_lang_mix_oracle_sql,
        mojibake_stats_oracle_sql,
        paragraph_langs_oracle_sql,
    )
    from easyner_spark.operators.dedup import repeated_spans_oracle_sql
    from easyner_spark.operators.nel import (
        fs_em_linkage_oracle_sql,
        name_similarity_oracle_sql,
    )
    from easyner_spark.operators.graph import (
        isa_closure_oracle_sql,
        ppr_oracle_sql,
    )
    from easyner_spark.operators.triples import (
        entity_types_oracle_sql,
        fuse_claims_oracle_sql,
        predicate_cardinality_oracle_sql,
    )
    from easyner_spark.operators.webtext import (
        host_cocitation_oracle_sql,
        host_reciprocity_oracle_sql,
        link_density_oracle_sql,
    )
    from easyner_spark.operators.sampling import (
        quality_weighted_sample_oracle_sql,
    )
    from easyner_spark.operators.sampling import chunk_docs_oracle_sql
    from easyner_spark.operators.similarity import label_centroids_oracle_sql
    from easyner_spark.operators.sketches import (
        exact_quantiles_oracle_sql,
        histogram_oracle_sql,
        linear_count_oracle_sql,
    )
    from easyner_spark.operators.sampling import pack_sequences_oracle_sql
    from easyner_spark.operators.tokenizer import (
        bpe_encode_oracle_sql,
        bpe_merges_oracle_sql,
        bpe_token_counts_oracle_sql,
    )
    from easyner_spark.operators.scoring import (
        bigram_lm_oracle_sql,
        hashed_linear_oracle_sql,
        ppl_buckets_oracle_sql,
        unigram_lm_oracle_sql,
    )
    from easyner_spark.operators.textstats import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        topic_oracle_sql,
    )

    stats_sql, langid_sql = _textstats_oracle()
    # Same injection + same three-stage sequential redaction as
    # q_pii_redact. Placeholders (not an f-string): the regexes contain
    # {m,n} braces. DuckDB regexp_replace needs the explicit 'g' flag
    # to match Spark's replace-all default.
    pii_sql = """
WITH injected AS (
  SELECT doc_id AS id,
         text
         || CASE WHEN doc_id % 3 = 0
              THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@ex-a.org ok'
              ELSE '' END
         || CASE WHEN doc_id % 5 = 0
              THEN ' ip 10.' || CAST(doc_id % 200 AS VARCHAR)
                   || '.0.1 tel +46 70-123 45'
                   || CAST(doc_id % 10 AS VARCHAR) || '8'
              ELSE '' END AS t0
  FROM documents
),
s1 AS (SELECT id,
         len(regexp_extract_all(t0, '__EMAIL__', 0)) AS n_emails,
         regexp_replace(t0, '__EMAIL__', '<EMAIL>', 'g') AS t1 FROM injected),
s2 AS (SELECT id, n_emails,
         len(regexp_extract_all(t1, '__IP__', 0)) AS n_ips,
         regexp_replace(t1, '__IP__', '<IP>', 'g') AS t2 FROM s1),
s3 AS (SELECT id, n_emails, n_ips,
         len(regexp_extract_all(t2, '__PHONE__', 0)) AS n_phones,
         regexp_replace(t2, '__PHONE__', '<PHONE>', 'g') AS text_redacted FROM s2)
SELECT id, text_redacted,
       n_emails::BIGINT AS n_emails,
       n_ips::BIGINT AS n_ips,
       n_phones::BIGINT AS n_phones,
       (n_emails + n_ips + n_phones) > 0 AS has_pii
FROM s3
""".replace("__EMAIL__", PII_EMAIL_RE).replace("__IP__", PII_IPV4_RE).replace(
        "__PHONE__", PII_PHONE_RE
    )
    # events-table oracles: micros BIGINT time math, integer cents, and
    # ::BIGINT casts on sums (DuckDB sum(BIGINT) is HUGEINT).
    sessionize_sql = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, round(value * 100)::BIGINT AS cents
  FROM events WHERE ts IS NOT NULL
),
l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev FROM ev),
f AS (SELECT *, (prev IS NULL OR ts_us - prev > 1800000000)::INT AS new_s FROM l),
s AS (SELECT *, sum(new_s) OVER (
        PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sidx
      FROM f)
SELECT user_id,
       min(ts_us) AS session_start_us,
       max(ts_us) + 1800000000 AS session_end_us,
       count(*) AS n_events,
       sum(cents)::BIGINT AS value_cents
FROM s GROUP BY user_id, sidx
"""
    asof_sql = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
),
v AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'view'),
c AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click')
SELECT v.event_id, v.user_id, v.ts_us,
       l.click_event_id, l.click_ts_us
FROM v LEFT JOIN LATERAL (
  SELECT c.event_id AS click_event_id, c.ts_us AS click_ts_us
  FROM c
  WHERE c.user_id = v.user_id AND c.ts_us <= v.ts_us
  ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1
) l ON TRUE
"""
    rollup_sql = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       sum(round(value * 100)::BIGINT)::BIGINT AS value_cents,
       -- TRY_CASTs mirror from_json's malformed -> null -> sum-ignored
       sum(TRY_CAST(TRY_CAST(props AS JSON)->>'k' AS BIGINT))::BIGINT AS k_sum
FROM events GROUP BY event_type
"""
    extra = {
        "text_stats": stats_sql,
        "lang_id": langid_sql,
        "paragraph_langs": paragraph_langs_oracle_sql(),
        "link_density": "SELECT url::BIGINT AS id, n_chars, n_anchors,"
        " anchor_chars, density_micro, is_linkfarm_page FROM ("
        + link_density_oracle_sql(
            "SELECT doc_id::VARCHAR AS url,"
            " '<html><body><a href=\"https://x.example/p\">'"
            " || substr(text, 1, 40) || '</a>'"
            " || (CASE WHEN doc_id % 2 = 0 THEN substr(text, 41, 200)"
            "     ELSE '' END)"
            " || '</body></html>' AS html FROM documents"
        )
        + ") ld",
        "mojibake": mojibake_stats_oracle_sql(
            "SELECT doc_id AS id,"
            " (CASE WHEN doc_id % 3 = 0"
            "   THEN regexp_replace(text, ' a ', ' \u00c3\u00a1 ', 'g')"
            "   ELSE text END)"
            " || (CASE WHEN doc_id % 7 = 0 THEN '\u00e2\u20ac\u2122\u00c2 ' ELSE '' END)"
            " AS text FROM documents"
        ),
        "pii_redact": pii_sql,
        "inverted_index": inverted_postings_oracle_sql(min_df=2),
        "tfidf_sim": tfidf_sim_topk_oracle_sql(k=5, min_df=2, max_df=50),
        "ppl_buckets": ppl_buckets_oracle_sql(min_count=2),
        "fs_linkage": fs_em_linkage_oracle_sql(
            """
WITH feat AS (
  SELECT doc_id AS id, lang,
         len(regexp_extract_all(lower(text), '\\w+'))::BIGINT AS nw,
         CASE WHEN len(regexp_extract_all(lower(text), '\\w+')) > 0
              THEN regexp_extract_all(lower(text), '\\w+')[1] END AS fw
  FROM documents
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         (a.lang IS NOT DISTINCT FROM b.lang)::INT AS a_0,
         ((a.nw // 50) IS NOT DISTINCT FROM (b.nw // 50))::INT AS a_1,
         (a.fw IS NOT DISTINCT FROM b.fw)::INT AS a_2
  FROM feat a JOIN feat b ON b.id = a.id + 1
)""",
            n_fields=3,
            iters=5,
        ),
        # TextRank over the prelude's sentence split; doc_id aliased to
        # url to meet the generator's sents(url, sent_idx, sentence)
        # contract, then back in the outer projection
        "textrank": "SELECT url::BIGINT AS doc_id, sent_idx::BIGINT AS sent_idx, score, rank FROM ("
        + textrank_oracle_sql(
            _PRELUDE
            + """,
sents AS (SELECT doc_id AS url, sent_idx, sentence FROM sentences)""",
            iters=5,
        )
        + ") tr",
        "label_centroids": label_centroids_oracle_sql(),
        "distinct_count": linear_count_oracle_sql("text"),
        "length_histogram": histogram_oracle_sql("length(text)", 100, 20),
        "length_quantiles": exact_quantiles_oracle_sql("length(text)"),
        "bpe_merges": bpe_merges_oracle_sql(n_merges=6),
        "bpe_token_counts": bpe_token_counts_oracle_sql(n_merges=6),
        # Corpus encoded by its own trained tokenizer
        # (tokenizer.bpe_encode_oracle_sql — shared training rounds)
        "bpe_encode": bpe_encode_oracle_sql(n_merges=6),
        # Full assembly chain: encode -> count -> concat-pack. The
        # packing SQL is single-sourced from pack_sequences_oracle_sql
        # (the encode counts ride in as its `source` subquery).
        "tokenized_pack": pack_sequences_oracle_sql(
            128,
            tokens_expr="n_tokens",
            source=f"""(
  WITH enc AS ({bpe_encode_oracle_sql(n_merges=6)})
  SELECT doc_id, count(*)::BIGINT AS n_tokens FROM enc GROUP BY doc_id
) AS psrc""",
        ),
        "corpus_summary": f"""
WITH per_doc AS ({stats_sql})
SELECT count(*) AS n_docs,
       sum(n_words)::BIGINT AS total_words,
       sum(n_chars)::BIGINT AS total_chars,
       sum((quality >= 0.5)::INT)::BIGINT AS n_quality_ge_half,
       sum((lang_pred = 'de')::INT)::BIGINT AS n_de,
       sum((lang_pred = 'en')::INT)::BIGINT AS n_en,
       sum((lang_pred = 'es')::INT)::BIGINT AS n_es,
       sum((lang_pred = 'fr')::INT)::BIGINT AS n_fr
FROM per_doc
""",
        "sessionize": sessionize_sql,
        "asof_join": asof_sql,
        "event_rollup": rollup_sql,
        "bm25_rank": bm25_oracle_sql(BM25_TERMS),
        "unigram_lm": unigram_lm_oracle_sql(min_count=2),
        "bigram_lm": bigram_lm_oracle_sql(min_count=2),
        "quality_classifier": hashed_linear_oracle_sql(),
        "media_meta": _MEDIA_META_SQL,
        "media_meta_headers": """
WITH m AS (
  SELECT doc_id,
         'P6' || chr(10) || (doc_id % 1000 + 1) || ' ' || (doc_id % 77 + 1)
              || chr(10) || '255' || chr(10) || text AS payload
  FROM documents
)
SELECT doc_id::VARCHAR AS media_id,
       octet_length(encode(payload))::BIGINT AS n_bytes,
       sha256(payload) AS content_sha,
       (doc_id % 1000 + 1)::BIGINT AS width,
       (doc_id % 77 + 1)::BIGINT AS height,
       'image/ppm' AS codec
FROM m
""",
        # ADVERSARIAL: the synthesized page adds a kept <h1> headline
        # and a PRE- prefixed kept block with nested boilerplate inside
        # it, so extraction must produce this exact non-identity
        # transform (identity extractors fail)
        "boilerplate_extract": (
            "SELECT doc_id, concat('Doc ', doc_id, chr(10), 'PRE-', text)"
            " AS text FROM documents"
        ),
        # ADVERSARIAL: three labeled AbstractText sections (one empty,
        # one with inline markup); the parser must join non-empty
        # sections with one space, drop Labels, flatten inline tags
        "pubmed_extract": (
            "SELECT doc_id, concat(text, ' Conclusion S-', doc_id)"
            " AS text FROM documents"
        ),
        # ADVERSARIAL: closed-form expected output of the WARC parser
        # (warcinfo/request skipped, Content-Length octet math exact,
        # \r\n\r\n decoy inside the body, per-doc status/date)
        "warc_extract": (
            "SELECT doc_id,"
            " 'https://example.com/d/' || doc_id AS url,"
            " '2024-01-01T00:00:' || lpad((doc_id % 60)::VARCHAR, 2, '0') || 'Z'"
            "   AS warc_date,"
            " CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status,"
            " 'text/html' AS mime,"
            " '<html><body>' || chr(13) || chr(10) || chr(13) || chr(10) ||"
            " 'WARC/1.0 decoy' || chr(13) || chr(10) || '<p>é ' || text ||"
            " '</p></body></html>' AS body_text"
            " FROM documents"
        ),
        # closed-form expected output of the CRAFT converter quirks
        # (see q_craft_iob2's docstring for the per-denotation walk)
        "craft_iob2": """
SELECT d.doc_id,
       (t.i - 1)::BIGINT AS tok_idx,
       CASE t.i WHEN 1 THEN concat('T', d.doc_id)
                WHEN 2 THEN 'binds' WHEN 3 THEN 'protein'
                WHEN 4 THEN 'X34' WHEN 5 THEN 'in' WHEN 6 THEN 'vivo'
                WHEN 7 THEN ',' WHEN 8 THEN 'strongly' ELSE '.' END AS token,
       (['O','O','B','B','B','I','O','B','I'])[t.i] AS label
FROM documents d
CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS i) t
""",
        # closed-form expected output of the Flair 3-column file parse
        # (one 3-token sentence per doc in sorted doc_id order)
        "flair_parse": """
WITH d AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS seq
  FROM documents
),
t(i, suf, lt, lp) AS (VALUES
  (0, 'a', 'B-GENE', 'B-GENE'),
  (1, 'b', 'I-GENE', 'O'),
  (2, 'c', 'O', 'B-CHEM'))
SELECT d.seq::BIGINT AS seq_id,
       t.i::BIGINT AS tok_idx,
       concat('w', d.doc_id, t.suf) AS token,
       t.lt AS label_true,
       t.lp AS label_pred
FROM d CROSS JOIN t
""",
        "predicate_triples": _predicate_triples_oracle(),
        "entity_types": entity_types_oracle_sql(
            _predicate_triples_oracle(as_prefix=True), TYPE_RULES
        ),
        "isa_closure": isa_closure_oracle_sql(
            """WITH RECURSIVE e AS (
  SELECT 'n' || doc_id AS child, 'n' || (doc_id // 2) AS parent
  FROM documents WHERE doc_id >= 1
  UNION ALL
  SELECT 'n' || doc_id, 'n' || (doc_id // 3)
  FROM documents WHERE doc_id % 5 = 0 AND doc_id >= 3
)""",
            max_depth=16,
        ),
        **_dedup_oracles(),
        **_similarity_oracles(),
    }
    return _prioritize(extra | {
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
        "entity_frequency_batched": _PRELUDE
        + """
, mb AS (SELECT mention_lc, doc_id, doc_id % 7 AS batch FROM mentions),
pb AS (SELECT mention_lc, batch, count(*)::BIGINT AS cnt FROM mb GROUP BY mention_lc, batch),
roll AS (
  SELECT mention_lc AS mention,
         sum(cnt)::BIGINT AS total_count,
         count(*)::BIGINT AS batches_spanned,
         '{' || string_agg('"' || batch || '":' || cnt, ',' ORDER BY batch) || '}' AS batch_count_json
  FROM pb GROUP BY mention_lc
),
arts AS (
  SELECT mention_lc AS mention, count(DISTINCT doc_id)::BIGINT AS articles_spanned
  FROM mb GROUP BY mention_lc
)
SELECT r.mention, r.total_count, a.articles_spanned, r.batches_spanned,
       r.batch_count_json,
       r.total_count / a.articles_spanned AS freq_per_article,
       r.total_count / r.batches_spanned AS freq_per_batch
FROM roll r JOIN arts a ON r.mention = a.mention
""",
        "link_entities": _PRELUDE
        + """
SELECT m.doc_id, m.sent_idx::BIGINT AS sent_idx, m.begin_tok::BIGINT AS begin_tok,
       m.end_tok::BIGINT AS end_tok, m.mention_lc,
       coalesce(a.id, '') AS entity_id
FROM mentions m LEFT JOIN alias a ON m.mention_lc = a.term
""",
        "disambiguate": _PRELUDE
        + """
, al AS (SELECT DISTINCT lower(term) AS term, id AS entity_id FROM alias),
nc AS (SELECT term, count(*)::BIGINT AS n_cands FROM al GROUP BY term),
al2 AS (SELECT al.term, al.entity_id, nc.n_cands FROM al JOIN nc ON al.term = nc.term),
stoks AS (
  SELECT DISTINCT doc_id, sent_idx,
         unnest(list_filter(regexp_split_to_array(lower(sentence), '[^a-z0-9]+'),
                            t -> t <> '')) AS tok
  FROM sentences
),
cand AS (
  SELECT mn.doc_id, mn.sent_idx, mn.begin_tok, mn.end_tok, mn.mention_lc,
         al2.entity_id, al2.n_cands
  FROM mentions mn JOIN al2 ON mn.mention_lc = al2.term
),
unamb AS (SELECT * FROM cand WHERE n_cands = 1),
amb AS (SELECT * FROM cand WHERE n_cands > 1),
profile AS (
  SELECT DISTINCT u.entity_id, s.tok
  FROM (SELECT DISTINCT doc_id, sent_idx, entity_id FROM unamb) u
  JOIN stoks s ON u.doc_id = s.doc_id AND u.sent_idx = s.sent_idx
),
ovl AS (
  SELECT a.doc_id, a.sent_idx, a.begin_tok, a.end_tok, a.mention_lc,
         a.entity_id, count(*)::BIGINT AS overlap
  FROM amb a
  JOIN stoks s ON a.doc_id = s.doc_id AND a.sent_idx = s.sent_idx
  JOIN profile p ON p.entity_id = a.entity_id AND p.tok = s.tok
  GROUP BY ALL
),
scored AS (
  SELECT a.doc_id, a.sent_idx, a.begin_tok, a.end_tok, a.mention_lc,
         a.entity_id, a.n_cands, coalesce(o.overlap, 0) AS overlap
  FROM amb a
  LEFT JOIN ovl o
    ON a.doc_id = o.doc_id AND a.sent_idx = o.sent_idx
   AND a.begin_tok = o.begin_tok AND a.end_tok = o.end_tok
   AND a.mention_lc = o.mention_lc AND a.entity_id = o.entity_id
),
best AS (
  SELECT doc_id, sent_idx, begin_tok, end_tok, mention_lc, entity_id,
         n_cands, overlap AS score,
         row_number() OVER (
           PARTITION BY doc_id, sent_idx, begin_tok, end_tok, mention_lc
           ORDER BY overlap DESC, entity_id) AS rn
  FROM scored
)
SELECT doc_id, sent_idx::BIGINT AS sent_idx, begin_tok::BIGINT AS begin_tok,
       end_tok::BIGINT AS end_tok, mention_lc, entity_id,
       n_cands::BIGINT AS n_cands, score::BIGINT AS score
FROM best WHERE rn = 1
UNION ALL
SELECT doc_id, sent_idx::BIGINT, begin_tok::BIGINT, end_tok::BIGINT,
       mention_lc, entity_id, n_cands::BIGINT, (-1)::BIGINT
FROM unamb
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
        # Truth discovery over host-attributed claims: with_prefix ends
        # on claims(source, subj_id, pred, obj_id); the generator
        # unrolls 3 trust iterations with round(9) state.
        "fuse_claims": fuse_claims_oracle_sql(
            _PRELUDE
            + """,
claims AS (
  SELECT 'h' || (doc_id::BIGINT % 7)::VARCHAR AS source,
         subj_id, pred, obj_id
  FROM triples
)""",
            iters=3,
            state_round=9,
        ),
        # Per-predicate cardinality profile: real co-occurrence edges
        # UNION (dedup) the three synthetic single-class predicates —
        # mirrors q_predicate_cardinality's .distinct() on the union
        "predicate_cardinality": predicate_cardinality_oracle_sql(
            _PRELUDE
            + """,
e AS (
  SELECT DISTINCT subj_id, pred, obj_id FROM triples
  UNION
  SELECT 's' || doc_id, 'capital_of', 'o' || doc_id FROM documents
  UNION
  SELECT 's' || (doc_id % 10), 'has_part', 'o' || doc_id FROM documents
  UNION
  SELECT 's' || doc_id, 'in_country', 'o' || (doc_id % 10) FROM documents
)"""
        ),
        "entity_salience": entity_salience_oracle_sql(
            _PRELUDE
            + """,
lm AS (SELECT doc_id AS url, sent_idx, entity_id FROM linked)"""
        ),
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
        "search_mentions": _PRELUDE
        + f"""
SELECT m.doc_id, m.sent_idx::BIGINT AS sent_idx,
       m.begin_tok::BIGINT AS begin_tok, m.end_tok::BIGINT AS end_tok,
       m.mention_lc, m.class
FROM mentions m
WHERE EXISTS (
  SELECT 1 FROM mentions h
  WHERE h.doc_id = m.doc_id AND h.sent_idx = m.sent_idx
    AND h.mention_lc IN ({", ".join(repr(t) for t in SEARCH_TERMS)})
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
        # Span-tolerant eval: band-match EXISTS on (doc, class) with
        # |d_begin|<=1 AND |d_end|<=1; gold twin perturbed exactly as
        # the Spark query constructs it
        "span_eval": _PRELUDE
        + """
, p AS (SELECT doc_id, class, begin_tok AS b, end_tok AS e FROM mentions),
g AS (
  SELECT doc_id, class,
         b + CASE WHEN doc_id % 10 = 7 THEN 5 WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS b,
         e + CASE WHEN doc_id % 10 = 7 THEN 5 WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS e
  FROM p WHERE doc_id % 10 <> 3
),
cls AS (SELECT DISTINCT class FROM (SELECT class FROM p UNION ALL SELECT class FROM g)),
tp AS (
  SELECT class, count(*) AS tp FROM p
  WHERE EXISTS (SELECT 1 FROM g WHERE g.doc_id = p.doc_id AND g.class = p.class
                  AND abs(p.b - g.b) <= 1 AND abs(p.e - g.e) <= 1)
  GROUP BY class
),
fp AS (
  SELECT class, count(*) AS fp FROM p
  WHERE NOT EXISTS (SELECT 1 FROM g WHERE g.doc_id = p.doc_id AND g.class = p.class
                      AND abs(p.b - g.b) <= 1 AND abs(p.e - g.e) <= 1)
  GROUP BY class
),
fn AS (
  SELECT class, count(*) AS fn FROM g
  WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.doc_id = g.doc_id AND p.class = g.class
                      AND abs(g.b - p.b) <= 1 AND abs(g.e - p.e) <= 1)
  GROUP BY class
),
c AS (
  SELECT cls.class,
         coalesce(tp.tp, 0)::BIGINT AS tp,
         coalesce(fp.fp, 0)::BIGINT AS fp,
         coalesce(fn.fn, 0)::BIGINT AS fn
  FROM cls LEFT JOIN tp ON cls.class = tp.class
           LEFT JOIN fp ON cls.class = fp.class
           LEFT JOIN fn ON cls.class = fn.class
)
SELECT class, tp, fp, fn,
  CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 0.0 END AS precision,
  CASE WHEN tp + fn > 0 THEN tp / (tp + fn) ELSE 0.0 END AS recall,
  CASE WHEN (CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 0.0 END)
          + (CASE WHEN tp + fn > 0 THEN tp / (tp + fn) ELSE 0.0 END) > 0
       THEN 2 * (CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 0.0 END)
              * (CASE WHEN tp + fn > 0 THEN tp / (tp + fn) ELSE 0.0 END)
            / ((CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 0.0 END)
               + (CASE WHEN tp + fn > 0 THEN tp / (tp + fn) ELSE 0.0 END))
       ELSE 0.0 END AS f1
FROM c
""",
        # Nested merger-v1 export: rebuild the exact to_json string in
        # SQL (same (begin, end, mention) order inside each tag, tags
        # ascending, compact JSON)
        "merger_v1_nested": _PRELUDE
        + """
, pt AS (
  SELECT doc_id, sent_idx, class,
    '"' || class || '":[' ||
      string_agg('"' || mention_lc || '"', ',' ORDER BY begin_tok, end_tok, mention_lc)
      || ']' AS ef,
    '"' || class || '":[' ||
      string_agg('[' || begin_tok || ',' || end_tok || ']', ',' ORDER BY begin_tok, end_tok, mention_lc)
      || ']' AS sf
  FROM mentions GROUP BY doc_id, sent_idx, class
)
SELECT doc_id, sent_idx::BIGINT AS sent_idx,
  '{"entities":{' || string_agg(ef, ',' ORDER BY class) ||
  '},"entity_spans":{' || string_agg(sf, ',' ORDER BY class) || '}}' AS json
FROM pt GROUP BY doc_id, sent_idx
""",
        # Co-occurrence extractor: one entity per maximal non-O run
        # starting at its first B (B appends bare, I appends ' '+tok);
        # runs reaching sequence end are dropped (the reference only
        # closes an entity on an O); 9-step detok chain on the text
        "co_occurrence": """
WITH toks0 AS (
  SELECT doc_id,
         generate_subscripts(t, 1) - 1 AS idx,
         unnest(t) AS tok
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+|[^\\w\\s]') AS t
        FROM documents)
),
lab AS (
  SELECT doc_id, idx, tok,
         CASE WHEN tok IN ('hash', 'scan') THEN 'B'
              WHEN tok = 'merge' THEN 'I' ELSE 'O' END AS label
  FROM toks0
),
runs AS (
  SELECT *, sum((label = 'O')::INT) OVER (PARTITION BY doc_id ORDER BY idx) AS run_id
  FROM lab
),
nz AS (SELECT * FROM runs WHERE label <> 'O'),
fb AS (
  SELECT doc_id, run_id,
         min(idx) FILTER (label = 'B') AS first_b,
         max(idx) AS run_max
  FROM nz GROUP BY doc_id, run_id
),
seqmax AS (SELECT doc_id, max(idx) AS seq_max FROM lab GROUP BY doc_id),
ents AS (
  SELECT n.doc_id, n.run_id,
         string_agg(CASE WHEN n.label = 'B' THEN n.tok ELSE ' ' || n.tok END,
                    '' ORDER BY n.idx) AS entity
  FROM nz n
  JOIN fb ON n.doc_id = fb.doc_id AND n.run_id = fb.run_id
  WHERE fb.first_b IS NOT NULL AND n.idx >= fb.first_b
  GROUP BY n.doc_id, n.run_id
),
kept AS (
  SELECT e.doc_id, e.run_id,
         replace(replace(e.entity, ' - ', '-'), ' , ', ',') AS entity
  FROM ents e
  JOIN fb ON e.doc_id = fb.doc_id AND e.run_id = fb.run_id
  JOIN seqmax s ON e.doc_id = s.doc_id
  WHERE fb.run_max < s.seq_max
),
agg AS (
  SELECT doc_id,
         count(*) AS n_ents,
         '[' || string_agg('"' || entity || '"', ',' ORDER BY run_id) || ']' AS ej
  FROM kept GROUP BY doc_id
),
txt AS (
  SELECT doc_id,
    replace(replace(replace(replace(replace(replace(replace(replace(replace(
      string_agg(tok, ' ' ORDER BY idx),
      ' .', '.'), ' ,', ','), ' - ', '-'), '( ', '('), ' )', ')'),
      ' :', ':'), ' ;', ';'), ' !', '!'), ' ?', '?') AS text
  FROM lab GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(a.n_ents >= 2, FALSE) AS has_cooccurrence,
       coalesce(a.ej, '[]') AS entities_json,
       t.text
FROM txt t LEFT JOIN agg a ON t.doc_id = a.doc_id
""",
        # Error-region extraction: both-O tokens bound the runs, a
        # region starts at its first B, regions open at sequence end
        # are dropped, agreeing regions suppressed
        "error_regions": """
WITH toks0 AS (
  SELECT doc_id,
         generate_subscripts(t, 1) - 1 AS idx,
         unnest(t) AS tok
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+|[^\\w\\s]') AS t
        FROM documents)
),
lab AS (
  SELECT doc_id, idx, tok,
         CASE WHEN tok = 'hash' THEN 'B' WHEN tok = 'merge' THEN 'I' ELSE 'O' END AS lt,
         CASE WHEN tok = 'hash' AND idx % 2 = 0 THEN 'B' ELSE 'O' END AS lp
  FROM toks0
),
runs AS (
  SELECT *, sum((lt = 'O' AND lp = 'O')::INT)
              OVER (PARTITION BY doc_id ORDER BY idx) AS run_id
  FROM lab
),
nz AS (SELECT * FROM runs WHERE NOT (lt = 'O' AND lp = 'O')),
fb AS (
  SELECT doc_id, run_id,
         min(idx) FILTER (lt = 'B' OR lp = 'B') AS first_b,
         max(idx) AS run_max
  FROM nz GROUP BY doc_id, run_id
),
seqmax AS (SELECT doc_id, max(idx) AS seq_max FROM lab GROUP BY doc_id),
reg AS (
  SELECT n.doc_id, n.run_id,
         string_agg(n.tok, ' ' ORDER BY n.idx) AS word,
         to_json(list(n.lt ORDER BY n.idx)) AS tt,
         to_json(list(n.lp ORDER BY n.idx)) AS tp
  FROM nz n
  JOIN fb ON n.doc_id = fb.doc_id AND n.run_id = fb.run_id
  JOIN seqmax s ON n.doc_id = s.doc_id
  WHERE fb.first_b IS NOT NULL AND n.idx >= fb.first_b
    AND fb.run_max < s.seq_max
  GROUP BY n.doc_id, n.run_id
),
bad AS (SELECT * FROM reg WHERE tt <> tp)
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY run_id) - 1 AS region_idx,
       word, tt AS true_tags_json, tp AS pred_tags_json
FROM bad
""",
        # Sequential conflict resolution (entity_merger2.py:99-146) as a
        # recursive CTE: the reference loop scans i last-to-first and
        # deletes rows[i] iff SOME still-alive j beats it (the for-j
        # break order is irrelevant because every match has the same
        # effect), so the state is just a survivor bitmask evolving as
        # i descends. Mentions are token-aligned, so the char-span
        # rules map 1:1 onto (begin_tok, end_tok); max 16 mentions per
        # sentence at this tier -> a 64-bit mask is ample.
        "resolve_conflicts": _PRELUDE.replace("WITH sent0", "WITH RECURSIVE sent0", 1)
        + """
, rc AS (
  SELECT doc_id, sent_idx, begin_tok AS b, end_tok AS e, mention_lc, class,
         CASE class WHEN 'kw1' THEN 1 WHEN 'kw2' THEN 2 WHEN 'kw3' THEN 3
                    ELSE 4 END AS prio,
         row_number() OVER (PARTITION BY doc_id, sent_idx
                            ORDER BY begin_tok, end_tok, class, mention_lc
                           ) - 1 AS idx
  FROM mentions
),
sizes AS (SELECT doc_id, sent_idx, count(*)::INT AS n FROM rc GROUP BY doc_id, sent_idx),
step AS (
  SELECT doc_id, sent_idx, n - 1 AS i,
         CASE WHEN n >= 64 THEN error('resolve_conflicts oracle: sentence with >= 64 mentions exceeds the 64-bit survivor mask')
              ELSE ((1::BIGINT << n) - 1) END AS mask FROM sizes
  UNION ALL
  SELECT s.doc_id, s.sent_idx, s.i - 1,
         CASE WHEN EXISTS (
           SELECT 1 FROM rc b, rc j
           WHERE b.doc_id = s.doc_id AND b.sent_idx = s.sent_idx AND b.idx = s.i
             AND j.doc_id = s.doc_id AND j.sent_idx = s.sent_idx
             AND j.idx <> s.i AND ((s.mask >> j.idx) & 1) = 1
             AND (
               (b.b = j.b AND b.e = j.e AND b.class <> j.class AND b.prio > j.prio)
               OR (NOT (b.b = j.b AND b.e = j.e) AND b.b >= j.b AND b.e <= j.e)
               OR (((b.b < j.b AND j.b < b.e AND b.e < j.e)
                    OR (j.b < b.b AND b.b < j.e AND j.e < b.e))
                   AND length(b.mention_lc) < length(j.mention_lc))
             )
         ) THEN s.mask & ~(1::BIGINT << s.i) ELSE s.mask END
  FROM step s WHERE s.i >= 0
),
final AS (SELECT doc_id, sent_idx, mask FROM step WHERE i = -1)
SELECT r.doc_id, r.sent_idx::BIGINT AS sent_idx,
       r.b::BIGINT AS begin_tok, r.e::BIGINT AS end_tok, r.mention_lc, r.class
FROM rc r JOIN final f ON r.doc_id = f.doc_id AND r.sent_idx = f.sent_idx
WHERE ((f.mask >> r.idx) & 1) = 1
""",
        "components": _COMPONENTS_ORACLE,
        # the incremental contract IS "equal to the full recompute":
        # incremental_components(cc(G1), E2) == cc(G1 ∪ E2), and the
        # Spark query splits triples edges into G1/E2 by sent_idx
        # parity — so the oracle is literally the full-graph closure
        "incremental_components": _COMPONENTS_ORACLE,
        "k_hop": _PRELUDE.replace("WITH sent0", "WITH RECURSIVE sent0", 1)
        + """
, kh_edges AS (SELECT DISTINCT subj_id AS a, obj_id AS b FROM triples
               WHERE subj_id <> obj_id),
kh_sym AS (SELECT a, b FROM kh_edges UNION SELECT b, a FROM kh_edges),
kh_nodes AS (SELECT DISTINCT a AS node FROM kh_sym),
walk(source, node, dist) AS (
  SELECT node, node, 0 FROM kh_nodes
  UNION
  SELECT w.source, e.b, w.dist + 1
  FROM walk w JOIN kh_sym e ON w.node = e.a
  WHERE w.dist < 2
)
SELECT source, node, min(dist)::BIGINT AS dist
FROM walk GROUP BY source, node
""",
        # PMI over sentence-level entity co-occurrence: counts cast to
        # double BEFORE arithmetic (exact), one libm ln() per output,
        # round(6) — mirrors operators/graph.edge_pmi op-for-op
        "kg_pmi": _PRELUDE
        + """
, occ AS (SELECT DISTINCT doc_id, sent_idx, mention_lc AS term FROM mentions),
ns AS (SELECT count(*)::DOUBLE AS n_sents
       FROM (SELECT DISTINCT doc_id, sent_idx FROM occ)),
marg AS (SELECT term, count(*) AS cnt FROM occ GROUP BY term),
prs AS (
  SELECT x.term AS a, y.term AS b, count(*) AS pair_cnt
  FROM occ x JOIN occ y
    ON x.doc_id = y.doc_id AND x.sent_idx = y.sent_idx AND x.term < y.term
  GROUP BY x.term, y.term
)
SELECT p.a, p.b, p.pair_cnt::BIGINT AS pair_cnt,
       ma.cnt::BIGINT AS cnt_a, mb.cnt::BIGINT AS cnt_b,
       round(ln((p.pair_cnt::DOUBLE * ns.n_sents)
                / (ma.cnt::DOUBLE * mb.cnt::DOUBLE)), 6) AS pmi,
       round(ln((p.pair_cnt::DOUBLE * ns.n_sents)
                / (ma.cnt::DOUBLE * mb.cnt::DOUBLE))
             / -ln(p.pair_cnt::DOUBLE / ns.n_sents), 6) AS npmi
FROM prs p
JOIN marg ma ON p.a = ma.term
JOIN marg mb ON p.b = mb.term
CROSS JOIN ns
""",
        # Unrolled 3-iteration PageRank; per-iteration round(·, 9) is
        # the cross-engine state contract (operators/graph.pagerank)
        "kg_pagerank": _PRELUDE + _pagerank_oracle_body(),
        "kg_ppr": ppr_oracle_sql(
            _PRELUDE
            + """,
e AS (SELECT DISTINCT subj_id AS src, obj_id AS dst FROM triples)""",
            seeds=("KB:01", "KB:03"),
            iters=3,
        ),
        # Canonical-ordering wedge join, integer-exact
        "kg_triangles": _PRELUDE
        + """
, occ AS (SELECT DISTINCT doc_id, sent_idx, mention_lc AS term FROM mentions),
pr AS (
  SELECT DISTINCT x.term AS a, y.term AS b
  FROM occ x JOIN occ y
    ON x.doc_id = y.doc_id AND x.sent_idx = y.sent_idx AND x.term < y.term
),
tri AS (
  SELECT w1.a, w1.b, w2.b AS c
  FROM pr w1
  JOIN pr w2 ON w1.a = w2.a AND w1.b < w2.b
  JOIN pr e ON e.a = w1.b AND e.b = w2.b
),
corners AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri)
  GROUP BY node
),
alln AS (SELECT a AS node FROM pr UNION SELECT b FROM pr)
SELECT alln.node, coalesce(corners.triangles, 0)::BIGINT AS triangles
FROM alln LEFT JOIN corners ON alln.node = corners.node
""",
        # Fixed-iteration neighbor-majority label propagation; unrolled
        # CTE mirrors operators/graph.label_propagation's determinism
        # contract (ties -> smallest label)
        "kg_communities": _PRELUDE + _lpa_oracle_body(),
        # Wedge/quantize/anti-join body generated NEXT TO the operator
        # (graph.link_prediction_oracle_sql); pr = the same canonical
        # co-occurrence pair CTE kg_triangles uses
        "kg_link_predict": _link_predict_oracle(),
        # 8 unrolled peeling rounds (graph.k_core_oracle_sql), same
        # pr CTE; capped-round contract matches the engine bit-for-bit
        "kg_kcore": _kcore_oracle(),
        # Wedge-join triangles + degree rollup -> exact-integer ratio
        # (graph.clustering_coeff_oracle_sql over the shared pr CTE)
        "kg_clustering": _clustering_oracle(),
        # LPA chain re-aliased as lab(node, community), then the
        # per-community exact-integer q_term decomposition
        # (graph.modularity_oracle_sql)
        "kg_modularity": _modularity_oracle(),
        # Full-outer epoch diff over support-weighted triple edges
        # (graph.edge_diff_oracle_sql, continuation after _PRELUDE)
        "kg_snapshot_diff": _snapshot_diff_oracle(),
        # Shared-edge-CTE dual power method: plain p-chain +
        # seed-teleport t-chain, mass on the 6-rounded outputs
        # (graph.spam_mass_oracle_sql after _HOSTLINKS_CTE)
        "host_trust": _host_trust_oracle(),
        # Smoothed-idf TF-IDF with a per-doc rank window
        # (ranking.doc_keywords_oracle_sql on the raw documents table)
        "doc_keywords": _doc_keywords_oracle(),
        # Exact-BIGINT Pearson sums over the shared pr CTE
        # (graph.degree_assortativity_oracle_sql)
        "kg_assortativity": _assortativity_oracle(),
        # Two-key blocked self-join + levenshtein verify over the
        # noisy-label synthesis (nel.edit_merge_candidates_oracle_sql)
        "entity_merge_cands": _merge_cands_oracle(),
        # Weight-proportional unrolled power method over hg's n_links
        # (graph.weighted_pagerank_oracle_sql after _HOSTLINKS_CTE)
        "host_wrank": _host_wrank_oracle(),
        # strpos-located first occurrences + pure substr windows
        # (search.kwic_oracle_sql)
        "kwic": _kwic_oracle(),
        # Shared-verbatim DOI/arXiv/PMID patterns over the injected
        # synthesis (webtext.citation_facts_oracle_sql)
        "citations": _citations_oracle(),
        # Month-name CASE map + lpad, no engine date parser
        # (webtext.date_facts_oracle_sql over the injected synthesis)
        "dates": _dates_oracle(),
        # Banded self-join on (doc, sent) positions
        # (graph.window_cooc_oracle_sql over the mentions CTE)
        "kg_window_cooc": _window_cooc_oracle(),
        # k_hop's recursive min-dist walk -> per-distance integer
        # counts -> fixed-order reciprocal fold
        # (graph.harmonic_centrality_oracle_sql)
        "kg_harmonic": _harmonic_oracle(),
        # Flat-scope itemtype/itemprop pulls, patterns shared verbatim
        # (webtext.extract_microdata_oracle_sql)
        "microdata": _microdata_oracle(),
        # Same fixed replace chain via webtext.html_unescape_sql
        "unescape_text": _unescape_oracle(),
        # Recursive directed walk + swapped-key mutual join + min
        # rollup (graph.bounded_scc_oracle_sql after a RECURSIVE
        # _HOSTLINKS_CTE)
        "host_scc": _host_scc_oracle(),
        # Banded doc-join + max(struct) nearest-antecedent rollup
        # (triples.pronoun_links_oracle_sql over the injected stream)
        "pronoun_links": _pronoun_links_oracle(),
        # Token-index mirror of the adjacent aux/participle/'by'
        # phrase rule via the leads CTE, roles flipped
        "passive_triples": _passive_triples_oracle(),
        # Token-index mirror of the '<nominal> of A by B' prefix/gap
        # rule via two leads joins, roles flipped
        "nominal_triples": _nominal_triples_oracle(),
        # N^2-scaled integer kappa (evaluate.cohens_kappa_oracle_sql)
        "kappa": _kappa_oracle(),
        # Composite (host, term) rollup + host-total join
        # (webtext.host_topics_oracle_sql over the mentions CTE)
        "host_topics": _host_topics_oracle(),
        "heavy_hitters": _cms_oracle(),
        # Unrolled WL rounds over the shared pr CTE (graph.wl_labels_oracle_sql)
        "kg_wl_labels": _wl_oracle(),
        "pack_sequences": _pack_oracle(),
        "kg_edge_history": _PRELUDE
        + """
, ep AS (SELECT subj_id, pred, obj_id, doc_id % 5 AS epoch FROM triples),
g AS (
  SELECT subj_id, pred, obj_id,
         min(epoch)::BIGINT AS first_epoch, max(epoch)::BIGINT AS last_epoch,
         count(DISTINCT epoch)::BIGINT AS n_epochs, count(*)::BIGINT AS support
  FROM ep GROUP BY 1, 2, 3
),
mx AS (SELECT max(last_epoch) AS m FROM g)
SELECT g.subj_id, g.pred, g.obj_id, g.first_epoch, g.last_epoch,
       g.n_epochs, g.support,
       CASE WHEN g.first_epoch = mx.m THEN 'new'
            WHEN g.last_epoch < mx.m THEN 'stale'
            ELSE 'active' END AS status
FROM g CROSS JOIN mx
""",
        # Per-host rollup over deterministically skewed synthetic urls;
        # host parse = the same ASCII regex as webtext.url_parts
        "host_stats": _URL_PAGES_CTE
        + """
SELECT host,
  count(*)::BIGINT AS n_docs,
  sum(length(text))::BIGINT AS total_chars,
  count(DISTINCT lang)::BIGINT AS n_langs,
  round(sum(length(text))::DOUBLE / count(*)::DOUBLE, 6) AS mean_chars
FROM h GROUP BY host
""",
        # Host-skew profile: rank/share/cum_share + salt factor
        # (webtext.host_skew_profile, target_partition_rows=50)
        "host_skew": _URL_PAGES_CTE
        + """
, c AS (SELECT host, count(*) AS n_docs FROM h GROUP BY host),
t AS (SELECT sum(n_docs)::DOUBLE AS total FROM c)
SELECT host,
  n_docs::BIGINT AS n_docs,
  row_number() OVER (ORDER BY n_docs DESC, host)::BIGINT AS host_rank,
  round(n_docs::DOUBLE / t.total, 9) AS share,
  round(sum(n_docs) OVER (ORDER BY n_docs DESC, host
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE / t.total,
        9) AS cum_share,
  greatest(1, ceil(n_docs::DOUBLE / 50.0)::INT)::BIGINT AS salt
FROM c CROSS JOIN t
""",
        # Canonical-URL dedup: regexp chain mirrors
        # webtext.canonical_url step for step ('g' only where Spark's
        # replace-all semantics could see a second match)
        "url_dedup": f"""
WITH b AS (
  SELECT doc_id,
    {_URL_HOST_CASE} AS host,
    'https://' || {_URL_HOST_CASE} || '/p/' || (doc_id % 211) AS base
  FROM documents
),
p AS (
  SELECT doc_id,
    CASE WHEN doc_id % 4 = 0 THEN base || '?utm_source=feed&id=' || (doc_id % 211)
         WHEN doc_id % 4 = 1 THEN 'https://www.' || host || '/p/' || (doc_id % 211)
         WHEN doc_id % 4 = 2 THEN base || '/'
         ELSE base || '#sec-' || doc_id END AS url
  FROM b
),
c AS (
  SELECT doc_id, url,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                lower(regexp_extract(u0, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
                || regexp_replace(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                '://www\\.', '://'),
              '[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*', '', 'g'),
            '\\?&', '?'),
          '^([^?&]*)&', '\\1?'),
        '[?&]$', ''),
      '/$', '') AS canon_url
  FROM (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u0 FROM p)
)
SELECT doc_id::BIGINT AS doc_id, url, canon_url,
       (url != min(url) OVER (PARTITION BY canon_url)) AS is_dup
FROM c
""",
        # Redirect-chain resolution: depth-capped recursive CTE walks
        # the same min(chain, 8) steps as the pointer-doubling
        # operator (webtext.resolve_redirects_oracle_sql)
        "resolve_redirects": _redirects_oracle(),
        # REP politeness verdicts: integer-encoded (neg_len, rank)
        # winner tuple (webtext.robots_verdict_oracle_sql)
        "robots_rules": _robots_oracle(),
        # Head-metadata extraction (webtext.extract_meta_oracle_sql)
        "html_meta": _html_meta_oracle(),
        # Per-entity epoch burst detection
        # (analysis.entity_bursts_oracle_sql over the mentions prelude)
        "entity_bursts": _entity_bursts_oracle(),
        # Filtered-LCWA negative sampling (graph.kg_negatives_oracle_sql)
        "kg_negatives": _kg_negatives_oracle(),
        # AMIE-style horn-rule mining over the designed 31-entity
        # rule KG (triples.mine_rules_oracle_sql)
        "kg_rules": _kg_rules_oracle(),
        # Rule application / KG completion
        # (triples.rule_predictions_oracle_sql)
        "kg_rule_preds": _kg_rule_preds_oracle(),
        # Predicate domain/range signatures
        # (triples.predicate_signatures_oracle_sql)
        "kg_pred_signatures": _kg_pred_signatures_oracle(),
        # Predicate synonym/inverse/symmetry detection
        # (triples.predicate_equivalences_oracle_sql)
        "kg_pred_equiv": _kg_pred_equiv_oracle(),
        # Signature-vote type propagation to untyped entities
        # (triples.infer_entity_types_oracle_sql)
        "kg_type_infer": _kg_type_infer_oracle(),
        "kg_shortest_paths": _kg_shortest_paths_oracle(),
        "kg_paths": _kg_paths_oracle(),
        "kg_schema_graph": _kg_schema_graph_oracle(),
        "kg_metapath": _kg_metapath_oracle(),
        "kg_pathsim": _kg_pathsim_oracle(),
        "recrawl_schedule": _recrawl_schedule_oracle(),
        "kg_align": _kg_align_oracle(),
        "temp_mixture": _temp_mixture_oracle(),
        "kg_pattern_optional": _kg_pattern_optional_oracle(),
        "kg_property_path": _kg_property_path_oracle(),
        "kg_pattern_minus": _kg_pattern_minus_oracle(),
        "kg_pattern_values": _kg_pattern_values_oracle(),
        "kg_pattern_filter": _kg_pattern_filter_oracle(),
        "kg_pattern_agg": _kg_pattern_agg_oracle(),
        "kg_pattern_topk": _kg_pattern_topk_oracle(),
        "dsir_weights": _dsir_weights_oracle(),
        "dsir_sample": _dsir_sample_oracle(),
        "kg_pattern_union": _kg_pattern_union_oracle(),
        "blocking_quality": _blocking_quality_oracle(),
        "bcubed_quality": _bcubed_oracle(),
        "kg_ego": _kg_ego_oracle(),
        "kg_temporal_conflicts": _kg_temporal_conflicts_oracle(),
        "kg_core_numbers": _kg_core_numbers_oracle(),
        "kg_standing_query": _kg_standing_query_oracle(),
        "emb_drift": _emb_drift_oracle(),
        "kcenter_coreset": _kcenter_oracle(),
        # Bottom-k distinct sketch per host (sketches.kmv_sketch_oracle_sql)
        "host_kmv": _host_kmv_oracle(),
        # Sketch-only pairwise set-operation estimates
        # (sketches.kmv_set_ops_oracle_sql)
        "kmv_set_ops": _kmv_set_ops_oracle(),
        # Z-order layout keys (layout.zorder_key_sql, shared generator)
        "zorder_keys": _zorder_keys_oracle(),
        # Rarity-ranked entity cards (triples.entity_summaries_oracle_sql)
        "entity_cards": _entity_cards_oracle(),
        # Predicate source-diversity QA
        # (triples.predicate_support_profile_oracle_sql)
        "pred_support": _pred_support_oracle(),
        # RDF N-Triples serialization (rdf.to_ntriples_oracle_sql)
        "kg_ntriples": _kg_ntriples_oracle(),
        # SHACL-lite shape validation (triples.validate_shapes_oracle_sql)
        "kg_shapes": _kg_shapes_oracle(),
        # Epoch distribution drift (sketches.histogram_drift_oracle_sql)
        "length_drift": _length_drift_oracle(),
        # Deterministic DeepWalk corpus (graph.kg_random_walks_oracle_sql)
        "kg_random_walks": _kg_random_walks_oracle(),
        # Skip-gram pairs over the walk corpus
        # (graph.walk_skipgrams_oracle_sql wrapping the walks oracle)
        "walk_skipgrams": _walk_skipgrams_oracle(),
        # Degree-distribution quantiles of the closed KG
        # (sketches.exact_quantiles_oracle_sql over the degree table)
        "kg_degree_stats": _kg_degree_stats_oracle(),
        # BGP triple-pattern query: naive conjunctive formulation over
        # the same pattern list (triples.match_patterns_oracle_sql)
        "kg_pattern": _kg_pattern_oracle(),
        # Declared-constraint contradiction table
        # (triples.functional_violations_oracle_sql over _KG_FUNC_SQL)
        "kg_violations": _kg_violations_oracle(),
        # Per-host template mining / stripping
        # (webtext.host_templates_oracle_sql twins over the shared
        # engineered 7-host pages synthesis)
        "host_templates": _host_templates_oracle(),
        "template_strip": _template_strip_oracle(),
        # Filtered KG link-prediction ranking + rollup
        # (graph.ranking_eval_oracle_sql over gold + kg_negatives
        # candidates, md5-32 micro-unit scores)
        "kg_rank_eval": _kg_rank_oracle(summary=False),
        "kg_rank_summary": _kg_rank_oracle(summary=True),
        # Positional bitext mining over deterministic clusters
        # (webtext.bitext_candidates_oracle_sql over the shared
        # sentence prelude)
        "bitext": _bitext_oracle(),
        "mirror_hosts": _mirror_hosts_oracle(),
        "url_equivalence": _url_equivalence_oracle(),
        "containment": _containment_oracle(),
        "html_tables": _html_tables_oracle(),
        "infobox": _infobox_oracle(),
        "host_spam": _host_spam_oracle(),
        "opengraph": _opengraph_oracle(),
        "feed_items": _feed_items_oracle(),
        "crawl_frontier": _crawl_frontier_oracle(),
        "jsonld": _jsonld_oracle(),
        "breadcrumbs": _breadcrumbs_oracle(),
        "breadcrumb_edges": _breadcrumb_edges_oracle(),
        "soft404": _soft404_oracle(),
        "section_lists": _section_lists_oracle(),
        "list_memberships": _list_memberships_oracle(),
        "meta_refresh": _meta_refresh_oracle(),
        "page_entities": _page_entities_oracle(),
        "sameas": _sameas_oracle(),
        "sameas_entities": _sameas_entities_oracle(),
        "pagination": _pagination_oracle(),
        "series_text": _series_text_oracle(),
        "surface_profile": _surface_profile_oracle(),
        "robots_sitemaps": _robots_sitemaps_oracle(),
        "readability": _readability_oracle(),
        "url_templates": _url_templates_oracle(),
        "template_cap": _template_cap_oracle(),
        # Evidence sentences per edge: the shared prelude's triples +
        # sentences CTEs through the edge_evidence twin's shape; the
        # rank ORDER BY casts doc_id to VARCHAR because the Spark side
        # orders by the string url ("10" < "2")
        "edge_evidence": _PRELUDE
        + """,
eev AS (SELECT DISTINCT subj_id, pred, obj_id, doc_id, sent_idx FROM triples),
erk AS (
  SELECT subj_id, pred, obj_id, doc_id, sent_idx,
    row_number() OVER (PARTITION BY subj_id, pred, obj_id
                       ORDER BY doc_id::VARCHAR, sent_idx) AS evidence_rank
  FROM eev
)
SELECT r.subj_id, r.pred, r.obj_id, r.evidence_rank::BIGINT AS evidence_rank,
       r.doc_id, r.sent_idx::BIGINT AS sent_idx, s.sentence
FROM erk r JOIN sentences s
  ON r.doc_id = s.doc_id AND r.sent_idx = s.sent_idx
WHERE r.evidence_rank <= 3
""",
        # In-text temporal qualifiers: same prelude, every 3rd
        # sentence date-injected identically on both engines
        "edge_temporal": _PRELUDE
        + """,
tsn AS (
  SELECT doc_id, sent_idx,
    CASE WHEN sent_idx % 3 = 0
      THEN sentence || ' dated 2020-01-'
           || lpad((sent_idx % 28 + 1)::VARCHAR, 2, '0')
      ELSE sentence END AS sentence
  FROM sentences
),
tev AS (SELECT DISTINCT subj_id, pred, obj_id, doc_id, sent_idx FROM triples),
tdt AS (
  SELECT doc_id, sent_idx,
    coalesce(
      nullif(regexp_extract(sentence,
        '\\b(19|20)\\d{2}-\\d{2}-\\d{2}\\b', 0), ''),
      nullif(regexp_extract(sentence, '\\b(19|20)\\d{2}\\b', 0), ''))
      AS qdate
  FROM tsn
)
SELECT e.subj_id, e.pred, e.obj_id,
       min(d.qdate) AS first_date, max(d.qdate) AS last_date,
       count(d.qdate)::BIGINT AS n_dated, count(*)::BIGINT AS n_evidence
FROM tev e LEFT JOIN tdt d
  ON e.doc_id = d.doc_id AND e.sent_idx = d.sent_idx
GROUP BY e.subj_id, e.pred, e.obj_id
""",
        # Composed confidence: negation rollup (same injection) +
        # support/doc-diversity rollup, micro-unit formula
        "edge_confidence": _PRELUDE
        + r""",
csn AS (
  SELECT doc_id, sent_idx,
    CASE WHEN sent_idx % 4 = 0
      THEN sentence || ' but not confirmed' ELSE sentence END AS sentence
  FROM sentences
),
cev AS (SELECT DISTINCT subj_id, pred, obj_id, doc_id, sent_idx FROM triples),
cpb AS (SELECT doc_id, sent_idx,
          regexp_matches(lower(sentence),
            '\b(not|no|never|none|neither|nor|without|cannot)\b')::BIGINT
            AS neg
        FROM csn),
cng AS (
  SELECT e.subj_id, e.pred, e.obj_id,
         sum(coalesce(p.neg, 0))::BIGINT AS n_negated,
         count(*)::BIGINT AS n_evidence
  FROM cev e LEFT JOIN cpb p
    ON e.doc_id = p.doc_id AND e.sent_idx = p.sent_idx
  GROUP BY e.subj_id, e.pred, e.obj_id
),
cst AS (
  SELECT subj_id, pred, obj_id, count(*)::BIGINT AS support,
         count(DISTINCT doc_id)::BIGINT AS doc_count
  FROM triples GROUP BY subj_id, pred, obj_id
)
SELECT s.subj_id, s.pred, s.obj_id, s.support, s.doc_count,
       n.n_negated, n.n_evidence,
       ((n.n_evidence - n.n_negated) * 1000000 // n.n_evidence)
         * least(s.doc_count, 5) // 5 AS conf_micro
FROM cst s JOIN cng n
  ON s.subj_id = n.subj_id AND s.pred = n.pred AND s.obj_id = n.obj_id
""",
        # Acronym mining: the injected-definitions synthesis through
        # the operator's module-local twin
        "acronyms": _acronyms_oracle(),
        # Quote attribution: injected attributed quotes through the
        # operator's module-local twin
        "quotes": _quotes_oracle(),
        # Numeric facts: injected measurements through the twin
        "numeric_facts": _numeric_facts_oracle(),
        # Outline extraction: deterministic h1/h2/h3 structure
        "headings": _headings_oracle(),
        # List extraction: nav <ul> + ranked <ol> synthesis
        "html_lists": _html_lists_oracle(),
        # N-Triples export: prelude edges through the serializer twin
        "ntriples": _ntriples_oracle(),
        "entity_labels": _ENTITY_LABELS_ORACLE,
        "social": _social_oracle(),
        "contacts": _contacts_oracle(),
        "geo": _geo_oracle(),
        "copula_isa": _copula_isa_oracle(),
        "apposition": _apposition_oracle(),
        "mined_taxonomy": _mined_taxonomy_oracle(),
        "sitemap_index": _sitemap_index_oracle(),
        "declarations": _declarations_oracle(),
        "definitions": _definitions_oracle(),
        # Per-host language mixture: the REAL lang_id oracle body as
        # the rows subquery (FROM-nesting, plain WITH)
        "definition_edges": _definition_edges_oracle(),
        "amp_fold": _amp_fold_oracle(),
        "jsonld_fields": _jsonld_fields_oracle(),
        "anchor_rels": _anchor_rels_oracle(),
        "host_langs": host_lang_mix_oracle_sql(
            "SELECT 'h' || (doc_id % 7) AS host, lang_pred AS lang"
            f" FROM ({langid_sql})"
        ),
        # Negation QA: same prelude, every 4th sentence cue-injected
        "edge_negation": _PRELUDE
        + r""",
nsn AS (
  SELECT doc_id, sent_idx,
    CASE WHEN sent_idx % 4 = 0
      THEN sentence || ' but not confirmed' ELSE sentence END AS sentence
  FROM sentences
),
nev AS (SELECT DISTINCT subj_id, pred, obj_id, doc_id, sent_idx FROM triples),
npb AS (SELECT doc_id, sent_idx,
          regexp_matches(lower(sentence),
            '\b(not|no|never|none|neither|nor|without|cannot)\b')::BIGINT
            AS neg
        FROM nsn)
SELECT e.subj_id, e.pred, e.obj_id,
       sum(coalesce(p.neg, 0))::BIGINT AS n_negated,
       count(*)::BIGINT AS n_evidence
FROM nev e LEFT JOIN npb p
  ON e.doc_id = p.doc_id AND e.sent_idx = p.sent_idx
GROUP BY e.subj_id, e.pred, e.obj_id
""",
        # Compaction planning (checkpoint.compaction_plan_oracle_sql)
        "compaction_plan": _compaction_plan_oracle(),
        # Per-language exact quantiles
        # (sketches.grouped_quantiles_oracle_sql)
        "lang_quantiles": _lang_quantiles_oracle(),
        # Personalized PageRank seed expansion
        # (graph.personalized_pagerank_oracle_sql)
        "seed_expansion": _seed_expansion_oracle(),
        # Distant-supervision NER examples over the mentions prelude
        # (ner_dict.ner_examples_oracle_sql)
        "ner_examples": _ner_examples_oracle(),
        # Page-level link graph with href resolution
        # (webtext.doc_link_graph_oracle_sql)
        "doc_links": _doc_links_oracle(),
        # SURT CDX index keys (webtext.surt_key_oracle_sql)
        "surt_index": _surt_index_oracle(),
        # Doc-level PageRank over the in-corpus page graph
        # (doc_link_graph oracle composing _pagerank_oracle_body)
        "page_rank": _page_rank_oracle(),
        # Hamilton fetch-budget apportionment
        # (sampling.apportion_budget_oracle_sql)
        "crawl_quota": _crawl_quota_oracle(),
        # Exact stratified eval split
        # (sampling.stratified_sample_oracle_sql)
        "eval_split": _eval_split_oracle(),
        # Crawl-delay-capped quotas (sampling.polite_quota_oracle_sql)
        "polite_quota": _polite_quota_oracle(),
        # robots.txt parsing (webtext.parse_robots_oracle_sql)
        "robots_parse": _robots_parse_oracle(),
        # Sitemap parsing (webtext.sitemap_parse_oracle_sql)
        "sitemap_urls": _sitemap_urls_oracle(),
        # Page-level robots directives (webtext.meta_robots_oracle_sql)
        "meta_robots": _meta_robots_oracle(),
        # Translation clusters: hreflang edges + reachability closure
        "hreflang_clusters": _HREFLANG_ORACLE,
        # Announced-newer-than-fetched recrawl targets
        # (webtext.stale_announcements_oracle_sql)
        "stale_pages": _stale_pages_oracle(),
        # Materialized KG node table: mention/doc rollups + degree +
        # the min-label closure, all over the shared prelude
        "kg_node_profile": _PRELUDE.replace("WITH sent0", "WITH RECURSIVE sent0", 1)
        + """
, gd AS (SELECT entity_id, doc_id, count(*) AS c
         FROM linked GROUP BY entity_id, doc_id),
pe AS (SELECT entity_id,
              sum(c)::BIGINT AS n_mentions,
              count(*)::BIGINT AS n_docs,
              min(doc_id % 5)::BIGINT AS first_epoch,
              max(doc_id % 5)::BIGINT AS last_epoch
       FROM gd GROUP BY entity_id),
np_nb AS (
  -- NB: under WITH RECURSIVE, DuckDB 1.0 compiles UNION as UNION ALL
  -- for every CTE in the list — dedup must be an explicit DISTINCT
  SELECT DISTINCT e, n FROM (
    SELECT subj_id AS e, obj_id AS n FROM triples
    UNION ALL SELECT obj_id, subj_id FROM triples
  )
),
np_dg AS (SELECT e, count(*)::BIGINT AS degree FROM np_nb GROUP BY e),
np_edges AS (SELECT DISTINCT subj_id AS a, obj_id AS b FROM triples),
np_sym AS (SELECT a, b FROM np_edges UNION SELECT b, a FROM np_edges),
np_nodes AS (SELECT DISTINCT a AS node FROM np_sym),
np_reach(node, lbl) AS (
  SELECT node, node FROM np_nodes
  UNION
  SELECT e.b, r.lbl FROM np_reach r JOIN np_sym e ON r.node = e.a
),
np_comp AS (SELECT node, min(lbl) AS component FROM np_reach GROUP BY node)
SELECT pe.entity_id,
       coalesce(np_comp.component, pe.entity_id) AS component,
       pe.n_mentions, pe.n_docs, pe.first_epoch, pe.last_epoch,
       coalesce(np_dg.degree, 0)::BIGINT AS degree
FROM pe
LEFT JOIN np_comp ON pe.entity_id = np_comp.node
LEFT JOIN np_dg ON pe.entity_id = np_dg.e
""",
        # Host-level link graph from regex href extraction
        "host_graph": _HOSTLINKS_CTE
        + """
SELECT src_host, dst_host, n_links::BIGINT AS n_links FROM hg
""",
        "host_reciprocity": host_reciprocity_oracle_sql(
            "SELECT src_host AS s, dst_host AS d FROM hg",
            with_prefix=_HOSTLINKS_CTE.rstrip().rstrip(","),
        ),
        "quality_sample": "SELECT doc_id AS id, n_words FROM ("
        + quality_weighted_sample_oracle_sql(
            "SELECT doc_id, len(regexp_extract_all(lower(text), '\\w+'))::BIGINT"
            " AS n_words FROM documents",
            score_expr="n_words",
            max_score=200,
            key="doc_id",
            seed="qs1",
        )
        + ") qs",
        # Co-citation over the same link graph, fanout cap biting
        "host_cocitation": host_cocitation_oracle_sql(_HOSTLINKS_CTE, max_out=3),
        # PageRank over the extracted host link graph (same unrolled
        # body as kg_pagerank, edges from the link-graph CTE)
        "host_rank": _HOSTLINKS_CTE
        + _pagerank_oracle_body(
            e_sql="SELECT DISTINCT src_host AS src, dst_host AS dst FROM hg"
        ),
        "host_hits": _HOSTLINKS_CTE + _hits_oracle_body(iters=3),
        # Anchor-text term profile: element extraction + href/text
        # pulls + target classifier mirrored from webtext
        # (extract_anchors / anchor_terms), synthesis from
        # _synth_anchor_pages
        "anchor_terms": _ANCHORS_PREFIX
        + """,
tok AS (SELECT dst_host,
               unnest(regexp_extract_all(lower(anchor), '[a-z0-9]+')) AS term
        FROM t WHERE dst_host IS NOT NULL AND dst_host != '')
SELECT dst_host, term, count(*)::BIGINT AS n
FROM tok GROUP BY dst_host, term
""",
        # Anchor-phrase alias dictionary mining
        # (webtext.alias_candidates_oracle_sql over the same prefix)
        "alias_candidates": _alias_candidates_oracle(),
        # Recrawl change tracking: lag over (url, warc_ts) — ts unique
        # per fetch by construction, so ordering is total
        "crawl_delta": """
WITH pages AS (
  SELECT 'https://site' || (doc_id % 100) || '.example.net/p' AS url,
         1700000000 + doc_id AS warc_ts,
         'page content ' || (doc_id % 100)
         || (CASE WHEN doc_id % 7 < 2 THEN ' v2' ELSE '' END) AS text,
         doc_id
  FROM documents
),
l AS (SELECT *, lag(text) OVER (PARTITION BY url ORDER BY warc_ts) AS prev
      FROM pages)
SELECT url, warc_ts::BIGINT AS warc_ts, doc_id::BIGINT AS doc_id,
       CASE WHEN prev IS NULL THEN 'new'
            WHEN prev = text THEN 'unchanged'
            ELSE 'changed' END AS change,
       (CASE WHEN prev IS NULL THEN 0
             ELSE length(text) - length(prev) END)::BIGINT AS delta_chars
FROM l
""",
        # CCNet-style paragraph dedup: first (doc_id, pidx) per distinct
        # paragraph survives corpus-wide; row_number mirrors the
        # min(struct) argmin (Spark keys on sha2(para) — same grouping
        # absent collisions)
        "paragraph_dedup": """
WITH d AS (
  SELECT doc_id,
    regexp_replace(text, ' a ', chr(10), 'g')
    || (CASE WHEN doc_id % 2 = 0
        THEN chr(10) || 'subscribe to our newsletter' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0
        THEN chr(10) || 'all rights reserved' ELSE '' END) AS text
  FROM documents
),
p AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pidx,
         unnest(string_split(text, chr(10))) AS para
  FROM d
),
k AS (SELECT doc_id, pidx, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pidx) AS rn
      FROM p),
reb AS (SELECT doc_id,
               string_agg(para, chr(10) ORDER BY pidx) AS text_dedup,
               count(*) AS n_kept
        FROM k WHERE rn = 1 GROUP BY doc_id),
tot AS (SELECT doc_id, len(string_split(text, chr(10))) AS n_paras FROM d)
SELECT t.doc_id::BIGINT AS doc_id,
       coalesce(r.text_dedup, '') AS text_dedup,
       t.n_paras::BIGINT AS n_paras,
       coalesce(r.n_kept, 0)::BIGINT AS n_kept
FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id
""",
        # Crawl-frontier priority: link-graph PageRank (unrolled CTE
        # chain continued past its final iteration via final_sql)
        # joined against recrawl change counts
        "crawl_priority": _HOSTLINKS_CTE
        + _pagerank_oracle_body(
            e_sql="SELECT DISTINCT src_host AS src, dst_host AS dst FROM hg",
            final_sql="""
, pr AS (SELECT node, round(rank, 6) AS rank FROM it3),
pages AS (
  SELECT 'https://site' || ((doc_id % 50) % 37) || '.example.net/p/'
           || (doc_id % 50) AS url,
         'site' || ((doc_id % 50) % 37) || '.example.net' AS host,
         1700000000 + doc_id AS warc_ts,
         'page content ' || (doc_id % 50)
           || (CASE WHEN doc_id % 7 < 2 THEN ' v2' ELSE '' END) AS text
  FROM documents
),
lg AS (SELECT *, lag(text) OVER (PARTITION BY url ORDER BY warc_ts) AS prev
       FROM pages),
freq AS (
  SELECT url, host, count(*) AS n_fetches,
         sum(CASE WHEN prev IS NOT NULL AND prev != text
                  THEN 1 ELSE 0 END) AS n_changed
  FROM lg GROUP BY url, host
)
SELECT f.url, f.n_fetches::BIGINT AS n_fetches,
       f.n_changed::BIGINT AS n_changed,
       round(coalesce(pr.rank, 0.15::DOUBLE) * (1 + f.n_changed), 6)
         AS priority
FROM freq f LEFT JOIN pr ON f.host = pr.node
""",
        ),
        # Deterministic md5-gated sample (threshold string shared with
        # sampling.sample_threshold)
        # full fuzzy-NEL chain: variant surfaces -> bipartite char-gram
        # join vs DISTINCT alias terms -> exact jq rank -> per-surface
        # argmax window (jq DESC, ID ASC, term ASC)
        "fuzzy_link": """
WITH alias(term, id) AS (VALUES __ALIAS__),
terms AS (SELECT DISTINCT lower(term) AS term FROM alias),
surfaces AS (
  SELECT term || 's' AS name FROM terms
  UNION
  SELECT substring(term, 2) FROM terms
),
gl AS (
  SELECT name AS l,
         unnest(list_distinct(
           CASE WHEN length(trim(lower(name))) >= 3
                THEN list_transform(range(1, length(trim(lower(name))) - 1),
                                    i -> substring(trim(lower(name)), i, 3))
                ELSE [trim(lower(name))] END)) AS g
  FROM surfaces
),
gr AS (
  SELECT term AS r,
         unnest(list_distinct(
           CASE WHEN length(trim(lower(term))) >= 3
                THEN list_transform(range(1, length(trim(lower(term))) - 1),
                                    i -> substring(trim(lower(term)), i, 3))
                ELSE [trim(lower(term))] END)) AS g
  FROM terms
),
szl AS (SELECT l, count(*)::BIGINT AS nl FROM gl GROUP BY l),
szr AS (SELECT r, count(*)::BIGINT AS nr FROM gr GROUP BY r),
inter AS (
  SELECT gl.l, gr.r, count(*)::BIGINT AS inter
  FROM gl JOIN gr USING (g) GROUP BY gl.l, gr.r
),
m AS (
  SELECT l, r, inter,
         round(inter / (szl.nl + szr.nr - inter), 6) AS jaccard,
         CAST(floor(inter * 1000000 / (szl.nl + szr.nr - inter)) AS BIGINT) AS jq
  FROM inter JOIN szl USING (l) JOIN szr USING (r)
  WHERE round(inter / (szl.nl + szr.nr - inter), 6) >= 0.4
),
cand AS (
  SELECT m.l AS name, a.id AS entity_id, a.term, m.jq,
         row_number() OVER (PARTITION BY m.l
                            ORDER BY m.jq DESC, a.id ASC, a.term ASC) AS rn
  FROM m JOIN (SELECT DISTINCT lower(term) AS term, id FROM alias) a
    ON a.term = m.r
)
SELECT name, entity_id, jq FROM cand WHERE rn = 1
""".replace("__ALIAS__", _ALIAS_VALUES),
        "name_match": name_similarity_oracle_sql(
            k=3,
            threshold=0.5,
            source=(
                "(SELECT word AS name FROM "
                "  (SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\\w+')) AS word"
                "   FROM documents) "
                " UNION "
                " SELECT word || 's' FROM "
                "  (SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\\w+')) AS word"
                "   FROM documents))"
            ),
        ),
        "topic_id": topic_oracle_sql(),
        "repeated_spans": repeated_spans_oracle_sql(
            k=8,
            min_count=2,
            source=(
                "(SELECT doc_id, text FROM documents UNION ALL "
                "SELECT doc_id + 100000, substr(text, strpos(text, ' ') + 1) "
                "FROM documents)"
            ),
        ),
        "chunk_docs": chunk_docs_oracle_sql(max_tokens=32, overlap=8, min_tail=5),
        # INDEPENDENT membership formulation (exact host or dot-suffix
        # LIKE) — does not mirror the suffix-array construction
        "url_blocklist": _URL_PAGES_CTE
        + """
SELECT doc_id, url FROM h
WHERE NOT (
     host = 'example.org'       OR host LIKE '%.example.org'
  OR host = 'hub.example.com'   OR host LIKE '%.hub.example.com'
  OR host = 'site5.example.net' OR host LIKE '%.site5.example.net'
)
""",
        # exact BIGINT mixture gate: h32(url) * 1e6 < ppm(lang) * 2^32
        "mixture_sample": _URL_PAGES_CTE
        + """
SELECT doc_id, url, lang FROM h
WHERE ('0x' || substr(md5(url), 1, 8))::BIGINT * 1000000
      < (CASE lang WHEN 'en' THEN 750000 WHEN 'de' THEN 500000
                   WHEN 'fr' THEN 250000 ELSE 0 END)::BIGINT * 4294967296
""",
        "deterministic_sample": _sample_oracle(),
        # Domain diversity cap: row_number per host mirrors
        # sampling.per_host_cap (quality DESC, url tie-break)
        "per_host_cap": _URL_PAGES_CTE
        + """
, q AS (SELECT doc_id, url, host,
          ((doc_id * 37) % 101)::DOUBLE / 4::DOUBLE AS quality
        FROM h),
r AS (SELECT *, row_number() OVER (PARTITION BY host
                                   ORDER BY quality DESC, url) AS rn
      FROM q)
SELECT host, url, quality, rn::BIGINT AS host_rank FROM r WHERE rn <= 5
""",
        # Quality-ordered token-budget cut; explicit ROWS frame mirrors
        # Spark's rowsBetween (total order via doc_id tie-break anyway)
        "token_budget": _URL_PAGES_CTE
        + """
, q AS (SELECT doc_id,
          ((doc_id * 37) % 101)::DOUBLE / 4::DOUBLE AS quality,
          50 + doc_id % 200 AS n_tokens
        FROM p),
c AS (SELECT doc_id, quality, n_tokens,
             sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
      FROM q)
SELECT doc_id::BIGINT AS doc_id, quality, n_tokens::BIGINT AS n_tokens,
       cum::BIGINT AS cum_tokens
FROM c WHERE cum <= 30000
""",
        # As-of latest-crawl selection; ORDER BY ts DESC, doc_id DESC
        # mirrors webtext.latest_crawl's max(struct) tie-break
        "latest_crawl": """
WITH pages AS (
  SELECT 'https://' ||
    (CASE WHEN doc_id % 10 < 3 THEN 'hub.example.com'
          ELSE 'site' || (doc_id % 37) || '.example.net' END)
    || '/p/' || (doc_id % 100) AS url,
    1700000000 + (doc_id % 17) * 1000 + doc_id % 7 AS warc_ts,
    doc_id
  FROM documents
),
f AS (SELECT * FROM pages WHERE warc_ts <= 1700013000)
SELECT url, warc_ts::BIGINT AS warc_ts, doc_id::BIGINT AS doc_id
FROM (SELECT *, row_number() OVER (PARTITION BY url
                                   ORDER BY warc_ts DESC, doc_id DESC) AS rn
      FROM f)
WHERE rn = 1
""",
        # Gopher quality-gate battery over restructured multi-line text
        "gopher_filters": _gopher_oracle(),
        # Top word-2-gram char fraction; row_number (cnt DESC, gram
        # ASC) mirrors textstats.word_repetition's min(struct) argmin
        "word_repetition": """
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS words FROM documents
),
denom AS (
  SELECT doc_id, list_sum(list_transform(words, w -> length(w))) AS sum_wlen
  FROM base
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(words) - 1),
                               i -> words[i + 1] || ' ' || words[i + 2])) AS gram
  FROM base WHERE len(words) >= 2
),
cnts AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
top AS (
  SELECT doc_id, gram, cnt FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cnt DESC, gram) AS rn
    FROM cnts) WHERE rn = 1
)
SELECT d.doc_id,
  coalesce(t.gram, '') AS top_gram,
  coalesce(t.cnt, 0)::BIGINT AS top_cnt,
  round(CASE WHEN t.cnt IS NOT NULL AND d.sum_wlen > 0
             THEN (t.cnt * (length(t.gram) - 1)) / d.sum_wlen
             ELSE 0.0::DOUBLE END, 6) AS top_ngram_frac,
  (CASE WHEN t.cnt IS NOT NULL AND d.sum_wlen > 0
        THEN (t.cnt * (length(t.gram) - 1)) / d.sum_wlen
        ELSE 0.0::DOUBLE END <= 0.2) AS repetition_ok
FROM denom d LEFT JOIN top t ON d.doc_id = t.doc_id
""",
    })
