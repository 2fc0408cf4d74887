"""Config-driven pipeline runner — the spark-submit entry point.

Reference analog: main.py:275-394 reads config.json and runs the
enabled modules in order (the `ignore` map, config.json:5-17, is the
query plan). Same contract here, Spark-native:

    spark-submit --py-files easyner_spark.zip -m easyner_spark.cli \
        --config job.json
    # or locally:
    python -m easyner_spark.cli --config job.json

Config shape (every key optional except one input path):

    {
      "input":  {"pages_path": "/data/pages.parquet"},
                 # or {"pubmed_xml_path": "/data/pubmed/"} — S2 ingest
      "output_dir": "/data/out",
      "modules": {"splitter": true, "ner": true, "analysis": true,
                   "nel": true, "triples": true, "components": true,
                   "dedup": false,   # content-hash duplicate drop
                   "chart": false},  # top-n barchart SVG export
      "dictionary_path": "terms.txt",      # one term per line (+ optional \\tclass)
      "alias_path": "alias.tsv",           # term\\tID
      "lang": "en",
      "resume": true                        # skip stages whose table exists
    }

Each stage materializes a SnapshotTable under output_dir (the
reference's file-per-stage contract, transactional); `resume` skips
completed stages — re-running a failed job picks up where it died.
Without dictionary/alias paths the built-in fixture vocabulary is used
(demo mode).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load_terms(path: str | None) -> list[tuple[str, str | None]]:
    if path is None:
        from easyner_spark.fixtures import TERMS

        return list(TERMS)
    from easyner_spark.operators.ner_dict import load_terms_file

    out = []
    for term, cls in load_terms_file(path):
        if cls is None and "\t" in term:
            term, cls = term.split("\t", 1)
        out.append((term, cls))
    return out


def _load_alias(spark: SparkSession, path: str | None) -> DataFrame:
    if path is None:
        from easyner_spark.fixtures import ALIAS

        return spark.createDataFrame(ALIAS, "term string, ID string")
    return (
        spark.read.option("sep", "\t")
        .csv(path)
        .toDF("term", "ID")
        .where(F.col("term").isNotNull())
    )


def run_pipeline(spark: SparkSession, cfg: dict) -> dict[str, int]:
    """Run the enabled stages; returns {stage: row_count}."""
    from easyner_spark.operators.analysis import entity_frequency
    from easyner_spark.operators.components import connected_components
    from easyner_spark.operators.ner_dict import dict_ner
    from easyner_spark.operators.nel import link_entities, primary_alias
    from easyner_spark.operators.splitter import split_sentences
    from easyner_spark.operators.triples import aggregate_edges, extract_triples
    from easyner_spark.sinks.checkpoint import SnapshotTable

    out_dir = cfg.get("output_dir", "/tmp/easyner_out")
    modules = {
        "splitter": True, "ner": True, "analysis": True,
        "nel": True, "triples": True, "components": True,
        **cfg.get("modules", {}),
    }
    resume = cfg.get("resume", True)
    keys = {
        "sentences": ["url", "sent_idx"],
        "mentions": ["url", "sent_idx", "begin", "end", "class"],
        "frequency": ["mention"],
        "linked": ["url", "sent_idx", "begin", "end", "class", "entity_id"],
        "edges": ["subj_id", "pred", "obj_id"],
        "nodes": ["node"],
    }
    tables = {n: SnapshotTable(f"{out_dir}/{n}", k) for n, k in keys.items()}

    def materialize(name: str, df_fn) -> DataFrame | None:
        t = tables[name]
        if resume and t.current_snapshot() is not None:
            print(f"[skip] {name}: snapshot {t.current_snapshot()} exists")
            return t.read(spark)
        df = df_fn()
        t.overwrite(df)
        return t.read(spark)

    counts: dict[str, int] = {}
    inp = cfg["input"]
    if "pubmed_xml_path" in inp:
        # the reference's primary real-data ingest (S2): baseline
        # XML[.gz] files -> article table -> canonical pages shape
        from easyner_spark.sources.pubmed import pubmed_bulk_load, pubmed_pages

        pages = (
            pubmed_pages(pubmed_bulk_load(spark, inp["pubmed_xml_path"]))
            .withColumnRenamed("doc_id", "url")
            .withColumn("lang", F.lit(cfg.get("lang", "en")))
        )
    else:
        pages = spark.read.parquet(inp["pages_path"])

    # Boilerplate stripping (north_star stage 1): forced via
    # modules.extract, or automatic when the crawl has html but no
    # pre-extracted text column. Narrow projection — no snapshot table,
    # it fuses into the splitter stage's scan.
    want_extract = modules.get("extract", "text" not in pages.columns)
    if want_extract and "html" in pages.columns:
        from easyner_spark.operators.boilerplate import extract_text

        pages = (
            extract_text(pages, out_col="__extracted")
            .withColumn("text", F.col("__extracted"))
            .drop("__extracted")
        )

    # exact dedup gate (off by default): drop content-hash duplicates
    # before any downstream stage. Runs AFTER boilerplate extraction so
    # it hashes the text the pipeline actually processes (and works on
    # html-only crawls); one shuffle on the uniform hash key.
    if modules.get("dedup"):
        from easyner_spark.operators.dedup import exact_dedup

        flags = exact_dedup(pages, text_col="text", id_col="url")
        pages = pages.join(
            flags.where(~F.col("is_dup")).select("url"), "url", "left_semi"
        )

    sents = None
    if modules["splitter"]:
        sents = materialize(
            "sentences", lambda: split_sentences(pages, lang_filter=cfg.get("lang", "en"))
        )
        counts["sentences"] = sents.count()

    ments = None
    if modules["ner"] and sents is not None:
        terms = _load_terms(cfg.get("dictionary_path"))
        ments = materialize("mentions", lambda: dict_ner(sents, terms))
        counts["mentions"] = ments.count()

    if modules["analysis"] and ments is not None:
        freq = materialize(
            "frequency", lambda: entity_frequency(ments, mention_col="mention_lc")
        )
        counts["frequency"] = freq.count()
        if modules.get("chart"):
            from easyner_spark.sinks.chart import write_barchart_svg

            write_barchart_svg(
                freq, f"{out_dir}/top_entities.svg", n=cfg.get("chart_top_n", 50)
            )

    linked = None
    if modules["nel"] and ments is not None:
        alias = primary_alias(_load_alias(spark, cfg.get("alias_path")))
        linked = materialize(
            "linked", lambda: link_entities(ments, alias, keep_unmatched=False)
        )
        counts["linked"] = linked.count()

    edges = None
    if modules["triples"] and linked is not None:
        edges = materialize("edges", lambda: aggregate_edges(extract_triples(linked)))
        counts["edges"] = edges.count()

    if modules["components"] and edges is not None:
        nodes = materialize(
            "nodes",
            lambda: connected_components(
                edges.select(F.col("subj_id").alias("src"), F.col("obj_id").alias("dst"))
            ),
        )
        counts["nodes"] = nodes.count()

    return counts


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="easyner_spark.cli")
    ap.add_argument("--config", required=True)
    args = ap.parse_args(argv)
    with open(args.config, encoding="utf-8") as f:
        cfg = json.load(f)

    from easyner_spark.session import get_spark

    spark = get_spark("easyner-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    counts = run_pipeline(spark, cfg)
    print(json.dumps({"stages": counts}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
