"""easyner_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
EasyNER reference pipeline (callebalik/EasyNER), re-expressed Spark-first.

Architecture (see SURVEY.md):
  pages (url, warc_ts, html, text, lang)
    -> sentences (url, sent_idx, sentence)        [operators.splitter]
    -> mentions  (url, sent_idx, mention, begin, end, class)
                                                  [operators.ner_dict / ner_model]
    -> nodes     (entity canonicalization)        [operators.nel, operators.components]
    -> edges     (subj, pred, obj triples)        [operators.triples]
    + analysis aggregates, evaluation, merge, search, export.

Everything is declarative DataFrame API so Catalyst handles predicate
pushdown / column pruning / broadcast selection / AQE skew splitting;
Python appears only inside Arrow-vectorized pandas UDFs (model-ish ops).
"""

from easyner_spark.session import get_spark


def __getattr__(name):
    # lazy: importing the facade pulls operator modules; keep bare
    # `import easyner_spark` cheap for spark-submit workers
    if name == "KnowledgeGraph":
        from easyner_spark.kg import KnowledgeGraph

        return KnowledgeGraph
    raise AttributeError(name)


__all__ = ["get_spark", "KnowledgeGraph"]
__version__ = "0.1.0"
