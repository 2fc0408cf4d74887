"""Differential parity: the engine's conflict-resolution and
separator-merge loops vs the reference implementations themselves
(loaded function-by-function from /root/reference — read-only; module
bodies have side effects so only defs+imports are executed).

This is the bit-exact guarantee SURVEY.md section 7.4 asks for on the
order-dependent loops."""

import ast
import contextlib
import io
import os
import random

import pandas as pd
import pytest

from easyner_spark.operators.merger import (
    _merge_separated_rows,
    _resolve_rows,
    DEFAULT_PRIORITY,
    merge_runs,
    resolve_conflicts,
)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not available"
)


def _load_funcs(path):
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    keep = [
        n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.Import, ast.ImportFrom))
        and not (isinstance(n, (ast.Import, ast.ImportFrom)) and _nonstdlib(n))
    ]
    ns = {}
    exec(compile(ast.Module(body=keep, type_ignores=[]), path, "exec"), ns)
    return ns


def _nonstdlib(node):
    names = [a.name for a in node.names] if isinstance(node, ast.Import) else [node.module or ""]
    return any(n.split(".")[0] not in {"os", "json", "re", "collections"} for n in names)


@pytest.fixture(scope="module")
def ref_sep():
    return _load_funcs(f"{REF}/supplementary/experiment_scripts/postprocess_separator_merging.py")


@pytest.fixture(scope="module")
def ref_merge():
    return _load_funcs(f"{REF}/supplementary/experiment_scripts/entity_merger2.py")


def _run_ref_sep(ref_sep, entities, spans, text):
    e, s = [list(x) for x in (entities, [list(p) for p in spans])]
    with contextlib.redirect_stdout(io.StringIO()):
        e2, s2 = ref_sep["merge_entities"](e, s, text)
    return list(zip(e2, [tuple(p) for p in s2]))


def _run_mine_sep(entities, spans, text):
    rows = [
        {"mention": m, "begin": b, "end": e, "class": "x"}
        for m, (b, e) in zip(entities, spans)
    ]
    out = _merge_separated_rows(rows, text)
    return [(r["mention"], (r["begin"], r["end"])) for r in out]


def test_separator_merge_reference_testcase(ref_sep):
    # the reference's own commented test case (:154-156)
    text = "ab(de fg]hi jk{lm no-pq rs-tu, vw x-y-z a-b-c. abc d-e-f; gh-ij-kl"
    entities = ["ab", "(de", "]hi", "jk{", "lm", "no-", "-", "vw", "x-", "-z", "a-", "abc", "-e-", "gh", "ij-"]
    spans = [(0, 2), (2, 5), (8, 11), (12, 15), (15, 17), (18, 21), (26, 27), (31, 33), (34, 36), (37, 39), (40, 42), (46, 49), (52, 55), (58, 60), (61, 64)]
    assert _run_mine_sep(entities, spans, text) == _run_ref_sep(ref_sep, entities, spans, text)


def test_separator_merge_gst_testcase(ref_sep):
    text = "Co-immunoprecipitation analysis and glutathione-S-transferase (GST) pull down assay were conducted to analyze the association between EZH2 and H2BY37ph ."
    entities = ["glutathione", "-"]
    spans = [(36, 47), (47, 48)]
    assert _run_mine_sep(entities, spans, text) == _run_ref_sep(ref_sep, entities, spans, text)


def test_separator_merge_fuzz(ref_sep):
    rng = random.Random(7)
    vocab = ["ab", "cd-ef", "(gh)", "x", "ij-", "-kl", "m{n", "op"]
    for trial in range(200):
        toks = [rng.choice(vocab) for _ in range(rng.randint(2, 8))]
        text = " ".join(toks) + "."
        # random token-aligned sub-spans as entities
        spans, ents = [], []
        pos = 0
        for t in toks:
            if rng.random() < 0.6:
                b = pos + rng.randint(0, max(0, len(t) - 1))
                e = pos + rng.randint(b - pos + 1, len(t))
                spans.append((b, e))
                ents.append(text[b:e])
            pos += len(t) + 1
        if not ents:
            continue
        expected = _run_ref_sep(ref_sep, ents, spans, text)
        got = _run_mine_sep(ents, spans, text)
        assert got == expected, (trial, text, ents, spans)


def _run_ref_conflicts(ref_merge, rows):
    doc = {
        "a1": {
            "title": "",
            "sentences": [
                {
                    "text": "t",
                    "entities": [r["mention"] for r in rows],
                    "entity_spans": [[r["begin"], r["end"]] for r in rows],
                    "entity_classes": [r["class"] for r in rows],
                }
            ],
        }
    }
    with contextlib.redirect_stdout(io.StringIO()):
        out = ref_merge["remove_conflicting_entities"](doc)
    s = out["a1"]["sentences"][0]
    return list(zip(s["entities"], [tuple(p) for p in s["entity_spans"]], s["entity_classes"]))


def test_conflict_resolution_fuzz(ref_merge):
    rng = random.Random(11)
    classes = list(DEFAULT_PRIORITY)
    words = ["mtor", "tsc1 gene", "rapamycin", "x", "longermention", "ab"]
    for trial in range(300):
        n = rng.randint(1, 7)
        rows = []
        for _ in range(n):
            b = rng.randint(0, 20)
            e = b + rng.randint(1, 10)
            rows.append(
                {"mention": rng.choice(words), "begin": b, "end": e, "class": rng.choice(classes)}
            )
        rows.sort(key=lambda r: (r["begin"], r["end"]))
        expected = _run_ref_conflicts(ref_merge, [dict(r) for r in rows])
        got = [
            (r["mention"], (r["begin"], r["end"]), r["class"])
            for r in _resolve_rows([dict(r) for r in rows], DEFAULT_PRIORITY)
        ]
        assert got == expected, (trial, rows)


def test_merge_runs_and_resolve_spark(spark):
    """Spark-level plumbing: two runs with engineered conflicts
    (FIXTURES.md F6)."""
    cols = "url string, sent_idx int, mention string, mention_lc string, begin int, end int, begin_tok int, end_tok int, class string"
    run_gene = spark.createDataFrame(
        [
            ("u", 0, "mtor", "mtor", 0, 4, 0, 1, "gene"),       # same span as chemical -> gene loses
            ("u", 0, "tsc1 gene", "tsc1 gene", 10, 19, 2, 4, "gene"),
        ],
        cols,
    )
    run_chem = spark.createDataFrame(
        [
            ("u", 0, "mtor", "mtor", 0, 4, 0, 1, "chemical"),
            ("u", 0, "tsc1", "tsc1", 10, 14, 2, 3, "chemical"),  # contained in tsc1 gene -> dropped
        ],
        cols,
    )
    merged = merge_runs([run_gene, run_chem])
    out = resolve_conflicts(merged).toPandas().sort_values("begin")
    assert list(out["mention"]) == ["mtor", "tsc1 gene"]
    assert list(out["class"]) == ["chemical", "gene"]


class TestMergerV1Export:
    def test_nested_map_shape(self, spark):
        """Reference entity_merger.py:20-56: per sentence
        {tag: [entities]} / {tag: [[b, e], ...]}, tags in run order."""
        from easyner_spark.operators.merger import merger_v1_export

        rows = [
            ("u", 0, "aspirin", 0, 7, "chemical", 0),
            ("u", 0, "fever", 10, 15, "disease", 1),
            ("u", 0, "mild fever", 5, 15, "disease", 1),
            ("u", 1, "tnf", 0, 3, "gene", 2),
        ]
        m = spark.createDataFrame(
            rows,
            "url string, sent_idx int, mention string, begin int, end int, "
            "class string, run_idx int",
        )
        out = {r.sent_idx: r for r in merger_v1_export(m).where("url = 'u'").collect()}
        s0 = out[0]
        assert s0.entities == {
            "chemical": ["aspirin"],
            "disease": ["mild fever", "fever"],  # (begin, end) order
        }
        assert s0.entity_spans == {
            "chemical": [[0, 7]],
            "disease": [[5, 15], [10, 15]],
        }
        assert list(s0.entities.keys()) == ["chemical", "disease"]  # run order
        assert out[1].entities == {"gene": ["tnf"]}
        # byte-stable export boundary
        import json

        j = json.loads(s0.json)
        assert j["entities"]["disease"] == ["mild fever", "fever"]
        assert j["entity_spans"]["chemical"] == [[0, 7]]


class TestCoOccurrence:
    def test_reference_loop_quirks(self, spark):
        """entity_parser.py:4-55 bit-parity: X-label merge, B-without-
        space accumulation, trailing-entity drop, punctuation chains."""
        from easyner_spark.operators.iob import co_occurrence

        rows = [
            # seq 0: two entities incl. separator repair + detok chain
            (0, 0, "TNF", "B"), (0, 1, "-", "I"), (0, 2, "alpha", "I"),
            (0, 3, "binds", "O"), (0, 4, "IL", "B"), (0, 5, "##6", "X"),
            (0, 6, ".", "O"),
            # seq 1: trailing entity never closed by an O -> dropped
            (1, 0, "only", "O"), (1, 1, "aspirin", "B"),
            # seq 2: B directly after B accumulates without a space
            (2, 0, "foo", "B"), (2, 1, "bar", "B"), (2, 2, "!", "O"),
        ]
        toks = spark.createDataFrame(
            rows, "seq_id int, tok_idx int, token string, label string"
        )
        out = {r.seq_id: r for r in co_occurrence(toks).collect()}
        assert out[0].entities == ["TNF-alpha", "IL6"]  # ' - ' repaired; X merged
        assert out[0].has_cooccurrence is True
        assert out[0].text == "TNF-alpha binds IL6."  # ' - '->'-', ' .'->'.'
        assert out[1].entities == []  # trailing entity dropped (ref quirk)
        assert out[2].entities == ["foobar"]  # B-after-B, no space (ref quirk)
        assert out[2].has_cooccurrence is False


def test_merger_v1_export_single_shuffle(spark, tmp_path):
    """The two stacked aggs share the one explicit (url, sent_idx)
    repartition — one real hashpartitioning exchange in the final plan."""
    from easyner_spark.operators.merger import merger_v1_export
    from pyspark.sql import functions as F

    rows = [("u", 0, "a", 0, 1, "x", 0), ("u", 0, "b", 2, 3, "y", 1)]
    m = spark.createDataFrame(
        rows,
        "url string, sent_idx int, mention string, begin int, end int, "
        "class string, run_idx int",
    )
    path = str(tmp_path / "m.parquet")
    m.write.parquet(path)
    out = merger_v1_export(spark.read.parquet(path))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    real = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "ReusedExchange" not in l
    ]
    assert len(real) == 1, plan


def test_merger_v1_export_empty_sentences(spark):
    """ADVICE r2: with a `sentences` universe, mention-less sentences
    export the reference's empty maps / '{}' json instead of being
    absent."""
    import json as _json

    from easyner_spark.operators.merger import merger_v1_export

    m = spark.createDataFrame(
        [("u", 0, "tsc1", 0, 4, "gene")],
        "url string, sent_idx int, mention string, begin int, end int, class string",
    )
    sents = spark.createDataFrame(
        [("u", 0, "x"), ("u", 1, "no entities here")],
        "url string, sent_idx int, sentence string",
    )
    out = {r.sent_idx: r for r in merger_v1_export(m, sentences=sents).collect()}
    assert set(out) == {0, 1}
    assert out[0].entities == {"gene": ["tsc1"]}
    assert out[1].entities == {} and out[1].entity_spans == {}
    parsed = _json.loads(out[1].json)
    assert parsed == {"entities": {}, "entity_spans": {}}
