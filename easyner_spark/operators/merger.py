"""Multi-run merge + conflict resolution (SURVEY.md J2/J3, U2, T7).

Reference semantics reproduced:
  - entity_merger.py:36-102 / entity_merger2.py:54-95 align N NER runs
    positionally via the batch-file suffix contract; here that collapses
    to `unionByName` of mention tables keyed by (url, sent_idx) — the
    "same batch size for all runs" restriction (reference README.md:73)
    disappears because the key is real, not positional.
  - conflict resolution (entity_merger2.py:99-146) is an
    ORDER-DEPENDENT sequential loop (delete-while-scanning); bit-exact
    parity requires running it per sentence, so it lives in an
    `applyInPandas` grouped map over (url, sent_idx) — sentence groups
    are tiny (a handful of mentions) and the grouping key is the same
    (url, sent_idx) hash partitioning the rest of the pipeline uses.
  - separator merging (postprocess_separator_merging.py:24-119) —
    same grouped-map treatment, needs the sentence text joined in.

Both loops are re-implemented from the documented behavior (delete
rules + scan order), not copied; divergences: unknown entity classes
get lowest priority instead of KeyError, and tie order within identical
spans is pinned by (begin, end, run_idx) — the reference's order is an
artifact of input-folder order, which `merge_runs` models as run_idx.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference entity_merger2.py:116
DEFAULT_PRIORITY = {"chemical": 1, "disease": 2, "species": 3, "gene": 4, "cell": 5}

SEPARATORS = "-()[]{}"
_BOUNDARY = re.compile(r"[\s.,:;\n]")


def merge_runs(runs: list[DataFrame]) -> DataFrame:
    """Union N per-class mention tables; run_idx records input order
    (the reference's input_folders order, entity_merger2.py:42)."""
    out = None
    for idx, df in enumerate(runs):
        tagged = df.withColumn("run_idx", F.lit(idx))
        out = tagged if out is None else out.unionByName(tagged)
    return out


def _resolve_rows(rows: list[dict], prio: dict[str, int]) -> list[dict]:
    """entity_merger2.py:106-144 behavior: scan i from last to first;
    delete rows[i] on the first j that beats it (same-span priority,
    containment, or longer-overlap), then continue with i-1."""
    worst = max(prio.values(), default=0) + 1
    i = len(rows) - 1
    while i >= 0:
        for j in range(len(rows)):
            si, ei = rows[i]["begin"], rows[i]["end"]
            sj, ej = rows[j]["begin"], rows[j]["end"]
            same_span = si == sj and ei == ej
            if same_span and rows[i]["class"] != rows[j]["class"]:
                if prio.get(rows[i]["class"], worst) > prio.get(rows[j]["class"], worst):
                    del rows[i]
                    break
            elif not same_span and si >= sj and ei <= ej:
                del rows[i]
                break
            elif (si < sj < ei < ej) or (sj < si < ej < ei):
                if len(rows[i]["mention"]) < len(rows[j]["mention"]):
                    del rows[i]
                    break
        if i > 0:
            i -= 1
        else:
            break
    return rows


def resolve_conflicts(
    mentions: DataFrame,
    priority: dict[str, int] | None = None,
) -> DataFrame:
    """Grouped-map conflict resolution; input should carry run_idx (from
    merge_runs) for a deterministic within-span tie order."""
    prio = priority or DEFAULT_PRIORITY
    cols = mentions.columns
    sort_cols = ["begin", "end"] + (["run_idx"] if "run_idx" in cols else ["class", "mention"])
    schema = mentions.schema

    def _per_sentence(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        kept = _resolve_rows(pdf.to_dict("records"), prio)
        return pd.DataFrame(kept, columns=cols) if kept else pd.DataFrame(columns=cols)

    return mentions.groupBy("url", "sent_idx").applyInPandas(_per_sentence, schema)


def _merge_separated_rows(rows: list[dict], text: str) -> list[dict]:
    """postprocess_separator_merging.py:24-119 behavior, on the
    exploded mention rows of one sentence (spans [begin, end)
    exclusive, as in that script's test cases).

    Three passes: (1) extend/merge entities that start or end with a
    separator (list-merge when spans touch, else text-extension to the
    next boundary char); (2) merge entities separated by exactly one
    separator char in the text; (3) drop spans contained in (or equal
    to) another span. The stale-snapshot behavior of the reference
    (the startswith/endswith checks use the entity value captured at
    the top of each i-iteration even after in-place edits) is
    reproduced deliberately.
    """
    i = len(rows) - 1
    while i >= 0:
        snapshot = rows[i]["mention"]
        for sep in SEPARATORS:
            if snapshot.startswith(sep):
                if i > 0 and rows[i - 1]["end"] == rows[i]["begin"]:
                    rows[i - 1]["mention"] += snapshot
                    rows[i - 1]["end"] = rows[i]["end"]
                    if not snapshot.endswith(sep):
                        del rows[i]
                else:
                    start = rows[i]["begin"]
                    while start > 0 and not _BOUNDARY.match(text[start - 1]):
                        start -= 1
                    rows[i]["mention"] = text[start : rows[i]["end"]]
                    rows[i]["begin"] = start
            if i < len(rows) and snapshot.endswith(sep):
                if i + 1 < len(rows) and rows[i]["end"] == rows[i + 1]["begin"]:
                    rows[i]["mention"] += rows[i + 1]["mention"]
                    rows[i]["end"] = rows[i + 1]["end"]
                    del rows[i + 1]
                elif i < len(rows):
                    end = rows[i]["end"]
                    while end < len(text) and not _BOUNDARY.match(text[end]):
                        end += 1
                    rows[i]["mention"] = text[rows[i]["begin"] : end]
                    rows[i]["end"] = end
        i -= 1

    i = len(rows) - 1
    while i >= 1:
        gap = rows[i - 1]["end"]
        if rows[i]["begin"] - 1 == gap:
            for sep in SEPARATORS:
                if text[gap] == sep:
                    rows[i - 1]["mention"] = rows[i - 1]["mention"] + sep + rows[i]["mention"]
                    rows[i - 1]["end"] = rows[i]["end"]
                    del rows[i]
                    break
        i -= 1

    i = len(rows) - 1
    while i > 0:
        for j in range(len(rows)):
            if j != i and rows[i]["begin"] >= rows[j]["begin"] and rows[i]["end"] <= rows[j]["end"]:
                del rows[i]
                break
        i -= 1
    return rows


def merge_separated(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """Repair separator-fragmented mentions. `sentences` supplies the
    text; the join and the grouped map share the (url, sent_idx)
    clustering so AQE plans one shuffle for both."""
    cols = mentions.columns
    schema = mentions.schema
    with_text = mentions.join(
        sentences.select("url", "sent_idx", "sentence"), ["url", "sent_idx"]
    )

    def _per_sentence(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["begin", "end"], kind="stable").reset_index(drop=True)
        text = pdf["sentence"].iloc[0]
        rows = pdf.drop(columns=["sentence"]).to_dict("records")
        kept = _merge_separated_rows(rows, text)
        out = pd.DataFrame(kept, columns=cols) if kept else pd.DataFrame(columns=cols)
        # rebuild derived cols for merged surfaces
        if len(out) and "mention_lc" in out.columns:
            out["mention_lc"] = out["mention"].str.lower()
        return out

    return with_text.groupBy("url", "sent_idx").applyInPandas(_per_sentence, schema)


def merger_v1_export(
    mentions: DataFrame,
    tag_col: str = "class",
    sentences: DataFrame | None = None,
) -> DataFrame:
    """J2 compat boundary: the reference merger's nested per-sentence
    shape (entity_merger.py:20-56): each sentence's flat entity list
    becomes `{tag: [entities]}` / `{tag: [[begin, end], ...]}`, tags
    accumulating across runs via dict.update.

    Boundary notes (ADVICE r2): from the MENTIONS table alone,
    sentences with no mentions are absent from the output; pass
    `sentences` (url, sent_idx, ...) to left-join the full sentence
    universe and emit the reference's empty maps / `{}` json for
    mention-less sentences. And when two runs share a tag, the lists
    are unioned per tag; the reference's dict.update instead REPLACES
    the earlier run's list for that tag — a divergence we keep, since
    losing run-1 annotations on a tag collision is a reference quirk,
    not a contract.

    Columnar shape: two stacked aggs sharing one shuffle — per
    (url, sent_idx, tag) ordered lists, then per (url, sent_idx)
    map_from_entries. Map-key order: ascending run_idx when the input
    carries it (= the reference's input-folder update order), else
    ascending tag. A `json` column renders the byte-stable export
    (to_json keeps map insertion order).
    """
    has_run = "run_idx" in mentions.columns
    order_key = F.min("run_idx") if has_run else F.first(F.lit(0))
    per_tag = (
        mentions.repartition("url", "sent_idx")
        .groupBy("url", "sent_idx", F.col(tag_col).alias("tag"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("begin", "end", "mention"))
            ).alias("spans_sorted"),
            order_key.alias("ord"),
        )
        .select(
            "url",
            "sent_idx",
            "tag",
            "ord",
            F.transform(F.col("spans_sorted"), lambda s: s["mention"]).alias("ents"),
            F.transform(
                F.col("spans_sorted"), lambda s: F.array(s["begin"], s["end"])
            ).alias("spans"),
        )
    )
    nested = per_tag.groupBy("url", "sent_idx").agg(
        F.map_from_entries(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "tag", "ents"))),
                lambda s: F.struct(s["tag"].alias("key"), s["ents"].alias("value")),
            )
        ).alias("entities"),
        F.map_from_entries(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "tag", "spans"))),
                lambda s: F.struct(s["tag"].alias("key"), s["spans"].alias("value")),
            )
        ).alias("entity_spans"),
    )
    if sentences is not None:
        universe = sentences.select("url", "sent_idx").distinct()
        # empty-map literals typed off the agg output so the coalesce
        # branches match whatever begin/end width the input carried
        types = {f.name: f.dataType.simpleString() for f in nested.schema.fields}
        empty_ents = F.from_json(F.lit("{}"), types["entities"])
        empty_spans = F.from_json(F.lit("{}"), types["entity_spans"])
        nested = universe.join(nested, ["url", "sent_idx"], "left").select(
            "url",
            "sent_idx",
            F.coalesce("entities", empty_ents).alias("entities"),
            F.coalesce("entity_spans", empty_spans).alias("entity_spans"),
        )
    return nested.withColumn(
        "json", F.to_json(F.struct("entities", "entity_spans"))
    )
