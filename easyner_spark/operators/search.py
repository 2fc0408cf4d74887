"""Entity search / result inspection (SURVEY.md P5/J5).

Reference: scripts/search.py:30-62 keeps sentences whose `entities`
list contains at least one query entity (exact string membership) and
re-emits them with their annotations.

Spark shape: query terms -> broadcast left-semi join against the
mention table (the term list is always tiny, hint it), then a second
left-semi join from sentences on (url, sent_idx). The hit-key side of
that second join is UNBOUNDED — a hot term over a large corpus matches
millions of sentences — so it is NOT hinted by default: AQE picks
broadcast at runtime when the key set turns out small and falls back
to a shuffled hash join when it doesn't. Callers that know their query
is selective can force the hint with ``hint="broadcast"``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hit_keys(mentions: DataFrame, terms: list[str], match_col: str) -> DataFrame:
    spark = mentions.sparkSession
    q = spark.createDataFrame([(t,) for t in terms], "term string")
    return (
        mentions.join(F.broadcast(q), mentions[match_col] == q.term, "left_semi")
        .select("url", "sent_idx")
        .distinct()
    )


def _semi(df: DataFrame, hit_keys: DataFrame, hint: str) -> DataFrame:
    if hint == "broadcast":
        hit_keys = F.broadcast(hit_keys)
    elif hint != "auto":
        raise ValueError(f"hint must be 'auto' or 'broadcast', got {hint!r}")
    return df.join(hit_keys, ["url", "sent_idx"], "left_semi")


def search_sentences(
    sentences: DataFrame,
    mentions: DataFrame,
    terms: list[str],
    match_col: str = "mention",
    hint: str = "auto",
) -> DataFrame:
    """Sentences containing >= 1 query entity.

    `match_col="mention"` is the reference's exact cased membership
    (scripts/search.py:44-45); pass "mention_lc" (and lowercase terms)
    for case-insensitive search. ``hint="auto"`` (default) leaves the
    hit-key join strategy to AQE; ``"broadcast"`` forces the round-1
    behavior for known-selective queries.
    """
    return _semi(sentences, _hit_keys(mentions, terms, match_col), hint)


def search_mentions(
    mentions: DataFrame,
    terms: list[str],
    match_col: str = "mention",
    hint: str = "auto",
) -> DataFrame:
    """All annotations of matching sentences (the reference emits the
    sentence with its full entities/spans lists, scripts/search.py:47-53
    — here: every mention row of every hit sentence)."""
    return _semi(mentions, _hit_keys(mentions, terms, match_col), hint)


def kwic(
    mentions: DataFrame,
    sentences: DataFrame,
    window: int = 30,
    text_col: str = "sentence",
) -> DataFrame:
    """(url, sent_idx, begin, mention, left_ctx, right_ctx) — the
    keyword-in-context concordance over the mention table: up to
    `window` characters of sentence on each side of every mention.
    The corpus-exploration view the reference's search stage prints
    ad hoc (scripts/search.py result inspection), materialized as a
    queryable product — and the human-review feed for NER QA ("show
    me 'inhibits' in context").

    Pure 1-based substring arithmetic on the mention's char offsets
    (begin inclusive, end exclusive, 0-based — the dict_ner/pubtator
    contract), so both engines compute identical windows with zero
    UDF or regex: left = chars [max(begin-w, 0), begin), right =
    chars [end, end+w). One join keyed on (url, sent_idx) — sentence
    rows are unique per key, mention fan-out is per-sentence bounded;
    AQE decides the strategy.
    """
    m = mentions.select("url", "sent_idx", "begin", "end", "mention")
    s = sentences.select(
        "url", "sent_idx", F.col(text_col).alias("_stext")
    )
    start = F.greatest(F.col("begin") + 1 - window, F.lit(1))
    left_len = F.col("begin") + 1 - start
    return (
        m.join(s, ["url", "sent_idx"])
        .select(
            "url",
            "sent_idx",
            F.col("begin").cast("long").alias("begin"),
            "mention",
            F.substring(F.col("_stext"), start, left_len).alias("left_ctx"),
            F.substring(
                F.col("_stext"), F.col("end") + 1, F.lit(window)
            ).alias("right_ctx"),
        )
    )


def kwic_oracle_sql(
    mentions_sql: str, sentences_sql: str, window: int = 30
) -> str:
    """DuckDB twin of :func:`kwic`; mentions_sql yields (url,
    sent_idx, begin, end, mention), sentences_sql (url, sent_idx,
    sentence)."""
    return f"""
WITH km AS ({mentions_sql}),
ks AS ({sentences_sql})
SELECT km.url, km.sent_idx, km.begin::BIGINT AS begin, km.mention,
       substr(ks.sentence,
              greatest(km.begin + 1 - {window}, 1)::INT,
              (km.begin + 1 - greatest(km.begin + 1 - {window}, 1))::INT)
         AS left_ctx,
       substr(ks.sentence, (km."end" + 1)::INT, {window}) AS right_ctx
FROM km JOIN ks ON km.url = ks.url AND km.sent_idx = ks.sent_idx
"""
