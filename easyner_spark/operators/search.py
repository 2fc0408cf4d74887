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
