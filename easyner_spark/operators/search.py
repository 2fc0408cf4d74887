"""Entity search / result inspection (SURVEY.md P5/J5).

Reference: scripts/search.py:30-62 keeps sentences whose `entities`
list contains at least one query entity (exact string membership) and
re-emits them with their annotations.

Spark shape: query terms -> broadcast left-semi join against the
mention table, then a second left-semi join from sentences on
(url, sent_idx). Both joins are broadcast (query list and hit-key list
are small relative to the corpus), so no full shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_sentences(
    sentences: DataFrame,
    mentions: DataFrame,
    terms: list[str],
    match_col: str = "mention",
) -> DataFrame:
    """Sentences containing >= 1 query entity.

    `match_col="mention"` is the reference's exact cased membership
    (scripts/search.py:44-45); pass "mention_lc" (and lowercase terms)
    for case-insensitive search.
    """
    spark = sentences.sparkSession
    q = spark.createDataFrame([(t,) for t in terms], "term string")
    hit_keys = (
        mentions.join(F.broadcast(q), mentions[match_col] == q.term, "left_semi")
        .select("url", "sent_idx")
        .distinct()
    )
    return sentences.join(F.broadcast(hit_keys), ["url", "sent_idx"], "left_semi")


def search_mentions(
    mentions: DataFrame, terms: list[str], match_col: str = "mention"
) -> DataFrame:
    """All annotations of matching sentences (the reference emits the
    sentence with its full entities/spans lists, scripts/search.py:47-53
    — here: every mention row of every hit sentence)."""
    spark = mentions.sparkSession
    q = spark.createDataFrame([(t,) for t in terms], "term string")
    hit_keys = (
        mentions.join(F.broadcast(q), mentions[match_col] == q.term, "left_semi")
        .select("url", "sent_idx")
        .distinct()
    )
    return mentions.join(F.broadcast(hit_keys), ["url", "sent_idx"], "left_semi")
