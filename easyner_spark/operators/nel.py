"""Named-entity linking: mentions -> linked mentions (SURVEY.md J1).

Reference: scripts/nel.py:13-33 — for each mention string, exact
equality lookup against a (term, ID) TSV; one-to-many (ALL matching IDs
are kept, :26-28); no match -> '' (:30).

Spark shape: the alias dictionary is broadcast (small side), so the
lookup is a broadcast hash join — no shuffle, immune to URL-host skew
(a skewed mention distribution never concentrates on one reducer
because there IS no reducer). This is the north_star's "salted
broadcast-join against an alias dictionary": salting is only needed if
the dictionary outgrows the broadcast threshold and the join must
shuffle; `salted=True` demonstrates that formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_entities(
    mentions: DataFrame,
    alias: DataFrame,
    mention_col: str = "mention_lc",
    keep_unmatched: bool = True,
    salt_buckets: int | None = None,
) -> DataFrame:
    """mentions + alias(term, ID) -> mentions with `entity_id`.

    - one-to-many alias rows fan out (native join semantics,
      reference scripts/nel.py:26-28);
    - unmatched mentions keep entity_id = '' when `keep_unmatched`
      (reference :30), else are dropped;
    - `salt_buckets=k` shows the shuffle-join formulation for an
      oversized dictionary: replicate each alias row k times with a
      salt key and join on (term, salt) where the fact side picks
      pmod(hash(url), k) — spreads a hot term over k reducers.
    """
    norm_alias = alias.select(F.lower("term").alias("__term"), F.col("ID"))

    if salt_buckets:
        salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        salted_alias = norm_alias.withColumn("__salt", salts)
        fact = mentions.withColumn(
            "__salt", F.pmod(F.hash("url"), F.lit(salt_buckets))
        )
        joined = fact.join(
            salted_alias,
            (fact[mention_col] == salted_alias["__term"])
            & (fact["__salt"] == salted_alias["__salt"]),
            "left_outer" if keep_unmatched else "inner",
        ).drop("__salt")
    else:
        joined = mentions.join(
            F.broadcast(norm_alias),
            mentions[mention_col] == norm_alias["__term"],
            "left_outer" if keep_unmatched else "inner",
        )

    out = joined.drop("__term")
    if keep_unmatched:
        out = out.withColumn("entity_id", F.coalesce(F.col("ID"), F.lit("")))
    else:
        out = out.withColumn("entity_id", F.col("ID"))
    return out.drop("ID")


def primary_alias(alias: DataFrame) -> DataFrame:
    """Deterministic one-id-per-term canonicalization (min ID) used by
    the KG path; the full one-to-many fanout is the NEL-compat path."""
    return (
        alias.groupBy(F.lower("term").alias("term"))
        .agg(F.min("ID").alias("ID"))
    )


def canonicalize_mentions(mentions: DataFrame, alias: DataFrame) -> DataFrame:
    """KG canonicalization: one entity_id per mention (primary alias);
    unmatched mentions fall back to a deterministic surface id so they
    still participate in the graph."""
    linked = link_entities(mentions, primary_alias(alias))
    return linked.withColumn(
        "entity_id",
        F.when(F.col("entity_id") == "", F.concat(F.lit("surface:"), F.col("mention_lc"))).otherwise(
            F.col("entity_id")
        ),
    )
