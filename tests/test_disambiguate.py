"""Context-based entity disambiguation (Lesk over corpus profiles).

Reference parity: EasyNER's NEL stage (scripts/entity_linking.py) is a
pure dictionary lookup; when one surface maps to several ids it keeps
all of them. disambiguate_mentions is the canonicalization step the
north_star adds on top: pick ONE id per mention from sentence-context
overlap against profiles built from unambiguous mentions.
"""

import pytest
from pyspark.sql import functions as F

from easyner_spark.operators.nel import disambiguate_mentions


@pytest.fixture(scope="module")
def dis_inputs(spark):
    # 'jaguar' is ambiguous (E:CAR | E:CAT); 'xk120' / 'panthera' /
    # 'engine' are unambiguous and feed the profiles.
    alias = spark.createDataFrame(
        [
            ("jaguar", "E:CAR"),
            ("jaguar", "E:CAT"),
            ("xk120", "E:CAR"),
            ("panthera", "E:CAT"),
            ("engine", "E:ENG"),
        ],
        "term string, ID string",
    )
    sentences = spark.createDataFrame(
        [
            ("d1", 0, "the xk120 roars down the road with engine power"),
            ("d1", 1, "panthera stalks prey in the jungle"),
            ("d2", 0, "jaguar prey jungle"),
            ("d3", 0, "jaguar engine road"),
            ("d4", 0, "jaguar the"),
        ],
        "url string, sent_idx int, sentence string",
    )
    mentions = spark.createDataFrame(
        [
            ("d1", 0, 1, 2, "xk120"),
            ("d1", 0, 7, 8, "engine"),
            ("d1", 1, 0, 1, "panthera"),
            ("d2", 0, 0, 1, "jaguar"),
            ("d3", 0, 0, 1, "jaguar"),
            ("d4", 0, 0, 1, "jaguar"),
        ],
        "url string, sent_idx int, begin_tok int, end_tok int, mention_lc string",
    )
    return mentions, sentences, alias


def _rows(df):
    return {
        (r.url, r.sent_idx, r.begin_tok): (r.entity_id, r.n_cands, r.score)
        for r in df.collect()
    }


def test_context_picks_matching_profile(spark, dis_inputs):
    out = _rows(disambiguate_mentions(*dis_inputs))
    # cat-context sentence: overlap {prey, jungle} with E:CAT profile
    assert out[("d2", 0, 0)] == ("E:CAT", 2, 2)
    # car-context sentence: overlap {engine, road} with E:CAR profile
    assert out[("d3", 0, 0)] == ("E:CAR", 2, 2)


def test_tie_breaks_to_min_entity_id(spark, dis_inputs):
    out = _rows(disambiguate_mentions(*dis_inputs))
    # 'the' is in both profiles -> 1 vs 1 -> lexicographic min id
    assert out[("d4", 0, 0)] == ("E:CAR", 2, 1)


def test_unambiguous_passthrough_sentinel(spark, dis_inputs):
    out = _rows(disambiguate_mentions(*dis_inputs))
    assert out[("d1", 0, 1)] == ("E:CAR", 1, -1)  # xk120
    assert out[("d1", 0, 7)] == ("E:ENG", 1, -1)  # engine
    assert out[("d1", 1, 0)] == ("E:CAT", 1, -1)  # panthera
    # every input mention is present exactly once
    assert len(out) == 6


def test_ambiguous_mentions_never_feed_profiles(spark, dis_inputs):
    mentions, sentences, alias = dis_inputs
    # Drop every unambiguous mention: profiles are empty, all overlaps 0,
    # so the min-id fallback decides -- NOT the ambiguous sentences
    # reinforcing themselves.
    amb_only = mentions.where(F.col("mention_lc") == "jaguar")
    out = _rows(disambiguate_mentions(amb_only, sentences, alias))
    assert out[("d2", 0, 0)] == ("E:CAR", 2, 0)
    assert out[("d3", 0, 0)] == ("E:CAR", 2, 0)


def test_profile_token_cap(spark, dis_inputs):
    # cap profiles to 2 tokens: count desc then token asc over the
    # unambiguous corpus. E:CAT tokens all appear once -> keep the 2
    # lexicographically-first: {in, jungle}. 'prey' falls out, so the
    # d2 overlap drops from 2 to 1 ('jungle' only).
    out = _rows(disambiguate_mentions(*dis_inputs, max_profile_tokens=2))
    assert out[("d2", 0, 0)] == ("E:CAT", 2, 1)


def test_duplicate_sentence_rows_do_not_double_count(spark, dis_inputs):
    mentions, sentences, alias = dis_inputs
    doubled = sentences.unionByName(sentences)
    base = _rows(disambiguate_mentions(mentions, sentences, alias))
    dup = _rows(disambiguate_mentions(mentions, doubled, alias))
    assert dup == base  # global (url, sent_idx, tok) distinct, not per-row
