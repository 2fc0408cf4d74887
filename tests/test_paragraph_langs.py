"""Per-paragraph language segmentation + per-doc mixture rollup.

Reference parity: EasyNER is monolingual English biomedical text;
mixed-language handling is north_star multilingual-crawl curation
surface (CCNet/mC4 segment before filtering). Same marker lexicon and
argmax rules as textstats.lang_id, at paragraph granularity.
"""

import pytest

from easyner_spark.operators.textstats import paragraph_langs

EN = "the of and to in is was for with that"
DE = "der die und das nicht ist ein zu mit sich"
FR = "le la les des une est pas pour dans sur"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, f"{EN}\n{EN}\n{DE}"),           # mixed: 2 en + 1 de
        (2, f"{DE}\n\n   \n{DE}"),          # pure de; blank paras dropped
        (3, "zzz qqq\nxxx www"),            # no markers -> und
        (4, f"{EN}\n{DE}\n{FR}\n{EN}"),     # 2 en + de + fr
        (5, "\n \n"),                        # only empty paragraphs
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_rollup_values(spark, docs):
    out = {
        r.id: (r.n_paras, r.majority_lang, r.n_langs, r.is_mixed)
        for r in paragraph_langs(docs).collect()
    }
    assert out[1] == (3, "en", 2, True)
    assert out[2] == (2, "de", 1, False)
    assert out[3] == (2, "und", 1, False)
    assert out[4] == (4, "en", 3, True)
    assert 5 not in out  # whitespace-only paragraphs never classify


def test_majority_tie_breaks_to_ascending_code(spark):
    docs = spark.createDataFrame(
        [(1, f"{FR}\n{DE}")], "doc_id int, text string"
    )
    out = paragraph_langs(docs).collect()[0]
    # 1 fr vs 1 de -> 'de' wins the tie (ascending language code)
    assert (out.majority_lang, out.n_langs, out.is_mixed) == ("de", 2, True)


def test_cjk_paragraph_wins_as_zh(spark):
    docs = spark.createDataFrame(
        [(1, f"{EN}\n早安世界 早安")], "doc_id int, text string"
    )
    out = paragraph_langs(docs).collect()[0]
    assert out.n_langs == 2 and out.is_mixed
