"""Double-encoding (mojibake) artifact detection.

Reference parity: EasyNER assumes clean UTF-8 PubMed XML
(scripts/downloader.py); charset-corruption detection is north_star
web-crawl hygiene — a wrongly-decoded page passes length/stopword
gates while being garbage for training.
"""

import pytest

from easyner_spark.operators.textstats import mojibake_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "clean english text with no artifacts at all in it"),
        (2, "cafÃ© menÃº jalapeÃ±o"),  # Ã©, Ãº, Ã±
        (3, "itâ€™s â€œquotedâ€"),  # â€™ â€œ â€
        (4, "priceÂ 100Â euros"),                 # Â before spaces
        (5, "lossy � decode � here"),             # replacement chars
        (6, "café jalapeño résumé"),    # PROPER accents: clean
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_artifact_family_counts(spark, docs):
    out = {r.id: r for r in mojibake_stats(docs).collect()}
    assert (out[2].n_atilde, out[2].mojibake_hits, out[2].is_mojibake) == (3, 3, True)
    assert out[3].n_smart == 3 and out[3].is_mojibake
    assert out[4].n_acirc == 2 and out[4].is_mojibake
    assert out[5].n_repl == 2 and out[5].is_mojibake
    assert out[1].mojibake_hits == 0 and not out[1].is_mojibake
    # properly-encoded accents never trip the detector
    assert out[6].mojibake_hits == 0 and not out[6].is_mojibake
    # empty doc: zero hits, not flagged (hits > 0 guard)
    assert out[7].mojibake_hits == 0 and not out[7].is_mojibake


def test_threshold_scales_with_length(spark):
    # one artifact in 2000 chars is below the 1-per-kchar default
    docs = spark.createDataFrame(
        [(1, "x" * 2000 + "Ã©"), (2, "short Ã©")],
        "doc_id int, text string",
    )
    out = {r.id: r.is_mojibake for r in mojibake_stats(docs).collect()}
    assert out == {1: False, 2: True}
    with pytest.raises(ValueError):
        mojibake_stats(docs, hits_per_kchar=0)
