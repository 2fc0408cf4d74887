"""PubMed bulk XML loader (S2 core) — fixture-XML parse + counts
ledger parity (reference scripts/pubmed_bulk.py:59-87, 108-139)."""

from __future__ import annotations

import gzip

import pytest

XML_ONE = """<?xml version="1.0" encoding="utf-8"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID Version="1">101</PMID>
      <Article>
        <Journal><JournalIssue><PubDate>
          <Year>2020</Year><Month>Jan</Month><Day>5</Day>
        </PubDate></JournalIssue></Journal>
        <ArticleTitle>Autophagy in <i>yeast</i> cells.</ArticleTitle>
        <Abstract>
          <AbstractText Label="BACKGROUND">Rapamycin inhibits mTOR.</AbstractText>
          <AbstractText Label="RESULTS">Autophagy increased.</AbstractText>
        </Abstract>
      </Article>
      <ChemicalList>
        <Chemical><RegistryNumber>53123-88-9</RegistryNumber>
          <NameOfSubstance UI="D020123">Sirolimus</NameOfSubstance></Chemical>
      </ChemicalList>
      <MeshHeadingList>
        <MeshHeading><DescriptorName UI="D001343">Autophagy</DescriptorName></MeshHeading>
        <MeshHeading><DescriptorName UI="D020123">Sirolimus</DescriptorName></MeshHeading>
      </MeshHeadingList>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID Version="1">102</PMID>
      <Article>
        <Journal><JournalIssue><PubDate>
          <MedlineDate>1998 Dec-1999 Jan</MedlineDate>
        </PubDate></JournalIssue></Journal>
        <ArticleTitle>No abstract here.</ArticleTitle>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""

XML_TWO = """<?xml version="1.0" encoding="utf-8"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>99</PMID>
      <Article>
        <Journal><JournalIssue><PubDate>
          <Year>2021</Year>
        </PubDate></JournalIssue></Journal>
        <ArticleTitle>Second file.</ArticleTitle>
        <Abstract><AbstractText>Plain abstract.</AbstractText></Abstract>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>103</PMID>
      <Article>
        <ArticleTitle>Empty abstract dropped.</ArticleTitle>
        <Abstract><AbstractText></AbstractText></Abstract>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""


@pytest.fixture()
def xml_dir(tmp_path):
    # file 0001 gzipped, file 0002 plain — gzip is sniffed from magic
    # bytes, matching the reference's .xml.gz downloads
    (tmp_path / "pubmed23n0001.xml.gz").write_bytes(gzip.compress(XML_ONE.encode()))
    (tmp_path / "pubmed23n0002.xml").write_text(XML_TWO)
    return str(tmp_path)


def test_parse_fields_and_empty_abstract_drop(spark, xml_dir):
    from easyner_spark.sources.pubmed import pubmed_bulk_load

    rows = {r.pmid: r for r in pubmed_bulk_load(spark, xml_dir).collect()}
    # 102 (no Abstract element) and 103 (empty AbstractText) dropped
    assert set(rows) == {"101", "99"}
    a = rows["101"]
    assert a.title == "Autophagy in yeast cells."  # inline <i> flattened
    # sections joined with one space, labels not injected
    assert a.abstract == "Rapamycin inhibits mTOR. Autophagy increased."
    assert a.mesh_terms == "D001343:Autophagy; D020123:Sirolimus"
    assert a.chemical_list == "D020123:Sirolimus"
    assert a.pubdate == "2020-01-05"
    assert a.file_num == 1
    b = rows["99"]
    assert b.pubdate == "2021" and b.file_num == 2
    assert b.mesh_terms == "" and b.chemical_list == ""


def test_counts_ledger_parity(spark, xml_dir):
    """counts.txt / pmid_list.txt semantics (pubmed_bulk.py:59-87):
    per-file kept-article counts keyed by file number, a total row,
    and a numerically sorted distinct pmid list."""
    from easyner_spark.sinks.export import batch_counts, sorted_id_list
    from easyner_spark.sources.pubmed import pubmed_bulk_load

    arts = pubmed_bulk_load(spark, xml_dir)
    counts = {r.batch: r.n_docs for r in batch_counts(arts, "file_num").collect()}
    assert counts == {"1": 1, "2": 1, "__total__": 2}
    pmids = [r.id for r in sorted_id_list(arts, "pmid", numeric=True).collect()]
    assert pmids == ["99", "101"]  # numeric sort, not lexicographic


def test_medlinedate_fallback_and_pages_projection(spark, tmp_path):
    from easyner_spark.sources.pubmed import pubmed_bulk_load, pubmed_pages

    xml = XML_ONE.replace(
        "<Year>2020</Year><Month>Jan</Month><Day>5</Day>",
        "<MedlineDate>2000 Spring</MedlineDate>",
    )
    (tmp_path / "pubmed23n0007.xml").write_text(xml)
    arts = pubmed_bulk_load(spark, str(tmp_path))
    row = arts.collect()[0]
    assert row.pubdate == "2000"
    pages = pubmed_pages(arts).collect()[0]
    assert pages.doc_id == "101" and pages.text.startswith("Rapamycin")


def test_pubmed_extract_query_escapes_metachars(spark, tmp_path):
    """The driver-contract roundtrip query must survive text containing
    XML metacharacters (escaped into the envelope, unescaped by the
    parser; code-review r2). Since r3 the query is ADVERSARIAL: the
    parser must also append the joined labeled sections, so expected =
    text + ' Conclusion S-' + doc_id."""
    import __spark_entry__ as e

    docs = spark.createDataFrame(
        [(1, "a & b < c > d"), (2, "plain text")],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r.text for r in e.q_pubmed_extract(spark, str(tmp_path)).collect()}
    assert out == {
        1: "a & b < c > d Conclusion S-1",
        2: "plain text Conclusion S-2",
    }
