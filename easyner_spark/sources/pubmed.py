"""PubMed bulk XML loader (SURVEY.md §2.1 S2 core).

Reference: scripts/pubmed_bulk.py:108-139 (`load_xml_and_convert`)
parses each downloaded ``pubmed<baseline>n<num>.xml[.gz]`` file with
the public `pubmed_parser` library and keeps, for every article whose
abstract is a NON-EMPTY string, the dict
``{title, abstract, mesh_terms, pubdate, chemical_list}`` keyed by
pmid; scripts/pubmed_bulk.py:59-87 then writes a per-file counts
ledger plus a numerically sorted pmid list (those ledgers are
`sinks.export.batch_counts` / `sorted_id_list` here).

Spark shape: a `binaryFile` scan (one row per .xml/.xml.gz file —
Spark parallelizes across files exactly like the reference's per-file
loop, but cluster-wide) feeding an Arrow `mapInPandas` parser
(stdlib ElementTree; gzip sniffed from the magic bytes, not the file
name). Nothing shuffles — ingest runs at scan speed; the downstream
canonical `pages` projection is (doc_id=pmid, title, text=abstract).

Field contract (mirroring `pubmed_parser.parse_medline_xml`'s output
the reference consumes, year_info_only=False):
  - pmid           MedlineCitation/PMID text
  - title          ArticleTitle, all inline markup flattened (itertext)
  - abstract       AbstractText sections: each section's inline text
                   flattened, sections joined with a single space;
                   a Label attribute is NOT injected into the text
  - mesh_terms     '; '-joined 'UI:name' of MeshHeading descriptors
  - pubdate        'YYYY-MM-DD' (zero-padded) from Article/Journal/
                   JournalIssue/PubDate, degrading to 'YYYY-MM'/'YYYY'
                   when month/day are absent; month names normalized
  - chemical_list  '; '-joined 'UI:name' of ChemicalList substances
  - file_num       numeric suffix of the source file name (the
                   reference's per-file ledger key, pubmed_bulk.py:78)
Articles with a missing or empty abstract are DROPPED (the
reference's `len(art["abstract"]) > 0` gate, pubmed_bulk.py:117-119).
"""

from __future__ import annotations

import gzip
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PUBMED_SCHEMA = (
    "pmid string, title string, abstract string, mesh_terms string, "
    "pubdate string, chemical_list string, file_num int"
)

_MONTHS = {
    "jan": "01", "feb": "02", "mar": "03", "apr": "04", "may": "05",
    "jun": "06", "jul": "07", "aug": "08", "sep": "09", "oct": "10",
    "nov": "11", "dec": "12",
}


def _flat(elem) -> str:
    """Flatten an element's inline markup to its visible text
    (pubmed_parser's stringify_children semantics: concatenated
    itertext, outer whitespace stripped)."""
    return "".join(elem.itertext()).strip() if elem is not None else ""


def _month(raw: str) -> str | None:
    raw = raw.strip().lower()
    if raw.isdigit():
        return f"{int(raw):02d}"
    return _MONTHS.get(raw[:3])


def _pubdate(art) -> str:
    pd = art.find(".//Article/Journal/JournalIssue/PubDate")
    if pd is None:
        return ""
    year = _flat(pd.find("Year"))
    if not year:
        # MedlineDate fallback: first 4-digit run is the year
        m = re.search(r"\d{4}", _flat(pd.find("MedlineDate")))
        return m.group(0) if m else ""
    month = _month(_flat(pd.find("Month")) or "")
    if month is None:
        return year
    day = _flat(pd.find("Day"))
    if day.isdigit():
        return f"{year}-{month}-{int(day):02d}"
    return f"{year}-{month}"


def _ui_name_list(art, item_path: str, ui_path: str) -> str:
    out = []
    for it in art.findall(item_path):
        tgt = it.find(ui_path)
        if tgt is None:
            continue
        out.append(f"{tgt.attrib.get('UI', '')}:{_flat(tgt)}")
    return "; ".join(out)


def parse_pubmed_xml_bytes(blob: bytes, file_num: int) -> list[tuple]:
    """One file -> article tuples (the empty-abstract drop applied).

    Streaming parse (iterparse + element clearing): a baseline file is
    ~30 MB gzipped / ~600 MB of XML, and a whole-file DOM would cost
    several GB of Python objects per task — iterparse holds ONE
    PubmedArticle subtree at a time, so task memory is O(article), not
    O(file)."""
    import io
    import xml.etree.ElementTree as ET

    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    rows = []
    for _event, art in ET.iterparse(io.BytesIO(blob), events=("end",)):
        if art.tag != "PubmedArticle":
            continue
        cit = art.find("MedlineCitation")
        if cit is None:
            art.clear()
            continue
        sections = [
            _flat(s) for s in cit.findall(".//Article/Abstract/AbstractText")
        ]
        abstract = " ".join(x for x in sections if x)
        if not abstract:
            art.clear()
            continue  # reference gate: len(abstract) > 0
        rows.append(
            (
                _flat(cit.find("PMID")),
                _flat(cit.find(".//Article/ArticleTitle")),
                abstract,
                _ui_name_list(cit, ".//MeshHeadingList/MeshHeading", "DescriptorName"),
                _pubdate(cit),
                _ui_name_list(cit, ".//ChemicalList/Chemical", "NameOfSubstance"),
                file_num,
            )
        )
        art.clear()  # free the subtree: O(article) task memory
    return rows


def file_num_from_name(name: str, k: str = "23") -> int:
    """Reference file-ordering key: int suffix after '<k>n' in the stem
    (pubmed_bulk.py:103: split on k+'n', strip extensions)."""
    stem = re.sub(r"\.(xml|json)(\.gz)?$", "", name.rsplit("/", 1)[-1])
    tail = stem.split(f"{k}n")[-1]
    m = re.search(r"\d+", tail)
    return int(m.group(0)) if m else -1


def pubmed_bulk_load(
    spark: SparkSession, path: str, k: str = "23"
) -> DataFrame:
    """Scan + parse a directory/glob of PubMed baseline XML files into
    the article table. One task per file (binaryFile rows are never
    split); cluster-scale parallelism = number of files, exactly the
    reference's unit of work."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def gen(batches) -> Iterator["pd.DataFrame"]:
        cols = [
            "pmid", "title", "abstract", "mesh_terms",
            "pubdate", "chemical_list", "file_num",
        ]
        for pdf in batches:
            for path_, blob in zip(pdf["path"], pdf["content"]):
                rows = parse_pubmed_xml_bytes(bytes(blob), file_num_from_name(path_, k))
                yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(gen, PUBMED_SCHEMA)


def pubmed_pages(articles: DataFrame) -> DataFrame:
    """Canonical pages projection: doc_id=pmid, title, text=abstract
    (what the reference pipeline feeds its splitter,
    pubmed_bulk.py:120-125 -> splitter_pubmed.py)."""
    return articles.select(
        F.col("pmid").alias("doc_id"),
        "title",
        F.col("abstract").alias("text"),
        "file_num",
    )
