#!/usr/bin/env python
"""Generate the splitter conformance goldens (VERDICT r2 next-step #5).

Two golden files under tests/golden/, same JSONL shape per line
{"idx": i, "text": ..., "sentences": [...]}:

  splitter_contract.jsonl  pinned-regex contract output
                           (functions.text.split_sentences_py) —
                           regenerable in ANY environment; committed,
                           and byte-pinned by
                           tests/test_splitter_conformance.py so the
                           engine's sentence contract cannot drift
                           silently between rounds.
  splitter_spacy.jsonl     real spaCy en_core_web_sm `doc.sents`
                           output (reference scripts/splitter.py:18-26
                           semantics: str(span) per sentence). Requires
                           spaCy + the model — NOT available in this
                           sandbox; a user runs
                               python tools/gen_splitter_golden.py --spacy
                           offline once, commits the file, and the
                           conformance test then proves byte-parity of
                           `split_sentences_udf(spacy_splitter_factory())`
                           against it wherever spaCy IS installed
                           (and is skipped, not failed, where it isn't).

GOLDEN_TEXTS is the shared corpus: boundary cases that make sentence
splitters disagree (abbreviations, decimals, ellipses, quotes, unicode,
newline runs, missing terminal punctuation).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_TEXTS = [
    "The mTOR kinase binds rapamycin. TSC1 mutations follow.",
    "Dr. Smith et al. reported p < 0.05 in Fig. 2. The cohort was small.",
    "Is this one sentence? No! It is three.",
    "Values rose to 3.5 mg/kg. Then they fell.",
    "First line\nsecond line\n\nthird paragraph. And a sentence.",
    "No terminal punctuation at all",
    'He said "stop here." Then he left.',
    "Ellipsis trails off... and resumes here. Done.",
    "Unicode: die Maus läuft. Ο ποιητής γράφει. 研究は続く。",
    "  Leading and trailing whitespace.  Second sentence here.  ",
    "One.Two (no space after period). Three counts.",
    "E. coli grows fast. S. aureus does not.",
    "",
]


def write_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spacy", action="store_true", help="also emit the spaCy golden")
    ap.add_argument("--model", default="en_core_web_sm")
    args = ap.parse_args()

    out_dir = os.path.join(REPO, "tests", "golden")

    from easyner_spark.functions.text import split_sentences_py

    rows = [
        {"idx": i, "text": t, "sentences": split_sentences_py(t)}
        for i, t in enumerate(GOLDEN_TEXTS)
    ]
    write_jsonl(os.path.join(out_dir, "splitter_contract.jsonl"), rows)
    print(f"wrote splitter_contract.jsonl ({len(rows)} rows)")

    if args.spacy:
        import spacy  # offline only

        nlp = spacy.load(args.model)
        rows = [
            {
                "idx": i,
                "text": t,
                # reference scripts/splitter.py:23-24: str(span) per sent
                "sentences": [str(s) for s in nlp(t).sents] if t else [],
            }
            for i, t in enumerate(GOLDEN_TEXTS)
        ]
        write_jsonl(os.path.join(out_dir, "splitter_spacy.jsonl"), rows)
        print(f"wrote splitter_spacy.jsonl ({len(rows)} rows, model={args.model})")


if __name__ == "__main__":
    main()
