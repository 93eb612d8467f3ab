#!/usr/bin/env python
"""Convert a case-study TSV (from test_fast.py --case) to the SemEval-2016
Task 14 submission format (reference: scripts/parse_to_semeval_format.py —
output is byte-identical, golden-tested in tests/test_scripts.py).

Case-study vocab entries look like "lemma.pos.id@@@node_id" (wordnet) under a
"test.<id>" prefix; the submission row is "<id>\t<lemma>#<pos>#<id>\tattach"
followed by the reference's trailing tab (its output line is a tab-join that
includes the newline, so every row ends "attach\t\n" — kept verbatim for
submission-file parity).
"""
from __future__ import annotations

import argparse
from typing import Iterable, Iterator


def vocab_name(entry: str) -> str:
    """'name@@@node_id' -> 'name', dropping an optional 'word||' display
    prefix (wordnet vocab decoration)."""
    _, _, tail = entry.partition("||")
    name = tail if tail else entry
    return name.partition("@@@")[0]


def submission_rows(tsv_lines: Iterable[str]) -> Iterator[str]:
    """Yield SemEval submission rows (without line terminators) from
    case-study TSV lines. Column 0 = query ('test.<id>'), column 2 =
    comma-separated predicted parents, best first."""
    rows = iter(tsv_lines)
    next(rows, None)  # header
    for raw in rows:
        if not raw.strip():
            continue
        cols = raw.rstrip("\n").split("\t")
        query_id = vocab_name(cols[0]).removeprefix("test.")
        top1 = vocab_name(cols[2].split(", ")[0])
        lemma, pos, synset_num = top1.split(".")
        yield f"{query_id}\t{lemma}#{pos}#{int(synset_num)}\tattach"


def main(input_path: str, output_path: str) -> None:
    with open(input_path) as fin, open(output_path, "w") as fout:
        for row in submission_rows(fin):
            fout.write(row + "\t\n")


if __name__ == "__main__":
    args = argparse.ArgumentParser(description="Parse to SemEval format")
    args.add_argument("--input", type=str, required=True)
    args.add_argument("--output", type=str, required=True)
    ns = args.parse_args()
    main(ns.input, ns.output)
