#!/usr/bin/env python
"""Convert a case-study TSV (from test_fast.py --case) to the SemEval-2016
Task 14 submission format (reference: scripts/parse_to_semeval_format.py).

Case-study vocab entries look like "lemma.pos.id@@@node_id" (wordnet) under a
"test.<id>" prefix; the submission row is "<id>\t<lemma>#<pos>#<id>\tattach".
"""
import argparse


def parse_string(s: str) -> str:
    # vocab entries are "name@@@node_id"; the reference additionally strips a
    # "word||" display prefix when present (parse_to_semeval_format.py:8)
    if "||" in s:
        s = s.split("||")[1]
    return s.split("@@@")[0]


def main(input_path: str, output_path: str) -> None:
    with open(input_path, "r") as fin, open(output_path, "w") as fout:
        for lid, line in enumerate(fin):
            if lid == 0:  # header row
                continue
            line = line.strip()
            if not line:
                continue
            segs = line.split("\t")
            test_id = parse_string(segs[0])[len("test."):]
            predict_id = parse_string(segs[2].split(", ")[0])
            lemma, pos, tmp_id = predict_id.split(".")
            predict_id = "#".join([lemma, pos, str(int(tmp_id))])
            fout.write("\t".join([test_id, predict_id, "attach", "\n"]))


if __name__ == "__main__":
    args = argparse.ArgumentParser(description="Parse to SemEval format")
    args.add_argument("--input", type=str, required=True)
    args.add_argument("--output", type=str, required=True)
    ns = args.parse_args()
    main(ns.input, ns.output)
