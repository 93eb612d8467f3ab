#!/usr/bin/env python
"""Generate a synthetic taxonomy dataset pickle (no external data needed).

The reference's MAG/SemEval datasets are external downloads; this produces a
learnable stand-in for smoke tests and benchmarks.

    python scripts/make_synthetic_dataset.py --out data/synth.pickle.bin \
        --nodes 2000 --dim 64

--v2 selects the DISCRIMINATIVE generator (synthetic_taxonomy_v2): rotated
ancestor cores make cosine-to-parent retrieval fail by construction while
the structural signal stays learnable — the benchmark on which trained
models must beat the trivial baselines (tests/test_model_quality.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from taxoexpan_tpu.data.synthetic import (synthetic_taxonomy,  # noqa: E402
                                          synthetic_taxonomy_v2)

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--nodes", type=int, default=2000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--max_children", type=int, default=10)
    p.add_argument("--noise", type=float, default=0.35,
                   help="per-edge feature drift; higher = less"
                        " trivially-informative embeddings")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--v2", action="store_true",
                   help="discriminative benchmark generator "
                        "(synthetic_taxonomy_v2); --noise becomes the "
                        "unit-norm SNR knob (try 0.5-1.5)")
    args = p.parse_args()
    gen = synthetic_taxonomy_v2 if args.v2 else synthetic_taxonomy
    taxo = gen(num_nodes=args.nodes, dim=args.dim,
               max_children=args.max_children, noise=args.noise,
               seed=args.seed)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    taxo.save(args.out)
    print(f"wrote {args.out}: {taxo.num_nodes} nodes, {taxo.num_edges} edges, "
          f"{len(taxo.train_node_ids)}/{len(taxo.validation_node_ids)}/"
          f"{len(taxo.test_node_ids)} split")
