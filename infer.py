#!/usr/bin/env python
"""Model inference on completely new taxons (the reference's infer.py).

Reads a TSV of `term \t space-separated-embedding` lines, scores every novel
term against every node of the test working graph, and writes the top-5
predicted parents per term.

    python infer.py --resume <ckpt> --taxon new_terms.txt --save out.tsv

Note on normalization: the reference divides novel-term embeddings by their
row SUM (infer.py:34-36) while training uses L2 normalization
(dataset.py:222-223). We default to the training-consistent L2 norm; pass
--sum_norm for bug-compatible behavior (SURVEY.md §7: documented quirk).
"""
import argparse

import jax
import numpy as np

from taxoexpan_tpu import builders
from taxoexpan_tpu.config import ConfigParser
from taxoexpan_tpu.evaluation import TaxonomyRanker
from taxoexpan_tpu.train import checkpoint as ckpt_mod
from taxoexpan_tpu.utils import enable_compile_cache


def load_novel_taxons(path: str) -> tuple[list[str], np.ndarray]:
    """Parse `term \t v1 v2 ...` lines (infer.py:25-38); spaces in terms are
    replaced by underscores like the reference."""
    vocab, rows = [], []
    with open(path) as fin:
        for line in fin:
            line = line.strip()
            if not line:
                continue
            segs = line.split("\t")
            vocab.append("_".join(segs[0].split(" ")))
            rows.append([float(x) for x in segs[1].split(" ")])
    return vocab, np.asarray(rows, dtype=np.float32)


def main(config, args_outer):
    # multi-process (multi-host) runtime — must come before the first device
    # query; no-op unless --coordinator/--num_processes (or the
    # TAXOEXPAN_* env vars) request it
    from taxoexpan_tpu.parallel import maybe_initialize
    maybe_initialize(args_outer.coordinator, args_outer.num_processes,
                     args_outer.process_id)
    enable_compile_cache()
    logger = config.get_logger("infer")
    vocab, nf = load_novel_taxons(args_outer.taxon)
    if config["train_data_loader"]["args"].get("normalize_embed", False):
        if args_outer.sum_norm:
            nf = nf / nf.sum(axis=1, keepdims=True)
        else:
            nf = nf / np.maximum(
                np.linalg.norm(nf, axis=1, keepdims=True), 1e-12)

    test_cfg = dict(config["test_data_loader"]["args"])
    taxonomy = builders.build_taxonomy(test_cfg["data_path"])
    test_cfg["sampling_mode"] = 0
    sampler = builders.build_sampler(taxonomy, test_cfg, "test",
                                     test_topk=args_outer.topk)

    model = builders.build_model(config["arch"],
                                 max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    logger.info("Loading checkpoint: %s ...", config.resume)
    state = ckpt_mod.load_checkpoint(config.resume)
    params = ckpt_mod.restore_params(state, model.init(jax.random.PRNGKey(0)))

    # anchors = every node of the test working graph (infer.py:79-80)
    train_ids = set(taxonomy.train_node_ids)
    anchors = sorted(train_ids | set(taxonomy.test_node_ids))
    rank_mode = 1 if config["loss"].startswith("info_nce") else 0
    encode_chunk = args_outer.batch_size if args_outer.batch_size > 0 else 4096
    mesh = None
    if args_outer.mesh:
        # shard anchor encoding over all visible devices — the reference
        # DataParallels the model at inference too (infer.py:68-69)
        from taxoexpan_tpu.parallel import data_parallel_mesh
        mesh = data_parallel_mesh()
        logger.info("Sharding anchor encoding over %d devices",
                    mesh.devices.size)
    ranker = TaxonomyRanker(model, params, sampler, sampler.node_features,
                            encode_chunk=encode_chunk, anchors=anchors,
                            mesh=mesh)
    predictions = ranker.predict_parents(
        nf, rank_mode, topk=5, prior_lambda=args_outer.prior_lambda)

    if jax.process_index() == 0:
        # multi-process: predictions are replicated, one process owns disk
        with open(args_outer.save, "w") as fout:
            fout.write("Query\tPredicted parents\n")
            for term, parents in zip(vocab, predictions):
                names = ", ".join(taxonomy.vocab[p] for p in parents)
                fout.write(f"{term}\t{names}\n")
    logger.info("Wrote %d predictions to %s", len(vocab), args_outer.save)


if __name__ == "__main__":
    args = argparse.ArgumentParser(
        description="Inference on novel taxons")
    args.add_argument("-r", "--resume", required=True, type=str)
    args.add_argument("-t", "--taxon", required=True, type=str,
                      help="TSV of novel term + embedding")
    args.add_argument("-s", "--save", required=True, type=str,
                      help="output TSV path")
    args.add_argument("-d", "--device", default=None, type=str)
    args.add_argument("-k", "--topk", default=-1, type=int)
    args.add_argument("-b", "--batch_size", default=-1, type=int)
    args.add_argument("-m", "--mesh", action="store_true",
                      help="shard anchor encoding over all devices "
                           "(data-parallel evaluation mesh)")
    args.add_argument("--prior-lambda", dest="prior_lambda", default=None,
                      type=float,
                      help="structure-prior blend weight (raw_channel "
                           "models; calibrate with test_fast.py "
                           "--prior-select first)")
    args.add_argument("--sum_norm", action="store_true",
                      help="normalize novel embeddings by row sum "
                           "(reference bug-compatible mode)")
    # multi-process (multi-host) execution — see parallel/distributed.py;
    # combine with --mesh to shard over the global device set
    args.add_argument("--coordinator", default=None, type=str,
                      help="distributed coordinator address host:port")
    args.add_argument("--num_processes", default=None, type=int,
                      help="total process count for multi-host inference")
    args.add_argument("--process_id", default=None, type=int,
                      help="this process's index in [0, num_processes)")
    args_outer = args.parse_args()
    config = ConfigParser(args)
    main(config, args_outer)
