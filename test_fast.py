#!/usr/bin/env python
"""Evaluate a trained checkpoint: rank every test query against all candidate
positions (the reference's test_fast.py, re-designed around one-shot anchor
encoding + all-pairs matmul scoring).

    python test_fast.py --resume saved/.../model_best.ckpt [--case out.tsv]
"""
import argparse

import jax

from taxoexpan_tpu import builders
from taxoexpan_tpu.config import ConfigParser
from taxoexpan_tpu.evaluation import TaxonomyRanker
from taxoexpan_tpu.train import checkpoint as ckpt_mod
from taxoexpan_tpu.utils import enable_compile_cache


def main(config, args_outer):
    import time
    t0 = time.time()
    # multi-process (multi-host) runtime — must come before the first device
    # query; no-op unless --coordinator/--num_processes (or the
    # TAXOEXPAN_* env vars) request it. The ranker's mesh path is
    # multi-process-safe (put_global batch assembly, replicated outputs).
    from taxoexpan_tpu.parallel import maybe_initialize
    maybe_initialize(args_outer.coordinator, args_outer.num_processes,
                     args_outer.process_id)
    enable_compile_cache()
    logger = config.get_logger("test")
    need_case_study = args_outer.case != ""
    if need_case_study:
        logger.info("save case study results to %s", args_outer.case)

    test_cfg = dict(config["test_data_loader"]["args"])
    if args_outer.test_data:
        test_cfg["data_path"] = args_outer.test_data
    taxonomy = builders.build_taxonomy(test_cfg["data_path"])
    test_cfg["sampling_mode"] = 0
    sampler = builders.build_sampler(taxonomy, test_cfg, "test",
                                     test_topk=args_outer.topk)
    t_data = time.time()

    model = builders.build_model(config["arch"],
                                 max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    logger.info("Loading checkpoint: %s ...", config.resume)
    state = ckpt_mod.load_checkpoint(config.resume)
    params = ckpt_mod.restore_params(state, model.init(jax.random.PRNGKey(0)))
    t_ckpt = time.time()

    rank_mode = 1 if config["loss"].startswith("info_nce") else 0
    encode_chunk = args_outer.batch_size if args_outer.batch_size > 0 else 4096
    mesh = None
    if args_outer.mesh:
        # shard anchor encoding over all visible devices (the multi-chip
        # replacement for the reference's single-GPU --batch_size 30000
        # chunking, test_fast.py:149-179)
        from taxoexpan_tpu.parallel import data_parallel_mesh
        mesh = data_parallel_mesh()
        logger.info("Sharding anchor encoding over %d devices",
                    mesh.devices.size)
    # Structure-prior blend (raw_channel models only): a fixed --prior-lambda,
    # or --prior-select to calibrate it on the VALIDATION split first (the
    # selected lam never sees test data; ranker.select_prior_lambda).
    prior_lambda = args_outer.prior_lambda
    if args_outer.prior_select:
        lambdas = [float(x) for x in args_outer.prior_select.split(",")]
        val_cfg = dict(config["validation_data_loader"]["args"],
                       sampling_mode=0, max_parents=sampler.max_parents,
                       expand_factor=sampler.expand_factor)
        val_sampler = builders.build_sampler(taxonomy, val_cfg, "validation")
        val_ranker = TaxonomyRanker(model, params, val_sampler,
                                    val_sampler.node_features,
                                    encode_chunk=encode_chunk, mesh=mesh)
        prior_lambda, curve = val_ranker.select_prior_lambda(
            lambdas, rank_mode, select_metric=args_outer.prior_metric)
        logger.info("prior-blend selection on validation (%s): %s -> "
                    "lam=%.4g", args_outer.prior_metric, curve, prior_lambda)
    ranker = TaxonomyRanker(model, params, sampler,
                            sampler.node_features,
                            encode_chunk=encode_chunk, mesh=mesh)
    logger.info("Number of queries: %d", len(sampler.node_list))
    ranker.encode_all_anchors()
    t_encode = time.time()
    result, cases = ranker.evaluate(config["metrics"], rank_mode,
                                    case_study=need_case_study,
                                    prior_lambda=prior_lambda)
    logger.info(
        "stage timing: data+sampler %.1fs, checkpoint %.1fs, encode %.1fs, "
        "rank %.1fs", t_data - t0, t_ckpt - t_data, t_encode - t_ckpt,
        time.time() - t_encode)
    if need_case_study and jax.process_index() == 0:
        # multi-process: metrics are replicated, one process owns the disk
        with open(args_outer.case, "w") as fout:
            for row in cases:
                fout.write("\t".join(row) + "\n")
    logger.info("%s", result)
    return result


if __name__ == "__main__":
    args = argparse.ArgumentParser(
        description="Testing taxonomy expansion model")
    args.add_argument("-td", "--test_data", default="", type=str,
                      help="test data path; defaults to the config's")
    args.add_argument("-r", "--resume", required=True, type=str,
                      help="path to checkpoint")
    args.add_argument("-d", "--device", default=None, type=str,
                      help="jax platform (cpu | tpu)")
    args.add_argument("-k", "--topk", default=-1, type=int,
                      help="retrieval-prefilter size, -1 = no retrieval stage")
    args.add_argument("-b", "--batch_size", default=-1, type=int,
                      help="anchor-encoding chunk size; -1 = default 4096 "
                           "(use e.g. 30000 for MAG-Full scale)")
    args.add_argument("-c", "--case", default="", type=str,
                      help="case study output TSV ('' = disabled)")
    args.add_argument("--prior-lambda", dest="prior_lambda", default=None,
                      type=float,
                      help="structure-prior blend weight (raw_channel "
                           "models; score + lam * raw-channel dot)")
    args.add_argument("--prior-select", dest="prior_select", default="",
                      type=str,
                      help="comma-separated lam grid; calibrates the blend "
                           "on the validation split, then evaluates test "
                           "with the winner (e.g. '0,0.25,1,4')")
    args.add_argument("--prior-metric", dest="prior_metric",
                      default="combined_metrics", type=str,
                      help="selection metric for --prior-select")
    args.add_argument("-m", "--mesh", action="store_true",
                      help="shard anchor encoding over all devices "
                           "(data-parallel evaluation mesh)")
    # multi-process (multi-host) execution — see parallel/distributed.py;
    # combine with --mesh to shard over the global device set
    args.add_argument("--coordinator", default=None, type=str,
                      help="distributed coordinator address host:port")
    args.add_argument("--num_processes", default=None, type=int,
                      help="total process count for multi-host evaluation")
    args.add_argument("--process_id", default=None, type=int,
                      help="this process's index in [0, num_processes)")
    args_outer = args.parse_args()
    config = ConfigParser(args)
    main(config, args_outer)
