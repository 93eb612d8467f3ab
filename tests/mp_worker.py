"""Subprocess worker for tests/test_multiprocess.py — NOT a pytest module.

Runs a small deterministic training job (no dropout, no shuffle, fixed
seeds) over a data-parallel mesh spanning ALL global devices, either as one
process (--nproc 1) or as one rank of a local multi-process cluster
(jax.distributed over 127.0.0.1). The multi-process run must produce the
same losses/metrics as the single-process run on the same 8-device mesh:
the global batches are identical (replicated deterministic sampling,
parallel/distributed.py) and GSPMD compiles the same program — only the
collective transport differs (in-process vs gloo).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--local_devices", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--save_dir", default=None,
                    help="enable per-epoch checkpoints into this dir")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices} "
        + os.environ.get("XLA_FLAGS_EXTRA", ""))
    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nproc, process_id=args.pid)

    import faulthandler
    faulthandler.dump_traceback_later(600, exit=True)
    print(f"[{args.pid}] distributed up: {len(jax.devices())} global "
          f"devices", flush=True)

    from taxoexpan_tpu import builders
    from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
    from taxoexpan_tpu.parallel import make_mesh
    from taxoexpan_tpu.train import Trainer

    n_dev = len(jax.devices())
    assert n_dev == args.nproc * args.local_devices, jax.devices()

    taxo = synthetic_taxonomy(num_nodes=400, dim=16, seed=3)
    cfg = {"batch_size": 16, "negative_size": 7, "expand_factor": 6,
           "cache_refresh_time": 10 ** 9, "normalize_embed": True,
           "num_workers": 0, "sampling_mode": 1, "shuffle": False}
    vcfg = {"batch_size": 16, "negative_size": 16, "expand_factor": 6,
            "cache_refresh_time": 10 ** 9, "normalize_embed": True,
            "num_workers": 0, "sampling_mode": 0, "shuffle": False}
    arch = {"args": {"propagation_method": "PGAT", "readout_method": "WMR",
                     "matching_method": "LBM", "in_dim": 16,
                     "hidden_dim": 32, "out_dim": 32, "pos_dim": 8,
                     "num_layers": 1, "heads": [2, 1], "feat_drop": 0.0,
                     "attn_drop": 0.0, "hidden_drop": 0.0, "out_drop": 0.0}}

    sampler = builders.build_sampler(taxo, cfg, "train")
    loader = builders.build_loader(sampler, cfg)
    vcfg["max_parents"] = sampler.max_parents
    vsampler = builders.build_sampler(taxo, vcfg, "validation")
    vloader = builders.build_loader(vsampler, vcfg)
    # full-catalog validation sampler: epoch 2 runs trainer._full_valid
    # (TaxonomyRanker under the multi-process mesh), epoch 1 the sampled
    # pass — both validation paths execute in one run
    fv_sampler = builders.build_sampler(taxo, vcfg, "validation")
    model = builders.build_model(arch, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = builders.build_optimizer_from_config(
        {"type": "Adam", "args": {"lr": 1e-3}}, {})
    opt_state = optimizer.init(params)
    mesh = make_mesh({"dp": n_dev})

    trainer = Trainer(model, params, optimizer, opt_state,
                      loss_name="info_nce_loss",
                      metric_names=["macro_mr", "hit_at_1"],
                      feature_table=sampler.node_features,
                      train_loader=loader, valid_loader=vloader,
                      config={"trainer": {
                          "epochs": 2,
                          "save_period": 1 if args.save_dir else 10 ** 9,
                          "monitor": "off",
                          "full_validation_every": 2}},
                      mesh=mesh,
                      save_dir=args.save_dir or "/tmp/mp_worker_unused",
                      full_valid_sampler=fv_sampler)
    print(f"[{args.pid}] trainer built, starting train", flush=True)
    log = trainer.train()

    # sharded evaluation under the same (possibly multi-process) mesh —
    # exercises the ranker's put_global encode/rank path
    from taxoexpan_tpu.evaluation import TaxonomyRanker
    tcfg = dict(vcfg)
    tcfg["max_parents"] = sampler.max_parents
    tsampler = builders.build_sampler(taxo, tcfg, "test")
    ranker = TaxonomyRanker(model, trainer.params, tsampler,
                            tsampler.node_features, encode_chunk=64,
                            query_chunk=16, mesh=mesh)
    res, _ = ranker.evaluate(["macro_mr", "hit_at_1", "mrr_scaled_10"], 1)

    out = {"pid": args.pid, "loss": log["loss"],
           "val_metrics": log.get("val_metrics", []),
           "eval": {k: float(v) for k, v in res.items()}}
    with open(args.out, "w") as f:
        json.dump(out, f)
    print("WORKER_DONE", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
