#!/usr/bin/env python
"""Train a TaxoExpan model (TPU-native).

CLI-compatible re-design of the reference's train.py: same config files, same
override flags (train.py:50-88), pure-JAX runtime underneath.

    python train.py --config configs/config.synthetic.json
    python train.py --config ... --pm PGAT --rm WMR --mm LBM --lr 1e-3
"""
import argparse
import time

import jax

from taxoexpan_tpu import builders
from taxoexpan_tpu.config import ConfigParser, CustomArg
from taxoexpan_tpu.parallel import make_mesh
from taxoexpan_tpu.train import Trainer
from taxoexpan_tpu.utils import enable_compile_cache


def main(config):
    # multi-process (multi-host) runtime — must come before the first device
    # query; no-op unless --coordinator/--num_processes (or the
    # TAXOEXPAN_COORDINATOR/NUM_PROCESSES/PROCESS_ID env vars) request it
    from taxoexpan_tpu.parallel import maybe_initialize
    maybe_initialize(getattr(config.args, "coordinator", None),
                     getattr(config.args, "num_processes", None),
                     getattr(config.args, "process_id", None))
    enable_compile_cache()
    logger = config.get_logger(
        "train", config["trainer"].get("verbosity", 2))

    taxonomy = builders.build_taxonomy(
        config["train_data_loader"]["args"]["data_path"])
    train_cfg = config["train_data_loader"]["args"]
    train_sampler = builders.build_sampler(taxonomy, train_cfg, "train")
    train_loader = builders.build_loader(train_sampler, train_cfg)

    valid_loader = None
    full_valid_sampler = None
    if "validation_data_loader" in config:
        val_cfg = dict(config["validation_data_loader"]["args"])
        # the validation batch layout must share the train sampler's static
        # grandparent-slot count
        val_cfg["max_parents"] = train_sampler.max_parents
        val_sampler = builders.build_sampler(taxonomy, val_cfg, "validation")
        valid_loader = builders.build_loader(val_sampler, val_cfg)
        if int(config["trainer"].get("full_validation_every", 0) or 0) > 0:
            # full-catalog validation: a sampling_mode-0 view of the same
            # validation split drives the TaxonomyRanker every K epochs
            # (trainer._full_valid) so the monitor keeps discriminative
            # signal after the sampled metrics saturate
            fv_cfg = dict(val_cfg, sampling_mode=0)
            full_valid_sampler = builders.build_sampler(taxonomy, fv_cfg,
                                                        "validation")

    model = builders.build_model(
        config["arch"], max_parents=train_sampler.max_parents,
        expand_factor=train_sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(config.get("seed", 0)))
    logger.info("%s", model.describe(params))

    optimizer = builders.build_optimizer_from_config(
        config["optimizer"], config["trainer"])
    opt_state = optimizer.init(params)
    scheduler = builders.build_scheduler(config.get("lr_scheduler"))

    # "parallel": {"dp": N, "mp": M, "feature_mode": ...} — dp shards the
    # group batch; mp runs GAT attention heads tensor-parallel when it
    # divides the head count (propagation._fused_call_spmd). dp defaults to
    # all devices left over after mp.
    par_cfg = config.get("parallel", {})
    n_dev = len(jax.devices())
    mp = int(par_cfg.get("mp", 1))
    if mp > 1 and n_dev % mp:
        logger.warning("parallel.mp=%d does not divide %d devices; "
                       "disabling tensor parallelism", mp, n_dev)
        mp = 1
    if mp > 1:
        # layers whose head count mp does not divide replicate across the
        # mp axis (propagation._fused_call_spmd use_tp=False). That is fine
        # for the conventional single-head OUTPUT layer riding a TP'd
        # 4-head hidden layer, but if NO layer's head count divides mp,
        # every replica does identical work while dp shrank — strictly
        # worse than dp-only. Refuse that silent degradation.
        heads = config["arch"]["args"].get("heads") or []
        if heads and all(h % mp for h in heads):
            logger.warning(
                "parallel.mp=%d divides none of the head counts %s; all "
                "layers would replicate over mp (wasting ~%dx throughput) "
                "— disabling tensor parallelism, using dp only",
                mp, heads, mp)
            mp = 1
    dp = int(par_cfg.get("dp", 0)) or n_dev // mp
    if dp * mp > 1:
        shape = {"dp": dp} if mp == 1 else {"dp": dp, "mp": mp}
        mesh = make_mesh(shape, jax.devices()[:dp * mp])
        logger.info("SPMD mesh: %s over %d devices", shape, dp * mp)
    else:
        mesh = None
    # "parallel": {"feature_mode": "partitioned"} shards the embedding table
    # across the mesh with all-to-all gathers (parallel/partition.py)
    feature_mode = par_cfg.get("feature_mode", "replicated")
    if mesh is None:
        feature_mode = "replicated"

    trainer = Trainer(model, params, optimizer, opt_state,
                      feature_mode=feature_mode,
                      loss_name=config["loss"],
                      metric_names=config["metrics"],
                      feature_table=train_sampler.node_features,
                      train_loader=train_loader,
                      valid_loader=valid_loader,
                      config=dict(config.config),
                      lr_scheduler=scheduler,
                      mesh=mesh,
                      save_dir=config.save_dir,
                      log_dir=config.log_dir,
                      rng_seed=config.get("seed", 0),
                      full_valid_sampler=full_valid_sampler)
    if config.resume is not None:
        trainer.resume(config.resume)

    start = time.time()
    trainer.train()
    logger.info("Finish training in %.1f seconds", time.time() - start)


if __name__ == "__main__":
    args = argparse.ArgumentParser(
        description="Training taxonomy expansion model")
    args.add_argument("-c", "--config", default=None, type=str,
                      help="config file path")
    args.add_argument("-r", "--resume", default=None, type=str,
                      help="path to latest checkpoint")
    args.add_argument("-d", "--device", default=None, type=str,
                      help="jax platform to use (cpu | tpu)")
    args.add_argument("-s", "--suffix", default="", type=str,
                      help="suffix indicating this run")
    # multi-process (multi-host) execution — see parallel/distributed.py
    args.add_argument("--coordinator", default=None, type=str,
                      help="distributed coordinator address host:port")
    args.add_argument("--num_processes", default=None, type=int,
                      help="total process count for multi-host training")
    args.add_argument("--process_id", default=None, type=int,
                      help="this process's index in [0, num_processes)")
    options = [
        # Data loader (self-supervision generation) — train.py:60-68
        CustomArg(["--train_data"], type=str,
                  target=("train_data_loader", "args", "data_path")),
        CustomArg(["--validation_data"], type=str,
                  target=("validation_data_loader", "args", "data_path")),
        CustomArg(["--bs", "--batch_size"], type=int,
                  target=("train_data_loader", "args", "batch_size")),
        CustomArg(["--ns", "--negative_size"], type=int,
                  target=("train_data_loader", "args", "negative_size")),
        CustomArg(["--ef", "--expand_factor"], type=int,
                  target=("train_data_loader", "args", "expand_factor")),
        CustomArg(["--crt", "--cache_refresh_time"], type=int,
                  target=("train_data_loader", "args", "cache_refresh_time")),
        CustomArg(["--nw", "--num_workers"], type=int,
                  target=("train_data_loader", "args", "num_workers")),
        # Trainer & Optimizer — train.py:69-75
        CustomArg(["--loss"], type=str, target=("loss",)),
        CustomArg(["--ep", "--epochs"], type=int, target=("trainer", "epochs")),
        CustomArg(["--fve", "--full_validation_every"], type=int,
                  target=("trainer", "full_validation_every")),
        CustomArg(["--v", "--verbose_level"], type=int,
                  target=("trainer", "verbosity")),
        CustomArg(["--lr", "--learning_rate"], type=float,
                  target=("optimizer", "args", "lr")),
        CustomArg(["--wd", "--weight_decay"], type=float,
                  target=("optimizer", "args", "weight_decay")),
        # Model architecture — train.py:76-85
        CustomArg(["--pm", "--propagation_method"], type=str,
                  target=("arch", "args", "propagation_method")),
        CustomArg(["--rm", "--readout_method"], type=str,
                  target=("arch", "args", "readout_method")),
        CustomArg(["--mm", "--matching_method"], type=str,
                  target=("arch", "args", "matching_method")),
        CustomArg(["--in_dim"], type=int, target=("arch", "args", "in_dim")),
        CustomArg(["--hidden_dim"], type=int,
                  target=("arch", "args", "hidden_dim")),
        CustomArg(["--out_dim"], type=int, target=("arch", "args", "out_dim")),
        CustomArg(["--pos_dim"], type=int, target=("arch", "args", "pos_dim")),
        CustomArg(["--num_heads"], type=int,
                  target=("arch", "args", "heads", 0)),
        CustomArg(["--feat_drop"], type=float,
                  target=("arch", "args", "feat_drop")),
        CustomArg(["--attn_drop"], type=float,
                  target=("arch", "args", "attn_drop")),
    ]
    config = ConfigParser(args, options)
    main(config)
