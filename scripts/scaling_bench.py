#!/usr/bin/env python
"""Scaling-efficiency sweep: edges/s of the PGAT train step over mesh sizes.

The SURVEY §8 harness for the >80% edges/s scaling-efficiency target
(BASELINE.md). On real multi-chip hardware run it as-is; without one, pass
--virtual-cpu to exercise the identical SPMD code path on a virtual 8-device
CPU mesh (functional validation only — virtual devices share host cores, so
CPU "efficiency" numbers are not meaningful).

    python scripts/scaling_bench.py --virtual-cpu --devices 1 2 4 8
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--virtual-cpu", action="store_true",
                   help="simulate with 8 virtual CPU devices")
    p.add_argument("--groups-per-device", type=int, default=16)
    p.add_argument("--group-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--feature-mode", default="replicated",
                   choices=["replicated", "partitioned"])
    args = p.parse_args()

    if args.virtual_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count="
                                   f"{max(args.devices)}").strip()
    import jax
    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bench import build_workload
    from taxoexpan_tpu.losses import info_nce_loss
    from taxoexpan_tpu.parallel.partition import (partitioned_gather,
                                                  shard_table)
    from taxoexpan_tpu.ops import star as star_ops

    results = []
    base_eps = None
    for ndev in args.devices:
        if ndev > len(jax.devices()):
            print(f"# skipping n={ndev}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("dp",))
        # weak scaling: per-device batch fixed
        model, params, batch, table, n_edges = build_workload(
            args.groups_per_device * ndev, args.group_size, 4, 11, 32, 64,
            64, 16, [4, 1], 1000, compute_dtype="float32",
            kernel="xla" if args.virtual_cpu else "auto")
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x),
                                     NamedSharding(mesh, P("dp"))), batch)
        params = jax.device_put(params, NamedSharding(mesh, P()))
        if args.feature_mode == "partitioned":
            table_dev = shard_table(table, mesh, "dp")
        else:
            table_dev = jax.device_put(jnp.asarray(table),
                                       NamedSharding(mesh, P()))
        optimizer = optax.amsgrad(1e-3)
        opt_state = jax.device_put(optimizer.init(params),
                                   NamedSharding(mesh, P()))

        def fwd(p_, b_, t_, rng):
            if args.feature_mode == "partitioned":
                feats = partitioned_gather(t_, jnp.asarray(b_.ego.node_ids),
                                           mesh, "dp")
                mask = star_ops.node_mask(jnp.asarray(b_.ego.ngp),
                                          jnp.asarray(b_.ego.nsib),
                                          model.max_parents,
                                          b_.ego.node_ids.shape[1])
                qf = partitioned_gather(t_, jnp.asarray(b_.query_ids),
                                        mesh, "dp")
                return model.forward_with_feats(p_, b_,
                                                feats * mask[..., None], qf,
                                                rng=rng, train=True)
            return model.forward(p_, b_, t_, rng=rng, train=True)

        @jax.jit
        def step(p_, o_, b_, t_, rng):
            def loss_fn(pp):
                s = fwd(pp, b_, t_, rng)
                return info_nce_loss(s, jnp.asarray(b_.labels),
                                     jnp.asarray(b_.cand_mask))
            loss, grads = jax.value_and_grad(loss_fn)(p_)
            upd, o_ = optimizer.update(grads, o_, p_)
            return optax.apply_updates(p_, upd), o_, loss

        rng = jax.random.PRNGKey(0)
        state = [params, opt_state]

        def run(k):
            t0 = time.perf_counter()
            loss = None
            for i in range(k):
                state[0], state[1], loss = step(state[0], state[1], batch,
                                                table_dev,
                                                jax.random.fold_in(rng, i))
            _ = float(loss)
            return time.perf_counter() - t0

        run(2)
        t1 = run(max(args.steps // 4, 1))
        t2 = run(args.steps)
        dt = (t2 - t1) / (args.steps - max(args.steps // 4, 1))
        eps = n_edges / max(dt, 1e-9)
        if base_eps is None:
            base_eps = eps / ndev
        eff = eps / (base_eps * ndev)
        results.append({"devices": ndev, "edges_per_s": round(eps, 1),
                        "efficiency": round(eff, 3)})
        print(f"# n={ndev}: {dt * 1e3:.1f} ms/step, {eps:.3e} edges/s, "
              f"efficiency {eff:.2f}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
