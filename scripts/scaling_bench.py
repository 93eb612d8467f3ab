#!/usr/bin/env python
"""Scaling-efficiency sweep: edges/s of the PGAT train step over mesh sizes.

The SURVEY §8 harness for the >80% edges/s scaling-efficiency target
(BASELINE.md). On real multi-chip hardware run it as-is; without one, pass
--virtual-cpu to exercise the identical SPMD code path on a virtual 8-device
CPU mesh (functional validation only — virtual devices share host cores, so
CPU "efficiency" numbers are not meaningful).

    python scripts/scaling_bench.py --virtual-cpu --devices 1 2 4 8

First-real-slice session kit (VERDICT r4 #6): `--kit` runs the full matrix —
replicated + partitioned feature modes, and for partitioned both halo
implementations (TAXOEXPAN_HALO=all_to_all vs ring) — computes efficiency
vs the 1-chip replicated baseline, and writes a SCALING.md artifact, so the
>80% north-star measurement is one command when an N-chip slice appears:

    python scripts/scaling_bench.py --kit --report artifacts/SCALING.md
    # dry-run rehearsal without hardware:
    python scripts/scaling_bench.py --kit --virtual-cpu \
        --report artifacts/SCALING_virtual_cpu.md

Multi-HOST (N>=2 processes — the actual north-star topology): launch one
process per host with the same flags train.py uses
(parallel/distributed.py); the mesh then spans the global device set and
batches/params are assembled per-process via put_global. The 1-chip
reference for the efficiency column comes from a prior single-process run,
passed in as --baseline-eps:

    # on every host i of N:
    python scripts/scaling_bench.py --kit --coordinator host0:1234 \
        --num_processes N --process_id i \
        --baseline-eps <1-chip edges/s from the single-host run> \
        --report artifacts/SCALING_multihost.md
    # local CPU rehearsal (2 processes x 1 virtual device — gloo deadlocks
    # oversubscribed, tests/test_multiprocess.py): exercised by
    # tests/test_scaling_kit_mp.py and artifacts/SCALING_mp_rehearsal.md
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def run_config(args, ndev: int, feature_mode: str, halo: str | None):
    """Time the jitted dp train step on `ndev` devices; returns
    (edges_per_s, ms_per_step) or None when not enough devices. `halo`
    selects the partitioned boundary-exchange implementation (consumed by
    partitioned_gather at trace time via TAXOEXPAN_HALO)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bench import build_workload
    from taxoexpan_tpu.losses import info_nce_loss
    from taxoexpan_tpu.parallel.distributed import put_global, \
        put_global_tree
    from taxoexpan_tpu.parallel.partition import (partitioned_gather,
                                                  shard_table)
    from taxoexpan_tpu.ops import star as star_ops

    if ndev > len(jax.devices()):
        print(f"# skipping n={ndev}: only {len(jax.devices())} devices",
              file=sys.stderr)
        return None
    if jax.process_count() > 1 and ndev != len(jax.devices()):
        # a sub-mesh would leave some processes without local devices in
        # the jitted program — multi-process rows use the full device set
        print(f"# skipping n={ndev}: multi-process runs span all "
              f"{len(jax.devices())} global devices", file=sys.stderr)
        return None
    if halo is not None:
        os.environ["TAXOEXPAN_HALO"] = halo
    else:
        os.environ.pop("TAXOEXPAN_HALO", None)

    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("dp",))
    replicated = NamedSharding(mesh, P())
    # weak scaling: per-device batch fixed. Every process builds the same
    # host workload (deterministic seed); put_global carves out its shards.
    model, params, batch, table, n_edges = build_workload(
        args.groups_per_device * ndev, args.group_size, 4, 11, 32, 64,
        64, 16, [4, 1], 1000, compute_dtype="float32",
        kernel="xla" if args.virtual_cpu else "auto")
    batch = jax.tree_util.tree_map(
        lambda x: put_global(np.asarray(x), NamedSharding(mesh, P("dp"))),
        batch)
    if feature_mode == "partitioned":
        table_dev = shard_table(table, mesh, "dp")
    else:
        table_dev = put_global(np.asarray(table), replicated)
    optimizer = optax.amsgrad(1e-3)
    # init on the local (addressable) params BEFORE globalizing — a global
    # array's data cannot be read back on any single process
    opt_state = put_global_tree(optimizer.init(params), replicated)
    params = put_global_tree(params, replicated)

    def fwd(p_, b_, t_, rng):
        if feature_mode == "partitioned":
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

    # slope timing: two chained counts cancel the constant dispatch/readback
    # latency (docs/PERFORMANCE.md protocol — relay-safe)
    run(2)
    k1 = max(args.steps // 4, 1)
    t1 = run(k1)
    t2 = run(args.steps)
    dt = (t2 - t1) / (args.steps - k1)
    return n_edges / max(dt, 1e-9), dt * 1e3


def config_matrix(args):
    """(label, feature_mode, halo) rows for the sweep."""
    if not args.kit:
        return [(args.feature_mode, args.feature_mode,
                 None if args.feature_mode == "replicated" else "all_to_all")]
    return [("replicated", "replicated", None),
            ("partitioned/all_to_all", "partitioned", "all_to_all"),
            ("partitioned/ring", "partitioned", "ring")]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--virtual-cpu", action="store_true",
                   help="simulate with virtual CPU devices")
    p.add_argument("--groups-per-device", type=int, default=16)
    p.add_argument("--group-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--feature-mode", default="replicated",
                   choices=["replicated", "partitioned"])
    p.add_argument("--kit", action="store_true",
                   help="full first-slice matrix: replicated + partitioned "
                        "x halo A/B + efficiency report")
    p.add_argument("--report", default=None,
                   help="write a SCALING.md artifact to this path")
    # multi-process (multi-host) execution — see parallel/distributed.py
    p.add_argument("--coordinator", default=None, type=str,
                   help="distributed coordinator address host:port")
    p.add_argument("--num_processes", default=None, type=int,
                   help="total process count for multi-host measurement")
    p.add_argument("--process_id", default=None, type=int,
                   help="this process's index in [0, num_processes)")
    p.add_argument("--baseline-eps", type=float, default=None,
                   help="1-chip replicated edges/s from a prior "
                        "single-process run — the efficiency reference "
                        "when this run cannot itself measure 1 chip "
                        "(required for multi-process runs)")
    args = p.parse_args()

    if args.virtual_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count="
                                   f"{max(args.devices)}").strip()
    import jax
    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
    # multi-host wiring BEFORE the first device query (VERDICT r4 #3: the
    # kit previously built its mesh from a single process's jax.devices(),
    # so the N-host north-star number could not run as one command)
    from taxoexpan_tpu.parallel.distributed import maybe_initialize
    mp = maybe_initialize(args.coordinator, args.num_processes,
                          args.process_id)
    if mp:
        # sub-meshes would exclude some processes' devices; the one
        # measurable point is the full global device set
        args.devices = [len(jax.devices())]
        print(f"# multi-process: {jax.process_count()} processes, "
              f"{len(jax.devices())} global devices", file=sys.stderr)
        if args.baseline_eps is None:
            print("# WARNING: no --baseline-eps given — the efficiency "
                  "column will be normalized to this run's own first row "
                  "(trivially 1.0), not to a 1-chip reference",
                  file=sys.stderr)

    results = []
    base_eps_per_dev = None   # 1-chip replicated edges/s — THE reference
    if args.baseline_eps:
        base_eps_per_dev = args.baseline_eps
    for label, feature_mode, halo in config_matrix(args):
        for ndev in args.devices:
            if feature_mode == "partitioned" and ndev == 1:
                continue   # degenerate: no boundary exchange on 1 device
            out = run_config(args, ndev, feature_mode, halo)
            if out is None:
                continue
            eps, ms = out
            if base_eps_per_dev is None:
                base_eps_per_dev = eps / ndev
            eff = eps / (base_eps_per_dev * ndev)
            results.append({"config": label, "devices": ndev,
                            "processes": jax.process_count(),
                            "ms_per_step": round(ms, 2),
                            "edges_per_s": round(eps, 1),
                            "efficiency_vs_1chip": round(eff, 3)})
            print(f"# {label} n={ndev}: {ms:.1f} ms/step, {eps:.3e} "
                  f"edges/s, efficiency {eff:.2f}", file=sys.stderr)

    if jax.process_index() == 0:
        print(json.dumps(results))
        if args.report:
            write_report(args, results)


def write_report(args, results) -> None:
    import jax
    platform = jax.devices()[0].platform
    virtual = " (VIRTUAL CPU — functional dry-run, efficiency numbers are "\
        "not meaningful: devices share host cores)" if args.virtual_cpu \
        else ""
    passing = [r for r in results
               if r["devices"] >= 2 and r["efficiency_vs_1chip"] > 0.8]
    lines = [
        "# Scaling sweep artifact",
        "",
        f"Platform: `{platform}`, {len(jax.devices())} devices{virtual}.",
        f"Weak scaling: {args.groups_per_device} groups/device x "
        f"{args.group_size} candidates, PGAT train step (fwd+bwd+adam), "
        "slope-timed.",
        (f"Processes: {jax.process_count()}; efficiency reference: "
         + (f"--baseline-eps {args.baseline_eps:.3e} edges/s/chip "
            "(prior single-process run)" if args.baseline_eps
            else "this run's 1-chip replicated row")),
        "",
        "| config | devices | ms/step | edges/s | efficiency vs 1 chip |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(f"| {r['config']} | {r['devices']} | "
                     f"{r['ms_per_step']} | {r['edges_per_s']:.3e} | "
                     f"{r['efficiency_vs_1chip']:.3f} |")
    lines += [
        "",
        "North star (BASELINE.md): >80% edges/s efficiency at N>=2 hosts.",
        ("**Result: no configuration evaluated on real multi-chip "
         "hardware yet.**" if args.virtual_cpu else
         f"**Result: {len(passing)} multi-device configs above 0.8 "
         "efficiency.**"),
        "",
        "Reproduce: `python scripts/scaling_bench.py --kit --report "
        "artifacts/SCALING.md`" + (" (drop --virtual-cpu on hardware)"
                                   if args.virtual_cpu else ""),
    ]
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"# report written to {args.report}", file=sys.stderr)


if __name__ == "__main__":
    main()
