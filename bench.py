#!/usr/bin/env python
"""Benchmark: PGAT fwd+bwd training throughput on TPU (edges/s/chip).

Workload is the MAG-CS paper configuration (config.mag.json arch: in=250,
hidden=500, out=500, pos=50, heads [4,1], 1 layer -> 2 GAT layers; batch of
128 InfoNCE groups x 32 candidates, expand_factor 50), on synthetic data —
the reference ships no runnable dataset (BASELINE.md).

Two implementations of identical math are timed:
- star: the dense closed-form star-attention path (this framework's hot path);
- segment: generic gather/scatter segment ops — how a DGL-style SpMM/SDDMM
  implementation maps onto XLA (the reference's computational pattern,
  model/model_zoo.py:80-114), used as the on-chip baseline since the CUDA/DGL
  reference itself cannot run on TPU and publishes no numbers (BASELINE.md).

Prints ONE json line:
  {"metric": "edges_per_s_pgat_fwd_bwd", "value": <star edges/s>,
   "unit": "edges/s/chip", "vs_baseline": <star / segment speedup>}
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_workload(groups, group_size, max_parents, expand_factor, in_dim,
                   hidden_dim, out_dim, pos_dim, heads, num_nodes, seed=0,
                   compute_dtype="bfloat16", kernel="auto", feat_drop=0.1,
                   attn_drop=0.1):
    import jax
    from taxoexpan_tpu.data.egobatch import EgoBatch, GroupBatch
    from taxoexpan_tpu.models import TaxoExpan

    rng = np.random.default_rng(seed)
    model = TaxoExpan("PGAT", "WMR", "BIM", in_dim=in_dim,
                      hidden_dim=hidden_dim, out_dim=out_dim, pos_dim=pos_dim,
                      num_layers=1, heads=list(heads), feat_drop=feat_drop,
                      attn_drop=attn_drop, max_parents=max_parents,
                      expand_factor=expand_factor,
                      compute_dtype=compute_dtype, kernel=kernel)
    params = model.init(jax.random.PRNGKey(0))
    b = groups * group_size
    n = max_parents + 1 + expand_factor
    # realistic fanouts: most anchors have 1-3 parents, near-full sibling sets
    ngp = rng.integers(1, max_parents + 1, (b,)).astype(np.int32)
    nsib = np.minimum(rng.poisson(expand_factor * 0.8, (b,)),
                      expand_factor).astype(np.int32)
    ego = EgoBatch(node_ids=rng.integers(0, num_nodes, (b, n)).astype(np.int32),
                   ngp=ngp, nsib=nsib)
    labels = np.zeros((groups, group_size), np.float32)
    labels[:, 0] = 1.0
    batch = GroupBatch(
        ego=ego,
        query_ids=rng.integers(0, num_nodes, (groups,)).astype(np.int32),
        query_feats=None, labels=labels,
        cand_mask=np.ones((groups, group_size), bool))
    table = rng.normal(size=(num_nodes, in_dim)).astype(np.float32)
    n_edges = int(ngp.sum() + nsib.sum() + (ngp + 1 + nsib).sum())
    return model, params, batch, table, n_edges


def make_step(model, path, optimizer, fwd_only=False):
    import jax
    import jax.numpy as jnp
    import optax
    from taxoexpan_tpu.losses import info_nce_loss
    from taxoexpan_tpu.models.generic import forward_generic

    def fwd(params, batch, table, rng):
        if path == "star":
            return model.forward(params, batch, table, rng=rng, train=True)
        return forward_generic(model, params, batch, table, rng=rng,
                               train=True)

    def loss_of(params, batch, table, rng):
        scores = fwd(params, batch, table, rng)
        return info_nce_loss(scores, jnp.asarray(batch.labels),
                             jnp.asarray(batch.cand_mask))

    if fwd_only:
        # diagnostic: train-mode forward + loss, no grad/update — isolates
        # the forward kernels' share of the step time
        @jax.jit
        def step(params, opt_state, batch, table, rng):
            loss = loss_of(params, batch, table, rng)
            # thread loss into params tree so chained steps stay dependent
            # (the slope protocol relies on the chain forcing every step)
            keyed = jax.tree_util.tree_map(lambda x: x + 0.0 * loss, params)
            return keyed, opt_state, loss
        return step

    @jax.jit
    def step(params, opt_state, batch, table, rng):
        loss, grads = jax.value_and_grad(loss_of)(params, batch, table, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def time_path(path, model, params, batch, table, steps, warmup,
              fwd_only=False, scan=False):
    """Per-step time via the slope of chained step counts.

    On this TPU relay, block_until_ready can return before execution finishes
    and a host readback carries a large constant latency, so neither timing a
    loop nor per-step readback is trustworthy. Instead: run k_short and k_long
    chained steps (state threads through, so forcing the final scalar loss
    forces the whole chain) and divide the time DIFFERENCE by the step
    difference — constant relay/readback overhead cancels.

    scan=True moves the k-step chain INSIDE the jit (lax.scan over a
    step-index array), so each timing run is ONE dispatch regardless of k.
    The host-chained default additionally pays one dispatch round trip per
    step, which cancels in the slope only while the relay is healthy
    (~3 ms/dispatch); during relay-degradation windows a dispatch ACK was
    measured at ~6 s (scripts/relay_health.py), which would swamp the step
    time — use --scan then (and generally: the scan number is the chip
    truth, the default number is chip + healthy-relay dispatch overhead).
    """
    import jax
    import optax

    optimizer = optax.amsgrad(1e-3)
    # COPY the params: scan mode donates its buffers into run_k, and
    # jnp.asarray on an already-device array is a no-op — without the copy
    # the first timed path would delete the caller's params before the
    # baseline path reuses them
    params = jax.tree_util.tree_map(jax.numpy.copy, params)
    opt_state = optimizer.init(params)
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x)), batch)
    table = jax.device_put(table)
    step = make_step(model, path, optimizer, fwd_only=fwd_only)
    rng = jax.random.PRNGKey(0)
    state = {"params": params, "opt_state": opt_state, "i": 0}

    if scan:
        import functools

        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnums=(4,),
                           donate_argnums=(0, 1))
        def run_k(params, opt_state, batch, table, k, i0):
            def body(carry, idx):
                p, o, _ = carry
                p, o, loss = step(p, o, batch, table,
                                  jax.random.fold_in(rng, idx))
                return (p, o, loss), None

            (p, o, loss), _ = jax.lax.scan(
                body, (params, opt_state, jnp.zeros(())),
                i0 + jnp.arange(k, dtype=jnp.uint32))
            return p, o, loss

        def run(k):
            t0 = time.perf_counter()
            state["params"], state["opt_state"], loss = run_k(
                state["params"], state["opt_state"], batch, table, k,
                np.uint32(state["i"]))
            state["i"] += k
            forced = float(loss)
            return time.perf_counter() - t0, forced
    else:
        def run(k):
            t0 = time.perf_counter()
            loss = None
            for _ in range(k):
                state["params"], state["opt_state"], loss = step(
                    state["params"], state["opt_state"], batch, table,
                    jax.random.fold_in(rng, state["i"]))
                state["i"] += 1
            forced = float(loss)  # scalar readback forces the whole chain
            return time.perf_counter() - t0, forced

    run(max(warmup, 1))                       # compile + warm
    k_short, k_long = max(steps // 4, 1), steps
    if scan:
        # one compiled run_k per static k — warm BOTH before timing, or the
        # k_long compile would land inside the timed slope
        run(k_short)
        run(k_long)
    t_short, _ = run(k_short)
    t_long, last_loss = run(k_long)
    dt = (t_long - t_short) / (k_long - k_short)
    return max(dt, 1e-9), last_loss


def step_flops_bytes(groups, group_size, max_parents, expand_factor, in_dim,
                     hidden_dim, out_dim, heads, el_bytes=2):
    """Analytic matmul FLOPs + minimum HBM bytes for one PGAT train step.

    FLOPs: the x@W / attention-projection dots per layer — fwd + backward
    passes (the custom VJP recomputes ft, then dW costs one more pass, and
    dx one more on layer 2; layer 1 skips dx because its input is the
    non-trainable feature tensor, input_grad=False). Attention/aggregation
    VPU work and the matcher are negligible at these dims. So are the
    position-embedding projections: on the "bias" decomposition path
    (propagation.py: pe @ W_p) they are per-SLOT [n, pos_dim] matmuls
    (n ~ 64 slots, not B*n rows), ~1e-4 of the main projection — excluded.
    Bytes: the fused kernel's design traffic — read x + write out per layer
    (+ dx on layer boundaries), weights once; ft never round-trips HBM.
    """
    b = groups * group_size
    n = max_parents + 1 + expand_factor
    rows = b * n
    # layer dims on the pos_mode="bias" path: [in->heads0*hidden, ->out]
    l1_din, l1_hd = in_dim, heads[0] * hidden_dim
    l2_din, l2_hd = heads[0] * hidden_dim, heads[1] * out_dim
    flops = 0
    bytes_hbm = 0
    for passes, nh, (din, hd) in ((3, heads[0], (l1_din, l1_hd)),
                                  (4, heads[1], (l2_din, l2_hd))):
        proj = 2 * rows * din * (hd + 2 * nh)
        flops += passes * proj                   # fwd + remat (+ dx) + dW
        # fwd: read x, write out; bwd: read x + g, write dx (layer 2 only
        # needs dx; layer-1 x is the non-trainable feature tensor)
        bytes_hbm += el_bytes * rows * (2 * din + 3 * hd)
        bytes_hbm += 4 * din * hd * 3            # weights + grads + update
    return flops, bytes_hbm


# bf16 peak TFLOP/s and HBM GB/s per chip by device kind
PEAKS = {"TPU v5 lite": (197e12, 819e9), "TPU v5e": (197e12, 819e9),
         "TPU v4": (275e12, 1228e9), "TPU v6 lite": (918e12, 1640e9)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--groups", type=int, default=128)
    p.add_argument("--group-size", type=int, default=32)
    p.add_argument("--max-parents", type=int, default=13)
    p.add_argument("--expand-factor", type=int, default=50)
    p.add_argument("--in-dim", type=int, default=250)
    p.add_argument("--hidden-dim", type=int, default=500)
    p.add_argument("--out-dim", type=int, default=500)
    p.add_argument("--pos-dim", type=int, default=50)
    p.add_argument("--num-nodes", type=int, default=30000)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="activation compute dtype (bf16 = TPU production path)")
    p.add_argument("--kernel", default="auto",
                   choices=["auto", "pallas", "xla"],
                   help="GAT layer implementation (auto = pallas on TPU)")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (debug); default = real TPU chip")
    p.add_argument("--mesh-dp1", action="store_true",
                   help="run the Pallas kernel under a trivial dp=1 "
                        "shard_map mesh — verifies the SPMD wrapper adds "
                        "no overhead on hardware (VERDICT r1 #1 done-check)")
    p.add_argument("--skip-baseline", action="store_true",
                   help="skip the segment-path baseline timing")
    p.add_argument("--fwd-only", action="store_true",
                   help="diagnostic: time the train-mode forward+loss only "
                        "(no grad/optimizer) to split fwd vs bwd cost")
    p.add_argument("--feat-drop", type=float, default=0.1,
                   help="input-feature dropout rate (0 disables the fused "
                        "in-kernel PRNG mask entirely — ablation knob)")
    p.add_argument("--attn-drop", type=float, default=0.1,
                   help="attention dropout rate (0 skips the per-head "
                        "attention masks — ablation knob)")
    p.add_argument("--scan", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="chain the timed steps inside one jit (lax.scan): "
                        "one dispatch per timing run, immune to relay "
                        "dispatch-latency degradation (see time_path). "
                        "DEFAULT on so unattended BENCH runs measure the "
                        "chip, not the relay's mood; --no-scan restores "
                        "host-chained dispatch timing")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: cold Pallas compiles via the remote-compile
    # relay can take many minutes; warm runs start in seconds
    from taxoexpan_tpu.utils import enable_compile_cache
    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", file=sys.stderr)

    model, params, batch, table, n_edges = build_workload(
        args.groups, args.group_size, args.max_parents, args.expand_factor,
        args.in_dim, args.hidden_dim, args.out_dim, args.pos_dim, [4, 1],
        args.num_nodes, compute_dtype=args.dtype, kernel=args.kernel,
        feat_drop=args.feat_drop, attn_drop=args.attn_drop)
    if args.mesh_dp1:
        from taxoexpan_tpu.parallel import make_mesh
        model.propagate.spmd = (make_mesh({"dp": 1}, jax.devices()[:1]),
                                "dp")
        print("# Pallas kernel under dp=1 shard_map mesh", file=sys.stderr)
    print(f"# workload: {args.groups * args.group_size} egonets/step, "
          f"{n_edges} edges/step", file=sys.stderr)

    star_dt, star_loss = time_path("star", model, params, batch, table,
                                   args.steps, args.warmup,
                                   fwd_only=args.fwd_only, scan=args.scan)
    star_eps = n_edges / star_dt
    print(f"# star: {star_dt * 1e3:.2f} ms/step, {star_eps:.3e} edges/s, "
          f"loss={star_loss:.3f}", file=sys.stderr)

    # absolute roofline position (not self-referential): achieved TFLOP/s and
    # HBM GB/s of the analytic step workload vs the chip's peaks
    mfu_pct = hbm_pct = None
    if not args.fwd_only:
        el = 2 if args.dtype == "bfloat16" else 4
        flops, bytes_hbm = step_flops_bytes(
            args.groups, args.group_size, args.max_parents,
            args.expand_factor, args.in_dim, args.hidden_dim, args.out_dim,
            [4, 1], el_bytes=el)
        if dev.device_kind not in PEAKS:
            print(f"# WARNING: unknown device kind {dev.device_kind!r}; "
                  "roofline uses TPU v5e peaks (197 TFLOP/s bf16, 819 GB/s) "
                  "— MFU/HBM% numbers may be wrong on this chip",
                  file=sys.stderr)
        peak_fl, peak_bw = PEAKS.get(dev.device_kind, (197e12, 819e9))
        mfu_pct = 100 * flops / star_dt / peak_fl
        hbm_pct = 100 * bytes_hbm / star_dt / peak_bw
        print(f"# roofline: {flops / star_dt / 1e12:.1f} TFLOP/s "
              f"({mfu_pct:.1f}% MFU), design HBM {bytes_hbm / star_dt / 1e9:.0f} "
              f"GB/s ({hbm_pct:.1f}% of peak) on {dev.device_kind}",
              file=sys.stderr)

    vs_baseline = 1.0
    if not args.skip_baseline:
        seg_dt, seg_loss = time_path("segment", model, params, batch, table,
                                     args.steps, args.warmup,
                                     scan=args.scan)
        seg_eps = n_edges / seg_dt
        print(f"# segment baseline: {seg_dt * 1e3:.2f} ms/step, "
              f"{seg_eps:.3e} edges/s, loss={seg_loss:.3f}", file=sys.stderr)
        vs_baseline = star_eps / seg_eps

    record = {"metric": "edges_per_s_pgat_fwd_bwd",
              "value": round(star_eps, 1),
              "unit": "edges/s/chip",
              "vs_baseline": round(vs_baseline, 3)}
    if mfu_pct is not None:
        record["mfu_pct"] = round(mfu_pct, 1)
        record["hbm_pct"] = round(hbm_pct, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
