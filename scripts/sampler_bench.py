#!/usr/bin/env python
"""Host-sampler throughput benchmark at the MAG-CS batch shape.

The TPU step consumes batches of 128 InfoNCE groups x 32 candidates = 4096
egonets; at the measured ~50-58 ms/step the chip's appetite is ~72-82k
egonets/s. This script measures what the host side actually produces:

  1. the native C++ batch fill (loader backend="native"),
  2. the pure-Python fallback (backend="python"),
  3. the full GroupBatchLoader pipeline with its prefetch thread,

on a synthetic taxonomy with MAG-CS statistics (~30k nodes). The reference
needs 8-20 DataLoader worker PROCESSES for the same job (data_loaders.py:98).

Usage: JAX_PLATFORMS=cpu python scripts/sampler_bench.py [--nodes 30000]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def time_batches(fn, batches, egonets_per_batch):
    t0 = time.perf_counter()
    for _ in range(batches):
        fn()
    dt = time.perf_counter() - t0
    return batches * egonets_per_batch / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=30000)
    p.add_argument("--groups", type=int, default=128)
    p.add_argument("--negative-size", type=int, default=31)
    p.add_argument("--expand-factor", type=int, default=50)
    p.add_argument("--batches", type=int, default=24)
    p.add_argument("--target-ms-per-step", type=float, default=50.0,
                   help="TPU step time the host must outrun")
    args = p.parse_args()

    from taxoexpan_tpu.data import GroupBatchLoader, MaskedGraphSampler
    from taxoexpan_tpu.data.synthetic import synthetic_taxonomy

    taxo = synthetic_taxonomy(num_nodes=args.nodes, dim=16, max_children=40,
                              seed=7)
    sampler = MaskedGraphSampler(
        taxo, mode="train", sampling_mode=1,
        negative_size=args.negative_size,
        expand_factor=args.expand_factor, cache_refresh_time=128)
    egonets = args.groups * (1 + args.negative_size)
    node_list = np.asarray(sampler.node_list, np.int32)

    def query_batch(i):  # rotating slices, as a real epoch would see
        start = (i * args.groups) % max(len(node_list) - args.groups, 1)
        return node_list[start:start + args.groups]

    results = {}

    # 1. native C++ batch fill, no pipeline
    from taxoexpan_tpu.native import NativeSampler
    if NativeSampler.available():
        native = NativeSampler(sampler, seed=0)
        native.sample_train_batch(query_batch(0))  # warm the cache paths
        state = {"i": 0}

        def one():
            state["i"] += 1
            native.sample_train_batch(query_batch(state["i"]))
        results["native_egonets_per_s"] = time_batches(
            one, args.batches, egonets)

    # 2. pure-Python fallback fill
    py_loader = GroupBatchLoader(sampler, batch_size=args.groups,
                                 prefetch=0, backend="python")
    py_batches = iter(py_loader._batches())
    results["python_egonets_per_s"] = time_batches(
        lambda: next(py_batches), min(args.batches, 6), egonets)

    # 3. full loader pipeline (native + prefetch thread), an epoch slice
    loader = GroupBatchLoader(sampler, batch_size=args.groups, prefetch=2,
                              backend="auto")
    it = iter(loader)
    next(it)  # spin up the producer
    n = min(args.batches, len(loader) - 2)
    results["pipeline_egonets_per_s"] = time_batches(
        lambda: next(it), n, egonets)

    appetite = egonets / (args.target_ms_per_step * 1e-3)
    results["tpu_appetite_egonets_per_s"] = appetite
    best = max(v for k, v in results.items() if k.endswith("egonets_per_s")
               and k != "tpu_appetite_egonets_per_s")
    results["headroom_x"] = round(best / appetite, 2)
    for k, v in results.items():
        print(f"# {k}: {v:,.0f}" if v > 100 else f"# {k}: {v}",
              file=sys.stderr)
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
