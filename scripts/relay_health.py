#!/usr/bin/env python
"""Quick axon-relay health probe — run BEFORE trusting any timing run.

Measures (1) dispatch rate: k async no-op-ish adds chained on device, and
(2) readback latency + bandwidth: a 16 MB device->host transfer. Through a
healthy relay the dispatch rate is ~3 ms/step and the readback is ~1-2 s;
during degradation windows (observed round 3: minutes-long stalls) both
explode — bench/eval timings taken then are relay noise, not device truth.

    python scripts/relay_health.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((128, 128))
    jax.block_until_ready(x)
    print(f"first contact: {time.time() - t0:.2f}s")

    @jax.jit
    def step(v):
        return v * 1.000001 + 1e-9

    y = step(x)
    jax.block_until_ready(y)
    k = 10
    t0 = time.time()
    for _ in range(k):
        y = step(y)
    float(y.sum())
    dt = (time.time() - t0) / k
    print(f"dispatch+exec rate: {dt * 1e3:.1f} ms/step over {k} chained "
          f"steps (healthy: <5 ms)")
    if dt > 0.2:
        print(f"DEGRADED — dispatch ACK ~{dt:.1f}s; do not trust "
              "host-chained timing runs now")
        return 1

    big = jnp.ones((2048, 2048))  # 16 MB f32
    jax.block_until_ready(big)
    t0 = time.time()
    _ = jax.device_get(big)
    dt = time.time() - t0
    mbps = 16 / max(dt, 1e-9)
    print(f"16 MB readback: {dt:.2f}s = {mbps:.1f} MB/s "
          f"(healthy: >8 MB/s; ~25+ MB/s typical, docs/OPERATIONS.md)")
    ok = mbps > 8
    print("HEALTHY" if ok else "DEGRADED — do not trust timing runs now")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
