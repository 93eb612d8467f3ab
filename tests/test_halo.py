"""Parity tests for the Pallas RDMA ring halo exchange (parallel/halo.py)
against the default two-all_to_all partitioned_gather path, in interpret
mode on the virtual 8-device CPU mesh (VERDICT r2 #6: correctness-tested
now, one-command swap via TAXOEXPAN_HALO=ring for the first real-slice
session)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from taxoexpan_tpu.parallel import data_parallel_mesh
from taxoexpan_tpu.parallel.partition import partitioned_gather, shard_table

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _roundtrip(rng, impl, v=160, d=8, shape=(16, 5), dtype=np.float32):
    mesh = data_parallel_mesh()
    feats = rng.normal(size=(v, d)).astype(dtype)
    table = shard_table(feats, mesh, "dp")
    ids = rng.integers(0, v, size=shape).astype(np.int32)
    ids_dev = jax.device_put(ids, NamedSharding(mesh, P("dp")))
    out = np.asarray(partitioned_gather(table, ids_dev, mesh, "dp",
                                        impl=impl), np.float32)
    return out, feats[ids].astype(np.float32)


def test_ring_matches_dense(rng):
    out, expect = _roundtrip(rng, "ring")
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_ring_matches_all_to_all(rng):
    mesh = data_parallel_mesh()
    feats = rng.normal(size=(160, 8)).astype(np.float32)
    table = shard_table(feats, mesh, "dp")
    ids = rng.integers(0, 160, size=(16, 5)).astype(np.int32)
    ids_dev = jax.device_put(ids, NamedSharding(mesh, P("dp")))
    out_ring = np.asarray(partitioned_gather(table, ids_dev, mesh, "dp",
                                             impl="ring"))
    out_a2a = np.asarray(partitioned_gather(table, ids_dev, mesh, "dp",
                                            impl="all_to_all"))
    np.testing.assert_allclose(out_ring, out_a2a, atol=1e-6)


def test_ring_bf16_table(rng):
    # bf16 shards: one-hot gather must be exact in the table's own dtype
    out, expect = _roundtrip(rng, "ring", dtype=jnp.bfloat16)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_ring_duplicate_heavy_ids(rng):
    # ego-batches are duplicate-heavy; dedup + ring must still round-trip
    mesh = data_parallel_mesh()
    feats = rng.normal(size=(64, 4)).astype(np.float32)
    table = shard_table(feats, mesh, "dp")
    ids = np.repeat(rng.integers(0, 64, size=(8, 2)), 3,
                    axis=1).astype(np.int32)
    ids_dev = jax.device_put(ids, NamedSharding(mesh, P("dp")))
    out = np.asarray(partitioned_gather(table, ids_dev, mesh, "dp",
                                        impl="ring"))
    np.testing.assert_allclose(out, feats[ids], atol=1e-6)


def test_ring_under_jit_grad_free(rng):
    # the exchange sits inside the jitted train step; make sure it traces
    mesh = data_parallel_mesh()
    feats = rng.normal(size=(96, 4)).astype(np.float32)
    table = shard_table(feats, mesh, "dp")
    ids = rng.integers(0, 96, size=(8, 3)).astype(np.int32)
    ids_dev = jax.device_put(ids, NamedSharding(mesh, P("dp")))

    @jax.jit
    def f(t, i):
        return partitioned_gather(t, i, mesh, "dp", impl="ring").sum()

    np.testing.assert_allclose(float(f(table, ids_dev)),
                               feats[ids].sum(), rtol=1e-4)


def test_env_flag_selects_ring(rng, monkeypatch):
    monkeypatch.setenv("TAXOEXPAN_HALO", "ring")
    out, expect = _roundtrip(rng, None)
    np.testing.assert_allclose(out, expect, atol=1e-6)
    monkeypatch.setenv("TAXOEXPAN_HALO", "bogus")
    with pytest.raises(ValueError):
        _roundtrip(rng, None)


def test_ring_full_train_step_matches_all_to_all(tmp_path, monkeypatch):
    """End-to-end: one training epoch on the row-partitioned feature table
    with TAXOEXPAN_HALO=ring must match the all_to_all implementation —
    the one-command-swap guarantee for the first real-slice session
    (VERDICT r2 #6)."""
    from tests.test_parallel import _make_trainer

    mesh = data_parallel_mesh()
    t_a2a = _make_trainer(tmp_path / "a2a", mesh, "partitioned")
    log_a2a = t_a2a._train_epoch(1)
    monkeypatch.setenv("TAXOEXPAN_HALO", "ring")
    t_ring = _make_trainer(tmp_path / "ring", mesh, "partitioned")
    log_ring = t_ring._train_epoch(1)
    np.testing.assert_allclose(log_ring["loss"], log_a2a["loss"], rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(t_a2a.params),
                    jax.tree_util.tree_leaves(t_ring.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
