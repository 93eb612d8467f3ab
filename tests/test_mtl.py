"""PATR attention readout + PATR/PMLP multi-task (MTL) heads.

Reconstruction coverage for the reference's retired PGAT_PATR_PMLP_MTL_Net
(only the 2019 config_files and model_zoo.py:225's GlobalAttentionPooling
TODO survive upstream — see BASELINE.md). These tests pin OUR defined
semantics: gate = w2.tanh(h@w1 + b1 + class_emb[class]), softmax over valid
slots; MTL = per-head losses averaged over a shared propagation trunk.
"""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taxoexpan_tpu import builders
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
from taxoexpan_tpu.models import TaxoExpan
from taxoexpan_tpu.models.readout import Readout
from taxoexpan_tpu.ops import star

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_patr_readout_is_masked_softmax_pool(rng):
    B, P, S, D, A = 4, 3, 5, 8, 6
    N = P + 1 + S
    h = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    ngp = jnp.asarray([1, 2, 3, 0], jnp.int32)
    nsib = jnp.asarray([0, 2, 5, 3], jnp.int32)
    rd = Readout("PATR", D, attention_dim=A)
    params = rd.init(jax.random.PRNGKey(0))
    out = np.asarray(rd.apply(params, h, ngp, nsib, P))
    assert out.shape == (B, D)

    # numpy oracle
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    ce, w2 = np.asarray(params["class_emb"]), np.asarray(params["w2"])
    hn = np.asarray(h)
    cls = np.array([0] * P + [1] + [2] * S)
    logits = (np.tanh(hn @ w1 + b1 + ce[cls]) @ w2)[..., 0]
    for b in range(B):
        valid = ([i < int(ngp[b]) for i in range(P)] + [True] +
                 [i < int(nsib[b]) for i in range(S)])
        z = np.where(valid, logits[b], -np.inf)
        a = np.exp(z - z.max())
        a = a / a.sum()
        np.testing.assert_allclose(out[b], a @ hn[b], rtol=1e-5, atol=1e-5)
        # invalid slots carry exactly zero attention
        assert np.all(a[~np.asarray(valid)] == 0)


def test_patr_gate_uses_position_class(rng):
    """Two slots with IDENTICAL features but different position classes must
    receive different attention — the position-aware part of PATR."""
    P, S, D = 1, 1, 4
    h = jnp.asarray(np.tile(rng.normal(size=(1, 1, D)), (1, 3, 1))
                    .astype(np.float32))
    rd = Readout("PATR", D, attention_dim=8)
    params = rd.init(jax.random.PRNGKey(1))
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    ce, w2 = np.asarray(params["class_emb"]), np.asarray(params["w2"])
    cls_logits = (np.tanh(np.asarray(h)[0] @ w1 + b1 + ce[[0, 1, 2]]) @ w2)
    assert len(np.unique(np.round(cls_logits, 6))) > 1


ARCH_MTL = {"args": {
    "propagation_method": "PGAT", "readout_method": "PATR",
    "matching_method": "PMLP", "in_dim": 16, "hidden_dim": 32,
    "out_dim": 32, "pos_dim": 8, "attention_dim": 12, "num_layers": 1,
    "heads": [2, 1], "feat_drop": 0.0, "attn_drop": 0.0,
    "hidden_drop": 0.0, "out_drop": 0.0,
    "aux_heads": [{"readout": "WMR", "matcher": "BIM"}]}}


def _mtl_setup(tiny_taxonomy):
    from taxoexpan_tpu.data import GroupBatchLoader, MaskedGraphSampler
    sampler = MaskedGraphSampler(tiny_taxonomy, mode="train", sampling_mode=1,
                                 negative_size=7, expand_factor=6)
    loader = GroupBatchLoader(sampler, batch_size=8, prefetch=0)
    model = builders.build_model(ARCH_MTL, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    return sampler, loader, model, params


def test_forward_heads_shapes_and_grads(tiny_taxonomy):
    sampler, loader, model, params = _mtl_setup(tiny_taxonomy)
    assert len(model.aux_heads) == 1 and "aux" in params
    batch = next(iter(loader))
    table = jnp.asarray(sampler.node_features)

    scores = model.forward_heads(params, batch, table,
                                 rng=jax.random.PRNGKey(0), train=True)
    assert scores.shape == (2, 8, 8)   # [1 + aux, G, C]
    # primary head row equals the single-head forward (same trunk, no drop)
    primary = model.forward(params, batch, table,
                            rng=jax.random.PRNGKey(0), train=True)
    np.testing.assert_allclose(np.asarray(scores[0]), np.asarray(primary),
                               rtol=2e-4, atol=2e-5)

    from taxoexpan_tpu.losses import bce_loss
    def loss_fn(p):
        s = model.forward_heads(p, batch, table, rng=jax.random.PRNGKey(0),
                                train=True)
        labels = jnp.asarray(batch.labels)
        mask = jnp.asarray(batch.cand_mask)
        return jax.vmap(lambda si: bce_loss(si, labels, mask))(s).mean()
    grads = jax.grad(loss_fn)(params)
    # every head's parameters receive gradient
    for sub in (grads["readout"], grads["match"], grads["aux"][0]["readout"],
                grads["aux"][0]["match"]):
        assert any(float(jnp.abs(g).sum()) > 0
                   for g in jax.tree_util.tree_leaves(sub))


def test_mtl_trainer_epoch(tiny_taxonomy, tmp_path):
    from taxoexpan_tpu.train import Trainer
    sampler, loader, model, params = _mtl_setup(tiny_taxonomy)
    optimizer = builders.build_optimizer_from_config(
        {"type": "Adam", "args": {"lr": 1e-3, "amsgrad": True}})
    trainer = Trainer(model, params, optimizer, optimizer.init(params),
                      loss_name="bce_loss", metric_names=["macro_mr"],
                      feature_table=sampler.node_features,
                      train_loader=loader,
                      config={"trainer": {"epochs": 1}},
                      save_dir=tmp_path, log_dir=tmp_path)
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])


@pytest.mark.slow
def test_cli_semeval_mtl_config(tmp_path):
    """config.semeval_verb_mtl.json trains end to end through the CLI
    (synthetic stand-in data at the config's 300-dim embedding size)."""
    env = dict(os.environ)
    data = tmp_path / "verb.pickle.bin"
    synthetic_taxonomy(num_nodes=200, dim=12, seed=9).save(str(data))
    cfg = json.load(open(os.path.join(REPO,
                                      "configs/config.semeval_verb_mtl.json")))
    for key in ("train_data_loader", "validation_data_loader",
                "test_data_loader"):
        cfg[key]["args"]["data_path"] = str(data)
        cfg[key]["args"]["expand_factor"] = 6
        cfg[key]["args"]["batch_size"] = 8
    cfg["validation_data_loader"]["args"]["negative_size"] = 16
    cfg["arch"]["args"].update(in_dim=12, hidden_dim=24, out_dim=24,
                               pos_dim=6, attention_dim=8, heads=[2, 1])
    cfg["trainer"].update(epochs=1, save_dir=str(tmp_path / "saved"))
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    r = subprocess.run(
        [sys.executable, "train.py", "-c", str(cfg_path), "-d", "cpu",
         "--ns", "7"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    run_dirs = list((tmp_path / "saved" / "models" / cfg["name"]).iterdir())
    assert run_dirs and (run_dirs[0] / "model_best.ckpt").exists()
    # checkpoint restore must round-trip the aux-head params and evaluation
    # must rank with the primary head
    r2 = subprocess.run(
        [sys.executable, "test_fast.py", "-r",
         str(run_dirs[0] / "model_best.ckpt"), "-d", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "macro_mr" in (r2.stdout + r2.stderr)


def test_forward_heads_pallas_matches_xla(tiny_taxonomy):
    """PATR/MTL on the fused-Pallas propagation path (per-slot kernel output
    + XLA readouts — pool fusion only serves single-head MR/WMR/CR/SUM):
    scores must match the XLA path."""
    from taxoexpan_tpu.data import GroupBatchLoader, MaskedGraphSampler
    sampler = MaskedGraphSampler(tiny_taxonomy, mode="train", sampling_mode=1,
                                 negative_size=7, expand_factor=6)
    loader = GroupBatchLoader(sampler, batch_size=8, prefetch=0)
    batch = next(iter(loader))
    table = jnp.asarray(sampler.node_features)
    scores = {}
    for kernel in ("xla", "pallas"):
        arch = {"args": dict(ARCH_MTL["args"], kernel=kernel)}
        model = builders.build_model(arch, max_parents=sampler.max_parents,
                                     expand_factor=sampler.expand_factor)
        params = scores.get("params") or model.init(jax.random.PRNGKey(0))
        scores["params"] = params
        scores[kernel] = np.asarray(model.forward_heads(
            params, batch, table, rng=jax.random.PRNGKey(1), train=False))
    np.testing.assert_allclose(scores["pallas"], scores["xla"],
                               rtol=2e-4, atol=2e-4)


def test_mtl_checkpoint_roundtrip(tiny_taxonomy, tmp_path):
    """aux-head params (list-of-dicts subtree) must survive the checkpoint
    save -> restore_params round trip bit-exactly."""
    from taxoexpan_tpu.train import checkpoint as ckpt_mod
    _, _, model, params = _mtl_setup(tiny_taxonomy)
    path = tmp_path / "mtl.ckpt"
    ckpt_mod.save_checkpoint(path, params=params, opt_state={}, epoch=3,
                             monitor_best=1.0, config={"arch": ARCH_MTL})
    state = ckpt_mod.load_checkpoint(path)
    template = model.init(jax.random.PRNGKey(123))   # different init values
    restored = ckpt_mod.restore_params(state, template)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
