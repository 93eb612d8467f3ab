"""Full-catalog validation (VERDICT r4 #2): the monitor must keep
discriminative signal after the sampled validation saturates.

`trainer.full_validation_every = K` ranks the validation queries against
ALL candidate positions with the TaxonomyRanker every K epochs; those
metrics drive monitor/plateau/early-stop. With K > 1, the off-epochs still
run the (overlapped) sampled pass for tensorboard continuity but are
monitor-ineligible — mixing the sampled scale (ranks within 1+ns) with the
full-catalog scale (ranks within |C|) would corrupt the improvement
comparison.
"""
import jax
import numpy as np
import pytest

from taxoexpan_tpu import builders
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy_v2
from taxoexpan_tpu.evaluation import TaxonomyRanker
from taxoexpan_tpu.train import Trainer

ARCH = {"args": {"propagation_method": "PGAT", "readout_method": "WMR",
                 "matching_method": "LBM", "in_dim": 16, "hidden_dim": 32,
                 "out_dim": 32, "pos_dim": 8, "num_layers": 1,
                 "heads": [2, 1], "feat_drop": 0.0, "attn_drop": 0.0,
                 "hidden_drop": 0.0, "out_drop": 0.0}}
CFG = {"batch_size": 16, "negative_size": 7, "expand_factor": 8,
       "cache_refresh_time": 16, "normalize_embed": True, "num_workers": 0,
       "sampling_mode": 1, "shuffle": True}
VAL_CFG = {**CFG, "sampling_mode": 0, "negative_size": 16, "shuffle": False}


def _make_trainer(tmp_path, taxo, *, every, epochs=2):
    train_sampler = builders.build_sampler(taxo, CFG, "train")
    loader = builders.build_loader(train_sampler, CFG)
    val_cfg = {**VAL_CFG, "max_parents": train_sampler.max_parents}
    val_sampler = builders.build_sampler(taxo, val_cfg, "validation")
    val_loader = builders.build_loader(val_sampler, val_cfg)
    fv_sampler = builders.build_sampler(taxo, val_cfg, "validation")
    model = builders.build_model(ARCH,
                                 max_parents=train_sampler.max_parents,
                                 expand_factor=train_sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = builders.build_optimizer_from_config(
        {"type": "Adam", "args": {"lr": 3e-3, "amsgrad": True}},
        {"grad_clip": 5.0})
    return Trainer(model, params, optimizer, optimizer.init(params),
                   loss_name="info_nce_loss",
                   metric_names=["macro_mr", "micro_mr", "hit_at_1"],
                   feature_table=train_sampler.node_features,
                   train_loader=loader, valid_loader=val_loader,
                   config={"trainer": {"epochs": epochs,
                                       "save_period": 10 ** 9,
                                       "monitor": "min val_macro_mr",
                                       "early_stop": 10,
                                       "full_validation_every": every}},
                   save_dir=tmp_path,
                   full_valid_sampler=fv_sampler), fv_sampler


def test_full_validation_matches_ranker(tmp_path):
    """val_metrics on a full-validation epoch == an independent
    TaxonomyRanker evaluation of the same validation split with the same
    (post-epoch) params."""
    taxo = synthetic_taxonomy_v2(num_nodes=500, dim=16, seed=11)
    trainer, fv_sampler = _make_trainer(tmp_path, taxo, every=1)
    log = trainer._train_epoch(1)
    assert log.get("full_validation") is True
    assert "val_metrics" in log and "val_sampled_metrics" not in log

    ranker = TaxonomyRanker(trainer.model, trainer.params, fv_sampler,
                            fv_sampler.node_features)
    res, _ = ranker.evaluate(["macro_mr", "micro_mr", "hit_at_1"], 1)
    np.testing.assert_allclose(
        log["val_metrics"],
        [res["macro_mr"], res["micro_mr"], res["hit_at_1"]], rtol=1e-6)
    # full-catalog macro_mr ranks within the whole candidate set — after
    # one epoch on a hard split it must NOT be saturated near 1
    assert log["val_metrics"][0] > 1.5, log["val_metrics"]


def test_off_epochs_are_monitor_ineligible(tmp_path):
    """K=2: epoch 1 runs the sampled pass (monitor-ineligible, metrics
    under val_sampled_*), epoch 2 runs the full catalog and feeds the
    monitor."""
    taxo = synthetic_taxonomy_v2(num_nodes=400, dim=16, seed=12)
    trainer, _ = _make_trainer(tmp_path, taxo, every=2)
    log1 = trainer._train_epoch(1)
    assert "full_validation" not in log1
    assert log1.pop("_monitor_eligible") is False
    assert "val_sampled_metrics" in log1 and "val_metrics" not in log1
    log2 = trainer._train_epoch(2)
    assert log2.get("full_validation") is True
    assert log2.get("_monitor_eligible", True) is True
    assert "val_metrics" in log2

    # the full loop keeps monitoring enabled (no "metric not found"
    # disable on the off-epochs) and tracks mnt_best from full epochs
    trainer2, _ = _make_trainer(tmp_path / "loop", taxo, every=2)
    trainer2.train()
    assert trainer2.mnt_mode == "min"          # never disabled
    assert np.isfinite(trainer2.mnt_best)      # updated from a full epoch


def test_refresh_reencodes_anchors(tmp_path):
    """ranker.refresh(params) must invalidate hg (scores change with
    params) while reusing the host-side caches."""
    taxo = synthetic_taxonomy_v2(num_nodes=300, dim=16, seed=13)
    s = builders.build_sampler(taxo, {**VAL_CFG}, "validation")
    model = builders.build_model(ARCH, max_parents=s.max_parents,
                                 expand_factor=s.expand_factor)
    p1 = model.init(jax.random.PRNGKey(0))
    p2 = model.init(jax.random.PRNGKey(1))
    ranker = TaxonomyRanker(model, p1, s, s.node_features)
    hg1 = np.asarray(ranker.encode_all_anchors())
    anchors_before = ranker._anchor_arrays()
    ranker.refresh(p2)
    hg2 = np.asarray(ranker.encode_all_anchors())
    assert ranker._anchor_arrays() is anchors_before  # cache kept
    assert not np.allclose(hg1, hg2)                  # hg recomputed
