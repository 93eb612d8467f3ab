"""Coverage for less-travelled configurations: multi-layer stacks, residual
GAT layers, energy-based losses through the Trainer."""
import jax
import numpy as np
import pytest

from taxoexpan_tpu import builders
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
from taxoexpan_tpu.models import TaxoExpan
from taxoexpan_tpu.train import Trainer
from tests.test_model_and_losses import P, S, V, D, make_group_batch


def test_two_layer_pgat(rng):
    # num_layers=2 -> 3 GAT layers, heads list of 3 (model_zoo.py:176-181)
    model = TaxoExpan("PGAT", "WMR", "BIM", in_dim=D, hidden_dim=8,
                      out_dim=8, pos_dim=4, num_layers=2, heads=[2, 2, 1],
                      feat_drop=0.1, attn_drop=0.1, max_parents=P,
                      expand_factor=S)
    params = model.init(jax.random.PRNGKey(0))
    table = jax.numpy.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng, g=3, c=3)
    scores = model.forward(params, batch, table, rng=jax.random.PRNGKey(1),
                           train=True)
    assert scores.shape == (3, 3)
    assert np.isfinite(np.asarray(scores)).all()


def test_two_layer_gcn(rng):
    model = TaxoExpan("PGCN", "MR", "MLP", in_dim=D, hidden_dim=8, out_dim=8,
                      pos_dim=4, num_layers=2, feat_drop=0.1, max_parents=P,
                      expand_factor=S)
    params = model.init(jax.random.PRNGKey(0))
    table = jax.numpy.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng, g=3, c=3)
    scores = model.forward(params, batch, table, rng=jax.random.PRNGKey(1),
                           train=True)
    assert np.isfinite(np.asarray(scores)).all()


CFG = {"batch_size": 8, "negative_size": 4, "expand_factor": 6,
       "cache_refresh_time": 16, "normalize_embed": True, "num_workers": 0,
       "sampling_mode": 1, "shuffle": True}
ARCH = {"args": {"propagation_method": "PGCN", "readout_method": "MR",
                 "matching_method": "MLP", "in_dim": 16, "hidden_dim": 16,
                 "out_dim": 16, "pos_dim": 4, "num_layers": 1,
                 "feat_drop": 0.0, "attn_drop": 0.0, "hidden_drop": 0.0,
                 "out_drop": 0.0}}


@pytest.mark.parametrize("loss_name", ["bce_loss", "margin_rank_loss",
                                       "square_exp_loss"])
def test_trainer_energy_losses(tmp_path, loss_name):
    """Energy-loss training (rank mode 0) runs and produces finite losses —
    the reference's non-InfoNCE configurations (train.py:29-32)."""
    taxo = synthetic_taxonomy(num_nodes=200, dim=16, seed=11)
    sampler = builders.build_sampler(taxo, CFG, "train")
    loader = builders.build_loader(sampler, CFG)
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    opt = builders.build_optimizer_from_config(
        {"type": "Adam", "args": {"lr": 1e-3}}, {})
    trainer = Trainer(model, params, opt, opt.init(params),
                      loss_name=loss_name, metric_names=["macro_mr"],
                      feature_table=sampler.node_features,
                      train_loader=loader, valid_loader=None,
                      config={"arch": ARCH, "optimizer": {"type": "Adam"},
                              "trainer": {"epochs": 1, "save_period": 100,
                                          "monitor": "off"}},
                      save_dir=tmp_path)
    assert trainer.rank_mode == 0  # energy losses rank by distance
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])


def test_model_describe_and_split_loader(rng):
    from taxoexpan_tpu.data.split_loader import SplitBatchLoader
    model = TaxoExpan("GCN", "MR", "MLP", in_dim=8, hidden_dim=8, out_dim=8,
                      max_parents=2, expand_factor=4)
    params = model.init(jax.random.PRNGKey(0))
    desc = model.describe(params)
    assert "Trainable parameters:" in desc
    assert model.num_params(params) > 0

    data = list(range(100))
    loader = SplitBatchLoader(data, batch_size=16, validation_split=0.2,
                              seed=0)
    val = loader.split_validation()
    assert loader.n_samples == 80 and val.n_samples == 20
    seen = [x for b in loader for x in b] + [x for b in val for x in b]
    assert sorted(seen) == data
    import pytest as _pytest
    with _pytest.raises(ValueError):
        SplitBatchLoader(data, batch_size=4, validation_split=200)
