"""Model composition, loss, and metric tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taxoexpan_tpu import losses, metrics
from taxoexpan_tpu.data.egobatch import GroupBatch, make_ego_batch
from taxoexpan_tpu.models import TaxoExpan

P, S = 2, 4
V, D = 50, 12


def make_group_batch(rng, g=3, c=4):
    egos = []
    for _ in range(g * c):
        ngp = int(rng.integers(0, P + 1))
        nsib = int(rng.integers(0, S + 1))
        egos.append((rng.integers(1, V, ngp).tolist(),
                     int(rng.integers(1, V)),
                     rng.integers(1, V, nsib).tolist()))
    ego = make_ego_batch(egos, P, S)
    labels = np.zeros((g, c), np.float32)
    labels[:, 0] = 1
    return GroupBatch(ego=ego, query_ids=rng.integers(0, V, g).astype(np.int32),
                      query_feats=None, labels=labels,
                      cand_mask=np.ones((g, c), bool))


@pytest.mark.parametrize("pm,rm,mm", [
    ("PGAT", "WMR", "LBM"),   # the paper configuration (model.py forward 3.4)
    ("PGAT", "WMR", "BIM"),   # config.mag.json arch
    ("GCN", "MR", "MLP"),     # minimum slice
    ("PGCN", "CR", "NTN"),
    ("GAT", "MR", "BIM"),
])
def test_forward_shapes(rng, pm, rm, mm):
    model = TaxoExpan(pm, rm, mm, in_dim=D, hidden_dim=16, out_dim=8,
                      pos_dim=4, num_layers=1, heads=[2, 1],
                      feat_drop=0.1, attn_drop=0.1,
                      max_parents=P, expand_factor=S)
    params = model.init(jax.random.PRNGKey(0))
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng)
    scores = model.forward(params, batch, table,
                           rng=jax.random.PRNGKey(1), train=True)
    assert scores.shape == (3, 4)
    assert np.isfinite(np.asarray(scores)).all()
    if mm == "LBM":  # exp of bilinear is positive (model_zoo.py:328)
        assert (np.asarray(scores) > 0).all()
    # eval path must be deterministic (no dropout)
    s1 = model.forward(params, batch, table, rng=jax.random.PRNGKey(2),
                       train=False)
    s2 = model.forward(params, batch, table, rng=jax.random.PRNGKey(3),
                       train=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


def test_invalid_factory_names():
    with pytest.raises(ValueError):
        TaxoExpan("BAD", "MR", "MLP", in_dim=4, hidden_dim=4, out_dim=4)
    with pytest.raises(ValueError):
        TaxoExpan("GCN", "BAD", "MLP", in_dim=4, hidden_dim=4, out_dim=4)
    with pytest.raises(ValueError):
        TaxoExpan("GCN", "MR", "BAD", in_dim=4, hidden_dim=4, out_dim=4)


def test_grads_flow(rng):
    model = TaxoExpan("PGAT", "WMR", "LBM", in_dim=D, hidden_dim=8, out_dim=8,
                      pos_dim=4, num_layers=1, heads=[2, 1], feat_drop=0.0,
                      attn_drop=0.0, max_parents=P, expand_factor=S)
    params = model.init(jax.random.PRNGKey(0))
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng)

    def loss_fn(p):
        scores = model.forward(p, batch, table, rng=jax.random.PRNGKey(1),
                               train=True)
        return losses.info_nce_loss(scores, jnp.asarray(batch.labels),
                                    jnp.asarray(batch.cand_mask))

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter tensor must receive some gradient
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


# ----------------------------------------------------------------------- loss

def test_info_nce_matches_cross_entropy(rng):
    scores = rng.normal(size=(5, 4)).astype(np.float32)
    labels = np.zeros((5, 4), np.float32); labels[:, 0] = 1
    mask = np.ones((5, 4), bool)
    got = float(losses.info_nce_loss(jnp.asarray(scores), jnp.asarray(labels),
                                     jnp.asarray(mask)))
    # manual softmax CE against class 0, summed (loss.py:52-57)
    e = np.exp(scores - scores.max(1, keepdims=True))
    want = -np.log(e[:, 0] / e.sum(1)).sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_info_nce_ignores_padded_groups(rng):
    scores = rng.normal(size=(3, 4)).astype(np.float32)
    labels = np.zeros((3, 4), np.float32); labels[:, 0] = 1
    mask = np.ones((3, 4), bool); mask[2] = False
    full = float(losses.info_nce_loss(jnp.asarray(scores), jnp.asarray(labels),
                                      jnp.asarray(mask)))
    sub = float(losses.info_nce_loss(jnp.asarray(scores[:2]),
                                     jnp.asarray(labels[:2]),
                                     jnp.asarray(mask[:2])))
    np.testing.assert_allclose(full, sub, rtol=1e-6)


def test_bce_loss_inverted_target(rng):
    scores = rng.normal(size=(2, 3)).astype(np.float32)
    labels = np.array([[1, 0, 0], [1, 0, 0]], np.float32)
    mask = np.ones((2, 3), bool)
    got = float(losses.bce_loss(jnp.asarray(scores), jnp.asarray(labels),
                                jnp.asarray(mask)))
    t = 1.0 - labels  # inverted: energies (loss.py:26-29)
    p = 1 / (1 + np.exp(-scores))
    want = -(t * np.log(p) + (1 - t) * np.log(1 - p)).sum()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_margin_rank_loss_pairs():
    scores = jnp.asarray([[0.5, 2.0, 0.2]])
    labels = jnp.asarray([[1.0, 0.0, 0.0]])
    mask = jnp.ones((1, 3), bool)
    # pairs: (pos=0.5, neg=2.0) -> max(0, 1 + 0.5 - 2.0) = 0
    #        (pos=0.5, neg=0.2) -> max(0, 1 + 0.5 - 0.2) = 1.3
    got = float(losses.margin_rank_loss(scores, labels, mask, margin=1.0))
    np.testing.assert_allclose(got, 1.3, rtol=1e-6)


def test_square_exp_loss():
    scores = jnp.asarray([[2.0, 1.0]])
    labels = jnp.asarray([[1.0, 0.0]])
    mask = jnp.ones((1, 2), bool)
    got = float(losses.square_exp_loss(scores, labels, mask, beta=1.0))
    np.testing.assert_allclose(got, 4.0 + np.exp(-1.0), rtol=1e-6)


# -------------------------------------------------------------------- metrics

def test_ranks_semantics():
    # similarity mode: rank = 1 + #negatives strictly better; ties favor pos
    scores = np.array([[0.9, 0.9, 0.5, 0.99]])
    labels = np.array([[1, 0, 0, 0]], np.float32)
    mask = np.ones((1, 4), bool)
    ranks = metrics.ranks_from_groups(scores, labels, mask, mode=1)
    assert ranks == [[2]]
    # distance mode: smaller is better
    ranks = metrics.ranks_from_groups(scores, labels, mask, mode=0)
    assert ranks == [[2]]
    # multiple positives: each ranked against negatives only (metric.py:7-18)
    scores = np.array([[0.9, 0.2, 0.5, 0.7]])
    labels = np.array([[1, 1, 0, 0]], np.float32)
    ranks = metrics.ranks_from_groups(scores, labels, mask, mode=1)
    assert ranks == [[1, 3]]


def test_ranks_skip_padded_groups():
    scores = np.zeros((2, 3))
    labels = np.zeros((2, 3), np.float32); labels[0, 0] = 1
    mask = np.zeros((2, 3), bool); mask[0] = True
    assert len(metrics.ranks_from_groups(scores, labels, mask)) == 1


def test_metric_values():
    all_ranks = [[1, 3], [21]]
    np.testing.assert_allclose(metrics.macro_mr(all_ranks), (2 + 21) / 2)
    np.testing.assert_allclose(metrics.micro_mr(all_ranks), (1 + 3 + 21) / 3)
    np.testing.assert_allclose(metrics.hit_at_1(all_ranks), 1 / 3)
    np.testing.assert_allclose(metrics.hit_at_3(all_ranks), 2 / 3)
    np.testing.assert_allclose(metrics.hit_at_5(all_ranks), 2 / 3)
    # mrr_scaled_10: ceil(rank/10) -> [1, 1, 3]
    np.testing.assert_allclose(metrics.mrr_scaled_10(all_ranks),
                               np.mean([1, 1, 1 / 3]))


def test_ranks_from_scores_flat():
    scores = np.array([0.9, 0.1, 0.8, 0.95])
    assert metrics.ranks_from_scores(scores, [0], mode=1) == [2]
    assert metrics.ranks_from_scores(scores, [0, 2], mode=1) == [2, 2]
