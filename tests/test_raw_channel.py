"""Raw-feature channel (`raw_channel=True` on the composite model).

The channel appends the unit-normalized anchor+sibling mean of the
UNtransformed ego features to every graph summary
(ops/star.py:raw_star_channel), so a bilinear matcher can represent the
`simple_structure --agg sum --beta 0` heuristic's ranking exactly (its score
is `1 - q_hat . mean({a_hat} u {s_hat_j})`, baselines/simple_structure.py:68-69)
and blend it with the propagated evidence. No reference counterpart
(model/model.py:70-87 matches against the GNN summary only) — this is the
framework's lever for the mid-noise regime of artifacts/DIFFICULTY_CURVE.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taxoexpan_tpu import builders
from taxoexpan_tpu.data import GroupBatchLoader, MaskedGraphSampler
from taxoexpan_tpu.data.egobatch import EgoBatch
from taxoexpan_tpu.ops import star

ARCH = {"args": {
    "propagation_method": "PGAT", "readout_method": "CR",
    "matching_method": "BIM", "in_dim": 16, "hidden_dim": 32,
    "out_dim": 32, "pos_dim": 8, "num_layers": 1, "heads": [2, 1],
    "feat_drop": 0.0, "attn_drop": 0.0, "hidden_drop": 0.0, "out_drop": 0.0,
    "raw_channel": True}}


def _unit(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def test_raw_star_channel_oracle(rng):
    B, P, S, D = 5, 3, 6, 8
    N = P + 1 + S
    feats = rng.normal(size=(B, N, D)).astype(np.float32)
    ngp = np.asarray([0, 1, 3, 2, 0], np.int32)
    nsib = np.asarray([0, 2, 6, 3, 1], np.int32)
    # padded slots arrive zeroed (gather_feats semantics)
    for b in range(B):
        feats[b, ngp[b]:P] = 0.0
        feats[b, P + 1 + nsib[b]:] = 0.0
    out = np.asarray(star.raw_star_channel(
        jnp.asarray(feats), jnp.asarray(ngp), jnp.asarray(nsib), P))
    for b in range(B):
        rows = [feats[b, P]] + [feats[b, P + 1 + j] for j in range(nsib[b])]
        want = _unit(np.stack(rows)).mean(axis=0)
        np.testing.assert_allclose(out[b], want, rtol=1e-5, atol=1e-6)


def test_encode_is_summary_concat_raw(tiny_taxonomy):
    """encode(raw_channel=True) == [encode(raw_channel=False) | raw channel]
    for identical propagate/readout params, on both kernel paths."""
    sampler = MaskedGraphSampler(tiny_taxonomy, mode="train", sampling_mode=1,
                                 negative_size=7, expand_factor=6)
    loader = GroupBatchLoader(sampler, batch_size=8, prefetch=0)
    batch = next(iter(loader))
    table = jnp.asarray(sampler.node_features)
    for kernel in ("xla", "pallas"):
        on = builders.build_model(
            {"args": dict(ARCH["args"], kernel=kernel)},
            max_parents=sampler.max_parents,
            expand_factor=sampler.expand_factor)
        off = builders.build_model(
            {"args": dict(ARCH["args"], kernel=kernel, raw_channel=False)},
            max_parents=sampler.max_parents,
            expand_factor=sampler.expand_factor)
        params = on.init(jax.random.PRNGKey(0))
        feats = on.gather_feats(table, batch.ego)
        rng = jax.random.PRNGKey(1)
        hg_on = np.asarray(on.encode(params, feats, batch.ego.ngp,
                                     batch.ego.nsib, rng=rng, train=False))
        hg_off = np.asarray(off.encode(params, feats, batch.ego.ngp,
                                       batch.ego.nsib, rng=rng, train=False))
        rc = np.asarray(star.raw_star_channel(feats, batch.ego.ngp,
                                              batch.ego.nsib,
                                              on.max_parents))
        assert hg_on.shape[1] == hg_off.shape[1] + on.in_dim
        np.testing.assert_allclose(hg_on[:, :hg_off.shape[1]], hg_off,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(hg_on[:, hg_off.shape[1]:], rc,
                                   rtol=1e-5, atol=1e-6)


def test_bim_block_identity_reproduces_structure_heuristic(rng):
    """With W = [0 | I] (zeros over the learned summary, identity over the raw
    channel) the BIM score is q . raw_channel — within one query's candidate
    list that is a strictly decreasing function of the normalized-form
    structure score (1 + n_sib in the denominator on both sides), so the
    induced ranking is identical. This pins the representational claim the
    feature is built on."""
    B, P, S, D = 12, 2, 5, 16
    N = P + 1 + S
    feats = rng.normal(size=(B, N, D)).astype(np.float32)
    ngp = rng.integers(0, P + 1, size=B).astype(np.int32)
    nsib = rng.integers(0, S + 1, size=B).astype(np.int32)
    for b in range(B):
        feats[b, ngp[b]:P] = 0.0
        feats[b, P + 1 + nsib[b]:] = 0.0
    rc = np.asarray(star.raw_star_channel(
        jnp.asarray(feats), jnp.asarray(ngp), jnp.asarray(nsib), P))
    q = rng.normal(size=(D,)).astype(np.float32)

    # model side: BIM over [summary | raw] with the identity block
    l_learned = 7
    hg = np.concatenate(
        [rng.normal(size=(B, l_learned)).astype(np.float32), rc], axis=1)
    w = np.zeros((l_learned + D, D), np.float32)
    w[l_learned:] = np.eye(D, dtype=np.float32)
    model_scores = hg @ w @ q                       # = rc @ q

    # heuristic side (baselines/simple_structure.py:68-69, beta == 0):
    # (parent_dist + sum sib_dists) / (1 + n_sib) in unit space
    qh = q / np.linalg.norm(q)
    heur = np.empty(B, np.float32)
    for b in range(B):
        rows = [feats[b, P]] + [feats[b, P + 1 + j] for j in range(nsib[b])]
        d = 1.0 - _unit(np.stack(rows)) @ qh
        heur[b] = d.sum() / (1.0 + nsib[b])
    # identical ranking: descending model score == ascending heuristic score
    np.testing.assert_array_equal(np.argsort(-model_scores, kind="stable"),
                                  np.argsort(heur, kind="stable"))


def test_structure_prior_init(tiny_taxonomy):
    """With raw_channel on, a bilinear matcher's init carries the identity on
    the raw-block rows (models/taxoexpan.py:_seed_raw_prior) — the untrained
    model starts at the structure heuristic instead of rediscovering it."""
    import math
    sampler = MaskedGraphSampler(tiny_taxonomy, mode="train", sampling_mode=1,
                                 negative_size=7, expand_factor=6)
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    w = np.asarray(model.init(jax.random.PRNGKey(0))["match"]["w"])
    l_learned = model.readout.l_dim
    bound = 1.0 / math.sqrt(model.matcher.l_dim)
    raw = w[l_learned:]
    assert np.all(np.abs(np.diag(raw) - 1.0) <= bound)
    off = raw[~np.eye(raw.shape[0], dtype=bool)]
    assert np.all(np.abs(off) <= bound)
    # learned-summary rows untouched
    assert np.all(np.abs(w[:l_learned]) <= bound)


def test_prior_blend_semantics(tiny_taxonomy):
    """Ranker structure-prior blend: lam=0 == no blend; lam -> inf == ranking
    by the prior alone (== a matcher whose weight is the bare identity
    block); selection helper returns the grid's best by the chosen metric;
    non-raw-channel models are rejected."""
    from taxoexpan_tpu.evaluation.ranker import TaxonomyRanker
    sampler = MaskedGraphSampler(tiny_taxonomy, mode="test", sampling_mode=0,
                                 negative_size=7, expand_factor=6)
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    metrics = ["macro_mr", "hit_at_1", "mrr_scaled_10"]
    ranker = TaxonomyRanker(model, params, sampler, sampler.node_features,
                            encode_chunk=64, query_chunk=32)
    base, _ = ranker.evaluate(metrics, 1)
    lam0, _ = ranker.evaluate(metrics, 1, prior_lambda=0.0)
    for m in metrics:
        assert float(base[m]) == float(lam0[m])

    # lam -> inf == prior-only ranking == bare identity-block matcher
    inf_blend, _ = ranker.evaluate(metrics, 1, prior_lambda=1e9)
    params_id = jax.tree_util.tree_map(lambda x: x, params)
    w = np.zeros(np.asarray(params["match"]["w"]).shape, np.float32)
    w[model.readout.l_dim:] = np.eye(model.in_dim, dtype=np.float32)
    params_id = dict(params, match={"w": jnp.asarray(w)})
    ranker_id = TaxonomyRanker(model, params_id, sampler,
                               sampler.node_features,
                               encode_chunk=64, query_chunk=32)
    prior_only, _ = ranker_id.evaluate(metrics, 1)
    for m in metrics:
        np.testing.assert_allclose(float(inf_blend[m]), float(prior_only[m]),
                                   rtol=1e-6)

    # infer path: lam -> inf top-5 == the identity-block matcher's top-5
    qf = sampler.node_features[np.asarray(sampler.node_list[:8])]
    assert ranker.predict_parents(qf, 1, topk=5, prior_lambda=1e9) == \
        ranker_id.predict_parents(qf, 1, topk=5)

    lam_best, curve = ranker.select_prior_lambda([0.0, 0.5, 1e9], 1,
                                                 select_metric="macro_mr")
    assert set(curve) == {0.0, 0.5, 1e9}
    assert curve[lam_best] == min(curve.values())
    assert curve[lam_best] <= curve[0.0]   # never worse than the pure model

    arch_off = {"args": dict(ARCH["args"], raw_channel=False)}
    model_off = builders.build_model(arch_off,
                                     max_parents=sampler.max_parents,
                                     expand_factor=sampler.expand_factor)
    ranker_off = TaxonomyRanker(model_off,
                                model_off.init(jax.random.PRNGKey(0)),
                                sampler, sampler.node_features,
                                encode_chunk=64, query_chunk=32)
    with pytest.raises(ValueError, match="raw_channel"):
        ranker_off.evaluate(metrics, 1, prior_lambda=0.5)


def test_raw_channel_trains_and_evaluates(tiny_taxonomy, tmp_path):
    """End to end: trainer step + full-catalog ranker both flow the widened
    matcher dims (the channel rides encode(), so the encode-once +
    one-matmul eval engine needs no changes)."""
    from taxoexpan_tpu.evaluation.ranker import TaxonomyRanker
    from taxoexpan_tpu.train import Trainer
    sampler = MaskedGraphSampler(tiny_taxonomy, mode="train", sampling_mode=1,
                                 negative_size=7, expand_factor=6)
    loader = GroupBatchLoader(sampler, batch_size=8, prefetch=0)
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = builders.build_optimizer_from_config(
        {"type": "Adam", "args": {"lr": 1e-3}})
    trainer = Trainer(model, params, optimizer, optimizer.init(params),
                      loss_name="info_nce_loss", metric_names=["macro_mr"],
                      feature_table=sampler.node_features,
                      train_loader=loader,
                      config={"trainer": {"epochs": 1}},
                      save_dir=tmp_path, log_dir=tmp_path)
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])

    test_sampler = MaskedGraphSampler(tiny_taxonomy, mode="test",
                                      sampling_mode=0, negative_size=7,
                                      expand_factor=6)
    ranker = TaxonomyRanker(model, trainer.params, test_sampler,
                            test_sampler.node_features, encode_chunk=64)
    result, _ = ranker.evaluate(["macro_mr", "hit_at_1"], 1)
    assert np.isfinite(result["macro_mr"])
