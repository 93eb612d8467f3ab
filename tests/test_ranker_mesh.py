"""Mesh-sharded evaluation: candidate-axis sharding gives identical results
to the single-device ranker."""
import jax
import numpy as np
import pytest

from taxoexpan_tpu import builders
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
from taxoexpan_tpu.evaluation import TaxonomyRanker
from taxoexpan_tpu.parallel import data_parallel_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = {"batch_size": 16, "negative_size": 8, "expand_factor": 6,
       "cache_refresh_time": 16, "normalize_embed": True, "num_workers": 0,
       "sampling_mode": 0, "shuffle": False}
ARCH = {"args": {"propagation_method": "PGAT", "readout_method": "WMR",
                 "matching_method": "BIM", "in_dim": 16, "hidden_dim": 16,
                 "out_dim": 16, "pos_dim": 4, "num_layers": 1,
                 "heads": [2, 1], "feat_drop": 0.0, "attn_drop": 0.0,
                 "hidden_drop": 0.0, "out_drop": 0.0}}


def test_sharded_eval_matches_single():
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=9)
    sampler = builders.build_sampler(taxo, CFG, "test")
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))

    single = TaxonomyRanker(model, params, sampler, sampler.node_features,
                            encode_chunk=64, query_chunk=16)
    res_single, _ = single.evaluate(["macro_mr", "mrr_scaled_10"], 1)

    mesh = data_parallel_mesh()
    sharded = TaxonomyRanker(model, params, sampler, sampler.node_features,
                             encode_chunk=64, query_chunk=16, mesh=mesh)
    res_sharded, _ = sharded.evaluate(["macro_mr", "mrr_scaled_10"], 1)

    np.testing.assert_allclose(res_sharded["macro_mr"],
                               res_single["macro_mr"], rtol=1e-5)
    np.testing.assert_allclose(res_sharded["mrr_scaled_10"],
                               res_single["mrr_scaled_10"], rtol=1e-5)


def test_sharded_encode_hg_matches_single():
    """The unified one-dispatch encode path: mesh and single-device rankers
    must produce the same [C, l_dim] anchor embeddings."""
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=9)
    sampler = builders.build_sampler(taxo, CFG, "test")
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))

    single = TaxonomyRanker(model, params, sampler, sampler.node_features,
                            encode_chunk=64, query_chunk=16)
    hg_single = np.asarray(jax.device_get(single.encode_all_anchors()))
    mesh = data_parallel_mesh()
    sharded = TaxonomyRanker(model, params, sampler, sampler.node_features,
                             encode_chunk=64, query_chunk=16, mesh=mesh)
    hg_sharded = np.asarray(jax.device_get(sharded.encode_all_anchors()))
    np.testing.assert_allclose(hg_sharded, hg_single, rtol=1e-5, atol=1e-6)


def test_repeat_evaluate_does_not_retrace():
    """evaluate()/predict_parents() reuse the hoisted jits — a second call
    must not grow the trace cache (each retrace through the relay costs a
    multi-second recompile round trip)."""
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=9)
    sampler = builders.build_sampler(taxo, CFG, "test")
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    ranker = TaxonomyRanker(model, params, sampler, sampler.node_features,
                            encode_chunk=64, query_chunk=16)
    ranker.evaluate(["macro_mr"], 1)
    n_rank = ranker._rank_all_jit._cache_size()
    ranker.evaluate(["macro_mr"], 1)
    assert ranker._rank_all_jit._cache_size() == n_rank
    rng = np.random.default_rng(3)
    nf = rng.normal(size=(16, 16)).astype(np.float32)
    ranker.predict_parents(nf, 1, topk=5)
    n_inf = ranker._infer_all_jit._cache_size()
    ranker.predict_parents(nf, 1, topk=5)
    assert ranker._infer_all_jit._cache_size() == n_inf


def test_sharded_predict_parents_matches_single():
    """infer.py --mesh path: sharded anchor encoding must give the same
    top-k parent predictions as the single-device ranker."""
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=9)
    sampler = builders.build_sampler(taxo, CFG, "test", test_topk=20)
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    nf = rng.normal(size=(7, 16)).astype(np.float32)
    nf /= np.linalg.norm(nf, axis=1, keepdims=True)

    single = TaxonomyRanker(model, params, sampler, sampler.node_features,
                            encode_chunk=64, query_chunk=16)
    mesh = data_parallel_mesh()
    sharded = TaxonomyRanker(model, params, sampler, sampler.node_features,
                             encode_chunk=64, query_chunk=16, mesh=mesh)
    assert single.predict_parents(nf, 1, topk=5) == \
        sharded.predict_parents(nf, 1, topk=5)


def test_sharded_prior_blend_matches_single():
    """Structure-prior blend on the mesh path: lam is a replicated traced
    scalar, hg stays replicated — metrics must match single-device."""
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=9)
    sampler = builders.build_sampler(taxo, CFG, "test")
    arch_rc = {"args": dict(ARCH["args"], readout_method="CR",
                            raw_channel=True)}
    model = builders.build_model(arch_rc, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    single = TaxonomyRanker(model, params, sampler, sampler.node_features,
                            encode_chunk=64, query_chunk=16)
    res_single, _ = single.evaluate(["macro_mr", "hit_at_1"], 1,
                                    prior_lambda=0.7)
    mesh = data_parallel_mesh()
    sharded = TaxonomyRanker(model, params, sampler, sampler.node_features,
                             encode_chunk=64, query_chunk=16, mesh=mesh)
    res_sharded, _ = sharded.evaluate(["macro_mr", "hit_at_1"], 1,
                                      prior_lambda=0.7)
    np.testing.assert_allclose(res_sharded["macro_mr"],
                               res_single["macro_mr"], rtol=1e-5)
    np.testing.assert_allclose(res_sharded["hit_at_1"],
                               res_single["hit_at_1"], rtol=1e-5)
