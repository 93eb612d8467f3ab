"""Baseline family tests: each must run end-to-end and beat random ranking on
the edge-correlated synthetic taxonomy (embeddings correlate along edges, so
distance baselines have signal by construction)."""
import numpy as np
import pytest

from taxoexpan_tpu.baselines import simple_parent, simple_structure
from taxoexpan_tpu.baselines.simple_mlp import SimpleMLPBaseline
from taxoexpan_tpu.baselines.xgb_features import (NUM_FEATURES,
                                                  FeatureExtractor,
                                                  NegativeQueue,
                                                  generate_supervision)
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy


@pytest.fixture(scope="module")
def taxo():
    return synthetic_taxonomy(num_nodes=400, dim=16, seed=3)


def test_simple_parent(taxo):
    res = simple_parent.evaluate(taxo)
    n = res["num_candidates"]
    assert res["macro_mr"] < n / 3          # random ~ n/2
    assert 0 <= res["hit_at_1"] <= 1


@pytest.mark.parametrize("agg,beta", [("sum", 0.0), ("mean", 0.2),
                                      ("min", 0.1), ("max", 0.1)])
def test_simple_structure(taxo, agg, beta):
    res = simple_structure.evaluate(taxo, agg=agg, beta=beta)
    assert res["macro_mr"] < res["num_candidates"] / 2.5


def test_simple_mlp_learns(taxo):
    b = SimpleMLPBaseline(taxo, model="MLP", negative_size=8, lr=1e-2)
    b.train(epochs=6, batch_size=64, log=lambda *_: None)
    res = b.evaluate()
    assert res["num_queries"] > 0
    # trained scorer must beat random ranking (~180 for 360 candidates)
    assert res["macro_mr"] < 160, res


@pytest.mark.parametrize("model", ["DeepSetMLP", "DeepAPGMLP"])
def test_simple_mlp_variants_run(taxo, model):
    # set-encoder variants are slow learners on tiny synthetic data
    # (reference reports them as weak baselines too) — assert the full
    # train/eval pipeline runs and produces finite metrics
    b = SimpleMLPBaseline(taxo, model=model, negative_size=4, lr=2e-3)
    b.train(epochs=1, batch_size=64, log=lambda *_: None)
    res = b.evaluate()
    assert res["num_queries"] > 0
    assert np.isfinite(res["macro_mr"])
    assert 0.0 <= res["hit_at_1"] <= 1.0


def test_negative_queue(taxo):
    q = NegativeQueue(list(range(50)) * 2, seed=1)
    negs = q.sample_avoid_positive_set({1, 2, 3}, 10)
    assert all(n not in {1, 2, 3} for n in negs)
    assert len(negs) <= 10


def test_feature_extractor_shape(taxo):
    fe = FeatureExtractor(taxo)
    q = taxo.test_node_ids[0]
    p = int(taxo.parents.neighbors(q)[0])
    feat = fe.extract_features(q, p)
    assert len(feat) == NUM_FEATURES
    assert np.isfinite(feat[0])
    # feature 1 is the query->parent cosine distance
    assert -1.0 <= feat[0] <= 2.0


def test_generate_supervision(taxo):
    x, y = generate_supervision(taxo, negative_size=3)
    assert x.shape[1] == NUM_FEATURES
    assert set(np.unique(y)) <= {0.0, 1.0}
    assert y.sum() > 0 and (y == 0).sum() > 0


def test_tune_booster_hill_climb():
    """Hill-climb semantics vs model_tuning.py:46-67: per-coordinate argmax
    with >= tie-breaking (last tied value wins), winners carried forward."""
    from taxoexpan_tpu.baselines.xgb_features import tune_booster

    grid = {"a": [1, 2, 3], "b": [10, 20], "c": [5, 5]}
    calls = []

    def objective(params):
        calls.append(dict(params))
        # best at a=2; b's score depends on the carried-forward a;
        # c's values tie -> the LAST one must win (reference uses >=)
        score = -abs(params["a"] - 2) * 10
        if params["a"] == 2:
            score += params["b"]  # only rewards b when a's winner carried
        return float(score)

    best, metric = tune_booster(grid=grid, defaults={"a": 0, "b": 0, "c": 0},
                                train_fn=objective)
    assert best["a"] == 2 and best["b"] == 20
    assert best["c"] == 5  # last tied value
    assert len(calls) == 3 + 2 + 2
    # sweep of b happened with the tuned a in place
    assert all(c["a"] == 2 for c in calls[3:5])
    assert metric == 20.0


def test_tune_booster_without_xgboost_raises():
    from taxoexpan_tpu.baselines.xgb_features import tune_booster
    try:
        import xgboost  # noqa: F401
        pytest.skip("xgboost present; error path not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="xgboost"):
        tune_booster(np.zeros((4, 2)), np.zeros(4), np.zeros((2, 2)),
                     np.zeros(2))


def test_extract_features_batch_matches_per_pair(taxo):
    """The vectorized extractor must reproduce the per-pair feature vectors
    (the reference's cached fast path exists for the same parity contract,
    feature_extractor.py:157-261). Covers leaf candidates (no children),
    root candidates (no grandparents), and the query-in-children exclusion."""
    fe = FeatureExtractor(taxo)
    rng = np.random.default_rng(0)
    train = [int(t) for t in taxo.train_node_ids]
    deg_out = np.diff(taxo.children.indptr)
    deg_in = np.diff(taxo.parents.indptr)
    # stratified candidates: leaves, roots, hubs, random
    cands = set(rng.choice(train, size=30, replace=False).tolist())
    cands |= {int(np.argmax(deg_out)), int(np.argmin(deg_in))}
    for q in train[:6]:
        parents = taxo.parents.neighbors(q).tolist()
        cc = sorted(cands | set(parents))          # includes true parents
        batch = fe.extract_features_batch(q, cc)
        assert batch.shape == (len(cc), NUM_FEATURES)
        for ci, c in enumerate(cc):
            want = np.asarray(fe.extract_features(q, c), np.float32)
            np.testing.assert_allclose(batch[ci], want, rtol=2e-5,
                                       atol=2e-6,
                                       err_msg=f"q={q} cand={c}")


def test_extract_features_batch_query_sibling_exclusion(taxo):
    """A candidate that is the query's own parent must exclude the query
    from its sibling block in both paths."""
    fe = FeatureExtractor(taxo)
    for q in [int(t) for t in taxo.train_node_ids][:50]:
        for p in taxo.parents.neighbors(q).tolist():
            sibs = [c for c in taxo.children.neighbors(p).tolist() if c != q]
            row = fe.extract_features_batch(q, [p])[0]
            assert row[9] == len(sibs)   # sibling-block count (feature 10)
            break
