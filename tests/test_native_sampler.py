"""Native C++ sampler: semantic equivalence with the python reference
sampler (invariants, not bit-exact randomness)."""
import numpy as np
import pytest

from taxoexpan_tpu.data.loader import GroupBatchLoader
from taxoexpan_tpu.data.sampler import MaskedGraphSampler
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy

native_mod = pytest.importorskip("taxoexpan_tpu.native")
if not native_mod.NativeSampler.available():
    pytest.skip("native sampler library not built", allow_module_level=True)


@pytest.fixture(scope="module")
def setup():
    taxo = synthetic_taxonomy(num_nodes=400, dim=8, seed=2)
    py = MaskedGraphSampler(taxo, mode="train", sampling_mode=1,
                            negative_size=5, expand_factor=6,
                            cache_refresh_time=8, seed=0)
    return taxo, py, native_mod.NativeSampler(py, seed=1)


def test_train_batch_invariants(setup):
    taxo, py, nat = setup
    queries = np.asarray(py.node_list[:16], np.int32)
    node_ids, ngp, nsib, labels, mask = nat.sample_train_batch(queries)
    g, c = labels.shape
    n = py.max_parents + 1 + py.expand_factor
    assert node_ids.shape == (g * c, n)
    assert mask.all()
    np.testing.assert_array_equal(labels[:, 0], 1.0)
    np.testing.assert_array_equal(labels[:, 1:], 0.0)
    for qi, q in enumerate(queries):
        # positive anchor is a true parent
        pos_anchor = node_ids[qi * c, py.max_parents]
        assert pos_anchor in py.node2parents[int(q)]
        # positive egonet excludes the query
        row = node_ids[qi * c]
        sibs = row[py.max_parents + 1:py.max_parents + 1 +
                   nsib[qi * c]]
        assert int(q) not in sibs.tolist()
        # negatives are unmasked train positions — except for queries whose
        # valid pool is tiny, where the 10-try refill gives up and fills
        # unchecked (reference corner case, dataset.py:374-379)
        pool = len(py.all_positions - py.node2masks[int(q)])
        for j in range(1, c):
            anchor = node_ids[qi * c + j, py.max_parents]
            assert anchor in py.all_positions
            if pool >= 10 * py.negative_size:
                assert anchor not in py.node2masks[int(q)]


def test_anchor_egonets_match_graph(setup):
    taxo, py, nat = setup
    anchors = np.asarray(sorted(py.all_positions)[:50], np.int32)
    node_ids, ngp, nsib, = nat.build_anchor_egonets(anchors)
    for i, a in enumerate(anchors):
        assert node_ids[i, py.max_parents] == a
        gps = node_ids[i, :ngp[i]].tolist()
        assert gps == py.parents.neighbors(int(a)).tolist()[:py.max_parents]
        sibs = set(node_ids[i, py.max_parents + 1:
                            py.max_parents + 1 + nsib[i]].tolist())
        assert sibs <= set(py.children.neighbors(int(a)).tolist())


def test_negative_cache_reuse(setup):
    taxo, py, nat = setup
    queries = np.asarray(py.node_list[:4], np.int32)
    # multiple rounds run without error and keep invariants (cache exercised)
    for _ in range(5):
        node_ids, ngp, nsib, labels, mask = nat.sample_train_batch(queries)
        assert labels[:, 0].all()


def test_loader_uses_native_backend():
    taxo = synthetic_taxonomy(num_nodes=300, dim=8, seed=4)
    py = MaskedGraphSampler(taxo, mode="train", sampling_mode=1,
                            negative_size=3, expand_factor=4, seed=0)
    loader = GroupBatchLoader(py, batch_size=8, seed=0, prefetch=0,
                              backend="native")
    assert loader.native is not None
    batches = list(loader)
    total = sum(int(b.cand_mask.any(axis=1).sum()) for b in batches)
    assert total == len(py)
    gb = batches[0]
    assert gb.labels[:, 0].all()
    # python backend still default-compatible
    loader_py = GroupBatchLoader(py, batch_size=8, seed=0, prefetch=0,
                                 backend="python")
    assert loader_py.native is None


def test_native_faster_than_python():
    import time
    taxo = synthetic_taxonomy(num_nodes=3000, dim=8, seed=5)
    py = MaskedGraphSampler(taxo, mode="train", sampling_mode=1,
                            negative_size=31, expand_factor=32,
                            cache_refresh_time=16, seed=0)
    nat = native_mod.NativeSampler(py, seed=1)
    queries = np.asarray(py.node_list[:128], np.int32)

    t0 = time.perf_counter()
    for _ in range(3):
        nat.sample_train_batch(queries)
    t_nat = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(3):
        for q in queries:
            py.sample_group(int(q))
    t_py = time.perf_counter() - t0
    # not a strict benchmark, but native should win clearly
    assert t_nat < t_py, (t_nat, t_py)


def test_eval_batch_invariants():
    """sampling_mode 0 (validation layout): one positive per true parent in
    the leading columns, at-most-k unmasked negatives after max_pos, padding
    masked out."""
    taxo = synthetic_taxonomy(num_nodes=400, dim=8, seed=2)
    py = MaskedGraphSampler(taxo, mode="validation", sampling_mode=0,
                            negative_size=7, expand_factor=6,
                            cache_refresh_time=8, seed=0)
    nat = native_mod.NativeSampler(py, seed=1)
    queries = np.asarray(py.node_list[:12], np.int32)
    node_ids, ngp, nsib, labels, mask = nat.sample_eval_batch(queries)
    g, c = labels.shape
    max_pos = py.max_query_parents
    assert c == max_pos + py.negative_size
    for qi, q in enumerate(queries):
        parents = py.node2parents[int(q)]
        npos = len(parents)
        # positives: one per parent, in CSR order, labeled 1
        np.testing.assert_array_equal(labels[qi, :npos], 1.0)
        np.testing.assert_array_equal(labels[qi, npos:], 0.0)
        assert mask[qi, :npos].all()
        # padded positive columns are unmasked and empty
        assert not mask[qi, npos:max_pos].any()
        for j in range(npos):
            assert node_ids[qi * c + j, py.max_parents] == parents[j]
            sibs = node_ids[qi * c + j,
                            py.max_parents + 1:
                            py.max_parents + 1 + nsib[qi * c + j]]
            assert int(q) not in sibs.tolist()
        # negatives: at most k, unmasked, contiguous from max_pos
        neg_cols = np.flatnonzero(mask[qi, max_pos:])
        assert len(neg_cols) >= 1
        assert (neg_cols == np.arange(len(neg_cols))).all()
        for j in neg_cols:
            anchor = int(node_ids[qi * c + max_pos + j, py.max_parents])
            assert anchor in py.all_positions
            assert anchor not in py.node2masks[int(q)]


def test_loader_native_eval_layout_matches_python():
    """The loader's native validation path produces the same layout contract
    as the python path (same labels/cand_mask positive structure; negatives
    differ only by RNG stream)."""
    taxo = synthetic_taxonomy(num_nodes=300, dim=8, seed=4)

    def build(backend):
        py = MaskedGraphSampler(taxo, mode="validation", sampling_mode=0,
                                negative_size=5, expand_factor=4, seed=0)
        loader = GroupBatchLoader(py, batch_size=8, seed=0, prefetch=0,
                                  shuffle=False, backend=backend)
        return py, list(loader)

    py_s, py_batches = build("python")
    nat_s, nat_batches = build("native")
    assert len(py_batches) == len(nat_batches)
    for pb, nb in zip(py_batches, nat_batches):
        np.testing.assert_array_equal(pb.labels, nb.labels)
        # positive columns (before max_pos) agree exactly incl. anchors
        mp = py_s.max_query_parents
        np.testing.assert_array_equal(pb.cand_mask[:, :mp],
                                      nb.cand_mask[:, :mp])
        c = pb.labels.shape[1]
        for gi in range(pb.labels.shape[0]):
            for j in range(mp):
                if pb.cand_mask[gi, j]:
                    assert (pb.ego.node_ids[gi * c + j, py_s.max_parents] ==
                            nb.ego.node_ids[gi * c + j, nat_s.max_parents])
