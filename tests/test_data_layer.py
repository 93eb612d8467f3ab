"""Data-layer tests: taxonomy IO, sampler semantics, batch collation.

The reference has no test suite (SURVEY.md §4); these encode its documented
invariants (data_loader/dataset.py) as executable checks."""
import numpy as np
import pytest

from taxoexpan_tpu.data.egobatch import (ego_batch_edges, make_ego_batch,
                                         slot_mask, slot_positions)
from taxoexpan_tpu.data.embeddings import (KeyedVectors, load_word2vec_format,
                                           save_word2vec_format)
from taxoexpan_tpu.data.loader import GroupBatchLoader
from taxoexpan_tpu.data.sampler import MaskedGraphSampler
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
from taxoexpan_tpu.data.taxonomy import Taxonomy


def test_taxonomy_roundtrip(tmp_path, tiny_taxonomy):
    p = str(tmp_path / "t.pickle.bin")
    tiny_taxonomy.save(p)
    t2 = Taxonomy.load(p)
    assert t2.vocab == tiny_taxonomy.vocab
    np.testing.assert_array_equal(t2.edges, tiny_taxonomy.edges)
    np.testing.assert_allclose(t2.features, tiny_taxonomy.features)
    assert t2.train_node_ids == tiny_taxonomy.train_node_ids


def test_raw_dir_ingest(tmp_path):
    # build .terms/.taxo/.embed files and ingest them
    terms = [("a1", "root"), ("b2", "animal"), ("c3", "dog"), ("d4", "cat")]
    with open(tmp_path / "toy.terms", "w") as f:
        for tx, name in terms:
            f.write(f"{tx}\t{name}\n")
    with open(tmp_path / "toy.taxo", "w") as f:
        f.write("a1\tb2\nb2\tc3\nb2\td4\n")
    vecs = np.arange(8, dtype=np.float32).reshape(4, 2)
    save_word2vec_format(str(tmp_path / "toy.terms.embed"),
                         [t[0] for t in terms], vecs)
    taxo = Taxonomy.from_raw_dir("toy", str(tmp_path))
    assert taxo.num_nodes == 4
    assert taxo.num_edges == 3
    # node ids follow .terms order
    assert taxo.vocab[0] == "root@@@0"
    np.testing.assert_array_equal(taxo.edges[0], [0, 1])
    np.testing.assert_allclose(taxo.features, vecs)
    # leaves are dog/cat; 10% of 2 leaves = 0 -> all nodes train
    assert set(taxo.train_node_ids) | set(taxo.validation_node_ids) \
        | set(taxo.test_node_ids) == {0, 1, 2, 3}
    assert (tmp_path / "toy.pickle.bin").exists()


def test_keyed_vectors_cosine():
    kv = KeyedVectors(["x", "y"], np.array([[1.0, 0.0], [0.0, 2.0]]))
    d = kv.distances("x", ["x", "y"])
    np.testing.assert_allclose(d, [0.0, 1.0], atol=1e-6)


def test_word2vec_roundtrip(tmp_path):
    toks = ["alpha", "beta gamma"]  # token with a space
    vecs = np.array([[1.5, -2.0], [0.25, 3.0]], dtype=np.float32)
    p = str(tmp_path / "e.embed")
    save_word2vec_format(p, toks, vecs)
    t2, v2 = load_word2vec_format(p)
    assert t2 == toks
    np.testing.assert_allclose(v2, vecs, atol=1e-5)


# --------------------------------------------------------------------- sampler

@pytest.fixture(scope="module")
def train_sampler():
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=1)
    return MaskedGraphSampler(taxo, mode="train", sampling_mode=1,
                              negative_size=4, expand_factor=8, seed=3)


def test_masks_exclude_ancestry(train_sampler):
    s = train_sampler
    for q in s.node_list[:50]:
        masks = s.node2masks[q]
        assert q in masks
        for p in s.node2parents[q]:
            assert p in masks
        for r in s.roots:
            assert r in masks


def test_negatives_never_masked(train_sampler):
    s = train_sampler
    for q in s.node_list[:50]:
        negs = s.get_negatives(q, 4)
        assert len(negs) == 4  # exactly-k for sampling_mode 1
        assert all(n not in s.node2masks[q] for n in negs)
        assert all(n in s.all_positions for n in negs)


def test_positive_egonet_excludes_query(train_sampler):
    s = train_sampler
    for q in s.node_list[:50]:
        for p in s.node2parents[q]:
            gps, anchor, sibs = s.build_egonet(q, p, positive=True)
            assert anchor == p
            assert q not in sibs
            assert len(sibs) <= s.expand_factor
            assert len(gps) <= s.max_parents


def test_positive_round_robin(train_sampler):
    s = train_sampler
    multi = [q for q in s.node_list if len(s.node2parents[q]) > 1]
    if not multi:
        pytest.skip("no multi-parent query in synthetic taxonomy")
    q = multi[0]
    seen = []
    for _ in range(len(s.node2parents[q])):
        enets, labs, anchors = s.sample_group(q)
        assert labs[0] == 1
        seen.append(anchors[0])
    assert sorted(seen) == sorted(s.node2parents[q])


def test_negative_cache_refresh():
    taxo = synthetic_taxonomy(num_nodes=200, dim=8, seed=2)
    s = MaskedGraphSampler(taxo, mode="train", sampling_mode=1,
                           negative_size=2, expand_factor=4,
                           cache_refresh_time=3, seed=0)
    q = s.node_list[0]
    neg = s.get_negatives(q, 1)[0]
    first = s.get_egonet(q, neg, positive=False)
    for _ in range(3):
        assert s.get_egonet(q, neg, positive=False) is first
    # counter exhausted -> rebuilt object
    rebuilt = s.get_egonet(q, neg, positive=False)
    assert rebuilt is not first


def test_validation_leak_edges_removed():
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=1)
    s = MaskedGraphSampler(taxo, mode="validation", sampling_mode=0,
                           negative_size=8, expand_factor=8, seed=0)
    # queries keep their true parents as positives...
    for q in s.node_list[:20]:
        assert len(s.node2parents[q]) >= 1
        # ...but the working graph has no edge into the query
        assert len(s.parents.neighbors(q)) == 0
        # and no positive egonet can contain the query as a sibling
        for p in s.node2parents[q]:
            _, _, sibs = s.build_egonet(q, p, positive=True)
            assert q not in sibs


# -------------------------------------------------------------------- egobatch

def test_slot_layout():
    pos = slot_positions(max_parents=3, expand_factor=4)
    np.testing.assert_array_equal(pos, [0, 0, 0, 1, 2, 2, 2, 2])
    m = slot_mask(np.array([2]), np.array([1]), 3, 4)
    np.testing.assert_array_equal(
        np.asarray(m)[0], [True, True, False, True, True, False, False, False])


def test_make_ego_batch_and_edges():
    egos = [([7, 8], 5, [1, 2, 3]), ([], 9, [])]
    b = make_ego_batch(egos, max_parents=2, expand_factor=3)
    assert b.node_ids.shape == (2, 6)
    np.testing.assert_array_equal(b.node_ids[0], [7, 8, 5, 1, 2, 3])
    np.testing.assert_array_equal(b.node_ids[1], [0, 0, 9, 0, 0, 0])
    np.testing.assert_array_equal(b.ngp, [2, 0])
    np.testing.assert_array_equal(b.nsib, [3, 0])

    src, dst, mask = ego_batch_edges(b, 2, 3)
    n_edges_per = 2 + 3 + 6
    assert src.shape == (2 * n_edges_per,)
    # egonet 0: gp->anchor edges valid
    assert mask[0] and mask[1]
    assert (src[0], dst[0]) == (0, 2) and (src[1], dst[1]) == (1, 2)
    # anchor->sib edges valid
    assert mask[2] and mask[3] and mask[4]
    # egonet 1: only the anchor self-loop valid
    m2 = mask[n_edges_per:]
    s2 = src[n_edges_per:] - 6
    valid = [(int(s), int(d)) for s, d, v in
             zip(s2, dst[n_edges_per:] - 6, m2) if v]
    assert valid == [(2, 2)]


# ---------------------------------------------------------------------- loader

def test_train_loader_shapes(train_sampler):
    loader = GroupBatchLoader(train_sampler, batch_size=8, seed=0, prefetch=0)
    batches = list(loader)
    assert len(batches) == len(loader)
    gb = batches[0]
    assert gb.labels.shape == (8, 1 + 4)
    assert gb.ego.node_ids.shape == (8 * 5, train_sampler.max_parents + 1 + 8)
    # column 0 is always the positive in train layout
    np.testing.assert_array_equal(gb.labels[:, 0], np.ones(8))
    assert gb.cand_mask[:, 0].all()


def test_loader_final_batch_padded(train_sampler):
    loader = GroupBatchLoader(train_sampler, batch_size=64, seed=0, prefetch=2)
    batches = list(loader)
    total_valid_groups = sum(int(b.cand_mask.any(axis=1).sum()) for b in batches)
    assert total_valid_groups == len(train_sampler)
    for b in batches:
        assert b.labels.shape[0] == 64  # static shape incl. final batch


# ------------------------------------------------------- vectorized eval path

def test_anchor_ego_batch_matches_python_path():
    """anchor_ego_batch (vectorized CSR) vs per-anchor build_egonet parity.

    Deterministic parts (grandparent slots, anchor slot, counts, and sibling
    slots for anchors whose out-degree fits expand_factor) must match the
    Python path exactly; sampled sibling slots must be drawn from the
    anchor's true child set."""
    taxo = synthetic_taxonomy(num_nodes=400, dim=8, seed=3)
    s = MaskedGraphSampler(taxo, mode="test", sampling_mode=0,
                           negative_size=4, expand_factor=3, seed=5)
    anchors = np.asarray(s.candidate_positions)
    eb = s.anchor_ego_batch(anchors)
    p, ef = s.max_parents, s.expand_factor
    assert eb.node_ids.shape == (len(anchors), p + 1 + ef)
    for i, a in enumerate(map(int, anchors)):
        gps, anchor, _sibs = s.anchor_egonet(a)
        assert int(eb.ngp[i]) == len(gps)
        assert eb.node_ids[i, :len(gps)].tolist() == gps
        assert (eb.node_ids[i, len(gps):p] == 0).all()
        assert int(eb.node_ids[i, p]) == anchor == a
        children = set(s.children.neighbors(a).tolist())
        deg = len(s.children.neighbors(a))
        assert int(eb.nsib[i]) == min(deg, ef)
        got_sibs = eb.node_ids[i, p + 1:p + 1 + int(eb.nsib[i])].tolist()
        if deg <= ef:  # no sampling: exact CSR order
            assert got_sibs == s.children.neighbors(a).tolist()
        else:          # with-replacement sample from the true child set
            assert set(got_sibs) <= children
        assert (eb.node_ids[i, p + 1 + int(eb.nsib[i]):] == 0).all()


def test_anchor_ego_batch_deterministic():
    taxo = synthetic_taxonomy(num_nodes=200, dim=8, seed=1)
    s = MaskedGraphSampler(taxo, mode="test", sampling_mode=0,
                           negative_size=4, expand_factor=2, seed=9)
    a = np.asarray(s.candidate_positions)
    b1, b2 = s.anchor_ego_batch(a), s.anchor_ego_batch(a)
    np.testing.assert_array_equal(b1.node_ids, b2.node_ids)
    np.testing.assert_array_equal(b1.ngp, b2.ngp)
    np.testing.assert_array_equal(b1.nsib, b2.nsib)
