"""Synthetic taxonomy generator for tests and benchmarks.

The reference repo ships no runnable dataset (MAG/SemEval are external
downloads, README.md:15-17), so we generate random taxonomies whose node
embeddings are correlated along edges: a child's embedding is a noisy copy of
its (first) parent's. That gives a learnable signal — a trained model should
beat random ranking — which the end-to-end smoke tests assert.
"""
from __future__ import annotations

import numpy as np

from .taxonomy import Taxonomy


def synthetic_taxonomy(num_nodes: int = 500,
                       dim: int = 32,
                       max_children: int = 8,
                       dag_extra_parent_prob: float = 0.05,
                       noise: float = 0.35,
                       seed: int = 0,
                       name: str = "synthetic") -> Taxonomy:
    """Random rooted DAG taxonomy with edge-correlated embeddings.

    Nodes 1..V-1 each attach to a uniformly random earlier node (preferring
    shallow ids so the tree stays bushy), with probability
    `dag_extra_parent_prob` of an extra parent (making it a DAG, like MAG).
    """
    rng = np.random.default_rng(seed)
    features = np.zeros((num_nodes, dim), dtype=np.float32)
    features[0] = rng.normal(size=dim)
    edges: list[tuple[int, int]] = []
    child_count = np.zeros(num_nodes, dtype=np.int64)

    for v in range(1, num_nodes):
        # pick a parent among earlier nodes with open capacity
        for _ in range(10):
            p = int(rng.integers(0, v))
            if child_count[p] < max_children:
                break
        edges.append((p, v))
        child_count[p] += 1
        features[v] = features[p] + noise * rng.normal(size=dim)
        if v > 2 and rng.random() < dag_extra_parent_prob:
            p2 = int(rng.integers(0, v))
            if p2 != p:
                edges.append((p2, v))
                child_count[p2] += 1

    edges_arr = np.asarray(edges, dtype=np.int32)
    vocab = [f"node_{i}@@@{i}" for i in range(num_nodes)]

    # Partition: 10%/10% of leaves for val/test (same rule as
    # data_loader/dataset.py:167-179, but with the numpy rng).
    out_deg = np.bincount(edges_arr[:, 0], minlength=num_nodes)
    leaves = np.flatnonzero(out_deg == 0)
    perm = rng.permutation(len(leaves))
    n_val = max(1, int(len(leaves) * 0.1))
    n_test = max(1, int(len(leaves) * 0.1))
    val_ids = leaves[perm[:n_val]].tolist()
    test_ids = leaves[perm[n_val:n_val + n_test]].tolist()
    held = set(val_ids) | set(test_ids)
    train_ids = [i for i in range(num_nodes) if i not in held]

    return Taxonomy(name=name, vocab=vocab, features=features, edges=edges_arr,
                    train_node_ids=train_ids, validation_node_ids=val_ids,
                    test_node_ids=test_ids)
