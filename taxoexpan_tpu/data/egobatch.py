"""Fixed-shape padded ego-network batches — the TPU-native replacement for
`dgl.batch` (data_loader/data_loaders.py:26,60).

Every TaxoExpan ego-network is a depth-1 *star* around a candidate anchor
(data_loader/dataset.py:404-437): grandparent nodes all point at the anchor,
the anchor points at each sibling, and every node has a self-loop. Instead of a
disjoint-union sparse graph with dynamic shapes, we lay each egonet out in a
fixed slot grid:

    slot 0 .. P-1 : grandparents  (ngp valid, position code 0)
    slot P        : anchor        (always valid, position code 1)
    slot P+1..N-1 : siblings      (nsib valid, position code 2)

with N = P + 1 + S (P = max parents in the working graph, S = expand_factor).
All downstream message passing / readout becomes dense masked ops over
[B, N, D] arrays — static shapes, no scatter, MXU-friendly — and the edge
structure is a *function of (ngp, nsib)* rather than stored edge lists.

Batches carry node *ids*; features are gathered on-device from the resident
feature table, so host->device traffic is O(B*N) int32 instead of O(B*N*D)
floats.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np

Egonet = tuple[Sequence[int], int, Sequence[int]]  # (grandparents, anchor, siblings)


@jax.tree_util.register_dataclass
@dataclass
class EgoBatch:
    """A batch of B padded star egonets. All arrays are numpy or jax."""
    node_ids: jax.Array   # [B, N] int32, global node ids (0 in padded slots)
    ngp: jax.Array        # [B] int32, number of valid grandparent slots
    nsib: jax.Array       # [B] int32, number of valid sibling slots

    @property
    def batch_size(self) -> int:
        return self.node_ids.shape[0]

    @property
    def num_slots(self) -> int:
        return self.node_ids.shape[1]


@jax.tree_util.register_dataclass
@dataclass
class GroupBatch:
    """G query groups of C candidate positions each.

    Training (sampling_mode 1, data_loader/dataset.py:308-313): C = 1 + ns,
    column 0 is the single positive — the exact InfoNCE layout the reference
    creates by reshape in trainer/trainer.py:52-56.

    Validation/test (sampling_mode 0, dataset.py:304-307): columns
    [0, Pmax) hold one egonet per true parent (label 1, padded by `labels`=0 &
    `cand_mask`=False) and the rest hold negatives; `cand_mask` marks real
    candidates (negatives can be "at most k", dataset.py:340-355).
    """
    ego: EgoBatch             # flattened egonets, B = G * C
    query_ids: Optional[jax.Array]    # [G] int32 (None when query_feats given)
    query_feats: Optional[jax.Array]  # [G, D] float32 (novel terms / infer)
    labels: jax.Array         # [G, C] float32, 1.0 = positive
    cand_mask: jax.Array      # [G, C] bool, True = real candidate

    @property
    def num_groups(self) -> int:
        return self.labels.shape[0]

    @property
    def group_size(self) -> int:
        return self.labels.shape[1]


# --------------------------------------------------------------------- helpers

def slot_positions(max_parents: int, expand_factor: int) -> np.ndarray:
    """Position code per slot: 0 = grandparent, 1 = anchor, 2 = sibling.

    Mirrors the `pos` node data written in data_loader/dataset.py:407-426.
    """
    n = max_parents + 1 + expand_factor
    pos = np.full((n,), 2, dtype=np.int32)
    pos[:max_parents] = 0
    pos[max_parents] = 1
    return pos


def slot_mask(ngp: np.ndarray, nsib: np.ndarray, max_parents: int,
              expand_factor: int):
    """[B, N] validity mask from per-egonet gp/sibling counts (vectorized,
    works for both numpy and jnp inputs)."""
    xp = jax.numpy if isinstance(ngp, jax.Array) else np
    n = max_parents + 1 + expand_factor
    slots = xp.arange(n, dtype=xp.int32)[None, :]
    gp_ok = slots < ngp[:, None]
    anchor_ok = slots == max_parents
    sib_ok = (slots > max_parents) & (slots < max_parents + 1 + nsib[:, None])
    return gp_ok | anchor_ok | sib_ok


def make_ego_batch(egonets: Sequence[Egonet], max_parents: int,
                   expand_factor: int) -> EgoBatch:
    """Collate python egonet triplets into a padded EgoBatch (host side)."""
    b = len(egonets)
    n = max_parents + 1 + expand_factor
    node_ids = np.zeros((b, n), dtype=np.int32)
    ngp = np.zeros((b,), dtype=np.int32)
    nsib = np.zeros((b,), dtype=np.int32)
    for i, (gps, anchor, sibs) in enumerate(egonets):
        g = min(len(gps), max_parents)
        s = min(len(sibs), expand_factor)
        if g:
            node_ids[i, :g] = gps[:g]
        node_ids[i, max_parents] = anchor
        if s:
            node_ids[i, max_parents + 1:max_parents + 1 + s] = sibs[:s]
        ngp[i] = g
        nsib[i] = s
    return EgoBatch(node_ids=node_ids, ngp=ngp, nsib=nsib)


def ego_batch_edges(batch: EgoBatch, max_parents: int, expand_factor: int
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Materialize the (src, dst, edge_mask) arrays of the batched star graphs.

    This is the *generic sparse* view used by the segment-op kernel path and
    by parity tests; node indices are flattened over [B * N]. Edge slots per
    egonet (fixed E = N + P + S):
        e in [0, P)          : gp_e -> anchor             (valid iff e < ngp)
        e in [P, P+S)        : anchor -> sibling_(e-P)    (valid iff e-P < nsib)
        e in [P+S, P+S+N)    : self-loops                 (valid iff node valid)
    matching the edge construction order of data_loader/dataset.py:431-435.
    """
    b = batch.node_ids.shape[0]
    n = max_parents + 1 + expand_factor
    p, s = max_parents, expand_factor
    e_per = p + s + n
    ngp = np.asarray(batch.ngp)
    nsib = np.asarray(batch.nsib)

    src = np.zeros((b, e_per), dtype=np.int32)
    dst = np.zeros((b, e_per), dtype=np.int32)
    mask = np.zeros((b, e_per), dtype=bool)

    gp_slots = np.arange(p, dtype=np.int32)
    sib_slots = np.arange(s, dtype=np.int32) + p + 1
    all_slots = np.arange(n, dtype=np.int32)

    src[:, :p] = gp_slots[None, :]
    dst[:, :p] = p
    mask[:, :p] = gp_slots[None, :] < ngp[:, None]

    src[:, p:p + s] = p
    dst[:, p:p + s] = sib_slots[None, :]
    mask[:, p:p + s] = np.arange(s)[None, :] < nsib[:, None]

    src[:, p + s:] = all_slots[None, :]
    dst[:, p + s:] = all_slots[None, :]
    mask[:, p + s:] = np.asarray(slot_mask(ngp, nsib, p, s))

    offset = (np.arange(b, dtype=np.int32) * n)[:, None]
    return (src + offset).reshape(-1), (dst + offset).reshape(-1), mask.reshape(-1)
