"""Generic sparse graph kernels as jnp segment ops.

These are the TPU-native equivalents of the DGL/CUDA primitives the reference
delegates to (SURVEY.md §2.9, N1-N3/N5/N7):

- SpMM:          `g.update_all(fn.copy_src/src_mul_edge, fn.sum)`
                 (model/model_zoo.py:41,95)
- SDDMM:         `g.apply_edges(edge_attention)` (model/model_zoo.py:90,106-109)
- edge_softmax:  softmax over each destination's incoming edges
                 (model/model_zoo.py:92,111-114)
- segment readouts: `dgl.mean_nodes/sum_nodes` (model/model_zoo.py:232,242,249)
- degrees:       `g.in_degrees()` (model/model_zoo.py:130,157)

They operate on flat (src, dst, mask) edge arrays with static shapes (padding
masked), so everything jits cleanly. This is the *general* path and the
correctness oracle; the hot path for TaxoExpan's star egonets is the dense
closed form in ops/star.py, which computes identical values with no scatters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_segment_sum(data: jax.Array, segment_ids: jax.Array,
                       num_segments: int, mask: jax.Array | None = None
                       ) -> jax.Array:
    """segment_sum with invalid entries zeroed."""
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def masked_segment_max(data: jax.Array, segment_ids: jax.Array,
                       num_segments: int, mask: jax.Array | None = None
                       ) -> jax.Array:
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, NEG_INF)
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def in_degrees(dst: jax.Array, num_nodes: int,
               mask: jax.Array | None = None) -> jax.Array:
    """Per-node in-degree from a (masked) edge list; replaces g.in_degrees()."""
    ones = jnp.ones(dst.shape, dtype=jnp.float32)
    return masked_segment_sum(ones, dst, num_nodes, mask)


def sddmm(a_src: jax.Array, a_dst: jax.Array, src: jax.Array, dst: jax.Array
          ) -> jax.Array:
    """Sampled dense-dense: per-edge `a_src[src] + a_dst[dst]`.

    The gather half of GAT attention (model/model_zoo.py:106-109 computes
    leaky_relu(src.a1 + dst.a2); the nonlinearity is applied by the caller).
    """
    return a_src[src] + a_dst[dst]


def edge_softmax(logits: jax.Array, dst: jax.Array, num_nodes: int,
                 mask: jax.Array | None = None) -> jax.Array:
    """Numerically-stable softmax over each destination's incoming edges.

    Matches dgl.nn.pytorch.edge_softmax (used at model/model_zoo.py:92).
    `logits` is [E, ...] with the edge axis first; masked edges get weight 0.
    """
    seg_max = masked_segment_max(logits, dst, num_nodes, mask)
    # guard segments with no valid edges
    seg_max = jnp.where(seg_max <= NEG_INF / 2, 0.0, seg_max)
    shifted = logits - seg_max[dst]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(_expand(mask, exp), exp, 0.0)
    denom = jax.ops.segment_sum(exp, dst, num_segments=num_nodes)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    return exp / denom[dst]


def spmm(h_src: jax.Array, src: jax.Array, dst: jax.Array, num_nodes: int,
         edge_weight: jax.Array | None = None,
         mask: jax.Array | None = None) -> jax.Array:
    """Gather-scatter sum over edges: out[d] = sum_{(s,d) in E} w_e * h[s].

    Equivalent to `update_all(copy_src, sum)` (edge_weight=None) and
    `update_all(src_mul_edge, sum)` (model/model_zoo.py:41,95).
    """
    msgs = h_src[src]
    if edge_weight is not None:
        msgs = msgs * edge_weight
    return masked_segment_sum(msgs, dst, num_nodes, mask)


def segment_readout(h: jax.Array, graph_ids: jax.Array, num_graphs: int,
                    node_mask: jax.Array | None = None,
                    weight: jax.Array | None = None,
                    op: str = "mean") -> jax.Array:
    """Per-graph readout over a flat node array.

    DGL semantics (dgl readout: multiply by weight, then reduce):
    - op="sum":  sum_i w_i h_i
    - op="mean": (sum_i w_i h_i) / N_g  -- divide by node COUNT, not sum of
      weights, matching dgl.mean_nodes(g, 'h', 'a') used by WMR/CR
      (model/model_zoo.py:242,252-256).
    - op="max":  max_i h_i (weight ignored), dgl MaxPooling.
    """
    if op == "max":
        return masked_segment_max(h, graph_ids, num_graphs, node_mask)
    hw = h if weight is None else h * weight
    total = masked_segment_sum(hw, graph_ids, num_graphs, node_mask)
    if op == "sum":
        return total
    if op == "mean":
        ones = jnp.ones(h.shape[:1], dtype=h.dtype)
        counts = masked_segment_sum(ones, graph_ids, num_graphs, node_mask)
        counts = jnp.maximum(counts, 1.0)
        return total / counts[:, None]
    raise ValueError(f"unknown readout op {op!r}")


def _expand(mask: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a [E]-shaped mask against [E, ...] data."""
    while mask.ndim < like.ndim:
        mask = mask[..., None]
    return mask
