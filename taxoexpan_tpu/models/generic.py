"""Generic sparse-path model forward: the same PGAT/PGCN math over flat
(src, dst, mask) edge arrays and segment kernels (ops/segment.py) instead of
the star closed form.

Purposes:
1. correctness cross-check of the star fast path on arbitrary graphs (the
   star form is specialized; this path works for any batched DAG);
2. the performance *baseline* in bench.py — this is how a DGL-style
   gather/scatter implementation (what the reference runs on CUDA,
   model/model_zoo.py:80-114) maps onto XLA without exploiting structure.

Parameters are shared with the star-path model (identical pytrees), so both
paths are numerically comparable layer by layer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.egobatch import EgoBatch, GroupBatch
from ..models.init import dropout
from ..ops import segment
from .propagation import GAT, GCN, star_slot_positions


def flat_edges(batch: EgoBatch, max_parents: int, expand_factor: int):
    """Traceable edge arrays (src, dst, mask) for the flattened [B*N] node
    space; jnp equivalent of data.egobatch.ego_batch_edges (same slot order:
    gp->anchor, anchor->sib, self-loops)."""
    from ..ops import star as star_ops
    ngp = jnp.asarray(batch.ngp)
    nsib = jnp.asarray(batch.nsib)
    b = ngp.shape[0]
    p, s = max_parents, expand_factor
    n = p + 1 + s

    gp_slots = jnp.arange(p, dtype=jnp.int32)
    sib_slots = jnp.arange(s, dtype=jnp.int32) + p + 1
    all_slots = jnp.arange(n, dtype=jnp.int32)
    src_row = jnp.concatenate(
        [gp_slots, jnp.full((s,), p, jnp.int32), all_slots])
    dst_row = jnp.concatenate(
        [jnp.full((p,), p, jnp.int32), sib_slots, all_slots])

    gp_mask = gp_slots[None, :] < ngp[:, None]
    sib_mask = jnp.arange(s, dtype=jnp.int32)[None, :] < nsib[:, None]
    self_mask = star_ops.node_mask(ngp, nsib, p, n)
    mask = jnp.concatenate([gp_mask, sib_mask, self_mask], axis=1)

    offset = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    src = (src_row[None, :] + offset).reshape(-1)
    dst = (dst_row[None, :] + offset).reshape(-1)
    return src, dst, mask.reshape(-1)


def gat_layer_segment(params, h, src, dst, edge_mask, num_nodes, *,
                      num_heads: int, feat_drop: float, attn_drop: float,
                      rng, train: bool, leaky_alpha: float = 0.2):
    """GATLayer over flat edges: SDDMM -> edge_softmax -> SpMM
    (model_zoo.py:80-114 semantics)."""
    k_feat, k_attn = jax.random.split(rng)
    if feat_drop:
        h = dropout(k_feat, h, feat_drop, train)
    ft = (h @ params["fc"]).reshape(num_nodes, num_heads, -1)
    a1 = (ft * params["attn_l"]).sum(-1)
    a2 = (ft * params["attn_r"]).sum(-1)
    logits = segment.sddmm(a1, a2, src, dst)
    logits = jnp.where(logits >= 0, logits, leaky_alpha * logits)
    attn = segment.edge_softmax(logits, dst, num_nodes, edge_mask)
    if train and attn_drop:
        attn = dropout(k_attn, attn, attn_drop, train)
    return segment.spmm(ft, src, dst, num_nodes,
                        edge_weight=attn[..., None], mask=edge_mask)


def gcn_layer_segment(params, h, norm, src, dst, edge_mask, num_nodes, *,
                      activation, drop_rate: float, rng, train: bool):
    if drop_rate:
        h = dropout(rng, h, drop_rate, train)
    h = (h @ params["w"]) * norm
    h = segment.spmm(h, src, dst, num_nodes, mask=edge_mask)
    h = h * norm
    if "b" in params:
        h = h + params["b"]
    return activation(h) if activation is not None else h


def encode_segment(model, params, feats_flat, src, dst, edge_mask, node_mask,
                   graph_ids, num_graphs, slot_pos_flat, *, rng, train: bool):
    """propagate + readout over flat arrays; mirrors TaxoExpan.encode."""
    prop = model.propagate
    p = params["propagate"]
    num_nodes = feats_flat.shape[0]
    h = feats_flat

    def with_pos(x, i):
        if not prop.pos_dim:
            return x
        pe = p["pos_emb"][i]["emb"][slot_pos_flat]
        return jnp.concatenate([x, pe], axis=-1)

    if isinstance(prop, GAT):
        keys = jax.random.split(rng, len(prop.layer_specs))
        for l in range(prop.num_layers):
            _, dout, nh, _res = prop.layer_specs[l]
            h = gat_layer_segment(p["layers"][l], with_pos(h, l), src, dst,
                                  edge_mask, num_nodes, num_heads=nh,
                                  feat_drop=prop.feat_drop,
                                  attn_drop=prop.attn_drop, rng=keys[l],
                                  train=train)
            h = prop.activation(h.reshape(num_nodes, -1))
        _, dout, nh, _res = prop.layer_specs[-1]
        h = gat_layer_segment(p["layers"][-1], with_pos(h, prop.num_layers),
                              src, dst, edge_mask, num_nodes, num_heads=nh,
                              feat_drop=prop.feat_drop,
                              attn_drop=prop.attn_drop, rng=keys[-1],
                              train=train)
        h = h.mean(axis=1)
    elif isinstance(prop, GCN):
        deg = segment.in_degrees(dst, num_nodes, edge_mask)
        norm = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                         0.0)[:, None]
        keys = jax.random.split(rng, len(prop.layer_specs))
        for i, (_din, _dout, act, dr) in enumerate(prop.layer_specs):
            h = gcn_layer_segment(p["layers"][i], with_pos(h, i), norm, src,
                                  dst, edge_mask, num_nodes, activation=act,
                                  drop_rate=dr, rng=keys[i], train=train)
    else:
        raise TypeError(f"unsupported propagation {type(prop)}")

    # readout over graph segments
    kind = model.readout.kind
    if kind in ("MR", "SUM", "MAX"):
        op = {"MR": "mean", "SUM": "sum", "MAX": "max"}[kind]
        return segment.segment_readout(h, graph_ids, num_graphs,
                                       node_mask=node_mask, op=op)
    if kind == "WMR":
        w = jax.nn.softplus(params["readout"]["emb"])[:, 0]
        weight = w[slot_pos_flat][:, None]
        return segment.segment_readout(h, graph_ids, num_graphs,
                                       node_mask=node_mask, weight=weight,
                                       op="mean")
    if kind == "CR":
        outs = []
        for c in range(3):
            sel = node_mask & (slot_pos_flat == c)
            outs.append(segment.segment_readout(
                h, graph_ids, num_graphs, node_mask=sel, op="sum"))
        ones = jnp.ones(h.shape[:1], h.dtype)
        counts = segment.masked_segment_sum(ones, graph_ids, num_graphs,
                                            node_mask)
        counts = jnp.maximum(counts, 1.0)[:, None]
        return jnp.concatenate([o / counts for o in outs], axis=1)
    raise ValueError(kind)


def forward_generic(model, params, batch: GroupBatch, feature_table, *,
                    rng, train: bool):
    """Full forward (scores [G, C]) via the generic path."""
    from ..ops import star as star_ops
    g, c = batch.labels.shape
    ego = batch.ego
    b, n = ego.node_ids.shape
    src, dst, edge_mask = flat_edges(ego, model.max_parents,
                                     model.expand_factor)
    node_mask = star_ops.node_mask(jnp.asarray(ego.ngp),
                                   jnp.asarray(ego.nsib),
                                   model.max_parents, n).reshape(-1)
    feats = feature_table[jnp.asarray(ego.node_ids)]
    feats = (feats * node_mask.reshape(b, n)[..., None]).reshape(b * n, -1)
    slot_pos = jnp.asarray(
        np.tile(star_slot_positions(model.max_parents, n), b))
    graph_ids = jnp.repeat(jnp.arange(b), n)
    hg = encode_segment(model, params, feats, src, dst, edge_mask, node_mask,
                        graph_ids, b, slot_pos, rng=rng, train=train)
    if batch.query_feats is not None:
        qf = jnp.asarray(batch.query_feats)
    else:
        qf = feature_table[jnp.asarray(batch.query_ids)]
    qf_per_ego = jnp.repeat(qf, c, axis=0)
    scores = model.match(params, hg, qf_per_ego)
    return scores.reshape(g, c)
