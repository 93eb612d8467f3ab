"""Closed-form dense message passing over batched *star* ego-networks.

Every TaxoExpan egonet is a depth-1 star with self-loops
(data_loader/dataset.py:431-435): grandparents -> anchor, anchor -> siblings,
self-loop on every node. With the fixed slot layout of
`taxoexpan_tpu.data.egobatch` ([0,P) grandparents | P anchor | (P,N) siblings),
the incoming-edge sets of every node are known in closed form:

    gp_i    <- {gp_i}
    anchor  <- {anchor} ∪ {gp_i : i < ngp}
    sib_j   <- {sib_j, anchor}

so SpMM, SDDMM, and edge_softmax all collapse into dense masked reductions
over [B, N, ...] arrays: no gathers, no scatters, no segment ids. XLA fuses
these into the surrounding matmuls; this is the performance path on TPU.
`tests/test_parity.py` verifies it against both the generic segment kernels
(ops/segment.py) and a numpy DGL-semantics oracle.

All functions take `ngp`/`nsib` count vectors plus the static slot split P
(anchor slot index). Invalid (padded) slots are zeroed on output.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _gp_mask(ngp: jax.Array, p: int) -> jax.Array:
    """[B, P] True where a grandparent slot is valid."""
    return jnp.arange(p, dtype=jnp.int32)[None, :] < ngp[:, None]


def _sib_mask(nsib: jax.Array, s: int) -> jax.Array:
    return jnp.arange(s, dtype=jnp.int32)[None, :] < nsib[:, None]


def node_mask(ngp: jax.Array, nsib: jax.Array, p: int, n: int) -> jax.Array:
    """[B, N] validity mask over all slots."""
    s = n - p - 1
    anchor = jnp.ones((ngp.shape[0], 1), dtype=bool)
    return jnp.concatenate([_gp_mask(ngp, p), anchor, _sib_mask(nsib, s)], axis=1)


def in_degrees(ngp: jax.Array, nsib: jax.Array, p: int, n: int) -> jax.Array:
    """[B, N] in-degree (self-loops included): gp=1, anchor=1+ngp, sib=2.

    Closed form of g.in_degrees() (model/model_zoo.py:130,157) on the star.
    """
    b = ngp.shape[0]
    s = n - p - 1
    deg_gp = jnp.ones((b, p), dtype=jnp.float32)
    deg_anchor = (1.0 + ngp.astype(jnp.float32))[:, None]
    deg_sib = jnp.full((b, s), 2.0, dtype=jnp.float32)
    deg = jnp.concatenate([deg_gp, deg_anchor, deg_sib], axis=1)
    return deg * node_mask(ngp, nsib, p, n)


def copy_src_sum(x: jax.Array, ngp: jax.Array, nsib: jax.Array, p: int
                 ) -> jax.Array:
    """out[d] = sum over in-edges (s,d) of x[s] — the star SpMM
    (update_all(copy_src, sum), model/model_zoo.py:41).

    x: [B, N, D]. Invalid source slots contribute 0; invalid dst slots are
    zeroed by the caller's mask if needed.
    """
    gp = x[:, :p]
    anchor = x[:, p]
    sib = x[:, p + 1:]
    gp_valid = jnp.where(_gp_mask(ngp, p)[..., None], gp, 0.0)
    out_anchor = anchor + gp_valid.sum(axis=1)
    out_sib = sib + anchor[:, None, :]
    return jnp.concatenate([gp, out_anchor[:, None], out_sib], axis=1)


def gat_attention_aggregate(ft: jax.Array, a1: jax.Array, a2: jax.Array,
                            ngp: jax.Array, nsib: jax.Array, p: int,
                            leaky_alpha: float = 0.2,
                            attn_drop: float = 0.0,
                            rng: jax.Array | None = None,
                            mask_output: bool = True) -> jax.Array:
    """Fused SDDMM + edge_softmax + SpMM for multi-head GAT on the star.

    Computes, per destination node, softmax over its in-edges of
    leaky_relu(a1[src] + a2[dst]) and aggregates src features — exactly
    GATLayer steps 1-3 (model/model_zoo.py:89-95,106-114), including attention
    dropout applied AFTER the softmax (edge_softmax + attn_drop,
    model/model_zoo.py:111-114; note single-edge destinations like grandparent
    self-loops still get dropout on their attention value of 1.0).

    ft: [B, N, H, Dh], a1/a2: [B, N, H]. Returns [B, N, H, Dh].
    """
    b, n, h = a1.shape
    s = n - p - 1
    leaky = lambda v: jnp.where(v >= 0, v, leaky_alpha * v)

    # --- anchor destination: sources = grandparents + self -------------------
    logits_gp = leaky(a1[:, :p] + a2[:, p][:, None, :])          # [B, P, H]
    logit_self = leaky(a1[:, p] + a2[:, p])[:, None, :]          # [B, 1, H]
    logits_anchor = jnp.concatenate([logits_gp, logit_self], axis=1)
    src_valid = jnp.concatenate(
        [_gp_mask(ngp, p), jnp.ones((b, 1), dtype=bool)], axis=1)  # [B, P+1]
    logits_anchor = jnp.where(src_valid[..., None], logits_anchor, NEG_INF)
    attn_anchor = jax.nn.softmax(logits_anchor, axis=1)          # [B, P+1, H]

    # --- sibling destinations: sources = (anchor, self) ----------------------
    logits_from_anchor = leaky(a1[:, p][:, None, :] + a2[:, p + 1:])   # [B, S, H]
    logits_sib_self = leaky(a1[:, p + 1:] + a2[:, p + 1:])             # [B, S, H]
    logits_sib = jnp.stack([logits_from_anchor, logits_sib_self], axis=2)
    attn_sib = jax.nn.softmax(logits_sib, axis=2)                # [B, S, 2, H]

    # --- grandparent destinations: self-loop only -> attention 1 -------------
    attn_gp = jnp.ones((b, p, h), dtype=ft.dtype)

    if attn_drop > 0.0:
        if rng is None:
            raise ValueError("attn_drop > 0 requires an rng key")
        k1, k2, k3 = jax.random.split(rng, 3)
        scale = 1.0 / (1.0 - attn_drop)
        keep = lambda k, x: x * jax.random.bernoulli(
            k, 1.0 - attn_drop, x.shape).astype(x.dtype) * scale
        attn_anchor = keep(k1, attn_anchor)
        attn_sib = keep(k2, attn_sib)
        attn_gp = keep(k3, attn_gp)

    # aggregate in ft's dtype (bf16 mixed-precision path keeps the softmax
    # in f32 above, then reads/writes the big tensors at half width)
    attn_anchor = attn_anchor.astype(ft.dtype)
    attn_sib = attn_sib.astype(ft.dtype)
    attn_gp = attn_gp.astype(ft.dtype)

    # HBM-traffic-minimal aggregation: the [B, N, H, Dh] ft tensor dominates
    # bandwidth (e.g. 2.1 GB for the MAG-CS bench shape), so each slot block
    # is read exactly once and nothing concatenates full-ft copies:
    # - gp rows:    one elementwise pass over ft[:, :p]
    # - anchor row: small einsum over the p gp slots + self term
    # - sib rows:   one pass over ft[:, p+1:] + broadcast anchor term
    out_anchor = (jnp.einsum("bph,bphd->bhd", attn_anchor[:, :p], ft[:, :p]) +
                  attn_anchor[:, p][..., None] * ft[:, p])
    out_sib = (attn_sib[:, :, 0, :, None] * ft[:, p][:, None] +
               attn_sib[:, :, 1, :, None] * ft[:, p + 1:])
    out_gp = attn_gp[..., None] * ft[:, :p]
    out = jnp.concatenate([out_gp, out_anchor[:, None], out_sib], axis=1)
    if mask_output:
        # invalid slots never leak into valid outputs (their only out-edges
        # are self-loops), so the model path skips this cleanup pass
        out = out * node_mask(ngp, nsib, p, n)[..., None, None]
    return out


def readout(h: jax.Array, ngp: jax.Array, nsib: jax.Array, p: int,
            kind: str = "MR",
            position_weights: jax.Array | None = None) -> jax.Array:
    """Per-egonet pooling over valid slots; h: [B, N, D] -> [B, D'].

    DGL readout semantics: weighted features are SUMMED then divided by the
    node COUNT of each graph (see ops/segment.py:segment_readout):
    - MR  (model/model_zoo.py:227-232): mean over nodes
    - WMR (model/model_zoo.py:234-242): softplus(position_weights[pos]) weights
    - CR  (model/model_zoo.py:244-258): concat of per-position-class sums / N
    """
    b, n, _ = h.shape
    mask = node_mask(ngp, nsib, p, n)[..., None].astype(h.dtype)   # [B, N, 1]
    counts = (ngp + 1 + nsib).astype(h.dtype)[:, None]             # [B, 1]
    hm = h * mask
    if kind == "MR":
        return hm.sum(axis=1) / counts
    if kind == "WMR":
        if position_weights is None:
            raise ValueError("WMR needs position_weights [3, 1]")
        w = jax.nn.softplus(position_weights)[:, 0]                # [3]
        slot_w = jnp.concatenate([
            jnp.full((p,), w[0]), w[1][None], jnp.full((n - p - 1,), w[2])])
        return (hm * slot_w[None, :, None]).sum(axis=1) / counts
    if kind == "CR":
        gp = hm[:, :p].sum(axis=1) / counts
        anchor = hm[:, p] / counts
        sib = hm[:, p + 1:].sum(axis=1) / counts
        return jnp.concatenate([gp, anchor, sib], axis=1)
    if kind == "SUM":
        return hm.sum(axis=1)
    if kind == "MAX":
        neg = jnp.where(mask.astype(bool), h, NEG_INF)
        return neg.max(axis=1)
    raise ValueError(f"unknown readout kind {kind!r}")


def raw_star_channel(feats: jax.Array, ngp: jax.Array, nsib: jax.Array,
                     p: int) -> jax.Array:
    """Unit-normalized mean of the anchor + sibling slots; [B, N, D] -> [B, D].

    The raw-feature channel of the composite model (models/taxoexpan.py,
    `raw_channel=True`): the query-independent half of the structure
    heuristic's winning score. `simple_structure --agg sum --beta 0`
    (baselines/simple_structure.py:68-69, re-deriving the reference's
    baselines/simple_structure.py:59-63) ranks candidates by

        (1/(1+n_sib)) * [ (1 - q_hat . a_hat) + sum_j (1 - q_hat . s_hat_j) ]
        = 1 - q_hat . mean({a_hat} u {s_hat_j})

    so within one query's ranking it is EXACTLY a dot product against this
    channel (the query's own norm is a positive per-query constant). A
    bilinear matcher over the concatenated [learned summary | raw channel]
    can therefore represent that heuristic with W proportional to an identity
    block — and learn how to blend it with the propagated evidence. Computed
    in f32 regardless of the compute dtype (it is one normalize + masked mean,
    bandwidth-trivial next to propagation).

    Padded slots arrive zeroed (gather_feats / egobatch masking); their norms
    clamp to eps and the sibling mask removes them from the mean.
    """
    b, n, _ = feats.shape
    x = feats.astype(jnp.float32)
    unit = x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    smask = _sib_mask(nsib, n - p - 1).astype(jnp.float32)         # [B, S]
    total = unit[:, p] + (unit[:, p + 1:] * smask[..., None]).sum(axis=1)
    counts = (1.0 + nsib.astype(jnp.float32))[:, None]             # [B, 1]
    return total / counts


def readout_attention(h: jax.Array, ngp: jax.Array, nsib: jax.Array, p: int,
                      gate_params: dict) -> jax.Array:
    """PATR: position-aware global-attention readout, h [B, N, D] -> [B, D].

    Reconstruction of the reference's retired attention readout (the current
    code keeps only the intent marker `TODO: try GlobalAttentionPooling`,
    model/model_zoo.py:225, plus the PGAT_PATR_* arch names in the 2019
    config_files). Gate logits condition on BOTH the node embedding and its
    position class (grandparent / anchor / sibling):

        z_i = w2 . tanh(h_i @ w1 + b1 + class_emb[class(i)])
        out = sum_i softmax_over_valid(z)_i * h_i
    """
    b, n, _ = h.shape
    w1, b1 = gate_params["w1"], gate_params["b1"]
    cls_emb = gate_params["class_emb"]                        # [3, A]
    w2 = gate_params["w2"]                                    # [A, 1]
    s = n - p - 1
    slot_class = jnp.concatenate([
        jnp.zeros((p,), jnp.int32), jnp.ones((1,), jnp.int32),
        jnp.full((s,), 2, jnp.int32)])
    gate_in = jnp.tanh(h @ w1 + b1 + cls_emb[slot_class][None])
    logits = (gate_in @ w2)[..., 0]                           # [B, N]
    valid = node_mask(ngp, nsib, p, n).astype(bool)
    logits = jnp.where(valid, logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=1)
    return jnp.einsum("bn,bnd->bd", attn, h)


def readout_from_pools(pools: jax.Array, ngp: jax.Array, nsib: jax.Array,
                       kind: str = "MR",
                       position_weights: jax.Array | None = None) -> jax.Array:
    """Readout from per-position-class pooled sums [B, 3, D] (class order:
    grandparents, anchor, siblings; already validity-masked and
    head-averaged) — the output of the fused Pallas final layer
    (ops/pallas_gat.py:fused_gat_layer_pooled). Same results as `readout`
    on the per-slot tensor for every kind except MAX (which is not a linear
    pool and keeps the per-slot path)."""
    counts = (ngp + 1 + nsib).astype(pools.dtype)[:, None]          # [B, 1]
    if kind == "MR":
        return pools.sum(axis=1) / counts
    if kind == "WMR":
        if position_weights is None:
            raise ValueError("WMR needs position_weights [3, 1]")
        w = jax.nn.softplus(position_weights)[:, 0]                  # [3]
        return jnp.einsum("bcd,c->bd", pools, w) / counts
    if kind == "CR":
        return jnp.concatenate(
            [pools[:, 0], pools[:, 1], pools[:, 2]], axis=1) / counts
    if kind == "SUM":
        return pools.sum(axis=1)
    raise ValueError(f"unsupported pooled readout kind {kind!r}")
