"""Fused Pallas TPU kernel for one star-GAT layer: x @ W + attention +
aggregation in a single VMEM-resident pass.

Why: the XLA star path materializes the [B, N, H, Dh] `ft` tensor in HBM and
re-reads it for attention/aggregation — for the MAG-CS bench shape that is
~2 GB per pass and the layer is bandwidth-bound (see bench.py). This kernel
tiles the egonet batch, keeps each tile's `ft` in VMEM, and writes only the
aggregated output: HBM traffic drops to (read x + write out).

Semantics are exactly model_zoo.py:80-114 / ops/star.py:
    ft = x @ W;  a1 = x @ (W·attn_l);  a2 = x @ (W·attn_r)
    per-destination softmax over leaky_relu(a1[src] + a2[dst]) on the star
    (gp -> anchor, anchor -> sib, self-loops), attention dropout AFTER the
    softmax, then weighted source aggregation.

Custom VJP: the backward pass is also a Pallas kernel; it recomputes ft /
attention for its tile (rematerialization — trades one extra tile matmul for
never storing ft) and reproduces identical dropout bits by replaying the same
per-tile PRNG stream. dW/dwa accumulations ride the sequential TPU grid
(every step adds into the same revisited output block).

Mosaic notes (learned the hard way): no gathers, no lane-dimension
concatenates of narrow vectors — everything is expressed as static slices,
slice stores, and 2-D masks; softmax groups are kept as separate gp/self
parts instead of concatenated vectors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _gen_masks(seed, tile_idx, tb, n, din, p, s, h_heads, feat_drop,
               attn_drop, interpret, pos_dim=0):
    """Deterministic per-tile dropout masks, identical in fwd and bwd.

    Generation ORDER is part of the contract: the input-feature mask
    [TB*N, Din] first (when feat_drop > 0), then the position-embedding
    column mask [TB*N, pos_dim] (when pos_dim > 0 — the pe-dropout path,
    see fused_gat_layer's pe_pack), then per head the attention masks
    gp->anchor [TB, P], anchor self [TB, 1], sib-from-anchor [TB, S],
    sib-self [TB, S], gp self-loops [TB, P].

    Compiled TPU kernels use the on-chip PRNG (pltpu.prng_*); interpret mode
    (CPU) falls back to jax.random — bits differ across platforms but the
    fwd/bwd replay is identical within a platform, which is all dropout needs.
    """
    if feat_drop <= 0.0 and attn_drop <= 0.0:
        return None, None, None

    if interpret:
        state = {"key": jax.random.PRNGKey(seed + tile_idx), "i": 0}

        def mask(shape, rate):
            state["i"] += 1
            k = jax.random.fold_in(state["key"], state["i"])
            keep = jax.random.bernoulli(k, 1.0 - rate, shape)
            return keep.astype(jnp.float32) / (1.0 - rate)
    else:
        import os
        pltpu.prng_seed(seed + tile_idx)
        u8 = os.environ.get("TAXOEXPAN_DROPOUT_BITS", "32") == "8"

        def mask(shape, rate):
            # TAXOEXPAN_DROPOUT_BITS=8 (opt-in, measured lever): draw 4x
            # fewer random words and unpack them to uint8 thresholds via
            # sublane bitcast ([rows//4, cols] u32 -> [rows, cols] u8).
            # The keep probability quantizes to t/256 and the 256/t scale
            # keeps the mask UNBIASED — rate deviation < 1/256 (e.g. 0.9
            # -> 0.8984). The round-4 hardware run settled this lever:
            # PRNG *generation* is NOT the dominant share of the 3.8 ms/
            # step dropout cost — shrinking the word count 4x saved only
            # 0.16 ms at the bench shape (docs/PERFORMANCE.md r4 table),
            # so 32-bit exact thresholds stay the default and this path
            # remains an opt-in for PRNG-bound shapes only.
            if u8 and shape[0] % 4 == 0:
                t8 = min(max(int((1.0 - rate) * 256.0), 1), 255)
                bits = pltpu.prng_random_bits((shape[0] // 4, shape[1]))
                b8 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32),
                                   jnp.uint8)
                # compare in i32: v5e's VPU has no 8-bit compare (Mosaic:
                # "Target does not support this comparison"); the zero-
                # extend is one supported cast and the PRNG-word saving is
                # what this lever is about
                keep = b8.astype(jnp.int32) < t8
                return keep.astype(jnp.float32) * (256.0 / t8)
            scale = 1.0 / (1.0 - rate)
            thresh = np.uint32(int((1.0 - rate) * 4294967296.0) & 0xFFFFFFFF)
            bits = pltpu.prng_random_bits(shape)
            keep = pltpu.bitcast(bits, jnp.uint32) < thresh
            return keep.astype(jnp.float32) * scale

    feat_mask = mask((tb * n, din), feat_drop) if feat_drop > 0.0 else None
    pe_mask = (mask((tb * n, pos_dim), feat_drop)
               if pos_dim and feat_drop > 0.0 else None)
    attn_masks = None
    if attn_drop > 0.0:
        attn_masks = [
            (mask((tb, p), attn_drop), mask((tb, 1), attn_drop),
             mask((tb, s), attn_drop), mask((tb, s), attn_drop),
             mask((tb, p), attn_drop))
            for _ in range(h_heads)
        ]
    return feat_mask, pe_mask, attn_masks


def _tile_attention(a1, a2, ngp, p, s, alpha, drop_masks, h):
    """Attention for one head on a [TB, N] tile; all arrays stay 2-D and the
    anchor softmax group is kept as separate (gp, self) parts.

    Returns dict with raw softmax parts (sm_*) and post-dropout weights
    (w_*): sm_gp2a/w_gp2a [TB, P], sm_selfa/w_selfa [TB, 1], sm_s0/w_s0 and
    sm_s1/w_s1 [TB, S], w_gp [TB, P], gp_mask [TB, P].
    """
    tb = a1.shape[0]
    gp_mask = jax.lax.broadcasted_iota(jnp.int32, (tb, p), 1) < ngp

    # anchor destination: softmax over {gp_j} ∪ {self} without concatenation
    lg_gp = _leaky(a1[:, :p] + a2[:, p:p + 1], alpha)          # [TB, P]
    lg_self = _leaky(a1[:, p:p + 1] + a2[:, p:p + 1], alpha)   # [TB, 1]
    lg_gp = jnp.where(gp_mask, lg_gp, NEG_INF)
    m = jnp.maximum(jnp.max(lg_gp, axis=1, keepdims=True), lg_self)
    e_gp = jnp.where(gp_mask, jnp.exp(lg_gp - m), 0.0)
    e_self = jnp.exp(lg_self - m)
    den = jnp.sum(e_gp, axis=1, keepdims=True) + e_self
    sm_gp2a = e_gp / den
    sm_selfa = e_self / den

    # sibling destinations: 2-way softmax (anchor, self)
    l0 = _leaky(a1[:, p:p + 1] + a2[:, p + 1:], alpha)         # [TB, S]
    l1 = _leaky(a1[:, p + 1:] + a2[:, p + 1:], alpha)
    m2 = jnp.maximum(l0, l1)
    e0 = jnp.exp(l0 - m2)
    e1 = jnp.exp(l1 - m2)
    den2 = e0 + e1
    sm_s0 = e0 / den2
    sm_s1 = e1 / den2

    w_gp = jnp.ones((tb, p), jnp.float32)
    if drop_masks is not None:
        d_gp2a, d_selfa, d_s0, d_s1, d_gp = drop_masks[h]
        w_gp2a = sm_gp2a * d_gp2a
        w_selfa = sm_selfa * d_selfa
        w_s0 = sm_s0 * d_s0
        w_s1 = sm_s1 * d_s1
        w_gp = w_gp * d_gp
    else:
        w_gp2a, w_selfa, w_s0, w_s1 = sm_gp2a, sm_selfa, sm_s0, sm_s1
    return dict(sm_gp2a=sm_gp2a, sm_selfa=sm_selfa, sm_s0=sm_s0, sm_s1=sm_s1,
                w_gp2a=w_gp2a, w_selfa=w_selfa, w_s0=w_s0, w_s1=w_s1,
                w_gp=w_gp, gp_mask=gp_mask)


def _fake_attention_for_timing(tb, p, s, ngp):
    """TAXOEXPAN_BWD_FAKE_ATTN=1 — MEASUREMENT-ONLY (wrong grads): stand-in
    constants with the exact shapes `_tile_attention` produces, used to
    bound what the attn_drop=0 store-instead-of-recompute backward lever
    (docs/ROADMAP.md) could save: the delta of a bench run with this flag
    vs without is an UPPER bound (a real implementation additionally pays
    the HBM read of the stored [B, ~2N]-per-head weights)."""
    gp_mask = jax.lax.broadcasted_iota(jnp.int32, (tb, p), 1) < ngp
    c = lambda sh, v: jnp.full(sh, v, jnp.float32)  # noqa: E731
    return dict(sm_gp2a=c((tb, p), 0.25), sm_selfa=c((tb, 1), 0.25),
                sm_s0=c((tb, s), 0.5), sm_s1=c((tb, s), 0.5),
                w_gp2a=c((tb, p), 0.25), w_selfa=c((tb, 1), 0.25),
                w_s0=c((tb, s), 0.5), w_s1=c((tb, s), 0.5),
                w_gp=c((tb, p), 1.0), gp_mask=gp_mask)


def _bwd_attention(a1h, a2h, ngp, p, s, alpha, drop_masks, h, tb):
    """Backward-pass attention RECOMPUTE (the fallback when no stored
    weights are available), or the timing stand-in when
    TAXOEXPAN_BWD_FAKE_ATTN=1 (see above)."""
    import os
    if os.environ.get("TAXOEXPAN_BWD_FAKE_ATTN") == "1":
        return _fake_attention_for_timing(tb, p, s, ngp)
    return _tile_attention(a1h, a2h, ngp, p, s, alpha, drop_masks, h)


# -------------------------------------------- stored-attention fwd residuals
#
# MEASURED AND REJECTED as the default (round 4, real v5e, scan timing):
# the TAXOEXPAN_BWD_FAKE_ATTN probe suggested the backward's softmax
# recompute costs ~2.8 ms/step (40.10 -> 37.34 at attn_drop=0), so this
# path stores the forward's raw softmax weights ([B, H*K_pad] f32, 128-
# lane-aligned segments) and reloads them in the backward. On hardware it
# is SLOWER than the recompute in both regimes:
#     attn_drop=0.1:  41.50 ms (recompute) -> 45.97 packed / 46.08 aligned
#     attn_drop=0.0:  40.10 ms (recompute) -> 43.61 aligned
# i.e. the fake-attn delta was dependency-chain relief (constants let
# Mosaic schedule dft immediately), not softmax arithmetic — replacing the
# recompute with HBM loads re-introduces the dependency plus DMA waits.
# Kept as an opt-in (TAXOEXPAN_STORED_ATTN=1) because it is semantically
# exact (grads bit-identical, tests/test_pallas_gat.py) and other
# shapes/hardware may land differently; see docs/PERFORMANCE.md round 4.

def _use_stored_attn() -> bool:
    import os
    return os.environ.get("TAXOEXPAN_STORED_ATTN", "0") == "1"


def _attn_segments(p: int, s: int):
    """128-lane-ALIGNED segment offsets of the four stored arrays within a
    head's row: every slice starts on a lane-tile boundary (a store/load at
    an interior lane offset like base+P forces Mosaic into lane
    shuffle/read-modify-write sequences — the first, packed layout measured
    4.5 ms SLOWER than the recompute it replaced)."""
    seg_gp = -(-p // 128) * 128
    seg_self = 128
    seg_s = -(-s // 128) * 128
    offs = (0, seg_gp, seg_gp + seg_self, seg_gp + seg_self + seg_s)
    return offs, seg_gp + seg_self + 2 * seg_s


def _attn_k_pad(p: int, s: int) -> int:
    """Per-head stride of the stored-attention row (aligned segments)."""
    return _attn_segments(p, s)[1]


def _store_attn(attn_ref, at, h, k_pad, p, s):
    (o_gp, o_self, o_s0, o_s1), _ = _attn_segments(p, s)
    base = h * k_pad
    attn_ref[:, base + o_gp:base + o_gp + p] = at["sm_gp2a"]
    attn_ref[:, base + o_self:base + o_self + 1] = at["sm_selfa"]
    attn_ref[:, base + o_s0:base + o_s0 + s] = at["sm_s0"]
    attn_ref[:, base + o_s1:base + o_s1 + s] = at["sm_s1"]


def _attn_from_stored(attn_ref, h, k_pad, tb, p, s, ngp, drop_masks):
    """Rebuild `_tile_attention`'s output dict from the stored forward
    softmax weights + the replayed dropout masks — bit-identical to the
    recompute (the stored values ARE the forward's)."""
    (o_gp, o_self, o_s0, o_s1), _ = _attn_segments(p, s)
    base = h * k_pad
    sm_gp2a = attn_ref[:, base + o_gp:base + o_gp + p]
    sm_selfa = attn_ref[:, base + o_self:base + o_self + 1]
    sm_s0 = attn_ref[:, base + o_s0:base + o_s0 + s]
    sm_s1 = attn_ref[:, base + o_s1:base + o_s1 + s]
    gp_mask = jax.lax.broadcasted_iota(jnp.int32, (tb, p), 1) < ngp
    w_gp = jnp.ones((tb, p), jnp.float32)
    if drop_masks is not None:
        d_gp2a, d_selfa, d_s0, d_s1, d_gp = drop_masks[h]
        w_gp2a = sm_gp2a * d_gp2a
        w_selfa = sm_selfa * d_selfa
        w_s0 = sm_s0 * d_s0
        w_s1 = sm_s1 * d_s1
        w_gp = w_gp * d_gp
    else:
        w_gp2a, w_selfa, w_s0, w_s1 = sm_gp2a, sm_selfa, sm_s0, sm_s1
    return dict(sm_gp2a=sm_gp2a, sm_selfa=sm_selfa, sm_s0=sm_s0,
                sm_s1=sm_s1, w_gp2a=w_gp2a, w_selfa=w_selfa, w_s0=w_s0,
                w_s1=w_s1, w_gp=w_gp, gp_mask=gp_mask)


def _common_prologue(x_ref, w_ref, wa1_ref, wa2_ref, ngp_ref, nsib_ref, tb,
                     n, seed, p, s, heads, feat_drop, attn_drop, interpret,
                     pe_refs=None):
    """pe_refs = (pe_ref [N, pos], wp_ref [pos, H*Dh], wpa1/wpa2_ref
    [pos, H]) or None. When given, the position-embedding columns of the
    reference's concatenated layer input get their own fused dropout mask
    and their (masked) contribution is added to ft/a1/a2 — exact
    model_zoo.py:82 semantics for pos_mode="bias" training. Returns the
    masked pe rows (pe_b [TB*N, pos]) and their mask for the backward."""
    tile = pl.program_id(0)
    din = x_ref.shape[2]
    pos_dim = pe_refs[0].shape[1] if pe_refs is not None else 0
    feat_mask, pe_mask, attn_masks = _gen_masks(
        seed, tile, tb, n, din, p, s, heads, feat_drop, attn_drop, interpret,
        pos_dim=pos_dim)
    x = x_ref[:].reshape(tb * n, din)
    if feat_mask is not None:   # fused input dropout (model_zoo.py:82)
        x = x * feat_mask.astype(x.dtype)
    # ft stays f32 in VMEM: a bf16 ft was measured SLOWER on hardware at
    # equal tile sizes (42.6 vs 41.6 ms/step — the per-head downcast/upcast
    # VPU traffic outweighs the halved footprint; see docs/PERFORMANCE.md
    # round-2 notes), so the tile-size budget keeps 4-byte activations.
    ft = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    a1 = jnp.dot(x, wa1_ref[:], preferred_element_type=jnp.float32)
    a2 = jnp.dot(x, wa2_ref[:], preferred_element_type=jnp.float32)
    pe_b = None
    if pe_refs is not None:
        pe_ref, wp_ref, wpa1_ref, wpa2_ref = pe_refs
        pe_rows = jnp.broadcast_to(pe_ref[:][None], (tb, n, pos_dim))
        pe_b = (pe_mask.reshape(tb, n, pos_dim) * pe_rows).reshape(
            tb * n, pos_dim)
        # contract in the layer dtype (pe_b/wp are f32 residents; a mixed
        # dot would promote to a full-f32 matmul — see _bwd_epilogue note)
        pe_c = pe_b.astype(x.dtype)
        ft = ft + jnp.dot(pe_c, wp_ref[:].astype(x.dtype),
                          preferred_element_type=jnp.float32)
        a1 = a1 + jnp.dot(pe_c, wpa1_ref[:].astype(x.dtype),
                          preferred_element_type=jnp.float32)
        a2 = a2 + jnp.dot(pe_c, wpa2_ref[:].astype(x.dtype),
                          preferred_element_type=jnp.float32)
    row0 = pl.multiple_of(tile * tb, tb)
    ngp = ngp_ref[pl.ds(row0, tb), :]
    nsib = nsib_ref[pl.ds(row0, tb), :]
    return (tile, x, ft, a1, a2, ngp, nsib, feat_mask, attn_masks, pe_b,
            pe_mask)


# ------------------------------------------------------------------- forward

def _fwd_kernel(seed_ref, x_ref, w_ref, wa1_ref, wa2_ref, bft_ref,
                ba1_ref, ba2_ref, ngp_ref, nsib_ref,
                *rest, p, s, heads, dh, alpha, attn_drop, feat_drop,
                out_alpha, interpret, pe_drop=False, save_attn=False):
    if pe_drop:   # (pe, wp, wpa1, wpa2) extra inputs — see fused_gat_layer
        pe_refs = rest[:4]
        rest = rest[4:]
    else:
        pe_refs = None
    if save_attn:   # extra output: stored softmax weights for the backward
        out_ref, attn_ref = rest
    else:
        (out_ref,) = rest
        attn_ref = None
    k_pad = _attn_k_pad(p, s)
    tb = x_ref.shape[0]
    n = p + 1 + s
    (tile, x, ft, a1, a2, ngp, nsib, _feat_mask,
     drop_masks, _pe_b, _pe_mask) = _common_prologue(
        x_ref, w_ref, wa1_ref, wa2_ref, ngp_ref, nsib_ref, tb, n,
        seed_ref[0], p, s, heads, feat_drop, attn_drop, interpret,
        pe_refs=pe_refs)

    for h in range(heads):
        cols_h = slice(h * dh, (h + 1) * dh)
        fth = (ft[:, cols_h].reshape(tb, n, dh) +
               bft_ref[:, cols_h].reshape(1, n, dh))
        a1h = (a1[:, h:h + 1].reshape(tb, n) +
               ba1_ref[:, h:h + 1].reshape(1, n))
        a2h = (a2[:, h:h + 1].reshape(tb, n) +
               ba2_ref[:, h:h + 1].reshape(1, n))
        at = _tile_attention(a1h, a2h, ngp, p, s, alpha, drop_masks, h)
        if attn_ref is not None:
            _store_attn(attn_ref, at, h, k_pad, p, s)
        ft_gp = fth[:, :p]                                     # [TB, P, Dh]
        ft_anchor = fth[:, p:p + 1]                            # [TB, 1, Dh]
        ft_sib = fth[:, p + 1:]                                # [TB, S, Dh]
        out_anchor = (
            jnp.sum(jnp.expand_dims(at["w_gp2a"], 2) * ft_gp, axis=1,
                    keepdims=True) +
            jnp.expand_dims(at["w_selfa"], 2) * ft_anchor)     # [TB, 1, Dh]
        out_sib = (jnp.expand_dims(at["w_s0"], 2) * ft_anchor +
                   jnp.expand_dims(at["w_s1"], 2) * ft_sib)
        out_gp = jnp.expand_dims(at["w_gp"], 2) * ft_gp
        if out_alpha is not None:   # fused inter-layer activation
            out_gp = _leaky(out_gp, out_alpha)
            out_anchor = _leaky(out_anchor, out_alpha)
            out_sib = _leaky(out_sib, out_alpha)
        # slice stores — no slot-dim concatenation
        cols = slice(h * dh, (h + 1) * dh)
        out_ref[:, 0:p, cols] = out_gp.astype(out_ref.dtype)
        out_ref[:, p:p + 1, cols] = out_anchor.astype(out_ref.dtype)
        out_ref[:, p + 1:n, cols] = out_sib.astype(out_ref.dtype)


# ------------------------------------------------ forward, pooled (readout)

def _fwd_pool_kernel(seed_ref, x_ref, w_ref, wa1_ref, wa2_ref, bft_ref,
                     ba1_ref, ba2_ref, ngp_ref, nsib_ref,
                     *rest, p, s, heads, dh, alpha, attn_drop, feat_drop,
                     interpret, pe_drop=False, save_attn=False):
    """Final-layer variant that fuses the head mean + per-position-class
    readout pools: instead of the [TB, N, H*Dh] slot outputs it writes
    pools [TB, 3, Dh] = (sum over valid gp slots, anchor, sum over valid
    sibling slots) of the head-averaged aggregation — the input of every
    readout kind except MAX (ops/star.py:readout_from_pools). Saves the
    [B, N, H*Dh] HBM round-trip of the final layer + XLA readout pass."""
    if pe_drop:
        pe_refs = rest[:4]
        rest = rest[4:]
    else:
        pe_refs = None
    if save_attn:
        out_ref, attn_ref = rest
    else:
        (out_ref,) = rest
        attn_ref = None
    k_pad = _attn_k_pad(p, s)
    tb = x_ref.shape[0]
    n = p + 1 + s
    (tile, x, ft, a1, a2, ngp, nsib, _feat_mask,
     drop_masks, _pe_b, _pe_mask) = _common_prologue(
        x_ref, w_ref, wa1_ref, wa2_ref, ngp_ref, nsib_ref, tb, n,
        seed_ref[0], p, s, heads, feat_drop, attn_drop, interpret,
        pe_refs=pe_refs)
    sib_mask = jax.lax.broadcasted_iota(jnp.int32, (tb, s), 1) < nsib

    pool_gp = jnp.zeros((tb, dh), jnp.float32)
    pool_anchor = jnp.zeros((tb, dh), jnp.float32)
    pool_sib = jnp.zeros((tb, dh), jnp.float32)
    for h in range(heads):
        cols_h = slice(h * dh, (h + 1) * dh)
        fth = (ft[:, cols_h].reshape(tb, n, dh).astype(jnp.float32) +
               bft_ref[:, cols_h].reshape(1, n, dh))
        a1h = (a1[:, h:h + 1].reshape(tb, n) +
               ba1_ref[:, h:h + 1].reshape(1, n))
        a2h = (a2[:, h:h + 1].reshape(tb, n) +
               ba2_ref[:, h:h + 1].reshape(1, n))
        at = _tile_attention(a1h, a2h, ngp, p, s, alpha, drop_masks, h)
        if attn_ref is not None:
            _store_attn(attn_ref, at, h, k_pad, p, s)
        ft_gp = fth[:, :p]
        ft_anchor = fth[:, p:p + 1]
        ft_sib = fth[:, p + 1:]
        out_anchor = (
            jnp.sum(jnp.expand_dims(at["w_gp2a"], 2) * ft_gp, axis=1) +
            at["w_selfa"] * ft_anchor[:, 0])                   # [TB, Dh]
        out_sib = (jnp.expand_dims(at["w_s0"], 2) * ft_anchor +
                   jnp.expand_dims(at["w_s1"], 2) * ft_sib)    # [TB, S, Dh]
        out_gp = jnp.expand_dims(at["w_gp"], 2) * ft_gp        # [TB, P, Dh]
        # validity masks: padded slots carry the slot bias -> must be zeroed
        # here (the per-slot kernel leaves them to the XLA readout's mask).
        # f32 multiplies, NOT where(expand_dims(bool)): Mosaic rejects
        # minor-dim inserts on i1 vectors (only 32-bit types supported)
        gp_f = at["gp_mask"].astype(jnp.float32)
        sib_f = sib_mask.astype(jnp.float32)
        pool_gp += jnp.sum(out_gp * jnp.expand_dims(gp_f, 2), axis=1)
        pool_anchor += out_anchor
        pool_sib += jnp.sum(out_sib * jnp.expand_dims(sib_f, 2), axis=1)
    inv_h = 1.0 / heads   # mean over heads (model_zoo.py:189)
    out_ref[:, 0, :] = (pool_gp * inv_h).astype(out_ref.dtype)
    out_ref[:, 1, :] = (pool_anchor * inv_h).astype(out_ref.dtype)
    out_ref[:, 2, :] = (pool_sib * inv_h).astype(out_ref.dtype)


# ------------------------------------------------------------------ backward

def _bwd_head_core(at, a1h, a2h, ft_gp, ft_anchor, ft_sib, g_gp, g_anchor,
                   g_sib, drop_masks, h, p, s, n, tb, dh, alpha,
                   dft_buf, da1_buf, da2_buf):
    """Shared per-head backward body: incoming per-slot grads (g_gp [TB,P,Dh],
    g_anchor [TB,1,Dh], g_sib [TB,S,Dh]) -> dft / da1 / da2 buffer writes."""
    # ---- dft (mirror of the aggregation, transposed) -------------------
    dft_gp = (jnp.expand_dims(at["w_gp"], 2) * g_gp +
              jnp.expand_dims(at["w_gp2a"], 2) * g_anchor)
    dft_anchor = (jnp.expand_dims(at["w_selfa"], 2) * g_anchor +
                  jnp.sum(jnp.expand_dims(at["w_s0"], 2) * g_sib,
                          axis=1, keepdims=True))
    dft_sib = jnp.expand_dims(at["w_s1"], 2) * g_sib
    cols = slice(h * dh, (h + 1) * dh)
    dft_buf[:, 0:p, cols] = dft_gp
    dft_buf[:, p:p + 1, cols] = dft_anchor
    dft_buf[:, p + 1:n, cols] = dft_sib

    # ---- attention-weight grads ---------------------------------------
    dattn_gp2a = jnp.sum(g_anchor * ft_gp, axis=2)         # [TB, P]
    dattn_selfa = jnp.sum(g_anchor * ft_anchor, axis=2)    # [TB, 1]
    dattn_s0 = jnp.sum(g_sib * ft_anchor, axis=2)          # [TB, S]
    dattn_s1 = jnp.sum(g_sib * ft_sib, axis=2)
    # gp self-loop attention is a (dropped) constant -> no logit grads

    if drop_masks is not None:   # chain through the dropout masks
        d_gp2a, d_selfa, d_s0, d_s1, _ = drop_masks[h]
        dattn_gp2a = dattn_gp2a * d_gp2a
        dattn_selfa = dattn_selfa * d_selfa
        dattn_s0 = dattn_s0 * d_s0
        dattn_s1 = dattn_s1 * d_s1

    # ---- softmax jacobian over the split (gp, self) anchor group -------
    inner = (jnp.sum(at["sm_gp2a"] * dattn_gp2a, axis=1, keepdims=True) +
             at["sm_selfa"] * dattn_selfa)
    dl_gp2a = at["sm_gp2a"] * (dattn_gp2a - inner)
    dl_selfa = at["sm_selfa"] * (dattn_selfa - inner)
    inner_s = at["sm_s0"] * dattn_s0 + at["sm_s1"] * dattn_s1
    dl_s0 = at["sm_s0"] * (dattn_s0 - inner_s)
    dl_s1 = at["sm_s1"] * (dattn_s1 - inner_s)

    # ---- leaky_relu backward (recompute pre-activation signs) ----------
    def dleaky(pre, g):
        return jnp.where(pre >= 0, g, alpha * g)

    dz_gp = jnp.where(at["gp_mask"],
                      dleaky(a1h[:, :p] + a2h[:, p:p + 1], dl_gp2a), 0.0)
    dz_self = dleaky(a1h[:, p:p + 1] + a2h[:, p:p + 1], dl_selfa)
    dz_s0 = dleaky(a1h[:, p:p + 1] + a2h[:, p + 1:], dl_s0)
    dz_s1 = dleaky(a1h[:, p + 1:] + a2h[:, p + 1:], dl_s1)

    # ---- accumulate into da1 / da2 (closed form, slice stores) ---------
    # gp_j -> anchor: da1[gp_j] += dz_gp_j ; da2[anchor] += dz_gp_j
    # anchor self:    da1[anchor] += dz_self ; da2[anchor] += dz_self
    # anchor -> sib:  da1[anchor] += dz_s0 ; da2[sib] += dz_s0
    # sib self:       da1[sib] += dz_s1 ; da2[sib] += dz_s1
    da1_buf[:, 0:p, h] = dz_gp
    da1_buf[:, p:p + 1, h] = dz_self + jnp.sum(dz_s0, axis=1,
                                               keepdims=True)
    da1_buf[:, p + 1:n, h] = dz_s1
    da2_buf[:, 0:p, h] = jnp.zeros((tb, p), jnp.float32)
    da2_buf[:, p:p + 1, h] = jnp.sum(dz_gp, axis=1, keepdims=True) \
        + dz_self
    da2_buf[:, p + 1:n, h] = dz_s0 + dz_s1


def _bwd_kernel(seed_ref, x_ref, w_ref, wa1_ref, wa2_ref, bft_ref,
                ba1_ref, ba2_ref, ngp_ref, nsib_ref,
                *rest, p, s, heads, dh, alpha, attn_drop, feat_drop,
                out_alpha, interpret, pe_drop=False, need_dx=True,
                stored_attn=False):
    if pe_drop:
        pe_refs = rest[:4]
        rest = rest[4:]
    else:
        pe_refs = None
    g_ref = rest[0]
    rest = rest[1:]
    if stored_attn:   # forward softmax weights — skip the recompute
        attn_ref, rest = rest[0], rest[1:]
    else:
        attn_ref = None
    k_pad = _attn_k_pad(p, s)
    if need_dx:
        dx_ref, rest = rest[0], rest[1:]
    else:
        # layer input is a non-trainable feature tensor: no dx output
        dx_ref = None
    if pe_drop:
        (dw_ref, dwa1_ref, dwa2_ref, dbft_ref, dba1_ref,
         dba2_ref, dpe_ref, dwp_ref, dwpa1_ref, dwpa2_ref,
         dft_buf, da1_buf, da2_buf) = rest
        pe_grad_refs = (dpe_ref, dwp_ref, dwpa1_ref, dwpa2_ref)
    else:
        pe_grad_refs = None
        (dw_ref, dwa1_ref, dwa2_ref, dbft_ref, dba1_ref,
         dba2_ref, dft_buf, da1_buf, da2_buf) = rest
    tb = x_ref.shape[0]
    n = p + 1 + s
    (tile, x, ft, a1, a2, ngp, nsib, feat_mask,
     drop_masks, pe_b, pe_mask) = _common_prologue(
        x_ref, w_ref, wa1_ref, wa2_ref, ngp_ref, nsib_ref, tb, n,
        seed_ref[0], p, s, heads, feat_drop, attn_drop, interpret,
        pe_refs=pe_refs)

    @pl.when(tile == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dwa1_ref[:] = jnp.zeros_like(dwa1_ref)
        dwa2_ref[:] = jnp.zeros_like(dwa2_ref)
        dbft_ref[:] = jnp.zeros_like(dbft_ref)
        dba1_ref[:] = jnp.zeros_like(dba1_ref)
        dba2_ref[:] = jnp.zeros_like(dba2_ref)
        if pe_grad_refs is not None:
            for ref in pe_grad_refs:
                ref[:] = jnp.zeros_like(ref)

    for h in range(heads):
        cols_h = slice(h * dh, (h + 1) * dh)
        fth = (ft[:, cols_h].reshape(tb, n, dh) +
               bft_ref[:, cols_h].reshape(1, n, dh))
        a1h = (a1[:, h:h + 1].reshape(tb, n) +
               ba1_ref[:, h:h + 1].reshape(1, n))
        a2h = (a2[:, h:h + 1].reshape(tb, n) +
               ba2_ref[:, h:h + 1].reshape(1, n))
        gh = g_ref[:, :, h * dh:(h + 1) * dh].astype(jnp.float32)
        if attn_ref is not None:
            at = _attn_from_stored(attn_ref, h, k_pad, tb, p, s, ngp,
                                   drop_masks)
        else:
            at = _bwd_attention(a1h, a2h, ngp, p, s, alpha, drop_masks, h,
                                tb)

        ft_gp = fth[:, :p]
        ft_anchor = fth[:, p:p + 1]
        ft_sib = fth[:, p + 1:]
        g_gp = gh[:, :p]
        g_anchor = gh[:, p:p + 1]
        g_sib = gh[:, p + 1:]

        if out_alpha is not None:
            # fused output activation: recompute the pre-activation output
            # and chain the incoming grads through leaky'(pre)
            pre_anchor = (
                jnp.sum(jnp.expand_dims(at["w_gp2a"], 2) * ft_gp, axis=1,
                        keepdims=True) +
                jnp.expand_dims(at["w_selfa"], 2) * ft_anchor)
            pre_sib = (jnp.expand_dims(at["w_s0"], 2) * ft_anchor +
                       jnp.expand_dims(at["w_s1"], 2) * ft_sib)
            pre_gp = jnp.expand_dims(at["w_gp"], 2) * ft_gp
            dact = lambda pre, g: jnp.where(pre >= 0, g, out_alpha * g)
            g_gp = dact(pre_gp, g_gp)
            g_anchor = dact(pre_anchor, g_anchor)
            g_sib = dact(pre_sib, g_sib)

        _bwd_head_core(at, a1h, a2h, ft_gp, ft_anchor, ft_sib,
                       g_gp, g_anchor, g_sib, drop_masks, h, p, s, n, tb, dh,
                       alpha, dft_buf, da1_buf, da2_buf)

    _bwd_epilogue(x, feat_mask, w_ref, wa1_ref, wa2_ref,
                  dft_buf, da1_buf, da2_buf, dx_ref, dw_ref, dwa1_ref,
                  dwa2_ref, dbft_ref, dba1_ref, dba2_ref, tb, n, heads, dh,
                  pe_refs=pe_refs, pe_grad_refs=pe_grad_refs, pe_b=pe_b,
                  pe_mask=pe_mask)


def _bwd_epilogue(x, feat_mask, w_ref, wa1_ref, wa2_ref, dft_buf, da1_buf,
                  da2_buf, dx_ref, dw_ref, dwa1_ref, dwa2_ref, dbft_ref,
                  dba1_ref, dba2_ref, tb, n, heads, dh, pe_refs=None,
                  pe_grad_refs=None, pe_b=None, pe_mask=None):
    """Shared backward epilogue: dft/da buffers -> dx and parameter grads."""
    import os
    dft = dft_buf[:].reshape(tb * n, heads * dh)
    da1_flat = da1_buf[:].reshape(tb * n, heads)
    da2_flat = da2_buf[:].reshape(tb * n, heads)

    # MXU dtype for the dx/dW contractions. The cotangent buffers are f32
    # scratch; mixed f32xbf16 dots promote to full-f32 matmuls, which run
    # the v5e MXU at ~1/4 of bf16 rate — at the MAG bench shape the dx+dW
    # passes are 2/3 of the step FLOPs, so this single promotion dominated
    # the round-2 41.6 ms step. When the layer runs in bf16 (production
    # compute_dtype) we downcast the cotangents for the CONTRACTION ONLY:
    # accumulation stays f32 via preferred_element_type and the f32
    # sequential-grid += into the dw refs, matching standard mixed-precision
    # training (grads materialize in bf16 anyway: dx_ref is x.dtype).
    # TAXOEXPAN_BWD_MM_F32=1 restores full-f32 contractions for A/B runs.
    mm_dtype = jnp.float32 if os.environ.get("TAXOEXPAN_BWD_MM_F32") == "1" \
        else x.dtype
    dft_mm = dft.astype(mm_dtype)
    da1_mm = da1_flat.astype(mm_dtype)
    da2_mm = da2_flat.astype(mm_dtype)

    # dx = dft @ W^T + da1 @ wa1^T + da2 @ wa2^T — expressed as dot_general
    # contractions over the shared dim so no transpose is materialized in
    # VMEM on every grid step
    def dot_nt(a, b):   # [M, K] x [N, K] -> [M, N]
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_tn(a, b):   # [K, M] x [K, N] -> [M, N]
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if dx_ref is not None:
        dx = (dot_nt(dft_mm, w_ref[:]) + dot_nt(da1_mm, wa1_ref[:]) +
              dot_nt(da2_mm, wa2_ref[:]))
        if feat_mask is not None:   # chain through the fused input dropout
            dx = dx * feat_mask
        dx_ref[:] = dx.reshape(tb, n, -1).astype(dx_ref.dtype)

    # parameter grads accumulate across sequential grid steps
    dw_ref[:] += dot_tn(x, dft_mm)
    dwa1_ref[:] += dot_tn(x, da1_mm)
    dwa2_ref[:] += dot_tn(x, da2_mm)
    # slot-bias grads: sum the per-slot contributions over the tile batch
    dbft_ref[:] += jnp.sum(dft_buf[:], axis=0)
    dba1_ref[:] += jnp.sum(da1_buf[:], axis=0)
    dba2_ref[:] += jnp.sum(da2_buf[:], axis=0)

    if pe_refs is not None:   # pe-dropout path grads (see fused_gat_layer)
        _pe_ref, wp_ref, wpa1_ref, wpa2_ref = pe_refs
        dpe_ref, dwp_ref, dwpa1_ref, dwpa2_ref = pe_grad_refs
        pos_dim = pe_b.shape[1]
        # d(masked pe rows), then chain through mask and sum rows per slot
        # (pe_b / wp are f32 residents — cast to the contraction dtype so
        # these dots do not silently promote back to f32 matmuls)
        pe_mm = pe_b.astype(mm_dtype)
        d_peb = (dot_nt(dft_mm, wp_ref[:].astype(mm_dtype)) +
                 dot_nt(da1_mm, wpa1_ref[:].astype(mm_dtype)) +
                 dot_nt(da2_mm, wpa2_ref[:].astype(mm_dtype)))  # [TB*N, pos]
        dpe_ref[:] += jnp.sum(
            (d_peb * pe_mask).reshape(tb, n, pos_dim), axis=0)
        dwp_ref[:] += dot_tn(pe_mm, dft_mm)
        dwpa1_ref[:] += dot_tn(pe_mm, da1_mm)
        dwpa2_ref[:] += dot_tn(pe_mm, da2_mm)


def _bwd_pool_kernel(seed_ref, x_ref, w_ref, wa1_ref, wa2_ref, bft_ref,
                     ba1_ref, ba2_ref, ngp_ref, nsib_ref,
                     *rest, p, s, heads, dh, alpha, attn_drop, feat_drop,
                     interpret, pe_drop=False, need_dx=True,
                     stored_attn=False):
    """Backward of _fwd_pool_kernel: g_ref holds d(pools) [TB, 3, Dh]; the
    per-slot incoming grads are its class rows broadcast over valid slots,
    scaled by the 1/heads of the fused head mean."""
    if pe_drop:
        pe_refs = rest[:4]
        rest = rest[4:]
    else:
        pe_refs = None
    g_ref = rest[0]
    rest = rest[1:]
    if stored_attn:   # forward softmax weights — skip the recompute
        attn_ref, rest = rest[0], rest[1:]
    else:
        attn_ref = None
    k_pad = _attn_k_pad(p, s)
    if need_dx:
        dx_ref, rest = rest[0], rest[1:]
    else:
        dx_ref = None
    if pe_drop:
        (dw_ref, dwa1_ref, dwa2_ref, dbft_ref, dba1_ref,
         dba2_ref, dpe_ref, dwp_ref, dwpa1_ref, dwpa2_ref,
         dft_buf, da1_buf, da2_buf) = rest
        pe_grad_refs = (dpe_ref, dwp_ref, dwpa1_ref, dwpa2_ref)
    else:
        pe_grad_refs = None
        (dw_ref, dwa1_ref, dwa2_ref, dbft_ref, dba1_ref,
         dba2_ref, dft_buf, da1_buf, da2_buf) = rest
    tb = x_ref.shape[0]
    n = p + 1 + s
    (tile, x, ft, a1, a2, ngp, nsib, feat_mask,
     drop_masks, pe_b, pe_mask) = _common_prologue(
        x_ref, w_ref, wa1_ref, wa2_ref, ngp_ref, nsib_ref, tb, n,
        seed_ref[0], p, s, heads, feat_drop, attn_drop, interpret,
        pe_refs=pe_refs)
    sib_mask = jax.lax.broadcasted_iota(jnp.int32, (tb, s), 1) < nsib

    @pl.when(tile == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dwa1_ref[:] = jnp.zeros_like(dwa1_ref)
        dwa2_ref[:] = jnp.zeros_like(dwa2_ref)
        dbft_ref[:] = jnp.zeros_like(dbft_ref)
        dba1_ref[:] = jnp.zeros_like(dba1_ref)
        dba2_ref[:] = jnp.zeros_like(dba2_ref)
        if pe_grad_refs is not None:
            for ref in pe_grad_refs:
                ref[:] = jnp.zeros_like(ref)

    inv_h = 1.0 / heads
    g0 = g_ref[:, 0, :].astype(jnp.float32) * inv_h     # [TB, Dh]
    g1 = g_ref[:, 1, :].astype(jnp.float32) * inv_h
    g2 = g_ref[:, 2, :].astype(jnp.float32) * inv_h
    for h in range(heads):
        cols_h = slice(h * dh, (h + 1) * dh)
        fth = (ft[:, cols_h].reshape(tb, n, dh).astype(jnp.float32) +
               bft_ref[:, cols_h].reshape(1, n, dh))
        a1h = (a1[:, h:h + 1].reshape(tb, n) +
               ba1_ref[:, h:h + 1].reshape(1, n))
        a2h = (a2[:, h:h + 1].reshape(tb, n) +
               ba2_ref[:, h:h + 1].reshape(1, n))
        if attn_ref is not None:
            at = _attn_from_stored(attn_ref, h, k_pad, tb, p, s, ngp,
                                   drop_masks)
        else:
            at = _bwd_attention(a1h, a2h, ngp, p, s, alpha, drop_masks, h,
                                tb)
        ft_gp = fth[:, :p]
        ft_anchor = fth[:, p:p + 1]
        ft_sib = fth[:, p + 1:]
        # per-slot grads from the class pools, masked to valid slots
        # (f32 mask multiplies — see _fwd_pool_kernel's Mosaic i1 note)
        gp_f = at["gp_mask"].astype(jnp.float32)
        sib_f = sib_mask.astype(jnp.float32)
        g_gp = jnp.expand_dims(g0, 1) * jnp.expand_dims(gp_f, 2)  # [TB,P,Dh]
        g_anchor = jnp.expand_dims(g1, 1)                         # [TB,1,Dh]
        g_sib = jnp.expand_dims(g2, 1) * jnp.expand_dims(sib_f, 2)
        _bwd_head_core(at, a1h, a2h, ft_gp, ft_anchor, ft_sib,
                       g_gp, g_anchor, g_sib, drop_masks, h, p, s, n, tb, dh,
                       alpha, dft_buf, da1_buf, da2_buf)

    _bwd_epilogue(x, feat_mask, w_ref, wa1_ref, wa2_ref,
                  dft_buf, da1_buf, da2_buf, dx_ref, dw_ref, dwa1_ref,
                  dwa2_ref, dbft_ref, dba1_ref, dba2_ref, tb, n, heads, dh,
                  pe_refs=pe_refs, pe_grad_refs=pe_grad_refs, pe_b=pe_b,
                  pe_mask=pe_mask)


# ----------------------------------------------------------------- dispatch

def _vmem_cap_bytes() -> int:
    """Per-tile working-set budget. v5e has 128 MiB VMEM; the default leaves
    ample room for Mosaic's double-buffered block DMAs and per-head
    temporaries. Override with TAXOEXPAN_VMEM_CAP_MB for experiments.

    Default from the round-2 hardware sweep (scripts/vmem_cap_sweep.py on a
    real v5e at the MAG-CS bench shape): 24 MB -> 41.6 ms/step vs 57.6 at
    10 MB and 43.0 at 48 MB — bigger tiles cut grid overhead until they
    start starving Mosaic's double-buffering."""
    import os
    return int(float(os.environ.get("TAXOEXPAN_VMEM_CAP_MB", "24"))
               * 1024 * 1024)


def _vmem_cap_bwd_bytes() -> int:
    """Backward-kernel tile budget. Separate knob because the backward's
    factor-2 working-set estimate halves its tiles relative to the forward
    under a shared cap, and the fwd/bwd optima need not coincide
    (TAXOEXPAN_VMEM_CAP_BWD_MB; defaults to the forward cap)."""
    import os
    v = os.environ.get("TAXOEXPAN_VMEM_CAP_BWD_MB")
    return int(float(v) * 1024 * 1024) if v else _vmem_cap_bytes()


def _compiler_params(interpret):
    """Raise Mosaic's scoped-vmem limit (default 16 MB) so the tile sizes
    chosen by `_pick_tile` under TAXOEXPAN_VMEM_CAP_MB actually fit: the
    kernel working set (x/ft/g tiles + weight blocks + double-buffered DMAs)
    lives on the scoped-vmem stack, and the 16 MB default rejects any tile
    much past the 10 MB cap. The limit is DERIVED from the cap (2x headroom
    covers double-buffered block DMAs + per-head temporaries the `_pick_tile`
    estimate omits) so raising TAXOEXPAN_VMEM_CAP_MB keeps cap and compiler
    limit consistent: floored at 100 MiB (the validated v5e default) and
    clamped to the 128 MiB physical VMEM of the v4/v5 parts — a limit above
    physical would let Mosaic schedule allocations that cannot exist."""
    if interpret:
        return None
    cap = max(_vmem_cap_bytes(), _vmem_cap_bwd_bytes())
    limit = min(max(2 * cap, 100 * 1024 * 1024),
                128 * 1024 * 1024)
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _pick_tile(b: int, n: int, din: int, hd: int, factor: int = 1) -> int:
    """Largest power-of-two tile whose estimated working set fits the cap.

    `factor=2` for the backward kernel (holds dft/dx/da alongside ft/g),
    which also switches to the backward cap. The 4-byte estimate is
    deliberate even for bf16 activations: the big in-kernel intermediates
    (ft, dft) are f32 (see _common_prologue)."""
    cap = _vmem_cap_bytes() if factor == 1 else _vmem_cap_bwd_bytes()
    for tb in (32, 16, 8, 4, 2, 1):
        if b % tb:
            continue
        rows = tb * n
        bytes_needed = factor * 4 * (rows * din + rows * hd * 2 + din * hd)
        if bytes_needed <= cap:
            return tb
    return 1


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16))
def fused_gat_layer(x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_pack,
                    meta, p, heads, alpha, attn_drop, feat_drop, out_alpha,
                    interpret, need_dx=True):
    """x: [B, N, Din]; fc: [Din, H*Dh]; wa1/wa2: [Din, H]; slot biases
    bias_ft [N, H*Dh], bias_a1/bias_a2 [N, H] (position-embedding
    decomposition — zeros when unused); meta = (ngp [B], nsib [B], seed).
    feat_drop > 0 fuses the input-feature dropout; out_alpha (float or None)
    fuses the inter-layer leaky_relu activation. Returns [B, N, H*Dh].

    pe_pack: None, or (pe [N, pos], wp [pos, H*Dh], wpa1 [pos, H],
    wpa2 [pos, H]) — the pe-DROPOUT path for pos_mode="bias" training:
    the kernel draws a per-node keep-mask over the position-embedding
    columns and adds (mask * pe) @ wp (resp. wpa1/wpa2) to ft/a1/a2,
    reproducing the reference's dropout over the full concatenated input
    (model_zoo.py:82) without materializing the concat. Use it with
    bias_ft/a1/a2 = zeros; requires feat_drop > 0 (otherwise precompute
    the exact per-slot biases instead).

    need_dx=False (static): the caller guarantees x's cotangent is never
    used (x is the non-trainable input feature tensor — TaxoExpan's word2vec
    node features, dataset.py:130-133 fixed at ingest). The backward kernel
    then skips the three dx matmuls and the [B, N, Din] dx write, and the
    VJP returns zeros for x."""
    out, _ = _fused_fwd(x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_pack,
                        meta, p, heads, alpha, attn_drop, feat_drop,
                        out_alpha, interpret)
    return out


def _slot_pad(n: int) -> int:
    """Pad the slot dimension to the bf16 sublane tile (16): Mosaic cannot
    collapse [TB, N, D] -> [TB*N, D] when N is not tile-aligned. Extra slots
    are appended as invalid SIBLINGS (beyond nsib), which contribute exactly
    zero to outputs and gradients (zero features, masked attention)."""
    return (-(-n // 16) * 16) - n


def _prep_pe_pack(pe_pack, pad, heads, feat_drop):
    """Slot-pad + f32-cast the pe inputs; build their specs and operands."""
    if pe_pack is None:
        return None, [], []
    if feat_drop <= 0.0:
        raise ValueError("pe_pack requires feat_drop > 0 — with no input "
                         "dropout precompute the exact per-slot biases")
    pe, wp, wpa1, wpa2 = pe_pack
    pe = pe.astype(jnp.float32)
    if pad:
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
    n = pe.shape[0]
    pos = pe.shape[1]
    hd = wp.shape[1]
    specs = [
        pl.BlockSpec((n, pos), lambda i, *_: (0, 0)),
        pl.BlockSpec((pos, hd), lambda i, *_: (0, 0)),
        pl.BlockSpec((pos, heads), lambda i, *_: (0, 0)),
        pl.BlockSpec((pos, heads), lambda i, *_: (0, 0)),
    ]
    operands = [pe, wp.astype(jnp.float32), wpa1.astype(jnp.float32),
                wpa2.astype(jnp.float32)]
    return (pe, operands[1], operands[2], operands[3]), specs, operands


def _fused_fwd(x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_pack, meta, p,
               heads, alpha, attn_drop, feat_drop, out_alpha, interpret,
               save_attn=False):
    ngp, nsib, seed = meta
    b, n_orig, din = x.shape
    pad = _slot_pad(n_orig)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        bias_ft = jnp.pad(bias_ft, ((0, pad), (0, 0)))
        bias_a1 = jnp.pad(bias_a1, ((0, pad), (0, 0)))
        bias_a2 = jnp.pad(bias_a2, ((0, pad), (0, 0)))
    b, n, din = x.shape
    hd = fc.shape[1]
    dh = hd // heads
    s = n - p - 1
    tb = _pick_tile(b, n, din, hd)
    grid = (b // tb,)
    k_pad = _attn_k_pad(p, s)
    pe_padded, pe_specs, pe_operands = _prep_pe_pack(pe_pack, pad, heads,
                                                     feat_drop)
    kernel = functools.partial(_fwd_kernel, p=p, s=s, heads=heads, dh=dh,
                               alpha=alpha, attn_drop=attn_drop,
                               feat_drop=feat_drop, out_alpha=out_alpha,
                               interpret=interpret,
                               pe_drop=pe_pack is not None,
                               save_attn=save_attn)
    out_specs = pl.BlockSpec((tb, n, hd), lambda i, *_: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, n, hd), x.dtype)
    if save_attn:
        out_specs = (out_specs,
                     pl.BlockSpec((tb, heads * k_pad),
                                  lambda i, *_: (i, 0)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, heads * k_pad), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((din, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
            ] + pe_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray([seed], jnp.int32), x, fc, wa1, wa2,
      bias_ft.astype(jnp.float32), bias_a1.astype(jnp.float32),
      bias_a2.astype(jnp.float32),
      ngp.reshape(b, 1).astype(jnp.int32),
      nsib.reshape(b, 1).astype(jnp.int32), *pe_operands)
    attn = None
    if save_attn:
        out, attn = out
    if pad:
        out = out[:, :n_orig]
    return out, (x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_padded,
                 meta, attn)


def _pe_grad_specs_shapes(pe_padded, heads):
    """Output specs + shapes for the pe-path parameter grads."""
    if pe_padded is None:
        return [], []
    pe, wp, _, _ = pe_padded
    n, pos = pe.shape
    hd = wp.shape[1]
    specs = [
        pl.BlockSpec((n, pos), lambda i, *_: (0, 0)),
        pl.BlockSpec((pos, hd), lambda i, *_: (0, 0)),
        pl.BlockSpec((pos, heads), lambda i, *_: (0, 0)),
        pl.BlockSpec((pos, heads), lambda i, *_: (0, 0)),
    ]
    shapes = [
        jax.ShapeDtypeStruct((n, pos), jnp.float32),
        jax.ShapeDtypeStruct((pos, hd), jnp.float32),
        jax.ShapeDtypeStruct((pos, heads), jnp.float32),
        jax.ShapeDtypeStruct((pos, heads), jnp.float32),
    ]
    return specs, shapes


def _fused_bwd(p, heads, alpha, attn_drop, feat_drop, out_alpha, interpret,
               need_dx, residuals, g):
    # residual x / biases / pe are already slot-padded by _fused_fwd
    (x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_padded, meta,
     attn) = residuals
    ngp, nsib, seed = meta
    b, n, din = x.shape
    n_orig = g.shape[1]
    pad = n - n_orig
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    hd = fc.shape[1]
    dh = hd // heads
    s = n - p - 1
    tb = _pick_tile(b, n, din, hd, factor=2)
    grid = (b // tb,)
    k_pad = _attn_k_pad(p, s)
    pe_specs = []
    pe_operands = []
    if pe_padded is not None:
        pe_specs = [
            pl.BlockSpec(pe_padded[0].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(pe_padded[1].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(pe_padded[2].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(pe_padded[3].shape, lambda i, *_: (0, 0)),
        ]
        pe_operands = list(pe_padded)
    pe_out_specs, pe_out_shapes = _pe_grad_specs_shapes(pe_padded, heads)
    attn_specs = ([pl.BlockSpec((tb, heads * k_pad), lambda i, *_: (i, 0))]
                  if attn is not None else [])
    attn_operands = [attn] if attn is not None else []
    kernel = functools.partial(_bwd_kernel, p=p, s=s, heads=heads, dh=dh,
                               alpha=alpha, attn_drop=attn_drop,
                               feat_drop=feat_drop, out_alpha=out_alpha,
                               interpret=interpret,
                               pe_drop=pe_padded is not None,
                               need_dx=need_dx,
                               stored_attn=attn is not None)
    dx_specs = ([pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0))]
                if need_dx else [])
    dx_shapes = ([jax.ShapeDtypeStruct((b, n, din), x.dtype)]
                 if need_dx else [])
    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((din, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
            ] + pe_specs + [
                pl.BlockSpec((tb, n, hd), lambda i, *_: (i, 0, 0)),
            ] + attn_specs,
            out_specs=dx_specs + [
                pl.BlockSpec((din, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
            ] + pe_out_specs,
            scratch_shapes=[
                pltpu.VMEM((tb, n, hd), jnp.float32),     # dft
                pltpu.VMEM((tb, n, heads), jnp.float32),  # da1
                pltpu.VMEM((tb, n, heads), jnp.float32),  # da2
            ],
        ),
        out_shape=dx_shapes + [
            jax.ShapeDtypeStruct((din, hd), jnp.float32),
            jax.ShapeDtypeStruct((din, heads), jnp.float32),
            jax.ShapeDtypeStruct((din, heads), jnp.float32),
            jax.ShapeDtypeStruct((n, hd), jnp.float32),
            jax.ShapeDtypeStruct((n, heads), jnp.float32),
            jax.ShapeDtypeStruct((n, heads), jnp.float32),
        ] + pe_out_shapes,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray([seed], jnp.int32), x, fc, wa1, wa2,
      bias_ft.astype(jnp.float32), bias_a1.astype(jnp.float32),
      bias_a2.astype(jnp.float32),
      ngp.reshape(b, 1).astype(jnp.int32),
      nsib.reshape(b, 1).astype(jnp.int32), *pe_operands, g,
      *attn_operands)
    if need_dx:
        dx, results = results[0], results[1:]
    else:
        dx = jnp.zeros((b, n, din), x.dtype)
    dw, dwa1, dwa2, dbft, dba1, dba2 = results[:6]
    if pad:
        dx = dx[:, :n_orig]
        dbft = dbft[:n_orig]
        dba1 = dba1[:n_orig]
        dba2 = dba2[:n_orig]
    dpe_pack = None
    if pe_padded is not None:
        dpe, dwp, dwpa1, dwpa2 = results[6:]
        if pad:
            dpe = dpe[:n_orig]
        dpe_pack = (dpe, dwp, dwpa1, dwpa2)
    return (dx, dw.astype(fc.dtype), dwa1.astype(wa1.dtype),
            dwa2.astype(wa2.dtype), dbft.astype(bias_ft.dtype),
            dba1.astype(bias_a1.dtype), dba2.astype(bias_a2.dtype),
            dpe_pack, None)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15))
def fused_gat_layer_pooled(x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2,
                           pe_pack, meta, p, heads, alpha, attn_drop,
                           feat_drop, interpret, need_dx=True):
    """Final-layer GAT with the head mean + position-class readout pools
    fused in: returns pools [B, 3, Dh] f32 = (sum over valid grandparent
    slots, anchor, sum over valid sibling slots) of the head-averaged
    aggregated output. Every readout kind except MAX is a cheap XLA epilogue
    on the pools (ops/star.py:readout_from_pools) — the [B, N, H*Dh] final
    activation never touches HBM. Args as fused_gat_layer, including the
    pe_pack pe-dropout path (no out_alpha: the output layer has no stack
    activation, model_zoo.py:189)."""
    out, _ = _fused_pooled_fwd(x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2,
                               pe_pack, meta, p, heads, alpha, attn_drop,
                               feat_drop, interpret)
    return out


def _fused_pooled_fwd(x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_pack,
                      meta, p, heads, alpha, attn_drop, feat_drop, interpret,
                      save_attn=False):
    ngp, nsib, seed = meta
    b, n_orig, din = x.shape
    pad = _slot_pad(n_orig)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        bias_ft = jnp.pad(bias_ft, ((0, pad), (0, 0)))
        bias_a1 = jnp.pad(bias_a1, ((0, pad), (0, 0)))
        bias_a2 = jnp.pad(bias_a2, ((0, pad), (0, 0)))
    b, n, din = x.shape
    hd = fc.shape[1]
    dh = hd // heads
    s = n - p - 1
    tb = _pick_tile(b, n, din, hd)
    grid = (b // tb,)
    k_pad = _attn_k_pad(p, s)
    pe_padded, pe_specs, pe_operands = _prep_pe_pack(pe_pack, pad, heads,
                                                     feat_drop)
    kernel = functools.partial(_fwd_pool_kernel, p=p, s=s, heads=heads, dh=dh,
                               alpha=alpha, attn_drop=attn_drop,
                               feat_drop=feat_drop, interpret=interpret,
                               pe_drop=pe_pack is not None,
                               save_attn=save_attn)
    out_specs = pl.BlockSpec((tb, 3, dh), lambda i, *_: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, 3, dh), jnp.float32)
    if save_attn:
        out_specs = (out_specs,
                     pl.BlockSpec((tb, heads * k_pad),
                                  lambda i, *_: (i, 0)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, heads * k_pad), jnp.float32))
    pools = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((din, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
            ] + pe_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray([seed], jnp.int32), x, fc, wa1, wa2,
      bias_ft.astype(jnp.float32), bias_a1.astype(jnp.float32),
      bias_a2.astype(jnp.float32),
      ngp.reshape(b, 1).astype(jnp.int32),
      nsib.reshape(b, 1).astype(jnp.int32), *pe_operands)
    attn = None
    if save_attn:
        pools, attn = pools
    return pools, (x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_padded,
                   meta, n_orig, attn)


def _fused_pooled_bwd(p, heads, alpha, attn_drop, feat_drop, interpret,
                      need_dx, residuals, g):
    # residual x / biases / pe are already slot-padded by _fused_pooled_fwd
    (x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_padded, meta,
     n_orig, attn) = residuals
    ngp, nsib, seed = meta
    b, n, din = x.shape
    hd = fc.shape[1]
    dh = hd // heads
    s = n - p - 1
    tb = _pick_tile(b, n, din, hd, factor=2)
    grid = (b // tb,)
    k_pad = _attn_k_pad(p, s)
    pe_specs = []
    pe_operands = []
    if pe_padded is not None:
        pe_specs = [
            pl.BlockSpec(pe_padded[0].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(pe_padded[1].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(pe_padded[2].shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(pe_padded[3].shape, lambda i, *_: (0, 0)),
        ]
        pe_operands = list(pe_padded)
    pe_out_specs, pe_out_shapes = _pe_grad_specs_shapes(pe_padded, heads)
    attn_specs = ([pl.BlockSpec((tb, heads * k_pad), lambda i, *_: (i, 0))]
                  if attn is not None else [])
    attn_operands = [attn] if attn is not None else []
    kernel = functools.partial(_bwd_pool_kernel, p=p, s=s, heads=heads, dh=dh,
                               alpha=alpha, attn_drop=attn_drop,
                               feat_drop=feat_drop, interpret=interpret,
                               pe_drop=pe_padded is not None,
                               need_dx=need_dx,
                               stored_attn=attn is not None)
    dx_specs = ([pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0))]
                if need_dx else [])
    dx_shapes = ([jax.ShapeDtypeStruct((b, n, din), x.dtype)]
                 if need_dx else [])
    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((din, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0)),
            ] + pe_specs + [
                pl.BlockSpec((tb, 3, dh), lambda i, *_: (i, 0, 0)),
            ] + attn_specs,
            out_specs=dx_specs + [
                pl.BlockSpec((din, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((din, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, hd), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, heads), lambda i, *_: (0, 0)),
            ] + pe_out_specs,
            scratch_shapes=[
                pltpu.VMEM((tb, n, hd), jnp.float32),     # dft
                pltpu.VMEM((tb, n, heads), jnp.float32),  # da1
                pltpu.VMEM((tb, n, heads), jnp.float32),  # da2
            ],
        ),
        out_shape=dx_shapes + [
            jax.ShapeDtypeStruct((din, hd), jnp.float32),
            jax.ShapeDtypeStruct((din, heads), jnp.float32),
            jax.ShapeDtypeStruct((din, heads), jnp.float32),
            jax.ShapeDtypeStruct((n, hd), jnp.float32),
            jax.ShapeDtypeStruct((n, heads), jnp.float32),
            jax.ShapeDtypeStruct((n, heads), jnp.float32),
        ] + pe_out_shapes,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray([seed], jnp.int32), x, fc, wa1, wa2,
      bias_ft.astype(jnp.float32), bias_a1.astype(jnp.float32),
      bias_a2.astype(jnp.float32),
      ngp.reshape(b, 1).astype(jnp.int32),
      nsib.reshape(b, 1).astype(jnp.int32), *pe_operands,
      g.astype(jnp.float32), *attn_operands)
    if need_dx:
        dx, results = results[0], results[1:]
    else:
        dx = jnp.zeros((b, n, din), x.dtype)
    dw, dwa1, dwa2, dbft, dba1, dba2 = results[:6]
    if n > n_orig:   # undo the slot padding of _fused_pooled_fwd
        dx = dx[:, :n_orig]
        dbft = dbft[:n_orig]
        dba1 = dba1[:n_orig]
        dba2 = dba2[:n_orig]
    dpe_pack = None
    if pe_padded is not None:
        dpe, dwp, dwpa1, dwpa2 = results[6:]
        if n > n_orig:
            dpe = dpe[:n_orig]
        dpe_pack = (dpe, dwp, dwpa1, dwpa2)
    return (dx, dw.astype(fc.dtype), dwa1.astype(wa1.dtype),
            dwa2.astype(wa2.dtype), dbft.astype(bias_ft.dtype),
            dba1.astype(bias_a1.dtype), dba2.astype(bias_a2.dtype),
            dpe_pack, None)


# Differentiated path: with TAXOEXPAN_STORED_ATTN=1 (opt-in — measured
# slower at the MAG bench shape, see the stored-attention section above)
# the forward additionally stores its softmax weights so the backward skips
# the attention recompute. The PRIMAL calls inside fused_gat_layer/-pooled
# keep save_attn=False — inference never pays the extra write.
fused_gat_layer_pooled.defvjp(
    lambda x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_pack, meta, p,
    heads, alpha, attn_drop, feat_drop, interpret, need_dx:
        _fused_pooled_fwd(x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2,
                          pe_pack, meta, p, heads, alpha, attn_drop,
                          feat_drop, interpret,
                          save_attn=_use_stored_attn()),
    _fused_pooled_bwd)


fused_gat_layer.defvjp(
    lambda x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_pack, meta, p,
    heads, alpha, attn_drop, feat_drop, out_alpha, interpret, need_dx:
        _fused_fwd(x, fc, wa1, wa2, bias_ft, bias_a1, bias_a2, pe_pack, meta,
                   p, heads, alpha, attn_drop, feat_drop, out_alpha,
                   interpret, save_attn=_use_stored_attn()),
    _fused_bwd)
