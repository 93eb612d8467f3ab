"""Fused Pallas TPU kernel for one star-GCN layer: dropout + x @ W +
degree-normalized star aggregation + bias + activation in one VMEM pass.

Semantics are exactly model_zoo.py:34-50 via models/propagation.py's
apply_gcn_layer (the XLA oracle): z = dropout(x) @ W (+ position-bias
term), z *= rsqrt(deg) at the source, star copy-src-sum (self-loops on
every valid slot, gp -> anchor, anchor -> sib), *= rsqrt(deg) at the
destination, + b, activation. In-degrees are the closed form of
ops/star.py:in_degrees (gp = 1, anchor = 1 + ngp, sib = 2).

Why a fused kernel when GCN has no attention: the layer is still
HBM-bound — the XLA path materializes z [B, N, Dout] and re-reads it for
the aggregation passes. Fusing keeps each tile's z in VMEM so HBM traffic
drops to read-x + write-out, the same structural win as ops/pallas_gat.py
(whose conventions this file follows: deterministic per-tile PRNG dropout
replayed in the backward, rematerialized z, sequential-grid dW/db
accumulation, slice stores, no gathers/concats — see that module's Mosaic
notes).

Position handling mirrors the GAT kernel's two modes:
- eval / no-dropout: the pe term is the per-slot constant z_bias [N, Dout]
  = pe @ W_p computed OUTSIDE the kernel; the VJP returns d(z_bias) so
  autodiff reaches pe / W_p through that outside computation.
- train with dropout (pe_pack): the kernel draws the pe column keep-mask
  itself (exact model_zoo.py:36 dropout-over-concat semantics) and returns
  dpe / dwp directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gat import (_compiler_params, _gen_masks, _pick_tile,
                         _slot_pad)


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _norms(ngp, nsib, tb, p, s):
    """Per-segment rsqrt(in-degree), zero on invalid slots.

    Returns (norm_gp [TB, P], norm_anchor [TB, 1], norm_sib [TB, S])."""
    gp_mask = jax.lax.broadcasted_iota(jnp.int32, (tb, p), 1) < ngp
    sib_mask = jax.lax.broadcasted_iota(jnp.int32, (tb, s), 1) < nsib
    norm_gp = gp_mask.astype(jnp.float32)                    # rsqrt(1) = 1
    norm_anchor = jax.lax.rsqrt(1.0 + ngp.astype(jnp.float32))   # [TB, 1]
    norm_sib = sib_mask.astype(jnp.float32) * \
        jax.lax.rsqrt(jnp.asarray(2.0, jnp.float32))
    return norm_gp, norm_anchor, norm_sib


def _prologue(seed_ref, x_ref, w_ref, ngp_ref, nsib_ref, pe_refs, tb, n, p,
              s, drop, interpret):
    """Shared fwd/bwd prologue: dropout masks, z = x @ W (+ pe), norms."""
    tile = pl.program_id(0)
    din = x_ref.shape[2]
    pos_dim = pe_refs[0].shape[1] if pe_refs is not None else 0
    feat_mask, pe_mask, _ = _gen_masks(
        seed_ref[0], tile, tb, n, din, p, s, 0, drop, 0.0, interpret,
        pos_dim=pos_dim)
    x = x_ref[:].reshape(tb * n, din)
    if feat_mask is not None:
        x = x * feat_mask.astype(x.dtype)
    z = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    pe_b = None
    if pe_refs is not None:
        pe_ref, wp_ref = pe_refs
        pe_rows = jnp.broadcast_to(pe_ref[:][None], (tb, n, pos_dim))
        pe_b = (pe_mask.reshape(tb, n, pos_dim) * pe_rows).reshape(
            tb * n, pos_dim)
        z = z + jnp.dot(pe_b.astype(x.dtype), wp_ref[:].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    row0 = pl.multiple_of(tile * tb, tb)
    ngp = ngp_ref[pl.ds(row0, tb), :]
    nsib = nsib_ref[pl.ds(row0, tb), :]
    return tile, x, z, ngp, nsib, feat_mask, pe_b, pe_mask


def _aggregate(z, zb_ref, ngp, nsib, tb, n, p, s, dout):
    """Star copy-src-sum with degree normalization on both ends.

    Returns (pre_gp, pre_anchor, pre_sib) — the aggregated PRE-bias,
    PRE-activation segments — plus the norms for the backward mirror."""
    ngp_f, na, ns = _norms(ngp, nsib, tb, p, s)
    z3 = z.reshape(tb, n, dout) + zb_ref[:].reshape(1, n, dout)
    zgp = z3[:, :p] * ngp_f[..., None]
    za = z3[:, p:p + 1] * na[..., None]
    zs = z3[:, p + 1:] * ns[..., None]
    pre_gp = zgp * ngp_f[..., None]
    pre_anchor = (za + jnp.sum(zgp, axis=1, keepdims=True)) * na[..., None]
    pre_sib = (zs + za) * ns[..., None]
    return pre_gp, pre_anchor, pre_sib, (ngp_f, na, ns)


def _fwd_kernel(seed_ref, x_ref, w_ref, b_ref, zb_ref, ngp_ref, nsib_ref,
                *rest, p, s, dout, alpha, drop, interpret, pe_drop):
    if pe_drop:
        pe_refs = rest[:2]
        (out_ref,) = rest[2:]
    else:
        pe_refs = None
        (out_ref,) = rest
    tb = x_ref.shape[0]
    n = p + 1 + s
    _tile, _x, z, ngp, nsib, _fm, _peb, _pem = _prologue(
        seed_ref, x_ref, w_ref, ngp_ref, nsib_ref, pe_refs, tb, n, p, s,
        drop, interpret)
    pre_gp, pre_anchor, pre_sib, _norms_ = _aggregate(
        z, zb_ref, ngp, nsib, tb, n, p, s, dout)
    bias = b_ref[:].reshape(1, 1, dout)
    out_gp = pre_gp + bias
    out_anchor = pre_anchor + bias
    out_sib = pre_sib + bias
    if alpha is not None:
        out_gp = _leaky(out_gp, alpha)
        out_anchor = _leaky(out_anchor, alpha)
        out_sib = _leaky(out_sib, alpha)
    out_ref[:, 0:p, :] = out_gp.astype(out_ref.dtype)
    out_ref[:, p:p + 1, :] = out_anchor.astype(out_ref.dtype)
    out_ref[:, p + 1:n, :] = out_sib.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w_ref, b_ref, zb_ref, ngp_ref, nsib_ref,
                *rest, p, s, dout, alpha, drop, interpret, pe_drop,
                need_dx):
    if pe_drop:
        pe_refs = rest[:2]
        rest = rest[2:]
    else:
        pe_refs = None
    g_ref = rest[0]
    rest = rest[1:]
    if need_dx:
        dx_ref, rest = rest[0], rest[1:]
    else:
        dx_ref = None
    if pe_drop:
        dw_ref, db_ref, dzb_ref, dpe_ref, dwp_ref, dz_buf = rest
    else:
        dw_ref, db_ref, dzb_ref, dz_buf = rest
        dpe_ref = dwp_ref = None
    tb = x_ref.shape[0]
    n = p + 1 + s
    tile, x, z, ngp, nsib, feat_mask, pe_b, pe_mask = _prologue(
        seed_ref, x_ref, w_ref, ngp_ref, nsib_ref, pe_refs, tb, n, p, s,
        drop, interpret)

    @pl.when(tile == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dzb_ref[:] = jnp.zeros_like(dzb_ref)
        if dpe_ref is not None:
            dpe_ref[:] = jnp.zeros_like(dpe_ref)
            dwp_ref[:] = jnp.zeros_like(dwp_ref)

    g = g_ref[:].astype(jnp.float32)                       # [TB, N, Dout]
    if alpha is not None:
        # recompute the pre-activation segments for leaky'
        pre_gp, pre_anchor, pre_sib, norms = _aggregate(
            z, zb_ref, ngp, nsib, tb, n, p, s, dout)
        bias = b_ref[:].reshape(1, 1, dout)
        dact = lambda pre, gg: jnp.where(pre + bias >= 0, gg, alpha * gg)
        g2_gp = dact(pre_gp, g[:, :p])
        g2_anchor = dact(pre_anchor, g[:, p:p + 1])
        g2_sib = dact(pre_sib, g[:, p + 1:])
    else:
        norms = _norms(ngp, nsib, tb, p, s)
        g2_gp, g2_anchor, g2_sib = g[:, :p], g[:, p:p + 1], g[:, p + 1:]
    ngp_f, na, ns = norms

    # db = sum of post-activation-chain grads (bias reaches every slot)
    db_ref[:] += (jnp.sum(g2_gp, axis=(0, 1)) +
                  jnp.sum(g2_anchor, axis=(0, 1)) +
                  jnp.sum(g2_sib, axis=(0, 1))).reshape(1, dout)

    # mirror of the aggregation: dst-norm, transpose-agg, src-norm
    g3_gp = g2_gp * ngp_f[..., None]
    g3_anchor = g2_anchor * na[..., None]
    g3_sib = g2_sib * ns[..., None]
    # slot-axis concat is Mosaic-hostile (see pallas_gat module notes) —
    # assemble dz via slice stores into a VMEM scratch instead
    dz_buf[:, 0:p, :] = (g3_gp + g3_anchor) * ngp_f[..., None]
    dz_buf[:, p:p + 1, :] = (g3_anchor +
                             jnp.sum(g3_sib, axis=1, keepdims=True)) \
        * na[..., None]
    dz_buf[:, p + 1:n, :] = g3_sib * ns[..., None]
    dz_flat = dz_buf[:].reshape(tb * n, dout)

    # d(z_bias): per-slot sum over the tile batch (accumulates over grid)
    dzb_ref[:] += jnp.sum(dz_buf[:], axis=0)

    def dot_nt(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_tn(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dz_mm = dz_flat.astype(x.dtype)
    if dx_ref is not None:
        dx = dot_nt(dz_mm, w_ref[:])
        if feat_mask is not None:
            dx = dx * feat_mask
        dx_ref[:] = dx.reshape(tb, n, -1).astype(dx_ref.dtype)
    dw_ref[:] += dot_tn(x, dz_mm)

    if pe_refs is not None:
        _pe_ref, wp_ref = pe_refs
        pos_dim = pe_b.shape[1]
        d_peb = dot_nt(dz_mm, wp_ref[:].astype(x.dtype))   # [TB*N, pos]
        dpe_ref[:] += jnp.sum(
            (d_peb * pe_mask).reshape(tb, n, pos_dim), axis=0)
        dwp_ref[:] += dot_tn(pe_b.astype(x.dtype), dz_mm)


def _prep_pe(pe_pack, pad):
    if pe_pack is None:
        return None, [], []
    pe, wp = pe_pack
    pe = pe.astype(jnp.float32)
    if pad:
        pe = jnp.pad(pe, ((0, pad), (0, 0)))
    n, pos = pe.shape
    dout = wp.shape[1]
    specs = [pl.BlockSpec((n, pos), lambda i, *_: (0, 0)),
             pl.BlockSpec((pos, dout), lambda i, *_: (0, 0))]
    return (pe, wp.astype(jnp.float32)), specs, [pe, wp.astype(jnp.float32)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_gcn_layer(x, w, b, z_bias, pe_pack, meta, p, alpha, drop,
                    interpret, need_dx=True):
    """x: [B, N, Din]; w: [Din, Dout]; b: [Dout] GCN bias; z_bias [N, Dout]
    per-slot constant added to z before normalization (the pos_mode="bias"
    eval-path pe @ W_p term — zeros when unused; its cotangent is returned
    so pe/W_p gradients flow through the outside computation).
    pe_pack: None or (pe [N, pos], wp [pos, Dout]) — the train-with-dropout
    path (requires drop > 0), adds (mask * pe) @ wp inside the kernel.
    meta = (ngp [B], nsib [B], seed). alpha: fused activation slope (None
    on the output layer). Returns [B, N, Dout]."""
    out, _ = _fused_fwd(x, w, b, z_bias, pe_pack, meta, p, alpha, drop,
                        interpret)
    return out


def _fused_fwd(x, w, b, z_bias, pe_pack, meta, p, alpha, drop, interpret):
    if pe_pack is not None and drop <= 0.0:
        raise ValueError("pe_pack requires drop > 0 — with no dropout pass "
                         "the exact z_bias constant instead")
    ngp, nsib, seed = meta
    b_arr = jnp.asarray(b, jnp.float32).reshape(1, -1)
    bsz, n_orig, din = x.shape
    pad = _slot_pad(n_orig)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        z_bias = jnp.pad(z_bias, ((0, pad), (0, 0)))
    bsz, n, din = x.shape
    dout = w.shape[1]
    s = n - p - 1
    tb = _pick_tile(bsz, n, din, dout)
    grid = (bsz // tb,)
    pe_padded, pe_specs, pe_operands = _prep_pe(pe_pack, pad)
    kernel = functools.partial(_fwd_kernel, p=p, s=s, dout=dout, alpha=alpha,
                               drop=drop, interpret=interpret,
                               pe_drop=pe_pack is not None)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((din, dout), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, dout), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, dout), lambda i, *_: (0, 0)),
                pl.BlockSpec((bsz, 1), lambda i, *_: (0, 0)),
                pl.BlockSpec((bsz, 1), lambda i, *_: (0, 0)),
            ] + pe_specs,
            out_specs=pl.BlockSpec((tb, n, dout), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, dout), x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray([seed], jnp.int32), x, w, b_arr,
      z_bias.astype(jnp.float32),
      ngp.reshape(bsz, 1).astype(jnp.int32),
      nsib.reshape(bsz, 1).astype(jnp.int32), *pe_operands)
    if pad:
        out = out[:, :n_orig]
    return out, (x, w, b_arr, z_bias.astype(jnp.float32), pe_padded, meta,
                 n_orig)


def _fused_bwd(p, alpha, drop, interpret, need_dx, residuals, g):
    x, w, b_arr, z_bias, pe_padded, meta, n_orig = residuals
    ngp, nsib, seed = meta
    bsz, n, din = x.shape
    pad = n - n_orig
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    dout = w.shape[1]
    s = n - p - 1
    tb = _pick_tile(bsz, n, din, dout, factor=2)
    grid = (bsz // tb,)
    pe_specs = []
    pe_operands = []
    pe_out_specs = []
    pe_out_shapes = []
    if pe_padded is not None:
        pe, wp = pe_padded
        pe_specs = [pl.BlockSpec(pe.shape, lambda i, *_: (0, 0)),
                    pl.BlockSpec(wp.shape, lambda i, *_: (0, 0))]
        pe_operands = [pe, wp]
        pe_out_specs = [pl.BlockSpec(pe.shape, lambda i, *_: (0, 0)),
                        pl.BlockSpec(wp.shape, lambda i, *_: (0, 0))]
        pe_out_shapes = [jax.ShapeDtypeStruct(pe.shape, jnp.float32),
                         jax.ShapeDtypeStruct(wp.shape, jnp.float32)]
    kernel = functools.partial(_bwd_kernel, p=p, s=s, dout=dout, alpha=alpha,
                               drop=drop, interpret=interpret,
                               pe_drop=pe_padded is not None,
                               need_dx=need_dx)
    dx_specs = ([pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0))]
                if need_dx else [])
    dx_shapes = ([jax.ShapeDtypeStruct((bsz, n, din), x.dtype)]
                 if need_dx else [])
    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, n, din), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((din, dout), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, dout), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, dout), lambda i, *_: (0, 0)),
                pl.BlockSpec((bsz, 1), lambda i, *_: (0, 0)),
                pl.BlockSpec((bsz, 1), lambda i, *_: (0, 0)),
            ] + pe_specs + [
                pl.BlockSpec((tb, n, dout), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=dx_specs + [
                pl.BlockSpec((din, dout), lambda i, *_: (0, 0)),
                pl.BlockSpec((1, dout), lambda i, *_: (0, 0)),
                pl.BlockSpec((n, dout), lambda i, *_: (0, 0)),
            ] + pe_out_specs,
            scratch_shapes=[
                pltpu.VMEM((tb, n, dout), jnp.float32),   # dz assembly
            ],
        ),
        out_shape=dx_shapes + [
            jax.ShapeDtypeStruct((din, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
            jax.ShapeDtypeStruct((n, dout), jnp.float32),
        ] + pe_out_shapes,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray([seed], jnp.int32), x, w, b_arr, z_bias,
      ngp.reshape(bsz, 1).astype(jnp.int32),
      nsib.reshape(bsz, 1).astype(jnp.int32), *pe_operands, g)
    if need_dx:
        dx, results = results[0], results[1:]
    else:
        dx = jnp.zeros((bsz, n, din), x.dtype)
    dw, db, dzb = results[:3]
    if pad:
        dx = dx[:, :n_orig]
        dzb = dzb[:n_orig]
    dpe_pack = None
    if pe_padded is not None:
        dpe, dwp = results[3:]
        if pad:
            dpe = dpe[:n_orig]
        dpe_pack = (dpe, dwp)
    return (dx, dw.astype(w.dtype), db.reshape(-1), dzb, dpe_pack, None)


fused_gcn_layer.defvjp(
    lambda x, w, b, z_bias, pe_pack, meta, p, alpha, drop, interpret,
    need_dx: _fused_fwd(x, w, b, z_bias, pe_pack, meta, p, alpha, drop,
                        interpret),
    _fused_bwd)
