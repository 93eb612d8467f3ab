"""Fused final-layer readout pools (fused_gat_layer_pooled) vs the per-slot
kernel + XLA readout (interpret mode on CPU).

The pooled kernel fuses head mean + per-position-class masked sums into the
final GAT layer; readout_from_pools must reproduce ops/star.py:readout for
MR/WMR/CR/SUM, including gradients through the custom VJP and through the
readout position weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taxoexpan_tpu.models import TaxoExpan
from taxoexpan_tpu.ops import star
from taxoexpan_tpu.ops.pallas_gat import (fused_gat_layer,
                                          fused_gat_layer_pooled)
from tests.test_model_and_losses import P, S, V, D, make_group_batch
from tests.test_pallas_gat import (B, DH, DIN, HEADS, N, P as KP, S as KS,
                                   make_inputs)


def _mk(x, fc, al, ar):
    wa1 = jnp.einsum("ihd,hd->ih", fc.reshape(DIN, HEADS, DH), al)
    wa2 = jnp.einsum("ihd,hd->ih", fc.reshape(DIN, HEADS, DH), ar)
    z_ft = jnp.zeros((N, HEADS * DH), jnp.float32)
    z_a = jnp.zeros((N, HEADS), jnp.float32)
    return wa1, wa2, z_ft, z_a


def pools_reference(x, fc, al, ar, ngp, nsib, seed=0, attn_drop=0.0,
                    feat_drop=0.0):
    """Per-slot fused kernel (same dropout stream) -> class pools in XLA."""
    wa1, wa2, z_ft, z_a = _mk(x, fc, al, ar)
    out = fused_gat_layer(x, fc, wa1, wa2, z_ft, z_a, z_a, None,
                          (ngp, nsib, seed), KP, HEADS, 0.2, attn_drop,
                          feat_drop, None, True)
    h = out.reshape(B, N, HEADS, DH).mean(axis=2)          # head mean
    mask = star.node_mask(ngp, nsib, KP, N)[..., None].astype(h.dtype)
    hm = h * mask
    return jnp.stack([hm[:, :KP].sum(axis=1), hm[:, KP],
                      hm[:, KP + 1:].sum(axis=1)], axis=1)  # [B, 3, DH]


def pools_fused(x, fc, al, ar, ngp, nsib, seed=0, attn_drop=0.0,
                feat_drop=0.0):
    wa1, wa2, z_ft, z_a = _mk(x, fc, al, ar)
    return fused_gat_layer_pooled(x, fc, wa1, wa2, z_ft, z_a, z_a, None,
                                  (ngp, nsib, seed), KP, HEADS, 0.2,
                                  attn_drop, feat_drop, True)


def test_pools_match_per_slot(rng):
    x, fc, al, ar, ngp, nsib = make_inputs(rng)
    want = np.asarray(pools_reference(x, fc, al, ar, ngp, nsib))
    got = np.asarray(pools_fused(x, fc, al, ar, ngp, nsib))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pools_match_with_dropout(rng):
    """Same seed => both kernels draw the identical per-tile mask stream, so
    pooled and per-slot paths agree exactly even in train mode."""
    x, fc, al, ar, ngp, nsib = make_inputs(rng)
    want = np.asarray(pools_reference(x, fc, al, ar, ngp, nsib, seed=7,
                                      attn_drop=0.3, feat_drop=0.25))
    got = np.asarray(pools_fused(x, fc, al, ar, ngp, nsib, seed=7,
                                 attn_drop=0.3, feat_drop=0.25))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pools_vjp_matches(rng):
    x, fc, al, ar, ngp, nsib = make_inputs(rng)
    cot = jnp.asarray(rng.normal(size=(B, 3, DH)).astype(np.float32))

    def loss_ref(x, fc):
        return (pools_reference(x, fc, al, ar, ngp, nsib) * cot).sum()

    def loss_fused(x, fc):
        return (pools_fused(x, fc, al, ar, ngp, nsib) * cot).sum()

    gx_ref, gfc_ref = jax.grad(loss_ref, argnums=(0, 1))(x, fc)
    gx_f, gfc_f = jax.grad(loss_fused, argnums=(0, 1))(x, fc)
    mask = np.asarray(star.node_mask(ngp, nsib, KP, N))
    np.testing.assert_allclose(np.asarray(gx_f)[mask],
                               np.asarray(gx_ref)[mask],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gfc_f), np.asarray(gfc_ref),
                               rtol=1e-3, atol=1e-4)


def test_pools_vjp_with_dropout_gradcheck(rng):
    """Finite differences through the pooled kernel with both dropouts on:
    the backward must replay the identical mask stream."""
    x, fc, al, ar, ngp, nsib = make_inputs(rng)
    cot = jnp.asarray(rng.normal(size=(B, 3, DH)).astype(np.float32))

    def f(xv):
        return (pools_fused(xv, fc, al, ar, ngp, nsib, seed=99,
                            attn_drop=0.3, feat_drop=0.25) * cot).sum()

    g = jax.grad(f)(x)
    eps = 1e-3
    for (i, j, k) in [(0, KP, 0), (1, 0, 2), (2, KP + 1, 3), (3, KP, 5)]:
        xp = x.at[i, j, k].add(eps)
        xm = x.at[i, j, k].add(-eps)
        num = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i, j, k]), float(num), rtol=5e-2,
                                   atol=5e-3)


def test_readout_from_pools_matches_readout(rng):
    h = jnp.asarray(rng.normal(size=(B, N, DH)).astype(np.float32))
    ngp = jnp.asarray(rng.integers(0, KP + 1, (B,)).astype(np.int32))
    nsib = jnp.asarray(rng.integers(0, KS + 1, (B,)).astype(np.int32))
    mask = star.node_mask(ngp, nsib, KP, N)[..., None].astype(h.dtype)
    hm = h * mask
    pools = jnp.stack([hm[:, :KP].sum(axis=1), hm[:, KP],
                       hm[:, KP + 1:].sum(axis=1)], axis=1)
    pw = jnp.asarray(rng.normal(size=(3, 1)).astype(np.float32))
    for kind, w in [("MR", None), ("WMR", pw), ("CR", None), ("SUM", None)]:
        want = np.asarray(star.readout(h, ngp, nsib, KP, kind=kind,
                                       position_weights=w))
        got = np.asarray(star.readout_from_pools(pools, ngp, nsib, kind=kind,
                                                 position_weights=w))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, err_msg=kind)


@pytest.mark.parametrize("readout", ["MR", "WMR", "CR"])
def test_model_encode_pooled_matches_xla(rng, readout):
    """TaxoExpan encode routes through the pooled kernel on the pallas path;
    values and all parameter gradients (incl. the WMR position weights) must
    match the XLA star path."""
    kwargs = dict(in_dim=D, hidden_dim=16, out_dim=8, pos_dim=4, num_layers=1,
                  heads=[2, 1], feat_drop=0.0, attn_drop=0.0, max_parents=P,
                  expand_factor=S)
    m_xla = TaxoExpan("PGAT", readout, "BIM", kernel="xla", **kwargs)
    m_pal = TaxoExpan("PGAT", readout, "BIM", kernel="pallas", **kwargs)
    params = m_xla.init(jax.random.PRNGKey(0))
    table = jax.numpy.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng, g=4, c=2)

    def fwd(m):
        def f(p):
            s = m.forward(p, batch, table, rng=jax.random.PRNGKey(1),
                          train=False)
            return (s ** 2).sum(), s
        return f

    (l_xla, s_xla), g_xla = jax.value_and_grad(fwd(m_xla), has_aux=True)(params)
    (l_pal, s_pal), g_pal = jax.value_and_grad(fwd(m_pal), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_xla),
                               rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-4)


def test_pooled_stored_attn_grads_match_recompute(rng, monkeypatch):
    """Pooled-kernel variant of the stored-attention parity check: the
    stored backward (TAXOEXPAN_STORED_ATTN=1) must reproduce the recompute
    backward's gradients, dropout on."""
    x, fc, al, ar, ngp, nsib = make_inputs(rng)

    def loss(args, seed):
        x_, fc_ = args
        out = pools_fused(x_, fc_, al, ar, ngp, nsib, seed=seed,
                          attn_drop=0.3, feat_drop=0.2)
        return (out ** 2).sum()

    monkeypatch.setenv("TAXOEXPAN_STORED_ATTN", "0")
    v0, g0 = jax.value_and_grad(loss)((x, fc), 5)
    monkeypatch.setenv("TAXOEXPAN_STORED_ATTN", "1")
    v1, g1 = jax.value_and_grad(loss)((x, fc), 5)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
