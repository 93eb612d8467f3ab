"""Fused Pallas star-GAT layer vs the XLA star path (interpret mode on CPU).

Checks forward values and analytic VJP (the hand-written backward kernel)
against jax.grad of the reference star implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taxoexpan_tpu.ops import star
from taxoexpan_tpu.ops.pallas_gat import fused_gat_layer

P, S = 3, 8
N = P + 1 + S
HEADS, DH, DIN = 2, 4, 6
B = 8


def make_inputs(rng):
    x = rng.normal(size=(B, N, DIN)).astype(np.float32)
    fc = rng.normal(size=(DIN, HEADS * DH)).astype(np.float32) * 0.3
    al = rng.normal(size=(HEADS, DH)).astype(np.float32) * 0.3
    ar = rng.normal(size=(HEADS, DH)).astype(np.float32) * 0.3
    ngp = rng.integers(0, P + 1, (B,)).astype(np.int32)
    nsib = rng.integers(0, S + 1, (B,)).astype(np.int32)
    # zero padded slots like gather_feats does
    from taxoexpan_tpu.data.egobatch import slot_mask
    x = x * np.asarray(slot_mask(ngp, nsib, P, S))[..., None]
    return map(jnp.asarray, (x, fc, al, ar, ngp, nsib))


def xla_reference(x, fc, al, ar, ngp, nsib):
    ft = (x @ fc).reshape(B, N, HEADS, DH)
    a1 = (ft * al).sum(-1)
    a2 = (ft * ar).sum(-1)
    out = star.gat_attention_aggregate(ft, a1, a2, ngp, nsib, P,
                                       leaky_alpha=0.2, mask_output=False)
    return out.reshape(B, N, HEADS * DH)


def fused(x, fc, al, ar, ngp, nsib):
    wa1 = jnp.einsum("ihd,hd->ih", fc.reshape(DIN, HEADS, DH), al)
    wa2 = jnp.einsum("ihd,hd->ih", fc.reshape(DIN, HEADS, DH), ar)
    z_ft = jnp.zeros((N, HEADS * DH), jnp.float32)
    z_a = jnp.zeros((N, HEADS), jnp.float32)
    return fused_gat_layer(x, fc, wa1, wa2, z_ft, z_a, z_a, None,
                           (ngp, nsib, 0), P, HEADS, 0.2, 0.0, 0.0,
                           None, True)


def test_forward_matches(rng):
    x, fc, al, ar, ngp, nsib = make_inputs(rng)
    want = np.asarray(xla_reference(x, fc, al, ar, ngp, nsib))
    got = np.asarray(fused(x, fc, al, ar, ngp, nsib))
    mask = np.asarray(star.node_mask(ngp, nsib, P, N))
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-5)


def test_vjp_matches(rng):
    x, fc, al, ar, ngp, nsib = make_inputs(rng)
    cot = jnp.asarray(rng.normal(size=(B, N, HEADS * DH)).astype(np.float32))
    # mask cotangent to valid slots: invalid-slot outputs are unspecified in
    # the fused kernel (mask_output=False semantics)
    mask = star.node_mask(ngp, nsib, P, N)
    cot = cot * mask[..., None]

    def loss_ref(x, fc):
        return (xla_reference(x, fc, al, ar, ngp, nsib) * cot).sum()

    def loss_fused(x, fc):
        return (fused(x, fc, al, ar, ngp, nsib) * cot).sum()

    gx_ref, gfc_ref = jax.grad(loss_ref, argnums=(0, 1))(x, fc)
    gx_f, gfc_f = jax.grad(loss_fused, argnums=(0, 1))(x, fc)
    # x grads on valid slots
    np.testing.assert_allclose(np.asarray(gx_f)[np.asarray(mask)],
                               np.asarray(gx_ref)[np.asarray(mask)],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gfc_f), np.asarray(gfc_ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("ngp_val,nsib_val", [(0, 0), (P, S)])
def test_degenerate_fanouts(rng, ngp_val, nsib_val):
    x, fc, al, ar, _, _ = make_inputs(rng)
    ngp = jnp.full((B,), ngp_val, jnp.int32)
    nsib = jnp.full((B,), nsib_val, jnp.int32)
    want = np.asarray(xla_reference(x, fc, al, ar, ngp, nsib))
    got = np.asarray(fused(x, fc, al, ar, ngp, nsib))
    mask = np.asarray(star.node_mask(ngp, nsib, P, N))
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-5)


def test_fused_dropout_and_activation_gradcheck(rng):
    """Finite-difference gradcheck with fused feat/attn dropout and output
    activation: validates that the backward kernel replays the identical
    dropout masks and chains through leaky'(pre)."""
    x, fc, al, ar, ngp, nsib = make_inputs(rng)
    wa1 = jnp.einsum("ihd,hd->ih", fc.reshape(DIN, HEADS, DH), al)
    wa2 = jnp.einsum("ihd,hd->ih", fc.reshape(DIN, HEADS, DH), ar)
    z_ft = jnp.zeros((N, HEADS * DH), jnp.float32)
    z_a = jnp.zeros((N, HEADS), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, N, HEADS * DH)).astype(np.float32))

    def f(xv):
        out = fused_gat_layer(xv, fc, wa1, wa2, z_ft, z_a, z_a, None,
                              (ngp, nsib, 123), P, HEADS, 0.2,
                              0.3, 0.4, 0.01, True)
        return (out * cot).sum()

    g = jax.grad(f)(x)
    # check a handful of coordinates against central differences
    eps = 1e-3
    idx = [(0, P, 0), (1, 0, 2), (2, P + 1, 3), (3, P, 5)]
    for (i, j, k) in idx:
        xp = x.at[i, j, k].add(eps)
        xm = x.at[i, j, k].add(-eps)
        num = (f(xp) - f(xm)) / (2 * eps)
        ana = g[i, j, k]
        np.testing.assert_allclose(float(ana), float(num), rtol=5e-2,
                                   atol=5e-3)


def test_stored_attn_grads_match_recompute(rng, monkeypatch):
    """The stored-attention backward (default) must produce the same grads
    as the round-3 recompute backward (TAXOEXPAN_STORED_ATTN=0), with
    dropout ON so the mask-replay composition is covered too."""
    x, fc, al, ar, ngp, nsib = make_inputs(rng)

    def loss(args, seed):
        x_, fc_ = args
        wa1 = jnp.einsum("ihd,hd->ih", fc_.reshape(DIN, HEADS, DH), al)
        wa2 = jnp.einsum("ihd,hd->ih", fc_.reshape(DIN, HEADS, DH), ar)
        z_ft = jnp.zeros((N, HEADS * DH), jnp.float32)
        z_a = jnp.zeros((N, HEADS), jnp.float32)
        out = fused_gat_layer(x_, fc_, wa1, wa2, z_ft, z_a, z_a, None,
                              (ngp, nsib, seed), P, HEADS, 0.2, 0.3, 0.2,
                              None, True)
        return (out ** 2).sum()

    monkeypatch.setenv("TAXOEXPAN_STORED_ATTN", "0")
    v0, g0 = jax.value_and_grad(loss)((x, fc), 7)
    monkeypatch.setenv("TAXOEXPAN_STORED_ATTN", "1")
    v1, g1 = jax.value_and_grad(loss)((x, fc), 7)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
