"""Fused position-embedding dropout (pe_pack path of ops/pallas_gat.py).

pos_mode="bias" decomposes [h, pe] @ W into h @ W_h + pe @ W_p. In train
mode the reference drops the FULL concatenated input (model_zoo.py:82),
including the pe columns; the fused kernels reproduce that by drawing a
per-node keep-mask over the pe columns on-chip. These tests replay the
kernel's interpret-mode mask stream in numpy/XLA to check exactness, and
finite-difference the custom VJP (including the dpe / dW_p path).
"""
import jax
import jax.numpy as jnp
import numpy as np

from taxoexpan_tpu.ops import star
from taxoexpan_tpu.ops.pallas_gat import (fused_gat_layer,
                                          fused_gat_layer_pooled)

P, S = 3, 8
N = P + 1 + S            # 12 -> slot-padded to 16 inside the kernel
NPAD = 16
HEADS, DH, DIN, POS = 2, 4, 6, 5
B = 8                    # single tile (tb=8, tile_idx=0) in interpret mode
FEAT_DROP = 0.4
SEED = 777


def make_inputs(rng):
    x = rng.normal(size=(B, N, DIN)).astype(np.float32)
    pe = rng.normal(size=(N, POS)).astype(np.float32)
    fc_full = rng.normal(size=(DIN + POS, HEADS * DH)).astype(np.float32) * .3
    al = rng.normal(size=(HEADS, DH)).astype(np.float32) * 0.3
    ar = rng.normal(size=(HEADS, DH)).astype(np.float32) * 0.3
    ngp = rng.integers(1, P + 1, (B,)).astype(np.int32)
    nsib = rng.integers(0, S + 1, (B,)).astype(np.int32)
    from taxoexpan_tpu.data.egobatch import slot_mask
    x = x * np.asarray(slot_mask(ngp, nsib, P, S))[..., None]
    return map(jnp.asarray, (x, pe, fc_full, al, ar, ngp, nsib))


def _wa(fc_full, attn):
    return jnp.einsum("ihd,hd->ih", fc_full.reshape(-1, HEADS, DH), attn)


def fused(x, pe, fc_full, al, ar, ngp, nsib, pooled=False):
    wa1f, wa2f = _wa(fc_full, al), _wa(fc_full, ar)
    z_ft = jnp.zeros((N, HEADS * DH), jnp.float32)
    z_a = jnp.zeros((N, HEADS), jnp.float32)
    pe_pack = (pe, fc_full[DIN:], wa1f[DIN:], wa2f[DIN:])
    if pooled:
        return fused_gat_layer_pooled(
            x, fc_full[:DIN], wa1f[:DIN], wa2f[:DIN], z_ft, z_a, z_a,
            pe_pack, (ngp, nsib, SEED), P, HEADS, 0.2, 0.0, FEAT_DROP, True)
    return fused_gat_layer(
        x, fc_full[:DIN], wa1f[:DIN], wa2f[:DIN], z_ft, z_a, z_a,
        pe_pack, (ngp, nsib, SEED), P, HEADS, 0.2, 0.0, FEAT_DROP, None,
        True)


def replayed_reference(x, pe, fc_full, al, ar, ngp, nsib):
    """Reference concat-input GAT using the IDENTICAL interpret-mode mask
    stream the kernel draws (_gen_masks: feat mask first, then pe mask, at
    the slot-PADDED shapes), so outputs must match exactly."""
    key = jax.random.PRNGKey(SEED + 0)           # tile_idx == 0
    keep = 1.0 - FEAT_DROP

    def mask(i, shape):
        k = jax.random.fold_in(key, i)
        return jax.random.bernoulli(k, keep, shape).astype(jnp.float32) / keep

    feat_mask = mask(1, (B * NPAD, DIN))
    pe_mask = mask(2, (B * NPAD, POS))
    pad = NPAD - N
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    pep = jnp.pad(pe, ((0, pad), (0, 0)))
    xm = xp.reshape(B * NPAD, DIN) * feat_mask
    pem = pe_mask.reshape(B, NPAD, POS) * pep[None]
    inp = jnp.concatenate([xm.reshape(B, NPAD, DIN), pem], axis=-1)
    ft = (inp @ fc_full).reshape(B, NPAD, HEADS, DH)
    a1 = (ft * al).sum(-1)
    a2 = (ft * ar).sum(-1)
    out = star.gat_attention_aggregate(ft, a1, a2, ngp, nsib, P,
                                       leaky_alpha=0.2, mask_output=False)
    return out.reshape(B, NPAD, HEADS * DH)[:, :N]


def test_pe_drop_forward_matches_replayed_reference(rng):
    x, pe, fc_full, al, ar, ngp, nsib = make_inputs(rng)
    want = np.asarray(replayed_reference(x, pe, fc_full, al, ar, ngp, nsib))
    got = np.asarray(fused(x, pe, fc_full, al, ar, ngp, nsib))
    mask = np.asarray(star.node_mask(ngp, nsib, P, N))
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-5)


def test_pe_drop_vjp_matches_replayed_reference(rng):
    """Analytic grads of the fused kernel (incl. dpe / dW_p via pe_pack) vs
    jax.grad of the mask-replaying reference."""
    x, pe, fc_full, al, ar, ngp, nsib = make_inputs(rng)
    cot = jnp.asarray(rng.normal(size=(B, N, HEADS * DH)).astype(np.float32))
    mask = star.node_mask(ngp, nsib, P, N)
    cot = cot * mask[..., None]

    def loss_ref(x, pe, fc_full):
        return (replayed_reference(x, pe, fc_full, al, ar, ngp, nsib)
                * cot).sum()

    def loss_fused(x, pe, fc_full):
        return (fused(x, pe, fc_full, al, ar, ngp, nsib) * cot).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, pe, fc_full)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, pe, fc_full)
    np.testing.assert_allclose(np.asarray(g_f[0])[np.asarray(mask)],
                               np.asarray(g_ref[0])[np.asarray(mask)],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_ref[1]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_ref[2]),
                               rtol=1e-3, atol=1e-4)


def test_pe_drop_pooled_matches_per_slot(rng):
    """Pooled final-layer variant draws the same mask stream -> its pools
    equal the per-slot output pooled in XLA."""
    x, pe, fc_full, al, ar, ngp, nsib = make_inputs(rng)
    out = fused(x, pe, fc_full, al, ar, ngp, nsib)
    h = out.reshape(B, N, HEADS, DH).mean(axis=2)
    m = star.node_mask(ngp, nsib, P, N)[..., None].astype(h.dtype)
    hm = h * m
    want = jnp.stack([hm[:, :P].sum(axis=1), hm[:, P],
                      hm[:, P + 1:].sum(axis=1)], axis=1)
    got = fused(x, pe, fc_full, al, ar, ngp, nsib, pooled=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pe_drop_pooled_gradcheck(rng):
    """Finite-difference gradcheck of the pooled backward through the pe
    path (dpe), with attention dropout on as well."""
    x, pe, fc_full, al, ar, ngp, nsib = make_inputs(rng)
    wa1f, wa2f = _wa(fc_full, al), _wa(fc_full, ar)
    z_ft = jnp.zeros((N, HEADS * DH), jnp.float32)
    z_a = jnp.zeros((N, HEADS), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, 3, DH)).astype(np.float32))

    def f(pev):
        pe_pack = (pev, fc_full[DIN:], wa1f[DIN:], wa2f[DIN:])
        out = fused_gat_layer_pooled(
            x, fc_full[:DIN], wa1f[:DIN], wa2f[:DIN], z_ft, z_a, z_a,
            pe_pack, (ngp, nsib, SEED), P, HEADS, 0.2, 0.3, FEAT_DROP, True)
        return (out * cot).sum()

    g = jax.grad(f)(pe)
    eps = 1e-3
    for (i, j) in [(0, 0), (P, 2), (P + 1, 4), (N - 1, 1)]:
        pp = pe.at[i, j].add(eps)
        pm = pe.at[i, j].add(-eps)
        num = (f(pp) - f(pm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i, j]), float(num), rtol=5e-2,
                                   atol=5e-3)


def test_model_level_bias_mode_trains_pe(rng):
    """GAT(pos_mode='bias', use_pallas) in train mode with feat_drop > 0:
    gradients reach the position embeddings through the fused pe path."""
    from taxoexpan_tpu.models.propagation import GAT

    gat = GAT(in_dim=DIN, hidden_dim=6, out_dim=4, num_layers=1,
              heads=[2, 1], pos_dim=POS, feat_drop=0.3, attn_drop=0.2,
              use_pallas=True, pos_mode="bias")
    params = gat.init(jax.random.PRNGKey(0))
    x, pe, fc_full, al, ar, ngp, nsib = make_inputs(rng)

    def loss(p):
        out = gat.apply(p, x, ngp, nsib, P, rng=jax.random.PRNGKey(1),
                        train=True)
        return (out ** 2).sum()

    g = jax.grad(loss)(params)
    for layer_pe in g["pos_emb"]:
        norm = float(jnp.abs(layer_pe["emb"]).sum())
        assert np.isfinite(norm) and norm > 0.0
