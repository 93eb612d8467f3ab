"""Fused Pallas star-GCN layer (ops/pallas_gcn.py) vs the XLA oracle
(models/propagation.py:apply_gcn_layer), interpret mode on CPU.

Covers: forward parity (GCN and pos-bias PGCN, with/without activation),
analytic VJP vs jax.grad of the oracle (incl. the z_bias cotangent chain
to pe / W_p), the pe_pack train-dropout path against a replayed-mask
reference, need_dx=False, model-level kernel="pallas" parity, and the
shard_map SPMD wrapper on the 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taxoexpan_tpu.models.propagation import apply_gcn_layer, leaky_relu
from taxoexpan_tpu.ops import star
from taxoexpan_tpu.ops.pallas_gcn import fused_gcn_layer

P, S = 3, 8
N = P + 1 + S            # 12 -> slot-padded to 16 inside the kernel
NPAD = 16
DIN, DOUT, POS = 6, 8, 5
B = 8                    # single tile in interpret mode
SEED = 777


def make_inputs(rng, pos=False):
    x = rng.normal(size=(B, N, DIN)).astype(np.float32)
    w_cols = DIN + (POS if pos else 0)
    w = rng.normal(size=(w_cols, DOUT)).astype(np.float32) * 0.3
    b = rng.normal(size=(DOUT,)).astype(np.float32) * 0.1
    pe = rng.normal(size=(N, POS)).astype(np.float32) if pos else None
    ngp = rng.integers(1, P + 1, (B,)).astype(np.int32)
    nsib = rng.integers(0, S + 1, (B,)).astype(np.int32)
    from taxoexpan_tpu.data.egobatch import slot_mask
    x = x * np.asarray(slot_mask(ngp, nsib, P, S))[..., None]
    out = [jnp.asarray(v) for v in (x, w, b, ngp, nsib)]
    out.append(jnp.asarray(pe) if pos else None)
    return out


def _norm(ngp, nsib):
    deg = star.in_degrees(ngp, nsib, P, N)
    return jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                     0.0)[..., None]


def oracle(x, w, b, ngp, nsib, pe=None, act=leaky_relu):
    return apply_gcn_layer({"w": w, "b": b}, x, _norm(ngp, nsib), ngp, nsib,
                           P, activation=act, drop_rate=0.0,
                           rng=jax.random.PRNGKey(0), train=False,
                           pos_emb=pe)


def fused(x, w, b, ngp, nsib, pe=None, act=leaky_relu):
    if pe is not None:
        w_h, w_p = w[:DIN], w[DIN:]
        z_bias = pe @ w_p
    else:
        w_h = w
        z_bias = jnp.zeros((N, DOUT), jnp.float32)
    alpha = 0.01 if act is not None else None
    return fused_gcn_layer(x, w_h, b, z_bias, None, (ngp, nsib, SEED), P,
                           alpha, 0.0, True, True)


@pytest.mark.parametrize("act", [leaky_relu, None])
def test_forward_matches(rng, act):
    x, w, b, ngp, nsib, _ = make_inputs(rng)
    want = np.asarray(oracle(x, w, b, ngp, nsib, act=act))
    got = np.asarray(fused(x, w, b, ngp, nsib, act=act))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_forward_matches_pos_bias(rng):
    x, w, b, ngp, nsib, pe = make_inputs(rng, pos=True)
    want = np.asarray(oracle(x, w, b, ngp, nsib, pe=pe))
    got = np.asarray(fused(x, w, b, ngp, nsib, pe=pe))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vjp_matches_oracle(rng):
    x, w, b, ngp, nsib, pe = make_inputs(rng, pos=True)

    def loss_oracle(x, w, b, pe):
        return (oracle(x, w, b, ngp, nsib, pe=pe) ** 2).sum()

    def loss_fused(x, w, b, pe):
        return (fused(x, w, b, ngp, nsib, pe=pe) ** 2).sum()

    g_want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(x, w, b, pe)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, b, pe)
    for name, a, e in zip("x w b pe".split(), g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_need_dx_false_skips_x_grad(rng):
    x, w, b, ngp, nsib, _ = make_inputs(rng)
    z_bias = jnp.zeros((N, DOUT), jnp.float32)

    def loss(x, w):
        out = fused_gcn_layer(x, w, b, z_bias, None, (ngp, nsib, SEED), P,
                              0.01, 0.0, True, False)
        return (out ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert float(jnp.abs(gx).max()) == 0.0
    want = jax.grad(
        lambda w: (oracle(x, w, b, ngp, nsib) ** 2).sum())(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


FEAT_DROP = 0.4


def test_pe_drop_forward_matches_replayed_reference(rng):
    x, w, b, ngp, nsib, pe = make_inputs(rng, pos=True)
    got = fused_gcn_layer(x, w[:DIN], b, jnp.zeros((N, DOUT), jnp.float32),
                          (pe, w[DIN:]), (ngp, nsib, SEED), P, 0.01,
                          FEAT_DROP, True, True)

    # replay the kernel's interpret-mode mask stream (_gen_masks: feat mask
    # i=1 then pe mask i=2, at slot-PADDED shapes)
    key = jax.random.PRNGKey(SEED + 0)
    keep = 1.0 - FEAT_DROP

    def mask(i, shape):
        k = jax.random.fold_in(key, i)
        return jax.random.bernoulli(k, keep, shape).astype(jnp.float32) / keep

    feat_mask = mask(1, (B * NPAD, DIN))
    pe_mask = mask(2, (B * NPAD, POS))
    pad = NPAD - N
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    pep = jnp.pad(pe, ((0, pad), (0, 0)))
    xm = (xp.reshape(B * NPAD, DIN) * feat_mask).reshape(B, NPAD, DIN)
    pem = pe_mask.reshape(B, NPAD, POS) * pep[None]
    inp = jnp.concatenate([xm, pem], axis=-1)
    ngp_p, nsib_p = ngp, nsib   # padded slots are invalid siblings
    deg = star.in_degrees(ngp_p, nsib_p, P, NPAD)
    norm = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                     0.0)[..., None]
    z = (inp @ w) * norm
    agg = star.copy_src_sum(z, ngp_p, nsib_p, P) * norm + b
    want = leaky_relu(agg)[:, :N]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pe_drop_grads_deterministic(rng):
    x, w, b, ngp, nsib, pe = make_inputs(rng, pos=True)

    def loss(w, pe):
        out = fused_gcn_layer(
            x, w[:DIN], b, jnp.zeros((N, DOUT), jnp.float32),
            (pe, w[DIN:]), (ngp, nsib, SEED), P, 0.01, FEAT_DROP, True,
            False)
        return (out ** 2).sum()

    g1 = jax.grad(loss, argnums=(0, 1))(w, pe)
    g2 = jax.grad(loss, argnums=(0, 1))(w, pe)
    for a, c in zip(g1, g2):   # fwd/bwd mask replay is deterministic
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=0)
    assert all(bool(jnp.isfinite(t).all()) for t in g1)


def test_model_level_pgcn_pallas_matches_xla(rng):
    from taxoexpan_tpu.models import TaxoExpan

    kw = dict(in_dim=DIN, hidden_dim=8, out_dim=8, pos_dim=POS,
              num_layers=1, feat_drop=0.0, max_parents=P, expand_factor=S)
    m_x = TaxoExpan("PGCN", "WMR", "BIM", kernel="xla", **kw)
    m_p = TaxoExpan("PGCN", "WMR", "BIM", kernel="pallas", **kw)
    params = m_x.init(jax.random.PRNGKey(3))
    feats = jnp.asarray(rng.normal(size=(B, N, DIN)).astype(np.float32))
    ngp = jnp.asarray(rng.integers(1, P + 1, (B,)).astype(np.int32))
    nsib = jnp.asarray(rng.integers(0, S + 1, (B,)).astype(np.int32))
    from taxoexpan_tpu.data.egobatch import slot_mask
    feats = feats * jnp.asarray(np.asarray(slot_mask(
        np.asarray(ngp), np.asarray(nsib), P, S)))[..., None]
    hx = m_x.encode(params, feats, ngp, nsib, rng=jax.random.PRNGKey(0),
                    train=False)
    hp = m_p.encode(params, feats, ngp, nsib, rng=jax.random.PRNGKey(0),
                    train=False)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hx), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gcn_spmd_matches_single_device(rng):
    from taxoexpan_tpu.models.propagation import GCN
    from taxoexpan_tpu.parallel import data_parallel_mesh

    gcn = GCN(DIN, 8, 8, 1, pos_dim=POS, in_dropout=0.0, hidden_dropout=0.0,
              use_pallas=True)
    params = gcn.init(jax.random.PRNGKey(5))
    feats = jnp.asarray(rng.normal(size=(B, N, DIN)).astype(np.float32))
    ngp = jnp.asarray(rng.integers(1, P + 1, (B,)).astype(np.int32))
    nsib = jnp.asarray(rng.integers(0, S + 1, (B,)).astype(np.int32))
    ref = gcn.apply(params, feats, ngp, nsib, P,
                    rng=jax.random.PRNGKey(0), train=False)
    gcn.spmd = (data_parallel_mesh(), "dp")
    got = gcn.apply(params, feats, ngp, nsib, P,
                    rng=jax.random.PRNGKey(0), train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
