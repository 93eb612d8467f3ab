"""Kernel parity tests: star closed form == generic segment kernels == a numpy
oracle implementing the reference's DGL semantics (SURVEY.md §4: per-layer
allclose vs reference semantics).

The oracle mirrors model/model_zoo.py exactly: symmetric-norm GCN
(model_zoo.py:34-50), GAT attention with leaky_relu(a1[src]+a2[dst]) +
per-destination softmax (model_zoo.py:80-114), and DGL readouts
(weight-multiply then divide by node count)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taxoexpan_tpu.data.egobatch import (EgoBatch, ego_batch_edges,
                                         make_ego_batch, slot_mask)
from taxoexpan_tpu.ops import segment, star

P, S = 3, 5          # max_parents, expand_factor
N = P + 1 + S


def random_batch(rng, b=6):
    egos = []
    for _ in range(b):
        ngp = int(rng.integers(0, P + 1))
        nsib = int(rng.integers(0, S + 1))
        gps = rng.integers(0, 100, size=ngp).tolist()
        sibs = rng.integers(0, 100, size=nsib).tolist()
        egos.append((gps, int(rng.integers(0, 100)), sibs))
    batch = make_ego_batch(egos, P, S)
    h = rng.normal(size=(b, N, 4)).astype(np.float32)
    # zero padded slots as gather_feats does
    h = h * np.asarray(slot_mask(batch.ngp, batch.nsib, P, S))[..., None]
    return batch, h


def valid_edges(batch):
    src, dst, mask = ego_batch_edges(batch, P, S)
    return src[mask], dst[mask]


# ------------------------------------------------------------------ oracles

def oracle_spmm(h_flat, src, dst):
    out = np.zeros_like(h_flat)
    for s, d in zip(src, dst):
        out[d] += h_flat[s]
    return out


def oracle_gcn_layer(h_flat, src, dst, w, bias):
    """model_zoo.py:34-50 + degree norm from :130-134."""
    n = h_flat.shape[0]
    deg = np.zeros(n)
    for d in dst:
        deg[d] += 1
    with np.errstate(divide="ignore"):
        norm = deg ** -0.5
    norm[np.isinf(norm)] = 0
    x = (h_flat @ w) * norm[:, None]
    out = oracle_spmm(x, src, dst)
    out = out * norm[:, None] + bias
    return np.where(out >= 0, out, 0.01 * out)   # F.leaky_relu default


def oracle_gat_attention(ft, a1, a2, src, dst, alpha=0.2):
    """model_zoo.py:89-114 (no dropout): per-dst softmax + weighted agg."""
    n, h, dh = ft.shape
    out = np.zeros_like(ft)
    for d in range(n):
        in_src = [s for s, dd in zip(src, dst) if dd == d]
        if not in_src:
            continue
        logits = np.stack([a1[s] + a2[d] for s in in_src])      # [k, H]
        logits = np.where(logits >= 0, logits, alpha * logits)
        e = np.exp(logits - logits.max(axis=0))
        attn = e / e.sum(axis=0)
        out[d] = sum(attn[i][:, None] * ft[s]
                     for i, s in enumerate(in_src))
    return out


# -------------------------------------------------------------------- tests

def test_in_degrees_match(rng):
    batch, _ = random_batch(rng)
    src, dst = valid_edges(batch)
    flat = np.zeros(batch.batch_size * N)
    for d in dst:
        flat[d] += 1
    star_deg = np.asarray(star.in_degrees(
        jnp.asarray(batch.ngp), jnp.asarray(batch.nsib), P, N)).reshape(-1)
    np.testing.assert_allclose(star_deg, flat)
    seg_deg = np.asarray(segment.in_degrees(
        jnp.asarray(dst), batch.batch_size * N))
    np.testing.assert_allclose(seg_deg, flat)


def test_spmm_star_vs_segment_vs_oracle(rng):
    batch, h = random_batch(rng)
    b = batch.batch_size
    src, dst = valid_edges(batch)
    h_flat = h.reshape(b * N, -1)

    want = oracle_spmm(h_flat, src, dst)
    got_seg = np.asarray(segment.spmm(jnp.asarray(h_flat), jnp.asarray(src),
                                      jnp.asarray(dst), b * N))
    np.testing.assert_allclose(got_seg, want, rtol=1e-5, atol=1e-5)

    got_star = np.asarray(star.copy_src_sum(
        jnp.asarray(h), jnp.asarray(batch.ngp), jnp.asarray(batch.nsib), P))
    mask = np.asarray(slot_mask(batch.ngp, batch.nsib, P, S)).reshape(-1)
    np.testing.assert_allclose(got_star.reshape(b * N, -1)[mask],
                               want[mask], rtol=1e-5, atol=1e-5)


def test_gcn_layer_parity(rng):
    from taxoexpan_tpu.models.propagation import apply_gcn_layer, init_gcn_layer
    batch, h = random_batch(rng)
    b = batch.batch_size
    params = init_gcn_layer(jax.random.PRNGKey(0), 4, 7)
    src, dst = valid_edges(batch)
    want = oracle_gcn_layer(h.reshape(b * N, -1), src, dst,
                            np.asarray(params["w"]), np.asarray(params["b"]))

    ngp, nsib = jnp.asarray(batch.ngp), jnp.asarray(batch.nsib)
    deg = star.in_degrees(ngp, nsib, P, N)
    norm = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    got = apply_gcn_layer(params, jnp.asarray(h), norm[..., None], ngp, nsib,
                          P, activation=lambda x: jnp.where(x >= 0, x, 0.01 * x),
                          drop_rate=0.0, rng=jax.random.PRNGKey(1), train=False)
    mask = np.asarray(slot_mask(batch.ngp, batch.nsib, P, S)).reshape(-1)
    np.testing.assert_allclose(np.asarray(got).reshape(b * N, -1)[mask],
                               want[mask], rtol=1e-4, atol=1e-4)


def test_gat_attention_parity(rng):
    batch, h = random_batch(rng)
    b, heads, dh = batch.batch_size, 2, 3
    fc = rng.normal(size=(4, heads * dh)).astype(np.float32)
    al = rng.normal(size=(heads, dh)).astype(np.float32)
    ar = rng.normal(size=(heads, dh)).astype(np.float32)

    ft = (h @ fc).reshape(b, N, heads, dh)
    a1 = (ft * al).sum(-1)
    a2 = (ft * ar).sum(-1)

    src, dst = valid_edges(batch)
    want = oracle_gat_attention(ft.reshape(b * N, heads, dh),
                                a1.reshape(b * N, -1), a2.reshape(b * N, -1),
                                src, dst)

    got = star.gat_attention_aggregate(
        jnp.asarray(ft), jnp.asarray(a1), jnp.asarray(a2),
        jnp.asarray(batch.ngp), jnp.asarray(batch.nsib), P)
    mask = np.asarray(slot_mask(batch.ngp, batch.nsib, P, S)).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(got).reshape(b * N, heads, dh)[mask], want[mask],
        rtol=1e-4, atol=1e-5)

    # generic segment path: SDDMM -> edge_softmax -> SpMM
    sddmm_logits = segment.sddmm(jnp.asarray(a1.reshape(b * N, -1)),
                                 jnp.asarray(a2.reshape(b * N, -1)),
                                 jnp.asarray(src), jnp.asarray(dst))
    logits = jnp.where(sddmm_logits >= 0, sddmm_logits, 0.2 * sddmm_logits)
    attn = segment.edge_softmax(logits, jnp.asarray(dst), b * N)
    got_seg = segment.spmm(jnp.asarray(ft.reshape(b * N, heads, dh)),
                           jnp.asarray(src), jnp.asarray(dst), b * N,
                           edge_weight=attn[..., None])
    np.testing.assert_allclose(np.asarray(got_seg)[mask], want[mask],
                               rtol=1e-4, atol=1e-5)


def test_edge_softmax_masked(rng):
    # masked (padded) edges get zero weight and real edges renormalize
    logits = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    dst = jnp.asarray([0, 0, 0, 1, 1, 1])
    mask = jnp.asarray([True, True, False, True, True, True])
    w = np.asarray(segment.edge_softmax(logits, dst, 2, mask))
    assert w[2] == 0.0
    np.testing.assert_allclose(w[:2].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(w[3:].sum(), 1.0, rtol=1e-5)


@pytest.mark.parametrize("kind", ["MR", "WMR", "CR", "SUM", "MAX"])
def test_readout_parity(rng, kind):
    batch, h = random_batch(rng)
    b = batch.batch_size
    mask = np.asarray(slot_mask(batch.ngp, batch.nsib, P, S))
    counts = batch.ngp + 1 + batch.nsib
    pos = np.full((N,), 2); pos[:P] = 0; pos[P] = 1
    pw = rng.normal(size=(3, 1)).astype(np.float32)
    sp = np.log1p(np.exp(pw[:, 0]))

    want = np.zeros((b, h.shape[-1] * (3 if kind == "CR" else 1)), np.float32)
    for g in range(b):
        hv = h[g][mask[g]]
        pv = pos[mask[g]]
        if kind == "MR":
            want[g] = hv.sum(0) / counts[g]
        elif kind == "WMR":
            want[g] = (hv * sp[pv][:, None]).sum(0) / counts[g]
        elif kind == "CR":
            d = h.shape[-1]
            for c in range(3):
                want[g, c * d:(c + 1) * d] = hv[pv == c].sum(0) / counts[g]
        elif kind == "SUM":
            want[g] = hv.sum(0)
        else:
            want[g] = hv.max(0)

    got = star.readout(jnp.asarray(h), jnp.asarray(batch.ngp),
                       jnp.asarray(batch.nsib), P, kind=kind,
                       position_weights=jnp.asarray(pw) if kind == "WMR" else None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    # generic segment path for the weighted/mean kinds
    if kind in ("MR", "WMR", "SUM", "MAX"):
        gid = np.repeat(np.arange(b), N)
        weight = sp[pos][None].repeat(b, 0).reshape(-1, 1) if kind == "WMR" else None
        op = {"MR": "mean", "WMR": "mean", "SUM": "sum", "MAX": "max"}[kind]
        got_seg = segment.segment_readout(
            jnp.asarray(h.reshape(b * N, -1)), jnp.asarray(gid), b,
            node_mask=jnp.asarray(mask.reshape(-1)),
            weight=None if weight is None else jnp.asarray(weight), op=op)
        np.testing.assert_allclose(np.asarray(got_seg), want, rtol=1e-4,
                                   atol=1e-5)
