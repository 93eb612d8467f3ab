"""Graph propagation encoders: GCN, GAT, and position-enhanced PGCN, PGAT.

Functional re-designs of model/model_zoo.py:13-220 over star ego-batches
([B, N, D] slot arrays, see ops/star.py). Each encoder is (init, apply):
params are plain dict pytrees; `apply` is pure and jit-safe, with dropout
driven by explicit rng keys and a static `train` flag.

Exact math parity preserved:
- GCN: symmetric deg^-1/2 normalization applied before AND after the
  copy-src-sum, bias then activation (model_zoo.py:34-50); inf norms (isolated
  padded slots) become 0 (model_zoo.py:130-134).
- GAT: fc -> per-head a1/a2 dot products -> leaky_relu(a1[src]+a2[dst]) ->
  per-destination softmax -> attention dropout -> weighted aggregation
  (model_zoo.py:80-114); hidden layers flatten their heads and apply the
  activation, the output layer averages heads (model_zoo.py:183-190).
- P-variants concatenate a per-layer position embedding (vocab 3: grandparent
  / anchor-parent / sibling) to every layer input (model_zoo.py:139-167,
  192-220).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import star
from .init import dropout, embedding_params, uniform, xavier_normal

LEAKY_ALPHA = 0.2  # GATLayer default (model_zoo.py:53) and F.leaky_relu's 0.01
                   # is NOT used: TaxoExpan passes F.leaky_relu as stack
                   # activation (model/model.py:24-41) with torch default 0.01.


def leaky_relu(x, alpha=0.01):
    return jnp.where(x >= 0, x, alpha * x)


# ----------------------------------------------------------------- GCN layers

def init_gcn_layer(key, in_f: int, out_f: int, bias: bool = True):
    """U(-stdv, stdv), stdv = 1/sqrt(out_f) (model_zoo.py:28-32)."""
    kw, kb = jax.random.split(key)
    stdv = 1.0 / jnp.sqrt(jnp.asarray(out_f, jnp.float32))
    p = {"w": uniform(kw, (in_f, out_f), stdv)}
    if bias:
        p["b"] = uniform(kb, (out_f,), stdv)
    return p


def apply_gcn_layer(params, h, norm, ngp, nsib, p_slots: int, *,
                    activation, drop_rate: float, rng, train: bool,
                    pos_emb=None):
    """One GCNLayer forward (model_zoo.py:34-50). h: [B, N, Din].

    `pos_emb` ([N, pos_dim] or None): position-bias decomposition
    [h, pe] @ W = h @ W_h + pe @ W_p — the concat (a [B, N, Din+pos] HBM
    pass per layer) disappears. Exact semantics incl. dropout: in eval
    the pe term is a per-slot constant; in train the pe columns get their
    own per-node keep-mask (independent masks over disjoint column blocks
    == one mask over the concat, model_zoo.py:36's dropout-before-matmul
    applied by PGCN on the concatenated input)."""
    k_h, k_pe = jax.random.split(rng)
    if drop_rate:
        h = dropout(k_h, h, drop_rate, train)
    if pos_emb is None:
        h = h @ params["w"]
    else:
        din_h = h.shape[-1]
        w_h, w_p = params["w"][:din_h], params["w"][din_h:]
        z = h @ w_h
        if drop_rate and train:
            b, n, _ = h.shape
            peb = jnp.broadcast_to(pos_emb[None], (b, n, pos_emb.shape[-1]))
            peb = dropout(k_pe, peb, drop_rate, True)
            z = z + peb @ w_p
        else:
            z = z + (pos_emb @ w_p)[None]
        h = z
    h = h * norm
    h = star.copy_src_sum(h, ngp, nsib, p_slots)
    h = h * norm
    if "b" in params:
        h = h + params["b"]
    if activation is not None:
        h = activation(h)
    return h


# ------------------------------------------------------- fused-kernel dispatch

def _fused_call(h, fc, wa1, wa2, z_ft, z_a1, z_a2, pe_pack, ngp, nsib, seed,
                *, pooled, p_slots, num_heads, attn_drop, feat_drop,
                out_alpha, interpret, input_grad):
    from ..ops.pallas_gat import fused_gat_layer, fused_gat_layer_pooled
    meta = (ngp, nsib, seed)
    if pooled:
        return fused_gat_layer_pooled(h, fc, wa1, wa2, z_ft, z_a1, z_a2,
                                      pe_pack, meta, p_slots, num_heads,
                                      LEAKY_ALPHA, attn_drop, feat_drop,
                                      interpret, input_grad)
    return fused_gat_layer(h, fc, wa1, wa2, z_ft, z_a1, z_a2, pe_pack, meta,
                           p_slots, num_heads, LEAKY_ALPHA, attn_drop,
                           feat_drop, out_alpha, interpret, input_grad)


def _fused_call_spmd(spmd, h, fc, wa1, wa2, z_ft, z_a1, z_a2, pe_pack, ngp,
                     nsib, seed, *, pooled, p_slots, num_heads, attn_drop,
                     feat_drop, out_alpha, interpret, input_grad):
    """Run the fused Pallas kernel under SPMD via shard_map.

    `pallas_call` is a custom call with no GSPMD partitioning rules: under a
    plain pjit over a mesh the kernel would be replicated (or fail) instead
    of sharded. shard_map makes the partitioning explicit — each device runs
    the kernel on its own batch shard, replacing the reference's
    DataParallel scatter/replicate (base/base_trainer.py:16-19):

    - the egonet batch (h / ngp / nsib) rides `axis` (the 'dp' batch axis);
    - weights are replicated — shard_map's transpose psums their per-device
      cotangents, which is exactly the DP gradient all-reduce;
    - when the mesh has an 'mp' axis that divides the head count, attention
      heads are tensor-parallel over it: fc/wa/bias columns are head-major,
      so a column shard IS a head shard, and each device aggregates only its
      own heads (communication deferred to the one flatten/mean boundary per
      layer — the natural TP of multi-head graph attention);
    - dropout seeds are decorrelated per batch shard (and per TP head group)
      by folding the device's axis index in; along a redundant 'mp' axis the
      seed is left identical so replicated computations stay bit-identical.
    """
    mesh, axis = spmd
    mesh_shape = dict(mesh.shape)
    tp = mesh_shape.get("mp", 1) if axis != "mp" else 1
    use_tp = tp > 1 and num_heads % tp == 0
    heads_local = num_heads // tp if use_tp else num_heads
    col = P(None, "mp") if use_tp else P()
    pe_spec = P() if pe_pack is None else (P(), col, col, col)

    def body(h, fc, wa1, wa2, z_ft, z_a1, z_a2, pe_pack, ngp, nsib, seed):
        seed = seed + jax.lax.axis_index(axis) * jnp.int32(1_000_003)
        if use_tp:
            seed = seed + jax.lax.axis_index("mp") * jnp.int32(7_368_787)
        out = _fused_call(h, fc, wa1, wa2, z_ft, z_a1, z_a2, pe_pack, ngp,
                          nsib, seed, pooled=pooled, p_slots=p_slots,
                          num_heads=heads_local, attn_drop=attn_drop,
                          feat_drop=feat_drop, out_alpha=out_alpha,
                          interpret=interpret, input_grad=input_grad)
        if pooled and use_tp:
            # the kernel averaged over its local heads; rescale to the
            # global head mean and reduce across the TP group
            out = jax.lax.psum(out * (heads_local / num_heads), "mp")
        return out

    out_spec = P(axis, None, "mp") if (use_tp and not pooled) else P(axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), col, col, col, col, col, col, pe_spec,
                  P(axis), P(axis), P()),
        out_specs=out_spec, check_vma=False,
    )(h, fc, wa1, wa2, z_ft, z_a1, z_a2, pe_pack, ngp, nsib, seed)


def _gcn_call_spmd(spmd, h, w, b, z_bias, pe_pack, meta, *, p, alpha, drop,
                   interpret, need_dx):
    """Fused GCN kernel under SPMD: batch sharded over `axis`, weights
    replicated (shard_map's transpose psums the per-device weight
    cotangents — the DP gradient all-reduce), dropout seeds decorrelated
    per batch shard. No head axis to tensor-parallelize (GCN is
    single-head); any 'mp' mesh axis is simply unused here."""
    from ..ops.pallas_gcn import fused_gcn_layer
    mesh, axis = spmd
    ngp, nsib, seed = meta

    def body(h, w, b, z_bias, pe_pack, ngp, nsib, seed):
        seed = seed + jax.lax.axis_index(axis) * jnp.int32(1_000_003)
        return fused_gcn_layer(h, w, b, z_bias, pe_pack, (ngp, nsib, seed),
                               p, alpha, drop, interpret, need_dx)

    pe_spec = P() if pe_pack is None else (P(), P())
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), pe_spec, P(axis), P(axis), P()),
        out_specs=P(axis), check_vma=False,
    )(h, w, b, z_bias, pe_pack, ngp, nsib, seed)


# ----------------------------------------------------------------- GAT layers

def init_gat_layer(key, in_dim: int, out_dim: int, num_heads: int,
                   residual: bool = False):
    """xavier_normal(gain=1.414) for fc / attn_l / attn_r (model_zoo.py:65-69)."""
    kfc, kl, kr, kres = jax.random.split(key, 4)
    p = {
        "fc": xavier_normal(kfc, (in_dim, num_heads * out_dim),
                            fan_in=in_dim, fan_out=num_heads * out_dim),
        # torch shape (1, H, D'): fan_in = H*D', fan_out = D'
        "attn_l": xavier_normal(kl, (num_heads, out_dim),
                                fan_in=num_heads * out_dim, fan_out=out_dim),
        "attn_r": xavier_normal(kr, (num_heads, out_dim),
                                fan_in=num_heads * out_dim, fan_out=out_dim),
    }
    if residual and in_dim != out_dim:
        p["res_fc"] = xavier_normal(kres, (in_dim, num_heads * out_dim),
                                    fan_in=in_dim, fan_out=num_heads * out_dim)
    return p


def apply_gat_layer(params, h, ngp, nsib, p_slots: int, *, num_heads: int,
                    feat_drop: float, attn_drop: float, rng, train: bool,
                    residual: bool = False, dtype=jnp.float32,
                    use_pallas: bool = False, pos_emb=None,
                    fuse_out_alpha=None, pool_output: bool = False,
                    input_grad: bool = True, spmd=None):
    """One GATLayer forward (model_zoo.py:80-104). h: [B, N, Din] ->
    [B, N, H, Dh].

    `dtype=bfloat16` runs the bandwidth-dominant ft tensor and aggregation in
    bf16 (attention logits/softmax stay f32 for stability) — the [B, N, H, Dh]
    activation traffic is the bottleneck on TPU, not the MXU.

    `pos_emb` ([N, pos_dim] per-slot position embeddings, or None): when
    given, the layer consumes h WITHOUT the position columns and applies the
    algebraic decomposition [h, pe] @ W = h @ W_h + pe @ W_p — the pe term is
    a per-SLOT constant [N, H*Dh] bias, so the position concat (a full
    [B, N, Din+pos] HBM pass) disappears. Exact in train mode on BOTH paths:
    with feat_drop > 0 the fused Pallas kernel draws its own per-node
    keep-mask over the pe columns (pe_pack, ops/pallas_gat.py), and the XLA
    path applies the same per-node pe dropout explicitly (like
    apply_gcn_layer) — independent masks over disjoint column blocks equal
    one mask over the concat, matching the reference's dropout of the full
    concatenated input (model_zoo.py:82).

    `input_grad=False` (fused Pallas path): the caller guarantees h is a
    non-trainable input (the fixed word2vec features, dataset.py:130-133) —
    the backward kernel skips the dx matmuls and the [B, N, Din] dx write."""
    k_feat, k_pe, k_attn = jax.random.split(rng, 3)
    fuse_pallas = use_pallas and not residual
    if feat_drop and not fuse_pallas:
        # XLA path; the pallas kernel fuses this dropout internally
        h = dropout(k_feat, h, feat_drop, train)
    b, n, _ = h.shape
    h = h.astype(dtype)
    din_h = h.shape[-1]
    fc_full = params["fc"]
    if pos_emb is not None:
        w_h = fc_full[:din_h]
        w_p = fc_full[din_h:]
        bias_ft = (pos_emb @ w_p).astype(jnp.float32)         # [N, H*Dh]
    else:
        w_h = fc_full
        bias_ft = None
    fc = w_h.astype(dtype)
    # a1 = sum_d ft * attn_l == x @ (W . attn_l) — fold the attention dot
    # into a tiny matmul instead of two full passes over the ft tensor
    dh = fc_full.shape[1] // num_heads
    w_heads = fc_full.reshape(-1, num_heads, dh)
    wa1_full = jnp.einsum("ihd,hd->ih", w_heads, params["attn_l"])
    wa2_full = jnp.einsum("ihd,hd->ih", w_heads, params["attn_r"])
    if pos_emb is not None:
        wa1, wa2 = wa1_full[:din_h], wa2_full[:din_h]
        bias_a1 = pos_emb @ wa1_full[din_h:]                   # [N, H]
        bias_a2 = pos_emb @ wa2_full[din_h:]
    else:
        wa1, wa2 = wa1_full, wa2_full
        bias_a1 = bias_a2 = None
    if pool_output and not fuse_pallas:
        raise ValueError("pool_output requires the fused Pallas path "
                         "(use_pallas=True, residual=False)")
    if fuse_pallas:
        seed = jax.random.randint(k_attn, (), 0, 2_147_483_647, jnp.int32)
        interpret = jax.default_backend() != "tpu"
        hd = fc.shape[1]
        # exact pe dropout (model_zoo.py:82): in train mode with feat_drop,
        # hand the kernel the raw pe + W_p splits so it can mask the pe
        # columns per node instead of using the constant per-slot bias
        pe_pack = None
        if pos_emb is not None and train and feat_drop > 0:
            pe_pack = (pos_emb.astype(jnp.float32), w_p.astype(jnp.float32),
                       wa1_full[din_h:].astype(jnp.float32),
                       wa2_full[din_h:].astype(jnp.float32))
            bias_ft = bias_a1 = bias_a2 = None
        z_ft = bias_ft if bias_ft is not None else \
            jnp.zeros((n, hd), jnp.float32)
        z_a1 = bias_a1 if bias_a1 is not None else \
            jnp.zeros((n, num_heads), jnp.float32)
        z_a2 = bias_a2 if bias_a2 is not None else \
            jnp.zeros((n, num_heads), jnp.float32)
        call_kwargs = dict(pooled=pool_output, p_slots=p_slots,
                           num_heads=num_heads,
                           attn_drop=attn_drop if train else 0.0,
                           feat_drop=feat_drop if train else 0.0,
                           out_alpha=None if pool_output else fuse_out_alpha,
                           interpret=interpret, input_grad=input_grad)
        args = (h, fc, wa1.astype(dtype), wa2.astype(dtype), z_ft, z_a1,
                z_a2, pe_pack, jnp.asarray(ngp), jnp.asarray(nsib), seed)
        if spmd is not None:
            out = _fused_call_spmd(spmd, *args, **call_kwargs)
        else:
            out = _fused_call(*args, **call_kwargs)
        if pool_output:
            return out
        return out.reshape(b, n, num_heads, -1)
    ft = (h @ fc).reshape(b, n, num_heads, -1)
    a1 = (h @ wa1.astype(dtype)).astype(jnp.float32)   # [B, N, H]
    a2 = (h @ wa2.astype(dtype)).astype(jnp.float32)
    if pos_emb is not None:
        if train and feat_drop > 0:
            # exact pe-column dropout (model_zoo.py:82): per-node keep-mask
            # over the pe block, like apply_gcn_layer — the per-slot bias
            # is only valid when nothing is dropped
            peb = jnp.broadcast_to(pos_emb[None],
                                   (b, n, pos_emb.shape[-1]))
            peb = dropout(k_pe, peb, feat_drop, True).astype(dtype)
            ft = ft + (peb @ w_p.astype(dtype)).reshape(b, n, num_heads, dh)
            a1 = a1 + (peb @ wa1_full[din_h:].astype(dtype)
                       ).astype(jnp.float32)
            a2 = a2 + (peb @ wa2_full[din_h:].astype(dtype)
                       ).astype(jnp.float32)
        else:
            ft = ft + bias_ft.reshape(1, n, num_heads, dh).astype(ft.dtype)
            a1 = a1 + bias_a1[None]
            a2 = a2 + bias_a2[None]
    ret = star.gat_attention_aggregate(
        ft, a1, a2, ngp, nsib, p_slots,
        leaky_alpha=LEAKY_ALPHA,
        attn_drop=attn_drop if train else 0.0,
        rng=k_attn, mask_output=False)
    if residual:
        if "res_fc" in params:
            resval = (h @ params["res_fc"].astype(dtype)).reshape(
                b, n, num_heads, -1)
        else:
            resval = h[:, :, None, :]
        ret = resval + ret
    return ret


# ------------------------------------------------------------------- encoders

class GCN:
    """GCN stack (model_zoo.py:116-137); PGCN when pos_dim > 0
    (model_zoo.py:139-167)."""

    def __init__(self, in_dim, hidden_dim, out_dim, num_layers,
                 pos_dim: int = 0, activation=leaky_relu,
                 in_dropout=0.1, hidden_dropout=0.1, output_dropout=0.0,
                 position_vocab_size: int = 3, pos_mode: str = "bias",
                 use_pallas: bool = False):
        if pos_mode not in ("bias", "concat"):
            raise ValueError(f"pos_mode must be bias|concat, got {pos_mode!r}")
        # fused Pallas layer (ops/pallas_gcn.py) — covers pos_mode="bias"
        # and the no-position GCN; "concat" falls back to the XLA path.
        # Set by the factory's kernel= knob like GAT's use_pallas.
        self.use_pallas = use_pallas
        self.spmd = None   # (mesh, axis) — see _gcn_call_spmd
        # "bias": [h, pe] @ W decomposed as h @ W_h + pe @ W_p (exact incl.
        # train-mode dropout — see apply_gcn_layer); same param shapes as
        # "concat", so checkpoints are interchangeable between modes.
        self.pos_mode = pos_mode
        self.pos_dim = pos_dim
        self.activation = activation
        dims = ([(in_dim + pos_dim, hidden_dim, activation, in_dropout)] +
                [(hidden_dim + pos_dim, hidden_dim, activation, hidden_dropout)
                 for _ in range(num_layers - 1)] +
                [(hidden_dim + pos_dim, out_dim, None, output_dropout)])
        self.layer_specs = dims
        self.position_vocab_size = position_vocab_size
        self.out_dim = out_dim

    def init(self, key):
        keys = jax.random.split(key, 2 * len(self.layer_specs))
        params = {"layers": [], "pos_emb": []}
        for i, (din, dout, _act, _dr) in enumerate(self.layer_specs):
            params["layers"].append(init_gcn_layer(keys[2 * i], din, dout))
            if self.pos_dim:
                params["pos_emb"].append(embedding_params(
                    keys[2 * i + 1], self.position_vocab_size, self.pos_dim))
        return params

    def apply(self, params, h, ngp, nsib, p_slots: int, *, rng, train: bool):
        b, n, _ = h.shape
        deg = star.in_degrees(ngp, nsib, p_slots, n)
        norm = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        norm = norm[..., None]                                     # [B, N, 1]
        if self.pos_dim:
            slot_pos = jnp.asarray(
                star_slot_positions(p_slots, n), dtype=jnp.int32)
        keys = jax.random.split(rng, len(self.layer_specs))
        use_bias_pos = self.pos_dim and self.pos_mode == "bias"
        # the fused kernel implements exactly the default inter-layer
        # activation (leaky_relu, slope 0.01); any custom callable falls
        # back to the XLA path rather than silently changing the math
        fuse = (self.use_pallas and (not self.pos_dim or use_bias_pos)
                and self.activation in (None, leaky_relu))
        for i, (_, _, act, drop_rate) in enumerate(self.layer_specs):
            pe = None
            if self.pos_dim:
                pe = params["pos_emb"][i]["emb"][slot_pos]          # [N, pos]
                if not use_bias_pos:
                    h = jnp.concatenate(
                        [h, jnp.broadcast_to(pe, (b, n, self.pos_dim))],
                        axis=-1)
                    pe = None
            if fuse:
                h = self._fused_layer(params["layers"][i], h, pe, ngp, nsib,
                                      p_slots, act, drop_rate, keys[i],
                                      train, input_grad=i > 0)
            else:
                h = apply_gcn_layer(params["layers"][i], h, norm, ngp, nsib,
                                    p_slots, activation=act,
                                    drop_rate=drop_rate, rng=keys[i],
                                    train=train, pos_emb=pe)
        return h

    def _fused_layer(self, lp, h, pe, ngp, nsib, p_slots, act, drop_rate,
                     key, train, input_grad):
        """Dispatch one layer to the fused Pallas kernel
        (ops/pallas_gcn.py), mirroring apply_gat_layer's fused-path
        conventions: per-layer PRNG seed, interpret on CPU, position-bias
        decomposition with exact train-mode pe dropout via pe_pack."""
        from ..ops.pallas_gcn import fused_gcn_layer
        seed = jax.random.randint(key, (), 0, 2_147_483_647, jnp.int32)
        interpret = jax.default_backend() != "tpu"
        drop = drop_rate if train else 0.0
        w = lp["w"]
        din_h = h.shape[-1]
        n = h.shape[1]
        dout = w.shape[1]
        bvec = lp.get("b", jnp.zeros((dout,), jnp.float32))
        pe_pack = None
        z_bias = jnp.zeros((n, dout), jnp.float32)
        if pe is not None:
            w_h, w_p = w[:din_h], w[din_h:]
            if drop > 0:
                pe_pack = (pe.astype(jnp.float32), w_p.astype(jnp.float32))
            else:
                z_bias = (pe @ w_p).astype(jnp.float32)
        else:
            w_h = w
        # XLA-path activation is leaky_relu(alpha=0.01) between layers
        alpha = 0.01 if act is not None else None
        args = (h, w_h, bvec, z_bias, pe_pack,
                (jnp.asarray(ngp), jnp.asarray(nsib), seed))
        # one source of truth for the trailing statics (custom_vjp nondiff
        # args must be positional, so expand from the same dict)
        kw = dict(p=p_slots, alpha=alpha, drop=drop, interpret=interpret,
                  need_dx=input_grad)
        if self.spmd is not None:
            return _gcn_call_spmd(self.spmd, *args, **kw)
        return fused_gcn_layer(*args, kw["p"], kw["alpha"], kw["drop"],
                               kw["interpret"], kw["need_dx"])


class GAT:
    """GAT stack (model_zoo.py:169-190); PGAT when pos_dim > 0
    (model_zoo.py:192-220) — the paper's main model."""

    def __init__(self, in_dim, hidden_dim, out_dim, num_layers, heads,
                 pos_dim: int = 0, activation=leaky_relu,
                 feat_drop=0.5, attn_drop=0.5, residual=False,
                 position_vocab_size: int = 3, dtype=None,
                 use_pallas: bool = False, pos_mode: str = "bias"):
        import jax.numpy as _jnp
        self.dtype = dtype or _jnp.float32
        self.use_pallas = use_pallas
        # (mesh, axis) set by the Trainer/Ranker/dryrun for SPMD execution of
        # the fused Pallas kernel (shard_map — see _fused_call_spmd). None =
        # single-device pallas_call / plain GSPMD for the XLA path.
        self.spmd = None
        if pos_mode not in ("bias", "concat"):
            raise ValueError(f"pos_mode must be bias|concat, got {pos_mode!r}")
        # "bias": [h, pe] @ W == h @ W_h + pe @ W_p with the pe term folded
        # into a per-slot constant (see apply_gat_layer) — saves a full
        # [B, N, Din+pos] HBM pass per layer. Exact on every path including
        # train mode: with feat_drop > 0 the pe columns get their own
        # per-node keep-mask (pe_pack on the Pallas path, explicit pe
        # dropout on the XLA path), matching model_zoo.py:82.
        self.pos_mode = pos_mode
        if len(heads) != num_layers + 1:
            raise ValueError(
                f"heads must have num_layers+1 entries, got {heads} for "
                f"num_layers={num_layers}")
        self.num_layers = num_layers
        self.heads = list(heads)
        self.pos_dim = pos_dim
        self.activation = activation
        self.feat_drop = feat_drop
        self.attn_drop = attn_drop
        self.residual = residual
        self.position_vocab_size = position_vocab_size
        self.out_dim = out_dim
        specs = [(in_dim + pos_dim, hidden_dim, heads[0], False)]
        for l in range(1, num_layers):
            specs.append((hidden_dim * heads[l - 1] + pos_dim, hidden_dim,
                          heads[l], residual))
        specs.append((hidden_dim * heads[-2] + pos_dim, out_dim, heads[-1],
                      residual))
        self.layer_specs = specs

    def init(self, key):
        keys = jax.random.split(key, 2 * len(self.layer_specs))
        params = {"layers": [], "pos_emb": []}
        for i, (din, dout, nh, res) in enumerate(self.layer_specs):
            params["layers"].append(
                init_gat_layer(keys[2 * i], din, dout, nh, residual=res))
            if self.pos_dim:
                params["pos_emb"].append(embedding_params(
                    keys[2 * i + 1], self.position_vocab_size, self.pos_dim))
        return params

    def apply(self, params, h, ngp, nsib, p_slots: int, *, rng, train: bool,
              pool_readout: bool = False):
        """pool_readout=True (fused-Pallas final layers only): return readout
        class pools [B, 3, out_dim] f32 instead of per-slot activations —
        feed to ops/star.py:readout_from_pools."""
        b, n, _ = h.shape
        use_bias_pos = self.pos_dim and self.pos_mode == "bias"
        if self.pos_dim:
            slot_pos = jnp.asarray(
                star_slot_positions(p_slots, n), dtype=jnp.int32)

        def pos_of(i):
            if not self.pos_dim:
                return None
            return params["pos_emb"][i]["emb"][slot_pos]       # [N, pos_dim]

        def with_pos(x, i):
            if not self.pos_dim or use_bias_pos:
                return x
            pe = pos_of(i).astype(x.dtype)
            return jnp.concatenate(
                [x, jnp.broadcast_to(pe, (b, n, self.pos_dim))], axis=-1)

        keys = jax.random.split(rng, len(self.layer_specs))
        # the fused kernel can apply the inter-layer activation
        # (model_zoo.py:187, the stack's F.leaky_relu with torch's 0.01 slope)
        fused_act = 0.01 if (self.use_pallas and
                             self.activation is leaky_relu) else None
        # layer 0's input is the fixed word2vec feature tensor
        # (dataset.py:130-133) unless the position concat mixes trainable
        # pe columns into it: its cotangent is dead — skip the dx matmuls
        # and the [B, N, Din] dx write in the fused backward
        def in_grad(l):
            return not (l == 0 and (not self.pos_dim or use_bias_pos))

        for l in range(self.num_layers):
            _, dout, nh, res = self.layer_specs[l]
            h = apply_gat_layer(params["layers"][l], with_pos(h, l), ngp, nsib,
                                p_slots, num_heads=nh,
                                feat_drop=self.feat_drop,
                                attn_drop=self.attn_drop, rng=keys[l],
                                train=train, residual=res, dtype=self.dtype,
                                use_pallas=self.use_pallas,
                                pos_emb=pos_of(l) if use_bias_pos else None,
                                fuse_out_alpha=None if res else fused_act,
                                input_grad=in_grad(l), spmd=self.spmd)
            h = h.reshape(b, n, -1)        # flatten heads (model_zoo.py:186)
            if fused_act is None or res:
                h = self.activation(h)
        _, dout, nh, res = self.layer_specs[-1]
        h = apply_gat_layer(params["layers"][-1], with_pos(h, self.num_layers),
                            ngp, nsib, p_slots, num_heads=nh,
                            feat_drop=self.feat_drop,
                            attn_drop=self.attn_drop, rng=keys[-1],
                            train=train, residual=res, dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            pos_emb=pos_of(self.num_layers)
                            if use_bias_pos else None,
                            pool_output=pool_readout,
                            input_grad=in_grad(self.num_layers),
                            spmd=self.spmd)
        if pool_readout:
            return h                                       # [B, 3, out_dim]
        # mean over heads (model_zoo.py:189); back to f32 for readout/matcher
        return h.mean(axis=2).astype(jnp.float32)


def star_slot_positions(p_slots: int, n: int):
    """Static per-slot position codes (0 gp / 1 anchor / 2 sibling)."""
    import numpy as np
    pos = np.full((n,), 2, dtype=np.int32)
    pos[:p_slots] = 0
    pos[p_slots] = 1
    return pos
