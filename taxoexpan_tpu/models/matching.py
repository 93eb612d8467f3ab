"""Matching modules: MLP, BIM, LBM, NTN.

Functional equivalents of model/model_zoo.py:281-346. Every matcher scores a
(graph-embedding, query-embedding) pair; all are expressible as MXU matmuls.

Each matcher also exposes `apply_all(params, hg, qf)` scoring ALL candidate
embeddings against ALL queries as a single [C, d] x [d, Q] contraction — the
batched form the evaluation engine uses instead of the reference's per-query
loop (test_fast.py:116-140,189-218).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .init import apply_linear, linear_params, uniform

MATCH_KINDS = ("MLP", "BIM", "LBM", "NTN", "PMLP")


class Matcher:
    def __init__(self, kind: str, l_dim: int, r_dim: int, hidden_dim: int,
                 ntn_k: int = 4):
        if kind not in MATCH_KINDS:
            raise ValueError(f"Unacceptable Matching Method: {kind}")
        self.kind = kind
        self.l_dim = l_dim
        self.r_dim = r_dim
        self.hidden_dim = hidden_dim
        self.ntn_k = ntn_k

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        if self.kind in ("MLP", "PMLP"):
            # Linear(l+r -> hidden), ReLU, Linear(hidden -> 1)
            # (model_zoo.py:281-298). PMLP is the matcher name of the
            # retired PGAT_PATR_PMLP(_MTL)_Net archs (2019 config_files);
            # its upstream implementation is gone — the name is kept for
            # config compatibility and maps to the same MLP head over the
            # PATR readout (see BASELINE.md).
            return {"fc1": linear_params(k1, self.l_dim + self.r_dim,
                                         self.hidden_dim),
                    "fc2": linear_params(k2, self.hidden_dim, 1)}
        if self.kind in ("BIM", "LBM"):
            # nn.Bilinear(l, r, 1, bias=False) (model_zoo.py:301-328);
            # torch init: U(-1/sqrt(in1), +)
            bound = 1.0 / math.sqrt(self.l_dim)
            return {"w": uniform(k1, (self.l_dim, self.r_dim), bound)}
        # NTN: u f(W[e1,e2] + V[e1;e2]) (model_zoo.py:331-346)
        bound = 1.0 / math.sqrt(self.l_dim)
        return {
            "w": uniform(k1, (self.ntn_k, self.l_dim, self.r_dim), bound),
            "w_b": uniform(k2, (self.ntn_k,), bound),
            "v": linear_params(k3, self.l_dim + self.r_dim, self.ntn_k,
                               bias=False),
            "u": linear_params(k4, self.ntn_k, 1, bias=False),
        }

    # -------------------------------------------------------------- pairwise
    def apply(self, params, e1: jax.Array, e2: jax.Array) -> jax.Array:
        """e1: [B, l_dim], e2: [B, r_dim] -> scores [B]."""
        if self.kind in ("MLP", "PMLP"):
            x = jnp.concatenate([e1, e2], axis=-1)
            h = jax.nn.relu(apply_linear(params["fc1"], x))
            return apply_linear(params["fc2"], h)[..., 0]
        if self.kind in ("BIM", "LBM"):
            s = jnp.einsum("bl,lr,br->b", e1, params["w"], e2)
            return jnp.exp(s) if self.kind == "LBM" else s
        # NTN
        bilinear = jnp.einsum("bl,klr,br->bk", e1, params["w"], e2)
        bilinear = bilinear + params["w_b"]
        lin = apply_linear(params["v"], jnp.concatenate([e1, e2], axis=-1))
        return apply_linear(params["u"], jnp.tanh(bilinear + lin))[..., 0]

    # ------------------------------------------------------------- all-pairs
    def apply_all(self, params, hg: jax.Array, qf: jax.Array) -> jax.Array:
        """hg: [C, l_dim] candidates, qf: [Q, r_dim] queries -> [Q, C].

        For BIM/LBM this is one (hg @ W) @ qf^T matmul — the whole
        candidates-x-queries score matrix in a single MXU contraction.
        """
        if self.kind in ("BIM", "LBM"):
            s = jnp.einsum("cl,lr,qr->qc", hg, params["w"], qf)
            return jnp.exp(s) if self.kind == "LBM" else s
        # MLP/NTN need the pairwise concat; broadcast then reuse `apply`.
        c, q = hg.shape[0], qf.shape[0]
        e1 = jnp.broadcast_to(hg[None, :, :], (q, c, hg.shape[1]))
        e2 = jnp.broadcast_to(qf[:, None, :], (q, c, qf.shape[1]))
        return self.apply(params, e1.reshape(q * c, -1),
                          e2.reshape(q * c, -1)).reshape(q, c)
