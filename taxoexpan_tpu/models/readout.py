"""Graph readout modules: MR / WMR / CR (+ SUM / MAX / PATR).

Functional equivalents of model/model_zoo.py:227-276 over star slot arrays;
the math lives in ops/star.py:readout (DGL divide-by-node-count semantics).

PATR is the position-aware attention readout: a reconstruction of the
reference's retired attention readout — the current upstream keeps only the
intent marker `TODO: try GlobalAttentionPooling` (model/model_zoo.py:225)
and the `PGAT_PATR_PMLP(_MTL)_Net` arch names with their `attention_dim`
argument in the 2019 config_files. See ops/star.py:readout_attention and
BASELINE.md ("PATR/PMLP/MTL reconstruction").
"""
from __future__ import annotations

import jax

from ..ops import star
from .init import embedding_params, linear_params

READOUT_KINDS = ("MR", "WMR", "CR", "SUM", "MAX", "PATR")


class Readout:
    def __init__(self, kind: str, out_dim: int, attention_dim: int = 100):
        if kind not in READOUT_KINDS:
            raise ValueError(f"Unacceptable Readout Method: {kind}")
        self.kind = kind
        self.out_dim = out_dim
        self.attention_dim = attention_dim
        # CR concatenates the three position-class pools (model/model.py:55-57)
        self.l_dim = out_dim * 3 if kind == "CR" else out_dim

    def init(self, key):
        if self.kind == "WMR":
            # nn.Embedding(3, 1) position weights (model_zoo.py:237)
            return embedding_params(key, 3, 1)
        if self.kind == "PATR":
            k1, k2, k3 = jax.random.split(key, 3)
            gate = linear_params(k1, self.out_dim, self.attention_dim)
            return {"w1": gate["w"], "b1": gate["b"],
                    "class_emb": embedding_params(
                        k2, 3, self.attention_dim)["emb"],
                    "w2": linear_params(k3, self.attention_dim, 1,
                                        bias=False)["w"]}
        return {}

    def apply(self, params, h, ngp, nsib, p_slots: int) -> jax.Array:
        if self.kind == "PATR":
            return star.readout_attention(h, ngp, nsib, p_slots, params)
        pw = params["emb"] if self.kind == "WMR" else None
        return star.readout(h, ngp, nsib, p_slots, kind=self.kind,
                            position_weights=pw)
