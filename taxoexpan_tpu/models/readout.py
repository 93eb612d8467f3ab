"""Graph readout modules: MR / WMR / CR (+ SUM / MAX).

Functional equivalents of model/model_zoo.py:227-276 over star slot arrays;
the math lives in ops/star.py:readout (DGL divide-by-node-count semantics).
"""
from __future__ import annotations

import jax

from ..ops import star
from .init import embedding_params

READOUT_KINDS = ("MR", "WMR", "CR", "SUM", "MAX")


class Readout:
    def __init__(self, kind: str, out_dim: int):
        if kind not in READOUT_KINDS:
            raise ValueError(f"Unacceptable Readout Method: {kind}")
        self.kind = kind
        # CR concatenates the three position-class pools (model/model.py:55-57)
        self.l_dim = out_dim * 3 if kind == "CR" else out_dim

    def init(self, key):
        if self.kind == "WMR":
            # nn.Embedding(3, 1) position weights (model_zoo.py:237)
            return embedding_params(key, 3, 1)
        return {}

    def apply(self, params, h, ngp, nsib, p_slots: int) -> jax.Array:
        pw = params["emb"] if self.kind == "WMR" else None
        return star.readout(h, ngp, nsib, p_slots, kind=self.kind,
                            position_weights=pw)
