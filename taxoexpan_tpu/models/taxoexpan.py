"""The TaxoExpan composite model: propagate -> readout -> match.

Functional re-design of model/model.py:13-87. The model object holds only
static configuration (hashable; safe to close over under jit); parameters are
a plain dict pytree returned by `init`.

Factory strings match the reference CLI/config surface:
propagation_method ∈ {GCN, PGCN, GAT, PGAT}, readout_method ∈ {MR, WMR, CR},
matching_method ∈ {MLP, LBM, BIM, NTN}. Matcher dims: l_dim = out_dim (x3 for
CR), r_dim = in_dim (model/model.py:45-57). Invalid names raise immediately —
fixing the reference's always-true `assert f"..."` bugs (model/model.py:43,58,67).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.egobatch import EgoBatch, GroupBatch
from .matching import Matcher
from .propagation import GAT, GCN, leaky_relu
from .readout import Readout

PROPAGATION_KINDS = ("GCN", "PGCN", "GAT", "PGAT")


class TaxoExpan:
    def __init__(self,
                 propagation_method: str = "PGAT",
                 readout_method: str = "WMR",
                 matching_method: str = "BIM",
                 *,
                 in_dim: int,
                 hidden_dim: int,
                 out_dim: int,
                 pos_dim: int = 0,
                 num_layers: int = 1,
                 heads: list[int] | None = None,
                 feat_drop: float = 0.1,
                 attn_drop: float = 0.1,
                 hidden_drop: float = 0.1,
                 out_drop: float = 0.1,
                 max_parents: int = 8,
                 expand_factor: int = 50,
                 compute_dtype: str = "float32",
                 kernel: str = "auto",
                 pos_mode: str = "bias",
                 attention_dim: int = 100,
                 aux_heads: list | None = None,
                 raw_channel: bool = False):
        if propagation_method not in PROPAGATION_KINDS:
            raise ValueError(
                f"Unacceptable Graph Propagation Method: {propagation_method}")
        self.propagation_method = propagation_method
        self.readout_method = readout_method
        self.matching_method = matching_method
        self.in_dim = in_dim
        self.max_parents = max_parents
        self.expand_factor = expand_factor
        self.num_slots = max_parents + 1 + expand_factor

        if compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype must be float32 or bfloat16, "
                             f"got {compute_dtype!r}")
        self.compute_dtype = jnp.bfloat16 if compute_dtype == "bfloat16" \
            else jnp.float32
        if kernel not in ("auto", "pallas", "xla"):
            raise ValueError(f"kernel must be auto|pallas|xla, got {kernel!r}")
        if kernel == "auto":
            import jax as _jax
            use_pallas = _jax.default_backend() == "tpu"
        else:
            use_pallas = kernel == "pallas"
        self.kernel = kernel
        self.use_pallas = use_pallas
        pos_dim_eff = pos_dim if propagation_method in ("PGCN", "PGAT") else 0
        if propagation_method in ("GCN", "PGCN"):
            self.propagate = GCN(in_dim, hidden_dim, out_dim, num_layers,
                                 pos_dim=pos_dim_eff, activation=leaky_relu,
                                 in_dropout=feat_drop,
                                 hidden_dropout=hidden_drop,
                                 output_dropout=out_drop,
                                 pos_mode=pos_mode,
                                 use_pallas=use_pallas)
        else:
            if heads is None:
                raise ValueError("GAT/PGAT require a heads list")
            self.propagate = GAT(in_dim, hidden_dim, out_dim, num_layers,
                                 heads, pos_dim=pos_dim_eff,
                                 activation=leaky_relu, feat_drop=feat_drop,
                                 attn_drop=attn_drop,
                                 dtype=self.compute_dtype,
                                 use_pallas=use_pallas,
                                 pos_mode=pos_mode)

        self.readout = Readout(readout_method, out_dim,
                               attention_dim=attention_dim)
        # Optional raw-feature channel: append the unit-normalized
        # anchor+sibling mean of the UNtransformed ego features to every
        # graph summary, so the matcher can blend the raw-space structure
        # signal (the `simple_structure` heuristic's score is a dot product
        # against exactly this vector — ops/star.py:raw_star_channel) with
        # the propagated evidence. No reference counterpart (the reference's
        # matcher sees only the GNN summary, model/model.py:70-87); this is
        # the lever that closes the mid-noise mean-rank gap documented in
        # artifacts/DIFFICULTY_CURVE.md.
        self.raw_channel = bool(raw_channel)
        raw_dim = in_dim if self.raw_channel else 0
        # l_dim from readout (x3 for CR) + raw channel, r_dim = query
        # feature dim (model/model.py:45-57)
        self.matcher = Matcher(matching_method, self.readout.l_dim + raw_dim,
                               in_dim, hidden_dim)
        # Multi-task auxiliary scoring heads (the `_MTL` arch suffix of the
        # reference's retired PGAT_PATR_PMLP_MTL_Net,
        # config_files/config.20190815_*_MTL.json — implementation gone
        # upstream; reconstruction documented in BASELINE.md): each entry
        # {"readout": ..., "matcher": ...} adds an extra (readout, matcher)
        # pair sharing the propagation trunk. Training averages the per-head
        # losses (train/trainer.py); evaluation uses the primary head.
        self.aux_heads = []
        for spec in (aux_heads or []):
            rd = Readout(spec.get("readout", "WMR"), out_dim,
                         attention_dim=attention_dim)
            mt = Matcher(spec.get("matcher", "BIM"), rd.l_dim + raw_dim,
                         in_dim, hidden_dim)
            self.aux_heads.append((rd, mt))

    # ------------------------------------------------------------------ params
    def init(self, key: jax.Array):
        kp, kr, km, ka = jax.random.split(key, 4)
        params = {"propagate": self.propagate.init(kp),
                  "readout": self.readout.init(kr),
                  "match": self.matcher.init(km)}
        self._seed_raw_prior(self.matcher, params["match"],
                             l_learned=self.readout.l_dim)
        if self.aux_heads:
            keys = jax.random.split(ka, 2 * len(self.aux_heads))
            params["aux"] = [
                {"readout": rd.init(keys[2 * i]),
                 "match": mt.init(keys[2 * i + 1])}
                for i, (rd, mt) in enumerate(self.aux_heads)]
            for i, (rd, mt) in enumerate(self.aux_heads):
                self._seed_raw_prior(mt, params["aux"][i]["match"],
                                     l_learned=rd.l_dim)
        return params

    def _seed_raw_prior(self, matcher: Matcher, match_params: dict, *,
                        l_learned: int) -> None:
        """Structure-prior init: with the raw channel on, add the identity to
        the raw-block rows of a bilinear matcher's weight, so the UNtrained
        model already scores candidates like the `simple_structure sum/b0.0`
        heuristic (its score is a dot product against the raw channel —
        ops/star.py:raw_star_channel) and training starts from that prior
        instead of having to rediscover it. Verified on the v2 benchmark at
        noise 1.5: the identity-block model's full-catalog metrics match the
        heuristic's to 4 decimals (tests/test_raw_channel.py). Non-bilinear
        matchers (MLP/NTN) keep their default init — the prior has no
        closed-form embedding there."""
        if not self.raw_channel or matcher.kind not in ("BIM", "LBM"):
            return
        w = match_params["w"]
        eye = jnp.eye(self.in_dim, dtype=w.dtype)
        match_params["w"] = w.at[l_learned:].add(eye)

    @staticmethod
    def num_params(params) -> int:
        return sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))

    def describe(self, params=None) -> str:
        """Model summary with trainable-parameter count — the reference's
        BaseModel.__str__ (base/base_model.py:14-25)."""
        desc = (f"TaxoExpan(propagation={self.propagation_method}, "
                f"readout={self.readout_method}, "
                f"matching={self.matching_method})")
        if params is not None:
            desc += f"\nTrainable parameters: {self.num_params(params)}"
        return desc

    # ------------------------------------------------------------------ stages
    def encode(self, params, feats: jax.Array, ngp: jax.Array,
               nsib: jax.Array, *, rng: jax.Array, train: bool) -> jax.Array:
        """Egonet features [B, N, D] -> graph embeddings [B, l_dim].

        The `encode_graph` stage of evaluation (test_fast.py:25-28):
        graph_propagate + readout, no matcher.

        On the fused-Pallas GAT path the final layer emits per-position-class
        readout pools [B, 3, out_dim] directly (head mean + masked class sums
        fused into the kernel) and the readout becomes a tiny epilogue on the
        pools — the [B, N, H*Dh] final activation never round-trips HBM.
        """
        from ..ops import star
        prop = self.propagate
        fuse_readout = (self.readout_method in ("MR", "WMR", "CR", "SUM")
                        and isinstance(prop, GAT) and prop.use_pallas
                        and not prop.layer_specs[-1][3])   # final not residual
        if fuse_readout:
            pools = prop.apply(params["propagate"], feats, ngp, nsib,
                               self.max_parents, rng=rng, train=train,
                               pool_readout=True)
            pw = params["readout"].get("emb") \
                if self.readout_method == "WMR" else None
            hg = star.readout_from_pools(pools, ngp, nsib,
                                         kind=self.readout_method,
                                         position_weights=pw)
        else:
            h = prop.apply(params["propagate"], feats, ngp, nsib,
                           self.max_parents, rng=rng, train=train)
            hg = self.readout.apply(params["readout"], h, ngp, nsib,
                                    self.max_parents)
        return self._append_raw(hg, feats, ngp, nsib)

    def _append_raw(self, hg: jax.Array, feats: jax.Array, ngp: jax.Array,
                    nsib: jax.Array) -> jax.Array:
        """Concatenate the raw anchor+sibling unit-mean channel (if enabled)
        to a graph summary; see ops/star.py:raw_star_channel."""
        if not self.raw_channel:
            return hg
        from ..ops import star
        rc = star.raw_star_channel(feats, ngp, nsib, self.max_parents)
        return jnp.concatenate([hg, rc.astype(hg.dtype)], axis=-1)

    def match(self, params, hg: jax.Array, qf: jax.Array) -> jax.Array:
        return self.matcher.apply(params["match"], hg, qf)

    def match_all(self, params, hg: jax.Array, qf: jax.Array) -> jax.Array:
        return self.matcher.apply_all(params["match"], hg, qf)

    # ----------------------------------------------------------------- forward
    def gather_feats(self, feature_table: jax.Array, ego: EgoBatch
                     ) -> jax.Array:
        """Device-side feature gather: [V, D] table + [B, N] ids -> [B, N, D],
        padded slots zeroed (replaces per-egonet host feature copies,
        dataset.py:430)."""
        from ..ops import star as star_ops
        feats = feature_table[ego.node_ids]
        mask = star_ops.node_mask(ego.ngp, ego.nsib, self.max_parents,
                                  ego.node_ids.shape[1])
        return feats * mask[..., None]

    def forward_with_feats(self, params, batch: GroupBatch,
                           ego_feats: jax.Array, qf: jax.Array, *,
                           rng: jax.Array, train: bool) -> jax.Array:
        """Forward from pre-gathered (already masked) egonet features — used
        by the partitioned-feature-table path (parallel/partition.py)."""
        g, c = batch.labels.shape
        hg = self.encode(params, ego_feats, batch.ego.ngp, batch.ego.nsib,
                         rng=rng, train=train)
        qf_per_ego = jnp.repeat(qf, c, axis=0)
        scores = self.match(params, hg, qf_per_ego)
        return scores.reshape(g, c)

    def forward_heads(self, params, batch: GroupBatch,
                      feature_table: jax.Array, *, rng: jax.Array,
                      train: bool) -> jax.Array:
        """All scoring heads over a shared propagation trunk: [1+H, G, C]
        (row 0 = the primary readout/matcher). The MTL training path
        (aux_heads) — the trainer averages the per-row losses."""
        feats = self.gather_feats(feature_table, batch.ego)
        qf = batch.query_feats if batch.query_feats is not None \
            else feature_table[batch.query_ids]
        return self.forward_heads_with_feats(params, batch, feats, qf,
                                             rng=rng, train=train)

    def forward_heads_with_feats(self, params, batch: GroupBatch,
                                 ego_feats: jax.Array, qf: jax.Array, *,
                                 rng: jax.Array, train: bool) -> jax.Array:
        """forward_heads from pre-gathered (already masked) egonet features —
        the partitioned-feature-table MTL path (parallel/partition.py), the
        aux-head analogue of forward_with_feats."""
        feats = ego_feats
        g, c = batch.labels.shape
        # per-slot propagation once, shared by every head (readout fusion
        # into the final Pallas layer only serves the single-head path)
        h = self.propagate.apply(params["propagate"], feats, batch.ego.ngp,
                                 batch.ego.nsib, self.max_parents, rng=rng,
                                 train=train)
        qf_per_ego = jnp.repeat(qf, c, axis=0)
        heads = [(self.readout, self.matcher, params["readout"],
                  params["match"])]
        for (rd, mt), hp in zip(self.aux_heads, params.get("aux", [])):
            heads.append((rd, mt, hp["readout"], hp["match"]))
        scores = []
        for rd, mt, rp, mp_ in heads:
            hg = rd.apply(rp, h, batch.ego.ngp, batch.ego.nsib,
                          self.max_parents)
            hg = self._append_raw(hg, feats, batch.ego.ngp, batch.ego.nsib)
            scores.append(mt.apply(mp_, hg, qf_per_ego).reshape(g, c))
        return jnp.stack(scores)

    def forward(self, params, batch: GroupBatch, feature_table: jax.Array, *,
                rng: jax.Array, train: bool) -> jax.Array:
        """GroupBatch -> scores [G, C] (model/model.py:70-87, already in the
        per-group layout the InfoNCE loss wants)."""
        feats = self.gather_feats(feature_table, batch.ego)
        if batch.query_feats is not None:
            qf = batch.query_feats
        else:
            qf = feature_table[batch.query_ids]
        return self.forward_with_feats(params, batch, feats, qf, rng=rng,
                                       train=train)
