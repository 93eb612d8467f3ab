#!/usr/bin/env python
"""simple_MLP baseline family in JAX: MLP, DeepSetMLP, DeepAPGMLP.

Re-implementation of baselines/simple_MLP (model.py:11-115, data_loader.py,
train.py, test.py): frozen pretrained embeddings + a 3-layer scorer over a
(parent, query) pair, optionally with DeepSet-encoded sibling and grandparent
sets (padded with a zero UNK row, data_loader.py:151-160). Trained
self-supervised on existing edges with queue-sampled negatives and BCE loss;
evaluated by ranking every candidate parent for held-out leaves.

    python -m taxoexpan_tpu.baselines.simple_mlp --data ... --model DeepSetMLP
"""
from __future__ import annotations

import argparse
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.taxonomy import Taxonomy, build_csr
from ..metrics import (hit_at_1, hit_at_3, hit_at_5, macro_mr, micro_mr,
                       mrr_scaled_10, ranks_from_scores)
from ..models.init import apply_linear, linear_params

MAX_SIBLINGS = 50       # data_loader.py SubGraphDataset cap (:145-179)
MAX_GRANDPARENTS = 20


def _mlp_head(key, in_dim, h1, h2):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"fc1": linear_params(k1, in_dim, h1),
            "fc2": linear_params(k2, h1, h2),
            "fc3": linear_params(k3, h2, 1)}


def _apply_head(p, x, rng, train, drop=0.5):
    if train and drop:
        keep = jax.random.bernoulli(rng, 1 - drop, x.shape)
        x = jnp.where(keep, x / (1 - drop), 0.0)
    h = jax.nn.relu(apply_linear(p["fc1"], x))
    h = jax.nn.relu(apply_linear(p["fc2"], h))
    return apply_linear(p["fc3"], h)[..., 0]


def _set_encoder(key, d):
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_params(k1, d, 2 * d),
            "fc2": linear_params(k2, 2 * d, d)}


def _apply_set(p, ids, embed, rng, train, drop=0.5):
    """DeepSet: sum of (dropped) member embeddings -> 2-layer encoder
    (model.py:48-70); ids padded with the zero UNK row."""
    e = embed[ids]                       # [B, K, D]
    if train and drop:
        keep = jax.random.bernoulli(rng, 1 - drop, e.shape)
        e = jnp.where(keep, e / (1 - drop), 0.0)
    s = e.sum(axis=1)
    return apply_linear(p["fc2"], jax.nn.relu(apply_linear(p["fc1"], s)))


class SimpleMLPBaseline:
    def __init__(self, taxonomy: Taxonomy, model: str = "MLP",
                 first_hidden: int = 128, second_hidden: int = 64,
                 negative_size: int = 16, lr: float = 1e-3, seed: int = 0):
        if model not in ("MLP", "DeepSetMLP", "DeepAPGMLP"):
            raise ValueError(f"unknown simple_MLP model {model!r}")
        self.kind = model
        self.taxo = taxonomy
        feats = np.asarray(taxonomy.features, np.float32)
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        # UNK zero row for set padding (model.py:38-40)
        self.embed = jnp.asarray(np.vstack([feats, np.zeros((1, feats.shape[1]),
                                                            np.float32)]))
        self.unk = feats.shape[0]
        d = feats.shape[1]

        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        in_mult = {"MLP": 2, "DeepSetMLP": 3, "DeepAPGMLP": 4}[model]
        self.params = {"head": _mlp_head(k1, in_mult * d, first_hidden,
                                         second_hidden)}
        if model in ("DeepSetMLP", "DeepAPGMLP"):
            self.params["sib_enc"] = _set_encoder(k2, d)
        if model == "DeepAPGMLP":
            self.params["gp_enc"] = _set_encoder(k3, d)

        self.rng = random.Random(seed)
        self.optimizer = optax.adam(lr)
        self.opt_state = self.optimizer.init(self.params)
        self.negative_size = negative_size

        # training graph: edges among train nodes only
        train_set = set(int(t) for t in taxonomy.train_node_ids)
        e = taxonomy.edges
        keep = [(int(p), int(c)) for p, c in e
                if int(p) in train_set and int(c) in train_set]
        self.train_edges = keep
        self.children = build_csr(taxonomy.num_nodes,
                                  np.asarray([p for p, _ in keep], np.int32),
                                  np.asarray([c for _, c in keep], np.int32))
        self.parents_csr = build_csr(taxonomy.num_nodes,
                                     np.asarray([c for _, c in keep], np.int32),
                                     np.asarray([p for p, _ in keep], np.int32))
        self.queue = [p for p, _ in keep] * 2
        self.pointer = 0
        self._step = self._build_step()

    # ----------------------------------------------------------------- model
    def score(self, params, parents, children, siblings, gps, rng, train):
        e = self.embed
        parts = [e[parents], e[children]]
        k1, k2, k3 = jax.random.split(rng, 3)
        if self.kind in ("DeepSetMLP", "DeepAPGMLP"):
            parts.append(_apply_set(params["sib_enc"], siblings, e, k1, train))
        if self.kind == "DeepAPGMLP":
            parts.append(_apply_set(params["gp_enc"], gps, e, k2, train))
        return _apply_head(params["head"], jnp.concatenate(parts, axis=-1),
                           k3, train)

    def _build_step(self):
        optimizer = self.optimizer

        @jax.jit
        def step(params, opt_state, parents, children, siblings, gps, labels,
                 rng):
            def loss_fn(p):
                logits = self.score(p, parents, children, siblings, gps, rng,
                                    True)
                # BCE on inverted target like model.py bce_loss (energies)
                t = 1.0 - labels
                per = (jnp.maximum(logits, 0) - logits * t +
                       jnp.log1p(jnp.exp(-jnp.abs(logits))))
                return per.sum()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    # ------------------------------------------------------------------ data
    def _sets_for(self, parent: int, query: int):
        sibs = [c for c in self.children.neighbors(parent).tolist()
                if c != query][:MAX_SIBLINGS]
        gps = self.parents_csr.neighbors(parent).tolist()[:MAX_GRANDPARENTS]
        sibs = sibs + [self.unk] * (MAX_SIBLINGS - len(sibs))
        gps = gps + [self.unk] * (MAX_GRANDPARENTS - len(gps))
        return sibs, gps

    def _sample_batch(self, batch_edges):
        parents, childs, sibs, gps, labels = [], [], [], [], []
        for p, c in batch_edges:
            for anchor, lab in [(p, 1.0)] + [
                    (n, 0.0) for n in self._negatives(c)]:
                parents.append(anchor)
                childs.append(c)
                s, g = self._sets_for(anchor, c)
                sibs.append(s)
                gps.append(g)
                labels.append(lab)
        return (np.asarray(parents, np.int32), np.asarray(childs, np.int32),
                np.asarray(sibs, np.int32), np.asarray(gps, np.int32),
                np.asarray(labels, np.float32))

    def _negatives(self, query):
        if self.pointer == 0:
            self.rng.shuffle(self.queue)
        out = [x for x in self.queue[self.pointer:
                                     self.pointer + self.negative_size]
               if x != query]
        self.pointer += self.negative_size
        if self.pointer >= len(self.queue):
            self.pointer = 0
        return out

    # ----------------------------------------------------------------- train
    def train(self, epochs: int = 5, batch_size: int = 64, log=print):
        key = jax.random.PRNGKey(1)
        for ep in range(epochs):
            self.rng.shuffle(self.train_edges)
            total, nb = 0.0, 0
            for i in range(0, len(self.train_edges), batch_size):
                arrs = self._sample_batch(
                    self.train_edges[i:i + batch_size])
                key, sub = jax.random.split(key)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, *map(jnp.asarray, arrs), sub)
                total += float(loss)
                nb += 1
            log(f"[simple_MLP:{self.kind}] epoch {ep + 1}: "
                f"loss {total / max(nb, 1):.3f}")

    # ------------------------------------------------------------------ eval
    def evaluate(self) -> dict:
        taxo = self.taxo
        train_ids = [int(t) for t in taxo.train_node_ids]
        parents_full = taxo.parents
        eval_fn = jax.jit(lambda p, pa, ch, si, gp: self.score(
            p, pa, ch, si, gp, jax.random.PRNGKey(0), False))

        # precompute per-candidate sets once
        cand = np.asarray(train_ids, np.int32)
        sibs = np.zeros((len(cand), MAX_SIBLINGS), np.int32)
        gps = np.zeros((len(cand), MAX_GRANDPARENTS), np.int32)
        for i, a in enumerate(cand):
            s, g = self._sets_for(int(a), -1)
            sibs[i] = s
            gps[i] = g

        pos_of_train = {t: i for i, t in enumerate(train_ids)}
        all_ranks = []
        for q in taxo.test_node_ids:
            pos_idx = [pos_of_train[p] for p in
                       parents_full.neighbors(int(q)).tolist()
                       if int(p) in pos_of_train]
            if not pos_idx:
                continue
            ch = np.full((len(cand),), int(q), np.int32)
            scores = np.asarray(eval_fn(self.params, cand, ch, sibs, gps))
            # energy semantics: smaller = better (mode 0)
            all_ranks.append(ranks_from_scores(scores, pos_idx, mode=0))
        return {
            "model": self.kind,
            "num_queries": len(all_ranks),
            "macro_mr": macro_mr(all_ranks),
            "micro_mr": micro_mr(all_ranks),
            "hit_at_1": hit_at_1(all_ranks),
            "hit_at_3": hit_at_3(all_ranks),
            "hit_at_5": hit_at_5(all_ranks),
            "mrr_scaled_10": mrr_scaled_10(all_ranks),
        }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--model", default="MLP",
                   choices=["MLP", "DeepSetMLP", "DeepAPGMLP"])
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--device", default=None,
                   help="jax platform (cpu recommended: the per-batch host "
                        "loop is relay-hostile on the tunneled TPU)")
    args = p.parse_args()
    if args.device:
        jax.config.update("jax_platforms", args.device)
    b = SimpleMLPBaseline(Taxonomy.load(args.data), model=args.model,
                          lr=args.lr)
    b.train(epochs=args.epochs)
    for k, v in b.evaluate().items():
        print(f"{k}: {v}")
