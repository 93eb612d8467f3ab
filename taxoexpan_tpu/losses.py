"""Loss functions over grouped score matrices.

Re-implements model/loss.py over the static [G, C] group layout (scores,
labels, cand_mask) instead of flat label-pattern arrays — in particular,
margin_rank_loss's regex-on-bytes group-boundary trick (loss.py:33-40) is
replaced by explicit group structure carried in the batch (SURVEY.md §7.4).

All losses are summed (reduction="sum" in the reference) over *valid*
candidates/groups; padded entries contribute 0. The score convention follows
the reference: for bce/square_exp/margin_rank the model output is an "energy"
(smaller = better, loss.py:21-29), for info_nce it is a similarity logit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _group_valid(cand_mask: jax.Array) -> jax.Array:
    return cand_mask.any(axis=1)


def info_nce_loss(scores: jax.Array, labels: jax.Array,
                  cand_mask: jax.Array) -> jax.Array:
    """Cross-entropy against column 0 (the single positive), summed over
    groups — loss.py:52-57 + the (B, 1+ns) reshape of trainer/trainer.py:52-56.

    Requires the training layout (sampling_mode 1): exactly one positive in
    column 0 of every valid group.
    """
    masked = jnp.where(cand_mask, scores, NEG_INF)
    logz = jax.nn.logsumexp(masked, axis=1)
    nll = logz - scores[:, 0]
    return jnp.where(_group_valid(cand_mask), nll, 0.0).sum()


def bce_loss(scores: jax.Array, labels: jax.Array, cand_mask: jax.Array,
             beta: float = 1.0) -> jax.Array:
    """BCE-with-logits against the INVERTED target (energies: smaller =
    better), summed — loss.py:21-29."""
    target = 1.0 - labels
    # log(1 + exp(-|x|)) formulation of BCEWithLogits
    per = jnp.maximum(scores, 0) - scores * target + jnp.log1p(
        jnp.exp(-jnp.abs(scores)))
    return jnp.where(cand_mask, per, 0.0).sum()


def square_exp_loss(scores: jax.Array, labels: jax.Array,
                    cand_mask: jax.Array, beta: float = 1.0) -> jax.Array:
    """sum(pos^2) + beta * sum(exp(-neg)) — loss.py:12-19."""
    pos = jnp.where(cand_mask & (labels == 1), scores, 0.0)
    neg_term = jnp.where(cand_mask & (labels == 0), jnp.exp(-scores), 0.0)
    return (pos ** 2).sum() + beta * neg_term.sum()


def margin_rank_loss(scores: jax.Array, labels: jax.Array,
                     cand_mask: jax.Array, margin: float = 1.0) -> jax.Array:
    """sum over within-group (pos, neg) pairs of max(0, margin + s_pos - s_neg)
    — loss.py:31-50 (margin_ranking_loss with y = -1 on energy scores), with
    the per-group pair structure taken from the batch layout instead of the
    byte-regex boundary scan.
    """
    pos_mask = cand_mask & (labels == 1)
    neg_mask = cand_mask & (labels == 0)
    diff = scores[:, :, None] - scores[:, None, :]          # s_i - s_j
    pair = jnp.maximum(0.0, margin + diff)
    valid = pos_mask[:, :, None] & neg_mask[:, None, :]
    return jnp.where(valid, pair, 0.0).sum()


def nll_loss(scores: jax.Array, labels: jax.Array,
             cand_mask: jax.Array) -> jax.Array:
    """NLL against column 0 on log-probability inputs — loss.py:9-10.

    (Unused by shipped configs; provided for surface parity.)
    """
    return jnp.where(_group_valid(cand_mask), -scores[:, 0], 0.0).sum()


LOSSES = {
    "info_nce_loss": info_nce_loss,
    "bce_loss": bce_loss,
    "square_exp_loss": square_exp_loss,
    "margin_rank_loss": margin_rank_loss,
    "nll_loss": nll_loss,
}


def get_loss(name: str):
    if name not in LOSSES:
        raise ValueError(f"unknown loss {name!r}; available: {list(LOSSES)}")
    return LOSSES[name]
