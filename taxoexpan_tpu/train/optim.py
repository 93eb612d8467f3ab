"""Optimizer + LR scheduling: optax Adam/AMSGrad with dynamic LR and an
explicit ReduceLROnPlateau equivalent.

Replaces the reference's reflection into torch.optim / torch.optim.lr_scheduler
(train.py:36-37, parse_config.py:57-64). Also implements gradient clipping —
the reference declares a `grad_clip` trainer key (config.mag.json:97) but
never applies it (SURVEY.md §7: deliberate fix).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

OPTIMIZERS = ("Adam", "AdamW", "SGD")


def build_optimizer(opt_type: str = "Adam", lr: float = 1e-3,
                    weight_decay: float = 0.0, amsgrad: bool = False,
                    grad_clip: float = -1.0, momentum: float = 0.9,
                    **kwargs) -> optax.GradientTransformation:
    """Build an optax chain mirroring the torch optimizer configs.

    `lr` is injected as a mutable hyperparameter so PlateauScheduler can
    rescale it between epochs without recompiling the train step.
    """
    if opt_type == "Adam":
        core = optax.amsgrad if amsgrad else optax.adam

        def make(learning_rate):
            chain = []
            if grad_clip and grad_clip > 0:
                chain.append(optax.clip_by_global_norm(grad_clip))
            if weight_decay:
                # torch Adam weight_decay: L2 added to the gradient before
                # moment updates
                chain.append(optax.add_decayed_weights(weight_decay))
            chain.append(core(learning_rate))
            return optax.chain(*chain)
    elif opt_type == "AdamW":
        def make(learning_rate):
            chain = []
            if grad_clip and grad_clip > 0:
                chain.append(optax.clip_by_global_norm(grad_clip))
            chain.append(optax.adamw(learning_rate,
                                     weight_decay=weight_decay))
            return optax.chain(*chain)
    elif opt_type == "SGD":
        def make(learning_rate):
            chain = []
            if grad_clip and grad_clip > 0:
                chain.append(optax.clip_by_global_norm(grad_clip))
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            chain.append(optax.sgd(learning_rate, momentum=momentum))
            return optax.chain(*chain)
    else:
        raise ValueError(f"unknown optimizer {opt_type!r}; "
                         f"available: {OPTIMIZERS}")
    return optax.inject_hyperparams(make)(learning_rate=lr)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


class PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (the scheduler in
    every shipped config, e.g. config.mag.json:83-91): multiply LR by `factor`
    after `patience` epochs without (threshold-relative) improvement.
    """

    def __init__(self, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 min_lr: float = 0.0, verbose: bool = False):
        if mode not in ("min", "max"):
            raise ValueError("mode must be 'min' or 'max'")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.verbose = verbose
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad_epochs = 0

    def _improved(self, value: float) -> bool:
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, value: float, opt_state):
        """Update with a new monitored value; returns (opt_state, reduced)."""
        if self._improved(value):
            self.best = value
            self.num_bad_epochs = 0
            return opt_state, False
        self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            old = get_lr(opt_state)
            new = max(old * self.factor, self.min_lr)
            if new < old:
                opt_state = set_lr(opt_state, new)
                if self.verbose:
                    print(f"ReduceLROnPlateau: lr {old:.3e} -> {new:.3e}")
            self.num_bad_epochs = 0
            return opt_state, True
        return opt_state, False

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
