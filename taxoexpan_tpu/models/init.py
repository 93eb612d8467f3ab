"""Parameter initializers matching the reference's torch inits (statistically).

- GCNLayer: U(-1/sqrt(out), 1/sqrt(out)) for weight+bias (model_zoo.py:28-32)
- GATLayer: xavier_normal with gain 1.414 for fc and attn vectors
  (model_zoo.py:67-69)
- nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +),
  bias U(-1/sqrt(fan_in), +)
- nn.Bilinear default: U(-1/sqrt(in1_features), +)
- nn.Embedding default: N(0, 1)
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_normal(key, shape, fan_in, fan_out, gain=1.414, dtype=jnp.float32):
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def linear_params(key, in_f: int, out_f: int, bias: bool = True):
    """torch nn.Linear default init; weight stored [in_f, out_f] (x @ W)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_f)
    p = {"w": uniform(kw, (in_f, out_f), bound)}
    if bias:
        p["b"] = uniform(kb, (out_f,), bound)
    return p


def embedding_params(key, vocab: int, dim: int):
    return {"emb": jax.random.normal(key, (vocab, dim), jnp.float32)}


def apply_linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def dropout(rng, x, rate: float, train: bool):
    """Inverted dropout; identity when not training or rate==0."""
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
