"""Device mesh construction for SPMD training/eval.

The reference's only parallelism is single-process DataParallel over GPUs
(base/base_trainer.py:16-19; SURVEY §2.9 N8). Here parallelism is declared as
a `jax.sharding.Mesh` + NamedShardings and compiled by XLA onto ICI/DCN:

- 'dp'  : batch/group axis (data parallel) — gradients psum'd by XLA
- 'mp'  : model axis (head-parallel tensor parallel for GAT; candidate-axis
          sharding for evaluation)

Multi-host: under `jax.distributed`, jax.devices() spans all processes and the
same mesh code yields cross-host collectives; nothing here is host-count
aware by construction.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh from {axis_name: size}. Default: all devices on 'dp'."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = {"dp": len(devices)}
    sizes = list(shape.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {int(np.prod(sizes))} devices, "
            f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


def data_parallel_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return make_mesh({"dp": len(devices)}, devices)
