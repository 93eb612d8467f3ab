"""Node-partitioned feature storage with all-to-all boundary exchange.

The reference's only parallelism replicates everything (DataParallel,
base_trainer.py:16-19). For MAG-Full-scale taxonomies the embedding table is
the dominant state; here it is *partitioned* across the mesh — each device
owns an interleaved shard of node rows — and every ego-batch gather becomes a
two-hop exchange executed inside shard_map:

    1. each device buckets its requested node ids by owner and sends the
       request buckets with an all_to_all over the 'dp' axis;
    2. owners gather their rows and send them back with a second all_to_all.

This is the graph analog of halo/boundary exchange in the scaling-book
recipe: requests ride the ICI as all-to-alls, compute on already-local rows
can overlap (XLA schedules the local gather between the collectives). It is
also the scale-out path named in BASELINE.json ("edge-partitioned taxonomy,
boundary feature exchange all-to-all").

The round-robin ownership (`node_id % num_shards`) keeps request buckets
balanced regardless of taxonomy layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_table(features: np.ndarray, num_shards: int) -> np.ndarray:
    """Pad the node axis so every shard holds the same number of rows."""
    v = features.shape[0]
    rows = -(-v // num_shards) * num_shards
    if rows != v:
        features = np.pad(features, ((0, rows - v), (0, 0)))
    return features


def shard_table(features: np.ndarray, mesh: Mesh, axis: str = "dp"):
    """Round-robin partition of node rows onto `axis`.

    Device k owns global rows {i : i % P == k}, stored locally as
    row i -> local slot i // P. Returns the device array with shard
    placement; use `partitioned_gather` to read it inside jit/shard_map.
    """
    p = mesh.shape[axis]
    feats = pad_table(np.asarray(features), p)
    v, d = feats.shape
    # reorder to [P, V/P, D] so shard k = rows owned by k
    owner_major = feats.reshape(v // p, p, d).transpose(1, 0, 2)
    return jax.device_put(
        owner_major.reshape(v, d),
        NamedSharding(mesh, P(axis, None)))


def partitioned_gather(table: jax.Array, ids: jax.Array, mesh: Mesh,
                       axis: str = "dp") -> jax.Array:
    """Gather rows of a row-partitioned table by global node id.

    table: owner-major sharded array from `shard_table` ([V, D], shard k
    holding the rows {i : i % P == k} at local slots i // P).
    ids: [...] int32 global node ids, sharded or replicated over `axis`.
    Returns [..., D] gathered features with the same sharding as `ids`.

    Implementation: shard_map over `axis`; per device, bucket requests by
    owner into fixed-size buffers, all_to_all them, answer with local gathers,
    all_to_all back, then scatter into request order.
    """
    p = mesh.shape[axis]
    d = table.shape[1]
    ids_shape = ids.shape

    def local_fn(table_local, ids_local):
        # table_local: [V/P, D]; ids_local: [...] local batch shard
        flat = ids_local.reshape(-1)
        n = flat.shape[0]
        owner = flat % p
        local_slot = flat // p

        # stable bucket-by-owner: position of each request within its bucket
        cap = n  # worst case: all requests to one owner
        sort_idx = jnp.argsort(owner, stable=True)          # group by owner
        sorted_owner = owner[sort_idx]
        sorted_slot = local_slot[sort_idx]
        # rank within bucket
        positions = jnp.arange(n, dtype=jnp.int32)
        bucket_start = jnp.searchsorted(sorted_owner, jnp.arange(p))
        rank_in_bucket = positions - bucket_start[sorted_owner]

        # request buffer [P, cap]: bucket per destination owner
        req = jnp.zeros((p, cap), dtype=jnp.int32)
        req = req.at[sorted_owner, rank_in_bucket].set(sorted_slot)
        valid = jnp.zeros((p, cap), dtype=bool)
        valid = valid.at[sorted_owner, rank_in_bucket].set(True)

        # hop 1: send requests to owners
        incoming = jax.lax.all_to_all(req, axis, 0, 0, tiled=False)
        # answer with local rows (out-of-range padded ids read row 0 — they
        # are dropped by validity on return)
        answers = table_local[incoming]                     # [P, cap, D]
        # hop 2: return feature rows to requesters
        returned = jax.lax.all_to_all(answers, axis, 0, 0, tiled=False)

        # un-bucket into request order
        out_sorted = returned[sorted_owner, rank_in_bucket]  # [n, D]
        out = jnp.zeros((n, d), dtype=table_local.dtype)
        out = out.at[sort_idx].set(out_sorted)
        return out.reshape(*ids_local.shape, d)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis),
    )(table, ids)
