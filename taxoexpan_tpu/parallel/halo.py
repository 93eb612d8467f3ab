"""Pallas ring halo exchange: the partitioned-table boundary exchange as one
fused request->gather->response kernel over `make_async_remote_copy` RDMA.

`partition.partitioned_gather`'s default implementation issues two
`lax.all_to_all` collectives with an XLA gather between them; whether XLA
overlaps those collectives with local compute is scheduler-dependent and
unproven on a real slice (docs/ROADMAP.md). This module is the explicit
alternative (select with TAXOEXPAN_HALO=ring): one Pallas kernel per device
that walks the ring and OWNS the overlap instead of hoping for it —

  phase 0   every request bucket is RDMA'd to its owner immediately
            (P-1 sends in flight at once; per-source inbox slots mean no
            write hazards and no acks);
  self      the device answers its own bucket while the ring traffic flies;
  step s    wait for the request bucket from requester (i-s); gather its
            rows; RDMA the answer straight into the requester's output
            slab. Answer scratches are DOUBLE-BUFFERED: the gather for
            step s+1 proceeds while step s's answer DMA drains (the wait
            on ans_send[(s+1) % 2] is the only back-pressure).

The in-kernel gather is a one-hot matmul: Mosaic has no arbitrary row
gather, and per-row DMAs at ~1 us issue cost would serialize ~2n row
fetches; a [cap, V/P] one-hot times [V/P, D] table is exact (each output
row sums exactly one nonzero) and rides the MXU. One-hot work scales as
O(cap x V/P) MACs, which pins this kernel's sweet spot to shards whose
table fits VMEM (V/P up to ~32k rows at D=250 — all of MAG-CS). It is
deliberately NOT extended to stream ANY-space table tiles for
MAG-Full-scale shards: at V/P ~ 125k rows the one-hot FLOPs alone are
~12 ms per exchange while an XLA gather is ~0.1 ms — at that scale the
right design is the default all_to_all path (XLA gather between the two
collectives), whose overlap XLA schedules; this ring kernel is the
explicit-overlap alternative for the VMEM-resident regime.

Semantics match partitioned_gather's middle section exactly: input
req [P, cap] (bucketed local-slot requests per owner), output
ans [P, cap, D] with ans[j] = table rows answering req[j] on owner j.
Out-of-range slots differ only in dropped lanes (one-hot yields zeros where
the XLA path clamps) — both are overwritten/ignored by the caller's
un-bucketing. Parity is tested on the virtual CPU mesh in interpret mode
(tests/test_halo.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_rows(table, idx):
    """Exact one-hot-matmul gather: table [R, D], idx [cap] -> [cap, D] f32.

    One-hot entries are 0/1 in the table dtype (exactly representable in
    bf16), so each output row is a single exact term — no rounding beyond
    the table's own storage dtype. idx >= R produces a zero row (the XLA
    path clamps instead; both are dropped by the caller)."""
    cap = idx.shape[0]
    r = table.shape[0]
    oh = (jnp.broadcast_to(idx.reshape(cap, 1), (cap, r)) ==
          jax.lax.broadcasted_iota(jnp.int32, (cap, r), 1))
    return jax.lax.dot_general(
        oh.astype(table.dtype), table,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _ring_kernel(req_ref, table_ref, ans_ref, inbox_ref, scratch_ref,
                 req_send, req_recv, ans_send, ans_recv, self_sem,
                 bar_buf, bar_send, bar_recv, *, p, axis, interpret):
    my = jax.lax.axis_index(axis)

    # descriptor builders — DMA semaphores count BYTES, so every wait goes
    # through a descriptor with the matching ref slice (wait_send/wait_recv),
    # never a raw semaphore_wait
    def req_rdma(step):
        dst = jax.lax.rem(my + step, p)
        return pltpu.make_async_remote_copy(
            src_ref=req_ref.at[dst], dst_ref=inbox_ref.at[my],
            send_sem=req_send.at[step], recv_sem=req_recv.at[my],
            device_id=dst, device_id_type=pltpu.DeviceIdType.LOGICAL)

    def req_arrival(src):
        # wait-only descriptor for the bucket landing in inbox[src]
        return pltpu.make_async_remote_copy(
            src_ref=req_ref.at[src], dst_ref=inbox_ref.at[src],
            send_sem=req_send.at[0], recv_sem=req_recv.at[src],
            device_id=src, device_id_type=pltpu.DeviceIdType.LOGICAL)

    def ans_rdma(buf, dest):
        return pltpu.make_async_remote_copy(
            src_ref=scratch_ref.at[buf], dst_ref=ans_ref.at[my],
            send_sem=ans_send.at[buf], recv_sem=ans_recv.at[my],
            device_id=dest, device_id_type=pltpu.DeviceIdType.LOGICAL)

    def ans_arrival(owner):
        return pltpu.make_async_remote_copy(
            src_ref=scratch_ref.at[0], dst_ref=ans_ref.at[owner],
            send_sem=ans_send.at[0], recv_sem=ans_recv.at[owner],
            device_id=owner, device_id_type=pltpu.DeviceIdType.LOGICAL)

    # ---- entry barrier ----------------------------------------------------
    # the drain below only proves THIS device's traffic landed; without a
    # barrier a fast device could re-enter this kernel (the trainer calls
    # ring_exchange twice per step: ego then query gather, with different
    # cap/scratch layouts) and fire phase-0 sends into a peer still inside
    # the PREVIOUS exchange, corrupting its live scratch. Align all devices
    # before any RDMA.
    if not interpret:
        # Compiled path: the REGULAR barrier semaphore keyed by collective_id
        # (pallas_call compiler_params). Unlike the token-RDMA barrier below,
        # it has no per-invocation scratch state, so a fast device re-entering
        # the kernel cannot corrupt a peer still inside the previous
        # invocation — its signals simply accumulate on the shared semaphore.
        barrier_sem = pltpu.get_barrier_semaphore()
        for s in range(1, p):
            dst = jax.lax.rem(my + s, p)
            pltpu.semaphore_signal(
                barrier_sem, inc=1, device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier_sem, p - 1)
    else:
        # Interpret-mode fallback: token RDMAs into per-sender slots.
        # get_barrier_semaphore / remote semaphore_signal are not implemented
        # by the interpret machinery; tiny remote copies barrier equivalently
        # for the single-invocation tests (the cross-invocation hazard the
        # compiled path fixes cannot occur under interpret's lockstep
        # emulation).
        for s in range(1, p):
            dst = jax.lax.rem(my + s, p)
            pltpu.make_async_remote_copy(
                src_ref=bar_buf.at[my], dst_ref=bar_buf.at[my],
                send_sem=bar_send.at[dst], recv_sem=bar_recv.at[my],
                device_id=dst, device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).start()
        for s in range(1, p):
            src = jax.lax.rem(my - s + p, p)
            # token from src landed in bar_buf[src]; drain my own sends too
            pltpu.make_async_remote_copy(
                src_ref=bar_buf.at[src], dst_ref=bar_buf.at[src],
                send_sem=bar_send.at[src], recv_sem=bar_recv.at[src],
                device_id=src, device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_recv()
            dst = jax.lax.rem(my + s, p)
            pltpu.make_async_remote_copy(
                src_ref=bar_buf.at[my], dst_ref=bar_buf.at[my],
                send_sem=bar_send.at[dst], recv_sem=bar_recv.at[my],
                device_id=dst, device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait_send()

    # ---- phase 0: fire every request bucket at its owner ------------------
    # per-source inbox slots (inbox[src] on the owner) make all P-1 sends
    # hazard-free, so they all go out before any compute
    for s in range(1, p):
        req_rdma(s).start()

    # ---- self-service overlaps the ring traffic ---------------------------
    rows = _gather_rows(table_ref[...], req_ref[my]).astype(ans_ref.dtype)
    scratch_ref[0] = rows
    self_copy = pltpu.make_async_copy(scratch_ref.at[0], ans_ref.at[my],
                                      self_sem)
    self_copy.start()
    self_copy.wait()   # scratch slot 0 is reused at step s=2

    # ---- ring steps: answer requester (my - s), double-buffered -----------
    for s in range(1, p):
        src = jax.lax.rem(my - s + p, p)
        buf = s % 2
        # wait for the request bucket from src, then gather its rows
        req_arrival(src).wait_recv()
        rows = _gather_rows(table_ref[...],
                            inbox_ref[src]).astype(ans_ref.dtype)
        # back-pressure: this scratch slot's previous answer DMA (step s-2)
        # must have drained before the overwrite; slot 0's first user was
        # the self-copy, which was waited inline above
        if s >= 3:
            ans_rdma(buf, src).wait_send()
        scratch_ref[buf] = rows
        # answer straight into the requester's output slab, slot = my index
        ans_rdma(buf, src).start()

    # ---- drain: everything in flight must land before the kernel exits ----
    for s in range(1, p):
        req_rdma(s).wait_send()                      # my request sends
        owner = jax.lax.rem(my + s, p)
        ans_arrival(owner).wait_recv()               # answers owed to me
    # the last two answer sends still hold their scratch slots
    if p >= 2:
        ans_rdma((p - 1) % 2, my).wait_send()
    if p >= 3:
        ans_rdma((p - 2) % 2, my).wait_send()


def ring_exchange(table_local: jax.Array, req: jax.Array, *, axis: str,
                  p: int, interpret: bool) -> jax.Array:
    """Run the fused ring halo exchange inside an enclosing shard_map.

    table_local: [V/P, D] this device's table shard (f32/bf16).
    req: [P, cap] int32 — local-slot requests bucketed by owner.
    Returns ans [P, cap, D] f32: ans[j] = owner j's rows for req[j].
    """
    cap = req.shape[1]
    d = table_local.shape[1]
    if p == 1:   # degenerate mesh: pure local gather
        return _gather_rows(table_local, req[0]).reshape(1, cap, d)
    kernel = functools.partial(_ring_kernel, p=p, axis=axis,
                               interpret=interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p, cap, d), jnp.float32,
                                       vma=frozenset({axis})),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # req [P, cap]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # table [V/P, D]
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # ans (HBM slab)
        scratch_shapes=[
            pltpu.VMEM((p, cap), jnp.int32),          # request inbox
            pltpu.VMEM((2, cap, d), jnp.float32),     # double-buffered rows
            pltpu.SemaphoreType.DMA((p,)),            # req_send (by step)
            pltpu.SemaphoreType.DMA((p,)),            # req_recv (by source)
            pltpu.SemaphoreType.DMA((2,)),            # ans_send (by buffer)
            pltpu.SemaphoreType.DMA((p,)),            # ans_recv (by owner)
            pltpu.SemaphoreType.DMA(()),              # self-copy
            pltpu.VMEM((p, 8), jnp.int32),            # barrier tokens
            pltpu.SemaphoreType.DMA((p,)),            # barrier send
            pltpu.SemaphoreType.DMA((p,)),            # barrier recv
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=13),
    )(req, table_local)
