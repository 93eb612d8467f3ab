"""Host-side batch loader producing fixed-shape GroupBatches.

Replaces the reference's torch DataLoader + dgl.batch collation pipeline
(data_loader/data_loaders.py:9-110). Instead of worker processes pickling
dynamic DGL graphs, we build padded int32 slot arrays (see egobatch.py) and
double-buffer them with a background prefetch thread; features are gathered
on-device, so the per-batch host->device payload is tiny.

Group layouts (static across an epoch, so each jitted step compiles once):
- train (sampling_mode 1): C = 1 + negative_size, positive in column 0 —
  the InfoNCE layout of trainer/trainer.py:52-56.
- validation (sampling_mode 0): C = max_query_parents + negative_size;
  positives occupy the leading parent slots (cand_mask-padded), negatives the
  rest ("at most k" semantics, dataset.py:340-355).

The final partial batch is padded with empty groups (cand_mask all False);
losses/metrics ignore them. Test mode is handled by the evaluation engine
(taxoexpan_tpu/evaluation), which encodes each candidate anchor once instead
of building per-query candidate batches (test_fast.py:96-147).
"""
from __future__ import annotations

import queue
import random
import threading

import numpy as np

from .egobatch import GroupBatch, make_ego_batch
from .sampler import MaskedGraphSampler


class GroupBatchLoader:
    def __init__(self,
                 sampler: MaskedGraphSampler,
                 batch_size: int,
                 shuffle: bool = True,
                 seed: int = 0,
                 prefetch: int = 2,
                 backend: str = "auto"):
        if sampler.mode == "test":
            raise ValueError(
                "GroupBatchLoader serves train/validation; use "
                "taxoexpan_tpu.evaluation for test-time all-candidate ranking")
        self.sampler = sampler
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.rng = random.Random(seed)
        self.prefetch = prefetch

        # native C++ fast path: training layout (sampling_mode 1) and the
        # validation layout (sampling_mode 0 — positives per parent +
        # at-most-k negatives)
        self.native = None
        if backend not in ("auto", "native", "python"):
            raise ValueError(f"unknown loader backend {backend!r}")
        if backend in ("auto", "native"):
            try:
                from ..native import NativeSampler
                if NativeSampler.available():
                    self.native = NativeSampler(sampler, seed=seed)
            except Exception:
                if backend == "native":
                    raise

        if sampler.sampling_mode == 1:
            self.max_pos = 1
        else:
            self.max_pos = sampler.max_query_parents
        self.group_size = self.max_pos + sampler.negative_size
        self.num_queries = len(sampler)
        self.num_batches = -(-self.num_queries // self.batch_size)

    # ------------------------------------------------------------------ build
    def _build_batch_native(self, queries: list[int]) -> GroupBatch:
        import numpy as np
        s = self.sampler
        g, c = self.batch_size, self.group_size
        n = s.max_parents + 1 + s.expand_factor
        q = np.asarray(queries, dtype=np.int32)
        if s.sampling_mode == 1:
            node_ids, ngp, nsib, labels, cand_mask = \
                self.native.sample_train_batch(q)
        else:
            node_ids, ngp, nsib, labels, cand_mask = \
                self.native.sample_eval_batch(q)
        if len(queries) < g:  # pad the final batch with empty groups
            pad_rows = (g - len(queries)) * c
            node_ids = np.vstack([node_ids,
                                  np.zeros((pad_rows, n), np.int32)])
            ngp = np.concatenate([ngp, np.zeros(pad_rows, np.int32)])
            nsib = np.concatenate([nsib, np.zeros(pad_rows, np.int32)])
            labels = np.vstack([labels,
                                np.zeros((g - len(queries), c), np.float32)])
            cand_mask = np.vstack([cand_mask,
                                   np.zeros((g - len(queries), c), bool)])
        query_ids = np.zeros((g,), np.int32)
        query_ids[:len(queries)] = q
        from .egobatch import EgoBatch
        ego = EgoBatch(node_ids=node_ids, ngp=ngp, nsib=nsib)
        return GroupBatch(ego=ego, query_ids=query_ids, query_feats=None,
                          labels=labels, cand_mask=cand_mask)

    def _build_batch(self, queries: list[int]) -> GroupBatch:
        if self.native is not None:
            return self._build_batch_native(queries)
        s = self.sampler
        g, c = self.batch_size, self.group_size
        labels = np.zeros((g, c), dtype=np.float32)
        cand_mask = np.zeros((g, c), dtype=bool)
        query_ids = np.zeros((g,), dtype=np.int32)
        egonets = [([], 0, [])] * (g * c)

        for gi, q in enumerate(queries):
            enets, labs, _anchors = s.sample_group(q)
            npos = sum(labs)
            nneg = len(labs) - npos
            if npos > self.max_pos or nneg > s.negative_size:
                raise RuntimeError(
                    f"group overflow for query {q}: {npos} positives "
                    f"(max {self.max_pos}), {nneg} negatives (max {s.negative_size})")
            query_ids[gi] = q
            for j in range(npos):
                egonets[gi * c + j] = enets[j]
                labels[gi, j] = 1.0
                cand_mask[gi, j] = True
            for j in range(nneg):
                col = self.max_pos + j
                egonets[gi * c + col] = enets[npos + j]
                cand_mask[gi, col] = True

        ego = make_ego_batch(egonets, s.max_parents, s.expand_factor)
        return GroupBatch(ego=ego, query_ids=query_ids, query_feats=None,
                          labels=labels, cand_mask=cand_mask)

    # ------------------------------------------------------------------- iter
    def _batches(self):
        order = list(self.sampler.node_list)
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            yield self._build_batch(order[i:i + self.batch_size])

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list[BaseException] = []

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # surface worker errors in the consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]

    def __len__(self) -> int:
        return self.num_batches
