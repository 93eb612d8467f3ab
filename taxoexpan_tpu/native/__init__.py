"""ctypes bindings + build glue for the native C++ ego-batch sampler.

Build: `make -C taxoexpan_tpu/native` (or it auto-builds on first import if a
compiler is present). Falls back cleanly when the shared library is missing —
`NativeSampler.available()` gates usage, and the pure-Python
MaskedGraphSampler remains the reference implementation.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtesampler.so")
_lib = None


def _try_build() -> bool:
    src = os.path.join(_DIR, "sampler.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no compiler / failure -> python fallback
        logger.debug("native sampler build failed: %s", e)
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or \
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                os.path.join(_DIR, "sampler.cpp")):
        if not _try_build() and not os.path.exists(_LIB_PATH):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.te_sampler_create.restype = ctypes.c_void_p
    lib.te_sampler_create.argtypes = [
        i64p, i32p, i64p, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_uint64]
    lib.te_sampler_set_masks.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, i64p, i32p]
    lib.te_sampler_destroy.argtypes = [ctypes.c_void_p]
    lib.te_sample_train_batch.restype = ctypes.c_int32
    lib.te_sample_train_batch.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p, f32p, u8p]
    lib.te_sample_eval_batch.restype = ctypes.c_int32
    lib.te_sample_eval_batch.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, i32p, i32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p,
        f32p, u8p]
    lib.te_build_anchor_egonets.restype = ctypes.c_int32
    lib.te_build_anchor_egonets.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, i32p, i32p]
    _lib = lib
    return _lib


class NativeSampler:
    """Drop-in accelerator for the training hot path of MaskedGraphSampler."""

    def __init__(self, py_sampler, seed: int = 0):
        """Wrap an initialized python MaskedGraphSampler: reuses its working
        graph CSR, masks, and parameters."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native sampler library unavailable")
        self.lib = lib
        self.py = py_sampler
        s = py_sampler
        self._child_indptr = np.ascontiguousarray(s.children.indptr, np.int64)
        self._child_idx = np.ascontiguousarray(s.children.indices, np.int32)
        self._par_indptr = np.ascontiguousarray(s.parents.indptr, np.int64)
        self._par_idx = np.ascontiguousarray(s.parents.indices, np.int32)
        train_ids = np.ascontiguousarray(
            sorted(s.all_positions), np.int32)
        self.handle = lib.te_sampler_create(
            self._child_indptr, self._child_idx, self._par_indptr,
            self._par_idx, np.int64(s.taxonomy.num_nodes), train_ids,
            np.int64(len(train_ids)), np.int32(s.cache_refresh_time),
            np.uint64(seed))
        # masks CSR
        qids = np.ascontiguousarray(s.node_list, np.int32)
        indptr = np.zeros(len(qids) + 1, np.int64)
        rows = []
        for i, q in enumerate(s.node_list):
            m = np.asarray(sorted(s.node2masks[q]), np.int32)
            rows.append(m)
            indptr[i + 1] = indptr[i] + len(m)
        indices = np.ascontiguousarray(
            np.concatenate(rows) if rows else np.zeros(0, np.int32))
        lib.te_sampler_set_masks(self.handle, qids, np.int64(len(qids)),
                                 indptr, indices)
        self._masks_keepalive = (qids, indptr, indices)

    @staticmethod
    def available() -> bool:
        return get_lib() is not None

    def sample_train_batch(self, query_ids: np.ndarray):
        """Fill a full [G, 1+ns] group batch; returns numpy arrays
        (node_ids [G*C, N], ngp, nsib, labels [G, C], cand_mask [G, C])."""
        s = self.py
        g = len(query_ids)
        c = 1 + s.negative_size
        n = s.max_parents + 1 + s.expand_factor
        node_ids = np.zeros((g * c, n), np.int32)
        ngp = np.zeros((g * c,), np.int32)
        nsib = np.zeros((g * c,), np.int32)
        labels = np.zeros((g * c,), np.float32)
        mask = np.zeros((g * c,), np.uint8)
        rc = self.lib.te_sample_train_batch(
            self.handle, np.ascontiguousarray(query_ids, np.int32),
            np.int32(g), np.int32(s.negative_size),
            np.int32(s.expand_factor), np.int32(s.max_parents),
            node_ids, ngp, nsib, labels, mask)
        if rc != 0:
            raise RuntimeError(f"native sampler failed with code {rc}")
        return (node_ids, ngp, nsib, labels.reshape(g, c),
                mask.reshape(g, c).astype(bool))

    def sample_eval_batch(self, query_ids: np.ndarray):
        """Fill a full validation [G, max_pos+ns] group batch (sampling_mode
        0 layout: one positive per parent in the leading columns, at-most-k
        negatives after max_pos); same return contract as
        sample_train_batch."""
        s = self.py
        g = len(query_ids)
        c = s.max_query_parents + s.negative_size
        n = s.max_parents + 1 + s.expand_factor
        node_ids = np.zeros((g * c, n), np.int32)
        ngp = np.zeros((g * c,), np.int32)
        nsib = np.zeros((g * c,), np.int32)
        labels = np.zeros((g * c,), np.float32)
        mask = np.zeros((g * c,), np.uint8)
        # true parents from the FULL taxonomy (validation queries are
        # held-out leaves — their edges are not in the working-graph CSR)
        max_pos = s.max_query_parents
        parent_list = np.zeros((g, max_pos), np.int32)
        parent_counts = np.zeros((g,), np.int32)
        for i, q in enumerate(np.asarray(query_ids)):
            ps = s.node2parents[int(q)]
            parent_counts[i] = len(ps)
            parent_list[i, :len(ps)] = ps
        rc = self.lib.te_sample_eval_batch(
            self.handle, np.ascontiguousarray(query_ids, np.int32),
            np.int32(g), np.ascontiguousarray(parent_list),
            np.ascontiguousarray(parent_counts), np.int32(s.negative_size),
            np.int32(max_pos), np.int32(s.expand_factor),
            np.int32(s.max_parents), node_ids, ngp, nsib, labels, mask)
        if rc != 0:
            raise RuntimeError(f"native eval sampler failed with code {rc}")
        return (node_ids, ngp, nsib, labels.reshape(g, c),
                mask.reshape(g, c).astype(bool))

    def build_anchor_egonets(self, anchors: np.ndarray):
        s = self.py
        k = len(anchors)
        n = s.max_parents + 1 + s.expand_factor
        node_ids = np.zeros((k, n), np.int32)
        ngp = np.zeros((k,), np.int32)
        nsib = np.zeros((k,), np.int32)
        rc = self.lib.te_build_anchor_egonets(
            self.handle, np.ascontiguousarray(anchors, np.int32),
            np.int32(k), np.int32(s.expand_factor),
            np.int32(s.max_parents), node_ids, ngp, nsib)
        if rc != 0:
            raise RuntimeError(f"native egonet build failed: {rc}")
        return node_ids, ngp, nsib

    def __del__(self):
        try:
            if getattr(self, "handle", None):
                self.lib.te_sampler_destroy(self.handle)
        except Exception:
            pass
