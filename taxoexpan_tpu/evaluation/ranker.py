"""Two-phase candidate ranking engine — the test_fast.py / infer.py core.

Phase 1 (encode): build every candidate anchor's egonet once
(test_fast.py:96-97), encode them through propagate+readout in fixed-size
device chunks (the large-batch mode of test_fast.py:149-179, but with static
shapes and no host<->device parking of intermediates).

Phase 2 (score): instead of the reference's per-query matcher loop
(test_fast.py:116-140,189-218), score ALL queries against ALL positions with
the matcher's all-pairs form — for BIM/LBM one [C, d] x [d, Q] MXU matmul
(taxoexpan_tpu/models/matching.py:apply_all) — then rank positives per query
on host exactly like `rearrange` + `obtain_ranks` (test_fast.py:16-22,
metric.py:33-60).
"""
from __future__ import annotations

import logging

import jax
import numpy as np

from .. import metrics as metrics_mod
from ..data.egobatch import make_ego_batch
from ..data.sampler import MaskedGraphSampler

logger = logging.getLogger(__name__)


class TaxonomyRanker:
    def __init__(self, model, params, sampler: MaskedGraphSampler,
                 feature_table, *, encode_chunk: int = 4096,
                 query_chunk: int = 256, anchors: list[int] | None = None,
                 mesh=None):
        """`mesh`: optional jax.sharding.Mesh — anchor-encoding chunks are
        sharded over its 'dp' axis (the candidate-axis scale-out that
        replaces the reference's single-GPU 30000-anchor chunking,
        test_fast.py:149-179)."""
        self.model = model
        self.params = params
        self.sampler = sampler
        self.feature_table = np.asarray(feature_table, dtype=np.float32)
        self.encode_chunk = encode_chunk
        self.query_chunk = query_chunk
        # candidate positions: train node ids (test_fast.py:94); infer mode
        # passes all working-graph nodes instead (infer.py:79-80)
        self.candidates = (sorted(anchors) if anchors is not None
                           else list(sampler.candidate_positions))
        self._hg = None
        self.mesh = mesh
        if mesh is not None and getattr(model, "use_pallas", False):
            # shard the fused Pallas kernel explicitly over the mesh
            # (propagation._fused_call_spmd)
            model.propagate.spmd = (mesh, "dp")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            ndev = mesh.shape["dp"]
            if self.encode_chunk % ndev:
                self.encode_chunk += ndev - self.encode_chunk % ndev
            self._shard = NamedSharding(mesh, P("dp"))
        else:
            self._shard = None

        self._encode_jit = jax.jit(
            lambda p, feats, ngp, nsib: model.encode(
                p, feats, ngp, nsib, rng=jax.random.PRNGKey(0), train=False))
        self._match_all_jit = jax.jit(
            lambda p, hg, qf: model.match_all(p, hg, qf))

    # ------------------------------------------------------------ phase 1
    def encode_all_anchors(self) -> np.ndarray:
        """Encode every candidate egonet once -> hg [C, l_dim] (host array)."""
        if self._hg is not None:
            return self._hg
        s = self.sampler
        chunks = []
        table = jax.device_put(self.feature_table)
        n = len(self.candidates)
        for lo in range(0, n, self.encode_chunk):
            cand = self.candidates[lo:lo + self.encode_chunk]
            egos = [s.anchor_egonet(a) for a in cand]
            # pad the final chunk to keep the jit signature static
            pad = self.encode_chunk - len(egos)
            egos = egos + [([], 0, [])] * pad
            batch = make_ego_batch(egos, s.max_parents, s.expand_factor)
            if self._shard is not None:   # candidate-axis sharding over 'dp'
                dev_batch = jax.tree_util.tree_map(
                    lambda x: jax.device_put(np.asarray(x), self._shard),
                    batch)
            else:
                dev_batch = _device_batch(batch)
            feats = self.model.gather_feats(table, dev_batch)
            hg = self._encode_jit(self.params, feats,
                                  jax.numpy.asarray(dev_batch.ngp),
                                  jax.numpy.asarray(dev_batch.nsib))
            chunks.append(np.asarray(hg)[:len(cand)])
        self._hg = np.concatenate(chunks, axis=0) if chunks else \
            np.zeros((0, 1), np.float32)
        logger.info("Encoded %d candidate positions", len(self.candidates))
        return self._hg

    # ------------------------------------------------------------ phase 2
    def score(self, query_feats: np.ndarray) -> np.ndarray:
        """[Q, D] query features -> [Q, C] scores, chunked over queries."""
        hg = jax.device_put(self.encode_all_anchors())
        out = []
        q = np.asarray(query_feats, dtype=np.float32)
        for lo in range(0, q.shape[0], self.query_chunk):
            chunk = q[lo:lo + self.query_chunk]
            pad = self.query_chunk - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            s = self._match_all_jit(self.params, hg, jax.device_put(chunk))
            out.append(np.asarray(s)[:q.shape[0] - lo])
        return np.concatenate(out, axis=0)

    # ---------------------------------------------------------- evaluation
    def evaluate(self, metric_names: list[str], rank_mode: int,
                 case_study: bool = False) -> tuple[dict, list[list[str]]]:
        """Rank every test query against its candidate set; per-query metric
        accumulation exactly as test_fast.py:116-140 (metrics averaged over
        queries).

        Reference parity (dataset.py:319-325): a query's negatives are the
        candidate positions MINUS its node2masks set (descendants ∪ parents
        ∪ self ∪ roots — positions that can never be negatives), optionally
        retrieval-prefiltered to the `test_topk` nearest candidates by
        embedding cosine distance (sampler.eval_negatives). Positives are
        always ranked; masked positions are excluded from the comparison."""
        s = self.sampler
        queries = list(s.node_list)
        metric_fns = [metrics_mod.get_metric(m) for m in metric_names]
        cand_index = {c: i for i, c in enumerate(self.candidates)}

        qf = s.node_features[np.asarray(queries)]
        scores = self.score(qf)

        totals = np.zeros(len(metric_fns))
        cases: list[list[str]] = []
        if case_study:
            cases.append(["Test node index", "True parents",
                          "Predicted parents"] + metric_names)
        for qi, query in enumerate(queries):
            parents = s.node2parents[query]
            pos_idx = [cand_index[p] for p in parents if p in cand_index]
            if not pos_idx:
                continue
            neg_mask = self._negative_mask(query, cand_index)
            ranks = [metrics_mod.ranks_from_scores(scores[qi], pos_idx,
                                                   mode=rank_mode,
                                                   neg_mask=neg_mask)]
            row: list[str] = []
            if case_study:
                # predictions come from the query's candidate set:
                # positives + unmasked (possibly prefiltered) negatives
                allowed = neg_mask.copy()
                allowed[np.asarray(pos_idx, dtype=np.int64)] = True
                qscores = np.where(allowed, scores[qi],
                                   -np.inf if rank_mode == 1 else np.inf)
                order = np.argsort(qscores, kind="stable")
                if rank_mode == 1:   # similarity: larger better
                    order = order[::-1]
                top5 = [self.candidates[i] for i in order[:5]]
                vocab = s.taxonomy.vocab
                row = [vocab[query],
                       ", ".join(vocab[p] for p in parents),
                       ", ".join(vocab[p] for p in top5)]
            for mi, fn in enumerate(metric_fns):
                val = fn(ranks)
                totals[mi] += val
                if case_study:
                    row.append(str(val))
            if case_study:
                cases.append(row)
        n = max(len(queries), 1)
        result = {m: totals[i] / n for i, m in enumerate(metric_names)}
        result["test_topk"] = s.test_topk
        return result, cases

    def _negative_mask(self, query: int, cand_index: dict[int, int]
                       ) -> np.ndarray:
        """Bool [C]: which candidate columns are usable negatives for `query`
        — the complement of node2masks (dataset.py:319-320), shrunk to the
        test_topk retrieval pool when set (dataset.py:321-325)."""
        s = self.sampler
        if s.test_topk != -1:
            mask = np.zeros(len(self.candidates), dtype=bool)
            for n in s.eval_negatives(query):
                i = cand_index.get(n)
                if i is not None:
                    mask[i] = True
            return mask
        mask = np.ones(len(self.candidates), dtype=bool)
        for n in s.node2masks.get(query, ()):
            i = cand_index.get(n)
            if i is not None:
                mask[i] = False
        return mask

    # --------------------------------------------------------------- infer
    def predict_parents(self, query_feats: np.ndarray, rank_mode: int,
                        topk: int = 5) -> list[list[int]]:
        """Top-k candidate parents per novel query (infer.py:94-106).

        When the sampler carries `test_topk > 0`, candidates are first
        retrieval-prefiltered to the test_topk nearest positions by embedding
        cosine distance (the same two-stage retrieve-then-rank scheme as
        dataset.py:321-325, applied to novel query embeddings)."""
        scores = self.score(query_feats)
        prefilter = self.sampler.test_topk
        if prefilter != -1:
            q = np.asarray(query_feats, dtype=np.float32)
            qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                                1e-12)
            cand = self.feature_table[np.asarray(self.candidates)]
            cn = cand / np.maximum(
                np.linalg.norm(cand, axis=1, keepdims=True), 1e-12)
            dist = 1.0 - qn @ cn.T                           # [Q, C]
            k = min(prefilter, dist.shape[1])
            kept = np.argpartition(dist, k - 1, axis=1)[:, :k]
            allowed = np.zeros(dist.shape, dtype=bool)
            np.put_along_axis(allowed, kept, True, axis=1)
            scores = np.where(allowed, scores,
                              -np.inf if rank_mode == 1 else np.inf)
        out = []
        for row in scores:
            order = np.argsort(row, kind="stable")
            if rank_mode == 1:
                order = order[::-1]
            out.append([self.candidates[i] for i in order[:topk]])
        return out


def _device_batch(batch):
    import jax.numpy as jnp
    from ..data.egobatch import EgoBatch
    return EgoBatch(node_ids=jnp.asarray(batch.node_ids),
                    ngp=jnp.asarray(batch.ngp), nsib=jnp.asarray(batch.nsib))
