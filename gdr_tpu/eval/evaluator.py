"""End-to-end retrieval evaluation: beam decode → expand → re-rank → metrics.

The device side (one jitted program per batch shape) mirrors
``validation_step_i`` (main_models.py:1337-1642); the host side only decodes
CID strings and accumulates the metric suite like ``validation_epoch_end``
(main_models.py:1644-1917): cluster-level metrics over generated CIDs and
doc-level metrics per fusion weight α, with ``recall1`` (α = 0) as the
checkpoint monitor (main.py:73-82).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import EvalConfig
from gdr_tpu.eval import metrics as M
from gdr_tpu.ops.beam import generate_cids
from gdr_tpu.ops.codec import decode_token_batch
from gdr_tpu.ops.rerank import rerank
from gdr_tpu.ops.trie import TrieTensors


@dataclass
class EvalData:
    """Host-side eval set.  ``gt_docs[q]``: ground-truth doc-id strings;
    ``gt_cids[q]``: ground-truth CID strings (multi-positive rows supported,
    ref main_utils.py:282-375)."""

    input_ids: np.ndarray        # [Q, S]
    attn_mask: np.ndarray        # [Q, S]
    gt_docs: list[list[str]]
    gt_cids: list[list[str]]


class Evaluator:
    """Retrieval evaluator.

    ``mesh``: optional ``jax.sharding.Mesh`` — the doc-embedding store is
    then sharded row-wise over every mesh axis and the re-rank runs as the
    distributed local-top-R + all_gather merge (parallel/store.py); model
    params and queries are replicated.  Without a mesh everything runs
    single-device.
    """

    def __init__(self, model, trie: TrieTensors, store, cfg: EvalConfig,
                 mesh=None, packed: bool = False, use_pallas: bool = False,
                 quantize: bool = False):
        """``packed``: re-lay the store cluster-contiguously so the re-rank
        reads one dynamic slice per beam instead of a per-row gather
        (ops/packed_store.py).  ``use_pallas``: stream those slices through
        the Pallas kernel (TPU only).  ``quantize``: hold the store as
        per-row-absmax int8 (ops/quantize.py — 4× smaller; the
        memory-pressure configuration for MS-MARCO-scale corpora) and score
        with the on-the-fly dequantising dot."""
        self.model = model
        self.trie = trie
        self.cfg = cfg
        self.mesh = mesh
        self.packed = packed
        self.use_pallas = use_pallas
        self.quantize = quantize
        if quantize and mesh is not None and not packed:
            raise ValueError("quantize=True with a mesh needs packed=True "
                             "(the shard-aware int8 layout; the non-packed "
                             "sharded re-rank has no quantized variant)")
        # int8 HBM tiles pack 4 rows per sublane: the Pallas int8 kernel's
        # dynamic-slice starts must be 32-row aligned (fp32/bf16 need 8)
        align = 32 if quantize else 8
        if packed and mesh is not None:
            # distributed packed re-rank: shard-aware layout (whole clusters
            # per shard) + contiguous-slice local scoring + tiny top-R merge
            from gdr_tpu.ops.packed_store import pack_layout_sharded
            starts, counts, row_to_doc, cap, shard_rows = \
                pack_layout_sharded(trie, mesh.devices.size, align=align)
            self._p_starts = jnp.asarray(starts)
            self._p_counts = jnp.asarray(counts)
            self._p_row_to_doc = jnp.asarray(row_to_doc)
            self._p_cap = cap
            self._p_shard_rows = shard_rows
        elif packed:
            from gdr_tpu.ops.packed_store import pack_layout
            starts, counts, row_to_doc, cap = pack_layout(trie, align=align)
            self._p_starts = jnp.asarray(starts)
            self._p_counts = jnp.asarray(counts)
            self._p_row_to_doc = jnp.asarray(row_to_doc)
            self._p_cap = cap
        self.set_store(store)
        # every root-to-cluster path ends by the trie's max depth, so the
        # decode needs at most depth+1 steps (digits + EOS) — sizing the
        # KV caches / beam state to that instead of the configured
        # max_output_length (the reference fixes 10, infer.sh:7) cuts the
        # decode's attention and reorder traffic by Lmax/depth with
        # identical results (positional token ids don't depend on L).
        # When decoder-side query reps are pooled, one EXTRA step of room is
        # needed so full-depth beams' EOS-input state enters the pool — at
        # the configured length the reference's :L-truncated re-run includes
        # that state whenever eos_pos + 1 < L (main_models.py:1464-1571).
        depth_cap = int(trie.depth.max()) + 1
        if (cfg.use_query_embed_decoder_avg
                or cfg.use_query_embed_decoder_special):
            depth_cap += 1
        self._max_len = min(cfg.max_output_length, depth_cap)
        self._children = jnp.asarray(trie.children)
        self._eos = jnp.asarray(trie.eos_allowed)
        self._cluster_of_node = jnp.asarray(trie.cluster_of_node)
        self._cluster_docs = jnp.asarray(trie.cluster_docs)
        self._cluster_doc_mask = jnp.asarray(trie.cluster_doc_mask)
        self._alphas = jnp.asarray(np.asarray(cfg.score_rates, np.float32))
        # trie tables are jit *arguments*, not closure captures — captured
        # arrays would be baked into the HLO as literals (slow compiles).
        # Both jitted entry points are bound per-instance here so a second
        # Evaluator with a different config never reuses a stale closure.
        self._retrieve = jax.jit(self._retrieve_impl)
        self._ut_key = None
        self._ut = None
        # one jit wrapper for the U-table build: a fresh jax.jit per call
        # would re-trace on every parameter refresh (each train epoch)
        self._ut_fn = jax.jit(self.model.apply, static_argnums=(1,),
                              static_argnames=("method",))

        def _many_impl(params, ids_stack, mask_stack, store, u_table,
                       *tables):
            idxs = jnp.arange(ids_stack.shape[0], dtype=jnp.int32)

            def one(args):
                ids, msk, bidx = args
                return self._retrieve_impl(params, ids, msk, bidx, store,
                                           *tables, u_table=u_table)
            return jax.lax.map(one, (ids_stack, mask_stack, idxs))

        self._retrieve_many = jax.jit(_many_impl)

    def set_store(self, store) -> None:
        """Replace the doc-embedding store, re-applying this evaluator's
        layout (cluster packing / mesh sharding / int8 quantization).  The
        stage-2 training loop calls this after every store refresh — a bare
        ``evaluator.store = new_store`` would silently hand an UNPACKED
        array to the packed re-rank."""
        if self.packed and self.quantize:
            from gdr_tpu.ops.quantize import pack_quantized_rows
            qs = pack_quantized_rows(store, self._p_row_to_doc)
            if self.mesh is not None:
                from gdr_tpu.parallel.store import place_packed_store
                qs = place_packed_store(
                    jax.tree_util.tree_map(np.asarray, qs), self.mesh)
            self.store = qs
        elif self.packed and self.mesh is not None:
            from gdr_tpu.ops.packed_store import pack_rows
            from gdr_tpu.parallel.store import place_packed_store
            self.store = place_packed_store(
                np.asarray(pack_rows(store, self._p_row_to_doc)), self.mesh)
        elif self.packed:
            from gdr_tpu.ops.packed_store import pack_rows
            self.store = pack_rows(store, self._p_row_to_doc)  # device gather
        elif self.mesh is not None:
            from gdr_tpu.parallel.store import place_store
            self.store = place_store(np.asarray(store), self.mesh)
        elif self.quantize:
            from gdr_tpu.ops.quantize import quantize_store
            self.store = quantize_store(store)
        else:
            self.store = jnp.asarray(store)

    def _u_table(self, params):
        """Per-position U candidate slices, built ONCE per parameter set
        outside the per-batch jit (GenerativeRetriever.decode_tables —
        in-graph slicing of U costs a full-tensor layout copy every
        execution).  Cached on the identity of a params leaf via a weakref
        (eval passes reuse one params pytree across every batch) — a bare
        ``id(params)`` key could alias a new pytree allocated at a freed
        address and silently serve a stale table."""
        c = self.model.cfg
        if not (c.adaptor_decode and c.adaptor_efficient):
            return None
        import weakref

        leaf = jax.tree_util.tree_leaves(params)[0]
        if self._ut_key is None or self._ut_key() is not leaf:
            self._ut = self._ut_fn(params, self._max_len,
                                   method=self.model.decode_tables)
            try:
                self._ut_key = weakref.ref(leaf)
            except TypeError:      # leaf type without weakref support
                self._ut_key = None
        return self._ut

    def _per_beam_decoder_query(self, params, res, enc, attn_mask):
        """Decoder-side query reps the slow way: re-run the generated
        sequences through the decoder and pool per beam (literally what the
        reference does, main_models.py:1464-1571).  The production path pools
        the same states inside the beam carry (ops/beam.py
        accumulate_hidden); this re-run is kept as the parity oracle for it
        (tests/test_beam.py).  Returns [B, K, d']."""
        cfg = self.cfg
        b, k, lp1 = res.sequences.shape
        L = lp1 - 1
        dec_in = res.sequences[..., :L].reshape(b * k, L)
        dmask = (dec_in != 0).astype(jnp.int32).at[:, 0].set(1)
        enc_rep = jnp.repeat(enc, k, axis=0)
        mask_rep = jnp.repeat(attn_mask, k, axis=0)
        hidden = self.model.apply(params, enc_rep, mask_rep, dec_in, dmask,
                                  method=self.model.decode_hidden)
        if cfg.use_query_embed_decoder_special:
            last = jnp.maximum(dmask.sum(axis=1) - 1, 0)
            q = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0]
        else:  # decoder_avg
            m = dmask.astype(jnp.float32)[..., None]
            q = (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        q = self.model.apply(params, q, method=self.model.project_query)
        return q.reshape(b, k, -1)

    def _retrieve_impl(self, params, input_ids, attn_mask, batch_idx, store,
                       children, eos, cluster_of_node, cluster_docs,
                       cluster_doc_mask, alphas, u_table=None):
        cfg = self.cfg
        want_dec = (cfg.use_query_embed_decoder_avg
                    or cfg.use_query_embed_decoder_special)
        if cfg.gen_method in ("sample", "top_k"):
            from gdr_tpu.ops.beam import sample_cids
            # fold the batch counter into the key: a fixed per-config key
            # would replay the identical noise sequence for every eval batch
            # (structurally correlated rollouts across the dev set)
            res, q_emb, enc = sample_cids(
                self.model, params, input_ids, attn_mask, children, eos,
                cfg.num_beams, self._max_len,
                jax.random.fold_in(jax.random.PRNGKey(cfg.sample_seed),
                                   batch_idx),
                temperature=cfg.temperature, top_k=cfg.sample_top_k,
                length_penalty=cfg.length_penalty,
                accumulate_hidden=want_dec, u_table=u_table,
                fused=cfg.fused_decode)
        else:   # "beam" (the reference's "greedy" mode is also beam search)
            res, q_emb, enc = generate_cids(
                self.model, params, input_ids, attn_mask, children,
                eos, cfg.num_beams, self._max_len,
                cfg.length_penalty, accumulate_hidden=want_dec,
                u_table=u_table, fused=cfg.fused_decode)
        if want_dec:
            # decoder-side reps pooled inside the beam carry — no B·K
            # teacher-forced re-run (the round-1 eval hot spot)
            pooled = (res.hid_last if cfg.use_query_embed_decoder_special
                      else res.hid_avg)
            q_dec = self.model.apply(params, pooled,
                                     method=self.model.project_query)
            res = res.replace(hid_avg=None, hid_last=None)
            if cfg.use_query_embed_encoder:
                if cfg.fusion_strategy == "concate":
                    # learned fusion over the concatenation
                    # (ref main_models.py:1561-1562)
                    q_emb = self.model.apply(params, q_dec, q_emb[:, None, :],
                                             method=self.model.fuse_queries)
                else:   # "average" (ref :1564-1565)
                    q_emb = (q_dec + q_emb[:, None, :]) / 2.0
            else:
                q_emb = q_dec
        if self.mesh is not None and self.packed:
            from gdr_tpu.parallel.store import sharded_rerank_packed
            rr = sharded_rerank_packed(
                self.mesh, store, self._p_starts, self._p_counts,
                self._p_row_to_doc, self._p_cap, self._p_shard_rows,
                q_emb, res.nodes, res.scores, res.valid, cluster_of_node,
                alphas, top_r=cfg.num_return_sequences,
                use_pallas=self.use_pallas,
                pallas_interpret=self.mesh.devices.flat[0].platform == "cpu")
        elif self.mesh is not None:
            from gdr_tpu.parallel.store import sharded_rerank_from_beams
            rr = sharded_rerank_from_beams(
                self.mesh, store, q_emb, res.nodes, res.scores, res.valid,
                cluster_of_node, cluster_docs, cluster_doc_mask, alphas,
                top_r=cfg.num_return_sequences)
        elif self.packed:
            from gdr_tpu.ops.rerank import rerank_packed
            rr = rerank_packed(store, self._p_starts, self._p_counts,
                               self._p_row_to_doc, self._p_cap, q_emb,
                               res.nodes, res.scores, res.valid,
                               cluster_of_node, alphas,
                               top_r=cfg.num_return_sequences,
                               use_pallas=self.use_pallas)
        else:
            rr = rerank(store, q_emb, res.nodes, res.scores, res.valid,
                        cluster_of_node, cluster_docs,
                        cluster_doc_mask, alphas,
                        top_r=cfg.num_return_sequences)
        return res, rr

    def retrieve(self, params, input_ids, attn_mask, batch_idx: int = 0):
        """Single-batch retrieval; returns (BeamResult, RerankResult).
        ``batch_idx`` decorrelates sampling noise across eval batches."""
        return self._retrieve(params, jnp.asarray(input_ids),
                              jnp.asarray(attn_mask),
                              jnp.asarray(batch_idx, jnp.int32), self.store,
                              self._children, self._eos,
                              self._cluster_of_node, self._cluster_docs,
                              self._cluster_doc_mask, self._alphas,
                              self._u_table(params))

    def retrieve_many(self, params, input_ids, attn_mask):
        """Multi-batch retrieval in ONE compiled program.

        input_ids/attn_mask: [G, B, S] — a ``lax.map`` over G sub-batches
        keeps the per-sub-batch decode at its most efficient size while
        amortising the per-execution dispatch cost (the dominant fixed cost
        on tunnelled/serving deployments) over G·B queries.
        Returns (BeamResult, RerankResult) with a leading G axis.
        """
        return self._retrieve_many(params, jnp.asarray(input_ids),
                                   jnp.asarray(attn_mask), self.store,
                                   self._u_table(params),
                                   self._children, self._eos,
                                   self._cluster_of_node, self._cluster_docs,
                                   self._cluster_doc_mask, self._alphas)

    def evaluate(self, params, data: EvalData, batch_size: int = 8,
                 kary: int | None = None,
                 result_tsv: str | None = None) -> dict[str, float]:
        """Full-set evaluation.  ``result_tsv``: also write a
        reference-compatible result file (query, preds, gts, rank — the
        ``res1`` TSV consumed by the offline ``calculate`` mode,
        ref main.py:244-247)."""
        from gdr_tpu.utils.timing import PhaseTimer

        kary = kary or self.trie.kary
        nq = len(data.input_ids)
        cluster_preds: dict[int, list[str]] = {}
        doc_preds: dict[int, dict[float, list[str]]] = {}
        timer = PhaseTimer()

        for start in range(0, nq, batch_size):
            end = min(start + batch_size, nq)
            pad = batch_size - (end - start)
            ids = np.concatenate(
                [data.input_ids[start:end]] +
                ([data.input_ids[start:start + 1]] * pad if pad else []))
            msk = np.concatenate(
                [data.attn_mask[start:end]] +
                ([data.attn_mask[start:start + 1]] * pad if pad else []))
            with timer.phase("retrieve"):
                res, rr = self.retrieve(params, ids, msk,
                                        batch_idx=start // batch_size)
                seqs = np.asarray(res.sequences)
                valid = np.asarray(res.valid)
                doc_ids = np.asarray(rr.doc_ids)
                doc_valid = np.asarray(rr.doc_valid)
            with timer.phase("decode_host"):
                # one vectorised pass per batch: per-sequence NumPy calls
                # and per-id str() were ~27% of eval wall at beam 100
                nb, k = end - start, seqs.shape[1]
                cids_flat = decode_token_batch(
                    seqs[:nb].reshape(nb * k, -1), kary)
                doc_str = doc_ids[:, :nb].astype(str)
                for b in range(nb):
                    q = start + b
                    cluster_preds[q] = [
                        cids_flat[b * k + j]
                        for j in np.flatnonzero(valid[b])]
                    doc_preds[q] = {
                        alpha: doc_str[a, b][doc_valid[a, b]].tolist()
                        for a, alpha in enumerate(self.cfg.score_rates)}

        if result_tsv is not None:
            from gdr_tpu.eval.offline import write_result_tsv
            alpha0 = self.cfg.score_rates[0]
            rows = [(str(q), doc_preds[q][alpha0], data.gt_docs[q], 1)
                    for q in sorted(doc_preds)]
            write_result_tsv(result_tsv, rows)

        out: dict[str, float] = {}
        gt_cids = {q: data.gt_cids[q] for q in cluster_preds}
        out.update(M.full_suite(cluster_preds, gt_cids,
                                recall_ks=self.cfg.recall_ks,
                                accuracy_ks=self.cfg.accuracy_ks,
                                mrr_ks=self.cfg.mrr_ks,
                                map_k=self.cfg.map_k, prefix="cluster_"))
        gt_docs = {q: data.gt_docs[q] for q in cluster_preds}
        for alpha in self.cfg.score_rates:
            preds_a = {q: doc_preds[q][alpha] for q in doc_preds}
            suite = M.full_suite(preds_a, gt_docs,
                                 recall_ks=self.cfg.recall_ks,
                                 accuracy_ks=self.cfg.accuracy_ks,
                                 mrr_ks=self.cfg.mrr_ks, map_k=self.cfg.map_k)
            for k, v in suite.items():
                out[f"{k}_{alpha}"] = v
            if alpha == 0:
                # checkpoint monitor (ref main.py:73-82, main_models.py:1838)
                out["recall1"] = suite["recall1"]
        out.update(timer.summary())
        return out
