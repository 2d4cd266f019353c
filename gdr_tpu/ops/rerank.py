"""Stage 2: dense re-rank of in-cluster documents + score fusion.

Reference behavior (main_models.py:1434-1637): each generated CID expands to
its documents via ``id_mapping``; every candidate doc is scored
``tanh(q·d)`` against the query embedding; the final score per fusion weight
α adds ``α · softmax(beam_scores)[beam]`` of the beam that produced the doc's
cluster; top ``num_return_sequences`` docs are kept per α.

The reference does this with host Python loops over ragged per-cluster doc
lists.  Here the expansion is a static-shape gather through the trie's padded
cluster table — ``[B, K, cap]`` candidates — and the whole α-sweep is one
vectorised top-k.  Documents belong to exactly one cluster and beams are
distinct clusters, so no dedup is needed.
"""

from __future__ import annotations

from flax import struct

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1.0e9


def _pallas_ok(d: int, interpret: bool) -> bool:
    """Use the Pallas streaming kernels only where Mosaic can compile them
    (store lane width 128-aligned); interpret mode never hits Mosaic."""
    from gdr_tpu.ops.pallas.rerank_kernel import rerank_pallas_supported
    return interpret or rerank_pallas_supported(d)


def padded_top_k(scores: Array, payload: Array, k: int
                 ) -> tuple[Array, Array]:
    """``lax.top_k`` where ``k`` may exceed the candidate axis.

    The packed layouts bound candidates at beams × (aligned max cluster
    size), which can be SMALLER than the requested top-R (e.g. beam 10 over
    8-doc clusters, R=100); the missing slots are padded with NEG_INF
    scores (→ ``doc_valid`` False) and payload 0, so every caller gets k
    columns regardless."""
    n = scores.shape[-1]
    if n < k:
        pad = [(0, 0)] * (scores.ndim - 1) + [(0, k - n)]
        scores = jnp.pad(scores, pad, constant_values=NEG_INF)
        payload = jnp.pad(payload, pad)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, jnp.take_along_axis(payload, top_idx, axis=-1)


@struct.dataclass
class RerankResult:
    doc_ids: Array       # [A, B, R] int32 — top docs per fusion weight
    scores: Array        # [A, B, R] float32 — fused scores
    doc_valid: Array     # [A, B, R] bool
    cluster_probs: Array  # [B, K] — softmax over beam scores (fusion term)


def expand_candidates(nodes: Array, valid: Array, cluster_of_node: Array,
                      cluster_docs: Array, cluster_doc_mask: Array
                      ) -> tuple[Array, Array]:
    """Beam cluster nodes → padded candidate doc ids.

    nodes/valid: [B, K]; returns (docs [B, K, cap], mask [B, K, cap]).
    """
    rows = cluster_of_node[nodes]                          # [B, K]
    ok = valid & (rows >= 0)
    rows = jnp.maximum(rows, 0)
    docs = cluster_docs[rows]                              # [B, K, cap]
    mask = cluster_doc_mask[rows] & ok[..., None]
    return docs, mask


def rerank(doc_store: Array, query_emb: Array, nodes: Array,
           beam_scores: Array, valid: Array, cluster_of_node: Array,
           cluster_docs: Array, cluster_doc_mask: Array, alphas: Array,
           top_r: int, squash: str = "tanh",
           use_pallas: bool = False,
           pallas_interpret: bool = False) -> RerankResult:
    """Fused dense re-rank + α-sweep.

    doc_store: [N, d] document embeddings (precomputed stage 1, or live
    dual-encoder output in stage 2).  query_emb: [B, d], or [B, K, d] for
    per-beam query reps (the decoder-avg/special paths).  nodes/beam_scores/
    valid: [B, K] from the beam search (scores length-normalised).

    ``use_pallas``: stream candidate rows through the fused Pallas kernel
    (gdr_tpu.ops.pallas.rerank_kernel) instead of an XLA gather that
    materialises [B, K, cap, d] in HBM.  tanh squashing only.
    """
    fn = jnp.tanh if squash == "tanh" else jax.nn.sigmoid
    docs, mask = expand_candidates(nodes, valid, cluster_of_node,
                                   cluster_docs, cluster_doc_mask)
    b, k, cap = docs.shape

    # beam probability: softmax over valid beams (ref main_models.py:1600-1604)
    probs = jax.nn.softmax(
        jnp.where(valid, beam_scores, NEG_INF).astype(jnp.float32), axis=-1)

    # per-beam query reps ([B, K, d]) or one rep per query ([B, d])
    if query_emb.ndim == 2:
        q_bk = jnp.broadcast_to(query_emb[:, None, :],
                                (b, k, query_emb.shape[-1]))
    else:
        q_bk = query_emb

    from gdr_tpu.ops.quantize import QuantizedStore, quantized_dot
    if isinstance(doc_store, QuantizedStore):
        # int8 store: dequantising dot (memory-pressure configuration)
        sim = fn(quantized_dot(q_bk, doc_store, docs))
        sim = jnp.where(mask, sim, NEG_INF)
    elif use_pallas and squash == "tanh" and _pallas_ok(
            doc_store.shape[-1], pallas_interpret):
        from gdr_tpu.ops.pallas.rerank_kernel import rerank_scores_pallas
        qrows = q_bk.reshape(b * k, -1)
        sim = rerank_scores_pallas(doc_store, docs.reshape(b * k, cap),
                                   qrows, mask.reshape(b * k, cap),
                                   interpret=pallas_interpret)
        sim = sim.reshape(b, k, cap)
    else:
        cand_emb = doc_store[docs.reshape(b, -1)].reshape(b, k, cap, -1)
        sim = fn(jnp.einsum("bkd,bkcd->bkc", q_bk.astype(jnp.float32),
                            cand_emb.astype(jnp.float32)))
        sim = jnp.where(mask, sim, NEG_INF)

    fused = sim[None] + alphas[:, None, None, None] * probs[None, :, :, None]
    fused = jnp.where(mask[None], fused, NEG_INF)          # [A, B, K, cap]

    flat = fused.reshape(len(alphas), b, k * cap)
    flat_docs = jnp.broadcast_to(docs.reshape(1, b, k * cap), flat.shape)
    top_scores, top_docs = padded_top_k(flat, flat_docs, top_r)  # [A, B, R]
    doc_valid = top_scores > NEG_INF / 2
    return RerankResult(doc_ids=top_docs.astype(jnp.int32),
                        scores=top_scores, doc_valid=doc_valid,
                        cluster_probs=probs)


def rerank_packed(packed_rows: Array, packed_starts: Array,
                  packed_counts: Array, row_to_doc: Array, cap: int,
                  query_emb: Array, nodes: Array, beam_scores: Array,
                  valid: Array, cluster_of_node: Array, alphas: Array,
                  top_r: int, squash: str = "tanh",
                  use_pallas: bool = False,
                  pallas_interpret: bool = False) -> RerankResult:
    """Re-rank over the cluster-packed store (ops/packed_store.py).

    Each beam's candidates are one contiguous [cap, d] block — a single
    dynamic slice (Pallas path: one DMA per beam) instead of a per-row
    gather, which XLA lowers ~25× slower than streaming reads (measured).
    Results are reported in original doc ids via ``row_to_doc``.
    """
    fn = jnp.tanh if squash == "tanh" else jax.nn.sigmoid
    b, k = nodes.shape
    rows = cluster_of_node[nodes]                          # [B, K]
    ok = valid & (rows >= 0)
    rows_c = jnp.maximum(rows, 0)
    start = packed_starts[rows_c]                          # [B, K]
    count = packed_counts[rows_c]
    mask = (jnp.arange(cap)[None, None, :] < count[..., None]) & ok[..., None]

    probs = jax.nn.softmax(
        jnp.where(valid, beam_scores, NEG_INF).astype(jnp.float32), axis=-1)

    if query_emb.ndim == 2:
        q_bk = jnp.broadcast_to(query_emb[:, None, :],
                                (b, k, query_emb.shape[-1]))
    else:
        q_bk = query_emb

    from gdr_tpu.ops.quantize import PackedQuantizedStore
    if isinstance(packed_rows, PackedQuantizedStore):
        # int8 packed rows: raw integer dot (Pallas streams int8 blocks —
        # 4× less DMA; XLA fallback gathers int8), then the per-row
        # dequantising scale and the squash apply on [B, K, cap] scalars
        idx = start[..., None] + jnp.arange(cap)[None, None, :]
        if use_pallas and squash == "tanh" and _pallas_ok(
                packed_rows.shape[-1], pallas_interpret):
            from gdr_tpu.ops.pallas.rerank_kernel import (
                packed_scores_pallas_int8)
            raw = packed_scores_pallas_int8(
                packed_rows.values, start.reshape(-1),
                q_bk.reshape(b * k, -1), cap,
                interpret=pallas_interpret).reshape(b, k, cap)
        else:
            v = packed_rows.values[idx.reshape(b, -1)].reshape(b, k, cap, -1)
            raw = jnp.einsum("bkd,bkcd->bkc", q_bk.astype(jnp.float32),
                             v.astype(jnp.float32))
        sim = fn(raw * packed_rows.scales[idx])
    elif use_pallas and squash == "tanh" and _pallas_ok(
            packed_rows.shape[-1], pallas_interpret):
        from gdr_tpu.ops.pallas.rerank_kernel import packed_scores_pallas
        sim = packed_scores_pallas(packed_rows, start.reshape(-1),
                                   q_bk.reshape(b * k, -1), cap,
                                   interpret=pallas_interpret)
        sim = sim.reshape(b, k, cap)
    else:
        idx = start[..., None] + jnp.arange(cap)[None, None, :]
        emb = packed_rows[idx.reshape(b, -1)].reshape(b, k, cap, -1)
        sim = fn(jnp.einsum("bkd,bkcd->bkc", q_bk.astype(jnp.float32),
                            emb.astype(jnp.float32)))
    sim = jnp.where(mask, sim, NEG_INF)

    fused = sim[None] + alphas[:, None, None, None] * probs[None, :, :, None]
    fused = jnp.where(mask[None], fused, NEG_INF)
    flat = fused.reshape(len(alphas), b, k * cap)
    flat_rows = (start[..., None] + jnp.arange(cap)[None, None, :]
                 ).reshape(1, b, k * cap)
    top_scores, top_rows = padded_top_k(
        flat, jnp.broadcast_to(flat_rows, flat.shape), top_r)
    top_docs = row_to_doc[top_rows]                        # original doc ids
    doc_valid = top_scores > NEG_INF / 2
    return RerankResult(doc_ids=top_docs.astype(jnp.int32),
                        scores=top_scores, doc_valid=doc_valid,
                        cluster_probs=probs)
