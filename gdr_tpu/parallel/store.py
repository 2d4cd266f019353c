"""Sharded document-embedding store + distributed re-rank.

At production scale the store is the largest buffer in the system (MS-MARCO
scale: 8.8M × 768 × bf16 ≈ 13.5 GB — more than one chip's HBM once the model
is resident).  It therefore shards row-wise over the whole mesh and never
replicates.

``sharded_rerank`` runs the stage-2 scoring as a ``shard_map``: every shard
scores only the candidate docs whose rows it owns (non-owned candidates are
masked, no cross-chip gather of embeddings), takes a local top-R, and the
per-shard winners are merged with one small ``all_gather`` (R ids+scores per
shard) followed by a final top-R.  This is the gather-free
local-score + global-merge pattern SURVEY.md §2.3 calls for; the only
cross-chip traffic is ``O(shards × R)`` scalars over ICI instead of
``O(B × K × cap × d)`` embeddings.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdr_tpu.ops.rerank import RerankResult

Array = jax.Array
NEG_INF = -1.0e9


def pad_store(store: np.ndarray, num_shards: int) -> np.ndarray:
    """Pad store rows to a multiple of num_shards (padded rows never win:
    no real doc id points at them)."""
    n = store.shape[0]
    rem = (-n) % num_shards
    if rem == 0:
        return store
    return np.concatenate([store, np.zeros((rem, store.shape[1]),
                                           store.dtype)])


def place_store(store: np.ndarray, mesh: Mesh) -> Array:
    store = pad_store(store, mesh.devices.size)
    return jax.device_put(
        store, NamedSharding(mesh, P(tuple(mesh.axis_names))))


def sharded_rerank(mesh: Mesh, store: Array, query_emb: Array, docs: Array,
                   mask: Array, probs: Array, beam_of_cand: Array,
                   alphas: Array, top_r: int,
                   squash: str = "tanh") -> tuple[Array, Array, Array]:
    """Distributed fused re-rank.

    store: [N, d] sharded P(("dp","mp")); everything else replicated.
    docs/mask: [B, K, cap] candidate doc ids; probs: [B, K] beam probs;
    beam_of_cand is implicit (dim K).  Returns (doc_ids [A,B,R],
    scores [A,B,R], valid [A,B,R]) fully replicated.
    """
    fn = jnp.tanh if squash == "tanh" else jax.nn.sigmoid
    axes = tuple(mesh.axis_names)
    n_shards = mesh.devices.size
    rows = store.shape[0] // n_shards
    a = alphas.shape[0]
    b, k, cap = docs.shape
    if query_emb.ndim == 2:
        # [B, d] (encoder query rep) → per-beam [B, K, d], matching the
        # decoder_avg/special eval modes that supply one rep per beam.
        query_emb = jnp.broadcast_to(query_emb[:, None, :],
                                     (b, k, query_emb.shape[-1]))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axes), P(), P(), P(), P(), P()),
             out_specs=(P(), P(), P()), check_vma=False)
    def impl(store_local, q, docs, mask, probs, alphas):
        store_local = store_local.reshape(rows, -1)
        shard = jax.lax.axis_index(axes)
        lo = shard * rows
        local = docs - lo
        owned = mask & (local >= 0) & (local < rows)
        local = jnp.clip(local, 0, rows - 1)
        emb = store_local[local.reshape(b, -1)].reshape(b, k, cap, -1)
        sim = fn(jnp.einsum("bkd,bkcd->bkc", q.astype(jnp.float32),
                            emb.astype(jnp.float32)))
        fused = sim[None] + alphas[:, None, None, None] * probs[None, :, :, None]
        fused = jnp.where(owned[None], fused, NEG_INF)
        flat = fused.reshape(a, b, k * cap)
        loc_scores, loc_idx = jax.lax.top_k(flat, min(top_r, k * cap))
        loc_docs = jnp.take_along_axis(
            jnp.broadcast_to(docs.reshape(1, b, k * cap), flat.shape),
            loc_idx, axis=-1)
        # merge: all_gather the per-shard winners (tiny) and re-top-k
        from gdr_tpu.ops.rerank import padded_top_k
        g_scores = jax.lax.all_gather(loc_scores, axes, axis=2, tiled=True)
        g_docs = jax.lax.all_gather(loc_docs, axes, axis=2, tiled=True)
        m_scores, m_docs = padded_top_k(g_scores, g_docs, top_r)
        return m_docs.astype(jnp.int32), m_scores, m_scores > NEG_INF / 2

    return impl(store, query_emb, docs, mask, probs, alphas)


def sharded_rerank_from_beams(mesh: Mesh, store: Array, query_emb: Array,
                              nodes: Array, beam_scores: Array, valid: Array,
                              cluster_of_node: Array, cluster_docs: Array,
                              cluster_doc_mask: Array, alphas: Array,
                              top_r: int, squash: str = "tanh") -> RerankResult:
    """Distributed counterpart of :func:`gdr_tpu.ops.rerank.rerank`."""
    from gdr_tpu.ops.rerank import expand_candidates
    docs, mask = expand_candidates(nodes, valid, cluster_of_node,
                                   cluster_docs, cluster_doc_mask)
    probs = jax.nn.softmax(
        jnp.where(valid, beam_scores, NEG_INF).astype(jnp.float32), axis=-1)
    doc_ids, scores, ok = sharded_rerank(
        mesh, store, query_emb, docs, mask, probs, None, alphas, top_r, squash)
    return RerankResult(doc_ids=doc_ids, scores=scores, doc_valid=ok,
                        cluster_probs=probs)


def place_packed_store(rows, mesh: Mesh):
    """Place a shard-aware packed store (ops/packed_store.pack_layout_sharded
    rows — already an exact multiple of the mesh size) row-sharded.  Accepts
    a plain [M, d] array or a PackedQuantizedStore (values + scales each
    row-sharded)."""
    from gdr_tpu.ops.quantize import PackedQuantizedStore
    sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    if isinstance(rows, PackedQuantizedStore):
        assert rows.values.shape[0] % mesh.devices.size == 0, (
            rows.values.shape, mesh.devices.size)
        return PackedQuantizedStore(
            values=jax.device_put(rows.values, sh),
            scales=jax.device_put(rows.scales, sh))
    assert rows.shape[0] % mesh.devices.size == 0, (
        rows.shape, mesh.devices.size)
    return jax.device_put(rows, sh)


def sharded_rerank_packed(mesh: Mesh, packed_rows: Array, starts: Array,
                          counts: Array, row_to_doc: Array, cap: int,
                          shard_rows: int, query_emb: Array, nodes: Array,
                          beam_scores: Array, valid: Array,
                          cluster_of_node: Array, alphas: Array,
                          top_r: int, squash: str = "tanh",
                          use_pallas: bool = False,
                          pallas_interpret: bool = False) -> "RerankResult":
    """Distributed re-rank over the cluster-packed store.

    Unlike :func:`sharded_rerank` (per-row gather of candidate embeddings —
    the pattern packed_store.py measures ~25× slower than streaming), every
    shard owns whole clusters (pack_layout_sharded), so a beam's candidates
    are ONE contiguous ``[cap, d]`` block inside the owner shard; non-owner
    shards mask the beam out.  Cross-chip traffic stays the tiny per-shard
    top-R merge.

    ``use_pallas`` swaps the per-shard scoring for the single-DMA streaming
    kernel (ops/pallas/rerank_kernel.packed_scores_pallas) — shard_map bodies
    run per device, so the same kernel that serves the single-chip path
    serves each shard; ``pallas_interpret`` runs it in interpreter mode for
    virtual-CPU meshes.
    """
    from gdr_tpu.ops.quantize import PackedQuantizedStore
    quantized = isinstance(packed_rows, PackedQuantizedStore)
    fn = jnp.tanh if squash == "tanh" else jax.nn.sigmoid
    axes = tuple(mesh.axis_names)
    n_shards = mesh.devices.size
    n_rows = (packed_rows.values if quantized else packed_rows).shape[0]
    assert n_rows == n_shards * shard_rows
    a = alphas.shape[0]
    b, k = nodes.shape
    rows = cluster_of_node[nodes]                            # [B, K]
    ok = valid & (rows >= 0)
    rows_c = jnp.maximum(rows, 0)
    start = starts[rows_c]                                   # [B, K] global
    count = counts[rows_c]
    probs = jax.nn.softmax(
        jnp.where(valid, beam_scores, NEG_INF).astype(jnp.float32), axis=-1)
    if query_emb.ndim == 2:
        query_emb = jnp.broadcast_to(query_emb[:, None, :],
                                     (b, k, query_emb.shape[-1]))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axes), P(axes), P(), P(), P(), P(), P(), P()),
             out_specs=(P(), P()), check_vma=False)
    def impl(store_local, scales_local, q, start, count, ok, probs, alphas):
        store_local = store_local.reshape(shard_rows, -1)
        shard = jax.lax.axis_index(axes)
        owned = ok & (start // shard_rows == shard)
        local = jnp.clip(start - shard * shard_rows, 0,
                         shard_rows - cap)                   # [B, K]
        idx = (local[..., None]
               + jnp.arange(cap)[None, None])                # contiguous
        from gdr_tpu.ops.rerank import _pallas_ok
        pallas_fits = (use_pallas and squash == "tanh" and _pallas_ok(
            store_local.shape[-1], pallas_interpret))
        if quantized and pallas_fits:
            from gdr_tpu.ops.pallas.rerank_kernel import (
                packed_scores_pallas_int8)
            raw = packed_scores_pallas_int8(
                store_local, local.reshape(-1), q.reshape(b * k, -1), cap,
                interpret=pallas_interpret).reshape(b, k, cap)
            sim = fn(raw * scales_local.reshape(-1)[idx])
        elif quantized:
            v = store_local[idx.reshape(b, -1)].reshape(b, k, cap, -1)
            raw = jnp.einsum("bkd,bkcd->bkc", q.astype(jnp.float32),
                             v.astype(jnp.float32))
            sim = fn(raw * scales_local.reshape(-1)[idx])
        elif pallas_fits:
            from gdr_tpu.ops.pallas.rerank_kernel import packed_scores_pallas
            sim = packed_scores_pallas(
                store_local, local.reshape(-1), q.reshape(b * k, -1), cap,
                interpret=pallas_interpret).reshape(b, k, cap)
        else:
            emb = store_local[idx.reshape(b, -1)].reshape(b, k, cap, -1)
            sim = fn(jnp.einsum("bkd,bkcd->bkc", q.astype(jnp.float32),
                                emb.astype(jnp.float32)))
        mask = ((jnp.arange(cap)[None, None] < count[..., None])
                & owned[..., None])
        fused = (sim[None]
                 + alphas[:, None, None, None] * probs[None, :, :, None])
        fused = jnp.where(mask[None], fused, NEG_INF)
        flat = fused.reshape(a, b, k * cap)
        loc_scores, loc_idx = jax.lax.top_k(flat, min(top_r, k * cap))
        g_rows = (shard * shard_rows
                  + (local[..., None] + jnp.arange(cap)[None, None])
                  ).reshape(1, b, k * cap)
        loc_rows = jnp.take_along_axis(
            jnp.broadcast_to(g_rows, flat.shape), loc_idx, axis=-1)
        from gdr_tpu.ops.rerank import padded_top_k
        g_scores = jax.lax.all_gather(loc_scores, axes, axis=2, tiled=True)
        g_rows = jax.lax.all_gather(loc_rows, axes, axis=2, tiled=True)
        m_scores, m_rows = padded_top_k(g_scores, g_rows, top_r)
        return m_rows, m_scores

    if quantized:
        values, scales = packed_rows.values, packed_rows.scales
    else:
        values = packed_rows
        # dummy per-row scales (unused branch must still shard-map cleanly)
        scales = jnp.ones((n_rows,), jnp.float32)
    top_rows, top_scores = impl(values, scales, query_emb, start, count, ok,
                                probs, alphas)
    top_docs = row_to_doc[top_rows]                          # replicated map
    from gdr_tpu.ops.rerank import RerankResult
    return RerankResult(doc_ids=top_docs.astype(jnp.int32),
                        scores=top_scores,
                        doc_valid=top_scores > NEG_INF / 2,
                        cluster_probs=probs)
