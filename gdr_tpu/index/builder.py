"""Index construction: embed corpus → hierarchical k-means → CID trie.

Replaces three reference components with one device-resident pipeline:
- ``bert/bert.py`` + ``bert_NQ.sh`` — manual shard-by-process doc embedding
  (one process per GPU, merged by concatenation) → here a single jitted
  batched encode, optionally sharded over the mesh batch axis;
- ``kmeans/kmeans.py`` — host scikit-learn recursion → on-device Lloyd
  (gdr_tpu.ops.kmeans);
- ``main_models.py:690-733`` — pickle-cached Python trie → packed tensors.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import IndexConfig
from gdr_tpu.ops.kmeans import hierarchical_kmeans, paths_to_cid_mapping
from gdr_tpu.ops.trie import TrieTensors, build_trie


@dataclass
class Index:
    store: np.ndarray            # [N, d] doc embeddings
    trie: TrieTensors
    paths: list[list[int]]       # digit path per doc
    cid_of_doc: list[str]


def embed_corpus(doc_encoder, params, token_ids: np.ndarray,
                 masks: np.ndarray, batch_size: int = 256,
                 normalize: bool = False, mesh=None) -> np.ndarray:
    """Batched doc-tower encode of the whole corpus.

    One compiled program, batches streamed through the chip — replaces the
    reference's per-GPU corpus partitioning (bert.py:48-61, bert_NQ.sh:7-11).
    The final partial batch is padded to keep a single compiled shape.

    ``mesh``: optional device mesh — each batch is then sharded over the
    ``dp`` axis (the mesh-native form of the reference's shard-by-process
    embedding generation); ``batch_size`` is rounded up to a multiple of dp.
    """
    n = token_ids.shape[0]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = mesh.shape.get("dp", 1)
        batch_size = ((batch_size + dp - 1) // dp) * dp
        data_s = NamedSharding(mesh, P("dp"))
        out_s = NamedSharding(mesh, P("dp"))

        @jax.jit
        def encode(p, t, m):
            emb = doc_encoder.apply(p, t, m, deterministic=True)
            return jax.lax.with_sharding_constraint(emb, out_s)
    else:
        data_s = None
        encode = jax.jit(lambda p, t, m: doc_encoder.apply(
            p, t, m, deterministic=True))
    out = np.zeros((n, 0), np.float32)
    # two passes: dispatch every batch first (async), materialise after —
    # a per-batch np.asarray would sync the host to the device each batch,
    # serialising ~n/batch_size round trips (32 ms apiece on a tunnelled
    # deployment) into the embed wall clock
    inflight = []
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        ids = token_ids[start:end]
        msk = masks[start:end]
        if end - start < batch_size:
            pad = batch_size - (end - start)
            ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]),
                                                ids.dtype)])
            msk = np.concatenate([msk, np.ones((pad, msk.shape[1]),
                                               msk.dtype)])
        if data_s is not None:
            ids = jax.device_put(ids, data_s)
            msk = jax.device_put(msk, data_s)
            emb = encode(params, ids, msk)
        else:
            emb = encode(params, jnp.asarray(ids), jnp.asarray(msk))
        emb.copy_to_host_async()
        inflight.append((end - start, emb))
    chunks = [np.asarray(emb)[:take] for take, emb in inflight]
    out = np.concatenate(chunks) if chunks else out
    if not np.isfinite(out).all():
        bad = np.flatnonzero(~np.isfinite(out).all(axis=1))
        raise ValueError(
            f"doc encoder produced non-finite embeddings for {len(bad)} "
            f"docs (first: {bad[:5].tolist()}) — check that tokenizer ids "
            f"fit the encoder vocab and checkpoint weights are sane")
    if normalize:
        out = out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True),
                               1e-9)
    return out.astype(np.float32)


def build_index_from_embeddings(store: np.ndarray,
                                cfg: IndexConfig) -> Index:
    """k-means the embeddings into CID paths and pack the trie."""
    if store.ndim != 2 or store.shape[1] != cfg.embedding_dim:
        raise ValueError(
            f"store shape {store.shape} does not match "
            f"IndexConfig.embedding_dim={cfg.embedding_dim} — wrong store "
            "file, or set embedding_dim to the doc tower's output width")
    paths = hierarchical_kmeans(store, kary=cfg.kary, leaf_cap=cfg.leaf_cap,
                                iters=cfg.max_iters, seed=cfg.seed,
                                minibatch_threshold=cfg.minibatch_threshold,
                                minibatch_size=cfg.minibatch_size)
    mapping = paths_to_cid_mapping(paths)
    trie = build_trie(mapping, kary=cfg.kary,
                      max_docs_per_cluster=cfg.max_docs_per_cluster,
                      doc_embeddings=store)
    cid_of_doc = ["-".join(str(d) for d in p) for p in paths]
    return Index(store=store, trie=trie, paths=paths, cid_of_doc=cid_of_doc)


def build_index(doc_encoder, params, token_ids: np.ndarray,
                masks: np.ndarray, cfg: IndexConfig,
                batch_size: int = 256) -> Index:
    store = embed_corpus(doc_encoder, params, token_ids, masks, batch_size)
    return build_index_from_embeddings(store, cfg)
