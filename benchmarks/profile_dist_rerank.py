"""Distributed re-rank timing on an 8-virtual-device CPU mesh.

Compares the round-2 per-row-gather sharded re-rank (parallel/store.py::
sharded_rerank) against the round-3 packed contiguous-slice variant
(sharded_rerank_packed) at a mid-size operating point.  Real ICI numbers
need a pod; the virtual mesh still exercises the exact collective program
and exposes the local-scoring cost difference.

Prints one JSON line; invoked as a subprocess by bench.py (the bench's own
process is bound to the TPU platform).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    from gdr_tpu.config import MeshConfig
    from gdr_tpu.ops.packed_store import pack_layout_sharded, pack_rows
    from gdr_tpu.ops.trie import build_trie
    from gdr_tpu.parallel.mesh import make_mesh
    from gdr_tpu.parallel.store import (place_packed_store, place_store,
                                        sharded_rerank,
                                        sharded_rerank_packed)

    rng = np.random.default_rng(0)
    n_docs, d, cap_docs = 100_000, 64, 30
    b, k, top_r = 8, 64, 64
    n_clusters = n_docs // cap_docs
    cid_to_docs = {str(i): list(range(i * cap_docs, (i + 1) * cap_docs))
                   for i in range(n_clusters)}
    trie = build_trie(cid_to_docs, kary=n_clusters,
                      max_docs_per_cluster=cap_docs + 2)
    store = rng.normal(size=(n_docs, d)).astype(np.float32)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))

    nodes = np.asarray(trie.cluster_node_ids)[
        rng.integers(0, n_clusters, size=(b, k))]
    scores = rng.normal(size=(b, k)).astype(np.float32)
    valid = np.ones((b, k), bool)
    alphas = np.asarray([0.0, 1.0], np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)

    def timeit(fn, n=10):
        fn()                                  # compile
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
        return (time.perf_counter() - t0) / n * 1e3

    store_g = place_store(store, mesh)
    gather_ms = timeit(lambda: sharded_rerank(
        mesh, store_g, jnp.asarray(q), jnp.asarray(
            trie.cluster_docs[np.maximum(trie.cluster_of_node[nodes], 0)]),
        jnp.asarray(trie.cluster_doc_mask[
            np.maximum(trie.cluster_of_node[nodes], 0)]),
        jnp.asarray(scores), None, jnp.asarray(alphas), top_r))

    starts, counts, row_to_doc, cap, shard_rows = pack_layout_sharded(
        trie, mesh.devices.size)
    rows = place_packed_store(np.asarray(pack_rows(store, row_to_doc)), mesh)
    packed_ms = timeit(lambda: sharded_rerank_packed(
        mesh, rows, jnp.asarray(starts), jnp.asarray(counts),
        jnp.asarray(row_to_doc), cap, shard_rows, jnp.asarray(q),
        jnp.asarray(nodes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(trie.cluster_of_node), jnp.asarray(alphas), top_r))

    pallas_ms = timeit(lambda: sharded_rerank_packed(
        mesh, rows, jnp.asarray(starts), jnp.asarray(counts),
        jnp.asarray(row_to_doc), cap, shard_rows, jnp.asarray(q),
        jnp.asarray(nodes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(trie.cluster_of_node), jnp.asarray(alphas), top_r,
        use_pallas=True,
        pallas_interpret=mesh.devices.flat[0].platform == "cpu"), n=3)

    print(json.dumps({
        "dist_rerank_gather_ms": round(gather_ms, 2),
        "dist_rerank_packed_ms": round(packed_ms, 2),
        "dist_rerank_packed_pallas_ms": round(pallas_ms, 2),
        "dist_rerank_n_docs": n_docs,
        "dist_rerank_mesh": "4x2 virtual cpu",
        # virtual-CPU timing validates the collective program, not the
        # memory system: the packed layout's advantage is TPU DMA behavior
        # (contiguous slices vs per-row gather, measured ~25x on-chip —
        # ops/packed_store.py; single-chip bench: packed+pallas fastest);
        # CPU gathers are cache-friendly either way
        "dist_rerank_note": "cpu-virtual: program-shape timing only; "
                            "packed-vs-gather advantage is TPU DMA behavior",
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
