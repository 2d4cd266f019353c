"""Pallas rerank kernel vs the XLA gather path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gdr_tpu.ops.pallas.rerank_kernel import rerank_scores_pallas


def test_kernel_matches_xla_gather():
    rng = np.random.default_rng(0)
    n, d, r, cap = 50, 128, 6, 10   # cap padded to chunk internally
    store = rng.normal(size=(n, d)).astype(np.float32)
    docs = rng.integers(0, n, size=(r, cap)).astype(np.int32)
    q = rng.normal(size=(r, d)).astype(np.float32)
    mask = rng.random((r, cap)) < 0.8

    got = np.asarray(rerank_scores_pallas(
        jnp.asarray(store), jnp.asarray(docs), jnp.asarray(q),
        jnp.asarray(mask), chunk=4, interpret=True))

    exp = np.tanh(np.einsum("rd,rcd->rc", q, store[docs]))
    exp = np.where(mask, exp, -1e9)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_narrow_store_falls_back_to_xla():
    """use_pallas with a store narrower than the 128-lane tile must route
    to the XLA gather path: Mosaic cannot slice a 64-wide HBM memref
    (hardware failure observed in the 50k-doc bench quality phase)."""
    from gdr_tpu.ops.pallas.rerank_kernel import rerank_pallas_supported
    from gdr_tpu.ops.rerank import rerank_packed
    from gdr_tpu.ops.packed_store import pack_store_by_cluster
    from gdr_tpu.ops.trie import build_trie

    assert rerank_pallas_supported(128) and rerank_pallas_supported(768)
    assert not rerank_pallas_supported(64)

    rng = np.random.default_rng(2)
    trie = build_trie({"0": [0, 1, 2], "1": [3, 4], "2": [5, 6, 7]},
                      kary=3, max_docs_per_cluster=4)
    store = rng.normal(size=(8, 64)).astype(np.float32)    # d=64 < lane
    packed = pack_store_by_cluster(trie, store)
    q = rng.normal(size=(1, 64)).astype(np.float32)
    nodes = jnp.asarray([[trie.node_of_path([0]), trie.node_of_path([2])]])
    scores = jnp.asarray([[-0.3, -0.7]], jnp.float32)
    valid = jnp.ones((1, 2), bool)
    args = (packed.rows, packed.starts, packed.counts, packed.row_to_doc,
            packed.cap, jnp.asarray(q), nodes, scores, valid,
            jnp.asarray(trie.cluster_of_node),
            jnp.asarray([0.0, 1.0], jnp.float32))
    ref = rerank_packed(*args, top_r=4)
    # interpret=False: without the fallback this would build the Mosaic
    # kernel; the gate must keep it on XLA and produce identical results
    got = rerank_packed(*args, top_r=4, use_pallas=True,
                        pallas_interpret=False)
    np.testing.assert_array_equal(np.asarray(got.doc_ids),
                                  np.asarray(ref.doc_ids))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-5, atol=1e-5)


def test_rerank_use_pallas_path():
    from gdr_tpu.ops.rerank import rerank
    from gdr_tpu.ops.trie import build_trie

    rng = np.random.default_rng(1)
    trie = build_trie({"0": [0, 1, 2], "1": [3, 4], "2": [5, 6, 7]},
                      kary=3, max_docs_per_cluster=4)
    store = rng.normal(size=(8, 128)).astype(np.float32)
    q = rng.normal(size=(1, 128)).astype(np.float32)
    nodes = jnp.asarray([[trie.node_of_path([0]), trie.node_of_path([2])]])
    scores = jnp.asarray([[-0.3, -0.7]], jnp.float32)
    valid = jnp.ones((1, 2), bool)
    args = (jnp.asarray(store), jnp.asarray(q), nodes, scores, valid,
            jnp.asarray(trie.cluster_of_node), jnp.asarray(trie.cluster_docs),
            jnp.asarray(trie.cluster_doc_mask),
            jnp.asarray([0.0, 1.0], jnp.float32))
    ref = rerank(*args, top_r=4)
    got = rerank(*args, top_r=4, use_pallas=True, pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(got.doc_ids),
                                  np.asarray(ref.doc_ids))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-5, atol=1e-5)
