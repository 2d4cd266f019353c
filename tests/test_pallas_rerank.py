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
