"""Cluster-packed store: layout, packed rerank (XLA + Pallas interpret)
vs the generic gather path."""

import jax.numpy as jnp
import numpy as np
import pytest

from gdr_tpu.ops.packed_store import (ALIGN, pack_layout, pack_rows,
                                      pack_store_by_cluster)
from gdr_tpu.ops.rerank import rerank, rerank_packed
from gdr_tpu.ops.trie import build_trie

KARY, DIM = 3, 16


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(4)
    cid_to_docs = {"0": [0, 3, 5], "1-0": [7, 1], "1-1": list(range(8, 19)),
                   "2": [2, 4, 6]}
    trie = build_trie(cid_to_docs, kary=KARY, max_docs_per_cluster=16)
    store = rng.normal(size=(19, DIM)).astype(np.float32)
    return trie, store


def test_pack_layout_alignment(world):
    trie, store = world
    packed = pack_store_by_cluster(trie, store)
    assert np.all(packed.starts % ALIGN == 0)
    assert packed.cap % ALIGN == 0 and packed.cap >= 11
    # every cluster's docs sit contiguously at its start, in CSR order
    for row, node in enumerate(trie.cluster_node_ids):
        cid = trie.cid_of_node(int(node))
        docs = trie.docs_of_cid(cid)
        s = packed.starts[row]
        np.testing.assert_array_equal(packed.row_to_doc[s:s + len(docs)], docs)
        np.testing.assert_allclose(packed.rows[s:s + len(docs)], store[docs])
        # pad rows are zero with -1 doc ids
        pad = packed.row_to_doc[s + len(docs):s + packed.counts[row]]
        assert pad.size == 0

    # device packing path agrees with the host path
    starts, counts, r2d, cap = pack_layout(trie)
    rows_dev = np.asarray(pack_rows(jnp.asarray(store), r2d))
    np.testing.assert_allclose(rows_dev, packed.rows)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_rerank_packed_matches_generic(world, use_pallas):
    trie, store = world
    rng = np.random.default_rng(1)
    packed = pack_store_by_cluster(trie, store)
    q = jnp.asarray(rng.normal(size=(2, DIM)), jnp.float32)
    nodes = jnp.asarray([
        [trie.node_of_path([1, 1]), trie.node_of_path([0])],
        [trie.node_of_path([2]), trie.node_of_path([1, 0])]])
    scores = jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)
    valid = jnp.ones((2, 2), bool)
    alphas = jnp.asarray([0.0, 1.5], jnp.float32)

    ref = rerank(jnp.asarray(store), q, nodes, scores, valid,
                 jnp.asarray(trie.cluster_of_node),
                 jnp.asarray(trie.cluster_docs),
                 jnp.asarray(trie.cluster_doc_mask), alphas, top_r=6)
    got = rerank_packed(jnp.asarray(packed.rows), jnp.asarray(packed.starts),
                        jnp.asarray(packed.counts),
                        jnp.asarray(packed.row_to_doc), packed.cap,
                        q, nodes, scores, valid,
                        jnp.asarray(trie.cluster_of_node), alphas, top_r=6,
                        use_pallas=use_pallas, pallas_interpret=use_pallas)
    v = np.asarray(ref.doc_valid)
    np.testing.assert_array_equal(np.asarray(got.doc_valid), v)
    np.testing.assert_array_equal(np.asarray(got.doc_ids)[v],
                                  np.asarray(ref.doc_ids)[v])
    np.testing.assert_allclose(np.asarray(got.scores)[v],
                               np.asarray(ref.scores)[v],
                               rtol=1e-5, atol=1e-5)


def test_packed_evaluator_matches_generic(world):
    """Evaluator(packed=True) end-to-end equals the generic evaluator."""
    import dataclasses
    import jax
    from gdr_tpu.config import tiny_config
    from gdr_tpu.data.synthetic import build_synthetic_task
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params

    CFG = tiny_config(kary=3, max_output_length=5)
    task = build_synthetic_task(n_docs=16, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=CFG.model.vocab_size,
                                max_output_length=5, seed=0)
    model = GenerativeRetriever(dataclasses.replace(CFG.model,
                                                    dropout_rate=0.0))
    params = init_params(model, jax.random.PRNGKey(0))
    ev_cfg = dataclasses.replace(CFG.eval, num_beams=4,
                                 num_return_sequences=4, score_rates=(0.0,))
    generic = Evaluator(model, task.trie, task.store, ev_cfg)
    packed = Evaluator(model, task.trie, task.store, ev_cfg, packed=True)
    r1, rr1 = generic.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    r2, rr2 = packed.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    v = np.asarray(rr1.doc_valid)
    np.testing.assert_array_equal(np.asarray(rr2.doc_valid), v)
    np.testing.assert_array_equal(np.asarray(rr2.doc_ids)[v],
                                  np.asarray(rr1.doc_ids)[v])
