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


def test_pack_layout_sharded_invariants(world):
    from gdr_tpu.ops.packed_store import pack_layout_sharded

    trie, store = world
    n_shards = 8
    starts, counts, row_to_doc, cap, shard_rows = \
        pack_layout_sharded(trie, n_shards)
    assert len(row_to_doc) == n_shards * shard_rows
    assert np.all(starts % ALIGN == 0) and shard_rows % ALIGN == 0
    for row, node in enumerate(trie.cluster_node_ids):
        cid = trie.cid_of_node(int(node))
        docs = trie.docs_of_cid(cid)
        s = int(starts[row])
        # block entirely inside one shard range, incl. the cap window
        assert s // shard_rows == (s + cap - 1) // shard_rows
        np.testing.assert_array_equal(row_to_doc[s:s + len(docs)], docs)
        assert counts[row] == len(docs)


import pytest


@pytest.mark.parametrize("use_pallas", [False, True])
def test_sharded_packed_rerank_matches_generic(world, use_pallas):
    """sharded_rerank_packed (8 virtual devices, contiguous local slices)
    == single-device generic rerank — for both the XLA contiguous-gather
    scoring and the Pallas streaming kernel (interpret mode on CPU)."""
    from gdr_tpu.config import MeshConfig
    from gdr_tpu.ops.packed_store import pack_layout_sharded, pack_rows
    from gdr_tpu.parallel.mesh import make_mesh
    from gdr_tpu.parallel.store import (place_packed_store,
                                        sharded_rerank_packed)

    trie, store = world
    rng = np.random.default_rng(5)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    starts, counts, row_to_doc, cap, shard_rows = \
        pack_layout_sharded(trie, mesh.devices.size)
    rows = place_packed_store(np.asarray(pack_rows(store, row_to_doc)), mesh)

    b, k = 3, 3
    node_ids = [trie.node_of_path([0]), trie.node_of_path([1, 0]),
                trie.node_of_path([1, 1]), trie.node_of_path([2])]
    nodes = np.asarray(rng.choice(node_ids, size=(b, k), replace=True))
    beam_scores = rng.normal(size=(b, k)).astype(np.float32)
    valid = np.ones((b, k), bool)
    valid[0, 2] = False
    alphas = np.asarray([0.0, 1.0, 2.0], np.float32)
    q = rng.normal(size=(b, DIM)).astype(np.float32)

    ref = rerank(jnp.asarray(store), jnp.asarray(q), jnp.asarray(nodes),
                 jnp.asarray(beam_scores), jnp.asarray(valid),
                 jnp.asarray(trie.cluster_of_node),
                 jnp.asarray(trie.cluster_docs),
                 jnp.asarray(trie.cluster_doc_mask),
                 jnp.asarray(alphas), top_r=6)
    got = sharded_rerank_packed(
        mesh, rows, jnp.asarray(starts), jnp.asarray(counts),
        jnp.asarray(row_to_doc), cap, shard_rows, jnp.asarray(q),
        jnp.asarray(nodes), jnp.asarray(beam_scores), jnp.asarray(valid),
        jnp.asarray(trie.cluster_of_node), jnp.asarray(alphas), top_r=6,
        use_pallas=use_pallas, pallas_interpret=True)

    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.doc_valid),
                                  np.asarray(ref.doc_valid))
    # same docs at every valid rank (scores are distinct w.h.p.)
    ok = np.asarray(ref.doc_valid)
    np.testing.assert_array_equal(np.asarray(got.doc_ids)[ok],
                                  np.asarray(ref.doc_ids)[ok])


def test_mesh_packed_evaluator_matches_single_device():
    """Evaluator(mesh=..., packed=True) — full retrieval equivalence."""
    import dataclasses
    import jax
    from gdr_tpu.config import MeshConfig, tiny_config
    from gdr_tpu.data.synthetic import build_synthetic_task
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.parallel.mesh import make_mesh

    CFG = tiny_config(kary=3, max_output_length=5)
    task = build_synthetic_task(n_docs=16, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=CFG.model.vocab_size,
                                max_output_length=5, seed=0)
    model = GenerativeRetriever(dataclasses.replace(CFG.model,
                                                    dropout_rate=0.0))
    params = init_params(model, jax.random.PRNGKey(0))
    ev_cfg = dataclasses.replace(CFG.eval, num_beams=4,
                                 num_return_sequences=4,
                                 score_rates=(0.0, 1.0))
    single = Evaluator(model, task.trie, task.store, ev_cfg)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    multi = Evaluator(model, task.trie, task.store, ev_cfg, mesh=mesh,
                      packed=True)
    r1, rr1 = single.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    r2, rr2 = multi.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    np.testing.assert_array_equal(np.asarray(r1.sequences),
                                  np.asarray(r2.sequences))
    np.testing.assert_allclose(np.asarray(rr1.scores),
                               np.asarray(rr2.scores), rtol=1e-4, atol=1e-4)
    ok = np.asarray(rr1.doc_valid)
    np.testing.assert_array_equal(np.asarray(rr1.doc_ids)[ok],
                                  np.asarray(rr2.doc_ids)[ok])
