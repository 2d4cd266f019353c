import jax.numpy as jnp
import numpy as np
import pytest

from gdr_tpu.ops.rerank import expand_candidates, rerank
from gdr_tpu.ops.trie import build_trie, compute_node_embeddings

KARY = 3
DIM = 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    cid_to_docs = {"0": [0, 1], "1-0": [2], "1-1": [3, 4, 5], "2": [6, 7]}
    trie = build_trie(cid_to_docs, kary=KARY, max_docs_per_cluster=4)
    store = rng.normal(size=(8, DIM)).astype(np.float32)
    return trie, store


def brute_rerank(trie, store, q, cids, beam_scores, alphas, top_r):
    """Reference-style host implementation (main_models.py:1577-1637)."""
    probs = np.exp(beam_scores - beam_scores.max())
    probs = probs / probs.sum()
    out = []
    for a in alphas:
        scored = []
        for k, cid in enumerate(cids):
            for doc in trie.docs_of_cid(cid):
                s = float(np.tanh(q @ store[doc]) + a * probs[k])
                scored.append((s, doc))
        scored.sort(key=lambda x: -x[0])
        out.append([d for _, d in scored[:top_r]])
    return out


def test_expand_candidates(setup):
    trie, _ = setup
    n10 = trie.node_of_path([1, 0])
    n2 = trie.node_of_path([2])
    nodes = jnp.asarray([[n10, n2]])
    valid = jnp.asarray([[True, True]])
    docs, mask = expand_candidates(
        nodes, valid, jnp.asarray(trie.cluster_of_node),
        jnp.asarray(trie.cluster_docs), jnp.asarray(trie.cluster_doc_mask))
    got = set(int(d) for d, m in zip(np.asarray(docs).ravel(),
                                     np.asarray(mask).ravel()) if m)
    assert got == {2, 6, 7}


def test_rerank_matches_reference_semantics(setup):
    trie, store = setup
    rng = np.random.default_rng(0)
    q = rng.normal(size=DIM).astype(np.float32)
    cids = ["1-1", "0", "2"]
    nodes = [[trie.node_of_path([int(c) for c in cid.split("-")]) for cid in cids]]
    beam_scores = np.asarray([[-0.1, -0.8, -1.5]], np.float32)
    alphas = np.asarray([0.0, 1.0, 3.0], np.float32)
    res = rerank(jnp.asarray(store), jnp.asarray(q[None]),
                 jnp.asarray(nodes), jnp.asarray(beam_scores),
                 jnp.asarray([[True, True, True]]),
                 jnp.asarray(trie.cluster_of_node),
                 jnp.asarray(trie.cluster_docs),
                 jnp.asarray(trie.cluster_doc_mask),
                 jnp.asarray(alphas), top_r=5)
    expected = brute_rerank(trie, store, q, cids, beam_scores[0], alphas, 5)
    for a in range(len(alphas)):
        got = [int(d) for d, v in zip(np.asarray(res.doc_ids[a, 0]),
                                      np.asarray(res.doc_valid[a, 0])) if v]
        assert got == expected[a], f"alpha={alphas[a]}"


def test_rerank_invalid_beams_excluded(setup):
    trie, store = setup
    q = np.zeros(DIM, np.float32)
    n0 = trie.node_of_path([0])
    nodes = jnp.asarray([[n0, n0]])
    valid = jnp.asarray([[True, False]])  # second beam dead
    res = rerank(jnp.asarray(store), jnp.asarray(q[None]), nodes,
                 jnp.asarray([[-0.5, -0.5]], np.float32), valid,
                 jnp.asarray(trie.cluster_of_node),
                 jnp.asarray(trie.cluster_docs),
                 jnp.asarray(trie.cluster_doc_mask),
                 jnp.asarray([0.0], np.float32), top_r=8)
    v = np.asarray(res.doc_valid[0, 0])
    assert v.sum() == 2  # only docs 0,1 from the single valid beam
    # cluster probs: dead beam gets 0
    np.testing.assert_allclose(np.asarray(res.cluster_probs[0]), [1.0, 0.0])


def test_rerank_quantized_store(setup):
    from gdr_tpu.ops.quantize import quantize_store

    trie, store = setup
    rng = np.random.default_rng(2)
    q = rng.normal(size=(1, DIM)).astype(np.float32)
    n11 = trie.node_of_path([1, 1])
    n0 = trie.node_of_path([0])
    nodes = jnp.asarray([[n11, n0]])
    scores = jnp.asarray([[-0.2, -0.5]], np.float32)
    valid = jnp.ones((1, 2), bool)
    args = dict(query_emb=jnp.asarray(q), nodes=nodes, beam_scores=scores,
                valid=valid,
                cluster_of_node=jnp.asarray(trie.cluster_of_node),
                cluster_docs=jnp.asarray(trie.cluster_docs),
                cluster_doc_mask=jnp.asarray(trie.cluster_doc_mask),
                alphas=jnp.asarray([0.0], np.float32), top_r=5)
    ref = rerank(jnp.asarray(store), **args)
    got = rerank(quantize_store(store), **args)
    # int8 quantization: rankings should agree on well-separated scores
    np.testing.assert_array_equal(np.asarray(got.doc_ids),
                                  np.asarray(ref.doc_ids))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), atol=0.05)


def test_concate_fusion_eval_path():
    """fusion_strategy "concate": the model's learned fusion layer combines
    decoder-side and encoder query reps (ref main_models.py:1561-1562)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gdr_tpu.config import tiny_config
    from gdr_tpu.data.synthetic import build_synthetic_task
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params

    CFG = tiny_config(kary=3, max_output_length=5)
    mcfg = dataclasses.replace(CFG.model, dropout_rate=0.0,
                               concate_fusion=True)
    task = build_synthetic_task(n_docs=16, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=mcfg.vocab_size,
                                max_output_length=5, seed=0)
    model = GenerativeRetriever(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    assert "fusion" in params["params"]

    base = dataclasses.replace(CFG.eval, num_beams=4, num_return_sequences=4,
                               use_query_embed_decoder_avg=True,
                               score_rates=(0.0,))
    ev_avg = Evaluator(model, task.trie, task.store,
                       dataclasses.replace(base, fusion_strategy="average"))
    ev_cat = Evaluator(model, task.trie, task.store,
                       dataclasses.replace(base, fusion_strategy="concate"))
    r1, rr_avg = ev_avg.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    r2, rr_cat = ev_cat.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    # same beams, different dense scores (the fusion layer is load-bearing)
    np.testing.assert_array_equal(np.asarray(r1.sequences),
                                  np.asarray(r2.sequences))
    assert np.abs(np.asarray(rr_avg.scores)
                  - np.asarray(rr_cat.scores)).max() > 1e-6


def test_sample_gen_method_eval_path():
    """EvalConfig.gen_method="sample" retrieves through sampled rollouts."""
    import dataclasses
    import jax
    import numpy as np
    from gdr_tpu.config import tiny_config
    from gdr_tpu.data.synthetic import build_synthetic_task
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params

    CFG = tiny_config(kary=3, max_output_length=5)
    mcfg = dataclasses.replace(CFG.model, dropout_rate=0.0)
    task = build_synthetic_task(n_docs=16, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=mcfg.vocab_size,
                                max_output_length=5, seed=0)
    model = GenerativeRetriever(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    ev = Evaluator(model, task.trie, task.store,
                   dataclasses.replace(CFG.eval, num_beams=4,
                                       num_return_sequences=4,
                                       gen_method="sample", temperature=1.0,
                                       score_rates=(0.0, 1.0)))
    res, rr = ev.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    assert np.asarray(res.sequences).shape[1] == 4
    assert np.isfinite(np.asarray(rr.scores)[np.asarray(rr.doc_valid)]).all()


def test_padded_top_k_pads_to_k():
    import jax.numpy as jnp
    from gdr_tpu.ops.rerank import NEG_INF, padded_top_k

    scores = jnp.asarray([[3.0, 1.0, 2.0]])
    payload = jnp.asarray([[30, 10, 20]])
    s, p = padded_top_k(scores, payload, 5)
    assert s.shape == (1, 5) and p.shape == (1, 5)
    np.testing.assert_array_equal(np.asarray(p[0, :3]), [30, 20, 10])
    assert (np.asarray(s[0, 3:]) <= NEG_INF / 2).all()
    # k <= n: plain top_k
    s2, p2 = padded_top_k(scores, payload, 2)
    np.testing.assert_array_equal(np.asarray(p2[0]), [30, 20])
