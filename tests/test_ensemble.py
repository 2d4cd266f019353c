import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.models.ensemble import (ensemble_logits, init_ensemble,
                                     member_params, merge_retrievals,
                                     split_params)
from gdr_tpu.models.gdr import GenerativeRetriever, shift_right

CFG = tiny_config(kary=3, max_output_length=5)
MCFG = dataclasses.replace(CFG.model, dropout_rate=0.0)


def test_ensemble_matches_per_member_forward():
    model = GenerativeRetriever(MCFG)
    n = 3
    enc_side, dec_stacked = init_ensemble(model, jax.random.PRNGKey(0), n)
    rng = np.random.default_rng(0)
    b, s, L = 2, 8, MCFG.max_output_length
    ids = jnp.asarray(rng.integers(2, 100, size=(b, s)), jnp.int32)
    attn = jnp.ones((b, s), jnp.int32)
    labels = np.zeros((n, b, L), np.int32)
    for i in range(n):
        for j in range(b):
            digits = rng.integers(0, MCFG.kary, size=2)
            toks = [p * MCFG.kary + int(d) + 2 for p, d in enumerate(digits)] + [1]
            labels[i, j, :len(toks)] = toks
    labels = jnp.asarray(labels)
    lmask = (labels != 0).astype(jnp.int32)

    stacked_logits = ensemble_logits(model, enc_side, dec_stacked, ids, attn,
                                     labels, lmask)
    assert stacked_logits.shape == (n, b, L, MCFG.decode_vocab_size)

    # member 1 standalone must match its ensemble row
    p1 = member_params(enc_side, dec_stacked, 1)
    out = model.apply(p1, ids, attn, shift_right(labels[1]), lmask[1])
    np.testing.assert_allclose(np.asarray(stacked_logits[1]),
                               np.asarray(out["logits"]),
                               rtol=2e-3, atol=2e-3)
    # distinct decoders → distinct logits
    assert not np.allclose(np.asarray(stacked_logits[0]),
                           np.asarray(stacked_logits[1]))


def test_split_merge_roundtrip():
    model = GenerativeRetriever(MCFG)
    from gdr_tpu.models.gdr import init_params
    params = init_params(model, jax.random.PRNGKey(0))
    enc, dec = split_params(params)
    assert "encoder" in enc and "shared" in enc
    assert "decoder" in dec and "pawa" in dec and "decode_embed" in dec


def test_merge_retrievals():
    docs = [["a", "b", "c"], ["b", "d"]]
    scores = [[0.9, 0.5, 0.1], [0.7, 0.6]]
    merged = merge_retrievals(docs, scores, top_k=3)
    assert merged == ["a", "b", "d"]   # b keeps its best score (0.7)


def test_ensemble_retrieval_merge_end_to_end():
    """Each member decodes over its own k-means trie; results merge by best
    fused score (the reference's multi-decoder eval, main_models.py:1663-1676)."""
    from gdr_tpu.data.synthetic import build_synthetic_task
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.ensemble import member_params, merge_retrievals

    n = 2
    model = GenerativeRetriever(MCFG)
    enc_side, dec_stacked = init_ensemble(model, jax.random.PRNGKey(0), n)
    # two different docid assignments over the same corpus (different seeds)
    tasks = [build_synthetic_task(n_docs=12, dim=16, kary=3, leaf_cap=4,
                                  seq_len=8, vocab_size=MCFG.vocab_size,
                                  max_output_length=5, seed=s)
             for s in (0, 1)]
    ids, attn = tasks[0].input_ids[:2], tasks[0].attn_mask[:2]
    ev_cfg = dataclasses.replace(CFG.eval, num_beams=4,
                                 num_return_sequences=4, score_rates=(0.0,))
    doc_lists, score_lists = [], []
    for i in range(n):
        ev = Evaluator(model, tasks[i].trie, tasks[i].store, ev_cfg)
        res, rr = ev.retrieve(member_params(enc_side, dec_stacked, i),
                              ids, attn)
        d = np.asarray(rr.doc_ids)[0, 0]
        v = np.asarray(rr.doc_valid)[0, 0]
        s = np.asarray(rr.scores)[0, 0]
        doc_lists.append([str(int(x)) for x, ok in zip(d, v) if ok])
        score_lists.append([float(x) for x, ok in zip(s, v) if ok])
    merged = merge_retrievals(doc_lists, score_lists, top_k=6)
    assert 0 < len(merged) <= 6
    assert len(set(merged)) == len(merged)


def test_ensemble_train_step_loss_decreases():
    import optax
    from gdr_tpu.models.ensemble import make_ensemble_train_step

    n, b, s, L = 2, 4, 8, MCFG.max_output_length
    model = GenerativeRetriever(MCFG)
    enc_side, dec_stacked = init_ensemble(model, jax.random.PRNGKey(0), n)
    rng = np.random.default_rng(0)
    labels = np.zeros((n, b, L), np.int32)
    for i in range(n):
        for j in range(b):
            digits = rng.integers(0, MCFG.kary, size=2)
            toks = [p * MCFG.kary + int(d) + 2
                    for p, d in enumerate(digits)] + [1]
            labels[i, j, :len(toks)] = toks
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 100, size=(b, s)), jnp.int32),
        "attn_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.asarray(labels),
        "label_mask": jnp.asarray((labels != 0).astype(np.int32)),
    }
    params = {"enc": enc_side, "dec": dec_stacked}
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_ensemble_train_step(model, opt)
    first = None
    for i in range(20):
        params, opt_state, loss, per_member = step(params, opt_state, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.8, (first, float(loss))
    assert per_member.shape == (n,)


def test_ensemble_train_step_rdrop_variants():
    """R-Drop through the ensemble step (ref routes multiple_decoder through
    the same T5FineTuner loss machinery, main_models.py:925-944): each
    variant runs with live dropout, stays finite, and actually contributes
    (loss != plain CE of the duplicated halves)."""
    import optax
    from gdr_tpu.models.ensemble import make_ensemble_train_step

    mcfg = CFG.model                     # dropout ON — halves must differ
    n, b, s, L = 2, 4, 8, mcfg.max_output_length
    model = GenerativeRetriever(mcfg)
    enc_side, dec_stacked = init_ensemble(model, jax.random.PRNGKey(0), n)
    rng = np.random.default_rng(0)
    labels = np.zeros((n, b, L), np.int32)
    for i in range(n):
        for j in range(b):
            digits = rng.integers(0, mcfg.kary, size=2)
            toks = [p * mcfg.kary + int(d) + 2
                    for p, d in enumerate(digits)] + [1]
            labels[i, j, :len(toks)] = toks
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 100, size=(b, s)), jnp.int32),
        "attn_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.asarray(labels),
        "label_mask": jnp.asarray((labels != 0).astype(np.int32)),
    }
    params = {"enc": enc_side, "dec": dec_stacked}
    opt = optax.adam(3e-3)
    for variant in ("Contrast", "KL", "L2"):
        step = make_ensemble_train_step(model, opt, rdrop=0.1,
                                        rdrop_loss=variant)
        p, o, loss, per_member = step(params, opt.init(params), batch,
                                      jax.random.PRNGKey(7))
        assert np.isfinite(float(loss)), variant
        assert per_member.shape == (n,)
        # the step must actually move the decoder-side params
        delta = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()),
            jax.tree_util.tree_map(jnp.subtract, p["dec"], params["dec"]),
            0.0)
        assert delta > 0.0, variant


def test_ensemble_rdrop_requires_rng():
    import optax
    import pytest
    from gdr_tpu.models.ensemble import make_ensemble_train_step

    model = GenerativeRetriever(MCFG)
    n, b, s, L = 2, 2, 8, MCFG.max_output_length
    enc_side, dec_stacked = init_ensemble(model, jax.random.PRNGKey(0), n)
    params = {"enc": enc_side, "dec": dec_stacked}
    opt = optax.adam(1e-3)
    step = make_ensemble_train_step(model, opt, rdrop=0.1)
    batch = {
        "input_ids": jnp.ones((b, s), jnp.int32),
        "attn_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.ones((n, b, L), jnp.int32),
        "label_mask": jnp.ones((n, b, L), jnp.int32),
    }
    with pytest.raises(ValueError, match="rdrop"):
        step(params, opt.init(params), batch)
