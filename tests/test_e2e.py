"""The minimum end-to-end slice (SURVEY.md §7): synthetic corpus →
on-device k-means → trie tensors → training → constrained beam decode →
cached-embedding re-rank → metric suite."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdr_tpu.config import tiny_config
from gdr_tpu.data.synthetic import batch_slice, build_synthetic_task
from gdr_tpu.eval.evaluator import EvalData, Evaluator
from gdr_tpu.models.gdr import GenerativeRetriever
from gdr_tpu.train.trainer import init_train_state, make_train_step

CFG = tiny_config(kary=3, max_output_length=5)


@pytest.fixture(scope="module")
def trained():
    task = build_synthetic_task(n_docs=16, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=CFG.model.vocab_size,
                                max_output_length=5, seed=0)
    model = GenerativeRetriever(dataclasses.replace(CFG.model, dropout_rate=0.0))
    cfg = CFG.replace(train=dataclasses.replace(
        CFG.train, learning_rate=5e-3, decoder_learning_rate=5e-3))
    state, opt = init_train_state(cfg, model, None, jax.random.PRNGKey(0),
                                  total_steps=10_000, input_len=8)
    step_fn = make_train_step(model, None, opt, cfg, stage=1)
    store = jnp.asarray(task.store)
    rng = jax.random.PRNGKey(1)
    batch = {k: jnp.asarray(v) for k, v in batch_slice(task, np.arange(16)).items()}
    for _ in range(120):
        state, m = step_fn(state, batch, store, rng)
    return task, model, state, float(m["ce"])


def test_e2e_memorisation_and_retrieval(trained):
    task, model, state, final_ce = trained
    assert final_ce < 0.5, final_ce

    ev_cfg = dataclasses.replace(CFG.eval, num_beams=4,
                                 num_return_sequences=4,
                                 score_rates=(0.0, 1.0))
    evaluator = Evaluator(model, task.trie, task.store, ev_cfg)
    data = EvalData(input_ids=task.input_ids, attn_mask=task.attn_mask,
                    gt_docs=task.gt_docs, gt_cids=task.gt_cids)
    out = evaluator.evaluate(state.params["generator"], data, batch_size=8)

    # key surface matches the reference's logged series
    assert "recall1" in out and "cluster_recall1" in out
    assert "recall1_0.0" in out and "MRR100_1.0" in out
    # memorised training queries → the right cluster is generated top-1
    assert out["cluster_accuracy1"] > 0.5, out["cluster_accuracy1"]
    # and the positive doc is found within the candidate set
    assert out["accuracy100_0.0"] > 0.5, out
    # doc-level top-1 with dense re-rank beats random-within-cluster
    assert out["recall1"] > 0.2, out["recall1"]


def test_e2e_expansion_without_retraining(trained):
    """The paper's headline capability (SURVEY.md §3.5): new docs join the
    index via embedding similarity, no retraining."""
    from gdr_tpu.ops.trie import insert_docs

    task, model, state, _ = trained
    rng = np.random.default_rng(7)
    # new docs near existing docs' embeddings → should join their clusters
    base = task.store[:4]
    new_docs = (base + rng.normal(size=base.shape) * 0.01).astype(np.float32)
    n0 = len(task.store)
    trie2, rows = insert_docs(task.trie, new_docs, first_new_index=n0)
    store2 = np.concatenate([task.store, new_docs])

    for m in range(4):
        cid = task.cid_of_doc[m]
        assert n0 + m in trie2.docs_of_cid(cid), (m, cid)

    ev_cfg = dataclasses.replace(CFG.eval, num_beams=4,
                                 num_return_sequences=4, score_rates=(0.0,))
    evaluator = Evaluator(model, trie2, store2, ev_cfg)
    # query for doc 0 should now retrieve the clone doc n0 among top docs
    res, rr = evaluator.retrieve(state.params["generator"],
                                 task.input_ids[:1], task.attn_mask[:1])
    docs = [int(d) for d, v in zip(np.asarray(rr.doc_ids)[0, 0],
                                   np.asarray(rr.doc_valid)[0, 0]) if v]
    assert n0 in docs or 0 in docs


def test_evaluate_writes_result_tsv(trained, tmp_path):
    import dataclasses as dc
    from gdr_tpu.eval.offline import calculate

    task, model, state, _ = trained
    ev_cfg = dc.replace(CFG.eval, num_beams=4, num_return_sequences=4,
                        score_rates=(0.0,))
    evaluator = Evaluator(model, task.trie, task.store, ev_cfg)
    data = EvalData(input_ids=task.input_ids, attn_mask=task.attn_mask,
                    gt_docs=task.gt_docs, gt_cids=task.gt_cids)
    path = str(tmp_path / "res1.tsv")
    out = evaluator.evaluate(state.params["generator"], data, batch_size=8,
                             result_tsv=path)
    offline = calculate(path)
    # the offline calculate over the written TSV agrees with the online suite
    assert abs(offline["recall1"] - out["recall1"]) < 1e-9
    assert "retrieve_mean_ms" in out          # phase timing present


def test_decoder_query_rep_paths(trained):
    """use_query_embed_decoder_avg / _special: per-beam decoder query reps
    (ref main_models.py:1464-1571)."""
    import dataclasses as dc

    task, model, state, _ = trained
    data_ids, data_mask = task.input_ids[:2], task.attn_mask[:2]
    for avg, special, use_enc in [(True, False, False), (False, True, False),
                                  (True, False, True)]:
        ev_cfg = dc.replace(CFG.eval, num_beams=4, num_return_sequences=4,
                            score_rates=(0.0,),
                            use_query_embed_encoder=use_enc,
                            use_query_embed_decoder_avg=avg,
                            use_query_embed_decoder_special=special)
        evaluator = Evaluator(model, task.trie, task.store, ev_cfg)
        res, rr = evaluator.retrieve(state.params["generator"],
                                     data_ids, data_mask)
        assert np.asarray(rr.doc_valid).any(), (avg, special, use_enc)
        assert np.isfinite(np.asarray(rr.scores)[
            np.asarray(rr.doc_valid)]).all()


def test_retrieve_many_matches_retrieve(trained):
    import dataclasses as dc

    task, model, state, _ = trained
    ev_cfg = dc.replace(CFG.eval, num_beams=4, num_return_sequences=4,
                        score_rates=(0.0,))
    ev = Evaluator(model, task.trie, task.store, ev_cfg)
    ids = np.stack([task.input_ids[:4], task.input_ids[4:8]])   # [2, 4, S]
    msk = np.stack([task.attn_mask[:4], task.attn_mask[4:8]])
    res_m, rr_m = ev.retrieve_many(state.params["generator"], ids, msk)
    for g in range(2):
        res, rr = ev.retrieve(state.params["generator"], ids[g], msk[g])
        np.testing.assert_array_equal(np.asarray(res_m.sequences)[g],
                                      np.asarray(res.sequences))
        v = np.asarray(rr.doc_valid)
        np.testing.assert_array_equal(np.asarray(rr_m.doc_valid)[g], v)
        np.testing.assert_array_equal(np.asarray(rr_m.doc_ids)[g][v],
                                      np.asarray(rr.doc_ids)[v])


def test_eval_sampling_decorrelated_across_batches(trained):
    """Weak #5 (round 2): the jitted sampling retrieve must not reuse one
    fixed key for every eval batch — batch_idx folds into the key."""
    from gdr_tpu.models.gdr import init_params

    task, model, state, _ = trained
    ev_cfg = dataclasses.replace(CFG.eval, num_beams=4,
                                 num_return_sequences=4, score_rates=(0.0,),
                                 gen_method="sample", temperature=2.0)
    ev = Evaluator(model, task.trie, task.store, ev_cfg)
    # untrained params: near-uniform rollout distribution, so different keys
    # must yield different samples (a trained model may be deterministic-
    # peaked regardless of noise)
    params = init_params(model, jax.random.PRNGKey(3))
    r0, _ = ev.retrieve(params, task.input_ids[:2], task.attn_mask[:2],
                        batch_idx=0)
    r1, _ = ev.retrieve(params, task.input_ids[:2], task.attn_mask[:2],
                        batch_idx=1)
    rr0, _ = ev.retrieve(params, task.input_ids[:2], task.attn_mask[:2],
                         batch_idx=0)
    # same batch_idx → reproducible; different batch_idx → fresh noise
    np.testing.assert_array_equal(np.asarray(r0.sequences),
                                  np.asarray(rr0.sequences))
    assert not np.array_equal(np.asarray(r0.sequences),
                              np.asarray(r1.sequences))


def test_quantized_store_evaluator(trained):
    """Evaluator(quantize=True) holds the store as per-row int8 and scores
    with the dequantising dot; on a well-separated synthetic task the
    retrieved top docs match the fp32 store's."""
    task, model, state, _ = trained
    ev_cfg = dataclasses.replace(CFG.eval, num_beams=4,
                                 num_return_sequences=4,
                                 score_rates=(0.0, 1.0))
    ev_fp = Evaluator(model, task.trie, task.store, ev_cfg)
    ev_q = Evaluator(model, task.trie, task.store, ev_cfg, quantize=True)
    from gdr_tpu.ops.quantize import QuantizedStore
    assert isinstance(ev_q.store, QuantizedStore)
    _, rr_fp = ev_fp.retrieve(state.params["generator"],
                              task.input_ids[:8], task.attn_mask[:8])
    _, rr_q = ev_q.retrieve(state.params["generator"],
                            task.input_ids[:8], task.attn_mask[:8])
    np.testing.assert_array_equal(np.asarray(rr_fp.doc_valid),
                                  np.asarray(rr_q.doc_valid))
    match = (np.asarray(rr_fp.doc_ids) == np.asarray(rr_q.doc_ids))[
        np.asarray(rr_fp.doc_valid)].mean()
    assert match > 0.9, match      # int8 noise may swap near-ties only
    # quantize × packed composes (round-4; layout/kernel parity in
    # tests/test_quantize.py) — top docs agree with the unpacked int8 run
    ev_qp = Evaluator(model, task.trie, task.store, ev_cfg, quantize=True,
                      packed=True)
    _, rr_qp = ev_qp.retrieve(state.params["generator"],
                              task.input_ids[:8], task.attn_mask[:8])
    match_p = (np.asarray(rr_qp.doc_ids) == np.asarray(rr_q.doc_ids))[
        np.asarray(rr_q.doc_valid)].mean()
    assert match_p > 0.9, match_p
