"""Multi-device tests on the 8-virtual-CPU-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdr_tpu.config import MeshConfig
from gdr_tpu.parallel.mesh import (batch_sharding, make_mesh, shard_params,
                                   tp_param_rules)
from gdr_tpu.parallel.store import place_store, sharded_rerank_from_beams
from gdr_tpu.ops.rerank import rerank
from gdr_tpu.ops.trie import build_trie


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    assert mesh.shape == {"dp": 4, "mp": 2}
    mesh = make_mesh(MeshConfig())           # all devices on dp
    assert mesh.shape["dp"] == 8


def test_tp_param_rules():
    rule = tp_param_rules(mp=2, min_size=64)
    big = np.zeros((32, 64))
    small = np.zeros((4,))
    odd = np.zeros((16, 63))
    assert rule((), big) == jax.sharding.PartitionSpec(None, "mp")
    assert rule((), small) == jax.sharding.PartitionSpec()
    assert rule((), odd) == jax.sharding.PartitionSpec()


def test_sharded_rerank_matches_single_device():
    rng = np.random.default_rng(11)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    cid_to_docs = {"0": [0, 1, 2], "1": [3, 4], "2-0": [5, 6, 7, 8],
                   "2-1": [9, 10, 11, 12, 13]}
    trie = build_trie(cid_to_docs, kary=3, max_docs_per_cluster=8)
    n, d = 14, 16
    store = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(2, d)).astype(np.float32)
    nodes = np.asarray([
        [trie.node_of_path([0]), trie.node_of_path([2, 0])],
        [trie.node_of_path([1]), trie.node_of_path([2, 1])]])
    beam_scores = np.asarray([[-0.2, -0.9], [-0.4, -0.1]], np.float32)
    valid = np.ones((2, 2), bool)
    alphas = np.asarray([0.0, 1.0], np.float32)

    ref = rerank(jnp.asarray(store), jnp.asarray(q), jnp.asarray(nodes),
                 jnp.asarray(beam_scores), jnp.asarray(valid),
                 jnp.asarray(trie.cluster_of_node),
                 jnp.asarray(trie.cluster_docs),
                 jnp.asarray(trie.cluster_doc_mask),
                 jnp.asarray(alphas), top_r=4)

    store_sharded = place_store(store, mesh)
    got = sharded_rerank_from_beams(
        mesh, store_sharded, jnp.asarray(q), jnp.asarray(nodes),
        jnp.asarray(beam_scores), jnp.asarray(valid),
        jnp.asarray(trie.cluster_of_node), jnp.asarray(trie.cluster_docs),
        jnp.asarray(trie.cluster_doc_mask), jnp.asarray(alphas), top_r=4)

    np.testing.assert_array_equal(np.asarray(got.doc_ids),
                                  np.asarray(ref.doc_ids))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-5, atol=1e-5)


def test_dp_train_step_on_mesh():
    """Full train step compiled over a dp×mp mesh with TP param sharding."""
    from gdr_tpu.config import tiny_config
    from gdr_tpu.data.synthetic import batch_slice, build_synthetic_task
    from gdr_tpu.models.gdr import GenerativeRetriever
    from gdr_tpu.train.trainer import init_train_state, make_train_step

    CFG = tiny_config(kary=3, max_output_length=5)
    task = build_synthetic_task(n_docs=16, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=CFG.model.vocab_size,
                                max_output_length=5, seed=0)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    model = GenerativeRetriever(dataclasses.replace(CFG.model, dropout_rate=0.0))
    state, opt = init_train_state(CFG, model, None, jax.random.PRNGKey(0),
                                  total_steps=100, input_len=8)
    rule = tp_param_rules(mp=2, min_size=256)
    state = state.replace(
        params=shard_params(state.params, mesh, rule),
        opt_state=shard_params(state.opt_state, mesh, rule))
    step_fn = make_train_step(model, None, opt, CFG, stage=1)
    bs = batch_sharding(mesh)
    batch = {k: jax.device_put(jnp.asarray(v), bs)
             for k, v in batch_slice(task, np.arange(8)).items()}
    store = place_store(task.store, mesh)
    state, m = step_fn(state, batch, store, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # params keep their TP sharding after the update
    u = state.params["generator"]["params"]["pawa"]["u"]
    assert not u.sharding.is_fully_replicated


def test_mesh_evaluator_matches_single_device():
    """Evaluator(mesh=...) — full retrieval with the store sharded over 8
    devices must reproduce the single-device retrieval."""
    import dataclasses
    import jax.numpy as jnp
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
                                 num_return_sequences=4,
                                 score_rates=(0.0, 1.0))
    single = Evaluator(model, task.trie, task.store, ev_cfg)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    multi = Evaluator(model, task.trie, task.store, ev_cfg, mesh=mesh)

    r1, rr1 = single.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    r2, rr2 = multi.retrieve(params, task.input_ids[:2], task.attn_mask[:2])
    np.testing.assert_array_equal(np.asarray(r1.sequences),
                                  np.asarray(r2.sequences))
    np.testing.assert_array_equal(np.asarray(rr1.doc_ids),
                                  np.asarray(rr2.doc_ids))
    np.testing.assert_allclose(np.asarray(rr1.scores),
                               np.asarray(rr2.scores), rtol=1e-4, atol=1e-4)


def test_sharded_rerank_per_beam_queries():
    """ADVICE round 1 (medium): decoder_avg/special eval modes pass per-beam
    query reps [B, K, d]; the sharded rerank must match the single-device
    path for both ranks."""
    rng = np.random.default_rng(13)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    cid_to_docs = {"0": [0, 1, 2], "1": [3, 4], "2-0": [5, 6, 7, 8],
                   "2-1": [9, 10, 11, 12, 13]}
    trie = build_trie(cid_to_docs, kary=3, max_docs_per_cluster=8)
    n, d = 14, 16
    store = rng.normal(size=(n, d)).astype(np.float32)
    q_beam = rng.normal(size=(2, 2, d)).astype(np.float32)   # [B, K, d]
    nodes = np.asarray([
        [trie.node_of_path([0]), trie.node_of_path([2, 0])],
        [trie.node_of_path([1]), trie.node_of_path([2, 1])]])
    beam_scores = np.asarray([[-0.2, -0.9], [-0.4, -0.1]], np.float32)
    valid = np.ones((2, 2), bool)
    alphas = np.asarray([0.0, 1.0], np.float32)

    ref = rerank(jnp.asarray(store), jnp.asarray(q_beam), jnp.asarray(nodes),
                 jnp.asarray(beam_scores), jnp.asarray(valid),
                 jnp.asarray(trie.cluster_of_node),
                 jnp.asarray(trie.cluster_docs),
                 jnp.asarray(trie.cluster_doc_mask),
                 jnp.asarray(alphas), top_r=4)
    store_sharded = place_store(store, mesh)
    got = sharded_rerank_from_beams(
        mesh, store_sharded, jnp.asarray(q_beam), jnp.asarray(nodes),
        jnp.asarray(beam_scores), jnp.asarray(valid),
        jnp.asarray(trie.cluster_of_node), jnp.asarray(trie.cluster_docs),
        jnp.asarray(trie.cluster_doc_mask), jnp.asarray(alphas), top_r=4)
    np.testing.assert_array_equal(np.asarray(got.doc_ids),
                                  np.asarray(ref.doc_ids))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=1e-5, atol=1e-5)


def test_trainloop_on_mesh_matches_single_device(tmp_path):
    """The user-facing TrainLoop on a dp×mp mesh must reproduce the
    single-device loss trajectory (same seeds → same batches → same math,
    collectives only change reduction order)."""
    import dataclasses as dc
    from gdr_tpu.config import tiny_config
    from gdr_tpu.data.dataset import TrainSet
    from gdr_tpu.data.synthetic import build_synthetic_task
    from gdr_tpu.eval.evaluator import EvalData
    from gdr_tpu.index.builder import Index
    from gdr_tpu.train.loop import TrainLoop

    cfg = tiny_config(kary=3, max_output_length=5)
    cfg = cfg.replace(
        model=dc.replace(cfg.model, dropout_rate=0.0),
        train=dc.replace(cfg.train, train_batch_size=8, eval_batch_size=4,
                         num_train_epochs=2, train_encoder_epoch=99,
                         bf16=False, learning_rate=3e-3,
                         decoder_learning_rate=3e-3),
        eval=dc.replace(cfg.eval, num_beams=4, num_return_sequences=4,
                        score_rates=(0.0,)),
        mesh=dc.replace(cfg.mesh, tp_min_size=256))
    task = build_synthetic_task(n_docs=16, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=cfg.model.vocab_size,
                                max_output_length=5, seed=0)
    index = Index(store=task.store, trie=task.trie, paths=task.paths,
                  cid_of_doc=task.cid_of_doc)
    ts = TrainSet(input_ids=task.input_ids, attn_mask=task.attn_mask,
                  labels=task.labels, label_mask=task.label_mask,
                  pos_idx=task.pos_idx, source=["gtq"] * len(task.pos_idx))
    dev = EvalData(input_ids=task.input_ids, attn_mask=task.attn_mask,
                   gt_docs=task.gt_docs, gt_cids=task.gt_cids)

    single = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path / "s"),
                       seed=0)
    best_s = single.run(max_epochs=2)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    multi = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path / "m"),
                      seed=0, mesh=mesh)
    best_m = multi.run(max_epochs=2)

    np.testing.assert_allclose(
        multi.last_epoch_metrics["avg_train_loss"],
        single.last_epoch_metrics["avg_train_loss"], rtol=2e-4, atol=2e-4)
    assert best_m["recall1"] == best_s["recall1"]
    # the batch really was sharded over dp and params over mp
    u = multi.state.params["generator"]["params"]["pawa"]["u"]
    assert not u.sharding.is_fully_replicated


def test_trainloop_mesh_batch_divisibility():
    import dataclasses as dc
    from gdr_tpu.config import tiny_config
    from gdr_tpu.data.dataset import TrainSet
    from gdr_tpu.data.synthetic import build_synthetic_task
    from gdr_tpu.eval.evaluator import EvalData
    from gdr_tpu.index.builder import Index
    from gdr_tpu.train.loop import TrainLoop

    cfg = tiny_config(kary=3, max_output_length=5)
    cfg = cfg.replace(train=dc.replace(cfg.train, train_batch_size=6))
    task = build_synthetic_task(n_docs=12, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=cfg.model.vocab_size,
                                max_output_length=5, seed=0)
    index = Index(store=task.store, trie=task.trie, paths=task.paths,
                  cid_of_doc=task.cid_of_doc)
    ts = TrainSet(input_ids=task.input_ids, attn_mask=task.attn_mask,
                  labels=task.labels, label_mask=task.label_mask,
                  pos_idx=task.pos_idx, source=["gtq"] * len(task.pos_idx))
    dev = EvalData(input_ids=task.input_ids, attn_mask=task.attn_mask,
                   gt_docs=task.gt_docs, gt_cids=task.gt_cids)
    mesh = make_mesh(MeshConfig(dp=4, mp=2))
    with pytest.raises(ValueError, match="divisible"):
        TrainLoop(cfg, index, ts, dev, workdir="/tmp/x", seed=0, mesh=mesh)
