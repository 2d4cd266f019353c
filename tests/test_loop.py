"""TrainLoop orchestration: epochs, eval, checkpointing, preemption."""

import dataclasses

import numpy as np
import pytest

from gdr_tpu.config import tiny_config
from gdr_tpu.data.dataset import TrainSet
from gdr_tpu.data.synthetic import build_synthetic_task
from gdr_tpu.eval.evaluator import EvalData
from gdr_tpu.index.builder import Index
from gdr_tpu.train.loop import TrainLoop
from gdr_tpu.utils.preemption import PreemptionGuard


def _world():
    cfg = tiny_config(kary=3, max_output_length=5)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dropout_rate=0.0),
        train=dataclasses.replace(cfg.train, train_batch_size=4,
                                  eval_batch_size=4, num_train_epochs=2,
                                  train_encoder_epoch=99,
                                  learning_rate=3e-3,
                                  decoder_learning_rate=3e-3),
        eval=dataclasses.replace(cfg.eval, num_beams=4,
                                 num_return_sequences=4,
                                 score_rates=(0.0,)))
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
    return cfg, index, ts, dev


def test_loop_runs_and_checkpoints(tmp_path):
    cfg, index, ts, dev = _world()
    loop = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path), seed=0)
    best = loop.run(max_epochs=2)
    assert "recall1" in best
    assert (tmp_path / "ckpt").exists()
    assert (tmp_path / "train.metrics.jsonl").exists()

    # resume: a fresh loop picks up the checkpoint
    loop2 = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path), seed=0)
    assert int(loop2.state.step) > 0


def test_preemption_guard_stops_loop(tmp_path):
    cfg, index, ts, dev = _world()
    loop = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path / "p"), seed=0)
    with PreemptionGuard() as guard:
        guard.request_stop()
        best = loop._run(guard, max_epochs=5)
    # stopped after the first step of epoch 0 → checkpoint written
    assert (tmp_path / "p" / "ckpt").exists()


def test_two_stage_loop_with_live_encoder(tmp_path):
    """Stage switch: cached-store epochs then live doc-tower epochs with a
    refreshed store before stage-2 eval (ref main_models.py:1910-1917)."""
    import numpy as np
    from gdr_tpu.models.dual_encoder import tiny_doc_encoder

    cfg, index, ts, dev = _world()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, train_encoder_epoch=0, num_train_epochs=2,
        stage2_train_batch_size=4))
    rng = np.random.default_rng(0)
    doc_tokens = rng.integers(1, 500, size=(len(index.store), 12)).astype(np.int32)
    doc_mask = np.ones_like(doc_tokens)
    enc = tiny_doc_encoder(d_model=index.store.shape[1])
    loop = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path / "s2"),
                     seed=0, doc_tokens=doc_tokens, doc_tok_mask=doc_mask,
                     doc_encoder=enc)
    old_store = np.asarray(loop.store).copy()
    best = loop.run(max_epochs=2)
    assert "recall1" in best
    # epoch 1 ran stage 2 → store refreshed from the live tower
    assert not np.allclose(np.asarray(loop.store), old_store)


def test_resume_continues_after_checkpointed_epoch(tmp_path):
    """A resumed loop must continue AFTER the restored epoch — not replay
    from 0 (which would re-train at post-schedule learning rates and
    collide with existing orbax step numbers)."""
    cfg, index, ts, dev = _world()
    loop = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path), seed=0)
    loop.run(max_epochs=2)

    loop2 = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path), seed=0)
    assert loop2.start_epoch >= 1
    step_before = int(loop2.state.step)
    # running to the same horizon is a no-op (everything already trained);
    # extending the horizon trains exactly the remaining epochs
    best = loop2.run(max_epochs=loop2.start_epoch)
    assert int(loop2.state.step) == step_before
    loop3 = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path), seed=0)
    start = loop3.start_epoch
    loop3.run(max_epochs=start + 1)
    assert int(loop3.state.step) > step_before


def test_every_epoch_leaves_resume_point(tmp_path):
    """Resume must lose at most ONE epoch after a hard kill.

    The regular per-eval-epoch save goes through best-k retention: when the
    monitored metric does not improve, orbax GCs that step and a kill then
    resumes at the last IMPROVING eval — observed on a tunneled 334k run as
    a 5-epoch loss.  The loop therefore persists a latest-1 preemption save
    at EVERY epoch boundary, and ``restore_latest`` must prefer it."""
    cfg, index, ts, dev = _world()
    loop = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path), seed=0)
    loop.run(max_epochs=3)
    # the latest-1 resume point names the first UNtrained epoch (3)
    assert loop.ckpt._preempt_mgr().latest_step() == 3
    loop2 = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path), seed=0)
    assert loop2.start_epoch == 3


def test_incremental_store_refresh(tmp_path):
    """stage2_refresh_fraction < 1: only a rotating slice re-embeds per
    eval epoch; the rest keeps its previous embedding."""
    import dataclasses as dc
    import numpy as np
    from gdr_tpu.models.dual_encoder import tiny_doc_encoder

    cfg, index, ts, dev = _world()
    cfg = cfg.replace(train=dc.replace(
        cfg.train, train_encoder_epoch=-1, num_train_epochs=1,
        stage2_train_batch_size=4, stage2_refresh_fraction=0.5))
    rng = np.random.default_rng(0)
    doc_tokens = rng.integers(1, 500, size=(len(index.store), 12)).astype(np.int32)
    doc_mask = np.ones_like(doc_tokens)
    enc = tiny_doc_encoder(d_model=index.store.shape[1])
    loop = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path / "inc"),
                     seed=0, doc_tokens=doc_tokens, doc_tok_mask=doc_mask,
                     doc_encoder=enc)
    orig = np.asarray(loop.store).copy()
    loop._refresh_store()
    s1 = np.asarray(loop.store)
    n = len(orig)
    changed = ~np.all(np.isclose(s1, orig, atol=1e-7), axis=1)
    assert changed[: n // 2].all()            # first half re-embedded
    assert not changed[n // 2:].any()         # second half untouched
    loop._refresh_store()                     # cursor advanced
    s2 = np.asarray(loop.store)
    changed2 = ~np.all(np.isclose(s2, s1, atol=1e-7), axis=1)
    assert changed2[n // 2:].all()


def test_packed_eval_matches_plain(tmp_path):
    """TrainLoop(packed_eval=True) evaluates through the cluster-packed
    re-rank; with a fresh store refresh in between (set_store re-packs),
    dev metrics match the per-row-gather evaluator's."""
    import dataclasses as dc
    from gdr_tpu.models.dual_encoder import tiny_doc_encoder

    cfg, index, ts, dev = _world()
    cfg = cfg.replace(train=dc.replace(
        cfg.train, train_encoder_epoch=-1, num_train_epochs=1,
        stage2_train_batch_size=4))
    rng = np.random.default_rng(0)
    doc_tokens = rng.integers(1, 500, size=(len(index.store), 12)).astype(np.int32)
    doc_mask = np.ones_like(doc_tokens)
    enc = tiny_doc_encoder(d_model=index.store.shape[1])
    outs = {}
    for packed in (False, True):
        loop = TrainLoop(cfg, index, ts, dev,
                         workdir=str(tmp_path / f"p{packed}"), seed=0,
                         doc_tokens=doc_tokens, doc_tok_mask=doc_mask,
                         doc_encoder=enc, packed_eval=packed)
        best = loop.run()
        if packed:
            # the evaluator's store is the packed layout, not [N, d]
            assert loop.evaluator.store.shape[0] >= len(index.store)
        outs[packed] = {k: v for k, v in best.items()
                        if k.startswith(("cluster_recall", "recall1"))}
    assert outs[False] == outs[True], (outs[False], outs[True])
