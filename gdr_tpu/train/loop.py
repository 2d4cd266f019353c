"""Epoch-driven training orchestrator.

The harness role of the reference's ``pl.Trainer`` + ``T5FineTuner`` epoch
hooks (main.py:84-112, main_models.py:1644-1917): per-epoch batch iteration,
periodic evaluation, best-checkpoint retention on dev ``recall1``, metric
logging, and the two-stage schedule — stage 1 trains the generative model
against cached doc embeddings; at ``train_encoder_epoch`` the loop switches
to stage 2, re-jits the step with the live doc tower, and changes batch size
(ref main_models.py:1910-1917).

Stage 2 requires tokenized documents (``doc_tokens``/``doc_tok_mask``); when
absent the loop stays in stage 1 (cached embeddings) like a reference run
with ``train_encoder_epoch`` ≥ epochs.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import GDRConfig
from gdr_tpu.data.dataset import BatchIterator, TrainSet, cluster_docs_lookup
from gdr_tpu.eval.evaluator import EvalData, Evaluator
from gdr_tpu.index.builder import Index
from gdr_tpu.models.dual_encoder import DocEncoder
from gdr_tpu.models.gdr import GenerativeRetriever
from gdr_tpu.train.checkpoint import CheckpointManager
from gdr_tpu.train.trainer import init_train_state, make_train_step
from gdr_tpu.utils.logging import MetricLogger
from gdr_tpu.utils.rng import set_seed


class TrainLoop:
    def __init__(self, cfg: GDRConfig, index: Index, train_set: TrainSet,
                 dev: EvalData, workdir: str, seed: int = 42,
                 doc_tokens: Optional[np.ndarray] = None,
                 doc_tok_mask: Optional[np.ndarray] = None,
                 doc_encoder: Optional[DocEncoder] = None,
                 eval_every: int = 1):
        self.cfg = cfg
        self.index = index
        self.train_set = train_set
        self.dev = dev
        self.workdir = workdir
        self.doc_tokens = doc_tokens
        self.doc_tok_mask = doc_tok_mask
        self.eval_every = eval_every

        self.rng = set_seed(seed)
        self.model = GenerativeRetriever(cfg.model)
        self.doc_encoder = doc_encoder
        if doc_tokens is not None and doc_encoder is None:
            self.doc_encoder = DocEncoder(d_model=cfg.model.encoder_d_model)

        steps_per_epoch = max(len(train_set) // cfg.train.train_batch_size, 1)
        total = steps_per_epoch * cfg.train.num_train_epochs
        self.state, self.opt = init_train_state(
            cfg, self.model, self.doc_encoder, self.rng, total_steps=total,
            input_len=train_set.input_ids.shape[1],
            encoder_len=(doc_tokens.shape[1] if doc_tokens is not None else 16))
        self.store = jnp.asarray(index.store)
        self.lookup = cluster_docs_lookup(index.cid_of_doc)
        self.evaluator = Evaluator(self.model, index.trie, index.store,
                                   cfg.eval)
        self._neg_kwargs: dict = {}
        if cfg.data.hard_negative and cfg.data.sample_neg_num > 0:
            from gdr_tpu.data.dataset import doc_label_arrays
            dl, dm = doc_label_arrays(index.paths, cfg.model)
            self._neg_kwargs = dict(sample_neg_num=cfg.data.sample_neg_num,
                                    doc_labels=dl, doc_label_mask=dm)
        self.ckpt = CheckpointManager.from_config(cfg.train,
                                                  f"{workdir}/ckpt")
        self.logger = MetricLogger(workdir, run_name="train")
        self._step_fns: dict[int, object] = {}
        # auto-resume from the latest checkpoint (preemption recovery):
        # training continues AFTER the checkpointed epoch — restarting at 0
        # would replay completed epochs at post-schedule learning rates and
        # collide with existing orbax step numbers
        self.start_epoch = 0
        step, restored = self.ckpt.restore_latest(self.state)
        if step is not None:
            self.state = restored
            self.start_epoch = int(step) + 1
            print(f"resumed from checkpoint step {step}")

    def _step_fn(self, stage: int):
        if stage not in self._step_fns:
            self._step_fns[stage] = make_train_step(
                self.model, self.doc_encoder, self.opt, self.cfg, stage=stage)
        return self._step_fns[stage]

    def _refresh_store(self) -> None:
        from gdr_tpu.index.builder import embed_corpus
        emb = embed_corpus(self.doc_encoder, self.state.params["doc_encoder"],
                           self.doc_tokens, self.doc_tok_mask,
                           batch_size=min(256, len(self.doc_tokens)))
        self.store = jnp.asarray(emb)
        self.evaluator.store = self.store

    def _augment_stage2(self, batch: dict) -> dict:
        idx = batch["cand_idx"]
        batch = dict(batch)
        batch["pos_tokens"] = self.doc_tokens[batch["pos_idx"]]
        batch["pos_tok_mask"] = self.doc_tok_mask[batch["pos_idx"]]
        batch["cand_tokens"] = self.doc_tokens[idx]
        batch["cand_tok_mask"] = self.doc_tok_mask[idx]
        return batch

    def run(self, max_epochs: Optional[int] = None) -> dict[str, float]:
        from gdr_tpu.utils.preemption import PreemptionGuard
        with PreemptionGuard() as guard:
            return self._run(guard, max_epochs)

    def _run(self, guard, max_epochs: Optional[int] = None) -> dict[str, float]:
        cfg = self.cfg.train
        epochs = max_epochs or cfg.num_train_epochs
        best: dict[str, float] = {}
        step_rng = jax.random.fold_in(self.rng, 17)
        steps_per_epoch = max(len(self.train_set)
                              // max(cfg.train_batch_size, 1), 1)
        global_step = self.start_epoch * steps_per_epoch
        for epoch in range(self.start_epoch, epochs):
            stage2 = (epoch > cfg.train_encoder_epoch
                      and self.doc_tokens is not None)
            stage = 2 if stage2 else 1
            bsz = (cfg.stage2_train_batch_size if stage2
                   else cfg.train_batch_size)
            it = BatchIterator(self.train_set, self.lookup, bsz,
                               self.cfg.data.max_intraclass_num,
                               seed=epoch, **self._neg_kwargs)
            step_fn = self._step_fn(stage)
            t0 = time.perf_counter()
            losses = []
            rank_losses = []
            for batch in it:
                if stage2:
                    batch = self._augment_stage2(batch)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.state, m = step_fn(self.state, batch, self.store,
                                        step_rng)
                global_step += 1
                loss = float(m["loss"])
                if not np.isfinite(loss):
                    raise FloatingPointError(
                        f"non-finite loss at step {global_step} "
                        f"(epoch {epoch}): "
                        f"{ {k: float(v) for k, v in m.items()} } — "
                        "check store embeddings / learning rates")
                losses.append(loss)
                if "ranking_loss" in m:
                    rank_losses.append(float(m["ranking_loss"]))
                if global_step % cfg.log_every_steps == 0:
                    self.logger.log({k: float(v) for k, v in m.items()},
                                    global_step)
                if guard.should_stop:
                    # preempted: persist a resume point and exit cleanly
                    # (separate retention from the best-k policy so the
                    # resume point survives best-checkpoint GC)
                    self.ckpt.save_preemption(epoch, self.state)
                    self.logger.log({"preempted": 1}, global_step)
                    self.logger.close()
                    return best
            metrics = {"epoch": epoch, "stage": stage,
                       "avg_train_loss": float(np.mean(losses)) if losses else 0.0,
                       "epoch_seconds": time.perf_counter() - t0}
            if rank_losses:
                metrics["avg_ranking_loss"] = float(np.mean(rank_losses))
            if (epoch + 1) % self.eval_every == 0:
                if stage2:
                    # stage 2 trains the doc tower live: refresh the store so
                    # the dense re-rank scores against current embeddings
                    # (the reference re-encodes candidates per eval batch,
                    # main_models.py:1455-1462; one refreshed store per eval
                    # is the batched equivalent)
                    self._refresh_store()
                # stage 2 may run eval at its own batch size (the reference
                # switches batch sizing at the stage boundary,
                # main_models.py:1910-1917)
                eval_bs = (cfg.stage2_eval_batch_size
                           if stage2 else cfg.eval_batch_size)
                eval_metrics = self.evaluator.evaluate(
                    self.state.params["generator"], self.dev,
                    batch_size=max(eval_bs, 1))
                metrics.update(eval_metrics)
                self.ckpt.save(epoch, self.state, metrics)
                if not best or metrics.get(cfg.monitor, 0) >= best.get(
                        cfg.monitor, float("-inf")):
                    best = dict(metrics)
            self.logger.log(metrics, global_step)
        self.logger.close()
        return best
