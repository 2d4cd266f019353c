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
                 eval_every: int = 1, mesh=None,
                 packed_eval: bool = False, eval_pallas: bool = False,
                 warm_start=None):
        """``mesh``: optional ``jax.sharding.Mesh`` (axes ``dp``/``mp``) —
        training then runs SPMD over it: batches sharded over ``dp``,
        parameters replicated (or column-sharded over ``mp`` via
        ``tp_param_rules``), the doc-embedding store row-sharded over the
        whole mesh, and gradients reduced over ICI by XLA.  This is the
        trainer-integrated equivalent of the reference's DDP wiring
        (main.py:86-104 + DistributedSampler main_models.py:1990,1999).
        Multi-host: call ``jax.distributed.initialize`` first and pass a
        process-spanning mesh."""
        self.cfg = cfg
        self.index = index
        self.train_set = train_set
        self.dev = dev
        self.workdir = workdir
        self.doc_tokens = doc_tokens
        self.doc_tok_mask = doc_tok_mask
        self.eval_every = eval_every
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape.get("dp", 1)
            for name, b in (("train_batch_size", cfg.train.train_batch_size),
                            ("stage2_train_batch_size",
                             cfg.train.stage2_train_batch_size)):
                if b % dp != 0:
                    raise ValueError(
                        f"TrainConfig.{name}={b} must be divisible by the "
                        f"mesh dp axis ({dp}) so every device gets equal "
                        f"batch shards")

        self.rng = set_seed(seed)
        # TrainConfig.bf16 — the TPU-native answer to the reference's
        # optional apex AMP (main.py:61-62,103): bf16 compute throughout the
        # towers while Flax keeps parameters (and hence the optimizer state)
        # fp32, and every loss reduction upcasts to fp32 (ops/losses.py)
        dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
        self.model = GenerativeRetriever(cfg.model, dtype=dtype)
        self.doc_encoder = doc_encoder
        if doc_tokens is not None and doc_encoder is None:
            self.doc_encoder = DocEncoder(d_model=cfg.model.encoder_d_model,
                                          dtype=dtype)

        steps_per_epoch = max(len(train_set) // cfg.train.train_batch_size, 1)
        total = steps_per_epoch * cfg.train.num_train_epochs
        self.state, self.opt = init_train_state(
            cfg, self.model, self.doc_encoder, self.rng, total_steps=total,
            input_len=train_set.input_ids.shape[1],
            encoder_len=(doc_tokens.shape[1] if doc_tokens is not None else 16))
        if warm_start is not None:
            # pretrained warm start (ref copies t5-base encoder/shared params
            # into its model, main_models.py:786-793, and BERT/AR2 weights
            # into the doc tower, :66-75): a callable mapping the initialised
            # params dict ({"generator": ..., "doc_encoder": ...}) to the
            # warm-started one — see models/convert.py.  Applied before mesh
            # sharding; a later checkpoint restore (resume) overrides it.
            self.state = self.state.replace(
                params=warm_start(self.state.params))
        if mesh is not None:
            from gdr_tpu.parallel.mesh import shard_params, tp_param_rules
            from gdr_tpu.parallel.store import place_store
            rule = (tp_param_rules(mp=mesh.shape["mp"],
                                   min_size=cfg.mesh.tp_min_size)
                    if mesh.shape.get("mp", 1) > 1 else None)
            self.state = self.state.replace(
                params=shard_params(self.state.params, mesh, rule),
                opt_state=shard_params(self.state.opt_state, mesh, rule))
            self.store = place_store(np.asarray(index.store), mesh)
        else:
            self.store = jnp.asarray(index.store)
        self.lookup = cluster_docs_lookup(index.cid_of_doc)
        # ``packed_eval``: the in-training evaluator reads candidates as
        # contiguous cluster slices (ops/packed_store.py) instead of the
        # per-row gather — the same fast path ``cli eval --packed`` uses;
        # ``eval_pallas`` additionally streams them through the Pallas
        # re-rank kernel (TPU)
        self.evaluator = Evaluator(self.model, index.trie, index.store,
                                   cfg.eval, mesh=mesh, packed=packed_eval,
                                   use_pallas=eval_pallas)
        self._neg_kwargs: dict = {}
        if cfg.data.hard_negative and cfg.data.sample_neg_num > 0:
            from gdr_tpu.data.dataset import doc_label_arrays
            dl, dm = doc_label_arrays(index.paths, cfg.model)
            self._neg_kwargs = dict(sample_neg_num=cfg.data.sample_neg_num,
                                    doc_labels=dl, doc_label_mask=dm)
        self.ckpt = CheckpointManager.from_config(cfg.train,
                                                  f"{workdir}/ckpt")
        self.logger = MetricLogger(workdir, run_name="train")
        self.last_epoch_metrics: dict[str, float] = {}
        self._refresh_cursor = 0
        self._host_store: Optional[np.ndarray] = None
        self._step_fns: dict[int, object] = {}
        # auto-resume from the latest checkpoint (preemption recovery):
        # training continues AFTER the checkpointed epoch — restarting at 0
        # would replay completed epochs at post-schedule learning rates and
        # collide with existing orbax step numbers
        self.start_epoch = 0
        step, restored, preempted = self.ckpt.restore_latest(self.state)
        if step is not None:
            self.state = restored
            # a mid-epoch preemption save means epoch ``step`` is incomplete:
            # re-run that epoch from its first batch (some early batches are
            # trained twice, none are silently skipped) — an end-of-epoch
            # save resumes after it
            self.start_epoch = int(step) if preempted else int(step) + 1
            import sys
            print(f"resumed from checkpoint step {step}"
                  + (" (mid-epoch preemption: re-running the epoch)"
                     if preempted else ""), file=sys.stderr)

    def _step_fn(self, stage: int):
        if stage not in self._step_fns:
            self._step_fns[stage] = make_train_step(
                self.model, self.doc_encoder, self.opt, self.cfg, stage=stage)
        return self._step_fns[stage]

    def _refresh_store(self) -> None:
        from gdr_tpu.index.builder import embed_corpus
        n = len(self.doc_tokens)
        frac = self.cfg.train.stage2_refresh_fraction
        if frac >= 1.0:
            emb = embed_corpus(self.doc_encoder,
                               self.state.params["doc_encoder"],
                               self.doc_tokens, self.doc_tok_mask,
                               batch_size=min(256, n), mesh=self.mesh)
            self._host_store = np.asarray(emb)
        else:
            # rotating-slice refresh: re-embed only a fraction per eval
            # epoch; the remainder stays at its last embedding
            take = max(int(n * frac), 1)
            idx = (np.arange(self._refresh_cursor,
                             self._refresh_cursor + take) % n)
            emb = embed_corpus(self.doc_encoder,
                               self.state.params["doc_encoder"],
                               self.doc_tokens[idx], self.doc_tok_mask[idx],
                               batch_size=min(256, take), mesh=self.mesh)
            base = (self.index.store if self._host_store is None
                    else self._host_store)
            # copy-on-write, never mutate in place: on CPU backends the
            # device placement below zero-copy ALIASES the host buffer, so
            # an in-place slice update on the next refresh would silently
            # rewrite the store the evaluator (and any in-flight dispatch)
            # already holds
            self._host_store = np.array(base, np.float32, copy=True)
            self._host_store[idx] = np.asarray(emb)
            self._refresh_cursor = (self._refresh_cursor + take) % n
        if self.mesh is not None:
            from gdr_tpu.parallel.store import place_store
            self.store = place_store(self._host_store, self.mesh)
        else:
            self.store = jnp.asarray(self._host_store)
        # the evaluator re-applies its own layout (packing/sharding)
        self.evaluator.set_store(self._host_store)

    def _augment_stage2(self, batch: dict) -> dict:
        idx = batch["cand_idx"]
        batch = dict(batch)
        batch["pos_tokens"] = self.doc_tokens[batch["pos_idx"]]
        batch["pos_tok_mask"] = self.doc_tok_mask[batch["pos_idx"]]
        batch["cand_tokens"] = self.doc_tokens[idx]
        batch["cand_tok_mask"] = self.doc_tok_mask[idx]
        return batch

    def run(self, max_epochs: Optional[int] = None,
            deadline: Optional[float] = None) -> dict[str, float]:
        """``deadline``: absolute ``time.time()`` bound — training stops at
        the first epoch boundary past it, persisting a resume point (the
        driver-budget guard: a wall-clock-bounded run degrades to fewer
        epochs instead of a killed process with no checkpoint)."""
        from gdr_tpu.utils.preemption import PreemptionGuard
        with PreemptionGuard() as guard:
            return self._run(guard, max_epochs, deadline)

    def _run(self, guard, max_epochs: Optional[int] = None,
             deadline: Optional[float] = None) -> dict[str, float]:
        cfg = self.cfg.train
        epochs = max_epochs or cfg.num_train_epochs
        best: dict[str, float] = {}
        step_rng = jax.random.fold_in(self.rng, 17)

        def _epoch_steps(e: int) -> int:
            # stage-2 epochs iterate at stage2_train_batch_size, so a resume
            # past the stage boundary must count per-epoch steps stage-aware
            # (log cadence / metric x-axis; the optimizer step itself is
            # restored from the checkpoint)
            s2 = e > cfg.train_encoder_epoch and self.doc_tokens is not None
            b = cfg.stage2_train_batch_size if s2 else cfg.train_batch_size
            return max(len(self.train_set) // max(b, 1), 1)

        global_step = sum(_epoch_steps(e) for e in range(self.start_epoch))
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
                if (self.cfg.model.weight_distillation > 0
                        and self.index.trie.node_embedding is not None):
                    from gdr_tpu.ops.trie import prefix_node_embeddings
                    pe, pm = prefix_node_embeddings(
                        self.index.trie, batch["labels"],
                        batch["label_mask"], self.cfg.model.kary,
                        self.cfg.model.position)
                    batch = dict(batch, prefix_emb=pe, prefix_emb_mask=pm)
                if self.mesh is not None:
                    from gdr_tpu.parallel.mesh import shard_batch
                    batch = shard_batch(batch, self.mesh)
                else:
                    batch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.state, m = step_fn(self.state, batch, self.store,
                                        step_rng)
                global_step += 1
                # keep the loss as a device scalar: a per-step float() is a
                # host sync that serialises dispatch (≈30 ms/step through a
                # tunnelled chip); finiteness is checked at every log point
                # and at epoch end instead
                losses.append(m["loss"])
                if "ranking_loss" in m:
                    rank_losses.append(m["ranking_loss"])
                if global_step % cfg.log_every_steps == 0:
                    vals = {k: float(v) for k, v in m.items()}
                    if not np.isfinite(vals["loss"]):
                        raise FloatingPointError(
                            f"non-finite loss at step {global_step} "
                            f"(epoch {epoch}): {vals} — "
                            "check store embeddings / learning rates")
                    self.logger.log(vals, global_step)
                if guard.should_stop:
                    # preempted: persist a resume point and exit cleanly
                    # (separate retention from the best-k policy so the
                    # resume point survives best-checkpoint GC)
                    self.ckpt.save_preemption(epoch, self.state)
                    self.logger.log({"preempted": 1}, global_step)
                    self.logger.close()
                    return best
            losses = [float(v) for v in losses]
            avg_loss = float(np.mean(losses)) if losses else 0.0
            if losses and not np.isfinite(avg_loss):
                bad = next(i for i, v in enumerate(losses)
                           if not np.isfinite(v))
                raise FloatingPointError(
                    f"non-finite loss in epoch {epoch} (first at batch "
                    f"{bad}: {losses[bad]}) — check store embeddings / "
                    "learning rates")
            metrics = {"epoch": epoch, "stage": stage,
                       "avg_train_loss": avg_loss,
                       "epoch_seconds": time.perf_counter() - t0}
            if rank_losses:
                metrics["avg_ranking_loss"] = float(
                    np.mean([float(v) for v in rank_losses]))
            if (epoch + 1) % self.eval_every == 0:
                if stage2:
                    # stage 2 trains the doc tower live: refresh the store so
                    # the dense re-rank scores against current embeddings
                    # (the reference re-encodes candidates per eval batch,
                    # main_models.py:1455-1462; one refreshed store per eval
                    # is the batched equivalent).  The full-corpus re-embed
                    # is the dominant stage-2 eval cost — surface it.
                    t_ref = time.perf_counter()
                    self._refresh_store()
                    metrics["store_refresh_seconds"] = (
                        time.perf_counter() - t_ref)
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
            self.last_epoch_metrics = metrics
            # Per-epoch resume point (latest-1 retention, separate from the
            # best-k manager): the regular ``save`` above only runs on eval
            # epochs AND is GC'd by best-k retention whenever the monitored
            # metric did not improve — a crash/kill could lose every epoch
            # since the last IMPROVING eval (observed: a 6-epoch 334k run
            # resumable only at epoch 1).  ``restore_latest`` prefers this
            # save exactly when it is newer than the kept best step.
            # Single-process only: the checkpoint path fetches every leaf
            # with ``jax.device_get`` (see ``_host_state``), which cannot
            # read process-spanning shardings — multi-host runs keep the
            # eval-epoch save cadence.
            if jax.process_count() == 1:
                self.ckpt.save_preemption(epoch + 1, self.state)
            if deadline is not None and time.time() >= deadline:
                self.logger.log({"deadline_stop_epoch": epoch}, global_step)
                break
        self.logger.close()
        return best
