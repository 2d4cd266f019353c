"""Orbax checkpointing with the reference's selection policy.

The reference uses Lightning ``ModelCheckpoint`` with two policies
(main.py:46-104): monitor dev ``recall1`` (max) or ``avg_train_loss`` (min),
``save_top_k=1``, plus manual ``--resume_from_checkpoint``.  Here the same
policy rides on ``orbax.CheckpointManager``: best-k retention by a monitored
metric, resumable full train state (params + optimizer + step), and
metadata for the monitored series.
"""

from __future__ import annotations

import queue
import sys
import threading
import time
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from gdr_tpu.config import TrainConfig


def _fetch_leaf(leaf: Any, timeout: float = 300.0, attempts: int = 2) -> Any:
    """``jax.device_get`` one pytree leaf with a watchdog.

    The transfer runs on a daemon thread so a lost RPC cannot freeze the
    training process forever; on timeout the fetch is retried once (a fresh
    RPC usually succeeds when a previous one was dropped) and then raised,
    letting the caller's preemption/retry machinery take over instead of
    hanging silently.
    """
    if not isinstance(leaf, jax.Array):
        return np.asarray(leaf)
    for attempt in range(attempts):
        q: queue.Queue = queue.Queue(maxsize=1)
        t = threading.Thread(
            target=lambda: q.put(jax.device_get(leaf)), daemon=True)
        t.start()
        try:
            return q.get(timeout=timeout)
        except queue.Empty:
            print(f"[checkpoint] fetch of {leaf.shape} {leaf.dtype} leaf "
                  f"timed out ({timeout:.0f}s), attempt {attempt + 1}",
                  file=sys.stderr, flush=True)
            if attempt + 1 >= attempts:
                raise TimeoutError(
                    f"device→host fetch of a {leaf.shape} {leaf.dtype} leaf "
                    f"timed out twice ({timeout:.0f}s each)")


def _host_state(state: Any) -> Any:
    """Fetch every leaf to host numpy before orbax serialization.

    Orbax's serializer pulls device arrays itself through asyncio +
    TensorStore; on the experimental remote-device platform used here that
    interleaving has been observed to deadlock mid-save (a checkpoint wrote
    only its metadata, then the device→host RPC never returned and the
    trainer froze with zero CPU).  A plain per-leaf ``jax.device_get`` is
    the same single-RPC path the train loop exercises thousands of times a
    run; doing it eagerly — with a watchdog (``_fetch_leaf``) — hands orbax
    a pure-host pytree so serialization never touches the device.

    Progress heartbeats go to stderr so an external stall supervisor (e.g.
    benchmarks/supervise_quality.py) can tell a slow multi-GB fetch from a
    hung one.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    out, t0 = [], time.time()
    for i, leaf in enumerate(leaves):
        out.append(_fetch_leaf(leaf))
        if (i + 1) % 50 == 0 or i + 1 == len(leaves):
            print(f"[checkpoint] fetched {i + 1}/{len(leaves)} leaves "
                  f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)
    return jax.tree_util.tree_unflatten(treedef, out)


class CheckpointManager:
    def __init__(self, directory: str, monitor: str = "recall1",
                 mode: str = "max", save_top_k: int = 1,
                 async_save: bool = False):
        """``async_save``: serialize checkpoints on a background thread
        (orbax async) so long stage-1 epochs never block on IO; ``save``
        returns immediately and consistency is enforced at the next save /
        restore / close."""
        self.monitor = monitor
        self.async_save = async_save
        best_mode = "max" if mode == "max" else "min"
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max(save_top_k, 1),
            best_fn=(lambda metrics: metrics.get(monitor, float("-inf")))
            if best_mode == "max"
            else (lambda metrics: metrics.get(monitor, float("inf"))),
            best_mode=best_mode,
            enable_async_checkpointing=async_save,
        )
        import os
        self.mgr = ocp.CheckpointManager(os.path.abspath(directory),
                                         options=options)
        # Preemption saves go to a sibling manager with plain latest-1
        # retention: saving them through the best-k manager would score
        # them -inf on the monitored metric and GC them immediately.
        self._preempt_dir = os.path.abspath(directory) + "_preempt"
        self._preempt: Optional[ocp.CheckpointManager] = None

    def _preempt_mgr(self) -> ocp.CheckpointManager:
        if self._preempt is None:
            self._preempt = ocp.CheckpointManager(
                self._preempt_dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, enable_async_checkpointing=False))
        return self._preempt

    @classmethod
    def from_config(cls, cfg: TrainConfig, directory: str | None = None
                    ) -> "CheckpointManager":
        mode = "min" if cfg.monitor.endswith("loss") else "max"
        return cls(directory or cfg.checkpoint_dir, monitor=cfg.monitor,
                   mode=mode, save_top_k=cfg.save_top_k,
                   async_save=cfg.async_checkpointing)

    def save(self, step: int, state: Any, metrics: dict[str, float]) -> None:
        self.mgr.save(step, args=ocp.args.StandardSave(_host_state(state)),
                      metrics={k: float(v) for k, v in metrics.items()})
        if not self.async_save:
            self.mgr.wait_until_finished()

    def save_preemption(self, step: int, state: Any) -> None:
        """Persist a resume point outside the best-k retention policy."""
        mgr = self._preempt_mgr()
        mgr.save(step, args=ocp.args.StandardSave(_host_state(state)))
        mgr.wait_until_finished()

    def restore_latest(self, template: Any
                       ) -> tuple[Optional[int], Any, bool]:
        """Returns ``(step, state, preempted)``.  ``preempted`` marks a
        mid-epoch preemption save — the epoch at ``step`` is incomplete and
        must be re-run, unlike an end-of-epoch save (which resumes AFTER
        ``step``)."""
        self.mgr.wait_until_finished()       # flush any in-flight async save
        step = self.mgr.latest_step()
        import os
        p_step = (self._preempt_mgr().latest_step()
                  if os.path.isdir(self._preempt_dir) else None)
        # Prefer the preemption point only when it is strictly newer: a
        # regular checkpoint at the same step was written later in the
        # epoch (post-eval) than a mid-epoch preemption save.
        if p_step is not None and (step is None or p_step > step):
            return p_step, self._preempt_mgr().restore(
                p_step, args=ocp.args.StandardRestore(template)), True
        if step is None:
            return None, template, False
        return step, self.mgr.restore(
            step, args=ocp.args.StandardRestore(template)), False

    def restore_best(self, template: Any) -> tuple[Optional[int], Any]:
        self.mgr.wait_until_finished()       # flush any in-flight async save
        step = self.mgr.best_step()
        if step is None:
            return self.restore_latest(template)
        return step, self.mgr.restore(
            step, args=ocp.args.StandardRestore(template))

    def restore_raw(self, step: Optional[int] = None):
        """Restore without a template (raw pytree of plain arrays) — for
        consumers that only need a subtree (e.g. eval wants just the
        generator params out of a full TrainState)."""
        self.mgr.wait_until_finished()       # flush any in-flight async save
        if step is None:
            step = self.mgr.best_step() or self.mgr.latest_step()
        if step is None:
            return None, None
        return step, self.mgr.restore(step)

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
        if self._preempt is not None:
            self._preempt.close()
