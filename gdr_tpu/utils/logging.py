"""Metric logging: JSONL always; TensorBoard / Weights & Biases optional.

The reference hardwires a wandb API key into main.py:30 and falls back to
TensorBoard (main.py:482-486).  Here the primary sink is an append-only JSONL
file (machine-readable, survives any environment); wandb/TB attach only when
available and requested.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Optional


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "run",
                 use_wandb: bool = False, use_tensorboard: bool = False,
                 config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.metrics.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._wandb = None
        self._tb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project="gdr_tpu", name=run_name,
                                         config=config or {})
            except Exception as e:  # wandb missing/offline: JSONL still works
                print(f"wandb unavailable: {e}", file=sys.stderr)
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, run_name))
            except Exception as e:
                print(f"tensorboard unavailable: {e}", file=sys.stderr)

    def log(self, metrics: dict[str, Any], step: int) -> None:
        row = {"step": int(step), "time": time.time()}
        row.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._fh.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
