"""Multi-learning-rate AdamW with the reference's parameter grouping.

The reference builds six AdamW param groups (main_models.py:1920-1975):
{T5 encoder+shared, T5 decoder side, doc encoder} × {decay, no-decay}, with
LRs ``learning_rate`` / ``decoder_learning_rate`` /
``doc_encoder_learning_rate`` and weight decay skipped on biases and
layer-norm weights.  Schedules: linear warmup+decay or the exponential decay
``((T - x - 0.95) / T) ** 0.1`` (main_models.py:1966-1972).

Implemented as ``optax.multi_transform`` over path-derived labels so the whole
thing remains a single optax transformation inside the jitted train step.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax

from gdr_tpu.config import TrainConfig


def _is_no_decay(path: tuple) -> bool:
    """Biases and (layer/RMS) norm scales are exempt from weight decay
    (ref no_decay = ["bias", "LayerNorm.weight"])."""
    names = [getattr(p, "key", str(p)) for p in path]
    leaf = names[-1] if names else ""
    return leaf in ("bias", "scale")   # scale = RMSNorm / LayerNorm weight


def _group_of(path: tuple) -> str:
    """T5 encoder + shared input embeddings vs. everything decoder-side.

    Mirrors ``n.startswith(("shared.", "encoder."))`` (main_models.py:1926).
    """
    names = [str(getattr(p, "key", p)) for p in path]
    top = names[1] if names and names[0] == "params" else (names[0] if names else "")
    if top in ("shared", "encoder"):
        return "enc"
    return "dec"


def _linear(cfg: TrainConfig, total: int, peak: float) -> Callable:
    warmup = cfg.warmup_steps

    def fn(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        if warmup > 0:
            warm = step / warmup
        else:
            warm = 1.0
        decay = jnp.maximum(0.0, (total - step) / jnp.maximum(total - warmup, 1))
        return peak * jnp.where(step < warmup, warm, decay)

    return fn


def _exp(cfg: TrainConfig, total: int, peak: float) -> Callable:
    def fn(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.maximum((total - step - 0.95) / total, 1e-6)
        return peak * jnp.power(frac, 0.1)

    return fn


def build_optimizer(cfg: TrainConfig, gen_params: Any, enc_params: Any | None,
                    total_steps: int) -> tuple[optax.GradientTransformation, Any]:
    """Returns (optimizer, labels) for the combined
    {"generator": ..., "doc_encoder": ...} parameter tree."""

    def gen_label(path, _):
        g = _group_of(path)
        d = "nd" if _is_no_decay(path) else "wd"
        return f"{g}_{d}"

    def enc_label(path, _):
        d = "nd" if _is_no_decay(path) else "wd"
        return f"doc_{d}"

    labels = {"generator": jax.tree_util.tree_map_with_path(
        lambda p, v: gen_label(p, v), gen_params)}
    if enc_params is not None:
        labels["doc_encoder"] = jax.tree_util.tree_map_with_path(
            lambda p, v: enc_label(p, v), enc_params)

    def adamw(peak, decay):
        sched = (_linear if cfg.scheduler == "linear" else _exp)(
            cfg, total_steps, peak)
        return optax.adamw(learning_rate=sched, eps=cfg.adam_epsilon,
                           weight_decay=decay)

    transforms = {
        "enc_wd": adamw(cfg.learning_rate, cfg.weight_decay),
        "enc_nd": adamw(cfg.learning_rate, 0.0),
        "dec_wd": adamw(cfg.decoder_learning_rate, cfg.weight_decay),
        "dec_nd": adamw(cfg.decoder_learning_rate, 0.0),
        "doc_wd": adamw(cfg.doc_encoder_learning_rate, cfg.weight_decay),
        "doc_nd": adamw(cfg.doc_encoder_learning_rate, 0.0),
    }
    # One global-norm clip over ALL parameters, before the per-group
    # transforms — matching Lightning's gradient_clip_val semantics
    # (a single global norm), not a per-group clip.
    opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                      optax.multi_transform(transforms, labels))
    if cfg.gradient_accumulation_steps > 1:
        # ref derives grad-accum as 8/n_gpu (main.py:410); here any factor
        opt = optax.MultiSteps(opt, cfg.gradient_accumulation_steps)
    return opt, labels
