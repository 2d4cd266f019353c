"""Mesh construction and sharding placement.

The reference's only parallelism is Lightning DDP over NCCL
(main.py:86-104); the TPU-native answer is one ``jax.sharding.Mesh`` with a
``dp`` (batch) axis and an ``mp`` (tensor) axis.  Gradients reduce over ICI
via the collectives XLA inserts for sharded SPMD programs — there is no
hand-written all-reduce anywhere.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(replaces DDP's process bootstrap); ``jax.devices()`` then spans hosts and
the same code runs DCN-aware.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdr_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(cfg.mp, 1)
    dp = cfg.dp if cfg.dp > 0 else n // mp
    assert dp * mp == n, f"mesh {dp}x{mp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=tuple(cfg.axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate over mp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with its leading axis sharded over ``dp``.

    Multi-host safe: every process constructs the same *global* batch (the
    iterators are seeded identically, like the reference's
    ``DistributedSampler`` with a shared epoch seed, main_models.py:1990) and
    each process materialises only its addressable shards — the per-process
    data sharding DDP gets from the sampler, without shard files."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, s) for k, v in batch.items()}
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        out[k] = jax.make_array_from_callback(
            v.shape, s, lambda idx, v=v: v[idx])
    return out


def tp_param_rules(mp: int, min_size: int = 1 << 14) -> Callable:
    """Tensor-parallel placement rule: large ≥2-D kernels are sharded on
    their last axis over ``mp`` (column parallel); XLA inserts the matching
    all-gathers/reduce-scatters.  Everything else replicates."""

    def rule(path: tuple, leaf: Any) -> P:
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.size >= min_size and leaf.shape[-1] % mp == 0):
            return P(*([None] * (leaf.ndim - 1) + ["mp"]))
        return P()

    return rule


def shard_params(params: Any, mesh: Mesh,
                 rule: Callable | None = None) -> Any:
    """Place a parameter pytree on the mesh according to ``rule``
    (default: fully replicated)."""
    def place(path, leaf):
        spec = rule(path, leaf) if rule is not None else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def store_sharding(mesh: Mesh) -> NamedSharding:
    """Doc-embedding store: rows sharded over every mesh axis (the store is
    the biggest buffer in the system — it never replicates)."""
    return NamedSharding(mesh, P(("dp", "mp")))
