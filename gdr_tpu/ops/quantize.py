"""Int8 document-embedding store (memory-pressure configuration).

4× smaller store at equal corpus size — the difference between fitting
MS-MARCO-scale (8.8M × 768) embeddings on a chip or not.  Per-row absmax
symmetric quantization; scoring dequantises on the fly:

    q · (v_int8 · scale) = scale · (q · v_int8)

so the dot product itself can run in int8→int32 on the MXU with one scalar
multiply at the end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


@struct.dataclass
class QuantizedStore:
    values: Array    # int8 [N, d]
    scales: Array    # float32 [N]

    @property
    def shape(self):
        return self.values.shape

    @property
    def num_docs(self) -> int:
        return self.values.shape[0]


def quantize_store(store: np.ndarray | Array) -> QuantizedStore:
    store = jnp.asarray(store, jnp.float32)
    absmax = jnp.max(jnp.abs(store), axis=1)
    scales = jnp.maximum(absmax, 1e-9) / 127.0
    values = jnp.clip(jnp.round(store / scales[:, None]), -127, 127
                      ).astype(jnp.int8)
    return QuantizedStore(values=values, scales=scales)


@struct.dataclass
class PackedQuantizedStore:
    """Cluster-packed int8 store (ops/packed_store.py layout × per-row
    absmax quantization): the memory-pressure configuration at distributed
    scale — 4× less HBM *and* 4× less DMA traffic per contiguous cluster
    slice.  Padded rows carry zero values and zero scale."""

    values: Array    # int8 [M, d] cluster-contiguous
    scales: Array    # float32 [M]

    @property
    def shape(self):
        return self.values.shape


def pack_quantized_rows(store: np.ndarray | Array,
                        row_to_doc: Array) -> PackedQuantizedStore:
    """Quantize then re-lay rows cluster-contiguously (same semantics as
    packed_store.pack_rows; per-row absmax commutes with row permutation)."""
    q = quantize_store(store)
    r = jnp.asarray(row_to_doc)
    safe = jnp.maximum(r, 0)
    real = r >= 0
    values = jnp.where(real[:, None], q.values[safe],
                       jnp.zeros((), jnp.int8))
    scales = jnp.where(real, q.scales[safe], 0.0)
    return PackedQuantizedStore(values=values, scales=scales)


def dequantize_rows(qstore: QuantizedStore, idx: Array) -> Array:
    """Gather + dequantise rows → float32 [..., d]."""
    v = qstore.values[idx].astype(jnp.float32)
    return v * qstore.scales[idx][..., None]


def quantized_dot(query: Array, qstore: QuantizedStore, idx: Array) -> Array:
    """scores[..., c] = query · store[idx[..., c]] with on-the-fly dequant.

    query: [..., d] broadcastable against idx [..., C].
    """
    v = qstore.values[idx]                                 # [..., C, d] int8
    s = qstore.scales[idx]                                 # [..., C]
    raw = jnp.einsum("...d,...cd->...c", query.astype(jnp.float32),
                     v.astype(jnp.float32))
    return raw * s
