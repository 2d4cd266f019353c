"""Fused gather·dot·tanh scoring kernel for the dense re-rank stage.

XLA's lowering of ``store[docs]`` materialises the gathered candidate
embeddings ([B·K, cap, d] — hundreds of MB at beam 100) in HBM before the
dot product reads them back.  This kernel streams each candidate row
HBM→VMEM exactly once with double-buffered row DMAs (indices arrive via
scalar prefetch) and reduces it against the query on-chip, so candidate
embeddings never round-trip through HBM.

Per grid step (one beam): DMA ``chunk`` rows of the store into one of two
VMEM buffers while the other is reduced: ``sim = tanh(q · row)``, masked
with −1e9 for padding.  The α-sweep fusion and final top-k stay in XLA
(they touch only [A, B, K·cap] scalars).

The store may be fp32 or bf16 (bf16 halves the only real bandwidth term).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
NEG_INF = -1.0e9


def _kernel(docs_ref, q_ref, mask_ref, store_ref, out_ref, scratch, sems,
            *, cap: int, chunk: int):
    i = pl.program_id(0)
    n_chunks = cap // chunk

    def row_dma(slot, c):
        return pltpu.make_async_copy(
            store_ref.at[docs_ref[i, c]],
            scratch.at[slot, c % chunk],
            sems.at[slot, c % chunk])

    def start_chunk(slot, ci):
        for r in range(chunk):
            row_dma(slot, ci * chunk + r).start()

    def wait_chunk(slot, ci):
        for r in range(chunk):
            row_dma(slot, ci * chunk + r).wait()

    start_chunk(0, 0)

    def body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            start_chunk((ci + 1) % 2, ci + 1)

        wait_chunk(slot, ci)
        rows = scratch[slot].astype(jnp.float32)           # [chunk, d]
        q = q_ref[:].astype(jnp.float32)                   # [1, d]
        sims = jnp.sum(rows * q, axis=1)                   # [chunk]
        sims = jnp.tanh(sims)
        ok = mask_ref[0, pl.ds(ci * chunk, chunk)] > 0
        out_ref[0, pl.ds(ci * chunk, chunk)] = jnp.where(ok, sims, NEG_INF)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def rerank_scores_pallas(store: Array, docs: Array, query_rows: Array,
                        mask: Array, chunk: int = 8,
                        interpret: bool = False) -> Array:
    """sim[r, c] = tanh(query_rows[r] · store[docs[r, c]]), −1e9 where masked.

    store: [N, d]; docs: [R, cap] int32; query_rows: [R, d]; mask: [R, cap].
    ``cap`` is padded to a multiple of ``chunk`` internally.
    """
    r, cap = docs.shape
    d = store.shape[1]
    pad = (-cap) % chunk
    if pad:
        docs = jnp.pad(docs, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    cap_p = cap + pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i, docs: (i, 0),
                         memory_space=pltpu.VMEM),          # query row
            pl.BlockSpec((1, cap_p), lambda i, docs: (i, 0),
                         memory_space=pltpu.VMEM),          # mask row
            pl.BlockSpec(memory_space=pl.ANY),                # store stays HBM
        ],
        out_specs=pl.BlockSpec((1, cap_p), lambda i, docs: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), store.dtype),
            pltpu.SemaphoreType.DMA((2, chunk)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cap=cap_p, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, cap_p), jnp.float32),
        interpret=interpret,
    )(docs.astype(jnp.int32), query_rows, mask.astype(jnp.int32), store)
    return out[:, :cap]
