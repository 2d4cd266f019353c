"""Fused gather·dot·tanh scoring kernel for the dense re-rank stage.

XLA's lowering of ``store[docs]`` materialises the gathered candidate
embeddings ([B·K, cap, d] — hundreds of MB at beam 100) in HBM before the
dot product reads them back.  This kernel streams each candidate row
HBM→VMEM exactly once with double-buffered row DMAs (indices arrive via
scalar prefetch) and reduces it against the query on-chip, so candidate
embeddings never round-trip through HBM.

Each grid step owns ``ROWS_PER_BLOCK`` beams (TPU block shapes need the
sublane dimension divisible by 8); per beam, ``chunk`` candidate rows are
DMA'd into one of two VMEM buffers while the other is reduced:
``sim = tanh(q · row)``, masked with −1e9 for padding.  The α-sweep fusion
and final top-k stay in XLA (they touch only [A, B, K·cap] scalars).

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
ROWS_PER_BLOCK = 8
LANE = 128


def rerank_pallas_supported(d: int) -> bool:
    """Can the streaming kernels compile for a store of width ``d`` on TPU?

    Both kernels DMA HBM slices at the store's full lane width; Mosaic
    requires that last-dimension slice to be 128-lane aligned (observed
    hardware failure at d=64: "Slice shape along dimension 1 must be
    aligned to tiling (128)").  Callers fall back to the XLA gather path
    for narrower stores — interpret mode (tests/virtual meshes) is exempt.
    """
    return d % LANE == 0


def _kernel(docs_ref, q_ref, mask_ref, store_ref, out_ref, scratch, sems,
            *, cap: int, chunk: int):
    i = pl.program_id(0)
    n_chunks = cap // chunk

    def row_dma(slot, row, c):
        return pltpu.make_async_copy(
            store_ref.at[docs_ref[i * ROWS_PER_BLOCK + row, c]],
            scratch.at[slot, c % chunk],
            sems.at[slot, c % chunk])

    def start_chunk(slot, row, ci):
        for r in range(chunk):
            row_dma(slot, row, ci * chunk + r).start()

    def wait_chunk(slot, row, ci):
        for r in range(chunk):
            row_dma(slot, row, ci * chunk + r).wait()

    # serial over the block's rows; double-buffered over chunks within a row
    for row in range(ROWS_PER_BLOCK):
        start_chunk(0, row, 0)
        for ci in range(n_chunks):
            slot = ci % 2
            if ci + 1 < n_chunks:
                start_chunk((ci + 1) % 2, row, ci + 1)
            wait_chunk(slot, row, ci)
            rows = scratch[slot].astype(jnp.float32)       # [chunk, d]
            q = q_ref[row, :].astype(jnp.float32)          # [d]
            sims = jnp.tanh(jnp.sum(rows * q[None, :], axis=1))
            ok = mask_ref[row, pl.ds(ci * chunk, chunk)] > 0
            out_ref[row, pl.ds(ci * chunk, chunk)] = jnp.where(
                ok, sims, NEG_INF)


def _packed_kernel(starts_ref, q_ref, store_ref, out_ref, scratch, sems,
                   *, cap: int):
    """One contiguous [cap, d] DMA per beam (cluster-packed store).

    All of a block's DMAs launch up-front (one VMEM slot per row) so the
    per-DMA latency overlaps across the whole block instead of a 2-deep
    pipeline."""
    i = pl.program_id(0)

    def dma(row):
        start = pl.multiple_of(starts_ref[i * ROWS_PER_BLOCK + row], 8)
        return pltpu.make_async_copy(store_ref.at[pl.ds(start, cap)],
                                     scratch.at[row], sems.at[row])

    for row in range(ROWS_PER_BLOCK):
        dma(row).start()
    for row in range(ROWS_PER_BLOCK):
        dma(row).wait()
        block = scratch[row].astype(jnp.float32)           # [cap, d]
        q = q_ref[row, :].astype(jnp.float32)              # [d]
        out_ref[row, :] = jnp.tanh(jnp.sum(block * q[None, :], axis=1))


def packed_scores_pallas(rows: Array, starts: Array, query_rows: Array,
                         cap: int, interpret: bool = False) -> Array:
    """sim[r, c] = tanh(q[r] · rows[starts[r] + c]) for c < cap.

    ``rows``: the cluster-packed store [M, d]; ``starts``: [R] 8-aligned
    block starts per beam; ``query_rows``: [R, d].  Masking of padded rows
    happens in the caller (pads are zero rows → tanh(0)=0, masked later).
    """
    r, d = query_rows.shape
    pad_r = (-r) % ROWS_PER_BLOCK
    if pad_r:
        starts = jnp.pad(starts, (0, pad_r))
        query_rows = jnp.pad(query_rows, ((0, pad_r), (0, 0)))
    r_p = r + pad_r

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_p // ROWS_PER_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_BLOCK, d), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),              # packed store HBM
        ],
        out_specs=pl.BlockSpec((ROWS_PER_BLOCK, cap), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ROWS_PER_BLOCK, cap, d), rows.dtype),
            pltpu.SemaphoreType.DMA((ROWS_PER_BLOCK,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_packed_kernel, cap=cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_p, cap), jnp.float32),
        interpret=interpret,
    )(starts.astype(jnp.int32), query_rows, rows)
    return out[:r]


def _packed_kernel_int8(starts_ref, q_ref, store_ref, out_ref, scratch, sems,
                        *, cap: int):
    """Int8 variant of ``_packed_kernel``: streams [cap, d] *int8* cluster
    blocks (4× less DMA than fp32) and emits the RAW dot — the per-row
    dequantising scale and the tanh apply in the caller, where the packed
    scales are a cheap [R·cap] scalar gather.  Int8 HBM tiles pack 4 rows
    per sublane, so block starts are 32-row aligned (pack_layout align=32).
    """
    i = pl.program_id(0)

    def dma(row):
        start = pl.multiple_of(starts_ref[i * ROWS_PER_BLOCK + row], 32)
        return pltpu.make_async_copy(store_ref.at[pl.ds(start, cap)],
                                     scratch.at[row], sems.at[row])

    for row in range(ROWS_PER_BLOCK):
        dma(row).start()
    for row in range(ROWS_PER_BLOCK):
        dma(row).wait()
        block = scratch[row].astype(jnp.float32)           # [cap, d]
        q = q_ref[row, :].astype(jnp.float32)              # [d]
        out_ref[row, :] = jnp.sum(block * q[None, :], axis=1)


def packed_scores_pallas_int8(values: Array, starts: Array,
                              query_rows: Array, cap: int,
                              interpret: bool = False) -> Array:
    """raw[r, c] = q[r] · values[starts[r] + c] over the int8 packed store.

    Returns the UNSCALED integer dot as float32 — callers multiply by the
    per-row scale and squash (ops/rerank.rerank_packed int8 path).
    ``starts`` must be 32-row aligned (pack_layout(..., align=32))."""
    assert values.dtype == jnp.int8, values.dtype
    r, d = query_rows.shape
    pad_r = (-r) % ROWS_PER_BLOCK
    if pad_r:
        starts = jnp.pad(starts, (0, pad_r))
        query_rows = jnp.pad(query_rows, ((0, pad_r), (0, 0)))
    r_p = r + pad_r

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_p // ROWS_PER_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_BLOCK, d), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),              # int8 store HBM
        ],
        out_specs=pl.BlockSpec((ROWS_PER_BLOCK, cap), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ROWS_PER_BLOCK, cap, d), jnp.int8),
            pltpu.SemaphoreType.DMA((ROWS_PER_BLOCK,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_packed_kernel_int8, cap=cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_p, cap), jnp.float32),
        interpret=interpret,
    )(starts.astype(jnp.int32), query_rows, values)
    return out[:r]


def rerank_scores_pallas(store: Array, docs: Array, query_rows: Array,
                        mask: Array, chunk: int = 8,
                        interpret: bool = False) -> Array:
    """sim[r, c] = tanh(query_rows[r] · store[docs[r, c]]), −1e9 where masked.

    store: [N, d]; docs: [R, cap] int32; query_rows: [R, d]; mask: [R, cap].
    ``cap`` is padded to a multiple of ``chunk`` and ``R`` to a multiple of
    ROWS_PER_BLOCK internally.
    """
    r, cap = docs.shape
    d = store.shape[1]
    pad_c = (-cap) % chunk
    pad_r = (-r) % ROWS_PER_BLOCK
    if pad_c or pad_r:
        docs = jnp.pad(docs, ((0, pad_r), (0, pad_c)))
        mask = jnp.pad(mask, ((0, pad_r), (0, pad_c)))
        query_rows = jnp.pad(query_rows, ((0, pad_r), (0, 0)))
    cap_p = cap + pad_c
    r_p = r + pad_r

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_p // ROWS_PER_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_BLOCK, d), lambda i, docs: (i, 0),
                         memory_space=pltpu.VMEM),          # query rows
            pl.BlockSpec((ROWS_PER_BLOCK, cap_p), lambda i, docs: (i, 0),
                         memory_space=pltpu.VMEM),          # mask rows
            pl.BlockSpec(memory_space=pl.ANY),              # store stays HBM
        ],
        out_specs=pl.BlockSpec((ROWS_PER_BLOCK, cap_p), lambda i, docs: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), store.dtype),
            pltpu.SemaphoreType.DMA((2, chunk)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cap=cap_p, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_p, cap_p), jnp.float32),
        interpret=interpret,
    )(docs.astype(jnp.int32), query_rows, mask.astype(jnp.int32), store)
    return out[:r, :cap]
