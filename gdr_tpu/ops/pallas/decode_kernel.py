"""Fused decoder-sublayer kernels for the beam-decode hot loop.

The XLA lowering of one full-width decode step (rows = B·K = 3,200 at the
reference operating point, 6 decoder layers) spends most of its time NOT on
matmul FLOPs but on the glue between them (profile_trace.py, round 3):

- the self-attention scores einsum ``rhd,lrhd->rhl`` contracts to a tiny
  [rows, H, L≤4] output, so XLA lowers it as an f32 VPU multiply-reduce and
  **converts the whole bf16 KV cache to f32 first** (~590 MB/step);
- the while-loop carry caches ping-pong between two layouts
  ({1,2,0} ↔ {2,1,0}) every step (~1.1 ms/step of pure layout copies);
- every RMSNorm / residual / reshape / mask round-trips the [rows, d]
  activations through HBM (~100 fusions per step at ~5 µs each).

These kernels fuse each decoder sublayer (T5 pre-norm residual blocks,
models/t5.py:278-326) into one Pallas program so activations stay in VMEM,
attention math runs bf16-in/f32-accumulate with no cache conversion, and the
caches are touched exactly twice per step (one strided read for attention,
one row write at ``pos``) in a single layout:

- :func:`self_attn_sublayer` — RMSNorm → fused-QKV matmul → cache row write
  at ``pos`` → causal attention over ≤L cached positions (+rel-bias row) →
  output proj → residual.  The in-place cache update uses input/output
  aliasing; the current position's K/V enter the score from registers, so
  the (stale) row being overwritten is never read.
- :func:`cross_attn_sublayer` — RMSNorm → Q proj → beam-grouped
  cross-attention (per-query K/V [B, H, S, dk], queries grouped K-per-query
  as in ``Attention.cross_decode_grouped``) → output proj → residual.
- :func:`ffn_sublayer` — RMSNorm → wi → ReLU → wo → residual.

Math parity with the XLA path (same op order, same rounding points:
bf16 matmul inputs, f32 accumulation, f32 softmax, probs rounded to bf16
before the value contraction) is asserted by tests/test_decode_kernel.py.
On hardware the two paths differ only by bf16 accumulation order (candidate
logits rms Δ≈0.011 per step at t5-base; K/V caches ≤2 ulps — measured
single-step with identical inputs), so beam sequences can swap at near-ties
on untrained weights; the path is opt-in (EvalConfig.fused_decode).

Measured end-to-end (profile_trace.py retrieve vs retrieve_fused, one v5e
chip, 32 queries/exec, beam 100, t5-base): 60.8 → 51.3 ms/exec (−16%).

Weights are preloaded into VMEM scratch on the first grid step and persist
across row-block iterations (TPU grids are sequential), so each weight is
read from HBM exactly once per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
NEG_INF = -1.0e9


def _pick_block_rows(r: int, start: int, fixed: int, per_row: int,
                     budget: int = 11 << 20) -> int:
    """Pick a row-block size the Mosaic lowering accepts.  Row counts must
    be divisible by 8: a full-array block of e.g. 100 rows satisfies the
    BlockSpec "equal to dims" rule but the kernels' [lmax, rows, inner] VMEM
    scratch then fails deeper in Mosaic ((8,128)-tiling an x100x row dim —
    measured on v5e at batch 1 × beam 100).  Returns the largest 8-divisible
    divisor of ``r`` (≤ start) whose VMEM estimate (``fixed`` weights +
    ``per_row``·rows) fits the soft ``budget``; when none fits the budget,
    the smallest one.  Raises when ``r`` has no 8-divisible divisor — the
    trace-time :func:`fused_step_supported` turns that into an unfused
    fallback before any kernel is built."""
    legal = [b for b in range(8, min(start, r) + 1, 8) if r % b == 0]
    fits = [b for b in legal if fixed + per_row * b <= budget]
    if fits:
        return max(fits)
    if legal:
        return min(legal)             # over soft budget; smallest footprint
    raise ValueError(
        f"fused decode kernel: {r} rows have no 8-divisible block "
        f"(Mosaic requires sublane-tileable row counts). Use a batch×beam "
        f"row count divisible by 8, or disable fused_decode.")


def fused_step_supported(rows: int, *, d: int, d_ff: int, heads: int,
                         d_kv: int, lmax: int) -> bool:
    """Trace-time check that every sublayer kernel of a decode step can pick
    a lowerable block for this (static) row count.  Callers use it to fall
    back to the unfused XLA step instead of failing at compile time (e.g.
    batch 3 × beam 100 = 300 rows: no 8-divisible divisor and the full-array
    FFN block exceeds scoped VMEM)."""
    inner = heads * d_kv
    attn_fixed = (3 * d * inner + inner * d) * 2
    attn_per = (2 * lmax * inner * 2 + 2 * inner * 2 + 3 * inner * 4
                + 4 * d * 2)
    ffn_fixed = 2 * d * d_ff * 2
    ffn_per = d_ff * 4 + d_ff * 2 + 3 * d * 2
    try:
        _pick_block_rows(rows, 512, attn_fixed, attn_per)
        _pick_block_rows(rows, 256, ffn_fixed, ffn_per)
    except ValueError:
        return False
    return True


def _rms(x_ref, scale_ref, eps: float = 1e-6) -> Array:
    """T5 RMSNorm, bit-matching models/t5.py::RMSNorm: f32 mean-square,
    x·rsqrt in f32, ×scale, round to bf16."""
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * scale_ref[:]).astype(x.dtype)


def _softmax_rows(s: Array) -> Array:
    """f32 row softmax (last axis), matching jax.nn.softmax numerics."""
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# --------------------------------------------------------------- self-attn

def _cached_self_attention(xn, dtype, pos, c, rows0, bias_ref,
                           wqkv_hbm, wo_hbm, ck_hbm, cv_hbm, ck_out, cv_out,
                           wqkv_s, wo_s, kall, vall, kloc, vloc, sems,
                           *, heads: int, d_kv: int, lmax: int, rows: int):
    """Shared cached causal-attention core of the decoder and PAWA kernels:
    weight preload (first grid step), fused-QKV matmul on ``xn``, in-place
    K/V cache row write at ``pos``, attention over positions ≤ pos (the
    current position's K/V enter from registers, so the stale cache row is
    never read), output projection.  ``bias_ref``: per-position [L, H] f32
    rel-bias rows, or None.  Returns h = attn·Wo as f32 [rows, d]."""
    inner = heads * d_kv

    @pl.when(c == 0)
    def _preload():
        pltpu.make_async_copy(wqkv_hbm, wqkv_s, sems.at[0]).start()
        pltpu.make_async_copy(wo_hbm, wo_s, sems.at[1]).start()
        pltpu.make_async_copy(wqkv_hbm, wqkv_s, sems.at[0]).wait()
        pltpu.make_async_copy(wo_hbm, wo_s, sems.at[1]).wait()

    # past K/V rows for this block (the row at ``pos`` is stale — masked)
    rd_k = pltpu.make_async_copy(
        ck_hbm.at[:, pl.ds(rows0, rows)], kall, sems.at[2])
    rd_v = pltpu.make_async_copy(
        cv_hbm.at[:, pl.ds(rows0, rows)], vall, sems.at[3])
    rd_k.start()
    rd_v.start()

    qkv = jnp.dot(xn, wqkv_s[:], preferred_element_type=jnp.float32)
    q = qkv[:, :inner].astype(dtype)
    kloc[:] = qkv[:, inner:2 * inner].astype(dtype)
    vloc[:] = qkv[:, 2 * inner:].astype(dtype)

    # write the new K/V rows in place at [pos, rows0:rows0+rows]
    wr_k = pltpu.make_async_copy(
        kloc, ck_out.at[pos, pl.ds(rows0, rows)], sems.at[4])
    wr_v = pltpu.make_async_copy(
        vloc, cv_out.at[pos, pl.ds(rows0, rows)], sems.at[5])
    wr_k.start()
    wr_v.start()

    rd_k.wait()
    rd_v.wait()

    # scores per past position: [rows, H] f32 each (T5: no 1/sqrt(dk))
    k_local = kloc[:]
    scores = []
    for l in range(lmax):
        use_loc = jnp.int32(l) == pos
        s_cols = []
        for h in range(heads):
            sl = slice(h * d_kv, (h + 1) * d_kv)
            k_l = jnp.where(use_loc, k_local[:, sl], kall[l, :, sl])
            qh = q[:, sl].astype(jnp.float32)
            s = jnp.sum(qh * k_l.astype(jnp.float32), axis=-1,
                        keepdims=True)                     # [rows, 1]
            s_cols.append(s)
        s_l = jnp.concatenate(s_cols, axis=1)              # [rows, H]
        if bias_ref is not None:
            s_l = s_l + bias_ref[l][None, :]
        s_l = jnp.where(jnp.int32(l) <= pos, s_l, NEG_INF)
        scores.append(s_l)

    m = scores[0]
    for s_l in scores[1:]:
        m = jnp.maximum(m, s_l)
    exps = [jnp.exp(s_l - m) for s_l in scores]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    # probs rounded to the model dtype before the value contraction,
    # matching the XLA path (t5.py:225)
    probs = [(e / denom).astype(dtype).astype(jnp.float32) for e in exps]

    v_local = vloc[:]
    attn_cols = []
    for h in range(heads):
        sl = slice(h * d_kv, (h + 1) * d_kv)
        acc = jnp.zeros((rows, d_kv), jnp.float32)
        for l in range(lmax):
            use_loc = jnp.int32(l) == pos
            v_l = jnp.where(use_loc, v_local[:, sl], vall[l, :, sl])
            acc = acc + probs[l][:, h:h + 1] * v_l.astype(jnp.float32)
        attn_cols.append(acc.astype(dtype))
    attn = jnp.concatenate(attn_cols, axis=1)              # [rows, inner]

    h_out = jnp.dot(attn, wo_s[:], preferred_element_type=jnp.float32)
    wr_k.wait()
    wr_v.wait()
    return h_out


def _self_attn_kernel(pos_ref, x_ref, ln_ref, bias_ref, wqkv_hbm, wo_hbm,
                      ck_hbm, cv_hbm, out_ref, ck_out, cv_out,
                      wqkv_s, wo_s, kall, vall, kloc, vloc, sems,
                      *, heads: int, d_kv: int, lmax: int, rows: int):
    c = pl.program_id(0)
    pos = pos_ref[0]
    xn = _rms(x_ref, ln_ref)
    y = _cached_self_attention(
        xn, x_ref.dtype, pos, c, c * rows, bias_ref,
        wqkv_hbm, wo_hbm, ck_hbm, cv_hbm, ck_out, cv_out,
        wqkv_s, wo_s, kall, vall, kloc, vloc, sems,
        heads=heads, d_kv=d_kv, lmax=lmax, rows=rows)
    out_ref[:] = x_ref[:] + y.astype(x_ref.dtype)


def self_attn_sublayer(x: Array, pos: Array, ln_scale: Array, wqkv: Array,
                       wo: Array, bias_row: Array, ck: Array, cv: Array,
                       *, heads: int, d_kv: int, block_rows: int = 512,
                       interpret: bool = False
                       ) -> tuple[Array, Array, Array]:
    """x: [R, d] bf16; wqkv: [d, 3·inner]; wo: [inner, d];
    bias_row: [L, H] f32 (rel bias for query position ``pos``);
    ck/cv: [L, R, inner] (updated in place).  Returns (x', ck', cv')."""
    r, d = x.shape
    lmax = ck.shape[0]
    inner = heads * d_kv
    # VMEM-budgeted block size: weights are block-invariant (read once);
    # per-row cost = K/V scratch over lmax positions + local K/V + the f32
    # qkv intermediate + x/xn/out.  v5e scoped vmem is 16 MB — budget 11 MB
    # and leave the rest for Mosaic's own stack (400 rows at t5-base/lmax 4
    # measured 20.4 MB > 16 MB on hardware; 200 rows compiles).
    fixed = (3 * d * inner + inner * d) * 2
    per_row = (2 * lmax * inner * 2 + 2 * inner * 2 + 3 * inner * 4
               + 4 * d * 2)
    block_rows = _pick_block_rows(r, block_rows, fixed, per_row)
    n_blocks = r // block_rows
    kernel = functools.partial(_self_attn_kernel, heads=heads, d_kv=d_kv,
                               lmax=lmax, rows=block_rows)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # pos
            pl.BlockSpec((block_rows, d), lambda c: (c, 0)),       # x
            pl.BlockSpec((1, d), lambda c: (0, 0)),                # ln
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # bias
            pl.BlockSpec(memory_space=pl.ANY),                  # wqkv
            pl.BlockSpec(memory_space=pl.ANY),                  # wo
            pl.BlockSpec(memory_space=pl.ANY),                  # ck
            pl.BlockSpec(memory_space=pl.ANY),                  # cv
        ],
        out_specs=[
            pl.BlockSpec((block_rows, d), lambda c: (c, 0)),       # x'
            pl.BlockSpec(memory_space=pl.ANY),                  # ck'
            pl.BlockSpec(memory_space=pl.ANY),                  # cv'
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, d), x.dtype),
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, 3 * inner), wqkv.dtype),
            pltpu.VMEM((inner, d), wo.dtype),
            pltpu.VMEM((lmax, block_rows, inner), ck.dtype),
            pltpu.VMEM((lmax, block_rows, inner), cv.dtype),
            pltpu.VMEM((block_rows, inner), x.dtype),
            pltpu.VMEM((block_rows, inner), x.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(jnp.reshape(pos.astype(jnp.int32), (1,)), x,
      ln_scale.reshape(1, d).astype(jnp.float32), bias_row,
      wqkv, wo, ck, cv)


# -------------------------------------------------------------- cross-attn

def _cross_attn_kernel(x_ref, ln_ref, bias_ref, ck_ref, cv_ref,
                       wcq_hbm, wco_hbm, out_ref, wcq_s, wco_s, o_s, sems,
                       *, heads: int, d_kv: int, beams: int, q_per: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _preload():
        pltpu.make_async_copy(wcq_hbm, wcq_s, sems.at[0]).start()
        pltpu.make_async_copy(wco_hbm, wco_s, sems.at[1]).start()
        pltpu.make_async_copy(wcq_hbm, wcq_s, sems.at[0]).wait()
        pltpu.make_async_copy(wco_hbm, wco_s, sems.at[1]).wait()

    xn = _rms(x_ref, ln_ref)
    q = jnp.dot(xn, wcq_s[:],
                preferred_element_type=jnp.float32).astype(x_ref.dtype)

    for qq in range(q_per):
        r0 = qq * beams
        for h in range(heads):
            sl = slice(h * d_kv, (h + 1) * d_kv)
            qh = q[r0:r0 + beams, sl]                      # [K, dk] bf16
            k_qh = ck_ref[qq, h]                           # [S, dk] bf16
            s = jax.lax.dot_general(
                qh, k_qh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [K, S]
            s = s + bias_ref[qq, h, 0][None, :]
            p = _softmax_rows(s).astype(x_ref.dtype)
            o = jnp.dot(p, cv_ref[qq, h],
                        preferred_element_type=jnp.float32)
            o_s[r0:r0 + beams, sl] = o.astype(x_ref.dtype)

    y = jnp.dot(o_s[:], wco_s[:], preferred_element_type=jnp.float32)
    out_ref[:] = x_ref[:] + y.astype(x_ref.dtype)


def cross_attn_sublayer(x: Array, ln_scale: Array, wcq: Array, wco: Array,
                        cross_k: Array, cross_v: Array, bias: Array,
                        num_beams: int, *, heads: int, d_kv: int,
                        interpret: bool = False) -> Array:
    """Beam-grouped cross-attention sublayer.

    x: [B·K, d]; cross_k/v: [B, H, S, dk] (per query);
    bias: [B, H, S] f32 — rel-bias row + additive key mask (−1e9 at pads).
    """
    r, d = x.shape
    b, h_, s_, dk = cross_k.shape
    assert r == b * num_beams
    # q_per must give a lowerable row block: q_per·K divisible by 8, or the
    # whole batch in one block (block == full array is legal regardless of
    # divisibility — the batch-1 × beam-100 latency operating point)
    q_per = b
    for cand in range(min(b, max(1, 256 // num_beams)), 0, -1):
        if b % cand == 0 and (cand * num_beams) % 8 == 0:
            q_per = cand
            break
    block_rows = q_per * num_beams
    kernel = functools.partial(_cross_attn_kernel, heads=heads, d_kv=d_kv,
                               beams=num_beams, q_per=q_per)
    return pl.pallas_call(
        kernel,
        grid=(b // q_per,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda c: (c, 0)),       # x
            pl.BlockSpec((1, d), lambda c: (0, 0)),                # ln
            pl.BlockSpec((q_per, h_, 1, s_), lambda c: (c, 0, 0, 0)),  # bias
            pl.BlockSpec((q_per, h_, s_, dk), lambda c: (c, 0, 0, 0)),
            pl.BlockSpec((q_per, h_, s_, dk), lambda c: (c, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),                  # wcq
            pl.BlockSpec(memory_space=pl.ANY),                  # wco
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, heads * d_kv), wcq.dtype),
            pltpu.VMEM((heads * d_kv, d), wco.dtype),
            pltpu.VMEM((block_rows, heads * d_kv), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, ln_scale.reshape(1, d).astype(jnp.float32),
      bias[:, :, None, :].astype(jnp.float32), cross_k, cross_v, wcq, wco)


# --------------------------------------------------------------------- ffn

def _ffn_kernel(x_ref, ln_ref, wi_hbm, wo_hbm, out_ref, wi_s, wo_s, sems):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _preload():
        pltpu.make_async_copy(wi_hbm, wi_s, sems.at[0]).start()
        pltpu.make_async_copy(wo_hbm, wo_s, sems.at[1]).start()
        pltpu.make_async_copy(wi_hbm, wi_s, sems.at[0]).wait()
        pltpu.make_async_copy(wo_hbm, wo_s, sems.at[1]).wait()

    xn = _rms(x_ref, ln_ref)
    h = jnp.dot(xn, wi_s[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h, 0.0).astype(x_ref.dtype)
    y = jnp.dot(h, wo_s[:], preferred_element_type=jnp.float32)
    out_ref[:] = x_ref[:] + y.astype(x_ref.dtype)


def ffn_sublayer(x: Array, ln_scale: Array, wi: Array, wo: Array,
                 *, block_rows: int = 256, interpret: bool = False) -> Array:
    """RMSNorm → wi → ReLU → wo → residual.  x: [R, d]; wi: [d, f];
    wo: [f, d]."""
    r, d = x.shape
    f = wi.shape[1]
    # same scoped-vmem budgeting as self_attn_sublayer: wi/wo scratch is
    # block-invariant; per row the f32 hidden + its bf16 cast dominate
    fixed = 2 * d * f * 2
    per_row = f * 4 + f * 2 + 3 * d * 2
    block_rows = _pick_block_rows(r, block_rows, fixed, per_row)
    return pl.pallas_call(
        _ffn_kernel,
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda c: (c, 0)),
            pl.BlockSpec((1, d), lambda c: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, f), wi.dtype),
            pltpu.VMEM((f, d), wo.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, ln_scale.reshape(1, d).astype(jnp.float32), wi, wo)
