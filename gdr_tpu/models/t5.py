"""A clean Flax implementation of the T5 encoder-decoder transformer.

This is a ground-up TPU-first implementation of the architecture the
reference consumes through its vendored HuggingFace 3.4.0 fork
(GDR_model/transformers/modeling_t5.py): RMS layer norm, relative position
bias shared across layers, pre-LN blocks, ReLU feed-forward, no biases in
projections, and asymmetric encoder/decoder depth
(ref modeling_t5.py:1201-1219).

Two properties matter for the retrieval workload and differ from the
reference's runtime behavior:

- **Explicit functional KV caches.**  The reference decodes with
  ``use_cache=False`` (main_models.py:1361,1383), re-running the full decoder
  every beam step.  Here every attention layer threads an explicit
  ``(k, v)`` cache so the beam decoder is a ``lax.scan`` whose carried state
  includes the caches — no host sync, no recompute.
- **Static shapes everywhere** so XLA can tile the matmuls on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
NEG_INF = -1e9


class RMSNorm(nn.Module):
    """T5-style layer norm: no mean subtraction, no bias."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale).astype(self.dtype)


def relative_position_bucket(relative_position: Array, bidirectional: bool,
                             num_buckets: int, max_distance: int) -> Array:
    """Standard T5 log-bucketing of relative positions (mem_pos - query_pos)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """Shared relative attention bias (one table per stack, as in T5)."""

    num_heads: int
    num_buckets: int = 32
    max_distance: int = 128
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qlen: int, klen: int, q_offset: Array | int = 0) -> Array:
        """Returns bias [1, heads, qlen, klen].  ``q_offset`` supports
        incremental decoding (query positions start at offset)."""
        table = self.param("rel_embedding", nn.initializers.normal(0.02),
                           (self.num_buckets, self.num_heads), jnp.float32)
        context_pos = jnp.arange(qlen)[:, None] + q_offset
        memory_pos = jnp.arange(klen)[None, :]
        rel = memory_pos - context_pos                     # [qlen, klen]
        buckets = relative_position_bucket(
            rel, self.bidirectional, self.num_buckets, self.max_distance)
        bias = table[buckets]                              # [qlen, klen, heads]
        return jnp.transpose(bias, (2, 0, 1))[None].astype(self.dtype)


class Attention(nn.Module):
    """Multi-head attention with optional explicit KV cache.

    T5 convention: no 1/sqrt(d_kv) query scaling (folded into init).
    """

    d_model: int
    num_heads: int
    d_kv: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self) -> None:
        inner = self.num_heads * self.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                      kernel_init=nn.initializers.normal(0.02),
                                      name=name)
        self.q = dense("q")
        self.k = dense("k")
        self.v = dense("v")
        self.o = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.02), name="o")
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def _split(self, x: Array) -> Array:
        b, l, _ = x.shape
        return x.reshape(b, l, self.num_heads, self.d_kv).transpose(0, 2, 1, 3)

    def _merge(self, x: Array) -> Array:
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def _attend(self, q: Array, k: Array, v: Array, mask: Optional[Array],
                bias: Optional[Array], deterministic: bool) -> Array:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return self.o(self._merge(out))

    def __call__(self, x: Array, kv: Optional[Array] = None,
                 mask: Optional[Array] = None, bias: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """Full (non-incremental) attention.  ``kv`` → cross-attention source.

        mask: broadcastable to [B, 1, Q, K], True = attend.
        """
        src = x if kv is None else kv
        q = self._split(self.q(x))
        k = self._split(self.k(src))
        v = self._split(self.v(src))
        return self._attend(q, k, v, mask, bias, deterministic)

    def precompute_kv(self, kv_src: Array) -> tuple[Array, Array]:
        """Project a cross-attention source once (e.g. encoder output)."""
        return self._split(self.k(kv_src)), self._split(self.v(kv_src))

    def cross_decode_grouped(self, x_t: Array, k: Array, v: Array,
                             key_mask: Array, num_beams: int,
                             bias_row: Optional[Array] = None) -> Array:
        """Beam-grouped cross-attention: queries [B·K, 1, d] attend to
        *per-query* K/V [B, H, S, dk] — encoder projections are computed and
        stored once per query instead of duplicated per beam (K× less HBM
        traffic and projection FLOPs at beam 100).
        ``bias_row``: [1, H, 1, S] relative bias for this decode position."""
        b = k.shape[0]
        q = self._split(self.q(x_t))                       # [B*K, H, 1, dk]
        q = q.reshape(b, num_beams, self.num_heads, self.d_kv)
        scores = jnp.einsum("bkhd,bhsd->bkhs", q, k,
                            preferred_element_type=jnp.float32)
        if bias_row is not None:
            # [1, H, 1, S] → [1, 1, H, S]
            scores = scores + bias_row[:, :, 0][:, None].astype(jnp.float32)
        scores = jnp.where(key_mask[:, None, None, :].astype(bool),
                           scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bkhs,bhsd->bkhd", probs, v)
        out = out.reshape(b * num_beams, 1, self.num_heads * self.d_kv)
        return self.o(out)

    def decode_step(self, x_t: Array, cache_k: Array, cache_v: Array,
                    pos: Array, key_mask: Optional[Array] = None,
                    bias_row: Optional[Array] = None,
                    update_cache: bool = True) -> tuple[Array, Array, Array]:
        """One-token attention against a cache.

        x_t: [B, 1, d_model]; pos: scalar int.
        If ``update_cache`` (causal self-attention), the cache is
        **time-major** ``[Lmax, rows, H·d_kv]`` — last dim a lane multiple
        and rows a sublane multiple, so the buffer carries ZERO physical
        tile padding.  (The naive ``[rows, H, Lmax, d_kv]`` layout pads its
        last two dims to the (16, 128) bf16 tile — up to 8× the HBM
        footprint and traffic, which made cache reads/reorders dominate the
        beam step; benchmarks/profile_reorder.py.)  The new token's k/v are
        written at ``pos`` and attention spans positions ≤ pos.

        Otherwise the cache is a fixed cross-attention source
        [B, H, S, d_kv] masked by ``key_mask`` [B, S].
        ``bias_row``: [1, H, 1, Lmax] relative bias for this step.
        Returns (out [B,1,d_model], cache_k, cache_v).
        """
        if update_cache:
            # fused QKV: one [rows, d]·[d, 3·inner] matmul instead of three —
            # the decode step is dispatch/bandwidth-bound, not FLOPs-bound,
            # so fewer+fatter matmuls win; the kernel concat is loop-
            # invariant and hoisted out of the decode while_loop by XLA
            w = jnp.concatenate(
                [self.q.variables["params"]["kernel"],
                 self.k.variables["params"]["kernel"],
                 self.v.variables["params"]["kernel"]], axis=1)
            inner = self.num_heads * self.d_kv
            qkv = jnp.dot(x_t[:, 0], w.astype(x_t.dtype))  # [rows, 3·inner]
            q = qkv[:, :inner].reshape(-1, self.num_heads, self.d_kv)
            cache_k = jax.lax.dynamic_update_slice_in_dim(
                cache_k, qkv[None, :, inner:2 * inner], pos, axis=0)
            cache_v = jax.lax.dynamic_update_slice_in_dim(
                cache_v, qkv[None, :, 2 * inner:], pos, axis=0)
            lmax = cache_k.shape[0]
            k = cache_k.reshape(lmax, -1, self.num_heads, self.d_kv)
            v = cache_v.reshape(lmax, -1, self.num_heads, self.d_kv)
            scores = jnp.einsum("rhd,lrhd->rhl", q, k,
                                preferred_element_type=jnp.float32)
            if bias_row is not None:
                # [1, H, 1, L] → [1, H, L], broadcast over rows
                scores = scores + bias_row[0, :, 0][None].astype(jnp.float32)
            causal = jnp.arange(lmax) <= pos
            scores = jnp.where(causal[None, None, :], scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum("rhl,lrhd->rhd", probs, v)
            out = out.reshape(-1, 1, inner)
            return self.o(out), cache_k, cache_v
        q = self._split(self.q(x_t))                       # [B, H, 1, dk]
        mask = None
        if key_mask is not None:
            mask = key_mask[:, None, None, :].astype(bool)
        out = self._attend(q, cache_k, cache_v, mask, bias_row, True)
        return out, cache_k, cache_v


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.02), name="wi")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.02), name="wo")(h)


class EncoderBlock(nn.Module):
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    dropout_rate: float = 0.0
    layer_norm_epsilon: float = 1e-6
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.ln1 = RMSNorm(self.layer_norm_epsilon, self.dtype)
        self.attn = Attention(self.d_model, self.num_heads, self.d_kv,
                              self.dropout_rate, self.dtype)
        self.ln2 = RMSNorm(self.layer_norm_epsilon, self.dtype)
        self.ff = FeedForward(self.d_model, self.d_ff, self.dropout_rate, self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x: Array, mask: Optional[Array], bias: Optional[Array],
                 deterministic: bool = True) -> Array:
        h = self.attn(self.ln1(x), mask=mask, bias=bias, deterministic=deterministic)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.ff(self.ln2(x), deterministic=deterministic)
        return x + self.drop(h, deterministic=deterministic)


class DecoderBlock(nn.Module):
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    dropout_rate: float = 0.0
    layer_norm_epsilon: float = 1e-6
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.ln1 = RMSNorm(self.layer_norm_epsilon, self.dtype)
        self.self_attn = Attention(self.d_model, self.num_heads, self.d_kv,
                                   self.dropout_rate, self.dtype)
        self.ln2 = RMSNorm(self.layer_norm_epsilon, self.dtype)
        self.cross_attn = Attention(self.d_model, self.num_heads, self.d_kv,
                                    self.dropout_rate, self.dtype)
        self.ln3 = RMSNorm(self.layer_norm_epsilon, self.dtype)
        self.ff = FeedForward(self.d_model, self.d_ff, self.dropout_rate, self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x: Array, enc: Array, self_mask: Optional[Array],
                 cross_mask: Optional[Array], bias: Optional[Array],
                 cross_bias: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        h = self.self_attn(self.ln1(x), mask=self_mask, bias=bias,
                           deterministic=deterministic)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.cross_attn(self.ln2(x), kv=enc, mask=cross_mask,
                            bias=cross_bias, deterministic=deterministic)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.ff(self.ln3(x), deterministic=deterministic)
        return x + self.drop(h, deterministic=deterministic)

    def decode_step(self, x_t: Array, self_k: Array, self_v: Array,
                    cross_k: Array, cross_v: Array, enc_mask: Array,
                    pos: Array, bias_row: Optional[Array],
                    num_beams: int = 1,
                    cross_bias_row: Optional[Array] = None
                    ) -> tuple[Array, Array, Array]:
        h, self_k, self_v = self.self_attn.decode_step(
            self.ln1(x_t), self_k, self_v, pos, bias_row=bias_row,
            update_cache=True)
        x_t = x_t + h
        h = self.cross_attn.cross_decode_grouped(
            self.ln2(x_t), cross_k, cross_v, enc_mask, num_beams,
            bias_row=cross_bias_row)
        x_t = x_t + h
        h = self.ff(self.ln3(x_t), deterministic=True)
        return x_t + h, self_k, self_v


class Encoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    dropout_rate: float = 0.0
    layer_norm_epsilon: float = 1e-6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dtype: Any = jnp.float32
    remat: bool = False

    def setup(self) -> None:
        self.rel_bias = RelativePositionBias(
            self.num_heads, self.relative_attention_num_buckets,
            self.relative_attention_max_distance, bidirectional=True,
            dtype=self.dtype)
        # rematerialize block activations in the backward pass when asked —
        # trades recompute FLOPs for HBM (jax.checkpoint via flax lifting)
        block_cls = (nn.remat(EncoderBlock, static_argnums=(3,))
                     if self.remat else EncoderBlock)
        self.blocks = [
            block_cls(self.d_model, self.num_heads, self.d_kv, self.d_ff,
                      self.dropout_rate, self.layer_norm_epsilon, self.dtype,
                      name=f"block_{i}")
            for i in range(self.num_layers)
        ]
        self.final_norm = RMSNorm(self.layer_norm_epsilon, self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x: Array, attn_mask: Array,
                 deterministic: bool = True) -> Array:
        """x: embedded inputs [B, L, d]; attn_mask: [B, L] (1 = real token)."""
        l = x.shape[1]
        bias = self.rel_bias(l, l)
        mask = attn_mask[:, None, None, :].astype(bool)
        x = self.drop(x, deterministic=deterministic)
        for blk in self.blocks:
            x = blk(x, mask, bias, deterministic=deterministic)
        return self.drop(self.final_norm(x), deterministic=deterministic)


class Decoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_kv: int
    d_ff: int
    dropout_rate: float = 0.0
    layer_norm_epsilon: float = 1e-6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dtype: Any = jnp.float32
    remat: bool = False

    def setup(self) -> None:
        self.rel_bias = RelativePositionBias(
            self.num_heads, self.relative_attention_num_buckets,
            self.relative_attention_max_distance, bidirectional=False,
            dtype=self.dtype)
        # HF-3.4-era T5 (the reference's vendored fork) also gives the
        # cross-attention a relative position bias, shared from layer 0
        # (decoder.block.0.layer.1.EncDecAttention.relative_attention_bias)
        # — removed in modern T5 but part of the model the reference trains.
        # The fork constructs it bidirectional (T5LayerCrossAttention passes
        # is_bidirectional=True, modeling_t5.py:464).
        self.cross_rel_bias = RelativePositionBias(
            self.num_heads, self.relative_attention_num_buckets,
            self.relative_attention_max_distance, bidirectional=True,
            dtype=self.dtype)
        block_cls = (nn.remat(DecoderBlock, static_argnums=(6,))
                     if self.remat else DecoderBlock)
        self.blocks = [
            block_cls(self.d_model, self.num_heads, self.d_kv, self.d_ff,
                      self.dropout_rate, self.layer_norm_epsilon, self.dtype,
                      name=f"block_{i}")
            for i in range(self.num_layers)
        ]
        self.final_norm = RMSNorm(self.layer_norm_epsilon, self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x: Array, enc: Array, self_attn_mask: Array,
                 enc_mask: Array, deterministic: bool = True) -> Array:
        """Full teacher-forced decode.

        x: embedded decoder inputs [B, L, d]; self_attn_mask: [B, L];
        enc: [B, S, d]; enc_mask: [B, S].
        """
        l = x.shape[1]
        bias = self.rel_bias(l, l)
        cross_bias = self.cross_rel_bias(l, enc.shape[1])
        causal = jnp.tril(jnp.ones((l, l), dtype=bool))
        self_mask = causal[None, None] & self_attn_mask[:, None, None, :].astype(bool)
        cross_mask = enc_mask[:, None, None, :].astype(bool)
        x = self.drop(x, deterministic=deterministic)
        for blk in self.blocks:
            x = blk(x, enc, self_mask, cross_mask, bias, cross_bias,
                    deterministic=deterministic)
        return self.drop(self.final_norm(x), deterministic=deterministic)

    # ---- incremental decoding ----------------------------------------------

    def init_cache(self, batch: int, max_len: int, enc: Array,
                   num_beams: int = 1) -> dict[str, Array]:
        """Build the functional cache pytree: per-layer self k/v buffers
        (batch·num_beams rows) and cross-attention k/v projected once per
        *query* from the un-expanded encoder output.

        Conventions: keys starting with ``cross_`` are beam-invariant — the
        beam search must not gather them on beam reorder; keys starting with
        ``tm_`` are **time-major** [Lmax, rows, features] (tile-padding-free,
        see :meth:`Attention.decode_step`) and are reordered along axis 1.
        """
        cache = {}
        inner = self.num_heads * self.d_kv
        for i, blk in enumerate(self.blocks):
            ck, cv = blk.cross_attn.precompute_kv(enc)
            cache[f"tm_self_k_{i}"] = jnp.zeros(
                (max_len, batch * num_beams, inner), self.dtype)
            cache[f"tm_self_v_{i}"] = jnp.zeros(
                (max_len, batch * num_beams, inner), self.dtype)
            cache[f"cross_k_{i}"] = ck
            cache[f"cross_v_{i}"] = cv
        return cache

    def decode_step(self, x_t: Array, cache: dict[str, Array], enc_mask: Array,
                    pos: Array, num_beams: int = 1, fused: bool = False
                    ) -> tuple[Array, dict[str, Array]]:
        """One decode step.  x_t: [B·K, 1, d] embedded token at position pos;
        enc_mask: [B, S] (per query, un-expanded).

        ``fused``: run each sublayer as one fused Pallas kernel
        (ops/pallas/decode_kernel.py) — same math and rounding points, but
        activations stay in VMEM, the self-attention runs bf16-in /
        f32-accumulate without the cache-wide f32 convert XLA emits for its
        tiny-output einsum, and the carried caches keep a single layout
        across steps (XLA's lowering layout-flips every cache every step —
        profile_trace.py round 3)."""
        lmax = cache["tm_self_k_0"].shape[0]
        bias_row = self.rel_bias(1, lmax, q_offset=pos)    # [1, H, 1, Lmax]
        cross_bias_row = self.cross_rel_bias(
            1, cache["cross_k_0"].shape[2], q_offset=pos)  # [1, H, 1, S]
        cache = dict(cache)
        if fused:
            from gdr_tpu.ops.pallas.decode_kernel import fused_step_supported
            fused = fused_step_supported(
                x_t.shape[0], d=self.d_model, d_ff=self.d_ff,
                heads=self.num_heads, d_kv=self.d_kv, lmax=lmax)
        if fused:
            return self._decode_step_fused(x_t, cache, enc_mask, pos,
                                           num_beams, bias_row,
                                           cross_bias_row)
        for i, blk in enumerate(self.blocks):
            x_t, sk, sv = blk.decode_step(
                x_t, cache[f"tm_self_k_{i}"], cache[f"tm_self_v_{i}"],
                cache[f"cross_k_{i}"], cache[f"cross_v_{i}"], enc_mask,
                pos, bias_row, num_beams, cross_bias_row)
            cache[f"tm_self_k_{i}"] = sk
            cache[f"tm_self_v_{i}"] = sv
        return self.final_norm(x_t), cache

    def _decode_step_fused(self, x_t, cache, enc_mask, pos, num_beams,
                           bias_row, cross_bias_row):
        from gdr_tpu.ops.pallas.decode_kernel import (cross_attn_sublayer,
                                                      ffn_sublayer,
                                                      self_attn_sublayer)
        interp = jax.default_backend() != "tpu"
        b, s = enc_mask.shape
        bias_self = jnp.transpose(bias_row[0, :, 0]).astype(jnp.float32)
        cross_bias = (jnp.broadcast_to(
            cross_bias_row[0, :, 0][None], (b, self.num_heads, s))
            .astype(jnp.float32)
            + jnp.where(enc_mask[:, None, :].astype(bool), 0.0, NEG_INF))
        x = x_t[:, 0]
        for i, blk in enumerate(self.blocks):
            att = blk.self_attn
            p = lambda m: m.variables["params"]["kernel"]
            wqkv = jnp.concatenate([p(att.q), p(att.k), p(att.v)], axis=1)
            x, sk, sv = self_attn_sublayer(
                x, pos, blk.ln1.variables["params"]["scale"], wqkv,
                p(att.o), bias_self,
                cache[f"tm_self_k_{i}"], cache[f"tm_self_v_{i}"],
                heads=self.num_heads, d_kv=self.d_kv, interpret=interp)
            cache[f"tm_self_k_{i}"] = sk
            cache[f"tm_self_v_{i}"] = sv
            x = cross_attn_sublayer(
                x, blk.ln2.variables["params"]["scale"],
                p(blk.cross_attn.q), p(blk.cross_attn.o),
                cache[f"cross_k_{i}"], cache[f"cross_v_{i}"], cross_bias,
                num_beams, heads=self.num_heads, d_kv=self.d_kv,
                interpret=interp)
            ffp = blk.ff.variables["params"]
            x = ffn_sublayer(x, blk.ln3.variables["params"]["scale"],
                             ffp["wi"]["kernel"], ffp["wo"]["kernel"],
                             interpret=interp)
        return self.final_norm(x[:, None]), cache
