"""PAWA — the per-prefix adaptive lm-head ("efficient" variant).

The reference's distinctive decoding head (modeling_t5.py:1229-1244, applied
at 1615-1639): a small transformer decoder runs over the *decode embeddings*
of the emitted prefix, cross-attending to a single learned memory token, and
its output is mapped by a (d_model → d_model·V) linear into an **additive
delta to the lm-head weight matrix for every position**:

    lm_head_weight[b, l] = W.T + reshape(adaptor(prefix)[b, l] @ U, [d, V])
    logits[b, l]         = s[b, l] · lm_head_weight[b, l]

Materialising the [B, L, d, V] delta (as the reference does) is memory-hostile
on TPU; instead we push the decoder state into the contraction first:

    delta[b, l, v] = (A[b,l] ⊗ s[b,l]) · U        # one (B, d²)·(d², V) matmul

which never materialises anything larger than [B, d²] per position and runs
as a single MXU matmul.  See ``delta_logits``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdr_tpu.models.t5 import Attention

Array = jax.Array


class PawaLayer(nn.Module):
    """One adaptor block: causal self-attn → cross-attn(memory) → FF.

    Post-norm residual layout (the reference uses torch's
    ``nn.TransformerDecoderLayer``); biasless projections, T5-style.
    """

    d_model: int
    num_heads: int
    d_ff: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self) -> None:
        d_kv = self.d_model // self.num_heads
        self.self_attn = Attention(self.d_model, self.num_heads, d_kv,
                                   self.dropout_rate, self.dtype)
        self.cross_attn = Attention(self.d_model, self.num_heads, d_kv,
                                    self.dropout_rate, self.dtype)
        # eps matches torch nn.TransformerDecoderLayer's LayerNorm default
        # (1e-5) — the reference's adaptor normalisation (modeling_t5.py:1240)
        self.ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ln3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ff1 = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.02))
        self.ff2 = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.02))
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x: Array, memory: Array, deterministic: bool = True) -> Array:
        l = x.shape[1]
        causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
        h = self.self_attn(x, mask=causal, deterministic=deterministic)
        x = self.ln1(x + self.drop(h, deterministic=deterministic))
        h = self.cross_attn(x, kv=memory, deterministic=deterministic)
        x = self.ln2(x + self.drop(h, deterministic=deterministic))
        h = self.ff2(nn.relu(self.ff1(x)))
        return self.ln3(x + self.drop(h, deterministic=deterministic))

    def memory_out(self, memory: Array) -> Array:
        """Cross-attention to a SINGLE memory token is query-independent:
        softmax over one key is 1, so the sublayer output is exactly
        ``o(v(memory))`` — a constant [1, 1, d] computed once per decode
        instead of four projections per step."""
        return self.cross_attn.o(self.cross_attn.v(memory))

    def decode_step(self, x_t: Array, cache_k: Array, cache_v: Array,
                    mem_out: Array, pos: Array) -> tuple[Array, Array, Array]:
        """``mem_out``: the precomputed :meth:`memory_out` constant."""
        h, cache_k, cache_v = self.self_attn.decode_step(
            x_t, cache_k, cache_v, pos, update_cache=True)
        x_t = self.ln1(x_t + h)
        x_t = self.ln2(x_t + mem_out)
        h = self.ff2(nn.relu(self.ff1(x_t)))
        return self.ln3(x_t + h), cache_k, cache_v


class FullPawaAdaptor(nn.Module):
    """The reference's *slow* PAWA variant (``adaptor_efficient=False``,
    modeling_t5.py:1223-1228, applied 1579-1613): a stack over its own
    embedding table emits, per position, a full [d, d] transform that
    left-multiplies the base lm-head.

    The reference materialises ``lm_head = A_w · Wᵀ`` as [B, L, d, V];
    associativity lets us compute ``s' = s · A_w`` first ([B, L, d]) and
    reuse the base head — no [.., d, V] tensor ever exists.
    """

    d_model: int
    decode_vocab_size: int
    num_layers: int = 4
    num_heads: int = 8
    d_ff: int = 0          # 0 → min(4·d_model, 2048)
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self) -> None:
        d_ff = self.d_ff or min(4 * self.d_model, 2048)
        # separate adaptor embedding table (ref modeling_t5.py:1225)
        self.embed = nn.Embed(self.decode_vocab_size, self.d_model,
                              embedding_init=nn.initializers.normal(1.0),
                              dtype=self.dtype, name="embed")
        self.layers = [
            PawaLayer(self.d_model, self.num_heads, d_ff, self.dropout_rate,
                      self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        # [d, d·d] weight-matrix generator (the parameter-heavy part)
        self.u2 = self.param("u2", nn.initializers.normal(0.02),
                             (self.d_model, self.d_model * self.d_model),
                             jnp.float32)

    def _memory(self, b: int) -> Array:
        # ref cross-attends to zeros (modeling_t5.py:1589) — a no-op through
        # biasless projections, kept for structural parity
        return jnp.zeros((b, 1, self.d_model), self.dtype)

    def __call__(self, decoder_input_ids: Array,
                 deterministic: bool = True) -> Array:
        x = self.embed(decoder_input_ids)
        mem = self._memory(x.shape[0])
        for layer in self.layers:
            x = layer(x, mem, deterministic=deterministic)
        return x * (self.d_model ** -0.5)      # ref scale (:1595)

    def transform(self, adaptor_out: Array, decoder_out: Array) -> Array:
        """s' = s · reshape(A @ U2, [d, d]) per position.  Inputs [B, L, d]
        (or [B, d]); returns same shape."""
        u2 = self.u2.astype(self.dtype)
        d = self.d_model
        single = adaptor_out.ndim == 2
        if single:
            adaptor_out = adaptor_out[:, None]
            decoder_out = decoder_out[:, None]

        def per_position(args):
            a_l, s_l = args
            w = jnp.dot(a_l, u2, preferred_element_type=jnp.float32)
            w = w.reshape(a_l.shape[0], d, d)
            return jnp.einsum("bi,bij->bj", s_l.astype(jnp.float32),
                              w).astype(self.dtype)

        out = jax.lax.map(per_position, (adaptor_out.transpose(1, 0, 2),
                                         decoder_out.transpose(1, 0, 2)))
        out = out.transpose(1, 0, 2)
        return out[:, 0] if single else out

    def init_cache(self, batch: int, max_len: int) -> dict[str, Array]:
        # time-major [Lmax, rows, d] — tile-padding-free (see
        # models/t5.py Attention.decode_step)
        cache = {}
        for i in range(self.num_layers):
            cache[f"tm_pawa_k_{i}"] = jnp.zeros(
                (max_len, batch, self.d_model), self.dtype)
            cache[f"tm_pawa_v_{i}"] = jnp.zeros(
                (max_len, batch, self.d_model), self.dtype)
        return cache

    def decode_step(self, token: Array, cache: dict[str, Array],
                    pos: Array) -> tuple[Array, dict[str, Array]]:
        x = self.embed(token)[:, None]
        mem = self._memory(1)
        cache = dict(cache)
        for i, layer in enumerate(self.layers):
            x, ck, cv = layer.decode_step(
                x, cache[f"tm_pawa_k_{i}"], cache[f"tm_pawa_v_{i}"],
                layer.memory_out(mem), pos)
            cache[f"tm_pawa_k_{i}"] = ck
            cache[f"tm_pawa_v_{i}"] = cv
        return x * (self.d_model ** -0.5), cache


class PawaAdaptor(nn.Module):
    """The adaptor stack plus the weight-delta linear ``U``.

    ``__call__`` returns the adaptor hidden states A [B, L, d]; the logit
    delta is computed by :func:`delta_logits` against the decoder output so
    the big contraction can be fused with the lm-head matmul.
    """

    d_model: int
    decode_vocab_size: int
    num_layers: int = 4
    num_heads: int = 8
    d_ff: int = 0          # 0 → min(4·d_model, 2048) (torch TransformerDecoderLayer default)
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self) -> None:
        d_ff = self.d_ff or min(4 * self.d_model, 2048)
        self.memory = self.param("memory", nn.initializers.normal(1.0),
                                 (1, 1, self.d_model), jnp.float32)
        self.layers = [
            PawaLayer(self.d_model, self.num_heads, d_ff, self.dropout_rate,
                      self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        # U: the per-prefix lm-head delta generator, laid out [d_j, V, d_i]
        # so (a) the decode fast path slices the ≤ kary+1 valid vocab blocks
        # of a position with one dynamic slice and (b) the contraction with
        # the adaptor state is ONE [B,d]·[d, (kary+1)·d] MXU matmul instead
        # of kary+1 batched small ones (see delta_candidates).
        self.u = self.param(
            "u", nn.initializers.normal(0.02),
            (self.d_model, self.decode_vocab_size, self.d_model), jnp.float32)

    def __call__(self, decode_embeds: Array, deterministic: bool = True) -> Array:
        """decode_embeds: [B, L, d] (embedded decoder *input* tokens)."""
        b = decode_embeds.shape[0]
        memory = jnp.broadcast_to(
            self.memory.astype(self.dtype), (b, 1, self.d_model))
        x = decode_embeds
        for layer in self.layers:
            x = layer(x, memory, deterministic=deterministic)
        return x

    def init_cache(self, batch: int, max_len: int) -> dict[str, Array]:
        # time-major [Lmax, rows, d] — tile-padding-free (see
        # models/t5.py Attention.decode_step)
        cache = {}
        for i in range(self.num_layers):
            cache[f"tm_pawa_k_{i}"] = jnp.zeros(
                (max_len, batch, self.d_model), self.dtype)
            cache[f"tm_pawa_v_{i}"] = jnp.zeros(
                (max_len, batch, self.d_model), self.dtype)
        return cache

    def decode_step(self, embed_t: Array, cache: dict[str, Array],
                    pos: Array) -> tuple[Array, dict[str, Array]]:
        """One incremental adaptor step.  embed_t: [B, 1, d].

        XLA-only by decision: fused Pallas sublayers for this adaptor were
        built, hardware-profiled twice, and measured SLOWER than XLA's own
        fusion of the same math (48.2 vs 45.5 ms/exec at the beam-100
        operating point; remaining small-fusion upside ~7.4 ms — see
        PARITY.md "fused PAWA"), so the kernels were removed.  The decoder
        sublayer kernels (fused_decode) remain — those measured faster."""
        memory = self.memory.astype(self.dtype)          # [1, 1, d]
        cache = dict(cache)
        x = embed_t
        for i, layer in enumerate(self.layers):
            x, ck, cv = layer.decode_step(
                x, cache[f"tm_pawa_k_{i}"], cache[f"tm_pawa_v_{i}"],
                layer.memory_out(memory), pos)
            cache[f"tm_pawa_k_{i}"] = ck
            cache[f"tm_pawa_v_{i}"] = cv
        return x, cache

    def delta_logits(self, adaptor_out: Array, decoder_out: Array) -> Array:
        """Σ_ij A[...,j]·s[...,i]·U[j,v,i] without the [.., L, d, V] blow-up.

        All positions batch into ONE pass over U: G = A @ U as a single
        [B·L, d]·[d, V·d] MXU matmul, then a per-position matvec with the
        decoder states.  One U read forward and one dU accumulation backward
        — a position-serial ``lax.map`` re-reads the (178M-param at t5-base)
        U tensor and re-accumulates its gradient every position, which
        measured as ~36% of the whole train step
        (benchmarks/profile_train.py).  The live intermediate is [B·L, V·d]
        in model dtype instead of the reference's [B, L, d, V] fp32
        (modeling_t5.py:1636-1639).

        adaptor_out (A), decoder_out (s): [B, L, d] (or [B, d] for one step).
        Returns [B, L, V] (resp. [B, V]).
        """
        d = self.d_model
        v = self.decode_vocab_size
        u_flat = self.u.astype(self.dtype).reshape(d, v * d)

        single = adaptor_out.ndim == 2
        if single:
            adaptor_out = adaptor_out[:, None]
            decoder_out = decoder_out[:, None]
        b, l, _ = adaptor_out.shape
        g = jnp.dot(adaptor_out.reshape(b * l, d), u_flat,
                    preferred_element_type=self.dtype)
        g = g.reshape(b, l, v, d)
        out = jnp.einsum("blvi,bli->blv", g, decoder_out,
                         preferred_element_type=jnp.float32
                         ).astype(self.dtype)
        return out[:, 0] if single else out

    def label_delta(self, adaptor_out: Array, labels: Array) -> Array:
        """Per-position head-weight delta vectors for given tokens:
        Δ[b,l,i] = Σ_j A[b,l,j]·U[j, labels[b,l], i] — the row of the adapted
        lm-head (ref ``lm_head_weight``, modeling_t5.py:1728-1752) that scores
        the label token.  Used by weight distillation.  Position-serial map
        keeps the live gather at [B, d, d] instead of [B, L, d, d].

        adaptor_out: [B, L, d]; labels: [B, L] int.  Returns [B, L, d]."""
        u = self.u.astype(self.dtype)                        # [d, V, d]

        def per_pos(args):
            a_l, t_l = args                                  # [B, d], [B]
            u_sel = jnp.take(u, t_l, axis=1)                 # [d, B, d]
            return jnp.einsum("bj,jbi->bi", a_l, u_sel,
                              preferred_element_type=jnp.float32)

        out = jax.lax.map(per_pos, (adaptor_out.transpose(1, 0, 2),
                                    labels.T.astype(jnp.int32)))
        return out.transpose(1, 0, 2).astype(self.dtype)

    def delta_candidates_all(self, adaptor_out: Array, decoder_out: Array,
                             kary: int) -> Array:
        """Teacher-forced candidate deltas for EVERY position at once:
        the training-path counterpart of :meth:`delta_candidates`.

        The positional codec gives position ``l`` the contiguous digit block
        ``l·kary+2 …`` of U, so the per-position valid slices stack into one
        strided view ``U[:, 2:2+L·kary, :] → [d, L, kary·d]`` and the delta
        for all valid slots is an L-batched [B,d]·[d,kary·d] matmul — the
        full-vocab ``delta_logits`` pipeline (G = [B·L, V·d], 297 MB live at
        t5-base, plus its backward twin and layout copies; ~10 ms of the
        60 ms train step, profile_trace.py) computes a 10× superset whose
        extra columns the positional mask provably zeroes out of every loss.

        adaptor_out (A), decoder_out (s): [B, L, d].
        Returns [B, L, kary+1] (digit slots…, EOS)."""
        d = self.d_model
        u = self.u.astype(self.dtype)                        # [d, V, d]
        b, l, _ = adaptor_out.shape
        u_dig = jax.lax.slice_in_dim(u, 2, 2 + l * kary, axis=1)
        u_dig = u_dig.reshape(d, l, kary * d)
        g = jnp.einsum("bli,ilk->blk", adaptor_out, u_dig,
                       preferred_element_type=self.dtype)
        g = g.reshape(b, l, kary, d)
        dig = jnp.einsum("blkd,bld->blk", g, decoder_out,
                         preferred_element_type=jnp.float32)
        ae = jnp.einsum("bli,id->bld", adaptor_out, u[:, 1, :],
                        preferred_element_type=self.dtype)   # EOS block
        eos = jnp.einsum("bld,bld->bl", ae, decoder_out,
                         preferred_element_type=jnp.float32)
        return jnp.concatenate([dig, eos[..., None]], axis=-1)

    def delta_candidates(self, adaptor_out: Array, decoder_out: Array,
                         first_token: Array, kary: int) -> Array:
        """Decode fast path: delta for ONLY the step-local candidate tokens.

        The positional codec makes a step's valid tokens contiguous
        (``first_token .. first_token+kary-1``) plus EOS, so the relevant
        slice of U is one dynamic slice along the vocab axis —
        ``(kary+1)/V`` of the full bandwidth and FLOPs (≈ 1/10 at the
        reference operating point of kary 30, depth 10) — and the whole
        delta is one fat [B,d]·[d,(kary+1)·d] matmul.

        adaptor_out/decoder_out: [B, d].  Returns [B, kary+1] (digits, EOS).
        """
        u = self.u.astype(self.dtype)                        # [d, V, d]
        d = self.d_model
        b = adaptor_out.shape[0]
        u_dig = jax.lax.dynamic_slice_in_dim(u, first_token, kary, axis=1)
        u_eos = u[:, 1:2, :]                                 # EOS block
        u_cand = jnp.concatenate([u_dig, u_eos], axis=1)     # [d, kary+1, d]
        # g in model dtype (the [B, kary+1, d] intermediate dominates the
        # step's HBM traffic at bf16 serving); fp32 accumulation at the end
        g = jnp.dot(adaptor_out, u_cand.reshape(d, (kary + 1) * d),
                    preferred_element_type=self.dtype)
        g = g.reshape(b, kary + 1, d)
        return jnp.einsum("bvi,bi->bv", g, decoder_out,
                          preferred_element_type=jnp.float32)

    def candidate_table(self, max_len: int, kary: int) -> Array:
        """Per-position candidate slices of U, precomputed once per decode.

        ``delta_candidates`` dynamic-slices the (d·V·d — 178M-param at
        t5-base) U tensor by a traced position every step, which forces XLA
        to materialise a layout copy of the WHOLE tensor each retrieval exec
        (~1.1 ms device time for a bf16 t5-base U, profile_trace.py).  The
        decode only ever needs the ``max_len`` static slices
        ``U[:, l·kary+2 : l·kary+2+kary, :]`` + the EOS block, so stack them
        once — static slices fuse straight off the parameter with no full
        copy — and index the stack by position inside the decode loop.

        Returns [max_len, d, (kary+1)·d] in model dtype.
        """
        u = self.u.astype(self.dtype)                        # [d, V, d]
        d = self.d_model
        u_eos = u[:, 1:2, :]
        rows = []
        for l in range(max_len):
            first = l * kary + 2
            u_dig = jax.lax.slice_in_dim(u, first, first + kary, axis=1)
            rows.append(jnp.concatenate([u_dig, u_eos], axis=1)
                        .reshape(d, (kary + 1) * d))
        return jnp.stack(rows)

    def delta_candidates_from_table(self, adaptor_out: Array,
                                    decoder_out: Array, table: Array,
                                    pos: Array, kary: int) -> Array:
        """``delta_candidates`` against a precomputed :meth:`candidate_table`
        row — identical math (same slice values, same contraction order),
        none of the per-step dynamic slicing of the full U."""
        d = self.d_model
        b = adaptor_out.shape[0]
        u_cand = jax.lax.dynamic_index_in_dim(table, pos, axis=0,
                                              keepdims=False)
        g = jnp.dot(adaptor_out, u_cand,
                    preferred_element_type=self.dtype)
        g = g.reshape(b, kary + 1, d)
        return jnp.einsum("bvi,bi->bv", g, decoder_out,
                          preferred_element_type=jnp.float32)
