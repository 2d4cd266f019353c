"""The GDR generative retriever: T5 + positional decode head + PAWA.

Re-designs the reference's customised ``T5ForConditionalGeneration``
(modeling_t5.py:1153-1752) as one Flax module:

- separate decode-embedding table of size ``decode_vocab_size``
  (ref modeling_t5.py:1185-1194), optionally tied to the lm-head;
- asymmetric encoder/decoder depth;
- PAWA adaptive lm-head (ref :1229-1244, 1615-1639);
- positional-validity logit mask added to the logits in both training and
  inference (ref :1279-1301, 1643-1646);
- explicit-cache incremental ``decode_step`` used by the `lax.scan` beam
  search (the reference decodes cache-less, its main latency sink —
  SURVEY.md §6 defect 6).

The query representation for the dense stage is the encoder's first-position
hidden state (ref EncoderModel.encode_query, main_models.py:102-109).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gdr_tpu.config import ModelConfig
from gdr_tpu.models.pawa import FullPawaAdaptor, PawaAdaptor
from gdr_tpu.models.t5 import Decoder, Encoder
from gdr_tpu.ops.masks import positional_logit_mask

Array = jax.Array


class GenerativeRetriever(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        c = self.cfg
        self.shared = nn.Embed(c.vocab_size, c.d_model,
                               embedding_init=nn.initializers.normal(1.0),
                               dtype=self.dtype, name="shared")
        self.encoder = Encoder(
            num_layers=c.num_layers, d_model=c.d_model, num_heads=c.num_heads,
            d_kv=c.d_kv, d_ff=c.d_ff, dropout_rate=c.dropout_rate,
            layer_norm_epsilon=c.layer_norm_epsilon,
            relative_attention_num_buckets=c.relative_attention_num_buckets,
            relative_attention_max_distance=c.relative_attention_max_distance,
            dtype=self.dtype, remat=c.remat, name="encoder")
        self.decode_embed = nn.Embed(
            c.decode_vocab_size, c.d_model,
            embedding_init=nn.initializers.normal(1.0),
            dtype=self.dtype, name="decode_embed")
        self.decoder = Decoder(
            num_layers=c.num_decoder_layers, d_model=c.d_model,
            num_heads=c.num_heads, d_kv=c.d_kv, d_ff=c.d_ff,
            dropout_rate=c.dropout_rate,
            layer_norm_epsilon=c.layer_norm_epsilon,
            relative_attention_num_buckets=c.relative_attention_num_buckets,
            relative_attention_max_distance=c.relative_attention_max_distance,
            dtype=self.dtype, remat=c.remat, name="decoder")
        if not c.tie_decode_embedding:
            self.lm_head = self.param(
                "lm_head", nn.initializers.normal(0.02),
                (c.d_model, c.decode_vocab_size), jnp.float32)
        if c.encoder_d_model != c.d_model:
            # The reference relies on T5-base and the AR2 doc tower sharing
            # d=768; when the spaces differ we project the query rep into the
            # document-embedding space.
            self.query_proj = nn.Dense(c.encoder_d_model, use_bias=False,
                                       dtype=self.dtype, name="query_proj")
        if c.adaptor_decode:
            pawa_cls = PawaAdaptor if c.adaptor_efficient else FullPawaAdaptor
            self.pawa = pawa_cls(
                d_model=c.d_model, decode_vocab_size=c.decode_vocab_size,
                num_layers=c.adaptor_layer_num, num_heads=c.adaptor_num_heads,
                d_ff=c.adaptor_d_ff, dropout_rate=c.dropout_rate,
                dtype=self.dtype, name="pawa")
        if c.denoising:
            # mask-position discrimination head; the reconstruction head is
            # tied to the shared embedding (ref modeling_t5.py:1261-1264)
            self.denoise_disc = nn.Dense(2, use_bias=False, dtype=self.dtype,
                                         name="denoise_disc")
        if c.concate_fusion:
            # "concate" query fusion (ref fusion_strategy, used at
            # main_models.py:1561-1562; the fusion_layer itself is commented
            # out of the reference model at :797 — first-class here)
            self.fusion = nn.Dense(c.encoder_d_model, dtype=self.dtype,
                                   name="fusion")
        # [L, V] additive −1e9 validity mask (0 on valid entries)
        self.logit_mask = jnp.asarray(
            positional_logit_mask(c.kary, c.max_output_length, c.position))

    # ------------------------------------------------------------------ utils

    def _head_weight(self) -> Array:
        """Base lm-head weight [d_model, V] (tied → decode embedding table)."""
        if self.cfg.tie_decode_embedding:
            return self.decode_embed.embedding.T.astype(self.dtype)
        return self.lm_head.astype(self.dtype)

    # ------------------------------------------------------------- main paths

    def encode(self, input_ids: Array, attn_mask: Array,
               deterministic: bool = True) -> Array:
        x = self.shared(input_ids)
        return self.encoder(x, attn_mask, deterministic=deterministic)

    def query_embedding(self, enc: Array) -> Array:
        """Dense-stage query rep: first-position encoder state
        (ref main_models.py:102-109, use_query_embed_encoder path),
        projected if the doc-embedding space has a different width."""
        return self.project_query(enc[:, 0])

    def project_query(self, q: Array) -> Array:
        if self.cfg.encoder_d_model != self.cfg.d_model:
            q = self.query_proj(q)
        return q

    def pool_query(self, enc: Array, decoder_hidden: Array,
                   decoder_attn_mask: Array) -> Array:
        """Dense-stage query rep per ``cfg.query_source``
        (ref main_models.py:998-1056): encoder CLS, masked decoder mean, or
        the decoder state at the EOS position."""
        src = self.cfg.query_source
        if src == "encoder":
            q = enc[:, 0]
        elif src == "decoder_avg":
            m = decoder_attn_mask.astype(jnp.float32)[..., None]
            q = (decoder_hidden * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        elif src == "decoder_special":
            # last unmasked position = the EOS slot
            last = jnp.maximum(
                decoder_attn_mask.astype(jnp.int32).sum(axis=1) - 1, 0)
            q = jnp.take_along_axis(decoder_hidden,
                                    last[:, None, None], axis=1)[:, 0]
        else:
            raise ValueError(f"unknown query_source {src}")
        return self.project_query(q)

    def fuse_queries(self, q_dec: Array, q_enc: Array) -> Array:
        """Learned fusion of decoder-side and encoder query reps
        (fusion_strategy "concate"): Dense over their concatenation.
        Inputs broadcast-compatible [..., d']; returns [..., d']."""
        return self.fusion(jnp.concatenate(
            [q_dec, jnp.broadcast_to(q_enc, q_dec.shape)], axis=-1))

    def decode_hidden(self, enc: Array, enc_mask: Array,
                      decoder_input_ids: Array,
                      decoder_attn_mask: Array) -> Array:
        """Decoder hidden states only (no lm-head/PAWA) — used by the eval
        path that re-runs generated sequences to pool decoder-side query
        representations (ref main_models.py:1464-1571)."""
        x = self.decode_embed(decoder_input_ids)
        return self.decoder(x, enc, decoder_attn_mask, enc_mask,
                            deterministic=True)

    def decode_logits(self, enc: Array, enc_mask: Array,
                      decoder_input_ids: Array, decoder_attn_mask: Array,
                      deterministic: bool = True) -> tuple[Array, Array]:
        """Teacher-forced decode → (masked logits [B, L, V], dec hidden [B, L, d])."""
        c = self.cfg
        x = self.decode_embed(decoder_input_ids)
        hidden = self.decoder(x, enc, decoder_attn_mask, enc_mask,
                              deterministic=deterministic)
        s = hidden * (c.d_model ** -0.5)        # ref modeling_t5.py:1577
        if c.adaptor_decode and not c.adaptor_efficient:
            # slow variant: per-prefix [d,d] transform replaces the head input
            a = self.pawa(decoder_input_ids, deterministic=deterministic)
            s_t = self.pawa.transform(a, s)
            logits = jnp.einsum("bld,dv->blv", s_t, self._head_weight(),
                                preferred_element_type=jnp.float32)
        else:
            logits = jnp.einsum("bld,dv->blv", s, self._head_weight(),
                                preferred_element_type=jnp.float32)
            if c.adaptor_decode:
                a = self.pawa(x, deterministic=deterministic)
                logits = logits + self.pawa.delta_logits(a, s).astype(jnp.float32)
        logits = logits + self.logit_mask[None, : logits.shape[1]]
        return logits, hidden

    def decode_candidate_logits(self, enc: Array, enc_mask: Array,
                                decoder_input_ids: Array,
                                decoder_attn_mask: Array,
                                deterministic: bool = True
                                ) -> tuple[Array, Array]:
        """Teacher-forced decode restricted to each position's VALID slots.

        Position ``l`` can only emit its ``kary`` digit tokens or EOS (the
        positional mask −1e9s everything else), so training losses only ever
        read a [B, L, kary+1] slice of the [B, L, V] logits.  Computing just
        that slice keeps softmax support — hence CE/KL values and gradients
        — bit-comparable to the masked full-vocab path while cutting the
        PAWA delta and head to 1/(V/(kary+1)) ≈ 1/10 of the work at the
        reference operating point (see ``PawaAdaptor.delta_candidates_all``).
        Slot layout: [digit 0 … digit kary-1, EOS]; the final model position
        admits only EOS (ref modeling_t5.py:1296).  Requires the efficient
        adaptor (or none) — the slow variant keeps the full path.

        Returns (candidate logits [B, L, kary+1] fp32, dec hidden [B, L, d]).
        """
        c = self.cfg
        kary = c.kary
        assert not (c.adaptor_decode and not c.adaptor_efficient), (
            "candidate-sliced head requires the efficient PAWA adaptor")
        x = self.decode_embed(decoder_input_ids)
        hidden = self.decoder(x, enc, decoder_attn_mask, enc_mask,
                              deterministic=deterministic)
        s = hidden * (c.d_model ** -0.5)
        l = s.shape[1]
        w = self._head_weight()                              # [d, V]
        w_dig = jax.lax.slice_in_dim(w, 2, 2 + l * kary, axis=1)
        cand = jnp.einsum("bld,dlk->blk", s, w_dig.reshape(-1, l, kary),
                          preferred_element_type=jnp.float32)
        eos = jnp.einsum("bld,d->bl", s, w[:, 1],
                         preferred_element_type=jnp.float32)
        cand = jnp.concatenate([cand, eos[..., None]], axis=-1)
        if c.adaptor_decode:
            a = self.pawa(x, deterministic=deterministic)
            cand = cand + self.pawa.delta_candidates_all(a, s, kary)
        # final position admits only EOS (mask row L-1, masks.py)
        last = jnp.arange(l) == c.max_output_length - 1
        cand = cand.at[:, :, :kary].add(
            jnp.where(last, -1e9, 0.0)[None, :, None])
        return cand, hidden

    def __call__(self, input_ids: Array, attn_mask: Array,
                 decoder_input_ids: Array, decoder_attn_mask: Array,
                 deterministic: bool = True,
                 sliced_head: bool = False) -> dict[str, Array]:
        enc = self.encode(input_ids, attn_mask, deterministic=deterministic)
        if sliced_head:
            logits, dec_hidden = self.decode_candidate_logits(
                enc, attn_mask, decoder_input_ids, decoder_attn_mask,
                deterministic=deterministic)
        else:
            logits, dec_hidden = self.decode_logits(
                enc, attn_mask, decoder_input_ids, decoder_attn_mask,
                deterministic=deterministic)
        return {
            "logits": logits,
            "decoder_hidden": dec_hidden,
            "encoder_hidden": enc,
            "query_embedding": self.pool_query(enc, dec_hidden,
                                               decoder_attn_mask),
        }

    def init_all(self, input_ids: Array, attn_mask: Array,
                 decoder_input_ids: Array, decoder_attn_mask: Array):
        """Init-time method touching every optional head so the parameter
        tree is complete regardless of which losses a train step uses."""
        out = self.__call__(input_ids, attn_mask, decoder_input_ids,
                            decoder_attn_mask)
        if self.cfg.denoising:
            keep = jnp.ones_like(input_ids, dtype=bool)
            self.denoise(input_ids, attn_mask, keep, jax.random.PRNGKey(0))
        if self.cfg.concate_fusion:
            q = out["query_embedding"]
            self.fuse_queries(q, q)
        return out

    def label_head_vectors(self, decoder_input_ids: Array, labels: Array,
                           deterministic: bool = True) -> Array:
        """Adapted lm-head vectors for the label tokens (weight-distillation
        path, ref modeling_t5.py:1704-1717): base head row + the PAWA delta
        row for each position's label, projected into the doc-embedding
        space when it differs from d_model.  Requires the efficient adaptor.

        decoder_input_ids/labels: [B, L].  Returns [B, L, encoder_d_model]."""
        c = self.cfg
        assert c.adaptor_decode and c.adaptor_efficient, (
            "weight distillation requires the efficient PAWA adaptor")
        x = self.decode_embed(decoder_input_ids)
        a = self.pawa(x, deterministic=deterministic)
        base = jnp.take(self._head_weight().T, labels.astype(jnp.int32),
                        axis=0)                              # [B, L, d]
        vec = base + self.pawa.label_delta(a, labels)
        return self.project_query(vec)

    def denoise(self, input_ids: Array, attn_mask: Array, keep_mask: Array,
                rng: Array, deterministic: bool = True) -> tuple[Array, Array]:
        """Denoising auxiliary losses (ref modeling_t5.py:1466-1501):
        reconstruction of masked inputs (head tied to shared embeddings) and
        discrimination of corrupted positions."""
        from gdr_tpu.ops.losses import denoising_losses

        def enc(ids):
            return self.encoder(self.shared(ids), attn_mask,
                                deterministic=deterministic)

        def predict_head(hidden):
            w = self.shared.embedding.T.astype(self.dtype)
            return jnp.einsum("bsd,dv->bsv", hidden * (self.cfg.d_model ** -0.5),
                              w, preferred_element_type=jnp.float32)

        return denoising_losses(enc, predict_head, self.denoise_disc,
                                input_ids, attn_mask, keep_mask, rng)

    # ----------------------------------------------------- incremental decode

    def init_cache(self, enc: Array, max_len: int,
                   num_beams: int = 1) -> dict[str, Array]:
        """``enc``: un-expanded [B, S, d]; self/PAWA caches get B·K rows,
        cross-attention K/V stay per-query (``cross_*`` convention)."""
        b = enc.shape[0]
        cache = self.decoder.init_cache(b, max_len, enc, num_beams)
        if self.cfg.adaptor_decode:
            cache.update(self.pawa.init_cache(b * num_beams, max_len))
        return cache

    def decode_tables(self, max_len: int) -> Array:
        """Precomputed per-position U candidate slices (see
        ``PawaAdaptor.candidate_table``).  Built ONCE per parameter set
        OUTSIDE the per-batch retrieval jit and threaded into the decode as
        the beam-invariant ``cross_ucand`` cache entry: computing it (or
        dynamic-slicing U directly) inside the retrieval graph makes XLA
        materialise a layout copy of the whole [d, V, d] U every execution
        (~1.1 ms device at t5-base bf16, profile_trace.py)."""
        return self.pawa.candidate_table(max_len, self.cfg.kary)

    def decode_step(self, token: Array, cache: dict[str, Array],
                    enc_mask: Array, pos: Array,
                    num_beams: int = 1) -> tuple[Array, dict[str, Array]]:
        """One beam-search step over the full decode vocabulary.

        token: [B·K] int32 tokens at position ``pos`` (decoder *inputs*).
        Returns masked logits [B·K, V] predicting position ``pos`` and the
        updated cache.  (The beam decoder uses :meth:`decode_step_candidates`
        — this full-V variant exists for parity testing and unconstrained
        decoding.)
        """
        c = self.cfg
        x = self.decode_embed(token)[:, None]              # [B, 1, d]
        hidden, cache = self.decoder.decode_step(x, cache, enc_mask, pos,
                                                 num_beams)
        s = hidden[:, 0] * (c.d_model ** -0.5)             # [B, d]
        if c.adaptor_decode and not c.adaptor_efficient:
            a_t, cache = self.pawa.decode_step(token, cache, pos)
            s_t = self.pawa.transform(a_t[:, 0], s)
            logits = jnp.dot(s_t, self._head_weight(),
                             preferred_element_type=jnp.float32)
        else:
            logits = jnp.dot(s, self._head_weight(),
                             preferred_element_type=jnp.float32)
            if c.adaptor_decode:
                a_t, cache = self.pawa.decode_step(x, cache, pos)
                logits = logits + self.pawa.delta_logits(
                    a_t[:, 0], s).astype(jnp.float32)
        logits = logits + jax.lax.dynamic_index_in_dim(
            self.logit_mask, pos, axis=0, keepdims=False)
        return logits, cache

    def decode_step_candidates(self, token: Array, cache: dict[str, Array],
                               enc_mask: Array, pos: Array,
                               num_beams: int = 1,
                               return_hidden: bool = False,
                               fused: bool = False):
        """Decode fast path: logits for ONLY the step's candidate tokens.

        With the positional codec, position ``pos`` can emit exactly the
        contiguous token block ``pos·kary+2 …`` plus EOS — so the lm-head and
        the PAWA delta are computed against a ``kary+1``-column slice instead
        of the whole decode vocabulary (≈ V/(kary+1) ≈ 10× less head
        bandwidth+FLOPs at kary 30 / depth 10).  Softmax over these columns
        equals full-vocab softmax restricted to them, because the positional
        mask (ref modeling_t5.py:1279-1301) makes every other column −1e9.

        Returns candidate logits [B·K, kary+1] (digits…, EOS) and the cache;
        with ``return_hidden`` also the raw decoder hidden state [B·K, d]
        (post final-norm, pre d^-0.5 scaling) so the beam search can pool
        decoder-side query representations in its carry instead of re-running
        the decoder over every finished beam (ref main_models.py:1464-1571).
        """
        c = self.cfg
        kary = c.kary
        x = self.decode_embed(token)[:, None]
        hidden, cache = self.decoder.decode_step(x, cache, enc_mask, pos,
                                                 num_beams, fused=fused)
        s = hidden[:, 0] * (c.d_model ** -0.5)             # [B, d]
        first = pos * kary + 2
        head_rows = self._head_weight().T                  # [V, d]
        w_dig = jax.lax.dynamic_slice_in_dim(head_rows, first, kary, axis=0)
        w_cand = jnp.concatenate([w_dig, head_rows[1][None]], axis=0)
        if c.adaptor_decode and not c.adaptor_efficient:
            a_t, cache = self.pawa.decode_step(token, cache, pos)
            s_t = self.pawa.transform(a_t[:, 0], s)
            cand = jnp.einsum("bd,vd->bv", s_t, w_cand,
                              preferred_element_type=jnp.float32)
        else:
            cand = jnp.einsum("bd,vd->bv", s, w_cand,
                              preferred_element_type=jnp.float32)
            if c.adaptor_decode:
                a_t, cache = self.pawa.decode_step(x, cache, pos)
                if "cross_ucand" in cache:
                    cand = cand + self.pawa.delta_candidates_from_table(
                        a_t[:, 0], s, cache["cross_ucand"], pos, kary)
                else:
                    cand = cand + self.pawa.delta_candidates(
                        a_t[:, 0], s, first, kary)
        # final position admits only EOS (ref modeling_t5.py:1296)
        last = pos >= c.max_output_length - 1
        digit_mask = jnp.where(last, -1e9, 0.0)
        cand = cand.at[:, :kary].add(digit_mask)
        if return_hidden:
            return cand, hidden[:, 0], cache
        return cand, cache


def shift_right(labels: Array, start_token: int = 0) -> Array:
    """Labels → decoder inputs (decoder_start_token_id=0, ref main_models.py:754)."""
    return jnp.concatenate(
        [jnp.full_like(labels[:, :1], start_token), labels[:, :-1]], axis=1)


def init_params(model: GenerativeRetriever, rng: jax.Array,
                input_len: int = 8) -> dict:
    c = model.cfg
    dummy_inp = jnp.zeros((2, input_len), jnp.int32)
    dummy_dec = jnp.zeros((2, c.max_output_length), jnp.int32)
    mask = jnp.ones_like(dummy_inp)
    dec_mask = jnp.ones_like(dummy_dec)
    return model.init({"params": rng}, dummy_inp, mask, dummy_dec, dec_mask,
                      method=model.init_all)
