"""Text-to-text T5 for synthetic query generation (docTTTTTquery).

The reference's training data depends on per-document synthetic queries
produced by an *external* docTTTTTquery run via ``t5_mesh_transformer`` on
TPU (README.md:24-52, SURVEY.md §2.1 "Query generation") — the only piece of
its pipeline not in the repo.  Here it is a first-class model family reusing
the same Encoder/Decoder stacks as the retriever, with a sampling decoder
(temperature / top-k) running as a KV-cached ``lax.scan``.

TPU-native twist: generated queries never become strings — they stay token
arrays and feed straight into ``TrainSet`` assembly (no detokenize/retokenize
round-trip).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdr_tpu.config import ModelConfig
from gdr_tpu.models.t5 import Decoder, Encoder

Array = jax.Array
EOS = 1
PAD = 0


class Seq2SeqLM(nn.Module):
    """T5 with a text lm-head (tied to the shared embedding table)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    def setup(self) -> None:
        c = self.cfg
        self.shared = nn.Embed(c.vocab_size, c.d_model,
                               embedding_init=nn.initializers.normal(1.0),
                               dtype=self.dtype, name="shared")
        kw = dict(d_model=c.d_model, num_heads=c.num_heads, d_kv=c.d_kv,
                  d_ff=c.d_ff, dropout_rate=c.dropout_rate,
                  layer_norm_epsilon=c.layer_norm_epsilon,
                  relative_attention_num_buckets=c.relative_attention_num_buckets,
                  relative_attention_max_distance=c.relative_attention_max_distance,
                  dtype=self.dtype)
        self.encoder = Encoder(num_layers=c.num_layers, name="encoder", **kw)
        self.decoder = Decoder(num_layers=c.num_decoder_layers,
                               name="decoder", **kw)

    def _logits(self, hidden: Array) -> Array:
        s = hidden * (self.cfg.d_model ** -0.5)
        w = self.shared.embedding.T.astype(self.dtype)
        return jnp.einsum("...d,dv->...v", s, w,
                          preferred_element_type=jnp.float32)

    def encode(self, input_ids: Array, attn_mask: Array,
               deterministic: bool = True) -> Array:
        return self.encoder(self.shared(input_ids), attn_mask,
                            deterministic=deterministic)

    def __call__(self, input_ids: Array, attn_mask: Array,
                 decoder_input_ids: Array, decoder_attn_mask: Array,
                 deterministic: bool = True) -> Array:
        enc = self.encode(input_ids, attn_mask, deterministic=deterministic)
        hidden = self.decoder(self.shared(decoder_input_ids), enc,
                              decoder_attn_mask, attn_mask,
                              deterministic=deterministic)
        return self._logits(hidden)

    def init_cache(self, enc: Array, max_len: int) -> dict[str, Array]:
        return self.decoder.init_cache(enc.shape[0], max_len, enc)

    def decode_step(self, token: Array, cache: dict[str, Array],
                    enc_mask: Array, pos: Array) -> tuple[Array, dict]:
        x = self.shared(token)[:, None]
        hidden, cache = self.decoder.decode_step(x, cache, enc_mask, pos)
        return self._logits(hidden[:, 0]), cache


def sample(model: Seq2SeqLM, params, input_ids: Array, attn_mask: Array,
           max_len: int, rng: Array, temperature: float = 1.0,
           top_k: int = 0) -> Array:
    """Ancestral sampling with optional top-k truncation.

    Returns token array [B, max_len]; positions after EOS are PAD.
    """
    b = input_ids.shape[0]
    enc = model.apply(params, input_ids, attn_mask, method=model.encode)
    cache = model.apply(params, enc, max_len, method=model.init_cache)

    def step(carry, pos):
        tok, done, cache, rng = carry
        logits, cache = model.apply(params, tok, cache, attn_mask, pos,
                                    method=model.decode_step)
        logits = logits / jnp.maximum(temperature, 1e-6)
        if top_k > 0:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -1e9, logits)
        rng, sub = jax.random.split(rng)
        nxt = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, PAD, nxt)
        done = done | (nxt == EOS)
        return (nxt, done, cache, rng), nxt

    carry = (jnp.full((b,), PAD, jnp.int32), jnp.zeros((b,), bool),
             cache, rng)
    _, toks = jax.lax.scan(step, carry, jnp.arange(max_len))
    return toks.T                                        # [B, max_len]


def make_qg_train_step(model: Seq2SeqLM, opt):
    """Teacher-forced doc→query fine-tuning (the reference finetunes
    docTTTTTquery externally via t5_mesh_transformer, README.md:30-48 —
    here it is one jitted step).

    Batch: doc_tokens/doc_mask [B, S], query_tokens [B, L] (0-padded,
    EOS-terminated).
    """
    import optax

    from gdr_tpu.ops.losses import masked_cross_entropy

    def loss_fn(params, batch, rng):
        q = batch["query_tokens"]
        dec_in = jnp.concatenate(
            [jnp.zeros_like(q[:, :1]), q[:, :-1]], axis=1)
        mask = (q != PAD).astype(jnp.int32)
        logits = model.apply(params, batch["doc_tokens"], batch["doc_mask"],
                             dec_in, mask, deterministic=False,
                             rngs={"dropout": rng})
        return masked_cross_entropy(logits, q, mask)

    @jax.jit
    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def generate_queries(model: Seq2SeqLM, params, doc_tokens: Array,
                     doc_mask: Array, n_per_doc: int, max_len: int,
                     rng: Array, temperature: float = 1.0,
                     top_k: int = 10) -> tuple[Array, Array]:
    """docTTTTTquery: sample ``n_per_doc`` queries per document.

    Returns (query_tokens [B*n, max_len], source_doc_row [B*n]) — ready for
    TrainSet assembly without any string round-trip.
    """
    b = doc_tokens.shape[0]
    docs = jnp.repeat(doc_tokens, n_per_doc, axis=0)
    mask = jnp.repeat(doc_mask, n_per_doc, axis=0)
    out = sample(model, params, docs, mask, max_len, rng,
                 temperature=temperature, top_k=top_k)
    src = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_per_doc)
    return out, src
