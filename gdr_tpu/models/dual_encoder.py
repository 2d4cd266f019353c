"""Dual encoder for the dense (fine) stage.

Reference: ``EncoderModel`` (main_models.py:62-109) wraps a
``DPRContextEncoder`` (BERT-base with AR2 weights) as the document tower and
an identity pooling over externally-supplied T5 encoder states as the query
tower.  Here the document tower is a compact BERT-style Flax encoder (learned
positions, post-LN, GELU) with CLS pooling; the query tower stays what it is
in the reference — ``hidden[:, 0]`` of the generative model's encoder
(see ``GenerativeRetriever.query_embedding``).

In stage 1 (epoch ≤ ``train_encoder_epoch``) document embeddings come from a
precomputed store and this module is untouched; in stage 2 the tower is
trained live (ref main_models.py:965-996, 1910-1917).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class BertBlock(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array, deterministic: bool = True) -> Array:
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout_rate, name="attn")(
                x, x, mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln1")(
            x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic))
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")(x)
        h = nn.gelu(h, approximate=False)     # BERT uses exact (erf) GELU
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(h)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln2")(
            x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic))
        return x


class DocEncoder(nn.Module):
    """BERT-style document tower → CLS embedding."""

    vocab_size: int = 30522
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_ff: int = 3072
    max_position: int = 512
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array, attn_mask: Array,
                 deterministic: bool = True) -> Array:
        """input_ids/attn_mask: [B, L] → doc embedding [B, d_model]."""
        l = input_ids.shape[1]
        tok = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                       name="tok_embed")(input_ids)
        pos = nn.Embed(self.max_position, self.d_model, dtype=self.dtype,
                       name="pos_embed")(jnp.arange(l)[None])
        # single-segment inputs: token-type embedding of segment 0 (kept so
        # pretrained BERT/AR2 checkpoints load losslessly)
        typ = nn.Embed(2, self.d_model, dtype=self.dtype,
                       name="type_embed")(jnp.zeros((1, l), jnp.int32))
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         name="embed_ln")(tok + pos + typ)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        mask = attn_mask[:, None, None, :].astype(bool)
        for i in range(self.num_layers):
            x = BertBlock(self.d_model, self.num_heads, self.d_ff,
                          self.dropout_rate, self.dtype, name=f"block_{i}")(
                              x, mask, deterministic=deterministic)
        return x[:, 0]       # CLS pooling (DPR ctx encoder, projection_dim=0)


def tiny_doc_encoder(d_model: int = 32) -> DocEncoder:
    return DocEncoder(vocab_size=512, d_model=d_model, num_layers=2,
                      num_heads=2, d_ff=64, max_position=64)
