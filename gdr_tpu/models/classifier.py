"""Encoder-only classification mode (the reference's ``--softmax`` path).

Ref: with ``args.softmax`` the decoder collapses to depth 0 and a linear
head over the encoder's first position classifies into ``num_cls`` classes
(main_models.py:749 ``num_decoder_layers=0``, :822 ``self.fc``, loss at
:1224-1226, argmax step ``_softmax_generative_step`` :1286-1300).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdr_tpu.config import ModelConfig
from gdr_tpu.models.t5 import Encoder

Array = jax.Array


class EncoderClassifier(nn.Module):
    cfg: ModelConfig
    num_cls: int
    dtype: Any = jnp.float32

    def setup(self) -> None:
        c = self.cfg
        self.shared = nn.Embed(c.vocab_size, c.d_model,
                               embedding_init=nn.initializers.normal(1.0),
                               dtype=self.dtype, name="shared")
        self.encoder = Encoder(
            num_layers=c.num_layers, d_model=c.d_model, num_heads=c.num_heads,
            d_kv=c.d_kv, d_ff=c.d_ff, dropout_rate=c.dropout_rate,
            layer_norm_epsilon=c.layer_norm_epsilon, dtype=self.dtype,
            name="encoder")
        self.fc = nn.Dense(self.num_cls, dtype=self.dtype, name="fc")

    def __call__(self, input_ids: Array, attn_mask: Array,
                 deterministic: bool = True) -> Array:
        enc = self.encoder(self.shared(input_ids), attn_mask,
                           deterministic=deterministic)
        return self.fc(enc[:, 0]).astype(jnp.float32)

    def predict(self, input_ids: Array, attn_mask: Array) -> Array:
        """argmax class (ref _softmax_generative_step)."""
        return jnp.argmax(self(input_ids, attn_mask), axis=-1)
