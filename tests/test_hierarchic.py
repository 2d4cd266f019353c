import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.models.gdr import GenerativeRetriever, shift_right
from gdr_tpu.models.hierarchic import (_with_decoder, _index,
                                       hierarchic_decode_step,
                                       hierarchic_logits, init_hierarchic)

CFG = tiny_config(kary=3, max_output_length=5)
MCFG = dataclasses.replace(CFG.model, dropout_rate=0.0)
DEPTH = 3


def _world():
    model = GenerativeRetriever(MCFG)
    base, stacked = init_hierarchic(model, jax.random.PRNGKey(0), DEPTH)
    rng = np.random.default_rng(0)
    b, s, L = 2, 8, MCFG.max_output_length
    ids = jnp.asarray(rng.integers(2, 100, size=(b, s)), jnp.int32)
    attn = jnp.ones((b, s), jnp.int32)
    labels = np.zeros((b, L), np.int32)
    for i in range(b):
        digits = rng.integers(0, MCFG.kary, size=3)
        toks = [p * MCFG.kary + int(d) + 2 for p, d in enumerate(digits)] + [1]
        labels[i, :len(toks)] = toks
    labels = jnp.asarray(labels)
    return model, base, stacked, ids, attn, labels, (labels != 0).astype(jnp.int32)


def test_hierarchic_logits_positional_routing():
    model, base, stacked, ids, attn, labels, lmask = _world()
    out = hierarchic_logits(model, base, stacked, ids, attn, labels, lmask)
    L, V = MCFG.max_output_length, MCFG.decode_vocab_size
    assert out.shape == (2, L, V)

    # position p must equal the per-member forward at position p
    enc = model.apply(_with_decoder(base, _index(stacked, 0)), ids, attn,
                      method=model.encode)
    dec_in = shift_right(labels)
    for p, member in [(0, 0), (1, 1), (2, 2), (4, DEPTH - 1)]:
        logits_m, _ = model.apply(_with_decoder(base, _index(stacked, member)),
                                  enc, attn, dec_in, lmask,
                                  method=model.decode_logits)
        np.testing.assert_allclose(np.asarray(out[:, p]),
                                   np.asarray(logits_m[:, p]),
                                   rtol=2e-4, atol=2e-4)


def test_hierarchic_decode_step_matches_training_row():
    model, base, stacked, ids, attn, labels, lmask = _world()
    full = hierarchic_logits(model, base, stacked, ids, attn, labels, lmask)
    enc = model.apply(_with_decoder(base, _index(stacked, 0)), ids, attn,
                      method=model.encode)
    dec_in = shift_right(labels)
    for pos in [0, 1, 2]:
        step = hierarchic_decode_step(model, base, stacked, dec_in, enc,
                                      attn, jnp.asarray(pos), DEPTH)
        np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, pos]),
                                   rtol=2e-3, atol=2e-3)
