import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.models.ensemble import (ensemble_logits, init_ensemble,
                                     member_params, merge_retrievals,
                                     split_params)
from gdr_tpu.models.gdr import GenerativeRetriever, shift_right

CFG = tiny_config(kary=3, max_output_length=5)
MCFG = dataclasses.replace(CFG.model, dropout_rate=0.0)


def test_ensemble_matches_per_member_forward():
    model = GenerativeRetriever(MCFG)
    n = 3
    enc_side, dec_stacked = init_ensemble(model, jax.random.PRNGKey(0), n)
    rng = np.random.default_rng(0)
    b, s, L = 2, 8, MCFG.max_output_length
    ids = jnp.asarray(rng.integers(2, 100, size=(b, s)), jnp.int32)
    attn = jnp.ones((b, s), jnp.int32)
    labels = np.zeros((n, b, L), np.int32)
    for i in range(n):
        for j in range(b):
            digits = rng.integers(0, MCFG.kary, size=2)
            toks = [p * MCFG.kary + int(d) + 2 for p, d in enumerate(digits)] + [1]
            labels[i, j, :len(toks)] = toks
    labels = jnp.asarray(labels)
    lmask = (labels != 0).astype(jnp.int32)

    stacked_logits = ensemble_logits(model, enc_side, dec_stacked, ids, attn,
                                     labels, lmask)
    assert stacked_logits.shape == (n, b, L, MCFG.decode_vocab_size)

    # member 1 standalone must match its ensemble row
    p1 = member_params(enc_side, dec_stacked, 1)
    out = model.apply(p1, ids, attn, shift_right(labels[1]), lmask[1])
    np.testing.assert_allclose(np.asarray(stacked_logits[1]),
                               np.asarray(out["logits"]),
                               rtol=2e-3, atol=2e-3)
    # distinct decoders → distinct logits
    assert not np.allclose(np.asarray(stacked_logits[0]),
                           np.asarray(stacked_logits[1]))


def test_split_merge_roundtrip():
    model = GenerativeRetriever(MCFG)
    from gdr_tpu.models.gdr import init_params
    params = init_params(model, jax.random.PRNGKey(0))
    enc, dec = split_params(params)
    assert "encoder" in enc and "shared" in enc
    assert "decoder" in dec and "pawa" in dec and "decode_embed" in dec


def test_merge_retrievals():
    docs = [["a", "b", "c"], ["b", "d"]]
    scores = [[0.9, 0.5, 0.1], [0.7, 0.6]]
    merged = merge_retrievals(docs, scores, top_k=3)
    assert merged == ["a", "b", "d"]   # b keeps its best score (0.7)
