"""Parity tests for the fused decoder-sublayer Pallas kernels
(ops/pallas/decode_kernel.py) against the XLA reference path
(models/t5.py DecoderBlock.decode_step), in interpreter mode on CPU.

The kernels claim math parity with the XLA path (same rounding points:
bf16 matmul inputs, f32 accumulation/softmax, probs rounded to bf16 before
the value contraction) — tolerances here are accordingly tight.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gdr_tpu.models.t5 import Decoder
from gdr_tpu.ops.pallas.decode_kernel import (cross_attn_sublayer,
                                              ffn_sublayer,
                                              self_attn_sublayer)

D, HEADS, DKV, DFF, S = 64, 4, 16, 128, 12
NL, LMAX = 2, 4
B, K = 2, 8
R = B * K


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    dec = Decoder(num_layers=NL, d_model=D, num_heads=HEADS, d_kv=DKV,
                  d_ff=DFF, dtype=jnp.bfloat16)
    enc = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(B, LMAX, D)), jnp.int32) * 0
    params = dec.init(jax.random.PRNGKey(0),
                      jnp.asarray(rng.normal(size=(B, LMAX, D)),
                                  jnp.bfloat16),
                      enc, jnp.ones((B, LMAX), jnp.int32),
                      jnp.ones((B, S), jnp.int32))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    cache = dec.apply(params, B, LMAX, enc, K, method=dec.init_cache)
    # fill caches with two prior positions of realistic values
    for i in range(NL):
        for nm in (f"tm_self_k_{i}", f"tm_self_v_{i}"):
            filled = rng.normal(size=cache[nm].shape).astype(np.float32)
            cache[nm] = jnp.asarray(filled, cache[nm].dtype)
    x_t = jnp.asarray(rng.normal(size=(R, 1, D)), jnp.bfloat16)
    enc_mask = jnp.asarray(rng.integers(0, 2, (B, S)) | (np.arange(S) < 2),
                           jnp.int32)
    return dec, params, cache, x_t, enc_mask


def _block_params(params, i):
    return params["params"][f"block_{i}"]


def test_ffn_sublayer_matches_xla(setup):
    dec, params, cache, x_t, _ = setup
    bp = _block_params(params, 0)
    x = x_t[:, 0]
    got = ffn_sublayer(
        x, bp["ln3"]["scale"], bp["ff"]["wi"]["kernel"],
        bp["ff"]["wo"]["kernel"], block_rows=R, interpret=True)

    def ref(x):
        blk = dec.bind(params).blocks[0]
        xn = blk.ln3(x[:, None])
        return x[:, None] + blk.ff(xn, deterministic=True)

    want = ref(x)[:, 0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_self_attn_sublayer_matches_xla(setup):
    dec, params, cache, x_t, _ = setup
    pos = jnp.asarray(2, jnp.int32)
    bound = dec.bind(params)
    blk = bound.blocks[0]
    bias_row = bound.rel_bias(1, LMAX, q_offset=pos)     # [1, H, 1, L]

    bp = _block_params(params, 0)
    att = bp["self_attn"]
    wqkv = jnp.concatenate([att["q"]["kernel"], att["k"]["kernel"],
                            att["v"]["kernel"]], axis=1)
    ck = cache["tm_self_k_0"]
    cv = cache["tm_self_v_0"]
    got, ck2, cv2 = self_attn_sublayer(
        x_t[:, 0], pos, bp["ln1"]["scale"], wqkv, att["o"]["kernel"],
        jnp.transpose(bias_row[0, :, 0]).astype(jnp.float32),  # [L, H]
        ck, cv, heads=HEADS, d_kv=DKV, block_rows=R, interpret=True)

    def ref(x_t, ck, cv):
        h, ck, cv = blk.self_attn.decode_step(
            blk.ln1(x_t), ck, cv, pos, bias_row=bias_row, update_cache=True)
        return x_t + h, ck, cv

    want, ck_w, cv_w = ref(x_t, ck, cv)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want[:, 0], np.float32), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(ck2, np.float32),
                                  np.asarray(ck_w, np.float32))
    np.testing.assert_array_equal(np.asarray(cv2, np.float32),
                                  np.asarray(cv_w, np.float32))


def test_fused_beam_search_matches_xla():
    """End-to-end: generate_cids with fused Pallas sublayers returns the
    same beam sequences as the XLA path, scores within bf16 rounding."""
    from gdr_tpu.config import ModelConfig
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops import beam as B
    from gdr_tpu.ops.trie import build_trie

    cfg = ModelConfig(kary=4, max_output_length=5, d_model=64, d_kv=16,
                      d_ff=128, num_layers=2, num_decoder_layers=2,
                      num_heads=4, vocab_size=256, encoder_d_model=64,
                      adaptor_layer_num=1, adaptor_num_heads=2)
    model = GenerativeRetriever(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), input_len=8)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    rng = np.random.default_rng(0)
    cid_to_docs = {}
    docid = 0
    for a in range(4):
        for bb in range(3):
            cid_to_docs[f"{a}-{bb}"] = [str(docid), str(docid + 1)]
            docid += 2
    trie = build_trie(cid_to_docs, cfg.kary)
    children = jnp.asarray(trie.children)
    eos = jnp.asarray(trie.eos_allowed)
    ids = jnp.asarray(rng.integers(2, 256, (2, 8)), jnp.int32)
    msk = jnp.ones((2, 8), jnp.int32)
    res0, q0, _ = B.generate_cids(model, params, ids, msk, children, eos,
                                  6, 4, accumulate_hidden=True)
    res1, q1, _ = B.generate_cids(model, params, ids, msk, children, eos,
                                  6, 4, accumulate_hidden=True, fused=True)
    np.testing.assert_array_equal(np.asarray(res0.sequences),
                                  np.asarray(res1.sequences))
    np.testing.assert_allclose(np.asarray(res0.scores),
                               np.asarray(res1.scores), atol=1e-2)
    np.testing.assert_allclose(np.asarray(res0.hid_avg),
                               np.asarray(res1.hid_avg), atol=2e-2)


def test_cross_attn_sublayer_matches_xla(setup):
    dec, params, cache, x_t, enc_mask = setup
    pos = jnp.asarray(1, jnp.int32)
    bound = dec.bind(params)
    blk = bound.blocks[0]
    cross_bias = bound.cross_rel_bias(1, S, q_offset=pos)  # [1, H, 1, S]

    bp = _block_params(params, 0)
    att = bp["cross_attn"]
    ck = cache["cross_k_0"]
    cv = cache["cross_v_0"]
    # additive bias: rel-bias row + key mask
    bias = (jnp.broadcast_to(cross_bias[0, :, 0][None], (B, HEADS, S))
            .astype(jnp.float32)
            + jnp.where(enc_mask[:, None, :].astype(bool), 0.0, -1e9))
    got = cross_attn_sublayer(
        x_t[:, 0], bp["ln2"]["scale"], att["q"]["kernel"],
        att["o"]["kernel"], ck, cv, bias, K, heads=HEADS, d_kv=DKV,
        interpret=True)

    def ref(x_t):
        h = blk.cross_attn.cross_decode_grouped(
            blk.ln2(x_t), ck, cv, enc_mask, K, bias_row=cross_bias)
        return x_t + h

    want = ref(x_t)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want[:, 0], np.float32), atol=2e-2)


def test_fused_sampling_matches_xla():
    """sample_cids with fused sublayers draws identical rollouts: sampling
    runs at constant width, so the fused path covers every step (no
    progressive-warmup gating) and the same PRNG draws must pick the same
    tokens."""
    from gdr_tpu.config import ModelConfig
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops import beam as B
    from gdr_tpu.ops.trie import build_trie

    cfg = ModelConfig(kary=4, max_output_length=5, d_model=64, d_kv=16,
                      d_ff=128, num_layers=2, num_decoder_layers=2,
                      num_heads=4, vocab_size=256, encoder_d_model=64,
                      adaptor_layer_num=1, adaptor_num_heads=2)
    model = GenerativeRetriever(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), input_len=8)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    rng = np.random.default_rng(1)
    cid_to_docs = {f"{a}-{bb}": [str(a * 3 + bb)]
                   for a in range(4) for bb in range(3)}
    trie = build_trie(cid_to_docs, cfg.kary)
    children = jnp.asarray(trie.children)
    eos = jnp.asarray(trie.eos_allowed)
    ids = jnp.asarray(rng.integers(2, 256, (2, 8)), jnp.int32)
    msk = jnp.ones((2, 8), jnp.int32)
    key = jax.random.PRNGKey(7)
    r0, _, _ = B.sample_cids(model, params, ids, msk, children, eos, 4, 4,
                             key, temperature=0.8)
    r1, _, _ = B.sample_cids(model, params, ids, msk, children, eos, 4, 4,
                             key, temperature=0.8, fused=True)
    np.testing.assert_array_equal(np.asarray(r0.sequences),
                                  np.asarray(r1.sequences))
    np.testing.assert_allclose(np.asarray(r0.scores),
                               np.asarray(r1.scores), atol=1e-2)


# ---------------------------------------------------- PAWA adaptor kernels


def test_pick_block_rows_always_legal():
    """Every returned block must be lowerable: divisible by 8 or the full
    array; and it must divide the row count (regression: batch-1 × beam-100
    = 100 rows produced block 50, which Mosaic rejects — bench latency
    phase died)."""
    from gdr_tpu.ops.pallas.decode_kernel import _pick_block_rows

    ffn_fixed, ffn_per = 2 * 768 * 3072 * 2, 3072 * 6 + 3 * 768 * 2
    attn_fixed = (3 * 768 * 768 + 768 * 768) * 2
    attn_per = 2 * 4 * 768 * 2 + 2 * 768 * 2 + 3 * 768 * 4 + 4 * 768 * 2
    for r in (8, 200, 320, 800, 3200, 6400, 24, 1000):
        for start, fixed, per in ((256, ffn_fixed, ffn_per),
                                  (512, attn_fixed, attn_per)):
            b = _pick_block_rows(r, start, fixed, per)
            assert r % b == 0, (r, b)
            assert b % 8 == 0, (r, b)

    # rows with no 8-divisible divisor can't lower (batch-1 × beam-100 =
    # 100 rows: the full-array BlockSpec is legal but the [lmax, rows,
    # inner] VMEM scratch fails Mosaic tiling — measured on v5e)
    import pytest
    for r in (100, 300, 50):
        with pytest.raises(ValueError, match="fused decode"):
            _pick_block_rows(r, 256, ffn_fixed, ffn_per)

    # ... which the trace-time predicate turns into an unfused fallback
    from gdr_tpu.ops.pallas.decode_kernel import fused_step_supported
    kw = dict(d=768, d_ff=3072, heads=12, d_kv=64, lmax=4)
    assert not fused_step_supported(100, **kw)
    assert not fused_step_supported(300, **kw)
    assert fused_step_supported(3200, **kw)
    assert fused_step_supported(104, **kw)


def test_cross_attn_qper_legal_blocks():
    """cross_attn_sublayer's q_per grouping must give 8-divisible row
    blocks whenever the total row count is 8-divisible (the only case the
    fused_step_supported gate lets through)."""
    for b, k in ((2, 100), (32, 100), (2, 64), (4, 10), (6, 20)):
        assert (b * k) % 8 == 0
        q_per = b
        for cand in range(min(b, max(1, 256 // k)), 0, -1):
            if b % cand == 0 and (cand * k) % 8 == 0:
                q_per = cand
                break
        block = q_per * k
        assert b % q_per == 0
        assert block % 8 == 0, (b, k, q_per)
