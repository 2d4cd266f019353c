import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdr_tpu.config import tiny_config
from gdr_tpu.models.gdr import GenerativeRetriever, init_params, shift_right
from gdr_tpu.ops import losses
from gdr_tpu.ops.masks import positional_logit_mask

CFG = tiny_config()


@pytest.fixture(scope="module")
def model_and_params():
    model = GenerativeRetriever(CFG.model)
    params = init_params(model, jax.random.PRNGKey(0))
    return model, params


def _dummy_batch(b=2, s=8):
    rng = np.random.default_rng(1)
    input_ids = jnp.asarray(rng.integers(2, 100, size=(b, s)), jnp.int32)
    attn = jnp.ones((b, s), jnp.int32)
    L, kary = CFG.model.max_output_length, CFG.model.kary
    labels = np.zeros((b, L), np.int32)
    for i in range(b):
        depth = 3
        digits = rng.integers(0, kary, size=depth)
        toks = [p * kary + int(d) + 2 for p, d in enumerate(digits)] + [1]
        labels[i, :len(toks)] = toks
    labels = jnp.asarray(labels)
    label_mask = (labels != 0).astype(jnp.int32)
    return input_ids, attn, labels, label_mask


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    input_ids, attn, labels, label_mask = _dummy_batch()
    dec_in = shift_right(labels)
    out = model.apply(params, input_ids, attn, dec_in, label_mask)
    V = CFG.model.decode_vocab_size
    L = CFG.model.max_output_length
    assert out["logits"].shape == (2, L, V)
    assert out["decoder_hidden"].shape == (2, L, CFG.model.d_model)
    assert out["query_embedding"].shape == (2, CFG.model.encoder_d_model)
    assert np.all(np.isfinite(np.asarray(out["logits"][:, :, 1])))


def test_positional_mask_applied(model_and_params):
    model, params = model_and_params
    input_ids, attn, labels, label_mask = _dummy_batch()
    out = model.apply(params, input_ids, attn, shift_right(labels), label_mask)
    logits = np.asarray(out["logits"])
    mask = positional_logit_mask(CFG.model.kary, CFG.model.max_output_length)
    # invalid entries must be ≤ -1e8 after masking
    assert np.all(logits[:, mask < 0] < -1e8)
    assert np.all(logits[:, mask == 0] > -1e8)


def test_incremental_decode_matches_full(model_and_params):
    """KV-cached step-by-step decode must reproduce teacher-forced logits."""
    model, params = model_and_params
    input_ids, attn, labels, label_mask = _dummy_batch()
    L = CFG.model.max_output_length
    dec_in = shift_right(labels)

    @jax.jit
    def full_fn(params, input_ids, attn, dec_in, dec_mask):
        return model.apply(params, input_ids, attn, dec_in, dec_mask)["logits"]

    @jax.jit
    def incremental_fn(params, input_ids, attn, dec_in):
        enc = model.apply(params, input_ids, attn, method=model.encode)
        cache = model.apply(params, enc, L, method=model.init_cache)

        def body(cache, pos):
            logits, cache = model.apply(params, dec_in[:, pos], cache, attn,
                                        pos, method=model.decode_step)
            return cache, logits

        _, logits = jax.lax.scan(body, cache, jnp.arange(L))
        return logits.transpose(1, 0, 2)

    full_logits = np.asarray(full_fn(params, input_ids, attn, dec_in,
                                     jnp.ones_like(label_mask)))
    step_logits = np.asarray(incremental_fn(params, input_ids, attn, dec_in))
    np.testing.assert_allclose(step_logits, full_logits, rtol=2e-3, atol=2e-3)


def test_masked_cross_entropy():
    logits = jnp.asarray([[[0.0, 10.0, 0.0], [10.0, 0.0, 0.0]]])
    labels = jnp.asarray([[1, 0]])
    mask = jnp.asarray([[1, 0]])
    loss = losses.masked_cross_entropy(logits, labels, mask)
    assert float(loss) < 1e-3  # only position 0 counts and it is correct


def test_rdrop_contrast_loss_prefers_aligned_twins():
    rng = np.random.default_rng(0)
    b, L, d = 4, 3, 8
    h = rng.normal(size=(b, L, d)).astype(np.float32)
    aligned = jnp.asarray(np.concatenate([h, h * 1.01], axis=0))
    shuffled = jnp.asarray(np.concatenate([h, rng.normal(size=h.shape)], axis=0))
    mask = jnp.ones((2 * b, L))
    l_aligned = losses.rdrop_contrast_loss(aligned * 10, mask)
    l_shuffled = losses.rdrop_contrast_loss(shuffled * 10, mask)
    assert float(l_aligned) < float(l_shuffled)


def test_cluster_infonce_decreases_with_better_alignment():
    rng = np.random.default_rng(0)
    b, c, d = 3, 4, 8
    q = rng.normal(size=(b, d)).astype(np.float32)
    cands = rng.normal(size=(b, c, d)).astype(np.float32)
    cmask = np.ones((b, c))
    good = losses.cluster_infonce(jnp.asarray(q), jnp.asarray(q * 2),
                                  jnp.asarray(cands), jnp.asarray(cmask))
    bad = losses.cluster_infonce(jnp.asarray(q), jnp.asarray(-q * 2),
                                 jnp.asarray(cands), jnp.asarray(cmask))
    assert float(good) < float(bad)


def test_cluster_infonce_intra_rate_changes_loss():
    rng = np.random.default_rng(0)
    b, c, d = 3, 4, 8
    q = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    cands = jnp.asarray(rng.normal(size=(b, c, d)), jnp.float32)
    cmask = jnp.ones((b, c))
    l1 = losses.cluster_infonce(q, pos, cands, cmask, intra_rate=1.0)
    l2 = losses.cluster_infonce(q, pos, cands, cmask, intra_rate=0.1)
    assert not np.isclose(float(l1), float(l2))


def test_candidate_decode_matches_full_slice(model_and_params):
    """decode_step_candidates must equal the (positionally valid) slice of
    the full-vocabulary decode_step logits."""
    model, params = model_and_params
    input_ids, attn, labels, label_mask = _dummy_batch()
    L, kary = CFG.model.max_output_length, CFG.model.kary
    dec_in = shift_right(labels)

    enc = model.apply(params, input_ids, attn, method=model.encode)
    cache_full = model.apply(params, enc, L, method=model.init_cache)
    cache_cand = model.apply(params, enc, L, method=model.init_cache)
    for pos in range(L):
        full, cache_full = model.apply(params, dec_in[:, pos], cache_full,
                                       attn, pos, method=model.decode_step)
        cand, cache_cand = model.apply(params, dec_in[:, pos], cache_cand,
                                       attn, pos,
                                       method=model.decode_step_candidates)
        full = np.asarray(full)
        cand = np.asarray(cand)
        lo = pos * kary + 2
        if pos < L - 1:
            np.testing.assert_allclose(cand[:, :kary], full[:, lo:lo + kary],
                                       rtol=2e-4, atol=2e-4)
        else:
            assert np.all(cand[:, :kary] < -1e8)
        np.testing.assert_allclose(cand[:, kary], full[:, 1],
                                   rtol=2e-4, atol=2e-4)


def test_beam_grouped_cross_attention(model_and_params):
    """Multi-beam decode with grouped cross-attention equals the naive
    per-beam expansion."""
    model, params = model_and_params
    input_ids, attn, labels, _ = _dummy_batch()
    L, K = CFG.model.max_output_length, 3
    enc = model.apply(params, input_ids, attn, method=model.encode)
    b = enc.shape[0]

    # grouped: cross K/V per query
    cache_g = model.apply(params, enc, L, K, method=model.init_cache)
    tok = jnp.zeros((b * K,), jnp.int32)
    out_g, _ = model.apply(params, tok, cache_g, attn, 0, K,
                           method=model.decode_step)

    # naive: expand encoder per beam, num_beams=1
    enc_b = jnp.repeat(enc, K, axis=0)
    attn_b = jnp.repeat(attn, K, axis=0)
    cache_n = model.apply(params, enc_b, L, method=model.init_cache)
    out_n, _ = model.apply(params, tok, cache_n, attn_b, 0,
                           method=model.decode_step)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_n),
                               rtol=2e-3, atol=2e-3)


def test_full_pawa_variant():
    """adaptor_efficient=False: the slow per-prefix [d,d] transform path."""
    import dataclasses
    mcfg = dataclasses.replace(CFG.model, adaptor_efficient=False,
                               dropout_rate=0.0)
    model = GenerativeRetriever(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    assert "u2" in params["params"]["pawa"]
    input_ids, attn, labels, label_mask = _dummy_batch()
    dec_in = shift_right(labels)
    out = model.apply(params, input_ids, attn, dec_in, label_mask)
    assert np.isfinite(np.asarray(out["logits"][:, :, 1])).all()

    # candidate decode agrees with the full-vocab step for this variant too
    L, kary = CFG.model.max_output_length, CFG.model.kary
    enc = model.apply(params, input_ids, attn, method=model.encode)
    c1 = model.apply(params, enc, L, method=model.init_cache)
    c2 = model.apply(params, enc, L, method=model.init_cache)
    full, _ = model.apply(params, dec_in[:, 0], c1, attn, 0,
                          method=model.decode_step)
    cand, _ = model.apply(params, dec_in[:, 0], c2, attn, 0,
                          method=model.decode_step_candidates)
    np.testing.assert_allclose(np.asarray(cand)[:, :kary],
                               np.asarray(full)[:, 2:2 + kary],
                               rtol=2e-4, atol=2e-4)


def test_candidate_sliced_head_matches_full(model_and_params):
    """decode_candidate_logits == the valid columns of the masked full-vocab
    path: identical CE / R-Drop KL values, L2 up to the documented
    normalisation, and identical gradients (incl. PAWA U)."""
    model, params = model_and_params
    input_ids, attn, labels, label_mask = _dummy_batch(b=4)
    kary = CFG.model.kary
    dec_in = shift_right(labels)
    local = losses.local_candidate_labels(labels, kary)

    def full_ce(p):
        out = model.apply(p, input_ids, attn, dec_in, label_mask)
        return losses.masked_cross_entropy(out["logits"], labels, label_mask)

    def cand_ce(p):
        out = model.apply(p, input_ids, attn, dec_in, label_mask,
                          sliced_head=True)
        return losses.masked_cross_entropy(out["logits"], local, label_mask)

    np.testing.assert_allclose(float(full_ce(params)), float(cand_ce(params)),
                               rtol=1e-5)

    g_full = jax.grad(full_ce)(params)
    g_cand = jax.grad(cand_ce)(params)
    leaves_f = jax.tree_util.tree_leaves_with_path(g_full)
    g_cand_flat = dict(jax.tree_util.tree_leaves_with_path(g_cand))
    checked = 0
    for path, leaf in leaves_f:
        other = g_cand_flat[path]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(other),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=str(path))
        checked += 1
    assert checked > 10

    # R-Drop variants on a duplicated batch (two dropout realisations)
    ids2 = jnp.concatenate([input_ids] * 2)
    attn2 = jnp.concatenate([attn] * 2)
    dec2 = jnp.concatenate([dec_in] * 2)
    lm2 = jnp.concatenate([label_mask] * 2)
    rngs = {"dropout": jax.random.PRNGKey(3)}
    out_f = model.apply(params, ids2, attn2, dec2, lm2, deterministic=False,
                        rngs=rngs)
    out_c = model.apply(params, ids2, attn2, dec2, lm2, deterministic=False,
                        sliced_head=True, rngs=rngs)
    np.testing.assert_allclose(float(losses.rdrop_kl_loss(out_f["logits"])),
                               float(losses.rdrop_kl_loss(out_c["logits"])),
                               rtol=1e-4)
    np.testing.assert_allclose(
        float(losses.rdrop_l2_loss(out_f["logits"])),
        float(losses.rdrop_l2_loss(
            out_c["logits"], norm_cols=CFG.model.decode_vocab_size)),
        rtol=1e-4)
