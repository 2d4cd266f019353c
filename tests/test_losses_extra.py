import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.ops import losses

CFG = tiny_config(kary=3, max_output_length=5)


def test_doc_reweight_loss():
    rng = np.random.default_rng(0)
    b, L, V, d = 3, 4, 8, 6
    logits = jnp.asarray(rng.normal(size=(b, L, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, size=(b, L)), jnp.int32)
    mask = jnp.ones((b, L))
    q = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    # aligned docs → positive weights → loss > 0; anti-aligned → weight 0
    l_pos = losses.doc_reweight_loss(logits, labels, mask, q, q)
    l_neg = losses.doc_reweight_loss(logits, labels, mask, q, -q)
    assert float(l_pos) > 0
    assert float(l_neg) == 0.0


def test_query_token_infonce_prefers_own_decoder_states():
    rng = np.random.default_rng(0)
    b, L, d = 4, 3, 8
    q = rng.normal(size=(b, d)).astype(np.float32) * 3
    own = np.repeat(q[:, None], L, axis=1)          # decoder states = query
    other = rng.normal(size=(b, L, d)).astype(np.float32)
    mask = jnp.ones((b, L))
    l_own = losses.query_token_infonce(jnp.asarray(q), jnp.asarray(own), mask)
    l_other = losses.query_token_infonce(jnp.asarray(q), jnp.asarray(other), mask)
    assert float(l_own) < float(l_other)


def test_margin_ranking_loss():
    pos = jnp.asarray([0.9, 0.2])
    neg = jnp.asarray([0.1, 0.4])
    l = losses.margin_ranking_loss(pos, neg, margin=0.5)
    # first pair satisfies margin (0.8 > 0.5) → 0; second: 0.5-(-0.2)=0.7
    np.testing.assert_allclose(float(l), 0.35, rtol=1e-6)


def test_denoising_model_path():
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    mcfg = dataclasses.replace(CFG.model, denoising=True, dropout_rate=0.0)
    model = GenerativeRetriever(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    assert "denoise_disc" in params["params"]
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 100, size=(2, 8)), jnp.int32)
    keep = jnp.asarray(rng.random((2, 8)) < 0.9)
    gen_loss, disc_loss = model.apply(params, ids, jnp.ones_like(ids), keep,
                                      jax.random.PRNGKey(1),
                                      method=model.denoise)
    assert np.isfinite(float(gen_loss)) and float(gen_loss) > 0
    assert np.isfinite(float(disc_loss)) and float(disc_loss) > 0


def test_embedding_distillation_loss():
    rng = np.random.default_rng(0)
    b, s, d = 2, 6, 4
    hidden = jnp.asarray(rng.normal(size=(b, s, d)), jnp.float32)
    ids = jnp.asarray([[5, 7, 1, 0, 0, 0], [9, 1, 0, 0, 0, 0]], jnp.int32)
    # targets = exactly the eos-position states → zero loss
    target = jnp.stack([hidden[0, 2], hidden[1, 1]])
    loss = losses.embedding_distillation_loss(hidden, ids, target)
    assert float(loss) < 1e-12
    loss2 = losses.embedding_distillation_loss(hidden, ids, target + 1.0)
    np.testing.assert_allclose(float(loss2), 1.0, rtol=1e-6)


def test_weight_distillation_loss():
    rng = np.random.default_rng(0)
    b, L, d = 2, 3, 4
    h = jnp.asarray(rng.normal(size=(b, L, d)), jnp.float32)
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    assert float(losses.weight_distillation_loss(h, h, mask)) == 0.0
    l = losses.weight_distillation_loss(h, h + 2.0, mask)
    np.testing.assert_allclose(float(l), 4.0, rtol=1e-6)


def test_encoder_classifier():
    from gdr_tpu.models.classifier import EncoderClassifier
    mcfg = dataclasses.replace(CFG.model, dropout_rate=0.0)
    model = EncoderClassifier(mcfg, num_cls=7)
    ids = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))
    logits = model.apply(params, ids, jnp.ones_like(ids))
    assert logits.shape == (2, 7)
    pred = model.apply(params, ids, jnp.ones_like(ids), method=model.predict)
    assert pred.shape == (2,)


def test_rdrop_variants_move_and_vanish():
    """KL and L2 R-Drop variants (ref modeling_t5.py:1668-1689): zero for
    identical halves, positive for differing halves; trainer honors
    ModelConfig.rdrop_loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gdr_tpu.ops.losses import rdrop_kl_loss, rdrop_l2_loss

    rng = np.random.default_rng(0)
    half = jnp.asarray(rng.normal(size=(3, 4, 7)), jnp.float32)
    same = jnp.concatenate([half, half], axis=0)
    diff = jnp.concatenate(
        [half, half + jnp.asarray(rng.normal(size=half.shape) * 0.5,
                                  jnp.float32)], axis=0)
    for fn in (rdrop_kl_loss, rdrop_l2_loss):
        assert float(fn(same)) < 1e-6
        assert float(fn(diff)) > 1e-4

    # trainer switch: a KL-configured step runs and returns finite loss
    import dataclasses
    from gdr_tpu.config import tiny_config
    from gdr_tpu.models.gdr import GenerativeRetriever
    from gdr_tpu.train.trainer import init_train_state, make_train_step

    cfg = tiny_config()
    for variant in ("KL", "L2"):
        mcfg = dataclasses.replace(cfg.model, rdrop_loss=variant)
        c2 = dataclasses.replace(cfg, model=mcfg)
        model = GenerativeRetriever(mcfg)
        state, opt = init_train_state(c2, model, None, jax.random.PRNGKey(0),
                                      total_steps=10, input_len=8)
        step = make_train_step(model, None, opt, c2, stage=1)
        L = mcfg.max_output_length
        b = 4
        labels = np.zeros((b, L), np.int32)
        labels[:, 0] = 2
        labels[:, 1] = 1
        batch = {
            "input_ids": jnp.asarray(rng.integers(2, 100, (b, 8)), jnp.int32),
            "attn_mask": jnp.ones((b, 8), jnp.int32),
            "labels": jnp.asarray(labels),
            "label_mask": jnp.asarray((labels != 0).astype(np.int32)),
            "pos_idx": jnp.arange(b, dtype=jnp.int32),
            "cand_idx": jnp.zeros((b, 3), jnp.int32),
            "cand_mask": jnp.ones((b, 3), bool),
        }
        store = jnp.asarray(rng.normal(size=(8, mcfg.encoder_d_model)),
                            jnp.float32)
        state, m = step(state, batch, store, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"])), variant
        assert float(m["rdrop"]) >= 0.0, variant
