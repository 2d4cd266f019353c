"""Numerical parity of the T5 encoder against HuggingFace transformers.

Random-initialises a tiny HF T5 encoder (torch, CPU), copies its weights
through gdr_tpu.models.convert, and checks the Flax encoder reproduces the
torch hidden states — validating relative-position bucketing, RMS norms,
residual layout and the kernel transposition end to end.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gdr_tpu.config import tiny_config  # noqa: E402
from gdr_tpu.models.convert import load_t5_encoder  # noqa: E402
from gdr_tpu.models.gdr import GenerativeRetriever, init_params  # noqa: E402


def test_encoder_matches_hf_t5():
    from transformers import T5Config, T5EncoderModel

    cfg = tiny_config(kary=3, max_output_length=5)
    m = dataclasses.replace(cfg.model, dropout_rate=0.0)
    hf_cfg = T5Config(
        vocab_size=m.vocab_size, d_model=m.d_model, d_kv=m.d_kv, d_ff=m.d_ff,
        num_layers=m.num_layers, num_heads=m.num_heads,
        relative_attention_num_buckets=m.relative_attention_num_buckets,
        relative_attention_max_distance=m.relative_attention_max_distance,
        dropout_rate=0.0, feed_forward_proj="relu", is_encoder_decoder=False,
        use_cache=False)
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    model = GenerativeRetriever(m)
    params = init_params(model, jax.random.PRNGKey(0))
    sd = {k: v for k, v in hf.state_dict().items()}
    # T5EncoderModel names the embedding table "shared.weight" too
    loaded = load_t5_encoder(params, sd, m.num_layers)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, m.vocab_size, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)
                 ).last_hidden_state.numpy()

    got = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, loaded),
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        method=model.encode))

    # compare only unmasked positions (HF computes garbage under the mask too
    # but downstream consumers never read it)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=2e-3, atol=2e-3)


def test_doc_encoder_matches_hf_bert():
    from transformers import BertConfig, BertModel

    from gdr_tpu.models.convert import load_bert_encoder
    from gdr_tpu.models.dual_encoder import DocEncoder

    d, heads, layers, ff = 32, 4, 2, 64
    hf_cfg = BertConfig(vocab_size=200, hidden_size=d, num_hidden_layers=layers,
                        num_attention_heads=heads, intermediate_size=ff,
                        max_position_embeddings=64,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()

    enc = DocEncoder(vocab_size=200, d_model=d, num_layers=layers,
                     num_heads=heads, d_ff=ff, max_position=64,
                     dropout_rate=0.0)
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 200, size=(2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[0, 7:] = 0

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, jnp.int32))
    loaded = load_bert_encoder(params, hf.state_dict(), layers, heads)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)
                 ).last_hidden_state.numpy()[:, 0]   # CLS

    got = np.asarray(enc.apply(
        jax.tree_util.tree_map(jnp.asarray, loaded),
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
