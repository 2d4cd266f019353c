import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.models.convert import hf_encoder_mapping, load_t5_encoder
from gdr_tpu.models.gdr import GenerativeRetriever, init_params

CFG = tiny_config(kary=3, max_output_length=5)
MCFG = dataclasses.replace(CFG.model, dropout_rate=0.0)


def _fake_state_dict(params):
    """Fabricate an HF-named state dict shaped to match the target tree."""
    inner = params["params"]
    sd = {}
    for hf_name, path in hf_encoder_mapping(MCFG.num_layers).items():
        node = inner
        for p in path:
            node = node[p]
        val = np.random.default_rng(hash(hf_name) % 2**32).normal(
            size=np.asarray(node).shape).astype(np.float32)
        if path[-1] == "kernel":
            val = val.T          # HF stores [out, in]
        sd[hf_name] = val
    sd["decoder.block.0.layer.0.SelfAttention.q.weight"] = np.zeros((1, 1))
    return sd


def test_load_t5_encoder_places_and_transposes():
    model = GenerativeRetriever(MCFG)
    params = init_params(model, jax.random.PRNGKey(0))
    sd = _fake_state_dict(params)
    loaded = load_t5_encoder(params, sd, MCFG.num_layers)

    inner = loaded["params"]
    np.testing.assert_allclose(inner["shared"]["embedding"],
                               sd["shared.weight"])
    np.testing.assert_allclose(
        inner["encoder"]["block_0"]["attn"]["q"]["kernel"],
        sd["encoder.block.0.layer.0.SelfAttention.q.weight"].T)
    np.testing.assert_allclose(
        inner["encoder"]["final_norm"]["scale"],
        sd["encoder.final_layer_norm.weight"])
    # decoder side untouched (trains from scratch, ref main_models.py:786-793)
    np.testing.assert_allclose(
        inner["decoder"]["block_0"]["self_attn"]["q"]["kernel"],
        np.asarray(params["params"]["decoder"]["block_0"]["self_attn"]["q"]["kernel"]))

    # loaded tree still runs
    ids = jnp.zeros((1, 8), jnp.int32)
    out = model.apply(jax.tree_util.tree_map(jnp.asarray, loaded), ids,
                      jnp.ones_like(ids),
                      jnp.zeros((1, 5), jnp.int32), jnp.ones((1, 5)))
    assert np.isfinite(np.asarray(out["query_embedding"])).all()
