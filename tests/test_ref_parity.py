"""Golden parity against the ACTUAL reference fork.

The round-1 gap (VERDICT.md Missing #3): the custom decoder math — efficient
PAWA (ref modeling_t5.py:1229-1244, 1615-1639), the positional-validity
logit mask (:1279-1301), CE loss semantics and the trie-constrained beam
search (generation_utils_previous.py:714-729) — was locked only by
self-tests.  Here the vendored torch fork itself is the oracle: a subprocess
(tests/ref_oracle.py) runs it on a tiny config and dumps its weights and
outputs; the weights are converted through
``gdr_tpu.models.convert.load_gdr_reference`` and the same inputs must
produce the same logits / loss / beam sequences from the JAX model.

Documented, deliberate deviations NOT asserted here:
  - adaptor projection biases (torch-only; zeroed in the oracle — gdr_tpu's
    adaptor is biasless, T5-style),
  - R-Drop "Contrast" uses a single softmax (the reference feeds softmax
    output into CrossEntropyLoss — a double softmax; see
    ops/losses.rdrop_contrast_loss docstring).
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdr_tpu.config import ModelConfig
from gdr_tpu.models.convert import load_gdr_reference
from gdr_tpu.models.gdr import GenerativeRetriever, init_params, shift_right
from gdr_tpu.ops.losses import masked_cross_entropy

REF = "/root/reference/GDR_model"
ORACLE = os.path.join(os.path.dirname(__file__), "ref_oracle.py")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not present")


def _run_oracle(mode: str, path: str) -> dict:
    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable, ORACLE, mode, path], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return dict(np.load(path))


def _config() -> ModelConfig:
    # keep in sync with tests/ref_oracle.py constants
    return ModelConfig(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
        kary=5, max_output_length=4, tie_decode_embedding=False,
        adaptor_decode=True, adaptor_efficient=True, adaptor_layer_num=1,
        adaptor_num_heads=8, adaptor_d_ff=2048, rdrop=0.0, input_dropout=0.0,
        encoder_d_model=32)


def _converted_params(data: dict, cfg: ModelConfig):
    sd = {k[3:]: v for k, v in data.items() if k.startswith("sd.")}
    model = GenerativeRetriever(cfg)
    params = init_params(model, jax.random.PRNGKey(0), input_len=7)
    params = load_gdr_reference(params, sd, num_layers=cfg.num_layers,
                                num_decoder_layers=cfg.num_decoder_layers,
                                adaptor_layers=cfg.adaptor_layer_num,
                                adaptor_heads=cfg.adaptor_num_heads)
    return model, jax.tree_util.tree_map(jnp.asarray, params)


@pytest.fixture(scope="module")
def forward_golden(tmp_path_factory):
    path = tmp_path_factory.mktemp("ref") / "forward.npz"
    return _run_oracle("forward", str(path))


def test_teacher_forced_logits_match_reference(forward_golden):
    data = forward_golden
    cfg = _config()
    model, params = _converted_params(data, cfg)

    labels = np.where(data["labels"] == -100, 0, data["labels"])
    dec_in = shift_right(jnp.asarray(labels))
    out = model.apply(params, jnp.asarray(data["input_ids"]),
                      jnp.asarray(data["attn"]), dec_in,
                      jnp.asarray(data["dec_mask"]))
    ours = np.asarray(out["logits"], np.float64)
    ref = np.asarray(data["logits"], np.float64)

    # the positional mask must kill the same entries in both
    valid_ref = ref > -1e8
    valid_ours = ours > -1e8
    np.testing.assert_array_equal(valid_ours, valid_ref)
    # and the surviving logits must agree numerically (PAWA delta included)
    diff = np.abs(ours - ref)[valid_ref]
    assert diff.max() < 1e-4, diff.max()


def test_ce_loss_matches_reference(forward_golden):
    data = forward_golden
    cfg = _config()
    model, params = _converted_params(data, cfg)

    labels = np.where(data["labels"] == -100, 0, data["labels"])
    dec_in = shift_right(jnp.asarray(labels))
    out = model.apply(params, jnp.asarray(data["input_ids"]),
                      jnp.asarray(data["attn"]), dec_in,
                      jnp.asarray(data["dec_mask"]))
    loss = masked_cross_entropy(out["logits"], jnp.asarray(labels),
                                jnp.asarray(data["dec_mask"]))
    assert abs(float(loss) - float(data["loss"])) < 1e-5, (
        float(loss), float(data["loss"]))


def test_pawa_delta_is_load_bearing(forward_golden):
    """Sanity: zeroing the converted adaptor-U must change the logits —
    proves the parity above actually exercises the PAWA path."""
    data = forward_golden
    cfg = _config()
    model, params = _converted_params(data, cfg)
    labels = np.where(data["labels"] == -100, 0, data["labels"])
    dec_in = shift_right(jnp.asarray(labels))

    zeroed = jax.tree_util.tree_map(np.asarray, params)
    zeroed["params"]["pawa"]["u"] = np.zeros_like(
        zeroed["params"]["pawa"]["u"])
    a = model.apply(params, jnp.asarray(data["input_ids"]),
                    jnp.asarray(data["attn"]), dec_in,
                    jnp.asarray(data["dec_mask"]))["logits"]
    b = model.apply(jax.tree_util.tree_map(jnp.asarray, zeroed),
                    jnp.asarray(data["input_ids"]),
                    jnp.asarray(data["attn"]), dec_in,
                    jnp.asarray(data["dec_mask"]))["logits"]
    va = np.asarray(a) > -1e8
    assert np.abs(np.asarray(a) - np.asarray(b))[va].max() > 1e-3


@pytest.fixture(scope="module")
def beam_golden(tmp_path_factory):
    path = tmp_path_factory.mktemp("ref") / "beam.npz"
    return _run_oracle("beam", str(path))


def test_beam_search_matches_reference(beam_golden):
    """Trie-constrained beam search vs the reference's live implementation
    (generation_utils_previous.py:714-729): same sequences, same order, same
    length-normalised scores."""
    from gdr_tpu.ops.beam import generate_cids
    from gdr_tpu.ops.trie import build_trie

    data = beam_golden
    cfg = _config()
    model, params = _converted_params(data, cfg)

    paths = [[0, 2], [0, 4], [3, 1], [3, 0], [2, 4], [2, 0],
             [1, 1], [4, 0], [4, 2], [1, 3]]       # == ref_oracle._toy_trie
    cid_to_docs = {"-".join(map(str, p)): [i] for i, p in enumerate(paths)}
    trie = build_trie(cid_to_docs, kary=cfg.kary, max_docs_per_cluster=4)

    num_beams = 4
    res, _q, _e = generate_cids(
        model, params, jnp.asarray(data["input_ids"]),
        jnp.asarray(data["attn"]), jnp.asarray(trie.children),
        jnp.asarray(trie.eos_allowed), num_beams=num_beams,
        max_len=cfg.max_output_length, length_penalty=1.0,
        progressive=False)

    b = data["input_ids"].shape[0]
    ref_seqs = data["sequences"].reshape(b, num_beams, -1)
    ref_scores = data["scores"].reshape(b, num_beams)
    ours_seqs = np.asarray(res.sequences)[:, :, : ref_seqs.shape[2]]
    np.testing.assert_array_equal(ours_seqs, ref_seqs)
    np.testing.assert_allclose(np.asarray(res.scores), ref_scores,
                               rtol=1e-4, atol=1e-4)
