"""Semantic checkpoint keying (bench._semantic_key, VERDICT r4 weak #2).

The quality workdir key must be a digest of WHAT the trained model is
(configs + data-gen source + param-tree shapes), not of source-file bytes —
so a comment-only edit to a core source no longer orphans a multi-hour
trained checkpoint, while any config or parameter-shape change still does.
"""

import dataclasses
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_KEY_SNIPPET = """
import bench
from gdr_tpu.config import GDRConfig, ModelConfig, TrainConfig, DataConfig
from gdr_tpu.models.dual_encoder import tiny_doc_encoder
mcfg = ModelConfig(kary=4, max_output_length=5, d_model=32, d_kv=8, d_ff=64,
                   num_layers=1, num_decoder_layers=1, num_heads=2,
                   vocab_size=128, encoder_d_model=16, adaptor_layer_num=1,
                   adaptor_num_heads=2)
cfg = GDRConfig(model=mcfg, train=TrainConfig(train_batch_size=8),
                data=DataConfig())
print(bench._semantic_key(cfg, tiny_doc_encoder(d_model=16), 12),
      bench._source_hash())
"""


def _key_in_subprocess() -> tuple:
    """(semantic_key, source_hash) computed by a FRESH interpreter — the
    honest way to observe the effect of an on-disk source edit."""
    out = subprocess.run(
        [sys.executable, "-c", _KEY_SNIPPET], capture_output=True, text=True,
        cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    return tuple(out.stdout.split()[-2:])


def _mk_cfg(**model_overrides):
    from gdr_tpu.config import (DataConfig, GDRConfig, ModelConfig,
                                TrainConfig)
    mcfg = ModelConfig(kary=4, max_output_length=5, d_model=32, d_kv=8,
                       d_ff=64, num_layers=1, num_decoder_layers=1,
                       num_heads=2, vocab_size=128, encoder_d_model=16,
                       adaptor_layer_num=1, adaptor_num_heads=2)
    if model_overrides:
        mcfg = dataclasses.replace(mcfg, **model_overrides)
    return GDRConfig(model=mcfg, train=TrainConfig(train_batch_size=8),
                     data=DataConfig())


def test_key_deterministic_and_sensitive():
    sys.path.insert(0, REPO)
    import bench
    from gdr_tpu.models.dual_encoder import tiny_doc_encoder
    tower = tiny_doc_encoder(d_model=16)
    cfg = _mk_cfg()
    k = bench._semantic_key(cfg, tower, 12)
    assert k == bench._semantic_key(cfg, tower, 12)
    # hyperparameter change (same shapes) → new key
    cfg_lr = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, learning_rate=9e-4))
    assert bench._semantic_key(cfg_lr, tower, 12) != k
    # parameter-shape change → new key
    assert bench._semantic_key(_mk_cfg(d_ff=128), tower, 12) != k


@pytest.mark.slow
def test_comment_edit_keeps_key():
    """The VERDICT r4 done-criterion: append a comment to a core model
    source; the semantic key must be unchanged while the legacy source hash
    changes.  Runs each measurement in a fresh interpreter so the edit is
    actually observed from disk."""
    target = os.path.join(REPO, "gdr_tpu", "models", "t5.py")
    with open(target) as fh:
        original = fh.read()
    key0, src0 = _key_in_subprocess()
    try:
        with open(target, "w") as fh:
            fh.write(original + "\n# semantic-key stability probe\n")
        key1, src1 = _key_in_subprocess()
    finally:
        with open(target, "w") as fh:
            fh.write(original)
    assert key1 == key0, "comment edit must not orphan checkpoints"
    assert src1 != src0, "sanity: the legacy source hash does see the edit"
