"""The bench quality phase's operating-point resolution (bench.py
``_quality_scale``): defaults ← q_scale.json manifest ← GDR_BENCH_Q_* env.
The manifest is the resume-across-rounds lever toward the reference's
334k / t5-base / beam-100 point (BASELINE.md targets) — a silent fallback
to the small defaults would eval the wrong checkpoint, so the resolution
order is locked here."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_scale_defaults(monkeypatch, tmp_path):
    monkeypatch.setenv("GDR_BENCH_STATE_DIR", str(tmp_path))
    for k in list(os.environ):
        if k.startswith("GDR_BENCH_Q_"):
            monkeypatch.delenv(k)
    sc = bench._quality_scale(False)
    assert sc == bench._Q_DEFAULTS
    tiny = bench._quality_scale(True)
    assert tiny["n_docs"] == 240 and tiny["preset"] == "tiny"


def test_scale_manifest_and_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("GDR_BENCH_STATE_DIR", str(tmp_path))
    with open(tmp_path / "q_scale.json", "w") as fh:
        json.dump({"n_docs": 334314, "n_topics": 16715, "dim": 768,
                   "preset": "base", "beams": 100, "epochs": 10,
                   "not_a_knob": 1}, fh)
    sc = bench._quality_scale(False)
    assert sc["n_docs"] == 334314 and sc["preset"] == "base"
    assert sc["beams"] == 100 and sc["epochs"] == 10
    assert "not_a_knob" not in sc                  # unknown keys dropped
    assert sc["bsz"] == bench._Q_DEFAULTS["bsz"]   # unlisted keep defaults
    # env beats manifest; type coercion follows the default's type
    monkeypatch.setenv("GDR_BENCH_Q_EPOCHS", "3")
    monkeypatch.setenv("GDR_BENCH_Q_PRESET", "small")
    monkeypatch.setenv("GDR_BENCH_Q_LR", "1e-4")
    sc = bench._quality_scale(False)
    assert sc["epochs"] == 3 and sc["preset"] == "small"
    assert abs(sc["lr"] - 1e-4) < 1e-12
    # the manifest must never leak into the tiny CPU smoke
    assert bench._quality_scale(True)["n_docs"] == 240


def test_scale_bad_manifest_falls_back(monkeypatch, tmp_path):
    monkeypatch.setenv("GDR_BENCH_STATE_DIR", str(tmp_path))
    (tmp_path / "q_scale.json").write_text("{not json")
    sc = bench._quality_scale(False)
    assert sc == bench._Q_DEFAULTS


def test_epoch_cost_estimate(tmp_path):
    # None before any epoch completed (missing file / no epoch_seconds)
    assert bench._epoch_cost_estimate(str(tmp_path)) is None
    p = tmp_path / "train.metrics.jsonl"
    p.write_text('{"step": 1, "loss": 9.0}\n')
    assert bench._epoch_cost_estimate(str(tmp_path)) is None
    # max of the last three epochs: a stage-2 epoch (store refresh) must
    # not be underestimated by earlier stage-1 history
    rows = [{"epoch": e, "epoch_seconds": s}
            for e, s in enumerate([900.0, 880.0, 860.0, 300.0, 410.0])]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    assert bench._epoch_cost_estimate(str(tmp_path)) == 860.0


def test_source_hash_ignores_serialization_code(tmp_path):
    """The quality-checkpoint identity hash must NOT cover
    train/checkpoint.py: IO robustness fixes change how a checkpoint is
    written, not what the trained model is — hashing them would orphan
    pre-trained caches (round-4: the remote-save deadlock fix must not
    invalidate the 334k checkpoint)."""
    import pathlib
    base = bench._source_hash()
    p = pathlib.Path(bench.__file__).parent / "gdr_tpu/train/checkpoint.py"
    orig = p.read_bytes()
    try:
        p.write_bytes(orig + b"\n# hash-invariance probe\n")
        assert bench._source_hash() == base
    finally:
        p.write_bytes(orig)
    # control: a hashed source DOES change it
    q = pathlib.Path(bench.__file__).parent / "gdr_tpu/train/loop.py"
    orig_q = q.read_bytes()
    try:
        q.write_bytes(orig_q + b"\n# hash-invariance probe\n")
        assert bench._source_hash() != base
    finally:
        q.write_bytes(orig_q)
