"""The bench quality phase's operating-point resolution (bench.py
``_quality_scale``): defaults ← q_scale.json manifest ← GDR_BENCH_Q_* env.
The manifest is the resume-across-rounds lever toward the reference's
334k / t5-base / beam-100 point (BASELINE.md targets) — a silent fallback
to the small defaults would eval the wrong checkpoint, so the resolution
order is locked here."""

import json
import os
import sys

import pytest

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


@pytest.mark.slow
def test_quality_phase_warm_start_hook(monkeypatch, tmp_path, capsys):
    """GDR_BENCH_Q_T5_CKPT routes the bench quality phase through the
    product warm start (TrainLoop(warm_start=) -> convert.load_t5_encoder),
    and the workdir key reflects it (a warm-started checkpoint is a
    different artifact).  Donates an exported tiny encoder instead of a
    downloaded t5-base (VERDICT r4 next #1)."""
    import dataclasses

    import numpy as np

    monkeypatch.setenv("GDR_BENCH_STATE_DIR", str(tmp_path))
    monkeypatch.delenv("GDR_BENCH_Q_T5_CKPT", raising=False)
    out_cold = bench.quality_phase(tiny=True)
    assert "quality_recall10" in out_cold
    cold_dirs = {p.name for p in tmp_path.glob("q6_*")}

    # export a donor encoder with the exact shapes the tiny phase builds
    from gdr_tpu.config import ModelConfig
    from gdr_tpu.data.subword import SubwordTokenizer
    from gdr_tpu.models import convert
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    import jax
    tok = SubwordTokenizer(str(next(tmp_path.glob("tok_q5_*.json"))))
    sc = bench._quality_scale(tiny=True)
    mcfg = ModelConfig(kary=sc["kary"], max_output_length=sc["L"],
                       encoder_d_model=sc["dim"], vocab_size=tok.vocab_size,
                       adaptor_layer_num=2,
                       input_dropout=0.0).scaled(sc["preset"])
    donor = init_params(GenerativeRetriever(mcfg), jax.random.PRNGKey(42),
                        input_len=sc["seq_len"])
    sd = convert.export_t5_encoder(donor, mcfg.num_layers)
    npz = tmp_path / "donor_encoder.npz"
    np.savez(npz, **sd)

    monkeypatch.setenv("GDR_BENCH_Q_T5_CKPT", str(npz))
    capsys.readouterr()
    out_warm = bench.quality_phase(tiny=True)
    err = capsys.readouterr().err
    assert "warm-started T5 encoder" in err
    assert "quality_recall10" in out_warm
    warm_dirs = {p.name for p in tmp_path.glob("q6_*")} - cold_dirs
    assert warm_dirs, "warm start must key a distinct workdir"


def test_emit_sibling_banks(tmp_path):
    """Banked metrics from OTHER operating points' workdirs are emitted
    namespaced by doc count (quality334k_recall10, ...) — the active
    workdir, tiny workdirs, bankless or doccount-less banks are skipped.
    This is how a supervised 334k training reaches the round artifact
    while the live manifest stays at the warm-compiled 50k point."""
    active = tmp_path / "q6_aaa_50000_12_128_0.0003_small"
    sib = tmp_path / "q6_bbb_334314_8_128_0.00015_small"
    tiny = tmp_path / "q6_ccc_240_2_32_0.0003_tiny"
    nodocs = tmp_path / "q6_ddd_1000_2_32_0.0003_small"
    for d in (active, sib, tiny, nodocs):
        d.mkdir()
    (active / "banked_metrics.json").write_text(json.dumps(
        {"quality_recall10": 0.542, "quality_n_docs": 50000}))
    (sib / "banked_metrics.json").write_text(json.dumps(
        {"quality_recall10": 0.31, "quality_n_docs": 334314,
         "expansion_newdoc_recall10": 0.4, "oracle_recall10": 0.3,
         "quality_banked_at": 1.0, "unrelated_key": 7}))
    (tiny / "banked_metrics.json").write_text(json.dumps(
        {"quality_recall10": 0.9, "quality_n_docs": 240}))
    (nodocs / "banked_metrics.json").write_text(json.dumps(
        {"quality_recall10": 0.5}))

    got = {}
    bench._emit_sibling_banks(str(tmp_path), str(active), got.update)
    assert got == {"quality334k_recall10": 0.31,
                   "quality334k_n_docs": 334314,
                   "expansion334k_newdoc_recall10": 0.4,
                   "oracle334k_recall10": 0.3,
                   "quality334k_banked_at": 1.0}


def test_emit_sibling_banks_bad_json(tmp_path):
    active = tmp_path / "q6_aaa_50000_12_128_0.0003_small"
    bad = tmp_path / "q6_eee_99000_8_128_0.0001_small"
    active.mkdir(); bad.mkdir()
    (bad / "banked_metrics.json").write_text("{not json")
    got = {}
    bench._emit_sibling_banks(str(tmp_path), str(active), got.update)
    assert got == {}
