"""Unit tests for the supervised quality runner's watchdog helpers.

The supervisor (benchmarks/supervise_quality.py) guards the bench quality
phase against tunnel stalls by watching progress mtimes and deciding when a
kill is safe (a finalized checkpoint exists to resume from).  A bug in
these helpers costs an entire quality training window, so they are locked
here: progress detection must see every artifact the child updates, must
NOT be masked by concurrent tiny-scale runs sharing the state dir, and the
resumable-checkpoint test must ignore orbax's in-progress ``-tmp`` dirs.
"""

import importlib.util
import json
import os
import time

import pytest

pytestmark = pytest.mark.fast

_SPEC = importlib.util.spec_from_file_location(
    "supervise_quality",
    os.path.join(os.path.dirname(__file__), os.pardir, "benchmarks",
                 "supervise_quality.py"))
sq = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sq)


@pytest.fixture()
def state(tmp_path, monkeypatch):
    monkeypatch.setattr(sq, "STATE", str(tmp_path))
    return tmp_path


def _touch(path, mtime):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("x")
    os.utime(path, (mtime, mtime))
    return path


def test_last_json_line_merges_and_survives_noise(tmp_path):
    p = tmp_path / "out.json"
    p.write_text("devices: [TPU]\n"
                 '{"a": 1, "b": 1}\n'
                 "not json {\n"
                 '{"b": 2}\n')
    assert sq.last_json_line(str(p)) == {"a": 1, "b": 2}


def test_last_json_line_missing_file(tmp_path):
    assert sq.last_json_line(str(tmp_path / "nope.json")) == {}


def test_has_resumable_ckpt_ignores_tmp_and_empty(state):
    ck = state / "q5_abc_334314_10_128_0.0003_base" / "ckpt"
    (ck / "5-tmp").mkdir(parents=True)          # orbax in-progress write
    _touch(ck / "5-tmp" / "data", time.time())
    (ck / "7").mkdir()                          # finalized but empty
    assert not sq._has_resumable_ckpt()
    _touch(ck / "7" / "data", time.time())      # finalized with content
    assert sq._has_resumable_ckpt()


def test_has_resumable_ckpt_ignores_tiny_workdirs(state):
    ck = state / "q5_abc_240_2_32_0.0003_tiny" / "ckpt"
    (ck / "1").mkdir(parents=True)
    _touch(ck / "1" / "data", time.time())
    assert not sq._has_resumable_ckpt()


def test_newest_progress_sees_metrics_and_ckpt(state, tmp_path):
    out = _touch(tmp_path / "o.json", 1000.0)
    log = _touch(tmp_path / "l.log", 1001.0)
    wd = state / "q5_abc_334314_10_128_0.0003_base"
    _touch(wd / "train.metrics.jsonl", 2000.0)
    assert sq.newest_progress_ts(str(out), str(log)) == 2000.0
    # the watcher globs ckpt*/<step-dir> — an orbax write updates the step
    # dir's own mtime, which is what counts as progress
    _touch(wd / "ckpt" / "3" / "data", 3000.0)
    os.utime(wd / "ckpt" / "3", (3000.0, 3000.0))
    assert sq.newest_progress_ts(str(out), str(log)) == 3000.0


def test_newest_progress_not_masked_by_tiny_runs(state, tmp_path):
    """A live tiny-scale run writing its own metrics must not hide a stall
    of the supervised base-scale child (the *_base* glob filter)."""
    out = _touch(tmp_path / "o.json", 1000.0)
    log = _touch(tmp_path / "l.log", 1000.0)
    base = state / "q5_abc_334314_10_128_0.0003_base"
    _touch(base / "train.metrics.jsonl", 1500.0)
    tiny = state / "q5_abc_240_2_32_0.0003_tiny"
    _touch(tiny / "train.metrics.jsonl", 9e9)   # "future" tiny activity
    assert sq.newest_progress_ts(str(out), str(log)) == 1500.0


def test_base_decfuse_workdir_counts_as_base(state, tmp_path):
    """The decfuse checkpoint trains in a `<workdir>_decfuse` sibling; at
    base scale its progress is the supervised child's progress too."""
    out = _touch(tmp_path / "o.json", 1000.0)
    wd = state / "q5_abc_334314_10_128_0.0003_base_decfuse"
    _touch(wd / "train.metrics.jsonl", 4000.0)
    assert sq.newest_progress_ts(str(out), str(out)) == 4000.0


def test_full_scale_includes_small_preset(state, tmp_path):
    """The 50k operating point trains under a *_small workdir — its
    progress and checkpoints must be visible to the watchdog (a
    *_base-only filter would false-stall and restart it forever)."""
    out = _touch(tmp_path / "o.json", 1000.0)
    wd = state / "q5_abc_50000_12_128_0.0003_small"
    _touch(wd / "train.metrics.jsonl", 5000.0)
    assert sq.newest_progress_ts(str(out), str(out)) == 5000.0
    assert not sq._has_resumable_ckpt()
    (wd / "ckpt" / "4").mkdir(parents=True)
    _touch(wd / "ckpt" / "4" / "data", 6000.0)
    assert sq._has_resumable_ckpt()


def test_has_resumable_ckpt_ignores_stale_runs(state):
    """A finalized checkpoint from a PREVIOUS run (older than the
    supervisor's start) must not count — it once shrank the stall
    threshold while a fresh run was still compiling, killing it."""
    ck = state / "q5_old_334314_10_128_0.0003_base" / "ckpt"
    (ck / "9").mkdir(parents=True)
    _touch(ck / "9" / "data", 100.0)
    os.utime(ck / "9", (100.0, 100.0))
    assert sq._has_resumable_ckpt()                 # absolute: it exists
    assert not sq._has_resumable_ckpt(since=200.0)  # but not for this run
    os.utime(ck / "9", (300.0, 300.0))
    assert sq._has_resumable_ckpt(since=200.0)
