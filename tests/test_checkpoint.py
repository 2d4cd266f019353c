import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.train.checkpoint import CheckpointManager


def _state(v):
    return {"params": {"w": jnp.full((4,), v)}, "step": jnp.asarray(v, jnp.int32)}


def test_save_restore_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="recall1",
                            mode="max", save_top_k=1)
    mgr.save(1, _state(1.0), {"recall1": 0.3})
    mgr.save(2, _state(2.0), {"recall1": 0.6})
    mgr.save(3, _state(3.0), {"recall1": 0.4})
    step, restored = mgr.restore_best(_state(0.0))
    assert step == 2
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.0)
    mgr.close()


def test_restore_latest_resume(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="avg_train_loss",
                            mode="min", save_top_k=2)
    mgr.save(5, _state(5.0), {"avg_train_loss": 1.0})
    mgr.save(6, _state(6.0), {"avg_train_loss": 0.5})
    step, restored, preempted = mgr.restore_latest(_state(0.0))
    assert step == 6 and not preempted
    assert int(restored["step"]) == 6
    mgr.close()


def test_restore_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    step, restored, preempted = mgr.restore_latest(_state(9.0))
    assert step is None and not preempted
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 9.0)
    mgr.close()


def test_preemption_save_survives_best_k_gc(tmp_path):
    """ADVICE round 1: a preemption save routed through the best-k manager
    scores -inf on the monitored metric and is GC'd immediately; the
    dedicated save_preemption path must survive and win restore_latest."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="recall1",
                            mode="max", save_top_k=1)
    mgr.save(1, _state(1.0), {"recall1": 0.9})     # best checkpoint
    mgr.save_preemption(3, _state(3.0))            # mid-epoch preemption
    step, restored, preempted = mgr.restore_latest(_state(0.0))
    assert step == 3 and preempted
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 3.0)
    # best checkpoint is untouched
    step, best = mgr.restore_best(_state(0.0))
    assert step == 1
    mgr.close()


def test_preemption_tie_prefers_regular(tmp_path):
    """Same step number: the regular (post-eval) checkpoint was written
    later in the epoch than the mid-epoch preemption point."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="recall1",
                            mode="max", save_top_k=1)
    mgr.save_preemption(2, _state(20.0))
    mgr.save(2, _state(2.0), {"recall1": 0.9})
    step, restored, preempted = mgr.restore_latest(_state(0.0))
    assert step == 2 and not preempted
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.0)
    mgr.close()


def test_async_checkpointing_roundtrip(tmp_path):
    """async_save: save returns without blocking; restore flushes the
    in-flight write and reads back the same state."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="recall1",
                            mode="max", save_top_k=2, async_save=True)
    mgr.save(1, _state(1.0), {"recall1": 0.2})
    mgr.save(2, _state(2.0), {"recall1": 0.7})
    step, restored, preempted = mgr.restore_latest(_state(0.0))
    assert step == 2
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.0)
    step, best = mgr.restore_best(_state(0.0))
    assert step == 2
    mgr.close()


def test_saved_checkpoint_is_host_pytree(tmp_path):
    """Round-4 deadlock fix: the save path must hand orbax a pure-host
    pytree (serialization never touches the device — on a remote/tunneled
    platform orbax's own device fetches deadlocked mid-save).  A raw
    restore of such a checkpoint yields numpy leaves with no device
    shardings, which also makes cross-platform reads (TPU-written →
    CPU-read) safe by construction."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="recall1",
                            mode="max", save_top_k=1)
    state = {"params": {"w": jnp.arange(6.0)},   # device array in, ...
             "step": jnp.asarray(3, jnp.int32)}
    mgr.save(3, state, {"recall1": 0.5})
    step, raw = mgr.restore_raw()
    assert step == 3
    leaves = jax.tree_util.tree_leaves(raw)
    assert leaves and all(isinstance(l, np.ndarray) for l in leaves)
    np.testing.assert_allclose(raw["params"]["w"], np.arange(6.0))
    mgr.close()


def test_fetch_leaf_passthrough_and_watchdog():
    from gdr_tpu.train.checkpoint import _fetch_leaf
    np.testing.assert_allclose(_fetch_leaf(np.ones(3)), np.ones(3))
    assert _fetch_leaf(7) == 7
    out = _fetch_leaf(jnp.full((2, 2), 5.0))
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(out, 5.0)
