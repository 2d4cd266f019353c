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
    step, restored = mgr.restore_latest(_state(0.0))
    assert step == 6
    assert int(restored["step"]) == 6
    mgr.close()


def test_restore_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    step, restored = mgr.restore_latest(_state(9.0))
    assert step is None
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 9.0)
    mgr.close()
