"""Multi-chip SPMD training demo — the user-facing mesh path.

Runs the SAME code a ``python -m gdr_tpu.cli train --mesh dp,mp`` invocation
takes (TrainLoop with a ``jax.sharding.Mesh``): batches sharded over the
``dp`` axis, parameters optionally column-sharded over ``mp``
(tensor parallel), the doc-embedding store row-sharded over the whole mesh,
and gradients reduced over ICI by the collectives XLA inserts — the
TPU-native equivalent of the reference's Lightning-DDP trainer wiring
(GDR_model/main.py:86-104, DistributedSampler main_models.py:1990,1999).

Self-contained: if the host exposes fewer than 8 devices it re-executes
itself on an 8-device virtual CPU platform, so the demo runs anywhere.
On a real v5e-8 (or any multi-chip host) it uses the actual chips.

    python examples/demo_mesh_train.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEVICES = 8


def _bootstrap_virtual_cpu() -> None:
    """Re-exec on an 8-device virtual CPU platform (same mechanism as
    tests/conftest.py) when the env doesn't already provide devices."""
    import re
    import subprocess

    has = ("cpu" in os.environ.get("JAX_PLATFORMS", "").lower()
           and (m := re.search(r"--xla_force_host_platform_device_count=(\d+)",
                               os.environ.get("XLA_FLAGS", "")))
           and int(m.group(1)) >= N_DEVICES)
    if has or os.environ.get("_GDR_DEMO_CHILD") == "1":
        return
    env = dict(os.environ, _GDR_DEMO_CHILD="1", JAX_PLATFORMS="cpu")
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={N_DEVICES}")
    env["XLA_FLAGS"] = " ".join(flags)
    raise SystemExit(subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env).returncode)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")   # demo default; drop on a pod
    import numpy as np

    from gdr_tpu.config import MeshConfig, tiny_config
    from gdr_tpu.data.dataset import TrainSet
    from gdr_tpu.data.synthetic import build_synthetic_task
    from gdr_tpu.eval.evaluator import EvalData
    from gdr_tpu.index.builder import Index
    from gdr_tpu.parallel.mesh import make_mesh
    from gdr_tpu.train.loop import TrainLoop

    dp, mp = 4, 2
    mesh = make_mesh(MeshConfig(dp=dp, mp=mp),
                     devices=jax.devices()[:dp * mp])
    print(f"mesh: {dict(mesh.shape)} over {dp * mp} "
          f"{jax.devices()[0].platform} devices")

    cfg = tiny_config(kary=3, max_output_length=5)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, train_batch_size=dp * 2,
                                  eval_batch_size=4, num_train_epochs=2,
                                  train_encoder_epoch=99, log_every_steps=4),
        eval=dataclasses.replace(cfg.eval, num_beams=4,
                                 num_return_sequences=4, score_rates=(0.0,)),
        mesh=dataclasses.replace(cfg.mesh, dp=dp, mp=mp, tp_min_size=256))
    task = build_synthetic_task(
        n_docs=24, dim=16, kary=3, leaf_cap=4, seq_len=8,
        vocab_size=cfg.model.vocab_size, max_output_length=5, seed=0)
    index = Index(store=task.store, trie=task.trie, paths=task.paths,
                  cid_of_doc=task.cid_of_doc)
    train_set = TrainSet(input_ids=task.input_ids, attn_mask=task.attn_mask,
                         labels=task.labels, label_mask=task.label_mask,
                         pos_idx=task.pos_idx,
                         source=["gtq"] * len(task.pos_idx))
    dev = EvalData(input_ids=task.input_ids, attn_mask=task.attn_mask,
                   gt_docs=task.gt_docs, gt_cids=task.gt_cids)

    with tempfile.TemporaryDirectory() as wd:
        loop = TrainLoop(cfg, index, train_set, dev, workdir=wd, seed=0,
                         mesh=mesh)
        best = loop.run()

    print(f"dp={dp} batch shards x mp={mp} param shards: "
          f"loss {loop.last_epoch_metrics['avg_train_loss']:.4f}, "
          f"dev recall1 {best.get('recall1', float('nan')):.3f}")
    u = loop.state.params["generator"]["params"]["pawa"]["u"]
    print(f"PAWA U sharding: {u.sharding.spec} "
          f"(column-parallel over mp={mp})")
    store_shards = {s.device for s in loop.store.addressable_shards}
    print(f"store sharded over {len(store_shards)} devices; "
          f"batch axis sharded over dp via shard_batch")
    assert np.isfinite(loop.last_epoch_metrics["avg_train_loss"])
    print("done.")


if __name__ == "__main__":
    _bootstrap_virtual_cpu()
    main()
