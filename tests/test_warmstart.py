"""Pretrained warm-start through the product path.

The reference copies pretrained t5-base encoder/shared weights into its
model before training (main_models.py:786-793) and injects BERT/AR2 weights
into the doc tower (:66-75).  These tests prove the gdr_tpu equivalents are
user-reachable and actually help:

- an e2e TrainLoop comparison: a run warm-started from a trained donor
  encoder beats the from-scratch run on the synthetic task within EQUAL
  epochs (VERDICT r3 Missing #1 done-criterion);
- the CLI wiring: ``train --t5-ckpt donor.npz`` round-trips an
  ``export_t5_encoder`` dump into a product run.
"""

import dataclasses
import json
import os

import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.data.dataset import TrainSet
from gdr_tpu.data.synthetic import build_synthetic_task
from gdr_tpu.eval.evaluator import EvalData
from gdr_tpu.index.builder import Index
from gdr_tpu.models.convert import (export_t5_encoder, load_t5_encoder,
                                    state_dict_from_pretrained)
from gdr_tpu.train.loop import TrainLoop


def _world(epochs: int):
    cfg = tiny_config(kary=3, max_output_length=5)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dropout_rate=0.0),
        train=dataclasses.replace(cfg.train, train_batch_size=6,
                                  eval_batch_size=6,
                                  num_train_epochs=epochs,
                                  train_encoder_epoch=99,
                                  learning_rate=3e-3,
                                  decoder_learning_rate=3e-3),
        eval=dataclasses.replace(cfg.eval, num_beams=4,
                                 num_return_sequences=4,
                                 score_rates=(0.0,)))
    task = build_synthetic_task(n_docs=24, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=cfg.model.vocab_size,
                                max_output_length=5, seed=0)
    index = Index(store=task.store, trie=task.trie, paths=task.paths,
                  cid_of_doc=task.cid_of_doc)
    ts = TrainSet(input_ids=task.input_ids, attn_mask=task.attn_mask,
                  labels=task.labels, label_mask=task.label_mask,
                  pos_idx=task.pos_idx, source=["gtq"] * len(task.pos_idx))
    dev = EvalData(input_ids=task.input_ids, attn_mask=task.attn_mask,
                   gt_docs=task.gt_docs, gt_cids=task.gt_cids)
    return cfg, index, ts, dev


def test_warm_start_beats_from_scratch(tmp_path):
    """Equal-epoch comparison: donor-encoder warm start must reach a lower
    train loss (and no worse recall) than from-scratch."""
    # donor: train the same task long enough that its encoder carries signal
    cfg, index, ts, dev = _world(epochs=6)
    donor = TrainLoop(cfg, index, ts, dev, workdir=str(tmp_path / "donor"),
                      seed=1, eval_every=6)
    donor.run()
    sd = export_t5_encoder(donor.state.params["generator"],
                           cfg.model.num_layers)

    def warm(params):
        params = dict(params)
        params["generator"] = load_t5_encoder(params["generator"], sd,
                                              cfg.model.num_layers)
        return params

    cfg2, index, ts, dev = _world(epochs=2)
    cold = TrainLoop(cfg2, index, ts, dev, workdir=str(tmp_path / "cold"),
                     seed=0, eval_every=2)
    cold_best = cold.run()
    warm_loop = TrainLoop(cfg2, index, ts, dev,
                          workdir=str(tmp_path / "warm"), seed=0,
                          eval_every=2, warm_start=warm)
    warm_best = warm_loop.run()

    cold_loss = cold.last_epoch_metrics["avg_train_loss"]
    warm_loss = warm_loop.last_epoch_metrics["avg_train_loss"]
    assert warm_loss < cold_loss, (warm_loss, cold_loss)
    assert warm_best["recall1"] >= cold_best["recall1"], \
        (warm_best, cold_best)


def test_cli_t5_ckpt_npz_round_trip(tmp_path, capsys):
    """`train --t5-ckpt donor.npz` loads an export_t5_encoder dump into the
    product run (flags must describe the donor's architecture)."""
    from gdr_tpu import cli
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    import jax

    # files for a tiny CLI run
    docs = [(f"Doc{i}", f"topic {i % 3} words document {i}")
            for i in range(12)]
    with open(tmp_path / "docs.tsv", "w") as fh:
        for t, x in docs:
            fh.write(f"{t}\t{x}\n")
    with open(tmp_path / "train.tsv", "w") as fh:
        for i in range(12):
            fh.write(f"find topic {i % 3} item {i}\t{i}\n")
    cli.main(["index", "--corpus", str(tmp_path / "docs.tsv"),
              "--out", str(tmp_path / "index.npz"), "--kary", "3",
              "--leaf-cap", "6", "--encoder-max-len", "16",
              "--encoder-size", "tiny", "--batch-size", "4"])

    # donor npz shaped exactly as the CLI will build the model:
    # tiny preset + the same flags, encoder_d_model = the index store dim
    from gdr_tpu.index.io import load_index
    store_dim = load_index(str(tmp_path / "index.npz")).store.shape[1]
    mcfg = dataclasses.replace(
        cli._model_config(_Args(), store_dim=store_dim))
    model = GenerativeRetriever(mcfg)
    params = init_params(model, jax.random.PRNGKey(7), input_len=12)
    sd = export_t5_encoder(params, mcfg.num_layers)
    marker = np.full_like(np.asarray(sd["shared.weight"]), 0.01230)
    sd["shared.weight"] = marker
    np.savez(tmp_path / "donor.npz", **sd)
    loaded = state_dict_from_pretrained(str(tmp_path / "donor.npz"))
    np.testing.assert_array_equal(loaded["shared.weight"], marker)

    capsys.readouterr()
    cli.main(["train", "--index", str(tmp_path / "index.npz"),
              "--train", str(tmp_path / "train.tsv"),
              "--dev", str(tmp_path / "train.tsv"),
              "--workdir", str(tmp_path / "run"), "--model-size", "tiny",
              "--kary", "3", "--max-output-length", "5",
              "--max-input-length", "12", "--batch-size", "6",
              "--epochs", "1", "--beam", "4", "--adaptor-layers", "1",
              "--t5-ckpt", str(tmp_path / "donor.npz")])
    out = capsys.readouterr().out
    assert "warm-started T5 encoder" in out
    assert os.path.exists(tmp_path / "run" / "ckpt")
    with open(tmp_path / "run" / "train.metrics.jsonl") as fh:
        rows = [json.loads(line) for line in fh]
    assert any(np.isfinite(r.get("avg_train_loss", np.nan)) for r in rows)


class _Args:
    """The model flags test_cli_t5_ckpt_npz_round_trip passes to the CLI."""
    model_size = "tiny"
    kary = 3
    max_output_length = 5
    no_adaptor = False
    adaptor_layers = 1
    rdrop = 0.1
