"""End-to-end demo on a synthetic corpus — no data or network needed.

Builds a small world (blob-structured docs → on-device k-means → CID trie),
trains the generative retriever to memorise query→CID, then runs
trie-constrained beam retrieval with dense re-rank, corpus expansion, and
prints the metric suite.  Runs on CPU in a couple of minutes:

    JAX_PLATFORMS=cpu python examples/demo_synthetic.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.data.synthetic import batch_slice, build_synthetic_task
from gdr_tpu.eval.evaluator import EvalData, Evaluator
from gdr_tpu.index.builder import Index
from gdr_tpu.index.expand import expand_index
from gdr_tpu.models.gdr import GenerativeRetriever
from gdr_tpu.train.trainer import init_train_state, make_train_step


def main() -> None:
    cfg = tiny_config(kary=3, max_output_length=5)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dropout_rate=0.0),
        train=dataclasses.replace(cfg.train, learning_rate=5e-3,
                                  decoder_learning_rate=5e-3),
        eval=dataclasses.replace(cfg.eval, num_beams=4,
                                 num_return_sequences=4,
                                 score_rates=(0.0, 1.0)))

    print("1. building synthetic corpus + on-device k-means index ...")
    task = build_synthetic_task(n_docs=24, dim=16, kary=3, leaf_cap=4,
                                seq_len=8, vocab_size=cfg.model.vocab_size,
                                max_output_length=5, seed=0)
    print(f"   {len(task.store)} docs, {task.trie.num_clusters} clusters, "
          f"{task.trie.num_nodes} trie nodes")

    print("2. training (stage 1: cached doc embeddings) ...")
    model = GenerativeRetriever(cfg.model)
    state, opt = init_train_state(cfg, model, None, jax.random.PRNGKey(0),
                                  total_steps=1000, input_len=8)
    step_fn = make_train_step(model, None, opt, cfg, stage=1)
    batch = {k: jnp.asarray(v)
             for k, v in batch_slice(task, np.arange(24)).items()}
    store = jnp.asarray(task.store)
    t0 = time.time()
    for i in range(150):
        state, m = step_fn(state, batch, store, jax.random.PRNGKey(1))
    print(f"   150 steps in {time.time()-t0:.1f}s, "
          f"loss {float(m['loss']):.3f} (ce {float(m['ce']):.3f})")

    print("3. retrieval: constrained beam decode + dense re-rank ...")
    evaluator = Evaluator(model, task.trie, task.store, cfg.eval, packed=True)
    data = EvalData(input_ids=task.input_ids, attn_mask=task.attn_mask,
                    gt_docs=task.gt_docs, gt_cids=task.gt_cids)
    out = evaluator.evaluate(state.params["generator"], data, batch_size=8)
    for key in ("cluster_accuracy1", "recall1", "accuracy100_0.0", "MRR100_0.0"):
        print(f"   {key}: {out[key]:.3f}")

    print("4. corpus expansion without retraining ...")
    index = Index(store=task.store, trie=task.trie, paths=task.paths,
                  cid_of_doc=task.cid_of_doc)
    clones = task.store[:3] + 0.01 * np.random.default_rng(7).normal(
        size=(3, task.store.shape[1])).astype(np.float32)
    bigger = expand_index(index, clones)
    print(f"   {len(index.paths)} → {len(bigger.paths)} docs; new docs joined "
          f"clusters {bigger.cid_of_doc[-3:]}")
    ev2 = Evaluator(model, bigger.trie, bigger.store, cfg.eval)
    res, rr = ev2.retrieve(state.params["generator"], task.input_ids[:1],
                           task.attn_mask[:1])
    docs = [int(d) for d, v in zip(np.asarray(rr.doc_ids)[0, 0],
                                   np.asarray(rr.doc_valid)[0, 0]) if v]
    print(f"   query-for-doc-0 now retrieves: {docs[:6]} "
          f"(24 = doc 0's clone)")
    print("done.")


if __name__ == "__main__":
    sys.exit(main())
