"""Op-level device trace of the retrieval exec / train step via jax.profiler.

Usage: python benchmarks/profile_trace.py [retrieve|train|train_fp32] ...

Dumps the top XLA ops by total device time (the tunnel supports device
tracing: events land under the /device:TPU:0 'XLA Ops' thread).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def summarize(trace_dir: str, top: int = 30) -> dict:
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    # find device pids and their "XLA Ops" tid
    dev_pids, tids = set(), {}
    pid = None
    for e in d["traceEvents"]:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid = e.get("pid")
            if "/device:" in str(e["args"].get("name", "")):
                dev_pids.add(pid)
        if (e.get("name") == "thread_name"
                and e["args"].get("name") == "XLA Ops"):
            tids[e.get("pid")] = e.get("tid")
    tot, cnt = defaultdict(float), defaultdict(int)
    total = 0.0
    for e in d["traceEvents"]:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and e.get("tid") == tids.get(e.get("pid"))):
            # strip trailing .N instance suffixes for grouping
            name = e["name"].rstrip("0123456789").rstrip(".")
            tot[name] += e.get("dur", 0)
            cnt[name] += 1
            total += e.get("dur", 0)
    log(f"total device op time: {total/1000:.2f} ms")
    out = {}
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        log(f"{v/1000:9.3f} ms  x{cnt[k]:<5d} {k[:100]}")
        out[k] = round(v / 1000, 3)
    return out


def trace_retrieve(trace_dir: str, fused: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_nq_scale_trie
    from gdr_tpu.config import ModelConfig
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops import beam as B
    from gdr_tpu.ops.packed_store import pack_layout, pack_rows
    from gdr_tpu.ops.rerank import rerank_packed

    cfg = ModelConfig().scaled("base")
    n_docs, beams, seq_len, b = 334_314, 100, 40, 32
    rng = np.random.default_rng(0)
    trie = build_nq_scale_trie(n_docs, cfg.kary, leaf_cap=30,
                               max_docs_per_cluster=64)
    children = jnp.asarray(trie.children)
    eos = jnp.asarray(trie.eos_allowed)
    starts, counts, row_to_doc, cap = pack_layout(trie)
    store = np.asarray(rng.normal(size=(n_docs, 768)), np.float32)
    packed = jnp.asarray(np.asarray(
        pack_rows(store, row_to_doc)), jnp.bfloat16)
    starts_j = jnp.asarray(starts)
    counts_j = jnp.asarray(counts)
    r2d = jnp.asarray(row_to_doc)
    con = jnp.asarray(trie.cluster_of_node)
    alphas = jnp.asarray([0.0, 1.0], jnp.float32)

    model = GenerativeRetriever(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), input_len=seq_len)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    # depth-cap like the Evaluator (trie depth + 1)
    max_len = min(cfg.max_output_length, int(trie.depth.max()) + 1)

    # U candidate table built OUTSIDE the per-exec jit (as Evaluator does)
    u_table = jax.jit(model.apply, static_argnums=(1,),
                      static_argnames=("method",))(
                          params, max_len, method=model.decode_tables)

    @jax.jit
    def run(params, ids, msk, u_table, packed, starts_j, counts_j, r2d, con,
            alphas):
        res, q, enc = B.generate_cids(model, params, ids, msk, children,
                                      eos, beams, max_len, 0.8,
                                      u_table=u_table, fused=fused)
        rr = rerank_packed(packed, starts_j, counts_j, r2d, cap, q,
                           res.nodes, res.scores, res.valid, con, alphas,
                           top_r=beams, use_pallas=True)
        return rr.doc_ids, rr.scores

    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (b, seq_len)),
                      jnp.int32)
    msk = jnp.ones((b, seq_len), jnp.int32)
    args = (u_table, packed, starts_j, counts_j, r2d, con, alphas)
    t0 = time.perf_counter()
    out = run(params, ids, msk, *args)
    np.asarray(out[0].ravel()[:1])
    log(f"compile+first: {time.perf_counter()-t0:.1f}s (max_len={max_len})")
    t0 = time.perf_counter()
    outs = [run(params, ids, msk, *args) for _ in range(4)]
    for o in outs:
        np.asarray(o[0].ravel()[:1])
    log(f"steady: {(time.perf_counter()-t0)/4*1e3:.1f} ms/exec (32 queries)")
    import jax.profiler
    with jax.profiler.trace(trace_dir):
        out = run(params, ids, msk, *args)
        np.asarray(out[0].ravel()[:1])


def trace_train(trace_dir: str, bf16: bool = True) -> None:
    import jax
    import jax.numpy as jnp

    from gdr_tpu.config import DataConfig, GDRConfig, ModelConfig, TrainConfig
    from gdr_tpu.models.gdr import GenerativeRetriever
    from gdr_tpu.train.trainer import init_train_state, make_train_step

    mcfg = ModelConfig().scaled("base")
    bsz, seq_len = 32, 40
    cfg = GDRConfig(model=mcfg,
                    train=TrainConfig(train_batch_size=bsz, bf16=bf16),
                    data=DataConfig())
    model = GenerativeRetriever(
        mcfg, dtype=jnp.bfloat16 if bf16 else jnp.float32)
    state, opt = init_train_state(cfg, model, None, jax.random.PRNGKey(0),
                                  total_steps=1000, input_len=seq_len)
    step_fn = make_train_step(model, None, opt, cfg, stage=1)
    rng = np.random.default_rng(1)
    L = mcfg.max_output_length
    labels = np.zeros((bsz, L), np.int32)
    labels[:, 0] = 2
    labels[:, 1] = mcfg.kary + 2
    labels[:, 2] = 1
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, mcfg.vocab_size,
                                              (bsz, seq_len)), jnp.int32),
        "attn_mask": jnp.ones((bsz, seq_len), jnp.int32),
        "labels": jnp.asarray(labels),
        "label_mask": jnp.asarray((labels != 0).astype(np.int32)),
        "pos_idx": jnp.asarray(np.arange(bsz, dtype=np.int32)),
        "cand_idx": jnp.asarray(rng.integers(0, 64, (bsz, 5)), jnp.int32),
        "cand_mask": jnp.ones((bsz, 5), bool),
    }
    store = jnp.asarray(rng.normal(size=(64, mcfg.encoder_d_model)),
                        jnp.float32)
    key = jax.random.PRNGKey(2)
    state, m = step_fn(state, batch, store, key)
    _ = float(m["loss"])
    for _ in range(2):
        state, m = step_fn(state, batch, store, key)
    _ = float(m["loss"])
    import jax.profiler
    with jax.profiler.trace(trace_dir):
        state, m = step_fn(state, batch, store, key)
        _ = float(m["loss"])


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    sel = sys.argv[1:] or ["retrieve"]
    for case in sel:
        trace_dir = f"/tmp/jxtrace_{case}"
        os.system(f"rm -rf {trace_dir}")
        if case == "retrieve":
            trace_retrieve(trace_dir)
        elif case == "retrieve_fused":
            trace_retrieve(trace_dir, fused=True)
        elif case == "train":
            trace_train(trace_dir, bf16=True)
        elif case == "train_fp32":
            trace_train(trace_dir, bf16=False)
        else:
            raise SystemExit(f"unknown case {case}")
        log(f"==== {case} top ops ====")
        summarize(trace_dir)


if __name__ == "__main__":
    main()
