"""Probe the throughput operating point: queries/s at sub-batch 32 vs 64.

The bench's mega-batch is group=4 sub-batches (lax.map) x qbatch queries;
larger sub-batches amortise the per-step beam glue over more rows but grow
the decode row count (qbatch x beam).  Decides bench.py's qbatch.

    python benchmarks/qbatch_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_nq_scale_trie
    from gdr_tpu.config import EvalConfig, ModelConfig
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params

    cfg = ModelConfig().scaled("base")
    n_docs, beams, seq_len = 334_314, 100, 40
    trie = build_nq_scale_trie(n_docs, cfg.kary, leaf_cap=30,
                               max_docs_per_cluster=64)

    @jax.jit
    def make_store(key):
        s = jax.random.normal(key, (n_docs, cfg.encoder_d_model), jnp.float32)
        s = s / jnp.linalg.norm(s, axis=1, keepdims=True)
        return s.astype(jnp.bfloat16)

    store = make_store(jax.random.PRNGKey(7))
    model = GenerativeRetriever(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), input_len=seq_len)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    rng = np.random.default_rng(0)

    ev_cfg = EvalConfig(num_beams=beams, num_return_sequences=beams,
                        max_output_length=cfg.max_output_length,
                        length_penalty=0.8, fused_decode=True)
    evaluator = Evaluator(model, trie, store, ev_cfg, packed=True,
                          use_pallas=True)

    for group, qbatch in ((4, 32), (2, 64), (4, 64)):
        iters = max(1, 768 // (group * qbatch))
        ids = jnp.asarray(rng.integers(2, cfg.vocab_size,
                                       (group, qbatch, seq_len)), jnp.int32)
        attn = jnp.ones((group, qbatch, seq_len), jnp.int32)
        t0 = time.perf_counter()
        res, rr = evaluator.retrieve_many(params, ids, attn)
        np.asarray(rr.doc_ids)
        log(f"g{group} q{qbatch}: compile+first "
            f"{time.perf_counter() - t0:.1f}s")
        queries = [jnp.asarray(rng.integers(2, cfg.vocab_size,
                                            (group, qbatch, seq_len)),
                               jnp.int32) for _ in range(iters)]
        t0 = time.perf_counter()
        inflight = [evaluator.retrieve_many(params, q, attn)
                    for q in queries]
        for res, rr in inflight:
            rr.doc_ids.copy_to_host_async()
        for res, rr in inflight:
            np.asarray(rr.doc_ids)
        total = time.perf_counter() - t0
        qps = iters * group * qbatch / total
        log(f"g{group} q{qbatch}: {qps:.1f} q/s "
            f"({iters} execs, {total*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
