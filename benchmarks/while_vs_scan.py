"""Answer the round-3 TODO question: is the 14.2 ms `while` trace line the
early-exit loop's own overhead (→ switch the serving path to the scan tail)
or inclusive double-counting?

Times the fused retrieval exec with the early-exit while_loop vs the plain
lax.scan tail at the reference operating point.  On a balanced k-means trie
every path has the same depth, so both forms run the same number of decode
steps — any wall difference is pure loop machinery.

    python benchmarks/while_vs_scan.py
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
    from gdr_tpu.config import ModelConfig
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops import beam as B

    cfg = ModelConfig().scaled("base")
    trie = build_nq_scale_trie(334_314, cfg.kary, leaf_cap=30,
                               max_docs_per_cluster=64)
    model = GenerativeRetriever(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), input_len=40)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    children = jnp.asarray(trie.children)
    eos = jnp.asarray(trie.eos_allowed)
    max_len = min(cfg.max_output_length, int(trie.depth.max()) + 1)
    u_table = jax.jit(model.apply, static_argnums=(1,),
                      static_argnames=("method",))(
                          params, max_len, method=model.decode_tables)
    rng = np.random.default_rng(0)
    b, beams = 32, 100
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (b, 40)), jnp.int32)
    msk = jnp.ones((b, 40), jnp.int32)

    def run_case(name, early_exit, fused=True):
        @jax.jit
        def f(params, ids, msk, ut):
            res, q, enc = B.generate_cids(model, params, ids, msk, children,
                                          eos, beams, max_len, 0.8,
                                          u_table=ut, fused=fused,
                                          early_exit=early_exit)
            return res.sequences, res.scores
        t0 = time.perf_counter()
        seqs, scores = f(params, ids, msk, u_table)
        np.asarray(scores)
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        best = None
        for _ in range(8):
            t0 = time.perf_counter()
            seqs, scores = f(params, ids, msk, u_table)
            np.asarray(scores)
            dt = (time.perf_counter() - t0) * 1e3
            best = dt if best is None else min(best, dt)
        log(f"{name}: steady {best:.1f} ms/exec ({b} queries, beam {beams})")
        return best, np.asarray(seqs), np.asarray(scores)

    t_w, s_w, sc_w = run_case("while (early_exit=True)", True)
    t_s, s_s, sc_s = run_case("scan  (early_exit=False)", False)
    log(f"sequences identical: {np.array_equal(s_w, s_s)}, "
        f"scores max|Δ|: {np.abs(sc_w - sc_s).max():.2e}")
    log(f"delta: {t_w - t_s:+.1f} ms "
        f"({'scan wins — flip the serving default' if t_s < t_w - 0.5 else 'while fine'})")


if __name__ == "__main__":
    main()
