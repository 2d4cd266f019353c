"""Hardware-window preflight: run this FIRST when the TPU tunnel is up.

One command that (1) confirms the platform/backend identity the fused
kernels key on, (2) times the retrieval exec for the three decode paths
(XLA / fused decoder / fused decoder+PAWA) on the real chip, and (3) prints
the verdict for flipping GDR_BENCH_FUSED_PAWA.

    python benchmarks/hw_preflight.py
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

    log(f"devices: {jax.devices()}")
    log(f"default_backend: {jax.default_backend()!r} "
        f"(fused kernels compile iff this == 'tpu'; device platform: "
        f"{jax.devices()[0].platform!r})")

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

    def run_case(name, fused):
        @jax.jit
        def f(params, ids, msk, ut):
            res, q, enc = B.generate_cids(model, params, ids, msk, children,
                                          eos, beams, max_len, 0.8,
                                          u_table=ut, fused=fused)
            return res.sequences, res.scores
        t0 = time.perf_counter()
        try:
            seqs, scores = f(params, ids, msk, u_table)
            np.asarray(scores)
        except Exception as e:
            log(f"{name}: FAILED ({type(e).__name__}: {e})")
            return None, None
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        best = None
        for _ in range(6):
            t0 = time.perf_counter()
            seqs, scores = f(params, ids, msk, u_table)
            np.asarray(scores)
            dt = (time.perf_counter() - t0) * 1e3
            best = dt if best is None else min(best, dt)
        log(f"{name}: steady {best:.1f} ms/exec ({b} queries, beam {beams})")
        return best, np.asarray(seqs)

    t_xla, s_xla = run_case("xla", False)
    t_f, s_f = run_case("fused", True)
    # (a fused+pawa case existed through round 4; the PAWA sublayer kernels
    # measured slower than XLA twice and were removed — PARITY.md)

    def parity(name, s_other):
        # On untrained weights, beams are near-ties and bf16 accumulation-
        # order differences reshuffle them (decode_kernel.py docstring);
        # top-1 agreement + small sorted-score delta is the healthy signal,
        # exact sequence equality is not expected at bf16.  Use
        # benchmarks/fused_parity_diag.py for the detailed breakdown.
        eq = np.all(s_xla == s_other, axis=-1)
        log(f"{name} vs xla: top-1 agreement {eq[:, 0].mean():.3f}, "
            f"whole-beam {eq.mean():.3f} "
            f"(bf16 tie reshuffle expected on untrained weights)")

    if s_f is not None and s_xla is not None:
        parity("fused", s_f)
    if t_f is not None and t_xla is not None:
        verdict = ("keep fused_decode on" if t_f < t_xla
                   else "fused decode regressed - investigate")
        log(f"verdict: {verdict} (xla {t_xla:.1f} ms vs fused {t_f:.1f} ms)")


if __name__ == "__main__":
    main()
