"""Diagnose the fused-vs-XLA decode sequence mismatch on hardware.

Reports per-query top-1 agreement, full-beam agreement, and score deltas so
we can tell bf16 tie-breaking noise from a real kernel bug.

    python benchmarks/fused_parity_diag.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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

    dtype = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
    cfg = ModelConfig().scaled("base")
    trie = build_nq_scale_trie(334_314, cfg.kary, leaf_cap=30,
                               max_docs_per_cluster=64)
    model = GenerativeRetriever(cfg, dtype=dtype)
    params = init_params(model, jax.random.PRNGKey(0), input_len=40)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    children = jnp.asarray(trie.children)
    eos = jnp.asarray(trie.eos_allowed)
    max_len = min(cfg.max_output_length, int(trie.depth.max()) + 1)
    u_table = jax.jit(model.apply, static_argnums=(1,),
                      static_argnames=("method",))(
                          params, max_len, method=model.decode_tables)
    rng = np.random.default_rng(0)
    b, beams = (8, 100) if dtype == jnp.float32 else (32, 100)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (b, 40)), jnp.int32)
    msk = jnp.ones((b, 40), jnp.int32)

    def run(fused):
        @jax.jit
        def f(params, ids, msk, ut):
            res, q, enc = B.generate_cids(model, params, ids, msk, children,
                                          eos, beams, max_len, 0.8,
                                          u_table=ut, fused=fused)
            return res.sequences, res.scores
        seqs, scores = f(params, ids, msk, u_table)
        return np.asarray(seqs), np.asarray(scores)

    s_x, sc_x = run(False)
    s_f, sc_f = run(True)
    print(f"sequences shape {s_x.shape}, scores shape {sc_x.shape}")
    eq = np.all(s_x == s_f, axis=-1)  # [b, beams] whole-sequence match
    print(f"whole-beam agreement: {eq.mean():.4f}")
    print(f"top-1 agreement: {eq[:, 0].mean():.4f}")
    print(f"score max |delta|: {np.abs(sc_x - sc_f).max():.3e}")
    print(f"score mean |delta|: {np.abs(sc_x - sc_f).mean():.3e}")
    # Where they disagree, is the fused score for its own sequence close to
    # the xla score at the same rank (=> reranked ties), or way off (=> bug)?
    rank_delta = np.abs(np.sort(sc_x, -1) - np.sort(sc_f, -1)).max()
    print(f"sorted-scores max |delta| (rank-insensitive): {rank_delta:.3e}")
    # per-position token disagreement
    pos_dis = (s_x != s_f).mean(axis=(0, 1))
    print("per-position token disagreement:", np.round(pos_dis, 4))


if __name__ == "__main__":
    main()
