"""Ablation profiling of the beam-decode step on real hardware.

Separates the decode cost into: decoder core (layers), PAWA adaptor,
cache reorder gathers, beam bookkeeping, and step count — to find the
pathological component behind the ~25 ms/step full-width cost.

Usage:  python benchmarks/profile_decode.py [case ...]
"""

from __future__ import annotations

import json
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

    import dataclasses

    from gdr_tpu.config import ModelConfig
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops import beam as B
    from bench import build_nq_scale_trie

    sel = set(sys.argv[1:]) or {"base", "noreorder", "nopawa", "scan10",
                                "nonprog", "core", "k50"}

    log(f"devices: {jax.devices()}")
    cfg = ModelConfig().scaled("base")
    n_docs, beams, seq_len = 334_314, 100, 40
    rng = np.random.default_rng(0)
    trie = build_nq_scale_trie(n_docs, cfg.kary, leaf_cap=30,
                               max_docs_per_cluster=64)
    children = jnp.asarray(trie.children)
    eos = jnp.asarray(trie.eos_allowed)

    def make(model_cfg):
        model = GenerativeRetriever(model_cfg, dtype=jnp.bfloat16)
        params = init_params(model, jax.random.PRNGKey(0), input_len=seq_len)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)
        return model, params

    model, params = make(cfg)
    b = 32
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (b, seq_len)),
                      jnp.int32)
    msk = jnp.ones((b, seq_len), jnp.int32)

    results = {}

    def bench_decode(name, model, params, **kw):
        @jax.jit
        def run(params, ids, msk):
            res, q, enc = B.generate_cids(model, params, ids, msk, children,
                                          eos, kw.pop("beams", beams),
                                          cfg.max_output_length, 0.8, **kw)
            return res.sequences, res.scores, res.nodes, res.valid

        t0 = time.perf_counter()
        out = run(params, ids, msk)
        np.asarray(out[0].ravel()[:1])
        log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
        outs = None
        t0 = time.perf_counter()
        outs = [run(params, ids, msk) for _ in range(6)]
        for o in outs:
            np.asarray(o[0].ravel()[:1])
        ms = (time.perf_counter() - t0) / 6 * 1e3
        log(f"{name}: {ms:.1f} ms/exec")
        results[name] = round(ms, 1)

    if "base" in sel:
        bench_decode("base", model, params)
    if "k50" in sel:
        bench_decode("k50", model, params, beams=50)
    if "nonprog" in sel:
        bench_decode("nonprog", model, params, progressive=False)
    if "noreorder" in sel:
        # non-progressive (the reorder is what grows a progressive cache)
        orig = B._reorder_cache
        B._reorder_cache = lambda cache, *a: cache    # timing-only: wrong math
        try:
            bench_decode("noreorder", model, params, progressive=False)
        finally:
            B._reorder_cache = orig
    if "nopawa" in sel:
        cfg_np = dataclasses.replace(cfg, adaptor_decode=False)
        m2, p2 = make(cfg_np)
        bench_decode("nopawa", m2, p2)
    if "scan10" in sel:
        # force all 10 steps (no early exit) to get per-step cost
        @jax.jit
        def run10(params, ids, msk):
            enc = model.apply(params, ids, msk, method=model.encode)
            cache = model.apply(params, enc, cfg.max_output_length, beams,
                                method=model.init_cache)

            def step_fn(cur, cache, pos, width):
                return model.apply(params, cur, cache, msk, pos, width,
                                   method=model.decode_step_candidates)

            res = B.beam_search(step_fn, cache, b, beams, cfg.kary,
                                cfg.max_output_length, children, eos, 0.8,
                                early_exit=False, candidates_mode=True,
                                progressive=False)
            return res.sequences, res.scores

        t0 = time.perf_counter()
        np.asarray(run10(params, ids, msk)[0].ravel()[:1])
        log(f"scan10: compile+first {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        outs = [run10(params, ids, msk) for _ in range(6)]
        for o in outs:
            np.asarray(o[0].ravel()[:1])
        ms = (time.perf_counter() - t0) / 6 * 1e3
        log(f"scan10: {ms:.1f} ms/exec (10 fixed full-width steps)")
        results["scan10"] = round(ms, 1)

    if "core" in sel:
        # decoder core alone: 10 chained decode steps at full width, no
        # beam bookkeeping, no reorder — the model-side floor
        @jax.jit
        def core(params, ids, msk):
            enc = model.apply(params, ids, msk, method=model.encode)
            cache = model.apply(params, enc, cfg.max_output_length, beams,
                                method=model.init_cache)
            tok = jnp.zeros((b * beams,), jnp.int32)

            def body(carry, pos):
                tok, cache = carry
                cand, cache = model.apply(params, tok, cache, msk, pos,
                                          beams,
                                          method=model.decode_step_candidates)
                tok = (pos * cfg.kary + 2
                       + jnp.argmax(cand[:, :cfg.kary], axis=1))
                return (tok, cache), cand[:, 0]

            (_, _), outs = jax.lax.scan(
                body, (tok, cache), jnp.arange(10, dtype=jnp.int32))
            return outs

        t0 = time.perf_counter()
        np.asarray(core(params, ids, msk).ravel()[:1])
        log(f"core: compile+first {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        outs = [core(params, ids, msk) for _ in range(6)]
        for o in outs:
            np.asarray(o.ravel()[:1])
        ms = (time.perf_counter() - t0) / 6 * 1e3
        log(f"core: {ms:.1f} ms/exec (10 steps, no beam logic/reorder)")
        results["core"] = round(ms, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
