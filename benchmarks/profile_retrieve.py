"""Phase-level profiling of the retrieval path on real hardware.

Localises where the per-execution time of ``Evaluator.retrieve_many`` goes
(encode / beam decode / re-rank / composition) and how each phase scales
with the sub-batch size — the measurement TODO.md calls for before any
further decode-fusion work.

Usage:  python benchmarks/profile_retrieve.py [phase ...]
  phases: full32 full64 full128 decode32 decode64 decode128 rerank32
          encode32 (default: all)

Diagnostics to stderr; one JSON line with every measured number to stdout.
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


def timeit(fn, n=4, pipelined=True):
    """Median wall ms/call with `n` calls in flight (device throughput)."""
    out = fn()                      # warmup (compiled already by caller)
    _ = jax_block(out)
    t0 = time.perf_counter()
    if pipelined:
        results = [fn() for _ in range(n)]
        for r in results:
            _ = jax_block(r)
    else:
        for _ in range(n):
            _ = jax_block(fn())
    return (time.perf_counter() - t0) / n * 1e3


def jax_block(tree):
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    return np.asarray(leaves[0].ravel()[:1]) if leaves else None


def main() -> None:
    import jax
    import jax.numpy as jnp

    sel = set(sys.argv[1:]) or {
        "full32", "full64", "full128", "decode32", "decode64", "decode128",
        "rerank32", "encode32"}

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gdr_tpu.config import EvalConfig, ModelConfig
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops.beam import generate_cids

    from bench import build_nq_scale_trie

    log(f"devices: {jax.devices()}")
    cfg = ModelConfig().scaled("base")
    n_docs, beams, seq_len = 334_314, 100, 40

    rng = np.random.default_rng(0)
    trie = build_nq_scale_trie(n_docs, cfg.kary, leaf_cap=30,
                               max_docs_per_cluster=64)
    log(f"trie: {trie.num_nodes} nodes, {trie.num_clusters} clusters")

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

    ev_cfg = EvalConfig(num_beams=beams, num_return_sequences=beams,
                        max_output_length=cfg.max_output_length,
                        length_penalty=0.8)
    results: dict[str, float] = {}

    def ids_of(b):
        return (jnp.asarray(rng.integers(2, cfg.vocab_size, (b, seq_len)),
                            jnp.int32),
                jnp.ones((b, seq_len), jnp.int32))

    # ---------------- full retrieve at several mega-batch layouts ----------
    use_pallas = os.environ.get("GDR_PROF_PALLAS", "1") == "1"
    packed = os.environ.get("GDR_PROF_PACKED", "1") == "1"
    for name, (group, qbatch) in {"full32": (4, 32), "full64": (2, 64),
                                  "full128": (1, 128)}.items():
        if name not in sel:
            continue
        ev = Evaluator(model, trie, store, ev_cfg, packed=packed,
                       use_pallas=use_pallas)
        ids = jnp.asarray(rng.integers(2, cfg.vocab_size,
                                       (group, qbatch, seq_len)), jnp.int32)
        msk = jnp.ones((group, qbatch, seq_len), jnp.int32)
        t0 = time.perf_counter()
        out = ev.retrieve_many(params, ids, msk)
        jax_block(out)
        log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
        ms = timeit(lambda: ev.retrieve_many(params, ids, msk))
        qps = group * qbatch / ms * 1e3
        log(f"{name} (G={group} B={qbatch}): {ms:.1f} ms/exec "
            f"→ {qps:.0f} q/s")
        results[f"{name}_ms"] = round(ms, 1)
        results[f"{name}_qps"] = round(qps, 1)

    # ---------------- decode-only -------------------------------------------
    children = jnp.asarray(trie.children)
    eos = jnp.asarray(trie.eos_allowed)

    def make_decode(b):
        @jax.jit
        def run(params, ids, msk):
            res, q, enc = generate_cids(model, params, ids, msk, children,
                                        eos, beams, cfg.max_output_length,
                                        0.8)
            return res.sequences, res.scores, res.nodes, res.valid, q
        return run

    for name, b in {"decode32": 32, "decode64": 64, "decode128": 128}.items():
        if name not in sel:
            continue
        run = make_decode(b)
        ids, msk = ids_of(b)
        t0 = time.perf_counter()
        jax_block(run(params, ids, msk))
        log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
        ms = timeit(lambda: run(params, ids, msk))
        log(f"{name}: {ms:.1f} ms/exec → {b/ms*1e3:.0f} q/s decode-only")
        results[f"{name}_ms"] = round(ms, 1)

    # ---------------- encode-only / rerank-only at batch 32 -----------------
    if "encode32" in sel:
        @jax.jit
        def enc_only(params, ids, msk):
            enc = model.apply(params, ids, msk, method=model.encode)
            return model.apply(params, enc, method=model.query_embedding)

        ids, msk = ids_of(32)
        jax_block(enc_only(params, ids, msk))
        ms = timeit(lambda: enc_only(params, ids, msk))
        log(f"encode32: {ms:.1f} ms/exec")
        results["encode32_ms"] = round(ms, 1)

    if "rerank32" in sel:
        from gdr_tpu.ops.packed_store import pack_layout, pack_rows
        from gdr_tpu.ops.rerank import rerank_packed
        starts, counts, row_to_doc, cap = pack_layout(trie)
        p_starts, p_counts = jnp.asarray(starts), jnp.asarray(counts)
        p_rtd = jnp.asarray(row_to_doc)
        packed = pack_rows(store, row_to_doc)
        b = 32
        nodes = jnp.asarray(rng.choice(trie.cluster_node_ids, (b, beams)),
                            jnp.int32)
        scores = jnp.asarray(rng.normal(size=(b, beams)), jnp.float32)
        valid = jnp.ones((b, beams), bool)
        q = jnp.asarray(rng.normal(size=(b, cfg.encoder_d_model)),
                        jnp.float32)
        alphas = jnp.asarray(np.asarray(ev_cfg.score_rates, np.float32))
        con = jnp.asarray(trie.cluster_of_node)

        for pal in (True, False):
            run = jax.jit(lambda *a, _p=pal: rerank_packed(
                *a[:4], cap, *a[4:], top_r=beams, use_pallas=_p))
            args = (packed, p_starts, p_counts, p_rtd, q, nodes,
                    scores, valid, con, alphas)
            jax_block(run(*args))
            ms = timeit(lambda: run(*args))
            tag = "pallas" if pal else "xla"
            log(f"rerank32[{tag}]: {ms:.1f} ms/exec")
            results[f"rerank32_{tag}_ms"] = round(ms, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
