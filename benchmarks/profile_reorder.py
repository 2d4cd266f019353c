"""Isolate the beam-reorder cost outside the decode loop.

Measures, at B=32 K=100 (3200 rows), reordering 20 KV-cache buffers
[3200, H, L, dkv] by per-query beam indices: XLA row gather vs block one-hot
matmul vs a single stacked-buffer matmul; plus one decode_step_candidates
call in isolation.
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

    B, K, H, L, DKV = 32, 100, 12, 10, 64
    R = B * K
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # 12 self buffers (d_kv 64) + 8 pawa buffers (heads 8, d_kv 96)
    shapes = [(R, 12, L, 64)] * 12 + [(R, 8, L, 96)] * 8
    bufs = [jax.device_put(jax.random.normal(jax.random.fold_in(key, i),
                                             s, jnp.bfloat16))
            for i, s in enumerate(shapes)]
    beam_idx = jnp.asarray(rng.integers(0, K, (B, K)), jnp.int32)
    src = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)

    def timeit(fn, *args, n=6, tag=""):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        for o in outs:
            np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        ms = (time.perf_counter() - t0) / n * 1e3
        log(f"{tag}: {ms:.2f} ms")
        return ms

    @jax.jit
    def gather(src, *bufs):
        return [x[src] for x in bufs]

    @jax.jit
    def matmul(beam_idx, *bufs):
        onehot = jax.nn.one_hot(beam_idx, K, dtype=jnp.bfloat16)
        out = []
        for x in bufs:
            flat = x.reshape(B, K, -1)
            y = jnp.einsum("bki,bif->bkf", onehot, flat,
                           preferred_element_type=jnp.bfloat16)
            out.append(y.reshape(x.shape))
        return out

    timeit(gather, src, *bufs, tag="gather20")
    timeit(matmul, beam_idx, *bufs, tag="matmul20")

    # single stacked buffer (all 12 self caches as one array)
    big = jax.random.normal(key, (12, R, 12, L, 64), jnp.bfloat16)

    @jax.jit
    def matmul_stacked(beam_idx, big):
        onehot = jax.nn.one_hot(beam_idx, K, dtype=jnp.bfloat16)
        flat = big.reshape(12, B, K, -1)
        return jnp.einsum("bki,nbif->nbkf", onehot, flat,
                          preferred_element_type=jnp.bfloat16)

    @jax.jit
    def gather_stacked(src, big):
        return big[:, src]

    timeit(matmul_stacked, beam_idx, big, tag="matmul_stacked12")
    timeit(gather_stacked, src, big, tag="gather_stacked12")

    # pure copy floor: read+write the same bytes once
    @jax.jit
    def copy(*bufs):
        return [x + 1 for x in bufs]

    timeit(copy, *bufs, tag="copy20 (floor)")

    # one decode step at full width, in isolation
    from gdr_tpu.config import ModelConfig
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params

    cfg = ModelConfig().scaled("base")
    model = GenerativeRetriever(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), input_len=40)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, 40)), jnp.int32)
    msk = jnp.ones((B, 40), jnp.int32)

    @jax.jit
    def one_step(params, ids, msk, tok):
        enc = model.apply(params, ids, msk, method=model.encode)
        cache = model.apply(params, enc, L, K, method=model.init_cache)
        cand, cache = model.apply(params, tok, cache, msk,
                                  jnp.asarray(2, jnp.int32), K,
                                  method=model.decode_step_candidates)
        return cand

    tok = jnp.zeros((R,), jnp.int32)
    timeit(one_step, params, ids, msk, tok, tag="enc+init+1step")

    @jax.jit
    def enc_init(params, ids, msk):
        enc = model.apply(params, ids, msk, method=model.encode)
        cache = model.apply(params, enc, L, K, method=model.init_cache)
        return cache["tm_self_k_0"][0, :, 0]

    timeit(enc_init, params, ids, msk, tag="enc+init")


if __name__ == "__main__" and "tm" not in sys.argv:
    main()


def tm_variants() -> None:
    """Time-major [L, R, F] reorder variants (current production layout)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    log(f"devices: {jax.devices()}")
    B, K, L = 32, 100, 10
    R = B * K
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    shapes = [(L, R, 768)] * 20
    bufs = [jax.device_put(jax.random.normal(jax.random.fold_in(key, i),
                                             s, jnp.bfloat16))
            for i, s in enumerate(shapes)]
    beam_idx = jnp.asarray(rng.integers(0, K, (B, K)), jnp.int32)
    src = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)

    def timeit(fn, *args, n=6, tag=""):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        for o in outs:
            np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        log(f"{tag}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

    @jax.jit
    def tm_einsum(beam_idx, *bufs):
        onehot = jax.nn.one_hot(beam_idx, K, dtype=jnp.bfloat16)
        out = []
        for x in bufs:
            flat = x.reshape(L, B, K, -1)
            y = jnp.einsum("bki,lbif->lbkf", onehot, flat,
                           preferred_element_type=jnp.bfloat16)
            out.append(y.reshape(x.shape))
        return out

    @jax.jit
    def tm_gather(src, *bufs):
        return [x[:, src] for x in bufs]

    @jax.jit
    def tm_gather_flat(src, *bufs):
        # gather on the flattened [L*R, F] view with per-l offsets
        out = []
        idx = (jnp.arange(L)[:, None] * R + src[None, :]).reshape(-1)
        for x in bufs:
            f = x.reshape(L * R, -1)[idx]
            out.append(f.reshape(x.shape))
        return out

    @jax.jit
    def tm_copy(*bufs):
        return [x + 1 for x in bufs]

    big = jnp.stack(bufs)                       # [20, L, R, F]

    @jax.jit
    def tm_merged(beam_idx, big):
        onehot = jax.nn.one_hot(beam_idx, K, dtype=jnp.bfloat16)
        flat = big.reshape(20, L, B, K, -1)
        return jnp.einsum("bki,nlbif->nlbkf", onehot, flat,
                          preferred_element_type=jnp.bfloat16)

    @jax.jit
    def tm_concat_f(beam_idx, big):
        # one [L, B, K, 20*768] feature-concat einsum
        flat = jnp.transpose(big, (1, 2, 0, 3)).reshape(L, B, K, -1)
        onehot = jax.nn.one_hot(beam_idx, K, dtype=jnp.bfloat16)
        return jnp.einsum("bki,lbif->lbkf", onehot, flat,
                          preferred_element_type=jnp.bfloat16)

    timeit(tm_einsum, beam_idx, *bufs, tag="tm_einsum20")
    timeit(tm_gather, src, *bufs, tag="tm_gather20")
    timeit(tm_gather_flat, src, *bufs, tag="tm_gather_flat20")
    timeit(tm_copy, *bufs, tag="tm_copy20 (floor)")
    timeit(tm_merged, beam_idx, big, tag="tm_merged_stack")
    timeit(tm_concat_f, beam_idx, big, tag="tm_concat_features")


if __name__ == "__main__" and "tm" in sys.argv:
    tm_variants()
    sys.exit(0)
