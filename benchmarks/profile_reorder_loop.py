"""Why does the beam reorder cost ~4x its bandwidth floor INSIDE the loop?

Isolated (one dispatch per reorder) the flat-2-D gather of 20 time-major
[10, 3200, 768] bf16 buffers runs near the copy floor (~5 ms device after
subtracting the tunnel dispatch constant).  But in the decode loop the same
reorder shows up as ~19 ms/step (scan10 vs core in profile_decode.py).

Cases (all: one jit containing a 10-step lax.scan, 6 timed executions):
  scan_copy     carry 20 bufs, body = x + 1                    (floor)
  scan_gather   carry 20 bufs, body = flat-2-D row gather      (the suspect)
  scan_gather_new  same gather but indices vary per step       (defeat CSE)
  scan_noop     carry 20 bufs, body = identity                 (carry cost)
  scan_anc      ancestry-style: bufs are scan CONSTANTS, body gathers a
                per-position view [10,3200] idx and reads K' once (the
                lazy-reorder read pattern: gather + elementwise consume)
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
    log(f"devices: {jax.devices()}")

    sel = set(sys.argv[1:]) or {"scan_copy", "scan_gather", "scan_gather_new",
                                "scan_noop", "scan_anc"}
    B, K, L, F, N = 32, 100, 10, 768, 20
    R = B * K
    steps = 10
    key = jax.random.PRNGKey(0)
    bufs = [jax.device_put(jax.random.normal(jax.random.fold_in(key, i),
                                             (L, R, F), jnp.bfloat16))
            for i in range(N)]
    rng = np.random.default_rng(0)
    beam_idx = jnp.asarray(rng.integers(0, K, (B, K)), jnp.int32)
    src = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)

    results = {}

    def timeit(fn, *args, tag):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(6)]
        for o in outs:
            np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        ms = (time.perf_counter() - t0) / 6 / steps * 1e3
        log(f"{tag}: {ms:.2f} ms/step (x{steps} steps, 6 execs)")
        results[tag] = round(ms, 2)

    def gather_flat(x, s):
        idx = (jnp.arange(L)[:, None] * R + s[None, :]).reshape(-1)
        return x.reshape(L * R, -1)[idx].reshape(x.shape)

    if "scan_copy" in sel:
        @jax.jit
        def scan_copy(src, *bufs):
            def body(c, _):
                return tuple(x + 1 for x in c), ()
            c, _ = jax.lax.scan(body, bufs, None, length=steps)
            return c
        timeit(scan_copy, src, *bufs, tag="scan_copy")

    if "scan_gather" in sel:
        @jax.jit
        def scan_gather(src, *bufs):
            def body(c, _):
                return tuple(gather_flat(x, src) for x in c), ()
            c, _ = jax.lax.scan(body, bufs, None, length=steps)
            return c
        timeit(scan_gather, src, *bufs, tag="scan_gather")

    if "scan_gather_new" in sel:
        @jax.jit
        def scan_gather_new(src, *bufs):
            def body(c, p):
                s = (src + p) % R
                return tuple(gather_flat(x, s) for x in c), ()
            c, _ = jax.lax.scan(body, bufs, jnp.arange(steps))
            return c
        timeit(scan_gather_new, src, *bufs, tag="scan_gather_new")

    if "scan_noop" in sel:
        @jax.jit
        def scan_noop(src, *bufs):
            def body(c, _):
                return c, ()
            c, _ = jax.lax.scan(body, bufs, None, length=steps)
            return tuple(x + 1 for x in c)
        timeit(scan_noop, src, *bufs, tag="scan_noop")

    if "scan_anc" in sel:
        # lazy-ancestry read pattern: bufs closed over (never carried),
        # carry = tiny [L, R] ancestry; body gathers each buf by per-position
        # rows and reduces it (the attention-read analogue)
        @jax.jit
        def scan_anc(src, *bufs):
            anc0 = jnp.broadcast_to(jnp.arange(R)[None, :], (L, R))

            def body(anc, p):
                anc = anc.at[:, :].set(anc[:, src])          # tiny
                idx = (jnp.arange(L)[:, None] * R + anc).reshape(-1)
                tot = jnp.zeros((R, F), jnp.float32)
                for x in bufs:
                    kp = x.reshape(L * R, F)[idx].reshape(L, R, F)
                    tot = tot + jnp.sum(kp.astype(jnp.float32), axis=0)
                return anc, jnp.sum(tot)
            anc, s = jax.lax.scan(body, anc0, jnp.arange(steps))
            return s
        timeit(scan_anc, src, *bufs, tag="scan_anc")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
