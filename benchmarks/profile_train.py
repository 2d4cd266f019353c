"""Ablation profiling of the flagship train step on real hardware.

Cases: base (as recorded by bench), no-adaptor, no-dense-contrast,
no-R-Drop-duplication (half batch), fwd-only (no grad/optimizer),
grad-no-opt (grad but no optimizer update).
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
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gdr_tpu.config import DataConfig, GDRConfig, ModelConfig, TrainConfig
    from gdr_tpu.models.gdr import GenerativeRetriever
    from gdr_tpu.train.trainer import init_train_state, make_train_step

    log(f"devices: {jax.devices()}")
    sel = set(sys.argv[1:]) or {"base", "noadaptor", "nodense", "fwdonly",
                                "gradnoopt"}
    # scan_bf16 / scan_fp32: K train steps inside ONE lax.scan dispatch —
    # the tunnel adds a fixed per-dispatch cost that does not pipeline
    # across chained calls, so per-call timing has a ~dispatch floor that
    # masks device-side differences (observed: bf16 and fp32 both "60 ms"
    # per chained call).  One dispatch amortised over K steps is the honest
    # device number.

    bsz, seq_len, iters = 32, 40, 8
    results = {}

    def build(mcfg, use_dense=True, dtype=jnp.float32):
        cfg = GDRConfig(model=mcfg, train=TrainConfig(train_batch_size=bsz),
                        data=DataConfig())
        model = GenerativeRetriever(mcfg, dtype=dtype)
        state, opt = init_train_state(cfg, model, None, jax.random.PRNGKey(0),
                                      total_steps=1000, input_len=seq_len)
        step = make_train_step(model, None, opt, cfg, stage=1,
                               use_dense_loss=use_dense)
        return model, state, opt, step, cfg

    def batch_for(mcfg):
        rng = np.random.default_rng(1)
        L = mcfg.max_output_length
        labels = np.zeros((bsz, L), np.int32)
        labels[:, 0] = 2
        labels[:, 1] = mcfg.kary + 2
        labels[:, 2] = 1
        lmask = (labels != 0).astype(np.int32)
        return {
            "input_ids": jnp.asarray(rng.integers(2, mcfg.vocab_size,
                                                  (bsz, seq_len)), jnp.int32),
            "attn_mask": jnp.ones((bsz, seq_len), jnp.int32),
            "labels": jnp.asarray(labels),
            "label_mask": jnp.asarray(lmask),
            "pos_idx": jnp.asarray(np.arange(bsz, dtype=np.int32)),
            "cand_idx": jnp.asarray(rng.integers(0, 64, (bsz, 5)), jnp.int32),
            "cand_mask": jnp.ones((bsz, 5), bool),
        }, jnp.asarray(rng.normal(size=(64, mcfg.encoder_d_model)),
                       jnp.float32)

    def run_case(name, mcfg, use_dense=True):
        model, state, opt, step, cfg = build(mcfg, use_dense)
        batch, store = batch_for(mcfg)
        key = jax.random.PRNGKey(2)
        t0 = time.perf_counter()
        state, m = step(state, batch, store, key)
        _ = float(m["loss"])
        log(f"{name}: compile {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, store, key)
        _ = float(m["loss"])
        ms = (time.perf_counter() - t0) / iters * 1e3
        log(f"{name}: {ms:.1f} ms/step")
        results[name] = round(ms, 1)
        return model, state, cfg, batch, store

    base_cfg = ModelConfig().scaled("base")
    if "base" in sel:
        run_case("base", base_cfg)
    if "noadaptor" in sel:
        run_case("noadaptor",
                 dataclasses.replace(base_cfg, adaptor_decode=False))
    if "nodense" in sel:
        run_case("nodense", base_cfg, use_dense=False)

    def run_scan_case(name, dtype, k=8):
        from functools import partial
        model, state, opt, step, cfg = build(base_cfg, dtype=dtype)
        batch, store = batch_for(base_cfg)
        key = jax.random.PRNGKey(2)

        @partial(jax.jit, donate_argnums=(0,))
        def multi(state, batch, store, key):
            def body(st, i):
                st, m = step(st, batch, store, jax.random.fold_in(key, i))
                return st, m["loss"]
            return jax.lax.scan(body, state, jnp.arange(k))

        state, losses = multi(state, batch, store, key)
        _ = np.asarray(losses)
        t0 = time.perf_counter()
        state, losses = multi(state, batch, store, key)
        _ = np.asarray(losses)
        ms = (time.perf_counter() - t0) / k * 1e3
        log(f"{name}: {ms:.1f} ms/step (device, {k}-step scan per dispatch)")
        results[name] = round(ms, 1)

    if "scan_bf16" in sel:
        run_scan_case("scan_bf16", jnp.bfloat16)
    if "scan_fp32" in sel:
        run_scan_case("scan_fp32", jnp.float32)

    if "sweep" in sel:
        # batch sweep: the step is optimizer/bandwidth-bound at batch 32
        # (AdamW on the 178M-param PAWA U alone is ~7 ms, profile_trace.py),
        # so examples/s keeps climbing with batch until the matmuls dominate
        from functools import partial
        for bs in (32, 64, 128):

            def batch_for_bs(mcfg, bs=bs):
                rng = np.random.default_rng(1)
                L = mcfg.max_output_length
                labels = np.zeros((bs, L), np.int32)
                labels[:, 0] = 2
                labels[:, 1] = mcfg.kary + 2
                labels[:, 2] = 1
                return {
                    "input_ids": jnp.asarray(
                        rng.integers(2, mcfg.vocab_size, (bs, seq_len)),
                        jnp.int32),
                    "attn_mask": jnp.ones((bs, seq_len), jnp.int32),
                    "labels": jnp.asarray(labels),
                    "label_mask": jnp.asarray(
                        (labels != 0).astype(np.int32)),
                    "pos_idx": jnp.asarray(np.arange(bs, dtype=np.int32)),
                    "cand_idx": jnp.asarray(
                        rng.integers(0, 64, (bs, 5)), jnp.int32),
                    "cand_mask": jnp.ones((bs, 5), bool),
                }, jnp.asarray(rng.normal(size=(64, mcfg.encoder_d_model)),
                               jnp.float32)

            cfg = GDRConfig(model=base_cfg,
                            train=TrainConfig(train_batch_size=bs),
                            data=DataConfig())
            model = GenerativeRetriever(base_cfg, dtype=jnp.bfloat16)
            state, opt = init_train_state(cfg, model, None,
                                          jax.random.PRNGKey(0),
                                          total_steps=1000,
                                          input_len=seq_len)
            step = make_train_step(model, None, opt, cfg, stage=1)
            batch, store = batch_for_bs(base_cfg)
            key = jax.random.PRNGKey(2)
            k = 8

            @partial(jax.jit, donate_argnums=(0,))
            def multi(state, batch, store, key):
                def body(st, i):
                    st, m = step(st, batch, store,
                                 jax.random.fold_in(key, i))
                    return st, m["loss"]
                return jax.lax.scan(body, state, jnp.arange(k))

            state, losses_ = multi(state, batch, store, key)
            _ = np.asarray(losses_)
            t0 = time.perf_counter()
            state, losses_ = multi(state, batch, store, key)
            _ = np.asarray(losses_)
            ms = (time.perf_counter() - t0) / k * 1e3
            eps = bs / ms * 1e3
            log(f"sweep b{bs}: {ms:.1f} ms/step, {eps:.0f} examples/s")
            results[f"sweep_b{bs}_ms"] = round(ms, 1)
            results[f"sweep_b{bs}_eps"] = round(eps)

    if "fwdonly" in sel or "gradnoopt" in sel:
        import functools

        from gdr_tpu.models.gdr import shift_right
        from gdr_tpu.ops import losses as LS

        model, state, opt, step, cfg = build(base_cfg)
        batch, store = batch_for(base_cfg)
        key = jax.random.PRNGKey(2)

        def fwd(params, batch, store, rng):
            ids = jnp.concatenate([batch["input_ids"]] * 2, axis=0)
            attn = jnp.concatenate([batch["attn_mask"]] * 2, axis=0)
            labels = jnp.concatenate([batch["labels"]] * 2, axis=0)
            lmask = jnp.concatenate([batch["label_mask"]] * 2, axis=0)
            out = model.apply(params["generator"], ids, attn,
                              shift_right(labels), lmask,
                              deterministic=False, rngs={"dropout": rng})
            return LS.masked_cross_entropy(out["logits"], labels, lmask)

        if "fwdonly" in sel:
            f = jax.jit(fwd)
            _ = float(f(state.params, batch, store, key))
            t0 = time.perf_counter()
            for _ in range(iters):
                v = f(state.params, batch, store, key)
            _ = float(v)
            ms = (time.perf_counter() - t0) / iters * 1e3
            log(f"fwdonly: {ms:.1f} ms")
            results["fwdonly"] = round(ms, 1)

        if "gradnoopt" in sel:
            g = jax.jit(jax.grad(fwd))
            r = g(state.params, batch, store, key)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
            t0 = time.perf_counter()
            outs = [g(state.params, batch, store, key) for _ in range(iters)]
            for o in outs:
                np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
            ms = (time.perf_counter() - t0) / iters * 1e3
            log(f"gradnoopt: {ms:.1f} ms")
            results["gradnoopt"] = round(ms, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
