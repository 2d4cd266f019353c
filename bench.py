"""Headline benchmark: retrieval throughput at beam 100, one chip.

Measures the full retrieval path of the flagship (t5-base-scale) model on an
NQ-scale synthetic index (334,314 docs, 30-ary depth-3 CID trie — the
reference's primary corpus configuration, SURVEY.md §6):

    encode → trie-constrained beam decode (K=100, ≤10 CID tokens, KV-cached,
    early-exit, candidate-sliced PAWA head) → in-cluster dense re-rank over a
    334k × 768 store → α-sweep top-100

The reference's eval operating point is beam 100, batch 1, *no KV cache*,
with host-side trie walking per token (infer.sh:5-15, SURVEY.md §6 defect 6);
its repo records no perf numbers.  BASELINE.md sets the target
p50 < 20 ms/query on one v5e chip ⇒ 50 queries/sec/chip.  The headline
metric here is **queries/sec at beam 100** with batched, pipelined dispatch
(``vs_baseline`` = qps / 50; 1.0 = target parity, higher is better) — on
this harness the host↔device tunnel alone costs ~23 ms per round trip, so
single-call latency measures the tunnel, not the chip; per-batch wall times
are logged to stderr as the latency diagnostic.

Prints exactly one JSON line on stdout; diagnostics go to stderr.
Set GDR_BENCH_TINY=1 for a CPU-sized smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_nq_scale_trie(n_docs: int, kary: int, leaf_cap: int,
                        max_docs_per_cluster: int):
    """Systematic 3-level trie holding n_docs in clusters of ≤ leaf_cap."""
    from gdr_tpu.ops.trie import build_trie

    cid_to_docs = {}
    doc = 0
    level3 = -(-n_docs // (kary * kary * leaf_cap))  # per level-2 node
    for i in range(kary):
        for j in range(kary):
            for k in range(level3):
                if doc >= n_docs:
                    break
                take = min(leaf_cap, n_docs - doc)
                cid_to_docs[f"{i}-{j}-{k}"] = list(range(doc, doc + take))
                doc += take
    assert doc == n_docs
    return build_trie(cid_to_docs, kary,
                      max_docs_per_cluster=max_docs_per_cluster)


def main() -> None:
    tiny = os.environ.get("GDR_BENCH_TINY") == "1"
    import jax
    import jax.numpy as jnp

    # persistent compile cache: bench re-runs skip XLA compilation
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gdr_tpu.config import EvalConfig, ModelConfig
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params

    log(f"devices: {jax.devices()}")

    if tiny:
        cfg = ModelConfig(kary=8, max_output_length=5, d_model=64, d_kv=16,
                          d_ff=128, num_layers=2, num_decoder_layers=2,
                          num_heads=4, vocab_size=512, encoder_d_model=64,
                          adaptor_layer_num=1, adaptor_num_heads=2)
        n_docs, beams, seq_len, iters, qbatch = 2_000, 10, 16, 4, 4
        group = 2
    else:
        cfg = ModelConfig().scaled("base")          # t5-base, kary 30, L 10
        n_docs, beams, seq_len, iters, qbatch = 334_314, 100, 40, 6, 32
        group = 4   # sub-batches per compiled execution (lax.map)

    rng = np.random.default_rng(0)
    log("building trie ...")
    trie = build_nq_scale_trie(n_docs, cfg.kary, leaf_cap=30 if not tiny else 8,
                               max_docs_per_cluster=64)
    log(f"trie: {trie.num_nodes} nodes, {trie.num_clusters} clusters")

    log("building store (on-device) ...")
    # generate on-device: a host-built 1 GB store would crawl through the
    # tunnel; bf16 halves the re-rank gather bandwidth
    @jax.jit
    def make_store(key):
        s = jax.random.normal(key, (n_docs, cfg.encoder_d_model), jnp.float32)
        s = s / jnp.linalg.norm(s, axis=1, keepdims=True)
        return s.astype(jnp.bfloat16)

    store = make_store(jax.random.PRNGKey(7))

    # serve in bf16: halves the HBM traffic of the weight-bound decode loop
    # (PAWA's U matrix alone is 178M params read once per decode step)
    model = GenerativeRetriever(cfg, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), input_len=seq_len)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"params: {n_params/1e6:.1f}M (bf16)")

    ev_cfg = EvalConfig(num_beams=beams, num_return_sequences=beams,
                        max_output_length=cfg.max_output_length,
                        length_penalty=0.8)
    # cluster-packed store: one contiguous DMA per beam in the re-rank
    # (Pallas kernel) instead of a per-row XLA gather
    evaluator = Evaluator(model, trie, store, ev_cfg,
                          packed=True, use_pallas=not tiny)

    input_ids = jnp.asarray(rng.integers(2, cfg.vocab_size,
                                         size=(group, qbatch, seq_len)),
                            jnp.int32)
    attn = jnp.ones((group, qbatch, seq_len), jnp.int32)

    def materialize(res, rr):
        # np.asarray forces a device→host roundtrip: on the axon tunnel,
        # block_until_ready alone returns before remote execution finishes
        return np.asarray(res.sequences), np.asarray(rr.doc_ids)

    log(f"compiling + warmup (batch {group}x{qbatch}) ...")
    t0 = time.perf_counter()
    res, rr = evaluator.retrieve_many(params, input_ids, attn)
    materialize(res, rr)
    log(f"first call (compile): {time.perf_counter()-t0:.1f}s")
    res, rr = evaluator.retrieve_many(params, input_ids, attn)
    materialize(res, rr)

    # throughput: pipelined dispatch of `iters` mega-batches (each one
    # compiled execution covering group*qbatch queries); device→host copies
    # start asynchronously for every batch before any blocking read
    queries = [jnp.asarray(rng.integers(2, cfg.vocab_size,
                                        size=(group, qbatch, seq_len)),
                           jnp.int32)
               for _ in range(iters)]
    t_start = time.perf_counter()
    inflight = [evaluator.retrieve_many(params, q, attn) for q in queries]
    for res, rr in inflight:
        res.sequences.copy_to_host_async()
        rr.doc_ids.copy_to_host_async()
    per_batch = []
    for res, rr in inflight:
        materialize(res, rr)
        per_batch.append(time.perf_counter() - t_start)
    total = time.perf_counter() - t_start
    qps = iters * group * qbatch / total
    lat_ms = 1e3 * np.diff([0.0] + per_batch)
    log(f"throughput: {qps:.1f} q/s over {iters}x{group}x{qbatch} queries "
        f"({total*1e3:.1f} ms total); per-batch ms: "
        f"{np.array2string(lat_ms, precision=1)}")

    print(json.dumps({
        "metric": "queries_per_sec_beam100_1chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / 50.0, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # transient tunnel failures (FailedPrecondition)
        log(f"bench attempt failed ({type(e).__name__}: {e}); retrying once")
        main()
