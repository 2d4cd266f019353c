import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdr_tpu.ops import codec
from gdr_tpu.ops.beam import beam_search
from gdr_tpu.ops.masks import positional_logit_mask
from gdr_tpu.ops.trie import build_trie

KARY = 3
MAX_LEN = 4          # up to depth-3 CIDs + eos
V = KARY * MAX_LEN + 2
TABLE_SIZE = 1009


@pytest.fixture(scope="module")
def toy():
    cid_to_docs = {
        "0": [0],
        "1-0": [1],
        "1-2": [2, 3],
        "2-1-0": [4],
        "2-1-2": [5],
        "2-2": [6],
    }
    trie = build_trie(cid_to_docs, kary=KARY, max_docs_per_cluster=4)
    table = np.random.default_rng(3).normal(
        size=(TABLE_SIZE, V)).astype(np.float32) * 2.0
    mask = positional_logit_mask(KARY, MAX_LEN)
    return trie, table, mask


def mock_logits(table, mask, h, pos):
    """Deterministic prefix-dependent logits + positional validity mask."""
    return table[h % TABLE_SIZE] + mask[pos]


def make_step_fn(table, mask):
    table = jnp.asarray(table)
    mask = jnp.asarray(mask)

    def step_fn(cur_tok, cache, pos, width=None):
        h = (cache["h"] * 31 + cur_tok) % TABLE_SIZE
        logits = table[h % TABLE_SIZE] + mask[pos]
        return logits, {"h": h}

    return step_fn


def brute_force(trie, table, mask, length_penalty):
    """Enumerate every root-to-cluster path and score it exactly."""
    results = []

    def logp(h, pos):
        row = mock_logits(table, mask, h, pos)
        return row - np.log(np.exp(row - row.max()).sum()) - row.max()

    def walk(node, path, h, cum):
        # h is the rolling hash *after* consuming the token at pos len(path)-1
        pos = len(path)
        lp = logp(h, pos)
        if trie.eos_allowed[node]:
            total = cum + lp[codec.EOS_ID]
            gen_len = len(path) + 1
            results.append(("-".join(map(str, path)),
                            total / gen_len ** length_penalty, total))
        for d in range(KARY):
            child = trie.children[node, d]
            if child >= 0:
                tok = pos * KARY + d + codec.TOKEN_OFFSET
                walk(int(child), path + [d], (h * 31 + tok) % TABLE_SIZE,
                     cum + lp[tok])

    walk(0, [], (0 * 31 + 0) % TABLE_SIZE, 0.0)
    results.sort(key=lambda r: -r[1])
    return results


@pytest.mark.parametrize("length_penalty", [1.0, 0.8])
def test_beam_matches_brute_force(toy, length_penalty):
    trie, table, mask = toy
    num_paths = 6
    K = num_paths          # full-width beam → exact enumeration
    step_fn = make_step_fn(table, mask)
    cache = {"h": jnp.zeros((K,), jnp.int32)}
    res = beam_search(step_fn, cache, batch=1, num_beams=K, kary=KARY,
                      max_len=MAX_LEN, children=jnp.asarray(trie.children),
                      eos_allowed=jnp.asarray(trie.eos_allowed),
                      length_penalty=length_penalty)
    expected = brute_force(trie, table, mask, length_penalty)

    got_cids = [codec.decode_tokens(np.asarray(res.sequences[0, k]), KARY)
                for k in range(K)]
    exp_cids = [cid for cid, _, _ in expected]
    assert got_cids == exp_cids
    np.testing.assert_allclose(
        np.asarray(res.scores[0]), [s for _, s, _ in expected], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(res.cum_logprobs[0]), [c for _, _, c in expected], rtol=1e-3, atol=1e-3)
    # nodes point at the right clusters
    for k, cid in enumerate(got_cids):
        digits = [int(c) for c in cid.split("-")]
        assert int(res.nodes[0, k]) == trie.node_of_path(digits)
    assert np.asarray(res.valid[0]).all()


def test_beam_narrow_returns_distinct_valid_cids(toy):
    trie, table, mask = toy
    K = 3
    step_fn = make_step_fn(table, mask)
    cache = {"h": jnp.zeros((2 * K,), jnp.int32)}
    res = beam_search(step_fn, cache, batch=2, num_beams=K, kary=KARY,
                      max_len=MAX_LEN, children=jnp.asarray(trie.children),
                      eos_allowed=jnp.asarray(trie.eos_allowed))
    all_cids = set(trie.id_mapping().keys())
    for b in range(2):
        cids = [codec.decode_tokens(np.asarray(res.sequences[b, k]), KARY)
                for k in range(K)]
        assert len(set(cids)) == K
        assert set(cids) <= all_cids
        # scores sorted descending
        s = np.asarray(res.scores[b])
        assert np.all(np.diff(s) <= 1e-6)


def test_beam_wider_than_paths_marks_invalid(toy):
    trie, table, mask = toy
    K = 10                  # > 6 available paths
    step_fn = make_step_fn(table, mask)
    cache = {"h": jnp.zeros((K,), jnp.int32)}
    res = beam_search(step_fn, cache, batch=1, num_beams=K, kary=KARY,
                      max_len=MAX_LEN, children=jnp.asarray(trie.children),
                      eos_allowed=jnp.asarray(trie.eos_allowed))
    valid = np.asarray(res.valid[0])
    assert valid.sum() == 6
    cids = [codec.decode_tokens(np.asarray(res.sequences[0, k]), KARY)
            for k in range(K) if valid[k]]
    assert len(set(cids)) == 6


def test_early_exit_matches_scan(toy):
    trie, table, mask = toy
    K = 4
    step_fn = make_step_fn(table, mask)
    kw = dict(batch=2, num_beams=K, kary=KARY, max_len=MAX_LEN,
              children=jnp.asarray(trie.children),
              eos_allowed=jnp.asarray(trie.eos_allowed), length_penalty=0.8)
    cache = {"h": jnp.zeros((2 * K,), jnp.int32)}
    a = beam_search(step_fn, cache, early_exit=True, **kw)
    cache = {"h": jnp.zeros((2 * K,), jnp.int32)}
    b = beam_search(step_fn, cache, early_exit=False, **kw)
    np.testing.assert_array_equal(np.asarray(a.sequences), np.asarray(b.sequences))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.nodes), np.asarray(b.nodes))


@pytest.mark.parametrize("length_penalty", [1.0, 0.8])
def test_progressive_matches_fixed_width(toy, length_penalty):
    """Progressive warmup widening must reproduce the fixed-width search."""
    trie, table, mask = toy
    K = 5
    step_fn = make_step_fn(table, mask)
    kw = dict(batch=2, num_beams=K, kary=KARY, max_len=MAX_LEN,
              children=jnp.asarray(trie.children),
              eos_allowed=jnp.asarray(trie.eos_allowed),
              length_penalty=length_penalty)
    fixed = beam_search(step_fn, {"h": jnp.zeros((2 * K,), jnp.int32)},
                        progressive=False, **kw)
    prog = beam_search(step_fn, {"h": jnp.zeros((2,), jnp.int32)},
                       progressive=True, **kw)
    np.testing.assert_array_equal(np.asarray(prog.sequences),
                                  np.asarray(fixed.sequences))
    np.testing.assert_allclose(np.asarray(prog.scores),
                               np.asarray(fixed.scores), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(prog.nodes),
                                  np.asarray(fixed.nodes))
    np.testing.assert_array_equal(np.asarray(prog.valid),
                                  np.asarray(fixed.valid))


def test_warmup_widths():
    from gdr_tpu.ops.beam import warmup_widths
    assert warmup_widths(100, 30, 10) == [1, 31]
    assert warmup_widths(5, 3, 4) == [1, 4]
    assert warmup_widths(1, 30, 10) == []


def test_progressive_with_scan_tail(toy):
    """progressive warmup + non-early-exit scan tail (differentiable path)."""
    trie, table, mask = toy
    K = 4
    step_fn = make_step_fn(table, mask)
    kw = dict(batch=1, num_beams=K, kary=KARY, max_len=MAX_LEN,
              children=jnp.asarray(trie.children),
              eos_allowed=jnp.asarray(trie.eos_allowed))
    a = beam_search(step_fn, {"h": jnp.zeros((1,), jnp.int32)},
                    progressive=True, early_exit=False, **kw)
    b = beam_search(step_fn, {"h": jnp.zeros((K,), jnp.int32)},
                    progressive=False, early_exit=True, **kw)
    np.testing.assert_array_equal(np.asarray(a.sequences),
                                  np.asarray(b.sequences))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=1e-5, atol=1e-6)


def test_progressive_width_guard():
    """ADVICE round 1: num_beams > (kary+1)**(max_len-1) cannot reach full
    width during warmup -> must fail eagerly with a clear error."""
    import pytest
    from gdr_tpu.ops.beam import beam_search

    with pytest.raises(ValueError, match="progressive"):
        beam_search(lambda tok, cache, pos, w: (None, cache), {},
                    batch=1, num_beams=64, kary=2, max_len=3,
                    children=jnp.zeros((1, 2), jnp.int32),
                    eos_allowed=jnp.zeros((1,), bool), progressive=True)


def test_sample_cids_valid_paths(toy):
    """Sampled rollouts are always valid trie paths (every emitted CID is a
    cluster) and deterministic under a fixed PRNG key."""
    import dataclasses
    from gdr_tpu.config import tiny_config
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops.beam import sample_cids
    from gdr_tpu.ops.codec import decode_token_batch

    trie, _table, _mask = toy
    cid_to_docs = {"0": [0], "1-0": [1], "1-2": [2, 3], "2-1-0": [4],
                   "2-1-2": [5], "2-2": [6]}
    cfg = dataclasses.replace(tiny_config(kary=KARY,
                                          max_output_length=MAX_LEN).model,
                              dropout_rate=0.0)
    model = GenerativeRetriever(cfg)
    params = init_params(model, jax.random.PRNGKey(0), input_len=6)
    ids = jnp.asarray(np.random.default_rng(3).integers(2, 100, (2, 6)),
                      jnp.int32)
    mask = jnp.ones_like(ids)

    res, q, enc = sample_cids(model, params, ids, mask,
                              jnp.asarray(trie.children),
                              jnp.asarray(trie.eos_allowed),
                              num_samples=6, max_len=MAX_LEN,
                              rng=jax.random.PRNGKey(7), temperature=1.3,
                              top_k=2)
    assert res.sequences.shape == (2, 6, MAX_LEN + 1)
    cids = decode_token_batch(np.asarray(res.sequences).reshape(12, -1), KARY)
    for c in cids:
        assert c in cid_to_docs, c      # every rollout is a real cluster
    # scores sorted descending per query
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # determinism under the same key
    res2, _, _ = sample_cids(model, params, ids, mask,
                             jnp.asarray(trie.children),
                             jnp.asarray(trie.eos_allowed),
                             num_samples=6, max_len=MAX_LEN,
                             rng=jax.random.PRNGKey(7), temperature=1.3,
                             top_k=2)
    np.testing.assert_array_equal(np.asarray(res.sequences),
                                  np.asarray(res2.sequences))


def test_sample_cids_low_temperature_matches_greedy(toy):
    """temperature → 0 makes every rollout the argmax path = beam K=1."""
    import dataclasses
    from gdr_tpu.config import tiny_config
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops.beam import generate_cids, sample_cids

    trie, _table, _mask = toy
    cfg = dataclasses.replace(tiny_config(kary=KARY,
                                          max_output_length=MAX_LEN).model,
                              dropout_rate=0.0)
    model = GenerativeRetriever(cfg)
    params = init_params(model, jax.random.PRNGKey(0), input_len=6)
    ids = jnp.asarray(np.random.default_rng(5).integers(2, 100, (2, 6)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    ch, eos = jnp.asarray(trie.children), jnp.asarray(trie.eos_allowed)

    samp, _, _ = sample_cids(model, params, ids, mask, ch, eos,
                             num_samples=3, max_len=MAX_LEN,
                             rng=jax.random.PRNGKey(0), temperature=1e-4)
    beam, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                               num_beams=1, max_len=MAX_LEN,
                               progressive=False)
    for b in range(2):
        for s in range(3):
            np.testing.assert_array_equal(
                np.asarray(samp.sequences)[b, s],
                np.asarray(beam.sequences)[b, 0])


def test_accumulated_hidden_matches_rerun_oracle(toy):
    """accumulate_hidden pools, inside the beam carry, exactly the decoder
    states the teacher-forced re-run (the reference's way,
    main_models.py:1464-1571) would pool — for both decoder_avg and
    decoder_special, including full-depth beams whose EOS input falls
    outside the re-run's :L truncation."""
    import dataclasses
    from gdr_tpu.config import tiny_config
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops.beam import generate_cids, sample_cids

    trie, _table, _mask = toy
    base = tiny_config(kary=KARY, max_output_length=MAX_LEN)
    cfg = dataclasses.replace(base.model, dropout_rate=0.0)
    model = GenerativeRetriever(cfg)
    params = init_params(model, jax.random.PRNGKey(0), input_len=6)
    ids = jnp.asarray(np.random.default_rng(9).integers(2, 100, (3, 6)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    ch, eos = jnp.asarray(trie.children), jnp.asarray(trie.eos_allowed)
    store = np.random.default_rng(1).normal(
        size=(trie.doc_indices.max() + 1, cfg.encoder_d_model)
    ).astype(np.float32)

    for gen in ("beam", "sample"):
        if gen == "beam":
            res, _q, enc = generate_cids(model, params, ids, mask, ch, eos,
                                         num_beams=5, max_len=MAX_LEN,
                                         accumulate_hidden=True)
        else:
            res, _q, enc = sample_cids(model, params, ids, mask, ch, eos,
                                       num_samples=5, max_len=MAX_LEN,
                                       rng=jax.random.PRNGKey(3),
                                       accumulate_hidden=True)
        valid = np.asarray(res.valid)
        for special in (False, True):
            ev_cfg = dataclasses.replace(
                base.eval, num_beams=5, num_return_sequences=5,
                use_query_embed_decoder_avg=not special,
                use_query_embed_decoder_special=special)
            ev = Evaluator(model, trie, store, ev_cfg)
            oracle = np.asarray(
                ev._per_beam_decoder_query(params, res, enc, mask))
            pooled = res.hid_last if special else res.hid_avg
            got = np.asarray(model.apply(params, pooled,
                                         method=model.project_query))
            np.testing.assert_allclose(got[valid], oracle[valid],
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"{gen} special={special}")


def test_depth_capped_decode_matches_full_length(toy):
    """Evaluator sizes the decode program to trie depth+1; results must be
    identical to decoding at the configured max_output_length (every path
    terminates by max depth, and positional token ids don't depend on L)."""
    import dataclasses
    from gdr_tpu.config import tiny_config
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops.beam import generate_cids

    trie, _t, _m = toy
    long_l = MAX_LEN + 4           # model configured for a longer decode
    cfg = dataclasses.replace(tiny_config(kary=KARY,
                                          max_output_length=long_l).model,
                              dropout_rate=0.0)
    model = GenerativeRetriever(cfg)
    params = init_params(model, jax.random.PRNGKey(0), input_len=6)
    ids = jnp.asarray(np.random.default_rng(4).integers(2, 100, (2, 6)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    ch, eos = jnp.asarray(trie.children), jnp.asarray(trie.eos_allowed)
    capped = int(trie.depth.max()) + 1

    full, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                               num_beams=5, max_len=long_l)
    short, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                                num_beams=5, max_len=capped)
    np.testing.assert_array_equal(
        np.asarray(full.sequences)[..., :capped + 1],
        np.asarray(short.sequences))
    assert np.abs(np.asarray(full.sequences)[..., capped + 1:]).max() == 0
    np.testing.assert_allclose(np.asarray(full.scores),
                               np.asarray(short.scores), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(full.nodes),
                                  np.asarray(short.nodes))
    np.testing.assert_array_equal(np.asarray(full.valid),
                                  np.asarray(short.valid))

    # pooled decoder reps need ONE extra step of room (depth+2): full-depth
    # beams' EOS-input state enters the pool only if a step can consume it —
    # the cap the Evaluator uses when decoder-side query reps are requested
    full_a, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                                 num_beams=5, max_len=long_l,
                                 accumulate_hidden=True)
    short_a, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                                  num_beams=5, max_len=capped + 1,
                                  accumulate_hidden=True)
    v = np.asarray(full_a.valid)
    np.testing.assert_allclose(np.asarray(full_a.hid_avg)[v],
                               np.asarray(short_a.hid_avg)[v],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(full_a.hid_last)[v],
                               np.asarray(short_a.hid_last)[v],
                               rtol=1e-4, atol=1e-4)


def test_u_table_decode_matches_dynamic_slice(toy):
    """The precomputed PAWA candidate table (decode_tables → cross_ucand)
    must reproduce the dynamic-slice path exactly: same slice values, same
    contraction order (PawaAdaptor.delta_candidates_from_table vs
    delta_candidates) — so sequences, scores, nodes and query reps are
    bit-identical with and without the table."""
    import dataclasses
    from gdr_tpu.config import tiny_config
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops.beam import generate_cids, sample_cids

    trie, _t, _m = toy
    cfg = dataclasses.replace(tiny_config(kary=KARY,
                                          max_output_length=MAX_LEN).model,
                              dropout_rate=0.0)
    assert cfg.adaptor_decode and cfg.adaptor_efficient
    model = GenerativeRetriever(cfg)
    params = init_params(model, jax.random.PRNGKey(0), input_len=6)
    ids = jnp.asarray(np.random.default_rng(12).integers(2, 100, (2, 6)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    ch, eos = jnp.asarray(trie.children), jnp.asarray(trie.eos_allowed)
    ut = model.apply(params, MAX_LEN, method=model.decode_tables)
    assert ut.shape[0] == MAX_LEN

    plain, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                                num_beams=5, max_len=MAX_LEN)
    tabled, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                                 num_beams=5, max_len=MAX_LEN, u_table=ut)
    np.testing.assert_array_equal(np.asarray(plain.sequences),
                                  np.asarray(tabled.sequences))
    np.testing.assert_allclose(np.asarray(plain.scores),
                               np.asarray(tabled.scores), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(plain.nodes),
                                  np.asarray(tabled.nodes))

    s_plain, _, _ = sample_cids(model, params, ids, mask, ch, eos,
                                num_samples=4, max_len=MAX_LEN,
                                rng=jax.random.PRNGKey(5), temperature=0.7)
    s_tab, _, _ = sample_cids(model, params, ids, mask, ch, eos,
                              num_samples=4, max_len=MAX_LEN,
                              rng=jax.random.PRNGKey(5), temperature=0.7,
                              u_table=ut)
    np.testing.assert_array_equal(np.asarray(s_plain.sequences),
                                  np.asarray(s_tab.sequences))


def test_generate_cids_early_exit_passthrough(toy):
    """generate_cids(early_exit=False) — the scan tail used when a caller
    wants differentiability or the faster compile — must reproduce the
    early-exit while_loop exactly (balanced tries run the same step count)."""
    import dataclasses
    from gdr_tpu.config import tiny_config
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.ops.beam import generate_cids

    trie, _t, _m = toy
    cfg = dataclasses.replace(tiny_config(kary=KARY,
                                          max_output_length=MAX_LEN).model,
                              dropout_rate=0.0)
    model = GenerativeRetriever(cfg)
    params = init_params(model, jax.random.PRNGKey(0), input_len=6)
    ids = jnp.asarray(np.random.default_rng(9).integers(2, 100, (2, 6)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    ch, eos = jnp.asarray(trie.children), jnp.asarray(trie.eos_allowed)

    w, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                            num_beams=5, max_len=MAX_LEN, early_exit=True)
    s, _, _ = generate_cids(model, params, ids, mask, ch, eos,
                            num_beams=5, max_len=MAX_LEN, early_exit=False)
    np.testing.assert_array_equal(np.asarray(w.sequences),
                                  np.asarray(s.sequences))
    np.testing.assert_allclose(np.asarray(w.scores), np.asarray(s.scores),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(w.valid), np.asarray(s.valid))
