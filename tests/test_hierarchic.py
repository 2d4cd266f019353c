import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import tiny_config
from gdr_tpu.models.gdr import GenerativeRetriever, shift_right
from gdr_tpu.models.hierarchic import (_with_decoder, _index,
                                       hierarchic_decode_step,
                                       hierarchic_logits, init_hierarchic)

CFG = tiny_config(kary=3, max_output_length=5)
MCFG = dataclasses.replace(CFG.model, dropout_rate=0.0)
DEPTH = 3


def _world():
    model = GenerativeRetriever(MCFG)
    base, stacked = init_hierarchic(model, jax.random.PRNGKey(0), DEPTH)
    rng = np.random.default_rng(0)
    b, s, L = 2, 8, MCFG.max_output_length
    ids = jnp.asarray(rng.integers(2, 100, size=(b, s)), jnp.int32)
    attn = jnp.ones((b, s), jnp.int32)
    labels = np.zeros((b, L), np.int32)
    for i in range(b):
        digits = rng.integers(0, MCFG.kary, size=3)
        toks = [p * MCFG.kary + int(d) + 2 for p, d in enumerate(digits)] + [1]
        labels[i, :len(toks)] = toks
    labels = jnp.asarray(labels)
    return model, base, stacked, ids, attn, labels, (labels != 0).astype(jnp.int32)


def test_hierarchic_logits_positional_routing():
    model, base, stacked, ids, attn, labels, lmask = _world()
    out = hierarchic_logits(model, base, stacked, ids, attn, labels, lmask)
    L, V = MCFG.max_output_length, MCFG.decode_vocab_size
    assert out.shape == (2, L, V)

    # position p must equal the per-member forward at position p
    enc = model.apply(_with_decoder(base, _index(stacked, 0)), ids, attn,
                      method=model.encode)
    dec_in = shift_right(labels)
    for p, member in [(0, 0), (1, 1), (2, 2), (4, DEPTH - 1)]:
        logits_m, _ = model.apply(_with_decoder(base, _index(stacked, member)),
                                  enc, attn, dec_in, lmask,
                                  method=model.decode_logits)
        np.testing.assert_allclose(np.asarray(out[:, p]),
                                   np.asarray(logits_m[:, p]),
                                   rtol=2e-4, atol=2e-4)


def test_hierarchic_decode_step_matches_training_row():
    model, base, stacked, ids, attn, labels, lmask = _world()
    full = hierarchic_logits(model, base, stacked, ids, attn, labels, lmask)
    enc = model.apply(_with_decoder(base, _index(stacked, 0)), ids, attn,
                      method=model.encode)
    dec_in = shift_right(labels)
    for pos in [0, 1, 2]:
        step = hierarchic_decode_step(model, base, stacked, dec_in, enc,
                                      attn, jnp.asarray(pos), DEPTH)
        np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, pos]),
                                   rtol=2e-3, atol=2e-3)


def _toy_trie():
    from gdr_tpu.ops.trie import build_trie
    cid_to_docs = {
        "0": [0],
        "1-0": [1],
        "1-2": [2, 3],
        "2-1-0": [4],
        "2-1-2": [5],
        "2-2": [6],
    }
    return build_trie(cid_to_docs, kary=MCFG.kary, max_docs_per_cluster=4)


def _brute_force(model, base, stacked, ids, attn, trie, length_penalty):
    """Enumerate every root-to-cluster path, scoring each step with the SAME
    per-depth teacher-forced computation (hierarchic_decode_step is itself
    verified against the training rows above)."""
    from gdr_tpu.ops import codec

    L = MCFG.max_output_length
    enc = model.apply(_with_decoder(base, _index(stacked, 0)), ids, attn,
                      method=model.encode)
    results = []

    def logp(prefix_tokens):
        pos = len(prefix_tokens) - 1
        pre = np.zeros((1, L), np.int32)
        pre[0, :len(prefix_tokens)] = prefix_tokens
        lg = hierarchic_decode_step(model, base, stacked, jnp.asarray(pre),
                                    enc, attn, jnp.asarray(pos), DEPTH)
        lg = np.asarray(lg, np.float64)[0]
        return lg - np.log(np.exp(lg - lg.max()).sum()) - lg.max()

    def walk(node, path, prefix_tokens, cum):
        pos = len(path)
        lp = logp(prefix_tokens)
        if trie.eos_allowed[node]:
            total = cum + lp[codec.EOS_ID]
            results.append(("-".join(map(str, path)),
                            total / (len(path) + 1) ** length_penalty))
        for d in range(MCFG.kary):
            child = trie.children[node, d]
            if child >= 0:
                tok = pos * MCFG.kary + d + codec.TOKEN_OFFSET
                walk(int(child), path + [d], prefix_tokens + [tok],
                     cum + lp[tok])

    walk(0, [], [0], 0.0)
    results.sort(key=lambda r: -r[1])
    return results


def test_hierarchic_beam_matches_brute_force():
    """The constrained-search decode (hierarchic_generate_cids) must rank
    every trie path exactly as exhaustive enumeration does."""
    from gdr_tpu.models.hierarchic import hierarchic_generate_cids

    model, base, stacked, ids, attn, _, _ = _world()
    ids, attn = ids[:1], attn[:1]
    trie = _toy_trie()
    want = _brute_force(model, base, stacked, ids, attn, trie,
                        length_penalty=0.8)
    res, q_emb = hierarchic_generate_cids(
        model, base, stacked, ids, attn, jnp.asarray(trie.children),
        jnp.asarray(trie.eos_allowed), num_beams=len(want), max_len=5,
        length_penalty=0.8)
    assert q_emb.shape[0] == 1
    got_cids = [trie.cid_of_node(int(n)) for n, ok
                in zip(np.asarray(res.nodes)[0], np.asarray(res.valid)[0])
                if ok]
    got_scores = [float(s) for s, ok
                  in zip(np.asarray(res.scores)[0], np.asarray(res.valid)[0])
                  if ok]
    assert got_cids == [c for c, _ in want]
    np.testing.assert_allclose(got_scores, [s for _, s in want],
                               rtol=2e-4, atol=2e-4)


def test_hierarchic_greedy_is_beam_one():
    """num_beams=1 reproduces the greedy argmax chain (the reference's
    hierarchic greedy decode, previously a host-side trie walk)."""
    from gdr_tpu.models.hierarchic import hierarchic_generate_cids
    from gdr_tpu.ops import codec

    model, base, stacked, ids, attn, _, _ = _world()
    trie = _toy_trie()
    res, _ = hierarchic_generate_cids(
        model, base, stacked, ids, attn, jnp.asarray(trie.children),
        jnp.asarray(trie.eos_allowed), num_beams=1, max_len=5,
        length_penalty=1.0)

    L = MCFG.max_output_length
    enc = model.apply(_with_decoder(base, _index(stacked, 0)), ids, attn,
                      method=model.encode)
    for b in range(ids.shape[0]):
        node, path, prefix_tokens = 0, [], [0]
        while True:
            pos = len(path)
            pre = np.zeros((ids.shape[0], L), np.int32)
            pre[b, :len(prefix_tokens)] = prefix_tokens
            lg = np.asarray(hierarchic_decode_step(
                model, base, stacked, jnp.asarray(pre), enc, attn,
                jnp.asarray(pos), DEPTH))[b]
            cand = {}
            for d in range(MCFG.kary):
                if trie.children[node, d] >= 0:
                    cand[d] = lg[pos * MCFG.kary + d + codec.TOKEN_OFFSET]
            if trie.eos_allowed[node]:
                cand[-1] = lg[codec.EOS_ID]
            best = max(cand, key=cand.get)
            if best == -1:
                break
            path.append(best)
            prefix_tokens.append(pos * MCFG.kary + best + codec.TOKEN_OFFSET)
            node = int(trie.children[node, best])
        want_cid = "-".join(map(str, path))
        assert trie.cid_of_node(int(np.asarray(res.nodes)[b, 0])) == want_cid
