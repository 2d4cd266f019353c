"""Trie-constrained beam search over CID space — fully on-device.

The reference walks its Python trie on the host for every beam at every step
(generation_utils_previous.py:714-729) and finalises hypotheses in a Python
loop (generation_utils.py:783-854), syncing device→host each token.  Here the
whole search is one ``lax.scan``:

- the trie mask is a single gather from the packed ``children`` table
  (digit-indexed, thanks to the positional codec);
- the candidate space per beam is only ``kary + 1`` entries (the k digit
  continuations plus EOS) rather than the full decode vocabulary, so top-k
  runs over ``beams × (kary+1)`` ≈ 3.1k scores at beam 100 / kary 30;
- finished beams occupy their slot with a frozen cumulative score and a
  single zero-logprob "pad" continuation, so hypothesis finalisation is pure
  masking (no BeamHypotheses objects);
- KV caches ride in the scan carry and are gathered by beam index on reorder.

Every root-to-cluster path in the trie terminates, and distinct beams always
hold distinct prefixes, so the final K slots are K *distinct* CIDs — matching
the reference's use of ``num_beams == num_return_sequences`` (infer.sh:5-15).

Scoring: beams compete on cumulative log-probability; the returned scores are
length-normalised ``cum / (gen_len ** length_penalty)`` like the reference's
``BeamHypotheses`` (HF 3.4 semantics with ``early_stopping=False``).
"""

from __future__ import annotations

from flax import struct
from typing import Callable

import jax
import jax.numpy as jnp

from gdr_tpu.ops.codec import EOS_ID, PAD_ID, TOKEN_OFFSET

Array = jax.Array
NEG_INF = -1.0e9

# step_fn(cur_token [BK], cache, pos) -> (logits [BK, V], cache)
StepFn = Callable[[Array, dict, Array], tuple[Array, dict]]


def _reorder_cache(cache, src: Array):
    """Gather cache rows by source-beam index; ``cross_*`` entries are
    per-query (beam-invariant) and stay untouched."""

    def f(path, x):
        last = path[-1]
        name = str(getattr(last, "key", last))
        return x if name.startswith("cross_") else x[src]

    return jax.tree_util.tree_map_with_path(f, cache)


@struct.dataclass
class BeamResult:
    sequences: Array     # [B, K, L+1] int32 — start token, digits tokens, EOS, pad
    scores: Array        # [B, K] float32 — length-normalised log-prob, sorted desc
    cum_logprobs: Array  # [B, K] float32
    nodes: Array         # [B, K] int32 — trie node at which each beam ended (cluster)
    valid: Array         # [B, K] bool — False for beams that ran out of paths


def beam_search(step_fn: StepFn, cache: dict, batch: int, num_beams: int,
                kary: int, max_len: int, children: Array, eos_allowed: Array,
                length_penalty: float = 1.0,
                early_exit: bool = True,
                candidates_mode: bool = False) -> BeamResult:
    """Run the constrained search.

    ``children``: int32 [N, kary] (-1 = absent); ``eos_allowed``: bool [N].
    ``cache`` must already be built for batch*num_beams rows (encoder states
    expanded beam-major: row b*K+k belongs to query b).

    ``early_exit``: run as a ``lax.while_loop`` that stops once every beam is
    finished.  Real k-means tries are much shallower than
    ``max_output_length`` (NQ: depth 3 vs the reference's fixed 10 decode
    steps, infer.sh:7), so this skips over half the decode work.  Set False
    (plain ``lax.scan``) when the search must be differentiable.

    ``candidates_mode``: ``step_fn`` returns step-local candidate logits
    [BK, kary+1] (digits…, EOS; position validity already applied) instead
    of full-vocab logits — the decode fast path
    (``GenerativeRetriever.decode_step_candidates``).  Softmax over the
    candidate block is exactly the positional-masked full-vocab softmax
    restricted to its nonzero support.

    Cache entries whose key starts with ``cross_`` are treated as
    beam-invariant and skipped on beam reorder.
    """
    bk = batch * num_beams
    n_opt = kary + 1                                   # digits + eos/pad slot

    tokens0 = jnp.zeros((bk, max_len + 1), jnp.int32)  # starts with PAD(start)
    node0 = jnp.zeros((bk,), jnp.int32)                # root
    # only beam 0 of each query is live at step 0
    scores0 = jnp.where(jnp.arange(bk) % num_beams == 0, 0.0, NEG_INF
                        ).astype(jnp.float32)
    finished0 = jnp.zeros((bk,), bool)
    eos_pos0 = jnp.full((bk,), max_len - 1, jnp.int32)
    cur_tok0 = jnp.full((bk,), PAD_ID, jnp.int32)

    def step(carry, pos):
        tokens, node, scores, finished, eos_pos, cur_tok, cache = carry
        out, cache = step_fn(cur_tok, cache, pos)
        if candidates_mode:                                     # [BK, kary+1]
            logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
            digit_logp = logp[:, :kary]
            eos_logp = logp[:, kary]
        else:                                                   # [BK, V]
            logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
            # gather the kary+1 step-local options
            digit_tokens = pos * kary + TOKEN_OFFSET + jnp.arange(kary)
            digit_logp = logp[:, :][jnp.arange(bk)[:, None],
                                    jnp.broadcast_to(digit_tokens, (bk, kary))]
            eos_logp = logp[:, EOS_ID]

        ch = children[node]                                      # [BK, kary]
        digit_ok = ch >= 0
        eos_ok = eos_allowed[node]
        cand = jnp.concatenate(
            [jnp.where(digit_ok, digit_logp, NEG_INF),
             jnp.where(eos_ok, eos_logp, NEG_INF)[:, None]], axis=1)
        # finished beams: single zero-cost "pad" continuation in the eos slot
        frozen = jnp.concatenate(
            [jnp.full((bk, kary), NEG_INF), jnp.zeros((bk, 1))], axis=1)
        cand = jnp.where(finished[:, None], frozen, cand)

        # ---- top-k over beams × options per query --------------------------
        flat = (scores[:, None] + cand).reshape(batch, num_beams * n_opt)
        top_scores, top_idx = jax.lax.top_k(flat, num_beams)     # [B, K]
        beam_idx = top_idx // n_opt                              # [B, K]
        option = top_idx % n_opt                                 # [B, K]
        src = (jnp.arange(batch)[:, None] * num_beams + beam_idx).reshape(-1)
        option = option.reshape(-1)

        # ---- gather state by source beam -----------------------------------
        tokens = tokens[src]
        node_g = node[src]
        finished_g = finished[src]
        eos_pos_g = eos_pos[src]
        is_eos = (option == kary) & ~finished_g
        stay = finished_g
        new_tok = jnp.where(
            stay, PAD_ID,
            jnp.where(is_eos, EOS_ID,
                      pos * kary + TOKEN_OFFSET + option))
        node = jnp.where(option < kary,
                         children[node_g, jnp.minimum(option, kary - 1)],
                         node_g)
        node = jnp.maximum(node, 0)      # keep indices safe for dead beams
        finished = finished_g | is_eos
        eos_pos = jnp.where(is_eos, pos, eos_pos_g)
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[:, None], (0, pos + 1))
        cache = _reorder_cache(cache, src)
        scores = top_scores.reshape(-1)
        return (tokens, node, scores, finished, eos_pos, new_tok, cache), None

    carry = (tokens0, node0, scores0, finished0, eos_pos0, cur_tok0, cache)
    if early_exit:
        def cond(state):
            pos, c = state
            finished = c[3]
            # dead (-inf) beams count as finished for the exit test
            alive = ~finished & (c[2] > NEG_INF / 2)
            return (pos < max_len) & jnp.any(alive)

        def body(state):
            pos, c = state
            c, _ = step(c, pos)
            return pos + 1, c

        _, (tokens, node, scores, finished, eos_pos, _, _) = (
            jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), carry)))
    else:
        (tokens, node, scores, finished, eos_pos, _, _), _ = jax.lax.scan(
            step, carry, jnp.arange(max_len))

    gen_len = (eos_pos + 1).astype(jnp.float32)
    norm = scores / jnp.power(gen_len, length_penalty)
    valid = scores > NEG_INF / 2

    norm = norm.reshape(batch, num_beams)
    order = jnp.argsort(-jnp.where(valid.reshape(batch, num_beams),
                                   norm, NEG_INF), axis=1)
    take = jnp.take_along_axis

    def sort2(x):
        return take(x.reshape(batch, num_beams), order, axis=1)

    return BeamResult(
        sequences=take(tokens.reshape(batch, num_beams, -1),
                       order[:, :, None], axis=1),
        scores=sort2(norm),
        cum_logprobs=sort2(scores),
        nodes=sort2(node),
        valid=sort2(valid),
    )


def generate_cids(model, params, input_ids: Array, attn_mask: Array,
                  children: Array, eos_allowed: Array, num_beams: int,
                  max_len: int, length_penalty: float = 1.0
                  ) -> tuple[BeamResult, Array, Array]:
    """Encode queries once, expand beam-major, and run the constrained search.

    Mirrors the reference's ``model.generate(..., decode_tree=root,
    num_beams=num_return_sequences, output_scores=True,
    output_encoder_embedding=True)`` call (main_models.py:1380-1397) but
    returns the dense-stage query embedding instead of raw encoder states.

    Returns (BeamResult, query_embedding [B, d], encoder states [B, S, d]).
    """
    batch = input_ids.shape[0]
    enc = model.apply(params, input_ids, attn_mask, method=model.encode)
    query_emb = model.apply(params, enc, method=model.query_embedding)

    # cross K/V are projected once per query; only self/PAWA caches get
    # beam-expanded rows (see Decoder.init_cache)
    cache = model.apply(params, enc, max_len, num_beams,
                        method=model.init_cache)

    def step_fn(cur_tok, cache, pos):
        return model.apply(params, cur_tok, cache, attn_mask, pos, num_beams,
                           method=model.decode_step_candidates)

    result = beam_search(step_fn, cache, batch, num_beams,
                         model.cfg.kary, max_len, children, eos_allowed,
                         length_penalty, candidates_mode=True)
    return result, query_emb, enc
