"""Trie-constrained beam search over CID space — fully on-device.

The reference walks its Python trie on the host for every beam at every step
(generation_utils_previous.py:714-729) and finalises hypotheses in a Python
loop (generation_utils.py:783-854), syncing device→host each token.  Here the
whole search is one compiled program:

- the trie mask is a single gather from the packed ``children`` table
  (digit-indexed, thanks to the positional codec);
- the candidate space per beam is only ``kary + 1`` entries (the k digit
  continuations plus EOS) rather than the full decode vocabulary, so top-k
  runs over ``beams × (kary+1)`` ≈ 3.1k scores at beam 100 / kary 30;
- finished beams occupy their slot with a frozen cumulative score and a
  single zero-logprob "pad" continuation, so hypothesis finalisation is pure
  masking (no BeamHypotheses objects);
- KV caches ride in the carried state and are gathered by beam index on
  reorder;
- **progressive widening**: at step 0 each query has ONE live beam and at
  step p at most ``(kary+1)^p`` — the warmup steps run at those narrow
  widths (statically unrolled, caches grown by the reorder gather) before
  the full-width ``while_loop`` takes over.  At beam 100/kary 30 this skips
  ~40% of the decode work the fixed-width reference pays.

Every root-to-cluster path in the trie terminates, and distinct beams always
hold distinct prefixes, so the final K slots are K *distinct* CIDs — matching
the reference's use of ``num_beams == num_return_sequences`` (infer.sh:5-15).

Scoring: beams compete on cumulative log-probability; the returned scores are
length-normalised ``cum / (gen_len ** length_penalty)`` like the reference's
``BeamHypotheses`` (HF 3.4 semantics with ``early_stopping=False``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from gdr_tpu.ops.codec import EOS_ID, PAD_ID, TOKEN_OFFSET

Array = jax.Array
NEG_INF = -1.0e9

# step_fn(cur_token [B·w], cache, pos, width) -> (logits, cache)
StepFn = Callable


def _pool_hidden(acc, cur_tok: Array, pos: Array, hidden: Array):
    """Pool this step's decoder hidden (input = ``cur_tok``) into the
    (sum, count, last) accumulator: covers the start token (pos 0), every
    digit, and the EOS input of beams finishing before the final position —
    exactly the positions the teacher-forced re-run masks in (evaluator
    ``_per_beam_decoder_query``, ref main_models.py:1464-1571)."""
    hid_sum, hid_cnt, hid_last = acc
    do = (cur_tok != PAD_ID) | (pos == 0)
    h32 = hidden.astype(jnp.float32)
    return (hid_sum + jnp.where(do[:, None], h32, 0.0),
            hid_cnt + do.astype(jnp.int32),
            jnp.where(do[:, None], h32, hid_last))


def _select_rows(x: Array, src: Array, beam_idx: Array, in_w: int) -> Array:
    """Reorder per-beam rows by source beam: a gather on the FLATTENED 2-D
    view.

    On TPU the gather's speed is set by the physical layout of what it
    reads: rows of a clean 2-D [rows, features] array (features a lane
    multiple) stream at full HBM bandwidth, while the same gather over a
    ≥4-D tile-padded buffer measured ~10× slower, and a block one-hot
    matmul ~4× slower (benchmarks/profile_reorder.py).  ``beam_idx``/
    ``in_w`` are unused here but keep the two select functions' signatures
    aligned.
    """
    rows = x.shape[0]
    if x.ndim <= 1:
        return x[src]
    out = x.reshape(rows, -1)[src]
    return out.reshape((src.shape[0],) + x.shape[1:])


def _select_rows_tm(x: Array, src: Array, beam_idx: Array, in_w: int
                    ) -> Array:
    """Row reorder for time-major buffers [L, rows, ...]: one gather on the
    flattened [L·rows, features] view with per-position offsets."""
    l, rows = x.shape[0], x.shape[1]
    idx = (jnp.arange(l)[:, None] * rows + src[None, :]).reshape(-1)
    out = x.reshape(l * rows, -1)[idx]
    return out.reshape((l, src.shape[0]) + x.shape[2:])


def _reorder_cache(cache, src: Array, beam_idx: Array, in_w: int):
    """Reorder cache rows by source-beam index; ``cross_*`` entries are
    per-query (beam-invariant) and stay untouched; ``tm_*`` entries are
    time-major [L, rows, ...] and reorder along axis 1."""

    def f(path, x):
        last = path[-1]
        name = str(getattr(last, "key", last))
        if name.startswith("cross_"):
            return x
        if name.startswith("tm_"):
            return _select_rows_tm(x, src, beam_idx, in_w)
        return _select_rows(x, src, beam_idx, in_w)

    return jax.tree_util.tree_map_with_path(f, cache)


@struct.dataclass
class BeamResult:
    sequences: Array     # [B, K, L+1] int32 — start token, digit tokens, EOS, pad
    scores: Array        # [B, K] float32 — length-normalised log-prob, sorted desc
    cum_logprobs: Array  # [B, K] float32
    nodes: Array         # [B, K] int32 — trie node at which each beam ended (cluster)
    valid: Array         # [B, K] bool — False for beams that ran out of paths
    # pooled decoder hidden states per beam (accumulate_hidden=True):
    # mean over the beam's decoder inputs / the last input's state — the
    # decoder_avg / decoder_special query reps (ref main_models.py:1464-1571)
    # without re-running the decoder over B·K finished sequences.
    hid_avg: Array | None = None    # [B, K, d] float32
    hid_last: Array | None = None   # [B, K, d] float32


def _beam_step(carry, pos, step_fn, batch: int, in_w: int, out_w: int,
               kary: int, children: Array, eos_allowed: Array,
               candidates_mode: bool, accumulate: bool = False):
    """One constrained search step: B·in_w beams → B·out_w beams."""
    tokens, node, scores, finished, eos_pos, cur_tok, acc, cache = carry
    bk = batch * in_w
    n_opt = kary + 1
    if accumulate:
        out, hidden, cache = step_fn(cur_tok, cache, pos, in_w)
        acc = _pool_hidden(acc, cur_tok, pos, hidden)
    else:
        out, cache = step_fn(cur_tok, cache, pos, in_w)
    logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
    if candidates_mode:                                     # [BK, kary+1]
        digit_logp = logp[:, :kary]
        eos_logp = logp[:, kary]
    else:                                                   # [BK, V]
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

    # ---- top-k over beams × options per query -------------------------------
    flat = (scores[:, None] + cand).reshape(batch, in_w * n_opt)
    top_scores, top_idx = jax.lax.top_k(flat, out_w)         # [B, out_w]
    beam_idx = top_idx // n_opt
    option = top_idx % n_opt
    src = (jnp.arange(batch)[:, None] * in_w + beam_idx).reshape(-1)
    option = option.reshape(-1)

    # ---- gather state by source beam (grows rows when out_w > in_w) ---------
    tokens = tokens[src]
    node_g = node[src]
    finished_g = finished[src]
    eos_pos_g = eos_pos[src]
    is_eos = (option == kary) & ~finished_g
    new_tok = jnp.where(
        finished_g, PAD_ID,
        jnp.where(is_eos, EOS_ID, pos * kary + TOKEN_OFFSET + option))
    node = jnp.where(option < kary,
                     children[node_g, jnp.minimum(option, kary - 1)],
                     node_g)
    node = jnp.maximum(node, 0)          # keep indices safe for dead beams
    finished = finished_g | is_eos
    eos_pos = jnp.where(is_eos, pos, eos_pos_g)
    tokens = jax.lax.dynamic_update_slice(
        tokens, new_tok[:, None], (0, pos + 1))
    cache = _reorder_cache(cache, src, beam_idx, in_w)
    if accumulate:
        acc = tuple(_select_rows(a, src, beam_idx, in_w) for a in acc)
    scores = top_scores.reshape(-1)
    return (tokens, node, scores, finished, eos_pos, new_tok, acc, cache)


def _finalize(tokens, node, scores, eos_pos, batch: int, num_beams: int,
              length_penalty: float, acc=None) -> BeamResult:
    gen_len = (eos_pos + 1).astype(jnp.float32)
    norm = scores / jnp.power(gen_len, length_penalty)
    valid = scores > NEG_INF / 2

    norm2 = norm.reshape(batch, num_beams)
    order = jnp.argsort(-jnp.where(valid.reshape(batch, num_beams),
                                   norm2, NEG_INF), axis=1)
    take = jnp.take_along_axis

    def sort2(x):
        return take(x.reshape(batch, num_beams), order, axis=1)

    hid_avg = hid_last = None
    if acc is not None:
        hid_sum, hid_cnt, hid_raw = acc
        d = hid_sum.shape[-1]

        def sort3(x):
            return take(x.reshape(batch, num_beams, d),
                        order[:, :, None], axis=1)

        hid_avg = sort3(hid_sum / jnp.maximum(hid_cnt, 1)[:, None])
        hid_last = sort3(hid_raw)

    return BeamResult(
        sequences=take(tokens.reshape(batch, num_beams, -1),
                       order[:, :, None], axis=1),
        scores=sort2(norm),
        cum_logprobs=sort2(scores),
        nodes=sort2(node),
        valid=sort2(valid),
        hid_avg=hid_avg,
        hid_last=hid_last,
    )


def warmup_widths(num_beams: int, kary: int, max_len: int) -> list[int]:
    """Static beam widths for the warmup steps: 1, kary+1, … capped at K."""
    widths = []
    w = 1
    while w < num_beams and len(widths) < max_len - 1:
        widths.append(w)
        w = min(w * (kary + 1), num_beams)
    return widths


def beam_search(step_fn: StepFn, cache: dict, batch: int, num_beams: int,
                kary: int, max_len: int, children: Array, eos_allowed: Array,
                length_penalty: float = 1.0,
                early_exit: bool = True,
                candidates_mode: bool = False,
                progressive: bool = False,
                accumulate_hidden: int = 0) -> BeamResult:
    """Run the constrained search.

    ``children``: int32 [N, kary] (-1 = absent); ``eos_allowed``: bool [N].
    ``step_fn(cur_tok, cache, pos, width) -> (logits, cache)`` where width is
    the static beam count of the step (constant ``num_beams`` unless
    ``progressive``).

    ``cache`` must hold batch*num_beams rows (row b·K+k = query b), or batch
    rows when ``progressive=True`` — warmup steps grow it via the reorder
    gather (``cross_*`` entries are per-query and never grow).

    ``early_exit``: finish as a ``lax.while_loop`` that stops once every beam
    is done (k-means tries are depth ~3 vs the reference's fixed 10 steps,
    infer.sh:7).  Set False (plain ``lax.scan``) for differentiability.

    ``candidates_mode``: ``step_fn`` returns step-local candidate logits
    [B·w, kary+1] (digits…, EOS; position validity applied) instead of
    full-vocab logits — the decode fast path.  Softmax over the candidate
    block equals the positional-masked full-vocab softmax on its support.

    ``accumulate_hidden``: when > 0 (the decoder hidden width d), ``step_fn``
    must return ``(logits, hidden [B·w, d], cache)`` and the search pools the
    hidden states of each beam's inputs in its carry, returning ``hid_avg`` /
    ``hid_last`` on the result — the decoder_avg / decoder_special query reps
    without the B·K teacher-forced re-run.  The early-exit loop then runs one
    extra step after the last beam finishes (within ``max_len``) so the
    EOS input's state enters the pool, matching the re-run's ``:L``-truncated
    mask semantics.
    """
    bk0 = batch * (1 if progressive else num_beams)

    tokens = jnp.zeros((bk0, max_len + 1), jnp.int32)   # starts with PAD
    node = jnp.zeros((bk0,), jnp.int32)                 # root
    if progressive:
        scores = jnp.zeros((bk0,), jnp.float32)
    else:
        # only beam 0 of each query is live at step 0
        scores = jnp.where(jnp.arange(bk0) % num_beams == 0, 0.0, NEG_INF
                           ).astype(jnp.float32)
    finished = jnp.zeros((bk0,), bool)
    eos_pos = jnp.full((bk0,), max_len - 1, jnp.int32)
    cur_tok = jnp.full((bk0,), PAD_ID, jnp.int32)
    accumulate = accumulate_hidden > 0
    acc = ((jnp.zeros((bk0, accumulate_hidden), jnp.float32),
            jnp.zeros((bk0,), jnp.int32),
            jnp.zeros((bk0, accumulate_hidden), jnp.float32))
           if accumulate else ())
    carry = (tokens, node, scores, finished, eos_pos, cur_tok, acc, cache)

    pos0 = 0
    if progressive:
        # warmup must reach full width within max_len-1 steps, else the
        # full-width loop below sees a short carry and fails at trace time
        if num_beams > (kary + 1) ** max(max_len - 1, 0):
            raise ValueError(
                f"progressive=True needs num_beams <= (kary+1)**(max_len-1) "
                f"= {(kary + 1) ** max(max_len - 1, 0)}, got {num_beams}")
        widths = warmup_widths(num_beams, kary, max_len)
        for pos, w in enumerate(widths):
            out_w = min(w * (kary + 1), num_beams)
            carry = _beam_step(carry, jnp.asarray(pos, jnp.int32), step_fn,
                               batch, w, out_w, kary, children, eos_allowed,
                               candidates_mode, accumulate)
            pos0 = pos + 1

    def full_step(carry, pos):
        return _beam_step(carry, pos, step_fn, batch, num_beams, num_beams,
                          kary, children, eos_allowed, candidates_mode,
                          accumulate)

    if pos0 < max_len:
        if early_exit:
            def cond(state):
                pos, c = state
                alive = ~c[3] & (c[2] > NEG_INF / 2)
                run = jnp.any(alive)
                if accumulate:
                    # beams whose pending input is EOS still owe the pool
                    # one state — run one more step for them
                    run = run | jnp.any((c[5] == EOS_ID)
                                        & (c[2] > NEG_INF / 2))
                return (pos < max_len) & run

            def body(state):
                pos, c = state
                return pos + 1, full_step(c, pos)

            _, carry = jax.lax.while_loop(
                cond, body, (jnp.asarray(pos0, jnp.int32), carry))
        else:
            def scan_step(c, pos):
                return full_step(c, pos), None

            carry, _ = jax.lax.scan(scan_step, carry,
                                    jnp.arange(pos0, max_len))

    tokens, node, scores, finished, eos_pos, _, acc, _ = carry
    return _finalize(tokens, node, scores, eos_pos, batch, num_beams,
                     length_penalty, acc if accumulate else None)


def sample_cids(model, params, input_ids: Array, attn_mask: Array,
                children: Array, eos_allowed: Array, num_samples: int,
                max_len: int, rng: Array, temperature: float = 1.0,
                top_k: int = 0, length_penalty: float = 1.0,
                accumulate_hidden: bool = False,
                u_table: Array | None = None,
                fused: bool = False
                ) -> tuple[BeamResult, Array, Array]:
    """Stochastic CID decoding — the reference's ``gen_method top_k`` /
    ``do_sample`` inference modes (main.py:189-204) as one compiled program.

    Each query draws ``num_samples`` independent trie-constrained rollouts:
    per position the step-local candidates (≤ kary digits + EOS) are
    trie-masked, optionally temperature-scaled and top-k-filtered, and one
    continuation is sampled per rollout.  Deviation from the reference
    (documented): its top_k mode drops the trie and relies on the positional
    mask alone, so it can emit non-cluster paths; here sampling stays inside
    the trie so every rollout is a valid cluster and feeds the dense re-rank.

    Returns (BeamResult, query_emb, enc) like :func:`generate_cids`; rollout
    scores are the model's length-normalised log-probs (not the sampling
    distribution's), sorted descending per query.  Duplicate rollouts are
    possible, as with the reference's sampler.
    """
    batch = input_ids.shape[0]
    kary = model.cfg.kary
    enc = model.apply(params, input_ids, attn_mask, method=model.encode)
    query_emb = model.apply(params, enc, method=model.query_embedding)
    cache = model.apply(params, enc, max_len, num_samples,
                        method=model.init_cache)
    if u_table is not None:
        cache["cross_ucand"] = u_table     # see generate_cids

    def step_fn(cur_tok, cache, pos, width):
        # sampling rollouts run at constant width, so (unlike beam search's
        # progressive warmup) the fused Pallas sublayers apply to EVERY step
        return model.apply(params, cur_tok, cache, attn_mask, pos, width,
                           accumulate_hidden, fused,
                           method=model.decode_step_candidates)

    bk = batch * num_samples
    tokens = jnp.zeros((bk, max_len + 1), jnp.int32)
    node = jnp.zeros((bk,), jnp.int32)
    scores = jnp.zeros((bk,), jnp.float32)
    finished = jnp.zeros((bk,), bool)
    eos_pos = jnp.full((bk,), max_len - 1, jnp.int32)
    cur_tok = jnp.full((bk,), PAD_ID, jnp.int32)
    acc = ((jnp.zeros((bk, model.cfg.d_model), jnp.float32),
            jnp.zeros((bk,), jnp.int32),
            jnp.zeros((bk, model.cfg.d_model), jnp.float32))
           if accumulate_hidden else ())

    def body(carry, pos_and_key):
        pos, key = pos_and_key
        tokens, node, scores, finished, eos_pos, cur_tok, acc, cache = carry
        if accumulate_hidden:
            out, hidden, cache = step_fn(cur_tok, cache, pos, num_samples)
            acc = _pool_hidden(acc, cur_tok, pos, hidden)
        else:
            out, cache = step_fn(cur_tok, cache, pos, num_samples)
        logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
        ch = children[node]                                  # [BK, kary]
        ok = jnp.concatenate([ch >= 0, eos_allowed[node][:, None]], axis=1)
        cand = jnp.where(ok, logp, NEG_INF)                  # [BK, kary+1]
        dist = cand / max(temperature, 1e-6)
        if top_k > 0 and top_k < kary + 1:
            kth = jnp.sort(dist, axis=1)[:, -top_k][:, None]
            dist = jnp.where(dist >= kth, dist, NEG_INF)
        option = jax.random.categorical(key, dist)           # [BK]
        # finished rollouts are frozen on the EOS slot: a terminal node may
        # legally still have children (prefix CIDs), and sampling a digit
        # there would walk `node` past the finished rollout's cluster
        option = jnp.where(finished, kary, option)
        step_logp = jnp.take_along_axis(
            jax.nn.log_softmax(cand, axis=-1), option[:, None], axis=1)[:, 0]
        is_eos = (option == kary) & ~finished
        new_tok = jnp.where(
            finished, PAD_ID,
            jnp.where(is_eos, EOS_ID, pos * kary + TOKEN_OFFSET + option))
        node = jnp.where(option < kary,
                         children[node, jnp.minimum(option, kary - 1)], node)
        node = jnp.maximum(node, 0)
        scores = scores + jnp.where(finished, 0.0, step_logp)
        eos_pos = jnp.where(is_eos, pos, eos_pos)
        finished = finished | is_eos
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[:, None], (0, pos + 1))
        return (tokens, node, scores, finished, eos_pos, new_tok, acc,
                cache), None

    keys = jax.random.split(rng, max_len)
    carry = (tokens, node, scores, finished, eos_pos, cur_tok, acc, cache)
    carry, _ = jax.lax.scan(body, carry,
                            (jnp.arange(max_len, dtype=jnp.int32), keys))
    tokens, node, scores, finished, eos_pos = carry[:5]
    result = _finalize(tokens, node, scores, eos_pos, batch, num_samples,
                       length_penalty, carry[6] if accumulate_hidden else None)
    return result, query_emb, enc


def generate_cids(model, params, input_ids: Array, attn_mask: Array,
                  children: Array, eos_allowed: Array, num_beams: int,
                  max_len: int, length_penalty: float = 1.0,
                  progressive: bool = True,
                  accumulate_hidden: bool = False,
                  u_table: Array | None = None,
                  fused: bool = False,
                  early_exit: bool = True
                  ) -> tuple[BeamResult, Array, Array]:
    """Encode queries once and run the constrained search with progressive
    beam widening.

    Mirrors the reference's ``model.generate(..., decode_tree=root,
    num_beams=num_return_sequences, output_scores=True,
    output_encoder_embedding=True)`` call (main_models.py:1380-1397) but
    returns the dense-stage query embedding instead of raw encoder states.

    Returns (BeamResult, query_embedding [B, d], encoder states [B, S, d]).
    """
    batch = input_ids.shape[0]
    enc = model.apply(params, input_ids, attn_mask, method=model.encode)
    query_emb = model.apply(params, enc, method=model.query_embedding)

    # progressive widening needs the warmup to reach full width within
    # max_len-1 steps; fall back to fixed width on shallow tries
    if progressive and num_beams > (model.cfg.kary + 1) ** max(max_len - 1, 0):
        progressive = False

    # cross K/V are projected once per query; self/PAWA caches start at the
    # initial beam width and grow with the warmup reorders
    init_beams = 1 if progressive else num_beams
    cache = model.apply(params, enc, max_len, init_beams,
                        method=model.init_cache)
    if u_table is not None:
        # precomputed per-position U candidate slices (beam-invariant:
        # the cross_ prefix exempts it from beam reorders) — see
        # GenerativeRetriever.decode_tables for why it is built outside
        cache["cross_ucand"] = u_table

    def step_fn(cur_tok, cache, pos, width):
        # fused Pallas sublayers only at full width — the warmup steps'
        # small row counts don't amortise a kernel's fixed cost and their
        # beam grouping varies per step
        full = width == num_beams
        return model.apply(params, cur_tok, cache, attn_mask, pos, width,
                           accumulate_hidden, fused and full,
                           method=model.decode_step_candidates)

    result = beam_search(step_fn, cache, batch, num_beams,
                         model.cfg.kary, max_len, children, eos_allowed,
                         length_penalty, early_exit=early_exit,
                         candidates_mode=True,
                         progressive=progressive,
                         accumulate_hidden=(model.cfg.d_model
                                            if accumulate_hidden else 0))
    return result, query_emb, enc
