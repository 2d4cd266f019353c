"""Hierarchic decoding — one decoder stack per CID depth.

The reference's ``HierarchicT5Stack`` (modeling_t5.py:1080-1149, enabled by
``hierarchic_decode`` with a non-positional vocabulary): depth ``p`` of the
docid is decoded by its own T5 stack — during training every stack runs the
full sequence and position ``p``'s hidden state is taken from stack ``p``;
during decoding step ``p`` runs stack ``p``.

TPU-first realisation (mirrors gdr_tpu.models.ensemble): the per-depth
decoder parameter subtrees are *stacked* along a leading axis and the
teacher-forced pass is one ``jax.vmap`` over them — all depths run in a
single compiled program against the shared encoder output, then the
positional diagonal is gathered.  The incremental step selects the depth's
parameters with a ``lax.switch`` (depth is ≤ max_output_length, so the
branch count is tiny and static).

Note: the reference's *decode-time* path feeds stack ``p`` a KV cache built
by stacks ``0..p-1`` — inconsistent with how it trains (each stack attends
over its own activations).  Here decode step ``p`` re-runs stack ``p`` over
the full prefix, which matches the training distribution exactly; prefixes
are ≤ 10 tokens so the recompute is negligible.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from gdr_tpu.models.gdr import GenerativeRetriever, shift_right

Array = jax.Array


def init_hierarchic(model: GenerativeRetriever, rng: Array, depth: int,
                    input_len: int = 8) -> tuple[dict, Any]:
    """Returns (base_params, stacked decoder subtrees [depth, ...]).

    ``base_params`` holds everything except the decoder (shared, encoder,
    decode embeddings, heads, PAWA); the decoder subtree is stacked.
    """
    from gdr_tpu.models.gdr import init_params

    rngs = jax.random.split(rng, depth)
    trees = [init_params(model, r, input_len=input_len) for r in rngs]
    base = {"params": {k: v for k, v in trees[0]["params"].items()
                       if k != "decoder"}}
    decs = [t["params"]["decoder"] for t in trees]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *decs)
    return base, stacked


def _with_decoder(base: dict, dec: Any) -> dict:
    return {"params": {**base["params"], "decoder": dec}}


def hierarchic_logits(model: GenerativeRetriever, base: dict, dec_stacked: Any,
                      input_ids: Array, attn_mask: Array, labels: Array,
                      label_mask: Array) -> Array:
    """Teacher-forced logits with per-depth decoders: [B, L, V].

    Every depth's stack runs the full sequence (vmap over stacked params);
    position ``p`` of the output comes from stack ``min(p, depth-1)``
    (ref modeling_t5.py:1108-1130).
    """
    enc = model.apply(_with_decoder(base, _index(dec_stacked, 0)),
                      input_ids, attn_mask, method=model.encode)
    dec_in = shift_right(labels)

    def one(dec):
        logits, _ = model.apply(_with_decoder(base, dec), enc, attn_mask,
                                dec_in, label_mask,
                                method=model.decode_logits)
        return logits                                     # [B, L, V]

    all_logits = jax.vmap(one)(dec_stacked)               # [D, B, L, V]
    d = all_logits.shape[0]
    l = all_logits.shape[2]
    sel = jnp.minimum(jnp.arange(l), d - 1)               # stack per position
    # gather [B, L, V] with stack index varying along L
    return jnp.take_along_axis(
        all_logits, sel[None, None, :, None], axis=0)[0]


def hierarchic_decode_step(model: GenerativeRetriever, base: dict,
                           dec_stacked: Any, prefix_tokens: Array,
                           enc: Array, attn_mask: Array, pos: Array,
                           depth: int) -> Array:
    """Logits for position ``pos`` using stack ``min(pos, depth-1)``:
    re-runs that stack over the full prefix (teacher-forced) and takes the
    last position — matching the training distribution (see module note).

    prefix_tokens: [B, L] decoder inputs (start + emitted tokens, padded).
    Returns full-vocab masked logits [B, V].
    """
    l = prefix_tokens.shape[1]
    dmask = (jnp.arange(l)[None, :] <= pos).astype(jnp.int32)

    def branch(i):
        def fn(_):
            logits, _ = model.apply(
                _with_decoder(base, _index(dec_stacked, i)), enc, attn_mask,
                prefix_tokens, dmask, method=model.decode_logits)
            return logits
        return fn

    logits = jax.lax.switch(jnp.minimum(pos, depth - 1),
                            [branch(i) for i in range(depth)], None)
    return jnp.take_along_axis(
        logits, pos[None, None, None].repeat(logits.shape[0], 0), axis=1)[:, 0]


def _index(tree: Any, i) -> Any:
    if isinstance(i, int):
        return jax.tree_util.tree_map(lambda x: x[i], tree)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False), tree)


def hierarchic_generate_cids(model: GenerativeRetriever, base: dict,
                             dec_stacked: Any, input_ids: Array,
                             attn_mask: Array, children: Array,
                             eos_allowed: Array, num_beams: int,
                             max_len: int, length_penalty: float = 1.0):
    """Trie-constrained beam search with per-depth decoder stacks.

    The constrained-search machinery of ``ops/beam.py`` drives the
    HierarchicT5Stack semantics (ref modeling_t5.py:1080-1149; decode
    routing :1187-1256): step ``p`` re-runs stack ``min(p, depth-1)``
    teacher-forced over the emitted prefix (see module note on the
    reference's train/decode inconsistency) and the trie mask, top-k, and
    beam bookkeeping all stay in one compiled program — replacing the
    host-side per-step trie walk.  ``num_beams=1`` is the reference's
    greedy decode.

    Returns ``(BeamResult, query_emb [B, d])``.
    """
    from gdr_tpu.ops.beam import beam_search

    depth = jax.tree_util.tree_leaves(dec_stacked)[0].shape[0]
    batch = input_ids.shape[0]
    p0 = _with_decoder(base, _index(dec_stacked, 0))
    enc = model.apply(p0, input_ids, attn_mask, method=model.encode)
    query_emb = model.apply(p0, enc, method=model.query_embedding)

    bk = batch * num_beams
    cache = {
        # per-query, beam-invariant: the cross_ prefix exempts them from
        # beam reorders (row b·K+k = query b, so permuting a query's K
        # rows is an identity on these)
        "cross_enc": jnp.repeat(enc, num_beams, axis=0),
        "cross_msk": jnp.repeat(attn_mask, num_beams, axis=0),
        # decoder inputs emitted so far (position 0 = start/PAD token);
        # reordered with its beam on every step
        "prefix": jnp.zeros((bk, max_len), jnp.int32),
    }

    def step_fn(cur_tok, cache, pos, width):
        prefix = jax.lax.dynamic_update_slice(
            cache["prefix"], cur_tok[:, None], (0, pos))
        l = prefix.shape[1]
        dmask = jnp.broadcast_to(jnp.arange(l)[None, :] <= pos,
                                 (prefix.shape[0], l)).astype(jnp.int32)

        def branch(i):
            def fn(_):
                logits, _ = model.apply(
                    _with_decoder(base, _index(dec_stacked, i)),
                    cache["cross_enc"], cache["cross_msk"], prefix, dmask,
                    method=model.decode_logits)
                return logits
            return fn

        logits = jax.lax.switch(jnp.minimum(pos, depth - 1),
                                [branch(i) for i in range(depth)], None)
        step_logits = jnp.take_along_axis(
            logits, pos[None, None, None].repeat(logits.shape[0], 0),
            axis=1)[:, 0]
        return step_logits, {**cache, "prefix": prefix}

    result = beam_search(step_fn, cache, batch, num_beams, model.cfg.kary,
                         max_len, children, eos_allowed, length_penalty,
                         candidates_mode=False, progressive=False)
    return result, query_emb
