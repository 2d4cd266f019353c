"""Multi-decoder ensemble — the reference's ``multiple_decoder`` mode.

The reference attaches N decoder stacks (each with its own decode
embeddings, lm-head and PAWA adaptor) to one shared encoder, routed by a
``decoder_index`` (modeling_t5.py:1187-1256, 1512-1527).  Each decoder is
trained against a *different* k-means docid assignment (the
``bert_k30_c30_1..5`` columns of title_content.tsv) and evaluation merges
the per-decoder retrievals.

The reference loops decoders serially on one GPU.  TPU-first, the decoder
sides are a *stacked* parameter pytree with a leading ensemble axis and the
forward is ``jax.vmap`` over it — all N decoders run in one compiled program
against the encoder output computed once.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from gdr_tpu.models.gdr import GenerativeRetriever, init_params, shift_right

Array = jax.Array

# parameter subtrees owned by the encoder side (shared across the ensemble);
# mirrors the reference's n.startswith(("shared.", "encoder.")) split
ENCODER_SIDE = ("shared", "encoder")


def split_params(params: Any) -> tuple[dict, dict]:
    """Full generator params → (encoder_side, decoder_side) by top-level key."""
    inner = params["params"]
    enc = {k: v for k, v in inner.items() if k in ENCODER_SIDE}
    dec = {k: v for k, v in inner.items() if k not in ENCODER_SIDE}
    return enc, dec


def merge_params(enc_side: dict, dec_side: dict) -> dict:
    return {"params": {**enc_side, **dec_side}}


def init_ensemble(model: GenerativeRetriever, rng: Array, num_decoders: int,
                  input_len: int = 8) -> tuple[dict, Any]:
    """Returns (encoder_side, stacked decoder_side with leading axis N).

    Decoder sides are independently initialised; the encoder side comes from
    the first member (it is shared, ref main_models.py:786-793)."""
    rngs = jax.random.split(rng, num_decoders)
    trees = [init_params(model, r, input_len=input_len) for r in rngs]
    enc_side, _ = split_params(trees[0])
    dec_sides = [split_params(t)[1] for t in trees]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *dec_sides)
    return enc_side, stacked


def ensemble_logits(model: GenerativeRetriever, enc_side: dict,
                    dec_stacked: Any, input_ids: Array, attn_mask: Array,
                    labels: Array, label_mask: Array,
                    deterministic: bool = True, rng: Array | None = None,
                    return_hidden: bool = False):
    """Teacher-forced logits for every ensemble member: [N, B, L, V]
    (with ``return_hidden``: also the decoder hiddens [N, B, L, d]).

    The encoder runs once; decoders are vmapped over the stacked params
    (each member drawing independent dropout noise when ``rng`` is given).
    ``labels``: [N, B, L] — each member learns its own docid assignment.
    """
    n = labels.shape[0]
    if rng is not None:
        rng_enc, rng_dec = jax.random.split(rng)
        enc_rngs = {"dropout": rng_enc}
        member_rngs = jax.random.split(rng_dec, n)
    enc = model.apply(merge_params(enc_side, _index(dec_stacked, 0)),
                      input_ids, attn_mask, deterministic,
                      method=model.encode,
                      rngs=enc_rngs if rng is not None else None)

    def one(dec_side, labels_i, label_mask_i, r=None):
        params = merge_params(enc_side, dec_side)
        dec_in = shift_right(labels_i)
        logits, hidden = model.apply(
            params, enc, attn_mask, dec_in, label_mask_i, deterministic,
            method=model.decode_logits,
            rngs={"dropout": r} if r is not None else None)
        return logits, hidden

    if rng is not None:
        logits, hidden = jax.vmap(one, in_axes=(0, 0, 0, 0))(
            dec_stacked, labels, label_mask, member_rngs)
    else:
        logits, hidden = jax.vmap(one, in_axes=(0, 0, 0))(
            dec_stacked, labels, label_mask)
    return (logits, hidden) if return_hidden else logits


def make_ensemble_train_step(model: GenerativeRetriever, opt,
                             rdrop: float = 0.0, rdrop_loss: str = "Contrast"):
    """Jitted CID-generation training over all ensemble members at once.

    The reference iterates ``_step_i`` per decoder with per-decoder targets
    (main_models.py:1065-1069, dataset target lists at :497-500) through the
    SAME T5FineTuner loss machinery as the main path — R-Drop batch
    duplication included (main_models.py:925-944); here the members' losses
    compute in one vmapped program and average.  ``rdrop`` > 0 enables the
    duplicated-batch consistency term per member (Contrast/KL/L2 as in
    trainer.py; the step then takes an rng argument).

    Batch: input_ids/attn_mask [B, S]; labels/label_mask [N, B, L]
    (one docid assignment per member).  Params: {"enc": enc_side,
    "dec": stacked decoder sides}.
    """
    import optax

    from gdr_tpu.ops import losses as LS

    def loss_fn(params, batch, rng=None):
        if rdrop > 0 and rng is None:
            raise ValueError("rdrop > 0 needs an rng: the consistency term "
                             "compares two dropout realisations")
        input_ids, attn = batch["input_ids"], batch["attn_mask"]
        labels, lmask = batch["labels"], batch["label_mask"]
        if rdrop > 0:
            input_ids = jnp.concatenate([input_ids] * 2, axis=0)
            attn = jnp.concatenate([attn] * 2, axis=0)
            labels = jnp.concatenate([labels] * 2, axis=1)
            lmask = jnp.concatenate([lmask] * 2, axis=1)
        logits, hidden = ensemble_logits(
            model, params["enc"], params["dec"], input_ids, attn,
            labels, lmask, deterministic=rng is None, rng=rng,
            return_hidden=True)
        ce = jax.vmap(LS.masked_cross_entropy)(logits, labels, lmask)
        if rdrop > 0:
            if rdrop_loss == "Contrast":
                d = model.cfg.d_model
                cons = jax.vmap(LS.rdrop_contrast_loss)(
                    hidden * (d ** -0.5), lmask)
            elif rdrop_loss == "KL":
                cons = jax.vmap(LS.rdrop_kl_loss)(logits)
            else:                               # "L2"
                cons = jax.vmap(LS.rdrop_l2_loss)(logits)
            per_member = ce + rdrop * cons
        else:
            per_member = ce
        return per_member.mean(), per_member

    @jax.jit
    def step(params, opt_state, batch, rng=None):
        (loss, per_member), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, per_member

    return step


def member_params(enc_side: dict, dec_stacked: Any, i: int) -> dict:
    """Materialise full params of ensemble member ``i`` (for generation)."""
    return merge_params(enc_side, _index(dec_stacked, i))


def _index(tree: Any, i: int) -> Any:
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def merge_retrievals(doc_lists: Sequence[Sequence[str]],
                     score_lists: Sequence[Sequence[float]],
                     top_k: int) -> list[str]:
    """Union the per-decoder ranked doc lists by best fused score
    (reference semantics: hypotheses from all decoders pooled,
    main_models.py:1663-1676)."""
    best: dict[str, float] = {}
    for docs, scores in zip(doc_lists, score_lists):
        for d, s in zip(docs, scores):
            if d not in best or s > best[d]:
                best[d] = float(s)
    ranked = sorted(best.items(), key=lambda kv: -kv[1])
    return [d for d, _ in ranked[:top_k]]
