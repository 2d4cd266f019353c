"""Loss functions: masked CE, R-Drop consistency, cluster-adaptive InfoNCE.

All losses are pure functions of arrays (no module state) so they can be
combined freely inside one jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def masked_cross_entropy(logits: Array, labels: Array, label_mask: Array) -> Array:
    """Token-level CE averaged over valid positions.

    Matches ``CrossEntropyLoss(ignore_index=-100)`` semantics used for the
    CID generation loss (ref modeling_t5.py:1656,1701): mean over non-padding
    label positions.  logits: [B, L, V]; labels: [B, L]; label_mask: [B, L].
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    mask = label_mask.astype(jnp.float32)
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def rdrop_contrast_loss(decoder_hidden: Array, label_mask: Array) -> Array:
    """R-Drop "Contrast" consistency (ref modeling_t5.py:1666-1680).

    The batch holds two dropout realisations of the same examples stacked as
    [x; x'] (ref main_models.py:925-944).  Per decode position, decoder
    hidden states across the doubled batch are dot-scored against each other
    (diagonal masked out) and each realisation must pick its twin —
    in-batch InfoNCE between the halves.

    The reference feeds softmax outputs into ``CrossEntropyLoss`` (a double
    softmax, modeling_t5.py:1675-1679); we apply CE to the logits directly —
    the intended consistency objective.

    decoder_hidden: [2b, L, d] (already d**-0.5-scaled); label_mask: [2b, L].
    """
    bz = decoder_hidden.shape[0]
    b = bz // 2
    h = decoder_hidden.astype(jnp.float32)
    # [L, 2b, 2b] similarity per position
    sims = jnp.einsum("bld,cld->lbc", h, h)
    diag = jnp.eye(bz, dtype=bool)[None]
    sims = jnp.where(diag, -1e9, sims)
    labels = jnp.concatenate([jnp.arange(b, bz), jnp.arange(0, b)])
    logp = jax.nn.log_softmax(sims, axis=-1)
    picked = logp[:, jnp.arange(bz), labels]               # [L, 2b]
    mask = label_mask.T.astype(jnp.float32)                # [L, 2b]
    return -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def rdrop_kl_loss(logits: Array) -> Array:
    """R-Drop ``KL`` variant (ref modeling_t5.py:1668-1674): symmetric KL
    between the two dropout realisations' positional distributions, summed
    over all positions (the reference does not mask padding here) and
    normalised by 2·L."""
    b = logits.shape[0] // 2
    sl = logits.shape[1]
    p = jax.nn.log_softmax(logits[:b].astype(jnp.float32), axis=-1)
    q = jax.nn.log_softmax(logits[b:].astype(jnp.float32), axis=-1)
    kl_pq = (jnp.exp(q) * (q - p)).sum()      # KL(q || p): F.kl_div(p, q)
    kl_qp = (jnp.exp(p) * (p - q)).sum()
    return (kl_pq + kl_qp) / 2.0 / sl


def rdrop_l2_loss(logits: Array, norm_cols: int | None = None) -> Array:
    """R-Drop default/\"L2\" variant (ref modeling_t5.py:1686-1689): mean
    squared difference between the two realisations' softmax outputs.

    ``norm_cols``: when the logits are a candidate slice of a wider vocab
    (decode_candidate_logits), the masked full-vocab columns hold exactly-0
    softmax on both halves, so the SUM is unchanged — pass the full vocab
    width to keep the reference's mean normalisation identical."""
    b = logits.shape[0] // 2
    p = jax.nn.softmax(logits[:b].astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(logits[b:].astype(jnp.float32), axis=-1)
    loss = jnp.mean((p - q) ** 2)
    if norm_cols is not None:
        loss = loss * (logits.shape[-1] / norm_cols)
    return loss


def local_candidate_labels(labels: Array, kary: int) -> Array:
    """Positional-codec label tokens → candidate-slot indices.

    Slot layout of decode_candidate_logits: digit d of position l (token
    ``l·kary+2+d``) → slot d; EOS (token 1) → slot kary.  PAD positions map
    out of range and must be excluded by the caller's label mask (they are
    clipped into range only to keep the gather defined)."""
    l = labels.shape[1]
    pos = jnp.arange(l, dtype=labels.dtype)
    local = labels - (pos[None, :] * kary + 2)
    local = jnp.where(labels == 1, kary, local)
    return jnp.clip(local, 0, kary)


def doc_reweight_loss(logits: Array, labels: Array, label_mask: Array,
                      query_emb: Array, doc_emb: Array) -> Array:
    """CE reweighted by per-example query/doc cosine similarity
    (ref main_helper_loss.py:14-19 ``doc_reweight_loss``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    q = query_emb / jnp.maximum(
        jnp.linalg.norm(query_emb, axis=-1, keepdims=True), 1e-9)
    d = doc_emb / jnp.maximum(
        jnp.linalg.norm(doc_emb, axis=-1, keepdims=True), 1e-9)
    w = jax.nn.relu(jnp.einsum("bd,bd->b", q, d))          # [B]
    mask = label_mask.astype(jnp.float32) * w[:, None]
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def query_token_infonce(query_emb: Array, decoder_hidden: Array,
                        label_mask: Array) -> Array:
    """Per-position InfoNCE: each query must pick its own decoder states out
    of the batch (ref ``query_tloss`` in cal_contrastive,
    main_models.py:1147-1154)."""
    b = query_emb.shape[0]
    logits = jnp.einsum("bd,cld->lbc", query_emb.astype(jnp.float32),
                        decoder_hidden.astype(jnp.float32))   # [L, B, B]
    labels = jnp.arange(b)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = logp[:, labels, labels]                          # [L, B]
    mask = label_mask.T.astype(jnp.float32)
    return -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def margin_ranking_loss(pos_prob: Array, neg_prob: Array,
                        margin: float = 0.5) -> Array:
    """Positive-vs-hard-negative probability margin (ref ``ranking_loss``,
    main_models.py:1164-1174, torch MarginRankingLoss semantics)."""
    return jnp.maximum(0.0, margin - (pos_prob - neg_prob)).mean()


def denoising_losses(model_apply_encoder, denoise_predict_head,
                     denoise_disc_head, input_ids: Array, attn_mask: Array,
                     keep_mask: Array, rng: Array) -> tuple[Array, Array]:
    """Masked-input reconstruction + mask-position discrimination
    (ref modeling_t5.py:1466-1501): encode the corrupted input, predict the
    original tokens (generation loss); sample replacements, re-encode, and
    classify which positions were corrupted (discrimination loss).

    ``model_apply_encoder(ids) -> hidden``; heads map hidden → logits.
    ``keep_mask``: bool [B, S], False = corrupted position.
    """
    masked = jnp.where(keep_mask, input_ids, jnp.zeros_like(input_ids))
    hidden = model_apply_encoder(masked)
    gen_logits = denoise_predict_head(hidden)              # [B, S, V]
    gen_loss = masked_cross_entropy(gen_logits, input_ids, attn_mask)

    sampled = jax.random.categorical(rng, gen_logits.astype(jnp.float32),
                                     axis=-1).astype(input_ids.dtype)
    filled = jnp.where(keep_mask, input_ids, sampled)
    hidden2 = model_apply_encoder(filled)
    disc_logits = denoise_disc_head(hidden2)               # [B, S, 2]
    disc_loss = masked_cross_entropy(disc_logits,
                                     keep_mask.astype(jnp.int32), attn_mask)
    return gen_loss, disc_loss


def embedding_distillation_loss(encoder_hidden: Array, input_ids: Array,
                                target_query_emb: Array) -> Array:
    """MSE between the encoder state at the input's EOS position and a
    precomputed query embedding (ref modeling_t5.py:1697-1703; the reference
    wires this to fake random targets — SURVEY.md §6 defect 7 — this is the
    intended objective)."""
    is_eos = (input_ids == 1).astype(jnp.float32)          # [B, S]
    first = jnp.argmax(is_eos, axis=1)                     # first EOS per row
    end_emb = jnp.take_along_axis(
        encoder_hidden, first[:, None, None], axis=1)[:, 0]
    return jnp.mean((end_emb.astype(jnp.float32)
                     - target_query_emb.astype(jnp.float32)) ** 2)


def weight_distillation_loss(head_vectors: Array, target_emb: Array,
                             mask: Array) -> Array:
    """Masked MSE aligning per-position adaptive lm-head vectors with target
    prefix embeddings (the intended objective of ref modeling_t5.py:1704-1717,
    which as shipped consumes np.random fake data — SURVEY.md §6 defect 7).

    head_vectors/target_emb: [B, L, d]; mask: [B, L]."""
    diff = (head_vectors.astype(jnp.float32)
            - target_emb.astype(jnp.float32)) ** 2
    m = mask.astype(jnp.float32)[..., None]
    return (diff * m).sum() / jnp.maximum(m.sum() * diff.shape[-1], 1.0)


def cluster_infonce(query: Array, positive: Array, candidates: Array,
                    candidate_mask: Array, tau: float = 0.05,
                    intra_rate: float = 1.0, squash: str = "tanh") -> Array:
    """Cluster-adaptive contrastive loss over the dual-encoder space.

    Exact semantics of ``encoder_cal`` (main_models.py:1184-1221): similarity
    is ``squash(q·d)`` (tanh by default, bounding the logits); the positive's
    own-cluster candidates form the *intra* denominator and every other
    query's candidates the *inter* denominator, weighted by ``intra_rate``:

        loss_i = −s(q_i,p_i)/τ + log(intra_rate·Σ intra e^{s/τ} + Σ inter e^{s/τ})

    With ``intra_rate == 1`` this reduces to the reference's fused path
    (denominator over all candidates, positives excluded).

    query, positive: [B, d]; candidates: [B, C, d] (each row = same-cluster
    docs of query b, including its positive); candidate_mask: [B, C].
    """
    fn = jnp.tanh if squash == "tanh" else jax.nn.sigmoid
    q = query.astype(jnp.float32)
    pos_sim = fn(jnp.einsum("bd,bd->b", q, positive.astype(jnp.float32)))
    sims = fn(jnp.einsum("bd,jcd->bjc", q, candidates.astype(jnp.float32)))
    cmask = candidate_mask.astype(bool)[None]              # [1, B, C]
    exp = jnp.where(cmask, jnp.exp(sims / tau), 0.0)       # [B, B, C]
    b = q.shape[0]
    own = jnp.eye(b, dtype=bool)[:, :, None]               # [B, B, 1]
    intra = jnp.where(own, exp, 0.0).sum(axis=(1, 2))      # [B]
    inter = jnp.where(own, 0.0, exp).sum(axis=(1, 2))      # [B]
    denom = intra_rate * intra + inter
    loss = -pos_sim / tau + jnp.log(jnp.maximum(denom, 1e-30))
    return loss.mean()
