"""Secondary training/eval modes: ensemble, hierarchic, softmax classifier.

The reference exposes each as a flag on ``main.py`` (``--multiple_decoder``
``--hierarchic_decode`` ``--softmax``, main.py:260-448) routed through
``T5FineTuner``; here each is a small self-contained flow over the library
modules (models/ensemble.py, models/hierarchic.py, models/classifier.py),
reachable from the CLI (``train --ensemble N`` / ``--hierarchic`` /
``--softmax``).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.config import EvalConfig, ModelConfig
from gdr_tpu.data.dataset import TrainSet
from gdr_tpu.eval import metrics as M
from gdr_tpu.eval.evaluator import EvalData
from gdr_tpu.index.builder import Index


def _save_msgpack(path: str, tree) -> None:
    from flax import serialization
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(tree))


def _load_msgpack(path: str, template):
    from flax import serialization
    with open(path, "rb") as fh:
        return serialization.from_bytes(template, fh.read())


def _batches(n: int, batch_size: int, seed: int):
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    end = n - n % batch_size
    for s in range(0, end, batch_size):
        yield order[s:s + batch_size]


# --------------------------------------------------------------- ensemble

def alternative_assignments(index: Index, num: int, kary: int,
                            leaf_cap: int, seed: int) -> list[list[list[int]]]:
    """N docid assignments over one corpus: the index's own plus ``num-1``
    re-runs of hierarchical k-means under different seeds — the reference's
    ``bert_k30_c30_1..5`` columns (title_content.tsv, SURVEY §2.2
    multiple_decoder)."""
    from gdr_tpu.ops.kmeans import hierarchical_kmeans
    out = [index.paths]
    for i in range(1, num):
        out.append(hierarchical_kmeans(index.store, kary=kary,
                                       leaf_cap=leaf_cap, iters=15,
                                       seed=seed + 1009 * i))
    return out


def _member_labels(paths_list, pos_idx, mcfg: ModelConfig) -> np.ndarray:
    from gdr_tpu.ops.codec import digits_to_label
    n, q, L = len(paths_list), len(pos_idx), mcfg.max_output_length
    labels = np.zeros((n, q, L), np.int32)
    for i, paths in enumerate(paths_list):
        for j, doc in enumerate(pos_idx):
            labels[i, j], _ = digits_to_label(paths[int(doc)], mcfg.kary, L,
                                              mcfg.position)
    return labels


def paths_to_array(paths_list) -> np.ndarray:
    depth = max((len(p) for paths in paths_list for p in paths), default=1)
    arr = np.full((len(paths_list), len(paths_list[0]), depth), -1, np.int32)
    for i, paths in enumerate(paths_list):
        for j, p in enumerate(paths):
            arr[i, j, :len(p)] = p
    return arr


def array_to_paths(arr: np.ndarray) -> list[list[list[int]]]:
    return [[[int(d) for d in row if d >= 0] for row in member]
            for member in arr]


def train_ensemble(mcfg: ModelConfig, index: Index, train_set: TrainSet,
                   num_decoders: int, epochs: int, lr: float,
                   batch_size: int, workdir: str, seed: int,
                   leaf_cap: int = 30, decoder_lr: float | None = None,
                   weight_decay: float = 1e-4, max_grad_norm: float = 1.0,
                   rdrop: float = 0.0, rdrop_loss: str = "Contrast") -> dict:
    """Train N decoders (one per docid assignment) on one shared encoder
    (ref multiple_decoder, modeling_t5.py:1187-1256).

    The reference routes multiple_decoder through the SAME T5FineTuner
    optimizer/loss machinery as the main path — encoder/decoder split LRs
    with per-parameter weight-decay exemptions (main_models.py:1920-1975)
    and R-Drop batch duplication (:925-944); mirrored here with a 4-group
    ``optax.multi_transform`` (no doc-encoder tower in this mode) and the
    ``rdrop``/``rdrop_loss`` knobs of ``make_ensemble_train_step``.
    """
    import optax

    from gdr_tpu.models.ensemble import init_ensemble, make_ensemble_train_step
    from gdr_tpu.models.gdr import GenerativeRetriever
    from gdr_tpu.train.optimizer import _is_no_decay

    model = GenerativeRetriever(mcfg)
    enc_side, dec_stacked = init_ensemble(
        model, jax.random.PRNGKey(seed), num_decoders,
        input_len=train_set.input_ids.shape[1])
    paths_list = alternative_assignments(index, num_decoders, mcfg.kary,
                                         leaf_cap, seed)
    labels = _member_labels(paths_list, train_set.pos_idx, mcfg)
    lmask = (labels != 0).astype(np.int32)

    params = {"enc": enc_side, "dec": dec_stacked}
    if decoder_lr is None:
        decoder_lr = lr / 2            # ref default ratio 2e-4 / 1e-4

    def group(path, _):
        side = str(getattr(path[0], "key", path[0]))   # "enc" | "dec"
        return f"{side}_{'nd' if _is_no_decay(path) else 'wd'}"

    transforms = {
        "enc_wd": optax.adamw(lr, weight_decay=weight_decay),
        "enc_nd": optax.adamw(lr),
        "dec_wd": optax.adamw(decoder_lr, weight_decay=weight_decay),
        "dec_nd": optax.adamw(decoder_lr),
    }
    opt = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.multi_transform(
            transforms, jax.tree_util.tree_map_with_path(group, params)))
    opt_state = opt.init(params)
    step = make_ensemble_train_step(model, opt, rdrop=rdrop,
                                    rdrop_loss=rdrop_loss)
    base_rng = jax.random.PRNGKey(seed + 7)
    loss = float("nan")
    global_step = 0
    for epoch in range(epochs):
        losses = []
        for idx in _batches(len(train_set), batch_size, seed + epoch):
            batch = {"input_ids": jnp.asarray(train_set.input_ids[idx]),
                     "attn_mask": jnp.asarray(train_set.attn_mask[idx]),
                     "labels": jnp.asarray(labels[:, idx]),
                     "label_mask": jnp.asarray(lmask[:, idx])}
            params, opt_state, loss, _ = step(
                params, opt_state, batch,
                jax.random.fold_in(base_rng, global_step))
            losses.append(float(loss))
            global_step += 1
        print(f"ensemble epoch {epoch}: loss {np.mean(losses):.4f}")

    _save_msgpack(os.path.join(workdir, "ensemble.msgpack"), params)
    np.save(os.path.join(workdir, "ensemble_paths.npy"),
            paths_to_array(paths_list))
    return {"params": params, "paths_list": paths_list,
            "final_loss": float(loss)}


def eval_ensemble(mcfg: ModelConfig, index: Index, dev: EvalData,
                  workdir: str, num_decoders: int, beam: int,
                  batch_size: int = 8,
                  score_rates=(0.0,)) -> dict[str, float]:
    """Per-member constrained retrieval over each member's own trie, merged
    by best fused score (ref main_models.py:1663-1676)."""
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.models.ensemble import init_ensemble, member_params, \
        merge_retrievals
    from gdr_tpu.models.gdr import GenerativeRetriever
    from gdr_tpu.ops.kmeans import paths_to_cid_mapping
    from gdr_tpu.ops.trie import build_trie

    model = GenerativeRetriever(mcfg)
    template = {"enc": None, "dec": None}
    enc_side, dec_stacked = init_ensemble(
        model, jax.random.PRNGKey(0), num_decoders,
        input_len=dev.input_ids.shape[1])
    template = {"enc": enc_side, "dec": dec_stacked}
    params = _load_msgpack(os.path.join(workdir, "ensemble.msgpack"),
                           template)
    paths_list = array_to_paths(
        np.load(os.path.join(workdir, "ensemble_paths.npy")))

    ev_cfg = EvalConfig(num_beams=beam, num_return_sequences=beam,
                        max_output_length=mcfg.max_output_length,
                        score_rates=tuple(score_rates))
    doc_lists: list[list[list[str]]] = []
    score_lists: list[list[list[float]]] = []
    for i in range(num_decoders):
        mapping = paths_to_cid_mapping(paths_list[i])
        counts = [len(v) for v in mapping.values()]
        trie = build_trie(mapping, kary=mcfg.kary,
                          max_docs_per_cluster=max(counts + [8]),
                          doc_embeddings=index.store)
        ev = Evaluator(model, trie, index.store, ev_cfg)
        p_i = member_params(params["enc"], params["dec"], i)
        nq = len(dev.input_ids)
        docs_q: list[list[str]] = [[] for _ in range(nq)]
        scores_q: list[list[float]] = [[] for _ in range(nq)]
        for s in range(0, nq, batch_size):
            e = min(s + batch_size, nq)
            pad = batch_size - (e - s)
            ids = np.concatenate([dev.input_ids[s:e]]
                                 + ([dev.input_ids[s:s + 1]] * pad
                                    if pad else []))
            msk = np.concatenate([dev.attn_mask[s:e]]
                                 + ([dev.attn_mask[s:s + 1]] * pad
                                    if pad else []))
            _, rr = ev.retrieve(p_i, ids, msk)
            d = np.asarray(rr.doc_ids)[0]
            v = np.asarray(rr.doc_valid)[0]
            sc = np.asarray(rr.scores)[0]
            for b in range(e - s):
                docs_q[s + b] = [str(int(x)) for x, ok
                                 in zip(d[b], v[b]) if ok]
                scores_q[s + b] = [float(x) for x, ok
                                   in zip(sc[b], v[b]) if ok]
        doc_lists.append(docs_q)
        score_lists.append(scores_q)

    merged = {q: merge_retrievals([doc_lists[i][q] for i in range(num_decoders)],
                                  [score_lists[i][q] for i in range(num_decoders)],
                                  top_k=beam)
              for q in range(len(dev.input_ids))}
    gts = {q: dev.gt_docs[q] for q in merged}
    out = M.full_suite(merged, gts, recall_ks=(1, 5, 10, 20, 50, 100),
                       accuracy_ks=(1, 20, 100), mrr_ks=(10, 100),
                       map_k=100)
    return out


# -------------------------------------------------------------- hierarchic

def train_eval_hierarchic(mcfg: ModelConfig, index: Index,
                          train_set: TrainSet, dev: EvalData, epochs: int,
                          lr: float, batch_size: int, workdir: str,
                          seed: int, eval_batch_size: int = 8,
                          beam: int = 10, score_rates=(0.0,),
                          length_penalty: float = 0.8) -> dict:
    """Per-depth decoder stacks (ref HierarchicT5Stack,
    modeling_t5.py:1080-1149): CE training on the depth-routed logits, then
    trie-constrained beam decode + dense re-rank — the same constrained
    search + fused re-rank machinery as the main path (the reference routes
    hierarchic_decode through the identical validation_step,
    main_models.py:1337-1642).  ``beam=1`` is the reference's greedy mode."""
    import optax

    from gdr_tpu.models.gdr import GenerativeRetriever, shift_right
    from gdr_tpu.models.hierarchic import hierarchic_logits, init_hierarchic
    from gdr_tpu.ops.losses import masked_cross_entropy

    depth = int(index.trie.depth.max())
    model = GenerativeRetriever(mcfg)
    base, stacked = init_hierarchic(model, jax.random.PRNGKey(seed), depth,
                                    input_len=train_set.input_ids.shape[1])
    params = {"base": base, "dec": stacked}
    opt = optax.adamw(lr)
    opt_state = opt.init(params)
    losses: list[float] = []

    def loss_fn(p, batch):
        logits = hierarchic_logits(model, p["base"], p["dec"],
                                   batch["input_ids"], batch["attn_mask"],
                                   batch["labels"], batch["label_mask"])
        return masked_cross_entropy(logits, batch["labels"],
                                    batch["label_mask"])

    @jax.jit
    def step(p, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    for epoch in range(epochs):
        losses = []
        for idx in _batches(len(train_set), batch_size, seed + epoch):
            batch = {k: jnp.asarray(getattr(train_set, k)[idx])
                     for k in ("input_ids", "attn_mask", "labels",
                               "label_mask")}
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        print(f"hierarchic epoch {epoch}: loss {np.mean(losses):.4f}")

    _save_msgpack(os.path.join(workdir, "hierarchic.msgpack"), params)

    # ---- trie-constrained beam decode + dense re-rank, stack per depth ----
    from gdr_tpu.models.hierarchic import hierarchic_generate_cids
    from gdr_tpu.ops.rerank import rerank

    trie = index.trie
    L = mcfg.max_output_length
    children = jnp.asarray(trie.children)
    eos_allowed = jnp.asarray(trie.eos_allowed)
    store = jnp.asarray(index.store)
    alphas = jnp.asarray(tuple(score_rates), jnp.float32)

    @jax.jit
    def decode_fn(p, ids, msk):
        res, q_emb = hierarchic_generate_cids(
            model, p["base"], p["dec"], ids, msk, children, eos_allowed,
            num_beams=beam, max_len=L, length_penalty=length_penalty)
        rr = rerank(store, q_emb, res.nodes, res.scores, res.valid,
                    jnp.asarray(trie.cluster_of_node),
                    jnp.asarray(trie.cluster_docs),
                    jnp.asarray(trie.cluster_doc_mask),
                    alphas, top_r=beam)
        return res, rr

    nq = len(dev.input_ids)
    preds: dict[int, list[str]] = {}
    doc_preds: dict[int, list[str]] = {}
    bs = eval_batch_size
    for s in range(0, nq, bs):
        e = min(s + bs, nq)
        pad = bs - (e - s)
        ids = np.concatenate([dev.input_ids[s:e]]
                             + ([dev.input_ids[s:s + 1]] * pad if pad else []))
        msk = np.concatenate([dev.attn_mask[s:e]]
                             + ([dev.attn_mask[s:s + 1]] * pad if pad else []))
        res, rr = decode_fn(params, jnp.asarray(ids), jnp.asarray(msk))
        nodes = np.asarray(res.nodes)
        valid = np.asarray(res.valid)
        docs = np.asarray(rr.doc_ids)[0]        # α = score_rates[0]
        dvalid = np.asarray(rr.doc_valid)[0]
        for b in range(e - s):
            preds[s + b] = [trie.cid_of_node(int(n)) for n, ok
                            in zip(nodes[b], valid[b]) if ok]
            doc_preds[s + b] = [str(int(d)) for d, ok
                                in zip(docs[b], dvalid[b]) if ok]

    ks = tuple(k for k in (1, 5, 10, 20, 50, 100) if k <= beam) or (1,)
    aks = tuple(k for k in (1, 20, 100) if k <= beam) or (1,)
    gt = {q: dev.gt_cids[q] for q in preds}
    out = M.full_suite(preds, gt, recall_ks=ks, accuracy_ks=aks,
                       mrr_ks=(10,), map_k=10, prefix="cluster_")
    gtd = {q: dev.gt_docs[q] for q in doc_preds}
    out.update(M.full_suite(doc_preds, gtd, recall_ks=ks, accuracy_ks=aks,
                            mrr_ks=(10,), map_k=10))
    out["final_loss"] = float(np.mean(losses)) if losses else float("nan")
    return out


# ---------------------------------------------------------------- softmax

def train_eval_softmax(mcfg: ModelConfig, index: Index, train_set: TrainSet,
                       dev: EvalData, epochs: int, lr: float,
                       batch_size: int, workdir: str, seed: int,
                       eval_batch_size: int = 8) -> dict[str, float]:
    """Softmax classification mode (ref ``--softmax``: encoder + linear head
    over classes, main_models.py:749,822,1224-1226,1286-1300).  Classes are
    the trie's clusters; evaluation ranks clusters by logit."""
    import optax

    from gdr_tpu.models.classifier import EncoderClassifier
    from gdr_tpu.ops.losses import masked_cross_entropy  # noqa: F401 (doc)

    trie = index.trie
    num_cls = trie.num_clusters
    # doc → cluster row
    cls_of_doc = np.zeros(len(index.paths), np.int32)
    node_to_row = {int(n): r for r, n in enumerate(trie.cluster_node_ids)}
    for d, p in enumerate(index.paths):
        cls_of_doc[d] = node_to_row[trie.node_of_path(p)]
    cid_of_row = [trie.cid_of_node(int(n)) for n in trie.cluster_node_ids]

    model = EncoderClassifier(mcfg, num_cls=num_cls)
    params = model.init({"params": jax.random.PRNGKey(seed)},
                        jnp.asarray(train_set.input_ids[:2]),
                        jnp.asarray(train_set.attn_mask[:2]))
    opt = optax.adamw(lr)
    opt_state = opt.init(params)

    def loss_fn(p, ids, msk, y, rng):
        logits = model.apply(p, ids, msk, deterministic=False,
                             rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()

    @jax.jit
    def step(p, opt_state, ids, msk, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, msk, y, rng)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    targets = cls_of_doc[train_set.pos_idx]
    losses = []
    for epoch in range(epochs):
        losses = []
        for i, idx in enumerate(_batches(len(train_set), batch_size,
                                         seed + epoch)):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(train_set.input_ids[idx]),
                jnp.asarray(train_set.attn_mask[idx]),
                jnp.asarray(targets[idx]),
                jax.random.PRNGKey(epoch * 7919 + i))
            losses.append(float(loss))
        print(f"softmax epoch {epoch}: loss {np.mean(losses):.4f}")

    _save_msgpack(os.path.join(workdir, "softmax.msgpack"), params)

    @jax.jit
    def rank_fn(p, ids, msk):
        logits = model.apply(p, ids, msk)
        k = min(100, num_cls)
        return jax.lax.top_k(logits, k)

    nq = len(dev.input_ids)
    preds: dict[int, list[str]] = {}
    bs = eval_batch_size
    for s in range(0, nq, bs):
        e = min(s + bs, nq)
        pad = bs - (e - s)
        ids = np.concatenate([dev.input_ids[s:e]]
                             + ([dev.input_ids[s:s + 1]] * pad if pad else []))
        msk = np.concatenate([dev.attn_mask[s:e]]
                             + ([dev.attn_mask[s:s + 1]] * pad if pad else []))
        _, top = rank_fn(params, jnp.asarray(ids), jnp.asarray(msk))
        top = np.asarray(top)
        for b in range(e - s):
            preds[s + b] = [cid_of_row[int(c)] for c in top[b]]

    gt = {q: dev.gt_cids[q] for q in preds}
    out = M.full_suite(preds, gt,
                       recall_ks=(1, 5, 10, 20, 50, 100),
                       accuracy_ks=(1, 20, 100), mrr_ks=(10, 100),
                       map_k=100, prefix="cluster_")
    out["final_loss"] = float(np.mean(losses)) if losses else float("nan")
    return out
