"""Command-line interface: train / eval / index / expand / calculate / bench.

Replaces the reference's mode switch in ``GDR_model/main.py`` (train at :36,
inference at :115, calculate at :253, ~100 argparse flags at :260-448) and
the ``train.sh`` / ``infer.sh`` wrappers with typed subcommands over the
dataclass configs.  Only the meaningful flag surface is exposed; presets
(`--model-size base|large|small`) mirror main.py:422-442.

Example:
    python -m gdr_tpu.cli index  --corpus docs.tsv --out index.npz
    python -m gdr_tpu.cli train  --index index.npz --train train.tsv \
                                 --dev dev.tsv --workdir runs/nq
    python -m gdr_tpu.cli eval   --index index.npz --dev dev.tsv \
                                 --workdir runs/nq --beam 100
    python -m gdr_tpu.cli expand --index index.npz --corpus new_docs.tsv \
                                 --out index_expanded.npz
    python -m gdr_tpu.cli calculate --result res1.tsv
"""

from __future__ import annotations

import argparse
import csv
import json
import os


def _add_common_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model-size", default="base",
                   choices=["base", "large", "small", "tiny"])
    p.add_argument("--kary", type=int, default=30)
    p.add_argument("--max-output-length", type=int, default=10)
    p.add_argument("--no-adaptor", action="store_true",
                   help="disable the PAWA adaptive lm-head")
    p.add_argument("--adaptor-layers", type=int, default=4)
    p.add_argument("--rdrop", type=float, default=0.1)


def _model_config(args, store_dim=None):
    import dataclasses
    from gdr_tpu.config import ModelConfig
    cfg = ModelConfig(kary=args.kary,
                      max_output_length=args.max_output_length,
                      adaptor_decode=not args.no_adaptor,
                      adaptor_layer_num=args.adaptor_layers,
                      rdrop=args.rdrop,
                      embedding_distillation=getattr(
                          args, "embed_distill", 0.0),
                      weight_distillation=getattr(
                          args, "weight_distill", 0.0)).scaled(args.model_size)
    if store_dim is not None:
        # the dense stage scores in the doc-embedding space of the index
        cfg = dataclasses.replace(cfg, encoder_d_model=int(store_dim))
    return cfg


def _mesh_from_flag(spec: str | None, batch_size: int | None = None):
    """``--mesh`` values: "none" (single device), "auto" (data-parallel over
    the visible devices — the reference's `gpus=list(range(n_gpu))`,
    main.py:70), or "DP,MP" explicit.

    With ``batch_size``, "auto" picks the largest dp that divides the batch
    (a batch of 6 on 8 chips trains dp=6) instead of erroring."""
    if spec in (None, "none"):
        return None
    import jax

    from gdr_tpu.config import MeshConfig
    from gdr_tpu.parallel.mesh import make_mesh
    if spec == "auto":
        n = jax.device_count()
        dp = n
        if batch_size is not None:
            while dp > 1 and batch_size % dp != 0:
                dp -= 1
        if dp == 1:
            return None
        return make_mesh(MeshConfig(dp=dp), devices=jax.devices()[:dp])
    parts = [int(x) for x in spec.split(",")]
    dp, mp = parts[0], (parts[1] if len(parts) > 1 else 1)
    return make_mesh(MeshConfig(dp=dp, mp=mp),
                     devices=jax.devices()[:dp * mp])


def _doc_encoder(args):
    from gdr_tpu.models.dual_encoder import DocEncoder, tiny_doc_encoder
    if getattr(args, "encoder_size", "full") == "tiny":
        return tiny_doc_encoder()
    return DocEncoder()


def _read_corpus_tsv(path: str) -> tuple[list[str], list[str]]:
    """TSV rows: title \t text (or just text)."""
    titles, texts = [], []
    with open(path, newline="") as fh:
        for row in csv.reader(fh, delimiter="\t"):
            if not row:
                continue
            if len(row) >= 2:
                titles.append(row[0])
                texts.append(row[1])
            else:
                titles.append(f"doc-{len(titles)}")
                texts.append(row[0])
    return titles, texts


def _read_query_tsv(path: str) -> tuple[list[str], list[list[int]]]:
    """TSV rows: query \t docid[,docid...]."""
    queries, positives = [], []
    with open(path, newline="") as fh:
        for row in csv.reader(fh, delimiter="\t"):
            if len(row) < 2:
                continue
            queries.append(row[0])
            positives.append([int(d) for d in row[1].split(",")])
    return queries, positives


def cmd_index(args) -> None:
    import jax
    import numpy as np

    from gdr_tpu.config import IndexConfig
    from gdr_tpu.data.tokenize import load_tokenizer
    from gdr_tpu.index.builder import build_index
    from gdr_tpu.index.io import save_index

    import dataclasses

    titles, texts = _read_corpus_tsv(args.corpus)
    enc = _doc_encoder(args)
    if args.bert_ckpt:
        # pretrained doc tower (ref embeds the corpus with AR2/BERT weights,
        # bert/bert.py:26-27): the tower takes the checkpoint's architecture
        from gdr_tpu.models.convert import bert_model_overrides
        enc = dataclasses.replace(enc, **bert_model_overrides(args.bert_ckpt))
    # tokenizer ids MUST stay inside the encoder's embedding table: an
    # out-of-bounds jnp.take fills NaN and silently poisons the whole store
    tok = load_tokenizer(args.doc_tokenizer or args.bert_ckpt,
                         vocab_size=enc.vocab_size)
    if tok.vocab_size != enc.vocab_size:
        if args.bert_ckpt:
            raise ValueError(
                f"--doc-tokenizer vocab ({tok.vocab_size}) must match the "
                f"--bert-ckpt vocab ({enc.vocab_size})")
        # a trained subword vocab sizes the tower's embedding table
        enc = dataclasses.replace(enc, vocab_size=tok.vocab_size)
    ids, mask = tok.encode_batch(texts, args.encoder_max_len)
    params = enc.init(jax.random.PRNGKey(args.seed), ids[:2], mask[:2])
    if args.bert_ckpt:
        from gdr_tpu.models.convert import (bert_state_dict_from_pretrained,
                                            load_bert_encoder)
        params = load_bert_encoder(
            params, bert_state_dict_from_pretrained(args.bert_ckpt),
            enc.num_layers, enc.num_heads)
        print(f"doc tower warm-started from {args.bert_ckpt}")
    if args.encoder_ckpt:
        params = _load_msgpack(args.encoder_ckpt, params)
    cfg = IndexConfig(kary=args.kary, leaf_cap=args.leaf_cap, seed=args.seed,
                      embedding_dim=enc.d_model)
    index = build_index(enc, params, ids, mask, cfg,
                        batch_size=args.batch_size)
    save_index(args.out, index)
    print(f"index: {len(index.paths)} docs, {index.trie.num_clusters} "
          f"clusters, {index.trie.num_nodes} nodes → {args.out}")


def cmd_train(args) -> None:
    import jax
    import numpy as np

    from gdr_tpu.config import EvalConfig, GDRConfig, TrainConfig
    from gdr_tpu.data.dataset import build_eval_data, build_train_set
    from gdr_tpu.data.tokenize import load_tokenizer
    from gdr_tpu.index.io import load_index
    from gdr_tpu.train.loop import TrainLoop

    import dataclasses

    index = load_index(args.index)
    mcfg = _model_config(args, store_dim=index.store.shape[1])
    if args.t5_ckpt and not args.t5_ckpt.endswith(".npz"):
        # warm start (ref main_models.py:786-793): the tree must match the
        # checkpoint's shapes exactly, so its config overrides the presets
        # (an .npz export is shape-asserted at load instead — pass the
        # matching --model-size flags)
        from gdr_tpu.models.convert import t5_model_overrides
        mcfg = dataclasses.replace(mcfg, **t5_model_overrides(args.t5_ckpt))
    tok = load_tokenizer(args.tokenizer or args.t5_ckpt,
                         vocab_size=mcfg.vocab_size)
    if tok.vocab_size != mcfg.vocab_size:
        if args.t5_ckpt:
            raise ValueError(
                f"--tokenizer vocab ({tok.vocab_size}) must match the "
                f"--t5-ckpt vocab ({mcfg.vocab_size}): resizing the "
                "embedding table would break the warm start — point "
                "--tokenizer at the checkpoint's own tokenizer")
        mcfg = dataclasses.replace(mcfg, vocab_size=tok.vocab_size)
    tcfg = TrainConfig(train_batch_size=args.batch_size,
                       stage2_train_batch_size=(args.stage2_batch_size
                                                or args.batch_size),
                       num_train_epochs=args.epochs,
                       train_encoder_epoch=args.train_encoder_epoch,
                       learning_rate=args.lr,
                       decoder_learning_rate=args.decoder_lr,
                       gradient_accumulation_steps=args.grad_accum,
                       bf16=not args.no_bf16,
                       checkpoint_dir=f"{args.workdir}/ckpt")
    from gdr_tpu.config import DataConfig
    dcfg = DataConfig(hard_negative=args.hard_negatives != "none",
                      sample_neg_num=(args.sample_neg_num
                                      if args.hard_negatives != "none" else 0))
    cfg = GDRConfig(model=mcfg, train=tcfg, data=dcfg,
                    eval=EvalConfig(num_beams=args.beam,
                                    num_return_sequences=args.beam,
                                    max_output_length=mcfg.max_output_length))

    queries, positives = _read_query_tsv(args.train)
    train_set = build_train_set(
        queries, [p[0] for p in positives], index.paths, tok, mcfg,
        args.max_input_length, label_length_cutoff=dcfg.label_length_cutoff)
    dev_q, dev_pos = _read_query_tsv(args.dev)
    dev = build_eval_data(dev_q, dev_pos, index.cid_of_doc, tok,
                          args.max_input_length)

    # secondary training modes (ref main.py flag surface :260-448)
    if args.ensemble > 1:
        from gdr_tpu.train.modes import eval_ensemble, train_ensemble
        train_ensemble(mcfg, index, train_set, num_decoders=args.ensemble,
                       epochs=args.epochs, lr=args.lr,
                       batch_size=args.batch_size, workdir=args.workdir,
                       seed=args.seed, leaf_cap=args.leaf_cap,
                       decoder_lr=args.decoder_lr, rdrop=mcfg.rdrop,
                       rdrop_loss=mcfg.rdrop_loss)
        out = eval_ensemble(mcfg, index, dev, args.workdir,
                            num_decoders=args.ensemble, beam=args.beam)
        print(json.dumps(out, indent=2, sort_keys=True))
        return
    if args.hierarchic:
        from gdr_tpu.train.modes import train_eval_hierarchic
        out = train_eval_hierarchic(mcfg, index, train_set, dev,
                                    epochs=args.epochs, lr=args.lr,
                                    batch_size=args.batch_size,
                                    workdir=args.workdir, seed=args.seed,
                                    beam=args.beam)
        print(json.dumps(out, indent=2, sort_keys=True))
        return
    if args.softmax:
        from gdr_tpu.train.modes import train_eval_softmax
        out = train_eval_softmax(mcfg, index, train_set, dev,
                                 epochs=args.epochs, lr=args.lr,
                                 batch_size=args.batch_size,
                                 workdir=args.workdir, seed=args.seed)
        print(json.dumps(out, indent=2, sort_keys=True))
        return

    if args.hard_negatives == "bm25":
        # mining needs the document text (ref bm25_preprocess.py:42-61)
        from gdr_tpu.data.negatives import bm25_negatives
        assert args.corpus, "--hard-negatives bm25 requires --corpus"
        _, doc_texts = _read_corpus_tsv(args.corpus)
        train_set.neg_pool = bm25_negatives(
            queries, positives, doc_texts,
            k=max(args.sample_neg_num * 3, 10))
    elif args.hard_negatives == "random":
        from gdr_tpu.data.negatives import random_negatives
        train_set.neg_pool = random_negatives(
            len(queries), len(index.paths), positives,
            k=max(args.sample_neg_num * 3, 10), seed=args.seed)

    # query-source mixing (ref --query_type, main_utils.py:146-223):
    # gtq = ground-truth queries, qg = generated pseudo-queries (`qg`
    # subcommand .npz), doc = first-doc_length-words-as-query, aug = random
    # document spans.  Default mix: gtq, plus qg when --qg is given.
    query_type = args.query_type or ("gtq_qg" if args.qg else "gtq")
    sources = {"gtq": train_set}
    wanted = query_type.split("_")
    if "qg" in wanted:
        # the reference's load_qg merge of docTTTTTquery shards
        # (generate_training_data.py:92-112)
        from gdr_tpu.data.dataset import build_train_set_from_tokens
        if not args.qg:
            raise ValueError(f"--query-type {query_type} needs --qg "
                             "(run the `qg` subcommand first)")
        z = np.load(args.qg)
        qt, qm = z["query_tokens"], z["query_mask"]
        s_train = train_set.input_ids.shape[1]
        if qt.shape[1] < s_train:              # align widths for concat
            pad = s_train - qt.shape[1]
            qt = np.pad(qt, ((0, 0), (0, pad)))
            qm = np.pad(qm, ((0, 0), (0, pad)))
        elif qt.shape[1] > s_train:
            qt, qm = qt[:, :s_train], qm[:, :s_train]
        sources["qg"] = build_train_set_from_tokens(
            qt, qm, [int(s) for s in z["source_doc"]], index.paths, mcfg)
    if "doc" in wanted or "aug" in wanted:
        from gdr_tpu.data.dataset import build_doc_query_sets
        if not args.corpus:
            raise ValueError(f"--query-type {query_type} needs --corpus "
                             "(doc/aug sources derive from document text)")
        _, doc_texts_q = _read_corpus_tsv(args.corpus)
        dq = dataclasses.replace(dcfg, max_input_length=args.max_input_length)
        sources.update(build_doc_query_sets(
            doc_texts_q, index.paths, tok, mcfg, dq,
            rng=np.random.default_rng(args.seed)))
    if query_type != "gtq":
        from gdr_tpu.data.dataset import mix_sources
        train_set = mix_sources(query_type, **sources)
        print("train set: " + " + ".join(
            f"{len(sources[w])} {w}" for w in wanted)
            + f" = {len(train_set)} rows")

    # stage 2 (live doc tower, ref two-stage switch main_models.py:1910-1917)
    # becomes reachable when the corpus text is provided: the docs are
    # tokenized once and the tower re-embeds them at every eval epoch
    doc_tokens = doc_tok_mask = doc_tower = None
    if args.corpus and args.train_encoder_epoch < args.epochs:
        doc_tower = _doc_encoder(args)
        if args.bert_ckpt:
            # the doc tower must BE the checkpoint's architecture, and its
            # hidden size must be the dense-scoring space the index was
            # embedded in (ref injects AR2/BERT weights, main_models.py:66-75)
            from gdr_tpu.models.convert import bert_model_overrides
            ov = bert_model_overrides(args.bert_ckpt)
            if ov["d_model"] != index.store.shape[1]:
                raise ValueError(
                    f"--bert-ckpt hidden size ({ov['d_model']}) != index "
                    f"store dim ({index.store.shape[1]}): rebuild the index "
                    "with the same checkpoint (index --bert-ckpt)")
            doc_tower = dataclasses.replace(doc_tower, **ov)
        else:
            doc_tower = dataclasses.replace(doc_tower,
                                            d_model=index.store.shape[1])
        dtok = load_tokenizer(args.doc_tokenizer or args.bert_ckpt,
                              vocab_size=doc_tower.vocab_size)
        if dtok.vocab_size != doc_tower.vocab_size:
            if args.bert_ckpt:
                raise ValueError(
                    f"--doc-tokenizer vocab ({dtok.vocab_size}) must match "
                    f"the --bert-ckpt vocab ({doc_tower.vocab_size})")
            # a trained subword vocab sizes the tower's embedding table
            doc_tower = dataclasses.replace(doc_tower,
                                            vocab_size=dtok.vocab_size)
        _, doc_texts_s2 = _read_corpus_tsv(args.corpus)
        doc_tokens, doc_tok_mask = dtok.encode_batch(doc_texts_s2,
                                                     args.encoder_max_len)
        print(f"stage 2 enabled: live doc tower over {len(doc_texts_s2)} "
              f"docs from epoch {args.train_encoder_epoch + 1}")
    elif args.bert_ckpt:
        raise ValueError("--bert-ckpt warm-starts the stage-2 doc tower: "
                         "pass --corpus and --train-encoder-epoch < --epochs")

    warm = None
    if args.t5_ckpt or args.bert_ckpt:
        def warm(params, _tower=doc_tower):
            from gdr_tpu.models import convert
            params = dict(params)
            if args.t5_ckpt:
                sd = convert.state_dict_from_pretrained(args.t5_ckpt)
                params["generator"] = convert.load_t5_encoder(
                    params["generator"], sd, mcfg.num_layers)
                print(f"warm-started T5 encoder + shared embeddings "
                      f"from {args.t5_ckpt}")
            if args.bert_ckpt:
                sd = convert.bert_state_dict_from_pretrained(args.bert_ckpt)
                params["doc_encoder"] = convert.load_bert_encoder(
                    params["doc_encoder"], sd, _tower.num_layers,
                    _tower.num_heads)
                print(f"warm-started BERT doc tower from {args.bert_ckpt}")
            return params

    loop = TrainLoop(cfg, index, train_set, dev,
                     workdir=args.workdir, seed=args.seed,
                     doc_tokens=doc_tokens, doc_tok_mask=doc_tok_mask,
                     doc_encoder=doc_tower,
                     mesh=_mesh_from_flag(args.mesh, args.batch_size),
                     packed_eval=args.packed_eval,
                     eval_pallas=args.eval_pallas,
                     warm_start=warm)
    loop.run()


def cmd_eval(args) -> None:
    import jax

    from gdr_tpu.config import EvalConfig
    from gdr_tpu.data.dataset import build_eval_data
    from gdr_tpu.data.tokenize import load_tokenizer
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.index.io import load_index
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.train.checkpoint import CheckpointManager

    import dataclasses

    index = load_index(args.index)
    mcfg = _model_config(args, store_dim=index.store.shape[1])
    tok = load_tokenizer(args.tokenizer, vocab_size=mcfg.vocab_size)
    if tok.vocab_size != mcfg.vocab_size:
        mcfg = dataclasses.replace(mcfg, vocab_size=tok.vocab_size)

    if args.ensemble > 1:
        from gdr_tpu.train.modes import eval_ensemble
        dev_q, dev_pos = _read_query_tsv(args.dev)
        dev = build_eval_data(dev_q, dev_pos, index.cid_of_doc, tok,
                              args.max_input_length)
        out = eval_ensemble(mcfg, index, dev, args.workdir,
                            num_decoders=args.ensemble, beam=args.beam,
                            batch_size=args.eval_batch_size)
        print(json.dumps(out, indent=2, sort_keys=True))
        return

    model = GenerativeRetriever(mcfg)
    params = init_params(model, jax.random.PRNGKey(args.seed),
                         input_len=args.max_input_length)
    ckpt = CheckpointManager(f"{args.workdir}/ckpt")
    step, raw = ckpt.restore_raw()
    if step is not None:
        params = raw["params"]["generator"]
        print(f"restored checkpoint step {step}")

    dev_q, dev_pos = _read_query_tsv(args.dev)
    dev = build_eval_data(dev_q, dev_pos, index.cid_of_doc, tok,
                          args.max_input_length)
    ev_cfg = EvalConfig(num_beams=args.beam, num_return_sequences=args.beam,
                        max_output_length=mcfg.max_output_length,
                        gen_method=args.gen_method,
                        temperature=args.temperature,
                        sample_top_k=args.sample_top_k,
                        fused_decode=args.fused_decode)
    evaluator = Evaluator(model, index.trie, index.store, ev_cfg,
                          mesh=_mesh_from_flag(args.mesh),
                          packed=args.packed, use_pallas=args.pallas,
                          quantize=args.int8_store)
    out = evaluator.evaluate(params, dev, batch_size=args.eval_batch_size,
                             result_tsv=args.result_tsv)
    if args.result_tsv:
        print(f"wrote result TSV → {args.result_tsv}")
    print(json.dumps(out, indent=2, sort_keys=True))


def cmd_retrieve(args) -> None:
    """Ad-hoc retrieval — the serving entry point.

    The reference has no interactive surface; its closest path is the batch
    eval loop (ref main.py:140-224), which needs a dev TSV with ground
    truth.  This command runs the same compiled retrieve program the
    evaluator uses (beam decode → trie expand → dense re-rank → fusion)
    over free-text queries from ``--query`` (repeatable), ``--queries-file``
    (one per line), or stdin, and prints the top ``--top-k`` documents per
    query as TSV (query_idx, rank, doc_id, fused_score, cid) or, with
    ``--json``, one JSON object per query.
    """
    import dataclasses
    import sys

    import jax
    import numpy as np

    from gdr_tpu.config import EvalConfig
    from gdr_tpu.data.tokenize import load_tokenizer
    from gdr_tpu.eval.evaluator import Evaluator
    from gdr_tpu.index.io import load_index
    from gdr_tpu.models.gdr import GenerativeRetriever, init_params
    from gdr_tpu.train.checkpoint import CheckpointManager

    queries = list(args.query or [])
    if args.queries_file:
        with open(args.queries_file) as fh:
            queries += [ln.strip() for ln in fh if ln.strip()]
    if not queries:
        queries = [ln.strip() for ln in sys.stdin if ln.strip()]
    if not queries:
        raise SystemExit("no queries (use --query / --queries-file / stdin)")

    index = load_index(args.index)
    mcfg = _model_config(args, store_dim=index.store.shape[1])
    tok = load_tokenizer(args.tokenizer, vocab_size=mcfg.vocab_size)
    if tok.vocab_size != mcfg.vocab_size:
        mcfg = dataclasses.replace(mcfg, vocab_size=tok.vocab_size)

    model = GenerativeRetriever(mcfg)
    params = init_params(model, jax.random.PRNGKey(args.seed),
                         input_len=args.max_input_length)
    ckpt = CheckpointManager(f"{args.workdir}/ckpt")
    step, raw = ckpt.restore_raw()
    if step is not None:
        params = raw["params"]["generator"]
        print(f"# restored checkpoint step {step}", file=sys.stderr)

    ev_cfg = EvalConfig(num_beams=args.beam,
                        num_return_sequences=args.top_k,
                        max_output_length=mcfg.max_output_length,
                        score_rates=(args.alpha,),
                        fused_decode=args.fused_decode)
    evaluator = Evaluator(model, index.trie, index.store, ev_cfg,
                          mesh=_mesh_from_flag(args.mesh),
                          packed=args.packed, use_pallas=args.pallas,
                          quantize=args.int8_store)

    bs = min(args.batch_size, len(queries))
    if not args.json:
        print("query_idx\trank\tdoc_id\tscore\tcid")
    for s in range(0, len(queries), bs):
        chunk = queries[s:s + bs]
        padded = chunk + [chunk[0]] * (bs - len(chunk))
        ids, msk = tok.encode_batch(padded, args.max_input_length)
        _, rr = evaluator.retrieve(params, ids, msk, batch_idx=s // bs)
        doc_ids = np.asarray(rr.doc_ids)[0]        # single fusion weight
        scores = np.asarray(rr.scores)[0]
        valid = np.asarray(rr.doc_valid)[0]
        for b, q in enumerate(chunk):
            hits = [(int(doc_ids[b, r]), float(scores[b, r]))
                    for r in np.flatnonzero(valid[b])[:args.top_k]]
            if args.json:
                print(json.dumps({
                    "query": q,
                    "results": [{"doc_id": d, "score": round(sc, 6),
                                 "cid": index.cid_of_doc[d]}
                                for d, sc in hits]}))
            else:
                for r, (d, sc) in enumerate(hits):
                    print(f"{s + b}\t{r + 1}\t{d}\t{sc:.6f}"
                          f"\t{index.cid_of_doc[d]}")


def cmd_expand(args) -> None:
    import jax

    from gdr_tpu.data.tokenize import load_tokenizer
    from gdr_tpu.index.expand import expand_with_encoder
    from gdr_tpu.index.io import load_index, save_index

    import dataclasses

    index = load_index(args.index)
    titles, texts = _read_corpus_tsv(args.corpus)
    enc = _doc_encoder(args)
    tok = load_tokenizer(args.doc_tokenizer, vocab_size=enc.vocab_size)
    if tok.vocab_size != enc.vocab_size:
        # same resize cmd_index applies: ids must fit the embedding table,
        # and the tower must match the one the index was embedded with
        enc = dataclasses.replace(enc, vocab_size=tok.vocab_size)
    ids, mask = tok.encode_batch(texts, args.encoder_max_len)
    params = enc.init(jax.random.PRNGKey(args.seed), ids[:2], mask[:2])
    if args.encoder_ckpt:
        params = _load_msgpack(args.encoder_ckpt, params)
    bigger = expand_with_encoder(index, enc, params, ids, mask)
    save_index(args.out, bigger)
    print(f"expanded: {len(index.paths)} → {len(bigger.paths)} docs "
          f"→ {args.out}")


def _ensure_eos(q_ids: "np.ndarray") -> "np.ndarray":
    """EOS-terminate tokenized queries (seq2seq targets): EOS at the first
    pad slot, or the last slot when the row is full."""
    import numpy as np
    q = np.asarray(q_ids).copy()
    for i in range(len(q)):
        pads = np.flatnonzero(q[i] == 0)
        q[i, pads[0] if len(pads) else -1] = 1
    return q


def cmd_qg(args) -> None:
    """Query generation — the in-framework docTTTTTquery pipeline.

    The reference finetunes/runs docTTTTTquery via an *external*
    ``t5_mesh_transformer`` job and merges pickle shards
    (README.md:24-52, generate_training_data.py:92-112); here one command
    optionally finetunes a doc→query Seq2SeqLM on the train TSV and samples
    ``--n-per-doc`` pseudo-queries per corpus doc into a token-level .npz
    consumed by ``train --qg`` (no string round-trip).
    """
    import jax
    import numpy as np
    import optax

    from gdr_tpu.data.tokenize import load_tokenizer
    from gdr_tpu.models.seq2seq import (Seq2SeqLM, generate_queries,
                                        make_qg_train_step)

    import dataclasses

    titles, texts = _read_corpus_tsv(args.corpus)
    mcfg = _model_config(args)
    tok = load_tokenizer(args.tokenizer, vocab_size=mcfg.vocab_size)
    if tok.vocab_size != mcfg.vocab_size:
        mcfg = dataclasses.replace(mcfg, vocab_size=tok.vocab_size)
    doc_ids, doc_mask = tok.encode_batch(texts, args.doc_length)
    model = Seq2SeqLM(mcfg)
    dummy_q = np.zeros((2, args.max_query_length), np.int32)
    params = model.init({"params": jax.random.PRNGKey(args.seed)},
                        doc_ids[:2], doc_mask[:2], dummy_q,
                        np.ones_like(dummy_q))

    if args.train:
        queries, positives = _read_query_tsv(args.train)
        q_ids, _ = tok.encode_batch(queries, args.max_query_length)
        q_ids = _ensure_eos(q_ids)
        pos = np.asarray([p[0] for p in positives], np.int64)
        opt = optax.adamw(args.lr)
        opt_state = opt.init(params)
        step = make_qg_train_step(model, opt)
        rng = np.random.default_rng(args.seed)
        bs = min(args.batch_size, len(queries))
        for epoch in range(args.qg_epochs):
            order = rng.permutation(len(queries))
            losses = []
            for s in range(0, len(order) - bs + 1, bs):
                idx = order[s:s + bs]
                batch = {"doc_tokens": doc_ids[pos[idx]],
                         "doc_mask": doc_mask[pos[idx]],
                         "query_tokens": q_ids[idx]}
                params, opt_state, loss = step(
                    params, opt_state, batch,
                    jax.random.PRNGKey(epoch * 10_007 + s))
                losses.append(float(loss))
            print(f"qg epoch {epoch}: loss {np.mean(losses):.4f}")

    all_toks, all_src = [], []
    bs = min(args.batch_size, len(texts))
    for s in range(0, len(texts), bs):
        e = min(s + bs, len(texts))
        ids, msk = doc_ids[s:e], doc_mask[s:e]
        if e - s < bs:        # pad to the compiled shape
            pad = bs - (e - s)
            ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]),
                                                ids.dtype)])
            msk = np.concatenate([msk, np.ones((pad, msk.shape[1]),
                                               msk.dtype)])
        toks, src = generate_queries(
            model, params, ids, msk, n_per_doc=args.n_per_doc,
            max_len=args.max_query_length,
            rng=jax.random.PRNGKey(args.seed * 7919 + s),
            temperature=args.temperature, top_k=args.sample_top_k)
        keep = np.asarray(src) < (e - s)
        all_toks.append(np.asarray(toks)[keep])
        all_src.append(np.asarray(src)[keep] + s)
    q_toks = np.concatenate(all_toks)
    src = np.concatenate(all_src)
    np.savez(args.out, query_tokens=q_toks.astype(np.int32),
             query_mask=(q_toks != 0).astype(np.int32),
             source_doc=src.astype(np.int32))
    print(f"qg: {len(q_toks)} pseudo-queries "
          f"({args.n_per_doc}/doc × {len(texts)} docs) → {args.out}")


def cmd_ingest(args) -> None:
    """Raw data → the corpus/train/dev TSVs that `index`/`train` consume.

    Replaces the reference's one-shot scripts (NQ_process.py:112-134 for
    simplified NQ jsonl, generate_training_data.py:26-201 for the 334k
    pickle corpus) with one command; together with `tokenizer`/`index`/
    `train`/`eval` this closes the raw-NQ → recall-numbers chain with no
    Python required.
    """
    from gdr_tpu.data.corpus import (corpus_from_records, ingest_nq_splits,
                                     queries_from_records)

    if bool(args.nq_jsonl) == bool(args.corpus_pickle):
        raise ValueError("pass exactly one of --nq-jsonl / --corpus-pickle")
    if args.corpus_pickle and not args.train_pickle:
        raise ValueError("--corpus-pickle requires --train-pickle")

    if args.nq_jsonl:
        corpus, train_q, dev_q = ingest_nq_splits(
            args.nq_jsonl, args.dev_jsonl, max_records=args.max_records)
    else:
        import pickle
        with open(args.corpus_pickle, "rb") as fh:
            corpus, title_to_id = corpus_from_records(pickle.load(fh))
        with open(args.train_pickle, "rb") as fh:
            train_q = queries_from_records(pickle.load(fh), title_to_id)
        dev_q = None
        if args.dev_pickle:
            with open(args.dev_pickle, "rb") as fh:
                dev_q = queries_from_records(pickle.load(fh), title_to_id)

    if dev_q is None and args.dev_frac > 0:
        # no dev file: hold out the tail (queries only — the corpus stays
        # whole so retrieval still runs over every document)
        n_dev = max(1, int(len(train_q.queries) * args.dev_frac))
        from gdr_tpu.data.corpus import QuerySet
        dev_q = QuerySet(queries=train_q.queries[-n_dev:],
                         doc_ids=train_q.doc_ids[-n_dev:])
        train_q = QuerySet(queries=train_q.queries[:-n_dev],
                           doc_ids=train_q.doc_ids[:-n_dev])

    os.makedirs(args.out_dir, exist_ok=True)

    def _clean(s: str) -> str:          # TSV-safe single-line fields
        return s.replace("\t", " ").replace("\n", " ")

    with open(os.path.join(args.out_dir, "corpus.tsv"), "w") as fh:
        for t, x in zip(corpus.titles, corpus.texts):
            fh.write(f"{_clean(t)}\t{_clean(x)}\n")

    def _write_queries(name: str, qs) -> None:
        with open(os.path.join(args.out_dir, name), "w") as fh:
            for q, ds in zip(qs.queries, qs.doc_ids):
                fh.write(f"{_clean(q)}\t{','.join(str(d) for d in ds)}\n")

    _write_queries("train.tsv", train_q)
    if dev_q is not None:
        _write_queries("dev.tsv", dev_q)
    print(f"ingest: {len(corpus.titles)} docs, {len(train_q.queries)} train"
          + (f", {len(dev_q.queries)} dev" if dev_q is not None else "")
          + f" → {args.out_dir}/{{corpus,train"
          + (",dev" if dev_q is not None else "") + "}.tsv")


def cmd_calculate(args) -> None:
    from gdr_tpu.eval.offline import calculate
    print(json.dumps(calculate(args.result, ref_compat=args.ref_compat),
                     indent=2, sort_keys=True))


def cmd_tokenizer(args) -> None:
    """Train a subword tokenizer over a corpus (offline; replaces the
    reference's external sentencepiece/WordPiece vocab files)."""
    from gdr_tpu.data.subword import train_unigram, train_wordpiece

    # train over every text column (docs.tsv: title+content; train.tsv:
    # the query column — numeric docid columns contribute ~nothing)
    titles, texts = _read_corpus_tsv(args.corpus)
    train = train_unigram if args.type == "unigram" else train_wordpiece
    tok = train(titles + texts, vocab_size=args.vocab_size, path=args.out)
    ids, mask = tok.encode_batch(texts[:2], 16)
    print(f"tokenizer: {args.type} vocab={tok.vocab_size} → {args.out} "
          f"(smoke: {ids[0][:8].tolist()})")


def _load_msgpack(path: str, template):
    from flax import serialization
    with open(path, "rb") as fh:
        return serialization.from_bytes(template, fh.read())


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gdr_tpu")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port "
                        "(auto-detected on TPU pods; single-host runs "
                        "need nothing)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index", help="embed corpus + k-means + trie")
    pi.add_argument("--corpus", required=True)
    pi.add_argument("--out", required=True)
    pi.add_argument("--kary", type=int, default=30)
    pi.add_argument("--leaf-cap", type=int, default=30)
    pi.add_argument("--encoder-max-len", type=int, default=128)
    pi.add_argument("--batch-size", type=int, default=256)
    pi.add_argument("--doc-tokenizer", default=None)
    pi.add_argument("--encoder-size", default="full", choices=["full", "tiny"])
    pi.add_argument("--encoder-ckpt", default=None)
    pi.add_argument("--bert-ckpt", default=None,
                    help="local HF BERT/DPR/AR2 checkpoint dir to embed the "
                         "corpus with (ref bert/bert.py:26-27)")
    pi.add_argument("--seed", type=int, default=7)
    pi.set_defaults(fn=cmd_index)

    pt = sub.add_parser("train", help="two-stage training")
    _add_common_model_flags(pt)
    pt.add_argument("--index", required=True)
    pt.add_argument("--train", required=True)
    pt.add_argument("--dev", required=True)
    pt.add_argument("--workdir", required=True)
    pt.add_argument("--tokenizer", default=None)
    pt.add_argument("--max-input-length", type=int, default=40)
    pt.add_argument("--batch-size", type=int, default=64)
    pt.add_argument("--stage2-batch-size", type=int, default=None,
                    help="stage-2 batch size (default: --batch-size; the "
                         "reference halves it at the stage switch)")
    pt.add_argument("--epochs", type=int, default=500)
    pt.add_argument("--train-encoder-epoch", type=int, default=51)
    pt.add_argument("--lr", type=float, default=2e-4)
    pt.add_argument("--decoder-lr", type=float, default=1e-4)
    pt.add_argument("--beam", type=int, default=100)
    pt.add_argument("--seed", type=int, default=42)
    pt.add_argument("--hard-negatives", default="none",
                    choices=["none", "bm25", "random"],
                    help="mine per-query negatives and train the "
                         "margin-ranking loss (ref --neg_sample_strategy)")
    pt.add_argument("--sample-neg-num", type=int, default=2)
    pt.add_argument("--corpus", default=None,
                    help="docs TSV, SAME file/order `index` used (enables "
                         "the stage-2 live doc tower when "
                         "--train-encoder-epoch < --epochs; also needed "
                         "for --hard-negatives bm25)")
    pt.add_argument("--doc-tokenizer", default=None,
                    help="tokenizer for the stage-2 doc tower (default: "
                         "hermetic hash tokenizer)")
    pt.add_argument("--encoder-max-len", type=int, default=128,
                    help="stage-2 doc token length")
    pt.add_argument("--encoder-size", default="full",
                    choices=["full", "tiny"],
                    help="stage-2 doc tower size")
    pt.add_argument("--packed-eval", action="store_true",
                    help="in-training eval reads candidates as contiguous "
                         "cluster slices (the `eval --packed` fast path)")
    pt.add_argument("--eval-pallas", action="store_true",
                    help="with --packed-eval: stream slices through the "
                         "Pallas re-rank kernel (TPU)")
    pt.add_argument("--mesh", default="auto",
                    help="device mesh: 'auto' (all chips data-parallel), "
                         "'none', or 'DP,MP' (e.g. 4,2)")
    pt.add_argument("--grad-accum", type=int, default=1,
                    help="gradient accumulation steps (ref derives 8/n_gpu, "
                         "main.py:410)")
    pt.add_argument("--no-bf16", action="store_true",
                    help="train in fp32 (bf16 compute is the default)")
    pt.add_argument("--embed-distill", type=float, default=0.0,
                    help="embedding-distillation weight (ref "
                         "--embedding_distillation)")
    pt.add_argument("--weight-distill", type=float, default=0.0,
                    help="lm-head weight-distillation weight (ref "
                         "--weight_distillation)")
    pt.add_argument("--t5-ckpt", default=None,
                    help="warm-start the generator's encoder + shared "
                         "embeddings from a local HF T5 checkpoint dir, or "
                         "an export_t5_encoder .npz (ref copies pretrained "
                         "t5-base params, main_models.py:786-793)")
    pt.add_argument("--bert-ckpt", default=None,
                    help="warm-start the stage-2 doc tower from a local HF "
                         "BERT/DPR/AR2 checkpoint dir (ref "
                         "main_models.py:66-75); requires --corpus and "
                         "--train-encoder-epoch < --epochs")
    pt.add_argument("--qg", default=None,
                    help=".npz of generated pseudo-queries (from the `qg` "
                         "subcommand) to merge into the train set")
    pt.add_argument("--query-type", default=None,
                    help="underscore-joined train-query mix of gtq (ground "
                         "truth), qg (needs --qg), doc, aug (both need "
                         "--corpus), e.g. gtq_qg_doc_aug (ref --query_type, "
                         "main_utils.py:146-223); default gtq, or gtq_qg "
                         "when --qg is given")
    pt.add_argument("--ensemble", type=int, default=1,
                    help="train N decoders over N docid assignments "
                         "(ref --multiple_decoder)")
    pt.add_argument("--leaf-cap", type=int, default=30,
                    help="leaf cap for the ensemble's alternative k-means "
                         "assignments")
    pt.add_argument("--hierarchic", action="store_true",
                    help="one decoder stack per CID depth "
                         "(ref --hierarchic_decode)")
    pt.add_argument("--softmax", action="store_true",
                    help="encoder-only softmax cluster classification "
                         "(ref --softmax)")
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("eval", help="standalone evaluation")
    _add_common_model_flags(pe)
    pe.add_argument("--index", required=True)
    pe.add_argument("--dev", required=True)
    pe.add_argument("--workdir", required=True)
    pe.add_argument("--tokenizer", default=None)
    pe.add_argument("--max-input-length", type=int, default=40)
    pe.add_argument("--beam", type=int, default=100)
    pe.add_argument("--eval-batch-size", type=int, default=8)
    pe.add_argument("--gen-method", default="beam",
                    choices=["beam", "greedy", "sample", "top_k"],
                    help="decode mode (ref --gen_method); greedy == beam "
                         "as in the reference, sample/top_k draw rollouts")
    pe.add_argument("--temperature", type=float, default=1.0)
    pe.add_argument("--sample-top-k", type=int, default=0)
    pe.add_argument("--packed", action="store_true",
                    help="cluster-packed store (contiguous per-beam slices)")
    pe.add_argument("--pallas", action="store_true",
                    help="Pallas re-rank kernel (TPU)")
    pe.add_argument("--fused-decode", action="store_true",
                    help="fused Pallas decoder sublayers for the full-width "
                         "beam steps (TPU)")
    pe.add_argument("--int8-store", action="store_true",
                    help="hold the doc-embedding store as per-row int8 "
                         "(4x smaller; dequantising dot in the re-rank). "
                         "Composes with --packed, --pallas (int8 streaming "
                         "kernel) and --mesh (requires --packed)")
    pe.add_argument("--result-tsv", default=None,
                    help="also write the reference-compatible res1 TSV "
                         "(query, preds, gts, rank) the `calculate` "
                         "subcommand consumes (ref main.py:244-247)")
    pe.add_argument("--mesh", default="none",
                    help="device mesh for the sharded-store re-rank: "
                         "'none', 'auto', or 'DP,MP'")
    pe.add_argument("--ensemble", type=int, default=1,
                    help="evaluate an N-decoder ensemble checkpoint "
                         "(ref --multiple_decoder)")
    pe.add_argument("--seed", type=int, default=42)
    pe.set_defaults(fn=cmd_eval)

    pr = sub.add_parser("retrieve",
                        help="ad-hoc retrieval (serving): free-text "
                             "queries → ranked documents")
    _add_common_model_flags(pr)
    pr.add_argument("--index", required=True)
    pr.add_argument("--workdir", required=True,
                    help="run dir holding the trained checkpoint")
    pr.add_argument("--tokenizer", default=None)
    pr.add_argument("--query", action="append",
                    help="query text (repeatable)")
    pr.add_argument("--queries-file", default=None,
                    help="file with one query per line (else stdin)")
    pr.add_argument("--max-input-length", type=int, default=40)
    pr.add_argument("--beam", type=int, default=100)
    pr.add_argument("--top-k", type=int, default=10)
    pr.add_argument("--alpha", type=float, default=1.0,
                    help="beam-probability fusion weight "
                         "(ref --score_rate; score = tanh(q·d) + α·p_beam)")
    pr.add_argument("--batch-size", type=int, default=4,
                    help="queries per compiled execution")
    pr.add_argument("--json", action="store_true",
                    help="one JSON object per query instead of TSV")
    pr.add_argument("--packed", action="store_true",
                    help="cluster-packed store (contiguous per-beam slices)")
    pr.add_argument("--pallas", action="store_true",
                    help="Pallas re-rank kernel (TPU)")
    pr.add_argument("--fused-decode", action="store_true",
                    help="fused Pallas decoder sublayers (TPU)")
    pr.add_argument("--int8-store", action="store_true",
                    help="int8 doc-embedding store (4x smaller)")
    pr.add_argument("--mesh", default="none",
                    help="device mesh for the sharded-store re-rank")
    pr.add_argument("--seed", type=int, default=42)
    pr.set_defaults(fn=cmd_retrieve)

    px = sub.add_parser("expand", help="insert new docs, no retraining")
    px.add_argument("--index", required=True)
    px.add_argument("--corpus", required=True)
    px.add_argument("--out", required=True)
    px.add_argument("--encoder-max-len", type=int, default=128)
    px.add_argument("--doc-tokenizer", default=None)
    px.add_argument("--encoder-size", default="full", choices=["full", "tiny"])
    px.add_argument("--encoder-ckpt", default=None)
    px.add_argument("--seed", type=int, default=7)
    px.set_defaults(fn=cmd_expand)

    pc = sub.add_parser("calculate", help="offline metrics from result TSV")
    pc.add_argument("--result", required=True)
    pc.add_argument("--ref-compat", action="store_true",
                    help="score with the reference's exact semantics "
                         "(hits@k over row-accumulated gt, per-row MRR100 "
                         "— main_metrics.py:194-267); default is the "
                         "cleaner per-query fraction-recall (PARITY.md)")
    pc.set_defaults(fn=cmd_calculate)

    pn = sub.add_parser("ingest", help="raw NQ jsonl / pickle corpus → "
                                       "corpus.tsv + train/dev TSVs")
    pn.add_argument("--nq-jsonl", default=None,
                    help="simplified NQ train jsonl(.gz) "
                         "(ref NQ_process.py:112-134)")
    pn.add_argument("--dev-jsonl", default=None,
                    help="simplified NQ dev jsonl(.gz); shares the train "
                         "corpus' doc-id table")
    pn.add_argument("--max-records", type=int, default=None)
    pn.add_argument("--corpus-pickle", default=None,
                    help="pickled [{'title','text'}] corpus "
                         "(ref generate_training_data.py:26-201)")
    pn.add_argument("--train-pickle", default=None,
                    help="pickled [{'query','positive_passages'}] records")
    pn.add_argument("--dev-pickle", default=None)
    pn.add_argument("--dev-frac", type=float, default=0.0,
                    help="with no dev file: hold out this query fraction "
                         "as dev.tsv")
    pn.add_argument("--out-dir", required=True)
    pn.set_defaults(fn=cmd_ingest)

    pq = sub.add_parser("qg", help="generate pseudo-queries per doc "
                                   "(in-framework docTTTTTquery)")
    _add_common_model_flags(pq)
    pq.add_argument("--corpus", required=True)
    pq.add_argument("--out", required=True, help=".npz output")
    pq.add_argument("--train", default=None,
                    help="train TSV to finetune doc→query first")
    pq.add_argument("--tokenizer", default=None)
    pq.add_argument("--doc-length", type=int, default=64)
    pq.add_argument("--max-query-length", type=int, default=40)
    pq.add_argument("--n-per-doc", type=int, default=5,
                    help="pseudo-queries per doc (ref QG_NUM, "
                         "generate_training_data.py:122)")
    pq.add_argument("--qg-epochs", type=int, default=3)
    pq.add_argument("--batch-size", type=int, default=64)
    pq.add_argument("--lr", type=float, default=1e-3)
    pq.add_argument("--temperature", type=float, default=1.0)
    pq.add_argument("--sample-top-k", type=int, default=10)
    pq.add_argument("--seed", type=int, default=42)
    pq.set_defaults(fn=cmd_qg)

    pk = sub.add_parser("tokenizer",
                        help="train a subword tokenizer over a corpus")
    pk.add_argument("--corpus", required=True)
    pk.add_argument("--out", required=True, help=".json output path")
    pk.add_argument("--type", default="unigram",
                    choices=["unigram", "wordpiece"],
                    help="unigram = T5/sentencepiece-style (queries); "
                         "wordpiece = BERT-style (documents)")
    pk.add_argument("--vocab-size", type=int, default=32000)
    pk.set_defaults(fn=cmd_tokenizer)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    # persistent XLA compile cache: repeated CLI invocations skip
    # recompilation (remote compiles through a tunnelled accelerator can
    # cost minutes even for tiny programs).  After argparse so --help and
    # usage errors never pay the jax import.
    import jax

    # honor an explicit JAX_PLATFORMS request: some environments pin the
    # platform list (e.g. "axon,cpu" on a tunnelled-TPU host) regardless of
    # the env var, so route it through the config API (see tests/conftest.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    cache_dir = os.environ.get(
        "GDR_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gdr_tpu_xla"))
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # multi-host bootstrap (replaces the reference's DDP process management,
    # main.py:70,86-104): auto-detected from the pod environment, or forced
    # with --coordinator/--num-processes/--process-id.  After this,
    # jax.devices() spans all hosts and --mesh auto shards globally.
    from gdr_tpu.parallel.distributed import initialize, process_info
    if initialize(args.coordinator, args.num_processes, args.process_id):
        import sys
        pi, pc = process_info()
        print(f"# multi-host: process {pi}/{pc}, "
              f"{len(jax.devices())} global devices", file=sys.stderr)

    args.fn(args)


if __name__ == "__main__":
    main()
