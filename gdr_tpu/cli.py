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
                      rdrop=args.rdrop).scaled(args.model_size)
    if store_dim is not None:
        # the dense stage scores in the doc-embedding space of the index
        cfg = dataclasses.replace(cfg, encoder_d_model=int(store_dim))
    return cfg


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
    # tokenizer ids MUST stay inside the encoder's embedding table: an
    # out-of-bounds jnp.take fills NaN and silently poisons the whole store
    tok = load_tokenizer(args.doc_tokenizer, vocab_size=enc.vocab_size)
    if tok.vocab_size != enc.vocab_size:
        # a trained subword vocab sizes the tower's embedding table
        enc = dataclasses.replace(enc, vocab_size=tok.vocab_size)
    ids, mask = tok.encode_batch(texts, args.encoder_max_len)
    params = enc.init(jax.random.PRNGKey(args.seed), ids[:2], mask[:2])
    if args.encoder_ckpt:
        params = _load_msgpack(args.encoder_ckpt, params)
    cfg = IndexConfig(kary=args.kary, leaf_cap=args.leaf_cap, seed=args.seed)
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
    tok = load_tokenizer(args.tokenizer, vocab_size=mcfg.vocab_size)
    if tok.vocab_size != mcfg.vocab_size:
        mcfg = dataclasses.replace(mcfg, vocab_size=tok.vocab_size)
    tcfg = TrainConfig(train_batch_size=args.batch_size,
                       num_train_epochs=args.epochs,
                       train_encoder_epoch=args.train_encoder_epoch,
                       learning_rate=args.lr,
                       decoder_learning_rate=args.decoder_lr,
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

    loop = TrainLoop(cfg, index, train_set, dev,
                     workdir=args.workdir, seed=args.seed)
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
                        sample_top_k=args.sample_top_k)
    evaluator = Evaluator(model, index.trie, index.store, ev_cfg,
                          packed=args.packed, use_pallas=args.pallas)
    out = evaluator.evaluate(params, dev, batch_size=args.eval_batch_size)
    print(json.dumps(out, indent=2, sort_keys=True))


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


def cmd_calculate(args) -> None:
    from gdr_tpu.eval.offline import calculate
    print(json.dumps(calculate(args.result), indent=2, sort_keys=True))


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
                    help="docs TSV (needed for --hard-negatives bm25)")
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
    pe.add_argument("--seed", type=int, default=42)
    pe.set_defaults(fn=cmd_eval)

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
    pc.set_defaults(fn=cmd_calculate)

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

    cache_dir = os.environ.get(
        "GDR_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gdr_tpu_xla"))
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    args.fn(args)


if __name__ == "__main__":
    main()
