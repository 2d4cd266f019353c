import gzip
import json

import numpy as np
import pytest

from gdr_tpu.config import ModelConfig
from gdr_tpu.data.corpus import (doc_aug_spans, first_k_words,
                                 ingest_nq_jsonl, ingest_pickle_corpus)
from gdr_tpu.data.dataset import (BatchIterator, TrainSet, build_eval_data,
                                  build_train_set, cluster_docs_lookup,
                                  mix_sources)
from gdr_tpu.data.negatives import BM25Index, bm25_negatives, random_negatives
from gdr_tpu.data.tokenize import HashTokenizer, load_tokenizer

MCFG = ModelConfig(kary=4, max_output_length=5, vocab_size=512)


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=512)
    a, am = tok.encode("What is the capital of France?", 8)
    b, _ = tok.encode("What is the capital of France?", 8)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int32 and am.sum() == 7
    assert np.all(a[am == 1] >= 2)  # reserved ids untouched
    c, _ = tok.encode("capital France", 8)
    assert c[0] == a[3]  # same word → same id regardless of position


def test_load_tokenizer_fallback():
    tok = load_tokenizer("nonexistent/model/path", vocab_size=256)
    assert isinstance(tok, HashTokenizer)


def test_ingest_nq_jsonl(tmp_path):
    path = tmp_path / "nq.jsonl.gz"
    recs = [
        {"document_title": "A", "document_text": "Alpha doc text",
         "question_text": "what is alpha"},
        {"document_title": "B", "document_text": "Beta doc",
         "question_text": "what is beta"},
        {"document_title": "A", "document_text": "ignored duplicate",
         "question_text": "alpha again"},
    ]
    with gzip.open(path, "wt") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    corpus, queries = ingest_nq_jsonl(str(path))
    assert len(corpus) == 2              # dedup by title
    assert len(queries) == 3
    assert queries.doc_ids[2] == [0]     # duplicate title → same doc id


def test_ingest_pickle_corpus():
    corpus_recs = [{"title": "A", "text": "TxtA"}, {"title": "B", "text": "TxtB"}]
    data_recs = [{"query": "Q1", "positive_passages": [{"title": "B"}, {"title": "A"}]}]
    corpus, queries = ingest_pickle_corpus(corpus_recs, data_recs)
    assert len(corpus) == 2
    assert queries.doc_ids[0] == [0, 1]  # multi-positive row


def test_doc_aug_spans():
    texts = ["one two three four five six seven eight", "tiny"]
    spans, src = doc_aug_spans(texts, aug_len=3,
                               rng=np.random.default_rng(0))
    assert all(len(s.split()) <= 3 for s in spans)
    assert set(src) == {0, 1}
    assert first_k_words(texts, 2) == ["one two", "tiny"]


def _mini_world():
    tok = HashTokenizer(vocab_size=512)
    paths = [[0], [0], [1, 2], [1, 2], [3]]
    queries = [f"query about doc {i}" for i in range(5)]
    ts = build_train_set(queries, list(range(5)), paths, tok, MCFG, 12)
    return tok, paths, ts


def test_build_train_set_labels():
    _, paths, ts = _mini_world()
    assert ts.input_ids.shape == (5, 12)
    # doc 2 path [1,2] → tokens [1*?]: pos0: 0*4+1+2=3, pos1: 1*4+2+2=8, eos
    np.testing.assert_array_equal(ts.labels[2], [3, 8, 1, 0, 0])
    np.testing.assert_array_equal(ts.label_mask[2], [1, 1, 1, 0, 0])


def test_mix_sources():
    _, _, ts = _mini_world()
    qg = TrainSet(ts.input_ids[:2], ts.attn_mask[:2], ts.labels[:2],
                  ts.label_mask[:2], ts.pos_idx[:2], ["qg"] * 2)
    mixed = mix_sources("gtq_qg", gtq=ts, qg=qg)
    assert len(mixed) == 7
    with pytest.raises(ValueError):
        mix_sources("gtq_doc", gtq=ts)


def test_batch_iterator_candidates():
    _, paths, ts = _mini_world()
    cid_of_doc = ["-".join(map(str, p)) for p in paths]
    lookup = cluster_docs_lookup(cid_of_doc)
    assert lookup[0] == [0, 1] and lookup[2] == [2, 3]
    it = BatchIterator(ts, lookup, batch_size=2, max_intraclass=2, seed=0)
    batches = list(it)
    assert len(batches) == 2             # 5 rows, drop_last
    for b in batches:
        assert b["cand_idx"].shape == (2, 3)
        for row in range(2):
            pos = int(b["pos_idx"][row])
            cands = [int(x) for x, m in zip(b["cand_idx"][row],
                                            b["cand_mask"][row]) if m]
            assert pos in cands          # positive always included
            assert all(cid_of_doc[c] == cid_of_doc[pos] for c in cands)


def test_build_eval_data_multi_positive():
    tok, paths, _ = _mini_world()
    cid_of_doc = ["-".join(map(str, p)) for p in paths]
    data = build_eval_data(["q"], [[2, 3]], cid_of_doc, tok, 12)
    assert data.gt_docs[0] == ["2", "3"]
    assert data.gt_cids[0] == ["1-2"]    # same cluster → one gt cid


def test_bm25():
    docs = ["the cat sat on the mat", "dogs chase cats",
            "quantum computing with qubits", "the dog barked"]
    idx = BM25Index(docs)
    top = idx.top_k("cat mat", 2)
    assert top[0] == 0
    negs = bm25_negatives(["dog"], [[3]], docs, k=2)
    assert 3 not in negs[0]              # positive excluded
    rn = random_negatives(2, 10, [[0], [1]], k=3, seed=0)
    assert all(len(n) == 3 for n in rn)
    assert 0 not in rn[0] and 1 not in rn[1]


def test_build_doc_query_sets():
    from gdr_tpu.config import DataConfig
    from gdr_tpu.data.dataset import build_doc_query_sets, mix_sources

    tok = HashTokenizer(vocab_size=512)
    texts = ["alpha beta gamma delta " * 10, "tiny doc"]
    paths = [[0, 1], [2]]
    sets = build_doc_query_sets(texts, paths, tok, MCFG,
                                DataConfig(max_input_length=12, doc_length=4))
    assert len(sets["doc"]) == 2
    assert sets["doc"].source == ["doc", "doc"]
    assert len(sets["aug"]) >= 2
    # every aug row points at a real doc and carries that doc's CID label
    for i, pos in enumerate(sets["aug"].pos_idx):
        assert 0 <= pos < 2
    gtq = build_train_set(["q0", "q1"], [0, 1], paths, tok, MCFG, 12)
    mixed = mix_sources("gtq_doc_aug", gtq=gtq, **sets)
    assert len(mixed) == 2 + 2 + len(sets["aug"])
