import jax
import numpy as np

from gdr_tpu.config import IndexConfig
from gdr_tpu.index.builder import (build_index, build_index_from_embeddings,
                                   embed_corpus)
from gdr_tpu.index.expand import expand_index
from gdr_tpu.models.dual_encoder import tiny_doc_encoder


def test_embed_corpus_batching_and_padding():
    enc = tiny_doc_encoder(d_model=16)
    ids = np.random.default_rng(0).integers(1, 500, size=(10, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    params = enc.init(jax.random.PRNGKey(0), ids[:2], mask[:2])
    emb = embed_corpus(enc, params, ids, mask, batch_size=4)
    assert emb.shape == (10, 16)
    # padding must not change results: full-batch vs chunked identical rows
    emb2 = embed_corpus(enc, params, ids, mask, batch_size=10)
    np.testing.assert_allclose(emb, emb2, rtol=1e-4, atol=1e-5)


def test_build_and_expand_index():
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(4, 16)) * 10
    store = np.concatenate([
        centers[i] + rng.normal(size=(10, 16)) * 0.2 for i in range(4)
    ]).astype(np.float32)
    cfg = IndexConfig(kary=4, leaf_cap=12, embedding_dim=16,
                      max_docs_per_cluster=32, seed=0)
    index = build_index_from_embeddings(store, cfg)
    assert len(index.paths) == 40
    assert index.trie.num_clusters >= 4
    # all docs of one blob share a CID prefix
    cid0 = {index.cid_of_doc[i].split("-")[0] for i in range(10)}
    assert len(cid0) == 1

    # expansion: a clone of doc 0 must join doc 0's cluster
    new = store[:2] + rng.normal(size=(2, 16)).astype(np.float32) * 0.01
    bigger = expand_index(index, new)
    assert bigger.store.shape[0] == 42
    assert bigger.cid_of_doc[40] == index.cid_of_doc[0]
    assert 40 in bigger.trie.docs_of_cid(index.cid_of_doc[0])
    # original assignments untouched
    assert bigger.cid_of_doc[:40] == index.cid_of_doc
