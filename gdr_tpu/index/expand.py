"""Corpus expansion without retraining — the paper's headline capability.

New documents are embedded, assigned to the nearest cluster by node-embedding
similarity, and appended to that cluster's doc list (ref
``tree_embedding_insert``, main_models.py:268-295; cached as
``indexmap_insert.pkl`` at :878-889).  The generative model is untouched:
the trie's *structure* (and therefore the CID language the model memorised)
is unchanged — only the cluster→doc expansion tables and the store grow.
"""

from __future__ import annotations

import numpy as np

from gdr_tpu.index.builder import Index
from gdr_tpu.ops.trie import compute_node_embeddings, insert_docs


def expand_index(index: Index, new_doc_embeddings: np.ndarray) -> Index:
    """Returns a new Index covering the enlarged corpus."""
    trie = index.trie
    if trie.node_embedding is None:
        trie = compute_node_embeddings(trie, index.store)
    first_new = index.store.shape[0]
    new_trie, rows = insert_docs(trie, new_doc_embeddings, first_new)
    store = np.concatenate([index.store,
                            np.asarray(new_doc_embeddings, np.float32)])
    cluster_cids = trie.cids_of_nodes(trie.cluster_node_ids)
    new_cids = [cluster_cids[int(r)] for r in rows]
    paths = index.paths + [[int(c) for c in cid.split("-")] for cid in new_cids]
    return Index(store=store, trie=new_trie, paths=paths,
                 cid_of_doc=index.cid_of_doc + new_cids)


def expand_with_encoder(index: Index, doc_encoder, params,
                        token_ids: np.ndarray, masks: np.ndarray,
                        batch_size: int = 256) -> Index:
    from gdr_tpu.index.builder import embed_corpus
    emb = embed_corpus(doc_encoder, params, token_ids, masks, batch_size)
    return expand_index(index, emb)
