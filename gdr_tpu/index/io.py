"""Index persistence: one .npz for all trie tensors + store.

Replaces the reference's pickle zoo (``*tree.pkl``, ``doc_embedding.pkl``,
``indexmap.pkl``, ``IDMapping_*.pkl`` — SURVEY.md §1 artifact list) with a
single array container that loads straight onto the device.
"""

from __future__ import annotations

import json

import numpy as np

from gdr_tpu.index.builder import Index
from gdr_tpu.ops.trie import TrieTensors


def save_index(path: str, index: Index) -> None:
    t = index.trie
    np.savez_compressed(
        path,
        store=index.store,
        kary=np.asarray(t.kary),
        children=t.children,
        eos_allowed=t.eos_allowed,
        depth=t.depth,
        doc_start=t.doc_start,
        doc_count=t.doc_count,
        doc_indices=t.doc_indices,
        cluster_of_node=t.cluster_of_node,
        cluster_node_ids=t.cluster_node_ids,
        cluster_docs=t.cluster_docs,
        cluster_doc_mask=t.cluster_doc_mask,
        node_embedding=(t.node_embedding if t.node_embedding is not None
                        else np.zeros((0, 0), np.float32)),
        leaf_count=(t.leaf_count if t.leaf_count is not None
                    else np.zeros((0,), np.int32)),
        paths=np.frombuffer(
            json.dumps(index.paths).encode(), dtype=np.uint8),
    )


def load_index(path: str) -> Index:
    z = np.load(path, allow_pickle=False)
    node_emb = z["node_embedding"]
    leaf = z["leaf_count"]
    trie = TrieTensors(
        kary=int(z["kary"]),
        children=z["children"],
        eos_allowed=z["eos_allowed"],
        depth=z["depth"],
        doc_start=z["doc_start"],
        doc_count=z["doc_count"],
        doc_indices=z["doc_indices"],
        cluster_of_node=z["cluster_of_node"],
        cluster_node_ids=z["cluster_node_ids"],
        cluster_docs=z["cluster_docs"],
        cluster_doc_mask=z["cluster_doc_mask"],
        node_embedding=node_emb if node_emb.size else None,
        leaf_count=leaf if leaf.size else None,
    )
    paths = json.loads(bytes(z["paths"]).decode())
    cid_of_doc = ["-".join(str(d) for d in p) for p in paths]
    return Index(store=z["store"], trie=trie, paths=paths,
                 cid_of_doc=cid_of_doc)
