import numpy as np
import pytest

from gdr_tpu.ops import codec
from gdr_tpu.ops.trie import (build_trie, build_trie_from_encoded,
                              compute_node_embeddings, insert_docs, tree_match)

KARY = 4


@pytest.fixture
def toy_trie():
    cid_to_docs = {
        "0-1": [0, 1],
        "0-2": [2],
        "1": [3, 4, 5],
        "3-0-2": [6],
    }
    return build_trie(cid_to_docs, kary=KARY, max_docs_per_cluster=8)


def test_structure(toy_trie):
    t = toy_trie
    assert t.node_of_path([0, 1]) >= 0
    assert t.node_of_path([0, 3]) == -1
    assert t.node_of_path([2]) == -1
    assert sorted(t.docs_of_cid("0-1")) == [0, 1]
    assert sorted(t.docs_of_cid("1")) == [3, 4, 5]
    assert t.docs_of_cid("3-0-2") == [6]
    # eos only allowed at complete CIDs
    assert t.eos_allowed[t.node_of_path([0, 1])]
    assert not t.eos_allowed[t.node_of_path([0])]
    assert not t.eos_allowed[0]
    # BFS numbering: parent < child
    for n in range(t.num_nodes):
        for d in range(KARY):
            c = t.children[n, d]
            if c >= 0:
                assert c > n


def test_id_mapping_roundtrip(toy_trie):
    mapping = toy_trie.id_mapping()
    assert sorted(mapping.keys()) == ["0-1", "0-2", "1", "3-0-2"]
    assert sorted(mapping["1"]) == [3, 4, 5]


def test_cluster_table(toy_trie):
    t = toy_trie
    assert t.num_clusters == 4
    for row, node in enumerate(t.cluster_node_ids):
        cid = t.cid_of_node(int(node))
        docs = set(t.docs_of_cid(cid))
        padded = set(int(x) for x, m in zip(t.cluster_docs[row], t.cluster_doc_mask[row]) if m)
        assert docs == padded
        assert t.cluster_of_node[node] == row


def test_node_embeddings(toy_trie):
    d = 8
    emb = np.arange(7 * d, dtype=np.float32).reshape(7, d)
    t = compute_node_embeddings(toy_trie, emb)
    # cluster node: mean of attached docs
    n01 = t.node_of_path([0, 1])
    np.testing.assert_allclose(t.node_embedding[n01], emb[[0, 1]].mean(0), rtol=1e-6)
    # internal node "0": leaf-count weighted mean of children = mean of docs 0,1,2
    n0 = t.node_of_path([0])
    np.testing.assert_allclose(t.node_embedding[n0], emb[[0, 1, 2]].mean(0), rtol=1e-6)
    assert t.leaf_count[n0] == 3
    # root: all 7 docs
    np.testing.assert_allclose(t.node_embedding[0], emb.mean(0), rtol=1e-6)
    assert t.leaf_count[0] == 7


def test_tree_match_greedy_descent(toy_trie):
    emb = np.zeros((7, 4), dtype=np.float32)
    emb[6] = [0, 0, 0, 10.0]   # make doc 6's cluster "3-0-2" stand out
    t = compute_node_embeddings(toy_trie, emb)
    path = tree_match(t, np.array([0, 0, 0, 1.0], dtype=np.float32))
    assert path == [3, 0, 2]


def test_insert_docs(toy_trie):
    emb = np.random.default_rng(0).normal(size=(7, 4)).astype(np.float32)
    t = compute_node_embeddings(toy_trie, emb)
    # new doc aligned exactly with cluster "1"'s embedding
    n1 = t.node_of_path([1])
    new = t.node_embedding[n1][None, :] * 2.0
    t2, rows = insert_docs(t, new, first_new_index=7)
    assert 7 in t2.docs_of_cid("1")
    # old docs unchanged
    assert sorted(t2.docs_of_cid("0-1")) == [0, 1]
    assert t2.docs_of_cid("3-0-2") == [6]


def test_build_from_encoded():
    seqs = [codec.encode_cid([0, 1], KARY), codec.encode_cid([0, 1], KARY),
            codec.encode_cid([2], KARY)]
    t = build_trie_from_encoded(seqs, [10, 11, 12], kary=KARY)
    assert sorted(t.docs_of_cid("0-1")) == [10, 11]
    assert t.docs_of_cid("2") == [12]


def test_overflow_cluster_cap():
    t = build_trie({"0": list(range(100))}, kary=2, max_docs_per_cluster=16)
    assert t.doc_count[t.node_of_path([0])] == 100       # CSR keeps everything
    assert t.cluster_doc_mask[0].sum() == 16             # padded table truncates


def test_insert_docs_at_scale():
    """Expansion with many new docs stays consistent (cap growth, CSR)."""
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(5, 8)) * 10
    base = np.concatenate([centers[i] + rng.normal(size=(20, 8)) * 0.1
                           for i in range(5)]).astype(np.float32)
    from gdr_tpu.ops.kmeans import hierarchical_kmeans, paths_to_cid_mapping
    paths = hierarchical_kmeans(base, kary=5, leaf_cap=25, iters=10, seed=0)
    t = build_trie(paths_to_cid_mapping(paths), kary=5,
                   max_docs_per_cluster=32, doc_embeddings=base)
    new = np.concatenate([centers[i % 5] + rng.normal(size=(1, 8)) * 0.1
                          for i in range(200)]).astype(np.float32)
    t2, rows = insert_docs(t, new, first_new_index=100)
    total = sum(len(t2.docs_of_cid(t2.cid_of_node(int(n))))
                for n in t2.cluster_node_ids)
    assert total == 300
    # all original docs still present under their original clusters
    for n in t.cluster_node_ids:
        cid = t.cid_of_node(int(n))
        assert set(t.docs_of_cid(cid)) <= set(t2.docs_of_cid(cid))
    # padded table grew to hold the largest cluster
    assert t2.max_docs_per_cluster >= int(t2.doc_count.max())
