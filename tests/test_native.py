"""Native C++ library vs pure-Python reference implementations."""

import numpy as np
import pytest

from gdr_tpu import native
from gdr_tpu.data.tokenize import HashTokenizer
from gdr_tpu.ops.trie import build_trie

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _random_cid_world(rng, n_cids=200, kary=7, max_depth=4):
    cid_to_docs = {}
    doc = 0
    while len(cid_to_docs) < n_cids:
        depth = int(rng.integers(1, max_depth + 1))
        cid = "-".join(str(int(d)) for d in rng.integers(0, kary, depth))
        if cid in cid_to_docs or any(c.startswith(cid + "-") or
                                     cid.startswith(c + "-")
                                     for c in cid_to_docs):
            continue  # keep prefix-free like a k-means tree
        k = int(rng.integers(1, 6))
        cid_to_docs[cid] = list(range(doc, doc + k))
        doc += k
    return cid_to_docs


def test_native_trie_matches_python():
    rng = np.random.default_rng(0)
    cid_to_docs = _random_cid_world(rng)
    t_native = build_trie(cid_to_docs, kary=7, use_native=True)
    t_python = build_trie(cid_to_docs, kary=7, use_native=False)
    np.testing.assert_array_equal(t_native.children, t_python.children)
    np.testing.assert_array_equal(t_native.eos_allowed, t_python.eos_allowed)
    np.testing.assert_array_equal(t_native.depth, t_python.depth)
    np.testing.assert_array_equal(t_native.doc_start, t_python.doc_start)
    np.testing.assert_array_equal(t_native.doc_count, t_python.doc_count)
    np.testing.assert_array_equal(t_native.doc_indices, t_python.doc_indices)
    np.testing.assert_array_equal(t_native.cluster_docs, t_python.cluster_docs)
    np.testing.assert_array_equal(t_native.cluster_node_ids,
                                  t_python.cluster_node_ids)


def test_native_tokenizer_matches_python():
    texts = ["What is the Capital of France?",
             "the quick brown fox... jumps; over_the lazy dog (2024)!",
             "", "a", "punctuation:,.;!?" * 3]
    py = HashTokenizer(vocab_size=997, use_native=False)
    ids_py, mask_py = py.encode_batch(texts, 24)
    ids_nat, mask_nat = native.hash_encode_batch(texts, 24, 997, lower=True)
    np.testing.assert_array_equal(ids_nat, ids_py)
    np.testing.assert_array_equal(mask_nat, mask_py)


def test_scan_lines():
    data = b"row1\trow1b\nrow2\nrow3\t3b\n"
    offs = native.scan_lines(data)
    assert list(offs) == [0, 11, 16, len(data)]
