import json
import os

import numpy as np

from gdr_tpu.config import IndexConfig
from gdr_tpu.index.builder import build_index_from_embeddings
from gdr_tpu.index.io import load_index, save_index
from gdr_tpu.utils.logging import MetricLogger
from gdr_tpu.utils.timing import PhaseTimer


def test_index_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    store = rng.normal(size=(30, 8)).astype(np.float32)
    cfg = IndexConfig(kary=3, leaf_cap=6, embedding_dim=8,
                      max_docs_per_cluster=12, seed=0)
    index = build_index_from_embeddings(store, cfg)
    path = str(tmp_path / "index.npz")
    save_index(path, index)
    loaded = load_index(path)
    np.testing.assert_array_equal(loaded.store, index.store)
    np.testing.assert_array_equal(loaded.trie.children, index.trie.children)
    np.testing.assert_array_equal(loaded.trie.cluster_docs,
                                  index.trie.cluster_docs)
    np.testing.assert_allclose(loaded.trie.node_embedding,
                               index.trie.node_embedding, rtol=1e-6)
    assert loaded.paths == index.paths
    assert loaded.cid_of_doc == index.cid_of_doc
    # id_mapping (the reference's indexmap.pkl) survives the roundtrip
    assert loaded.trie.id_mapping() == index.trie.id_mapping()


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), run_name="t")
    logger.log({"loss": 1.5, "note": "x"}, step=3)
    logger.log({"loss": 1.2}, step=4)
    logger.close()
    rows = [json.loads(l) for l in open(tmp_path / "t.metrics.jsonl")]
    assert rows[0]["step"] == 3 and rows[0]["loss"] == 1.5
    assert rows[1]["loss"] == 1.2


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a_total_s"] >= 0 and "a_mean_ms" in s
    t.reset()
    assert not t.totals


def test_distributed_noop():
    from gdr_tpu.parallel.distributed import initialize, process_info
    assert initialize() is False          # single-process: no-op
    idx, count = process_info()
    assert idx == 0 and count == 1
