import jax
import jax.numpy as jnp
import numpy as np

from gdr_tpu.ops.kmeans import (hierarchical_kmeans, kmeans_fit,
                                paths_to_cid_mapping)


def _blobs(rng, centers, per, dim=8, scale=0.05):
    pts, labels = [], []
    for i, c in enumerate(centers):
        pts.append(c + rng.normal(size=(per, dim)) * scale)
        labels += [i] * per
    return np.concatenate(pts).astype(np.float32), np.array(labels)


def test_kmeans_fit_separable_blobs(rng):
    dim = 8
    centers = rng.normal(size=(4, dim)) * 5
    X, labels = _blobs(rng, centers, per=16, dim=dim)
    mask = np.ones(len(X), bool)
    cent, assign = kmeans_fit(jnp.asarray(X), jnp.asarray(mask), 4, 20,
                              jax.random.PRNGKey(0))
    assign = np.asarray(assign)
    # every true blob maps to exactly one predicted cluster
    for i in range(4):
        blob_assign = assign[labels == i]
        assert len(np.unique(blob_assign)) == 1
    # distinct blobs → distinct clusters
    assert len({int(assign[labels == i][0]) for i in range(4)}) == 4


def test_kmeans_fit_respects_mask(rng):
    dim = 4
    X = np.zeros((64, dim), np.float32)
    X[:8] = rng.normal(size=(8, dim)).astype(np.float32) + 10
    mask = np.zeros(64, bool)
    mask[:8] = True  # padded rows at origin must not pull centroids
    cent, _ = kmeans_fit(jnp.asarray(X), jnp.asarray(mask), 2, 10,
                         jax.random.PRNGKey(1))
    cent = np.asarray(cent)
    assert np.all(np.linalg.norm(cent, axis=1) > 5)


def test_hierarchical_kmeans_structure(rng):
    dim = 8
    top_centers = rng.normal(size=(3, dim)) * 20
    X, top_labels = _blobs(rng, top_centers, per=40, dim=dim, scale=1.0)
    paths = hierarchical_kmeans(X, kary=3, leaf_cap=10, iters=15, seed=0)
    assert len(paths) == len(X)
    # every doc got a path; same top-level blob → same first digit
    for i in range(3):
        first_digits = {paths[j][0] for j in range(len(X)) if top_labels[j] == i}
        assert len(first_digits) == 1
    # leaves respect the cap
    mapping = paths_to_cid_mapping(paths)
    for cid, docs in mapping.items():
        assert len(docs) <= 10
    # GDR mode: docs share CIDs (clusters, not unique docids)
    assert any(len(d) > 1 for d in mapping.values())


def test_hierarchical_kmeans_doc_level_suffix(rng):
    X = rng.normal(size=(50, 4)).astype(np.float32)
    paths = hierarchical_kmeans(X, kary=4, leaf_cap=8, iters=10, seed=0,
                                doc_level_suffix=True)
    mapping = paths_to_cid_mapping(paths)
    # NCI mode: every doc unique (except singleton-leaf short-circuit)
    assert all(len(d) == 1 for d in mapping.values())


def test_small_input_short_circuit():
    X = np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)
    paths = hierarchical_kmeans(X, kary=8, leaf_cap=2, iters=5, seed=0)
    cids = {"-".join(map(str, p)) for p in paths}
    assert len(cids) == 3  # enumerated directly, n <= kary


def test_hierarchical_kmeans_deterministic_under_seed(rng):
    X = rng.normal(size=(60, 8)).astype(np.float32)
    a = hierarchical_kmeans(X, kary=4, leaf_cap=8, iters=10, seed=3)
    b = hierarchical_kmeans(X, kary=4, leaf_cap=8, iters=10, seed=3)
    assert a == b
    c = hierarchical_kmeans(X, kary=4, leaf_cap=8, iters=10, seed=4)
    assert c != a          # different seed → different assignment (w.h.p.)


def test_minibatch_kmeans_paths_valid():
    """IndexConfig.minibatch_* is live: large clusters split via the
    minibatch path (ref kmeans.py:53-56) and still produce a valid
    bounded-size partition, deterministically under a seed."""
    import numpy as np
    from gdr_tpu.ops.kmeans import hierarchical_kmeans

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8, 16)) * 6
    X = (centers[rng.integers(0, 8, 1500)]
         + rng.normal(size=(1500, 16))).astype(np.float32)
    kw = dict(kary=4, leaf_cap=64, iters=12, seed=3,
              minibatch_threshold=1000, minibatch_size=256)
    paths = hierarchical_kmeans(X, **kw)
    assert len(paths) == 1500
    assert all(len(p) >= 1 for p in paths)
    from collections import Counter
    leaf_sizes = Counter("-".join(map(str, p)) for p in paths)
    assert max(leaf_sizes.values()) <= 64 * 4   # respects leaf_cap order
    paths2 = hierarchical_kmeans(X, **kw)
    assert paths == paths2
