"""On-device hierarchical k-means for semantic CID assignment.

The reference shells out to scikit-learn on the host
(Data_process/NQ_dataset/kmeans/kmeans.py: recursive 30-ary k-means, recurse
while a cluster holds more than ``c`` docs) — the slowest offline step of its
pipeline.  Here the Lloyd iterations run as jitted XLA: assignment is one
``[n, d]·[d, k]`` matmul on the MXU and the centroid update a one-hot matmul
(segment mean).  The host only orchestrates the recursion tree.

Shapes are bucketed to powers of two so the recursion reuses a handful of
compiled programs instead of compiling per cluster size.

Two output modes:
- ``doc_level_suffix=False`` (GDR mode): recursion stops when a cluster holds
  ≤ ``leaf_cap`` docs; all docs in the leaf share the CID path.  This is the
  mapping GDR's ``indexmap.pkl`` encodes (CID → list of docs).
- ``doc_level_suffix=True`` (NCI mode, ref kmeans.py:41-48): a final digit
  enumerates each doc inside its leaf, giving unique doc ids.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(x: Array, mask: Array, k: int, iters: int, key: Array
               ) -> tuple[Array, Array]:
    """Masked Lloyd k-means.  x: [n, d] (padded), mask: [n] bool.

    Returns (centroids [k, d], assignment [n] int32).  Padded rows get
    assignment by nearest centroid but contribute nothing to updates.
    """
    n = x.shape[0]
    x = x.astype(jnp.float32)
    w = mask.astype(jnp.float32)
    xsq = jnp.sum(x * x, axis=1, keepdims=True)            # [n, 1]

    # k-means++ seeding: first point uniform over mask, then ∝ min-dist²
    key0, key_seq = jax.random.split(key)
    probs0 = w / jnp.maximum(w.sum(), 1.0)
    i0 = jax.random.choice(key0, n, p=probs0)
    cent0 = jnp.zeros((k, x.shape[1]), jnp.float32).at[0].set(x[i0])
    d0 = jnp.sum((x - x[i0]) ** 2, axis=1)

    def seed_body(i, state):
        cent, mind, key_seq = state
        key_seq, sub = jax.random.split(key_seq)
        p = mind * w
        p = p / jnp.maximum(p.sum(), 1e-30)
        ii = jax.random.choice(sub, n, p=p)
        cent = cent.at[i].set(x[ii])
        mind = jnp.minimum(mind, jnp.sum((x - x[ii]) ** 2, axis=1))
        return cent, mind, key_seq

    cent0, _, _ = jax.lax.fori_loop(1, k, seed_body, (cent0, d0, key_seq))

    def assign(cent):
        d2 = xsq - 2.0 * (x @ cent.T) + jnp.sum(cent * cent, axis=1)[None]
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    def body(_, cent):
        a = assign(cent)
        onehot = jax.nn.one_hot(a, k, dtype=jnp.float32) * w[:, None]
        sums = onehot.T @ x                                # [k, d]
        counts = onehot.sum(axis=0)                        # [k]
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, cent)   # keep empty as-is

    cent = jax.lax.fori_loop(0, iters, body, cent0)
    return cent, assign(cent)


@partial(jax.jit, static_argnames=("k", "iters", "batch_size"))
def kmeans_fit_minibatch(x: Array, mask: Array, k: int, iters: int,
                         batch_size: int, key: Array
                         ) -> tuple[Array, Array]:
    """Minibatch k-means (the reference's MiniBatchKMeans path for clusters
    ≥ 1e3 points, kmeans.py:53-56): each iteration assigns one sampled
    minibatch and moves each centroid toward its batch mean with a
    per-centre learning rate 1/count — sklearn's streaming update, batched.

    x: [n, d] (padded), mask: [n] bool.  Returns (centroids, assignment).
    """
    n = x.shape[0]
    x = x.astype(jnp.float32)
    w = mask.astype(jnp.float32)

    # seed with k distinct points (uniform over the mask)
    key0, key_seq = jax.random.split(key)
    probs0 = w / jnp.maximum(w.sum(), 1.0)
    seed_idx = jax.random.choice(key0, n, shape=(k,), replace=False, p=probs0)
    cent0 = x[seed_idx]

    def assign_of(cent, pts):
        d2 = (jnp.sum(pts * pts, axis=1, keepdims=True)
              - 2.0 * (pts @ cent.T) + jnp.sum(cent * cent, axis=1)[None])
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    def body(i, state):
        cent, counts, key_seq = state
        key_seq, sub = jax.random.split(key_seq)
        bidx = jax.random.choice(sub, n, shape=(batch_size,), p=probs0)
        pts = x[bidx]
        a = assign_of(cent, pts)
        onehot = jax.nn.one_hot(a, k, dtype=jnp.float32)
        bsum = onehot.T @ pts                               # [k, d]
        bcnt = onehot.sum(axis=0)                           # [k]
        new_counts = counts + bcnt
        lr = bcnt / jnp.maximum(new_counts, 1.0)
        bmean = bsum / jnp.maximum(bcnt, 1.0)[:, None]
        cent = jnp.where(bcnt[:, None] > 0,
                         (1.0 - lr)[:, None] * cent + lr[:, None] * bmean,
                         cent)
        return cent, new_counts, key_seq

    cent, _, _ = jax.lax.fori_loop(
        0, iters, body, (cent0, jnp.zeros((k,), jnp.float32), key_seq))
    return cent, assign_of(cent, x)


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def hierarchical_kmeans(X: np.ndarray, kary: int, leaf_cap: int,
                        iters: int = 25, seed: int = 7,
                        max_depth: int = 8,
                        doc_level_suffix: bool = False,
                        minibatch_threshold: int = 0,
                        minibatch_size: int = 1024) -> list[list[int]]:
    """Build per-doc CID digit paths.  X: [N, d] doc embeddings (host array).

    Returns ``paths[i]`` = list of digits for doc i (length ≤ max_depth).
    Mirrors reference kmeans.py:41-90 but cluster assignment happens on
    device and the recursion reuses bucketed compiled programs.

    ``minibatch_threshold`` > 0: clusters of at least that many points use
    minibatch k-means with ``minibatch_size`` samples per iteration
    (ref kmeans.py:53-56, threshold 1e3); smaller clusters run exact Lloyd.
    """
    X = np.asarray(X, np.float32)
    n_total = X.shape[0]
    paths: list[list[int]] = [[] for _ in range(n_total)]
    key = jax.random.PRNGKey(seed)

    stack: list[tuple[np.ndarray, int]] = [(np.arange(n_total), 0)]
    while stack:
        idx, depth = stack.pop()
        n = len(idx)
        if n <= leaf_cap or depth >= max_depth:
            if doc_level_suffix and n > 1:
                for pos, doc in enumerate(idx):
                    paths[doc].append(pos)
            continue
        if n <= kary:
            # fewer points than clusters: enumerate directly
            for pos, doc in enumerate(idx):
                paths[doc].append(pos)
            continue
        b = _bucket(n)
        xp = np.zeros((b, X.shape[1]), np.float32)
        xp[:n] = X[idx]
        mask = np.zeros(b, bool)
        mask[:n] = True
        key, sub = jax.random.split(key)
        if minibatch_threshold and n >= minibatch_threshold:
            _, assign = kmeans_fit_minibatch(
                jnp.asarray(xp), jnp.asarray(mask), kary, iters,
                min(minibatch_size, b), sub)
        else:
            _, assign = kmeans_fit(jnp.asarray(xp), jnp.asarray(mask), kary,
                                   iters, sub)
        assign = np.asarray(assign[:n])
        # degenerate split (all points in one cluster): round-robin fallback
        if len(np.unique(assign)) == 1:
            assign = np.arange(n) % kary
        for c in range(kary):
            members = idx[assign == c]
            if len(members) == 0:
                continue
            for doc in members:
                paths[doc].append(c)
            stack.append((members, depth + 1))
    return paths


def paths_to_cid_mapping(paths: list[list[int]]) -> dict[str, list[int]]:
    """Digit paths → {CID string: [doc indices]} (the trie builder's input)."""
    out: dict[str, list[int]] = {}
    for doc, p in enumerate(paths):
        cid = "-".join(str(d) for d in p)
        out.setdefault(cid, []).append(doc)
    return out
