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


def _kmeans_core(x: Array, mask: Array, k: int, iters: int, key: Array
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


kmeans_fit = partial(jax.jit, static_argnames=("k", "iters"))(_kmeans_core)


def _minibatch_core(x: Array, mask: Array, k: int, iters: int,
                    batch_size: int, key: Array) -> tuple[Array, Array]:
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


kmeans_fit_minibatch = partial(
    jax.jit, static_argnames=("k", "iters", "batch_size"))(_minibatch_core)


@partial(jax.jit, static_argnames=("k", "iters"))
def _fit_gather_batch(X: Array, idx: Array, masks: Array, k: int, iters: int,
                      keys: Array) -> Array:
    """Fit G clusters whose members are rows of the DEVICE-RESIDENT store,
    vmapped into ONE program per (G, bucket) shape.

    X: [N, d]; idx: [G, b] row indices (pad rows arbitrary, masked out);
    masks: [G, b]; keys: [G, 2].  Returns assignments [G, b].

    Two things make the hierarchical build fast on a tunnelled host:
    same-bucket sibling clusters share one execution (vs one ~32 ms
    dispatch each for the ~900 clusters of an NQ-scale tree), and gathering
    inside the program ships only indices/assignments over the host↔device
    link instead of ~n·d floats per level (~45 s/level at 334k docs,
    measured).
    """
    return jax.vmap(lambda ii, mm, kk: _kmeans_core(X[ii], mm, k, iters,
                                                    kk)[1])(idx, masks, keys)


@partial(jax.jit, static_argnames=("k", "iters", "batch_size"))
def _fit_gather_minibatch_batch(X: Array, idx: Array, masks: Array, k: int,
                                iters: int, batch_size: int, keys: Array
                                ) -> Array:
    return jax.vmap(lambda ii, mm, kk: _minibatch_core(
        X[ii], mm, k, iters, batch_size, kk)[1])(idx, masks, keys)


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
    """Build per-doc CID digit paths.  X: [N, d] doc embeddings (numpy or
    device array — shipped to the device once; per-cluster gathers then
    happen inside the fit programs and only indices/assignments cross the
    host link).

    Returns ``paths[i]`` = list of digits for doc i (length ≤ max_depth).
    Mirrors reference kmeans.py:41-90 but cluster assignment happens on
    device and the recursion reuses bucketed compiled programs.

    ``minibatch_threshold`` > 0: clusters of at least that many points use
    minibatch k-means with ``minibatch_size`` samples per iteration
    (ref kmeans.py:53-56, threshold 1e3); smaller clusters run exact Lloyd.
    """
    n_total = X.shape[0]
    if n_total < 20_000 and not (minibatch_threshold
                                 and n_total >= minibatch_threshold):
        # Small corpora fit in pure NumPy: the XLA programs only pay off at
        # index scale — their one-time compile costs minutes on a tunnelled
        # accelerator (including its remote "CPU" device), versus
        # milliseconds of host math here.  (Taken only when no cluster
        # could trigger the minibatch mode, so those semantics are never
        # silently bypassed.)
        return _hierarchical_numpy(np.asarray(X, np.float32), kary, leaf_cap,
                                   iters, seed, max_depth, doc_level_suffix)
    X_dev = jnp.asarray(X, jnp.float32)     # ship the store ONCE
    paths: list[list[int]] = [[] for _ in range(n_total)]
    key = jax.random.PRNGKey(seed)

    # Per-device-call budget when batching sibling clusters: bytes-based
    # (≈3 GB of gathered fp32 plus like-sized distance intermediates), so
    # wide feature dims don't scale the footprint past small-HBM devices
    # with the doc store also resident.  At d=768 this is 1M rows/call —
    # the empirically-tuned round-2 operating point (halving it measured
    # 1.95 s → 4.4 s on the 334k NQ-scale build).
    budget_bytes = 3 * (1 << 30)
    max_rows_per_call = max(budget_bytes // (4 * int(X.shape[1])), 1 << 14)

    pending: list[tuple[np.ndarray, int]] = [(np.arange(n_total), 0)]
    while pending:
        # split leaves from clusters that actually need a k-means fit
        to_fit: list[tuple[np.ndarray, int]] = []
        for idx, depth in pending:
            n = len(idx)
            if n <= leaf_cap or depth >= max_depth:
                if doc_level_suffix and n > 1:
                    for pos, doc in enumerate(idx):
                        paths[doc].append(pos)
            elif n <= kary:
                # fewer points than clusters: enumerate directly
                for pos, doc in enumerate(idx):
                    paths[doc].append(pos)
            else:
                to_fit.append((idx, depth))

        # group same-bucket clusters and fit each group in ONE vmapped
        # execution — per-cluster dispatch costs a tunnel round trip each
        # and dominated the 334k-doc build (hundreds of sibling clusters)
        by_bucket: dict[tuple[int, bool], list[tuple[np.ndarray, int]]] = {}
        for idx, depth in to_fit:
            b = _bucket(len(idx))
            mb = bool(minibatch_threshold) and len(idx) >= minibatch_threshold
            by_bucket.setdefault((b, mb), []).append((idx, depth))

        pending = []
        for (b, mb), group in sorted(by_bucket.items()):
            chunk = max(1, max_rows_per_call // b)
            for s in range(0, len(group), chunk):
                part = group[s:s + chunk]
                # pad the group count to a bucket too: each distinct (G, b)
                # shape compiles its own XLA program, and remainder groups
                # would otherwise mint fresh multi-second compiles per run
                g = min(_bucket(len(part), minimum=1), chunk)
                idxs = np.zeros((g, b), np.int32)
                masks = np.zeros((g, b), bool)       # pad groups: all-False
                for j, (idx, _) in enumerate(part):
                    idxs[j, :len(idx)] = idx
                    masks[j, :len(idx)] = True
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, g)
                if mb:
                    assigns = _fit_gather_minibatch_batch(
                        X_dev, jnp.asarray(idxs), jnp.asarray(masks), kary,
                        iters, min(minibatch_size, b), keys)
                else:
                    assigns = _fit_gather_batch(
                        X_dev, jnp.asarray(idxs), jnp.asarray(masks), kary,
                        iters, keys)
                assigns = np.asarray(assigns)
                for j, (idx, depth) in enumerate(part):
                    n = len(idx)
                    assign = assigns[j, :n]
                    # degenerate split: round-robin fallback
                    if len(np.unique(assign)) == 1:
                        assign = np.arange(n) % kary
                    for c in range(kary):
                        members = idx[assign == c]
                        if len(members) == 0:
                            continue
                        for doc in members:
                            paths[doc].append(c)
                        pending.append((members, depth + 1))
    return paths


def _numpy_fit(x: np.ndarray, k: int, iters: int,
               rng: np.random.Generator) -> np.ndarray:
    """Host Lloyd k-means with k-means++ seeding; returns assignments [n]."""
    n, d = x.shape
    cent = np.empty((k, d), np.float32)
    cent[0] = x[rng.integers(n)]
    mind = ((x - cent[0]) ** 2).sum(1)
    for i in range(1, k):
        s = mind.sum()
        if s <= 0:                      # all remaining points identical
            cent[i] = x[rng.integers(n)]
            continue
        cent[i] = x[rng.choice(n, p=mind / s)]
        mind = np.minimum(mind, ((x - cent[i]) ** 2).sum(1))
    xsq = (x * x).sum(1)[:, None]
    a = np.zeros(n, np.int64)
    for _ in range(iters):
        d2 = xsq - 2.0 * (x @ cent.T) + (cent * cent).sum(1)[None]
        a = d2.argmin(1)
        sums = np.zeros((k, d), np.float32)
        np.add.at(sums, a, x)
        counts = np.bincount(a, minlength=k)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
    d2 = xsq - 2.0 * (x @ cent.T) + (cent * cent).sum(1)[None]
    return d2.argmin(1)


def _hierarchical_numpy(X: np.ndarray, kary: int, leaf_cap: int, iters: int,
                        seed: int, max_depth: int, doc_level_suffix: bool
                        ) -> list[list[int]]:
    """Small-corpus path: the same recursion, all host math (see
    hierarchical_kmeans).  Deterministic per (seed, visit order)."""
    paths: list[list[int]] = [[] for _ in range(X.shape[0])]
    counter = 0
    stack: list[tuple[np.ndarray, int]] = [(np.arange(X.shape[0]), 0)]
    while stack:
        idx, depth = stack.pop()
        n = len(idx)
        if n <= leaf_cap or depth >= max_depth:
            if doc_level_suffix and n > 1:
                for pos, doc in enumerate(idx):
                    paths[doc].append(pos)
            continue
        if n <= kary:
            for pos, doc in enumerate(idx):
                paths[doc].append(pos)
            continue
        rng = np.random.default_rng((seed, counter))
        counter += 1
        assign = _numpy_fit(X[idx], kary, iters, rng)
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
