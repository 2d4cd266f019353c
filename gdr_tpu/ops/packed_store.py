"""Cluster-packed document store: candidates become contiguous rows.

The generic re-rank gathers arbitrary store rows per candidate — XLA lowers
that as a slow per-row gather (~25× the bandwidth cost on TPU, measured).
But GDR's candidates are never arbitrary: they are *whole clusters*.  Packing
the store so each cluster's documents occupy one contiguous, 8-row-aligned
block turns the per-beam gather into a single dynamic-slice DMA:

    rows[start(cluster) : start(cluster)+cap]      # one DMA, MXU-friendly

Alignment to 8 rows satisfies Mosaic's HBM tiling constraint for dynamic
slice starts; padding overhead is ≤ 7 rows per cluster (~8% at the
reference's 30-doc clusters).

``row_to_doc`` maps packed rows back to original document ids (-1 for pad),
so results are reported in the caller's id space.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gdr_tpu.ops.trie import TrieTensors

ALIGN = 8


@dataclass
class PackedStore:
    rows: np.ndarray          # [M, d] float — cluster-contiguous embeddings
    starts: np.ndarray        # [C] int32 — 8-aligned row start per cluster
    counts: np.ndarray        # [C] int32 — real docs per cluster
    row_to_doc: np.ndarray    # [M] int32 — original doc id per row (-1 pad)
    cap: int                  # max padded cluster size (static slice length)

    @property
    def num_rows(self) -> int:
        return self.rows.shape[0]


def pack_layout(trie: TrieTensors, cap: int | None = None,
                align: int = ALIGN
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Compute the packed layout from the trie alone (host, no embeddings).

    ``align``: row alignment of every cluster block start and of ``cap``
    (default 8 = Mosaic's fp32/bf16 sublane tile; int8 stores need 32 —
    int8 packs 4 rows per sublane, so HBM dynamic-slice starts must be
    32-row aligned).  Returns (starts [C], counts [C], row_to_doc [M],
    cap)."""
    c = trie.num_clusters
    counts = np.zeros(c, np.int32)
    starts = np.zeros(c, np.int32)
    cursor = 0
    max_count = 0
    for row, node in enumerate(trie.cluster_node_ids):
        cnt = int(trie.doc_count[node])
        counts[row] = cnt
        starts[row] = cursor
        cursor += -(-cnt // align) * align
        max_count = max(max_count, cnt)
    cap = cap or max(-(-max_count // align) * align, align)
    m = cursor + cap            # tail margin so start+cap never overruns
    row_to_doc = np.full(m, -1, np.int32)
    for row, node in enumerate(trie.cluster_node_ids):
        s, cnt = int(trie.doc_start[node]), int(trie.doc_count[node])
        row_to_doc[starts[row]:starts[row] + cnt] = trie.doc_indices[s:s + cnt]
    return starts, counts, row_to_doc, cap


def pack_rows(store, row_to_doc):
    """Materialise packed rows on device: one gather of the original store
    (pads → zero rows).  ``store`` may be a jnp array; stays on device."""
    import jax.numpy as jnp

    r = jnp.asarray(row_to_doc)
    safe = jnp.maximum(r, 0)
    rows = jnp.asarray(store)[safe]
    return jnp.where((r >= 0)[:, None], rows, jnp.zeros_like(rows))


def pack_store_by_cluster(trie: TrieTensors, store: np.ndarray,
                          cap: int | None = None) -> PackedStore:
    """Host convenience: layout + row materialisation in NumPy."""
    store = np.asarray(store)
    starts, counts, row_to_doc, cap = pack_layout(trie, cap)
    m = len(row_to_doc)
    rows = np.zeros((m, store.shape[1]), store.dtype)
    real = row_to_doc >= 0
    rows[real] = store[row_to_doc[real]]
    return PackedStore(rows=rows, starts=starts, counts=counts,
                       row_to_doc=row_to_doc, cap=cap)


def pack_layout_sharded(trie: TrieTensors, n_shards: int,
                        cap: int | None = None, align: int = ALIGN
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                   int, int]:
    """Shard-aware packed layout: every cluster's contiguous block lives
    entirely inside ONE of ``n_shards`` equal row ranges, so a row-sharded
    device placement can slice any cluster locally — the distributed
    re-rank keeps the packed store's contiguous-slice read pattern instead
    of the ~25× slower per-row gather (see module docstring).

    Clusters are greedily bin-packed (largest padded block → least-loaded
    shard) to balance rows; each shard range is padded to a common length
    ``shard_rows`` with a ``cap`` tail margin so ``start + cap`` never
    crosses into the next shard.

    Returns (starts [C] global row starts, counts [C], row_to_doc
    [n_shards·shard_rows], cap, shard_rows)."""
    c = trie.num_clusters
    counts = np.zeros(c, np.int32)
    padded = np.zeros(c, np.int64)
    for row, node in enumerate(trie.cluster_node_ids):
        cnt = int(trie.doc_count[node])
        counts[row] = cnt
        padded[row] = -(-max(cnt, 1) // align) * align
    max_count = int(counts.max()) if c else 0
    cap = cap or max(-(-max_count // align) * align, align)
    loads = np.zeros(n_shards, np.int64)
    bin_of = np.zeros(c, np.int32)
    offset = np.zeros(c, np.int64)
    for r in np.argsort(-padded, kind="stable"):
        b = int(np.argmin(loads))
        bin_of[r] = b
        offset[r] = loads[b]
        loads[b] += padded[r]
    shard_rows = int(-(-(int(loads.max()) + cap) // align) * align)
    starts = (bin_of.astype(np.int64) * shard_rows + offset).astype(np.int32)
    m = n_shards * shard_rows
    row_to_doc = np.full(m, -1, np.int32)
    for row, node in enumerate(trie.cluster_node_ids):
        s, cnt = int(trie.doc_start[node]), int(trie.doc_count[node])
        row_to_doc[starts[row]:starts[row] + cnt] = \
            trie.doc_indices[s:s + cnt]
    return starts, counts, row_to_doc, cap, shard_rows
